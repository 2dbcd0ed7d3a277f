package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque binary columns with
  * typed decoded metadata + features.
  *
  * The Spark-side contract is real — binary payload column, typed
  * output schema, per-partition batched decode (the shape a JNI/FFI
  * image library needs: one context per partition, not per row).
  * Images decode for REAL via javax.imageio (PNG/BMP/GIF/JPEG) and
  * audio via javax.sound.sampled (WAV/AIFF/AU PCM + ULAW/ALAW) — both
  * JDK-built-in, zero external deps. Only VIDEO remains a
  * DETERMINISTIC STUB (no container-less JDK video codec exists);
  * swap `decodeStub` for a real codec without touching the plumbing.
  */
object Multimodal {

  /** Opaque media record: payload + source metadata. */
  case class MediaRecord(docId: Long, mediaType: String, payload: Array[Byte])

  /** Decoded output: typed metadata + fixed-width feature vector.
    * Visual media fill (width, height); audio fills (sampleRateHz,
    * channels, bitDepth, durationMs) and counts PCM frames in
    * `nFrames`; either modality leaves the other's fields at 0. The
    * feature vector is mean band luminance for images, per-window RMS
    * for audio — same shape, so everything downstream (ANN, dedup,
    * quality joins) is modality-agnostic.
    */
  case class DecodedMedia(
      docId: Long,
      mediaType: String,
      nBytes: Long,
      width: Int,
      height: Int,
      nFrames: Int,
      features: Array[Float],
      sampleRateHz: Int = 0,
      channels: Int = 0,
      bitDepth: Int = 0,
      durationMs: Long = 0L)

  val FeatureDim = 8

  /** STUB decoder — deterministic fake standing in for e.g. libjpeg +
    * a vision model. Real implementation: decode payload, resize,
    * run the feature extractor — same signature, one call per record,
    * heavy init amortized per partition by [[decode]].
    */
  private[graft] def decodeStub(r: MediaRecord): DecodedMedia = {
    val n = r.payload.length.toLong
    val feats = new Array[Float](FeatureDim)
    var i = 0
    while (i < FeatureDim) {
      // byte-window checksum as the fake embedding dimension
      val start = (i * math.max(1L, n / FeatureDim)).toInt
      var acc = 0L
      var j = start
      while (j < math.min(n, start + 16).toInt) { acc = acc * 31 + (r.payload(j) & 0xff); j += 1 }
      feats(i) = (acc % 1000L).toFloat / 1000f
      i += 1
    }
    DecodedMedia(r.docId, r.mediaType, n,
      (n % 64).toInt + 16, ((n / 64) % 64).toInt + 16, (n % 7).toInt + 1, feats)
  }

  /** REAL image decode via the JDK's built-in codecs (PNG/BMP/GIF/JPEG
    * — javax.imageio, java.desktop module, no external lib). Width and
    * height are the image's true dimensions; features are mean
    * luminance over FeatureDim vertical bands in [0,1] — a real,
    * content-derived vector with the same shape the stub fakes for
    * non-image media. Returns None when no registered reader parses
    * the bytes (caller falls back to the stub).
    */
  private[graft] def decodeImage(r: MediaRecord): Option[DecodedMedia] = {
    val img =
      // NonFatal, not just IOException: ImageIO plugins throw runtime
      // exceptions (IllegalArgumentException, CMMException, AIOOBE) on
      // some corrupt/exotic payloads; one bad record must fall back to
      // the stub, not crash the job
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      catch { case scala.util.control.NonFatal(_) => null }
    Option(img).map { im =>
      val w = im.getWidth
      val h = im.getHeight
      val feats = new Array[Float](FeatureDim)
      var b = 0
      while (b < FeatureDim) {
        val x0 = b * w / FeatureDim
        val x1 = math.max(x0 + 1, (b + 1) * w / FeatureDim)
        var sum = 0.0
        var cnt = 0
        var x = x0
        while (x < math.min(x1, w)) {
          var y = 0
          while (y < h) {
            val rgb = im.getRGB(x, y)
            sum += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000.0
            cnt += 1
            y += 1
          }
          x += 1
        }
        feats(b) = if (cnt == 0) 0f else (sum / cnt / 255.0).toFloat
        b += 1
      }
      DecodedMedia(r.docId, r.mediaType, r.payload.length.toLong, w, h, 1, feats)
    }
  }

  /** REAL audio decode via the JDK's javax.sound.sampled (java.desktop
    * module, same zero-dependency pattern as [[decodeImage]]): parses
    * WAV/AIFF/AU containers, converting any supported encoding (8/16/
    * 24/32-bit PCM, ULAW, ALAW) to signed 16-bit PCM for analysis.
    * Reports the TRUE sample rate, channel count, container bit depth,
    * PCM frame count, and duration; features are root-mean-square
    * amplitude over FeatureDim consecutive frame windows (all channels
    * pooled), normalized to [0,1] — the audio analog of the image
    * path's band luminance. Returns None when no registered reader
    * parses the bytes (caller falls back to the stub).
    */
  private[graft] def decodeAudio(r: MediaRecord): Option[DecodedMedia] = {
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      catch { case scala.util.control.NonFatal(_) => null }
    Option(ais).flatMap { in =>
      try {
        val src = in.getFormat
        // normalize to signed 16-bit little-endian PCM at the source
        // rate/channels — one sample-extraction path for every input
        // encoding the JDK can convert
        val target = new javax.sound.sampled.AudioFormat(
          src.getSampleRate, 16, src.getChannels, true, false)
        val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
        val bytes = pcm.readAllBytes()
        val ch = target.getChannels
        val frameSize = 2 * ch
        val nFrames = bytes.length / frameSize
        if (nFrames == 0) None
        else {
          val feats = new Array[Float](FeatureDim)
          var w = 0
          while (w < FeatureDim) {
            val f0 = (w.toLong * nFrames / FeatureDim).toInt
            val f1 = math.max(f0 + 1, ((w + 1).toLong * nFrames / FeatureDim).toInt)
            var sumSq = 0.0
            var n = 0
            var f = f0
            while (f < math.min(f1, nFrames)) {
              var c = 0
              while (c < ch) {
                val i = f * frameSize + 2 * c
                val s = ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort.toInt
                sumSq += s.toDouble * s
                n += 1
                c += 1
              }
              f += 1
            }
            feats(w) = if (n == 0) 0f else (math.sqrt(sumSq / n) / 32768.0).toFloat
            w += 1
          }
          val rate = math.round(src.getSampleRate)
          // container bit depth; ULAW/ALAW report 8, PCM its true width
          val bits = if (src.getSampleSizeInBits > 0) src.getSampleSizeInBits else 16
          Some(DecodedMedia(r.docId, r.mediaType, r.payload.length.toLong,
            0, 0, nFrames, feats, sampleRateHz = rate, channels = ch,
            bitDepth = bits,
            durationMs = nFrames.toLong * 1000L / math.max(1L, rate.toLong)))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
      finally in.close()
    }
  }

  /** Per-record dispatch: payloads typed `image/...` go through the
    * real JDK image decode, `audio/...` through the real JDK audio
    * decode; video and unparseable bytes fall back to the
    * deterministic stub (video codecs genuinely aren't in the JDK).
    */
  private[graft] def decodeRecord(r: MediaRecord): DecodedMedia =
    if (r.mediaType.startsWith("image/")) decodeImage(r).getOrElse(decodeStub(r))
    else if (r.mediaType.startsWith("audio/")) decodeAudio(r).getOrElse(decodeStub(r))
    else decodeStub(r)

  /** Batched per-partition decode. mapPartitions (not map) so a real
    * codec initializes once per partition and can process the iterator
    * in vectorized batches.
    */
  def decode(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl for heavier codecs: acquire context here, once per
      // partition; javax.imageio's registry is JVM-global already
      it.map(decodeRecord)
    }
  }

  // ---- perceptual image hashing (real decode path) ---------------------

  /** Block-mean grayscale downsample to a (gw x gh) grid over the TRUE
    * pixels — integer block bounds, no `getScaledInstance` (whose
    * filtering is platform/implementation-dependent; hashes must be
    * deterministic). Luminance is the same 299/587/114 integer-weight
    * formula as [[decodeImage]]'s band features.
    */
  private def grayGrid(im: java.awt.image.BufferedImage,
      gw: Int, gh: Int): Array[Double] = {
    val w = im.getWidth
    val h = im.getHeight
    val g = new Array[Double](gw * gh)
    var cy = 0
    while (cy < gh) {
      val y0 = cy * h / gh
      val y1 = math.min(h, math.max(y0 + 1, (cy + 1) * h / gh))
      var cx = 0
      while (cx < gw) {
        val x0 = cx * w / gw
        val x1 = math.min(w, math.max(x0 + 1, (cx + 1) * w / gw))
        var sum = 0.0
        var cnt = 0
        var x = x0
        while (x < x1) {
          var y = y0
          while (y < y1) {
            val rgb = im.getRGB(x, y)
            sum += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000.0
            cnt += 1
            y += 1
          }
          x += 1
        }
        g(cy * gw + cx) = if (cnt == 0) 0.0 else sum / cnt
        cx += 1
      }
      cy += 1
    }
    g
  }

  /** 64-bit perceptual hashes of an image payload via the REAL JDK
    * decode: aHash (bit = 8x8 block mean above the global mean — both
    * shift equally under uniform brightness change, so the hash is
    * brightness-invariant) and dHash (bit = horizontal gradient sign
    * on a 9x8 grid — invariant to any monotone per-pixel tone map).
    * None when no registered reader parses the bytes.
    */
  private[graft] def perceptualHash(r: MediaRecord): Option[(Long, Long)] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      catch { case scala.util.control.NonFatal(_) => null }
    Option(img).map { im =>
      val a8 = grayGrid(im, 8, 8)
      val mean = a8.sum / 64.0
      var aHash = 0L
      var i = 0
      while (i < 64) {
        if (a8(i) > mean) aHash |= 1L << i
        i += 1
      }
      val d9 = grayGrid(im, 9, 8)
      var dHash = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (d9(y * 9 + x) < d9(y * 9 + x + 1)) dHash |= 1L << (y * 8 + x)
          x += 1
        }
        y += 1
      }
      (aHash, dHash)
    }
  }

  /** Perceptual hash table: doc_id, ahash64, dhash64 — one row per
    * DECODABLE image (unparseable payloads drop; callers needing them
    * left-join back). Per-partition batched like [[decode]]; map-only.
    */
  def imageHashes(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap(r => perceptualHash(r).map(h => (r.docId, h._1, h._2)))
    }.toDF("doc_id", "ahash64", "dhash64")
  }

  /** Near-duplicate image pairs: dHash-64 hamming distance with the
    * SAME pigeonhole-lossless blocking + capped-bucket skew contract
    * as the text simhash (api.DedupOps.fingerprintPairs, bits = 64).
    * dHash over aHash for the pair key: gradient signs survive global
    * tone/brightness edits that move aHash's mean threshold on
    * near-uniform images. Output: doc_a, doc_b, hamming.
    */
  def imageNearDupPairs(media: Dataset[MediaRecord], hammingMax: Int = 6,
      maxBucket: Int = graft.api.DedupOps.DefaultMaxBucket): DataFrame =
    graft.api.DedupOps.fingerprintPairs(
      imageHashes(media).select(col("doc_id"), col("dhash64")),
      "doc_id", "dhash64", bits = 64,
      hammingMax = hammingMax, maxBucket = maxBucket)

  /** documents table → media records (text bytes standing in for image
    * payloads; at 100TB this column is the raw bytes from the object
    * store and everything downstream is unchanged).
    */
  def documentsAsMedia(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(col("doc_id").as("docId"), lit("image/fake").as("mediaType"),
        col("text").cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** End-to-end: decode + feature table ready for ANN/quality joins. */
  def decodedTable(spark: SparkSession, dir: String): DataFrame =
    decode(documentsAsMedia(spark, dir)).toDF()

  // ---- post-decode transforms (map-only, partition-preserving) ---------

  /** Resize metadata transform: clamps decoded dimensions to fit
    * (maxW, maxH) preserving aspect ratio — the bookkeeping half of a
    * real resize; a codec plugs into the same row contract. Map-only:
    * no shuffle, stays in the decode stage's partitioning.
    */
  def resize(decoded: Dataset[DecodedMedia], maxW: Int, maxH: Int): Dataset[DecodedMedia] = {
    import decoded.sparkSession.implicits._
    decoded.map { d =>
      val scale = math.min(1.0, math.min(maxW.toDouble / d.width, maxH.toDouble / d.height))
      d.copy(width = math.max(1, (d.width * scale).toInt),
        height = math.max(1, (d.height * scale).toInt))
    }
  }

  /** Frame sampling: pick every ceil(nFrames/k)-th frame index — the
    * video-to-k-frames step of a training pipeline. Emits one row per
    * sampled frame (docId, frameIdx, features); at scale this is the
    * fan-out before per-frame feature extraction, still map-only.
    */
  def sampleFrames(decoded: Dataset[DecodedMedia], k: Int): DataFrame = {
    require(k > 0)
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.flatMap { d =>
      val step = math.max(1, math.ceil(d.nFrames.toDouble / k).toInt)
      (0 until d.nFrames by step).map(f => (d.docId, f, d.features))
    }.toDF("doc_id", "frame_idx", "features")
  }
}

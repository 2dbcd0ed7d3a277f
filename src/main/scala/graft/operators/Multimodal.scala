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
  * JDK-built-in, zero external deps. Video CONTAINER metadata is also
  * real: a codec-free MP4 (ISO BMFF) box walk and AVI RIFF header
  * parse recover true width/height/frame-count/duration, and
  * MJPEG-in-AVI FRAME payloads decode for REAL too (each `movi`
  * video chunk is a complete JPEG the imageio path parses; features
  * are the per-frame band-luminance mean over a bounded uniform
  * sample). Only frame decode for codecs the JDK lacks (H.264 etc.)
  * remains a DETERMINISTIC STUB (the feature vector is the stub's
  * byte checksum); swap in a real codec without touching the
  * plumbing.
  */
object Multimodal {

  // ImageIO's default stream cache is DISK-backed: every
  // ImageIO.read(InputStream) — even over an in-memory byte array —
  // spools the stream to a temp FILE in java.io.tmpdir and deletes it
  // after the decode. A fingerprint pass over N docs × k frames is
  // then N×k file create/write/read/delete syscall round-trips, pure
  // overhead for payloads already in memory, and a filesystem
  // contention point once the decode runs many tasks wide. Memory
  // caching is strictly better for byte-array-backed decodes; set
  // once per JVM at class-load (executors initialize this object the
  // first time a decode closure runs).
  javax.imageio.ImageIO.setUseCache(false)

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
  /** Mean luminance over FeatureDim vertical bands in [0,1] — the one
    * content-derived image feature, shared by the still-image decode
    * and the MJPEG per-frame decode.
    */
  private def bandLuminance(im: java.awt.image.BufferedImage): Array[Float] = {
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
    feats
  }

  private[graft] def decodeImage(r: MediaRecord): Option[DecodedMedia] = {
    val img =
      // NonFatal, not just IOException: ImageIO plugins throw runtime
      // exceptions (IllegalArgumentException, CMMException, AIOOBE) on
      // some corrupt/exotic payloads; one bad record must fall back to
      // the stub, not crash the job
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      catch { case scala.util.control.NonFatal(_) => null }
    Option(img).map { im =>
      DecodedMedia(r.docId, r.mediaType, r.payload.length.toLong,
        im.getWidth, im.getHeight, 1, bandLuminance(im))
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

  /** Container-level video metadata — everything a training pipeline's
    * bookkeeping (dedup keys, resolution filters, duration quotas,
    * frame-sampling plans) needs, recovered WITHOUT a codec.
    */
  private[graft] case class VideoMeta(width: Int, height: Int,
      nFrames: Int, durationMs: Long)

  // big-endian readers over the payload (MP4 is big-endian); unsigned
  // 32-bit values come back as Long so a >2GiB box size cannot go
  // negative
  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)
  // little-endian (AVI / RIFF)
  private def le32(b: Array[Byte], o: Int): Long =
    ((b(o + 3) & 0xffL) << 24) | ((b(o + 2) & 0xffL) << 16) |
      ((b(o + 1) & 0xffL) << 8) | (b(o) & 0xffL)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "ISO-8859-1")

  /** MP4 / ISO BMFF box walk (ISO 14496-12 box grammar): size(4) +
    * type(4) headers, size==1 → 64-bit largesize, size==0 → to end of
    * enclosing box; `moov/mvhd` yields the movie timescale + duration,
    * each `trak`'s `tkhd` its 16.16-fixed width/height, and the VIDEO
    * trak's (the one with nonzero dimensions) `stbl/stts` entries sum
    * to the frame count. Unknown boxes skip by size — the format's own
    * forward-compat rule — and any malformed size aborts the walk with
    * whatever was recovered so far. None unless the payload leads with
    * a well-formed known top-level box (ftyp/styp/moov/...), so junk
    * bytes fall to the caller's stub path.
    */
  private[graft] def parseMp4Meta(b: Array[Byte]): Option[VideoMeta] = {
    val n = b.length
    if (n < 8) return None
    val lead = fourcc(b, 4)
    if (!Set("ftyp", "styp", "moov", "mdat", "free", "skip", "wide",
        "pdin", "sidx", "moof").contains(lead)) return None
    var timescale = 0L
    var durationTicks = 0L
    var width = 0
    var height = 0
    var frames = 0
    // walk [start, end) as a sequence of boxes, recursing into the
    // container types on the moov → trak → mdia → minf → stbl spine
    def walk(start: Long, end: Long, inVideoTrak: Boolean): Unit = {
      var off = start
      while (off + 8 <= end) {
        var size = be32(b, off.toInt)
        val typ = fourcc(b, off.toInt + 4)
        var hdr = 8L
        if (size == 1L) {
          if (off + 16 > end) return
          size = be64(b, off.toInt + 8); hdr = 16L
        } else if (size == 0L) size = end - off
        if (size < hdr || off + size > end) return
        val body = (off + hdr).toInt
        val bodyEnd = off + size
        typ match {
          case "moov" | "mdia" | "minf" | "stbl" =>
            walk(off + hdr, bodyEnd, inVideoTrak)
          case "trak" =>
            // two passes: tkhd decides whether this trak is the video
            // one; only then do its stts samples count as frames
            val saveW = width; val saveH = height
            width = 0; height = 0
            walk(off + hdr, bodyEnd, inVideoTrak = false) // tkhd only
            val isVideo = width > 0 && height > 0
            if (!isVideo) { width = saveW; height = saveH }
            else walk(off + hdr, bodyEnd, inVideoTrak = true) // stts pass
          case "mvhd" if bodyEnd - body >= 20 =>
            val v = b(body) & 0xff
            if (v == 1 && bodyEnd - body >= 32) {
              timescale = be32(b, body + 20)
              durationTicks = be64(b, body + 24)
            } else {
              timescale = be32(b, body + 12)
              durationTicks = be32(b, body + 16)
            }
          case "tkhd" =>
            val v = b(body) & 0xff
            val wOff = if (v == 1) body + 88 else body + 76
            if (wOff + 8 <= bodyEnd) {
              // 16.16 fixed point; fractional halves round up
              width = ((be32(b, wOff) + 0x8000L) >> 16).toInt
              height = ((be32(b, wOff + 4) + 0x8000L) >> 16).toInt
            }
          case "stts" if inVideoTrak && bodyEnd - body >= 8 =>
            val entries = be32(b, body + 4)
            var i = 0L
            var p = body + 8L
            var acc = 0L
            while (i < entries && p + 8 <= bodyEnd) {
              acc += be32(b, p.toInt)
              i += 1; p += 8
            }
            frames = math.min(acc, Int.MaxValue.toLong).toInt
          case _ => () // skip by size
        }
        off += size
      }
    }
    walk(0L, n.toLong, inVideoTrak = false)
    if (timescale <= 0 && width == 0 && height == 0) None
    else Some(VideoMeta(width, height, frames,
      if (timescale > 0) durationTicks * 1000L / timescale else 0L))
  }

  /** AVI RIFF header parse: `RIFF<size>AVI ` then even-padded
    * `<fourcc><le32 size>` chunks; the `hdrl` LIST's `avih`
    * (MainAVIHeader) carries dwMicroSecPerFrame, dwTotalFrames,
    * dwWidth, dwHeight — all little-endian. None unless the RIFF/AVI
    * magic matches.
    */
  private[graft] def parseAviMeta(b: Array[Byte]): Option[VideoMeta] = {
    val n = b.length
    if (n < 12 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ") return None
    var out: Option[VideoMeta] = None
    def walk(start: Long, end: Long): Unit = {
      var off = start
      while (off + 8 <= end && out.isEmpty) {
        val fcc = fourcc(b, off.toInt)
        val size = le32(b, off.toInt + 4)
        val body = off + 8
        if (body + size > end) return
        if (fcc == "LIST" && size >= 4) {
          // LIST payload = 4cc list type + children
          walk(body + 4, body + size)
        } else if (fcc == "avih" && size >= 40) {
          val o = body.toInt
          val usPerFrame = le32(b, o)
          val totalFrames = le32(b, o + 16)
          val w = le32(b, o + 32).toInt
          val h = le32(b, o + 36).toInt
          out = Some(VideoMeta(w, h,
            math.min(totalFrames, Int.MaxValue.toLong).toInt,
            totalFrames * usPerFrame / 1000L))
        }
        off = body + size + (size & 1L) // chunks pad to even
      }
    }
    walk(12L, n.toLong)
    out
  }

  /** Uniform sample cap for per-frame MJPEG decode: enough frames for
    * a stable mean feature, bounded work per record.
    */
  private[graft] val MaxSampledFrames = 4

  /** `movi` LIST walk: the byte ranges of the video stream's frame
    * chunks — fourcc `NNdc`/`NNdb` (compressed/uncompressed video
    * data for stream NN), even-padded like every RIFF chunk, with
    * nested `rec ` LISTs recursed into. Uniformly samples at most
    * `maxSample` frames (always including the first) so per-record
    * work is bounded regardless of video length. Offsets, not copies,
    * until the sample is chosen.
    */
  private[graft] def parseAviVideoFrames(b: Array[Byte],
      maxSample: Int): Seq[Array[Byte]] = {
    val n = b.length
    if (n < 12 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ")
      return Nil
    val found = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    def isVideoChunk(fcc: String): Boolean =
      fcc.length == 4 && fcc(0).isDigit && fcc(1).isDigit &&
        fcc(2) == 'd' && (fcc(3) == 'c' || fcc(3) == 'b')
    def walk(start: Long, end: Long, inMovi: Boolean): Unit = {
      var off = start
      while (off + 8 <= end) {
        val fcc = fourcc(b, off.toInt)
        val size = le32(b, off.toInt + 4)
        val body = off + 8
        if (body + size > end) return
        if (fcc == "LIST" && size >= 4) {
          val listType = fourcc(b, body.toInt)
          walk(body + 4, body + size,
            inMovi || listType == "movi" || listType == "rec ")
        } else if (inMovi && isVideoChunk(fcc) && size > 0) {
          found += ((body.toInt, size.toInt))
        }
        off = body + size + (size & 1L) // chunks pad to even
      }
    }
    walk(12L, n.toLong, inMovi = false)
    val cnt = found.length
    if (cnt == 0) Nil
    else {
      val take = math.min(maxSample, cnt)
      (0 until take).map { i =>
        val (o, sz) = found(i * cnt / take)
        java.util.Arrays.copyOfRange(b, o, o + sz)
      }
    }
  }

  /** REAL video container metadata (MP4 box walk, then AVI RIFF):
    * true width/height/frame-count/duration into the typed schema.
    * For MJPEG-in-AVI the FRAME payloads decode too — each sampled
    * `movi` video chunk is a complete JPEG the JDK's javax.imageio
    * path already parses — and the feature vector is the element-wise
    * mean of the per-frame band-luminance features (the still-image
    * feature, applied per frame). Width/height fall back to the first
    * decoded frame's true dimensions when the header omits them. For
    * codecs the JDK cannot parse (H.264 etc.) the features remain the
    * deterministic stub's — the one documented stub seam left. None
    * when neither container grammar matches.
    */
  private[graft] def decodeVideo(r: MediaRecord): Option[DecodedMedia] =
    (try parseMp4Meta(r.payload).map((_, Seq.empty[Array[Byte]]))
       .orElse(parseAviMeta(r.payload).map(m =>
         (m, parseAviVideoFrames(r.payload, MaxSampledFrames))))
     catch { case scala.util.control.NonFatal(_) => None })
      .map { case (m, frameBytes) =>
        val frames = frameBytes.flatMap { fb =>
          try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(fb)))
          catch { case scala.util.control.NonFatal(_) => None }
        }
        val feats =
          if (frames.isEmpty) decodeStub(r).features
          else {
            val per = frames.map(bandLuminance)
            val out = new Array[Float](FeatureDim)
            var i = 0
            while (i < FeatureDim) {
              var s = 0.0
              per.foreach(p => s += p(i))
              out(i) = (s / per.length).toFloat
              i += 1
            }
            out
          }
        // trust the container header only when BOTH dimensions are
        // plausible — a header reporting width>0 with height==0 (or
        // vice versa) is bogus, and a decoded MJPEG frame knows its
        // true geometry
        val (w, h) =
          if ((m.width > 0 && m.height > 0) || frames.isEmpty)
            (m.width, m.height)
          else (frames.head.getWidth, frames.head.getHeight)
        DecodedMedia(r.docId, r.mediaType, r.payload.length.toLong,
          w, h, m.nFrames, feats, durationMs = m.durationMs)
      }

  /** Per-record dispatch: payloads typed `image/...` go through the
    * real JDK image decode, `audio/...` through the real JDK audio
    * decode, `video/...` through the codec-free container-metadata
    * parse (MP4/AVI); unparseable bytes fall back to the
    * deterministic stub.
    */
  private[graft] def decodeRecord(r: MediaRecord): DecodedMedia =
    if (r.mediaType.startsWith("image/")) decodeImage(r).getOrElse(decodeStub(r))
    else if (r.mediaType.startsWith("audio/")) decodeAudio(r).getOrElse(decodeStub(r))
    else if (r.mediaType.startsWith("video/")) decodeVideo(r).getOrElse(decodeStub(r))
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

  /** dHash64 of a DECODED image: horizontal gradient sign on a 9x8
    * block grid — invariant to any monotone per-pixel tone map.
    * Factored out of [[perceptualHash]] so the video fingerprint
    * applies the identical per-frame hash (one dHash implementation,
    * two modalities — the fingerprintPairs discipline one level
    * down).
    */
  private[graft] def dHash64(im: java.awt.image.BufferedImage): Long = {
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
    dHash
  }

  /** 64-bit perceptual hashes of an image payload via the REAL JDK
    * decode: aHash (bit = 8x8 block mean above the global mean — both
    * shift equally under uniform brightness change, so the hash is
    * brightness-invariant) and dHash ([[dHash64]]). None when no
    * registered reader parses the bytes.
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
      (aHash, dHash64(im))
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
    * Fingerprint-cache lifecycle: see [[materializedFps]] —
    * `snapshotPath = None` (default) holds one localCheckpoint per
    * call until the session's checkpoint drain; pass a path for
    * long-lived or multi-executor sessions.
    */
  def imageNearDupPairs(media: Dataset[MediaRecord], hammingMax: Int = 6,
      maxBucket: Int = graft.api.DedupOps.DefaultMaxBucket,
      snapshotPath: Option[String] = None): DataFrame =
    graft.api.DedupOps.fingerprintPairs(
      materializedFps(imageHashes(media)
        .select(col("doc_id"), col("dhash64")), snapshotPath),
      "doc_id", "dhash64", bits = 64,
      hammingMax = hammingMax, maxBucket = maxBucket)

  /** Materialize a (doc_id, hash) fingerprint frame ONCE before the
    * pair engine: [[graft.api.DedupOps.fingerprintPairs]] reads its
    * input THREE times (band explode + both verify sides), and for
    * the media modalities that input is a mapPartitions DECODE — not
    * below any exchange, so nothing dedupes the re-evaluations and
    * the full container-walk + frame-decode would run up to 3× per
    * pair query (and a nondeterministic 1–3× across runs as join
    * strategies shift — the round-15 q140 SCALE-band adjudication
    * caught exactly this). The frame is 2 longs/doc. Two strategies,
    * the [[graft.streaming.GateSnapshot]] pair:
    *
    *   - `None` (default): `localCheckpoint` — right for bench loops
    *     and short sessions, but NON-RECOMPUTABLE (an executor lost
    *     mid-query fails the job) and the blocks release only under
    *     the session's checkpoint-drain discipline
    *     ([[graft.BenchHarness.drainLocalCheckpoints]]) — a
    *     long-lived session calling the nearDupPairs entry points
    *     repeatedly WITHOUT draining pins one cached frame per call.
    *   - `Some(path)`: the fingerprint frame writes to the
    *     caller-owned path and the pair engine reads the FILES —
    *     executor loss recomputes from parquet, a checkpoint drain
    *     cannot touch it, and releasing is deleting the path. The
    *     deployment shape for long-lived sessions.
    */
  private def materializedFps(fps: DataFrame,
      snapshotPath: Option[String]): DataFrame =
    snapshotPath match {
      case Some(p) => graft.streaming.GateSnapshot.toPath(fps, p)
      case None    => fps.localCheckpoint()
    }

  /** Deterministic 16×16 grayscale 24-bit BMP from a byte seed: image
    * pixel (x, y) has gray value `seed((y*16 + x) mod seed.length)`
    * (unsigned). A REAL image container (ImageIO's BMP reader decodes
    * it losslessly — 24-bit BMP is uncompressed BGR, rows stored
    * bottom-up, row stride 48 = already 4-byte aligned), so everything
    * downstream of [[documentsAsBmpMedia]] exercises the genuine
    * decode path while staying derivable from first principles by the
    * DuckDB oracle (the q133/q134 contract: if the decode corrupted a
    * single pixel, the cross-engine hash compare would catch it).
    */
  private[graft] def grayBmp16(seed: Array[Byte]): Array[Byte] = {
    val w = 16; val h = 16
    val rowBytes = w * 3
    val dataSize = rowBytes * h
    val fileSize = 54 + dataSize
    val b = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    var r = 0
    while (r < h) {
      val y = h - 1 - r // bottom-up row order
      var x = 0
      while (x < w) {
        val v =
          if (seed.length == 0) 0
          else seed((y * w + x) % seed.length) & 0xff
        b.put(v.toByte).put(v.toByte).put(v.toByte)
        x += 1
      }
      r += 1
    }
    b.array()
  }

  /** Scale-adaptive decode spread (optimization guide §2.5 "input
    * skew"/§6): media decode stages are CHEAP-INPUT/EXPENSIVE-MAP —
    * split packing sizes scan tasks by input BYTES, so a small
    * payload-seed table yields 1–3 scan tasks and the container walk +
    * frame decode (the dominant cost, ~10³× the scan) runs on that
    * many cores. When the scan produced fewer partitions than the
    * session's cores, spread the pre-decode rows round-robin across
    * the cores; at production scale the scan has ≫ cores splits and
    * this is a no-op (no exchange is added). Applied to the image and
    * video builders (ImageIO frame decodes); measured and deliberately
    * NOT applied to the audio builder — the 8-bit PCM header parse is
    * cheaper than the exchange it would ride (q135 0.30 → 0.56 s with
    * the spread, round-16 A/B).
    */
  private def spreadForDecode(ds: Dataset[MediaRecord]): Dataset[MediaRecord] =
    // shared shuffle-free-gated width probe (ADVICE r16: a bare
    // .rdd.getNumPartitions under AQE executes-and-discards any shuffle
    // stages in the probed plan; Spread gates the probe to scan-shaped
    // plans, which is what every decode builder feeds)
    graft.api.Spread.ifNarrowDs(ds)

  /** documents → REAL decodable image media: each doc's UTF-8 text
    * bytes seed a [[grayBmp16]] payload (empty/null texts drop — no
    * pixels to derive). The distributed builder is mapPartitions like
    * [[decode]]; at 100 TB this stage is replaced by reading the real
    * image bytes off the object store and the downstream hash/dedup
    * operators are unchanged.
    */
  def documentsAsBmpMedia(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .filter(col("text").isNotNull && length(col("text")) >= 1)
      .select(col("doc_id").as("docId"), lit("image/bmp").as("mediaType"),
        col("text").cast("binary").as("payload"))
      .as[MediaRecord]
      .transform(spreadForDecode)
      .mapPartitions(_.map(r => r.copy(payload = grayBmp16(r.payload))))
  }

  // ---- audio fingerprinting (real decode path) --------------------------

  /** Deterministic 8-bit unsigned mono PCM WAV (8 kHz, 256 samples)
    * from a byte seed: sample j IS `seed(j mod seed.length)` — 8-bit
    * WAV samples are unsigned bytes, so the container stores the seed
    * verbatim behind a genuine RIFF/fmt/data header the JDK audio
    * stack parses. The audio sibling of [[grayBmp16]], built for the
    * same contract: the q135/q136 oracle derives the fingerprint from
    * the seed bytes by first principles, so the REAL container decode
    * is what the cross-engine compare gates.
    */
  private[graft] def pcmWav8(seed: Array[Byte]): Array[Byte] = {
    val n = 256
    val b = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(8000)
      .putShort(1).putShort(8)
      .put("data".getBytes("US-ASCII")).putInt(n)
    var j = 0
    while (j < n) {
      b.put(if (seed.length == 0) 0.toByte else seed(j % seed.length))
      j += 1
    }
    b.array()
  }

  /** 64-bit audio envelope fingerprint via the REAL JDK decode: the
    * payload parses through AudioSystem, samples extract in the
    * stream's OWN width when it is 8-bit PCM (|v − 128| for unsigned,
    * |v| for signed — the JDK's 8→16 widener is round(d·32767/127) on
    * the positive side, a per-sample rounding that would break the
    * exact first-principles replay; the native read keeps the law
    * integer-exact, and the container parse is still the genuine
    * decode under test) and through [[decodeAudio]]'s 16-bit
    * normalize for every other encoding. 64 equal-split windows of
    * mean |amplitude| threshold against the global mean — bit w set
    * iff window w's mean strictly exceeds it (the aHash discipline on
    * the time axis: uniform gain shifts every window and the global
    * mean together, so the fingerprint is volume-invariant). All bit
    * decisions are integer cross-multiplications of |sample| sums
    * (the q135/q136 oracle replays them; MediaSpec pins the law).
    * None when the JDK parses no audio from the bytes.
    */
  private[graft] def envelopeHash(r: MediaRecord): Option[Long] = {
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      catch { case scala.util.control.NonFatal(_) => null }
    Option(ais).flatMap { in =>
      try {
        val src = in.getFormat
        val enc = src.getEncoding
        val native8 = src.getSampleSizeInBits == 8 &&
          (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED ||
            enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
        val (bytes, bytesPerSample, absSample) =
          if (native8) {
            val bs = in.readAllBytes()
            val unsigned =
              enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
            (bs, 1, (i: Int) =>
              if (unsigned) math.abs((bs(i) & 0xff) - 128).toLong
              else math.abs(bs(i).toLong))
          } else {
            val target = new javax.sound.sampled.AudioFormat(
              src.getSampleRate, 16, src.getChannels, true, false)
            val bs = javax.sound.sampled.AudioSystem
              .getAudioInputStream(target, in).readAllBytes()
            (bs, 2, (i: Int) => math.abs(
              ((bs(i) & 0xff) | (bs(i + 1) << 8)).toShort.toLong))
          }
        val ch = src.getChannels
        val frameSize = bytesPerSample * ch
        val nFrames = bytes.length / frameSize
        if (nFrames == 0) None
        else {
          val wsum = new Array[Long](64)
          val wcnt = new Array[Long](64)
          var w = 0
          while (w < 64) {
            val f0 = (w.toLong * nFrames / 64).toInt
            val f1 = math.max(f0 + 1, ((w + 1).toLong * nFrames / 64).toInt)
            var f = f0
            while (f < math.min(f1, nFrames)) {
              var c = 0
              while (c < ch) {
                wsum(w) += absSample(f * frameSize + bytesPerSample * c)
                wcnt(w) += 1
                c += 1
              }
              f += 1
            }
            w += 1
          }
          val total = wsum.sum
          val totCnt = wcnt.sum
          var h = 0L
          var i = 0
          while (i < 64) {
            if (wcnt(i) > 0 && wsum(i) * totCnt > total * wcnt(i))
              h |= 1L << i
            i += 1
          }
          Some(h)
        }
      } catch { case scala.util.control.NonFatal(_) => None }
      finally in.close()
    }
  }

  /** Audio fingerprint table: doc_id, envhash64 — one row per payload
    * the JDK audio stack parses (others drop; callers needing them
    * left-join back). Map-only, [[decode]]-shaped. */
  def audioFingerprints(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap(r => envelopeHash(r).map(h => (r.docId, h)))
    }.toDF("doc_id", "envhash64")
  }

  /** Near-duplicate audio pairs: envelope-hash-64 hamming with the
    * SAME pigeonhole-lossless blocking + capped-bucket contract as
    * the image (q134) and text (q54) modalities — one pair engine,
    * three modalities. Output: doc_a, doc_b, hamming.
    * Fingerprint-cache lifecycle: see [[materializedFps]]. */
  def audioNearDupPairs(media: Dataset[MediaRecord], hammingMax: Int = 6,
      maxBucket: Int = graft.api.DedupOps.DefaultMaxBucket,
      snapshotPath: Option[String] = None): DataFrame =
    graft.api.DedupOps.fingerprintPairs(
      materializedFps(audioFingerprints(media), snapshotPath),
      "doc_id", "envhash64",
      bits = 64, hammingMax = hammingMax, maxBucket = maxBucket)

  /** documents → REAL decodable audio media: each doc's UTF-8 text
    * bytes seed a [[pcmWav8]] payload (the [[documentsAsBmpMedia]]
    * contract on the audio axis). */
  def documentsAsWavMedia(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .filter(col("text").isNotNull && length(col("text")) >= 1)
      .select(col("doc_id").as("docId"), lit("audio/wav").as("mediaType"),
        col("text").cast("binary").as("payload"))
      .as[MediaRecord]
      .mapPartitions(_.map(r => r.copy(payload = pcmWav8(r.payload))))
  }

  // ---- video fingerprinting (real container walk + frame decode) -------

  /** 64-bit video fingerprint via the REAL container walk + frame
    * decode: [[parseAviVideoFrames]] samples at most
    * [[MaxSampledFrames]] video chunks off the RIFF `movi` walk
    * (uniform `i*cnt/take` indices, first frame always included),
    * each sampled chunk decodes through javax.imageio (MJPEG's
    * JPEG-per-frame, or any registered reader), and bit i of the
    * fingerprint is the strict MAJORITY of the sampled frames'
    * [[dHash64]] bit i (`2*cnt > k` over the k frames that decoded) —
    * stable under re-encoding or replacing a minority of frames
    * (inserted intro/outro, transcoded stragglers), the q134
    * tone-map-invariant gradient hash lifted to the time axis. None
    * when no sampled frame decodes.
    */
  private[graft] def videoFingerprint(r: MediaRecord): Option[Long] = {
    val frames =
      try parseAviVideoFrames(r.payload, MaxSampledFrames)
      catch { case scala.util.control.NonFatal(_) => Nil }
    val hashes = frames.flatMap { fb =>
      (try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(fb)))
       catch { case scala.util.control.NonFatal(_) => None }).map(dHash64)
    }
    if (hashes.isEmpty) None
    else {
      val k = hashes.length
      var h = 0L
      var i = 0
      while (i < 64) {
        var cnt = 0
        hashes.foreach(x => if (((x >>> i) & 1L) == 1L) cnt += 1)
        if (2 * cnt > k) h |= 1L << i
        i += 1
      }
      Some(h)
    }
  }

  /** Video fingerprint table: doc_id, vhash64 — one row per payload
    * with >= 1 decodable sampled frame (others drop; callers needing
    * them left-join back). Map-only, [[decode]]-shaped: the container
    * walk, frame sampling, and per-frame decode all happen inside one
    * mapPartitions — zero shuffles at any corpus size. */
  def videoFingerprints(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap(r => videoFingerprint(r).map(h => (r.docId, h)))
    }.toDF("doc_id", "vhash64")
  }

  /** Near-duplicate video pairs: majority-dHash-64 hamming with the
    * SAME pigeonhole-lossless blocking + capped-bucket contract as
    * the text (q54), image (q134), and audio (q136) modalities — ONE
    * pair engine, four modalities. Output: doc_a, doc_b, hamming.
    * Fingerprint-cache lifecycle: see [[materializedFps]]. */
  def videoNearDupPairs(media: Dataset[MediaRecord], hammingMax: Int = 6,
      maxBucket: Int = graft.api.DedupOps.DefaultMaxBucket,
      snapshotPath: Option[String] = None): DataFrame =
    graft.api.DedupOps.fingerprintPairs(
      materializedFps(videoFingerprints(media), snapshotPath),
      "doc_id", "vhash64",
      bits = 64, hammingMax = hammingMax, maxBucket = maxBucket)

  /** Frame count of the deterministic doc→AVI fixture: 6 frames with
    * [[MaxSampledFrames]] = 4 makes the uniform sampler pick frames
    * {0, 1, 3, 4} (`i*6/4`) — a GENUINE sampling decision the q139
    * oracle replays, so a drifted sampler (off-by-one, tail-biased)
    * flips the cross-engine compare instead of passing vacuously the
    * way an all-frames fixture would.
    */
  private[graft] val VideoFixtureFrames = 6

  /** Deterministic doc→AVI fixture: a genuine RIFF AVI container
    * (hdrl/avih header + movi LIST, even-padded chunks) whose
    * [[VideoFixtureFrames]] `00dc` video chunks are each a complete
    * [[grayBmp16]] — frame f's pixel (x, y) is byte
    * ((f + y*16 + x) mod n) of the seed (the seed rotated by f:
    * consecutive frames near-identical, the way consecutive video
    * frames are). BMP frames keep every decoded pixel derivable from
    * first principles by the q139/q140 DuckDB oracles (the
    * [[grayBmp16]] contract lifted to a container-of-containers),
    * while the walk + sample + decode + majority path under test is
    * byte-for-byte the one real MJPEG takes — MediaSpec pins
    * [[videoFingerprint]] over ImageIO-written JPEG frames too.
    */
  private[graft] def bmpAvi16(seed: Array[Byte],
      nFrames: Int = VideoFixtureFrames): Array[Byte] = {
    val frames = (0 until nFrames).map { f =>
      val n = seed.length
      val rot =
        if (n == 0) seed
        else Array.tabulate[Byte](n)(j => seed((j + f) % n))
      grayBmp16(rot)
    }
    val avihLen = 56
    val hdrlLen = 4 + 8 + avihLen          // "hdrl" + avih chunk
    val moviLen = 4 + frames.map(fr => 8 + fr.length + (fr.length & 1)).sum
    val riffLen = 4 + (8 + hdrlLen) + (8 + moviLen) // "AVI " + LISTs
    val b = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def put4(s: String): Unit = b.put(s.getBytes("US-ASCII"))
    put4("RIFF"); b.putInt(riffLen); put4("AVI ")
    put4("LIST"); b.putInt(hdrlLen); put4("hdrl")
    put4("avih"); b.putInt(avihLen)
    b.putInt(40000)            // usPerFrame (25 fps)
    b.putInt(0).putInt(0).putInt(0) // maxBytesPerSec, padding, flags
    b.putInt(nFrames)          // totalFrames
    b.putInt(0).putInt(1).putInt(0) // initialFrames, streams, bufSize
    b.putInt(16).putInt(16)    // width, height
    b.putInt(0).putInt(0).putInt(0).putInt(0) // reserved
    put4("LIST"); b.putInt(moviLen); put4("movi")
    frames.foreach { fr =>
      put4("00dc"); b.putInt(fr.length); b.put(fr)
      if ((fr.length & 1) == 1) b.put(0.toByte) // RIFF even padding
    }
    b.array()
  }

  /** documents → REAL decodable video media: each doc's UTF-8 text
    * bytes seed a [[bmpAvi16]] payload (the [[documentsAsBmpMedia]]
    * contract on the video axis). At 100 TB this stage is replaced by
    * reading the real video bytes off the object store; the container
    * walk, frame sampler, and near-dup operators are unchanged. */
  def documentsAsAviMedia(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .filter(col("text").isNotNull && length(col("text")) >= 1)
      .select(col("doc_id").as("docId"), lit("video/avi").as("mediaType"),
        col("text").cast("binary").as("payload"))
      .as[MediaRecord]
      .transform(spreadForDecode)
      .mapPartitions(_.map(r => r.copy(payload = bmpAvi16(r.payload))))
  }

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

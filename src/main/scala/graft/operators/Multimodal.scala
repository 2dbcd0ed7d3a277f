package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque binary columns with
  * typed decoded metadata + features.
  *
  * The Spark-side contract is real — binary payload column, typed
  * output schema, per-partition batched decode (the shape a JNI/FFI
  * image library needs: one context per partition, not per row). The
  * decode itself is a DETERMINISTIC STUB (this container has no image/
  * audio codecs): it derives fake dimensions and a fake feature vector
  * from the bytes. Swap `decodeStub` for a real codec without touching
  * the plumbing.
  */
object Multimodal {

  /** Opaque media record: payload + source metadata. */
  case class MediaRecord(docId: Long, mediaType: String, payload: Array[Byte])

  /** Decoded output: typed metadata + fixed-width feature vector. */
  case class DecodedMedia(
      docId: Long,
      mediaType: String,
      nBytes: Long,
      width: Int,
      height: Int,
      nFrames: Int,
      features: Array[Float])

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

  /** Per-record dispatch: payloads typed `image/...` go through the
    * real JDK decode, anything else (and unparseable image bytes)
    * through the deterministic stub — audio/video codecs are not in
    * this container.
    */
  private[graft] def decodeRecord(r: MediaRecord): DecodedMedia =
    if (r.mediaType.startsWith("image/")) decodeImage(r).getOrElse(decodeStub(r))
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

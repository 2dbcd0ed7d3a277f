package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Substage attribution for the q139/q140 video SCALE ratios (the
  * round-14 verdict's watch item #2: q140's k=10 ratio drifted from
  * its 4.0–5.0× history to 5.9–9.3× across exclusive runs while q139
  * stayed in band). Splits q140's cost into its two physical stages:
  *
  *   - DECODE: [[graft.operators.Multimodal.videoFingerprints]] over
  *     the AVI fixture — container walk + 4-frame BMP decode per doc,
  *     map-only, honestly corpus-proportional;
  *   - PAIRS: [[graft.api.DedupOps.fingerprintPairs]] over the
  *     PRE-MATERIALIZED fingerprints (localCheckpoint, so no decode
  *     re-run inside the timed thunk) — banded buckets + caps +
  *     verify, the stage whose growth is bucket-geometry-shaped.
  *
  * Run exclusively (nothing else on the host):
  * {{{ sbt "runMain graft.VideoSubstageMeasure" }}}
  * prints one JSON line with min-of-3 seconds per (stage, scale) and
  * the per-stage ratios. SCALE.md records the adjudication.
  */
object VideoSubstageMeasure {
  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = sys.env.getOrElse("SPARK_GRAFT_SCALE_K", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", BenchHarness.ansiEnabled)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val outDir = java.nio.file.Files
      .createTempDirectory("graft-videoscale-").toString
    BenchScale.scaleTables(spark, baseDir, outDir, k)

    def minOf3(thunk: () => Long): (Double, Long) = {
      var best = Double.MaxValue
      var rows = 0L
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        rows = thunk()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        BenchHarness.drainLocalCheckpoints(spark)
      }
      (best, rows)
    }
    def decodeOf(dir: String) = minOf3(() =>
      graft.operators.Multimodal.videoFingerprints(
        graft.operators.Multimodal.documentsAsAviMedia(spark, dir)).count())
    // pairs stage over PRE-materialized fingerprints — decode excluded
    def pairsOf(dir: String) = {
      val fps = graft.operators.Multimodal.videoFingerprints(
        graft.operators.Multimodal.documentsAsAviMedia(spark, dir))
        .localCheckpoint()
      // cache-owned: the in-run drain must not truncate the frame the
      // next timed run still reads
      graft.api.Lifecycle.registerCacheOwned(fps)
      val r = minOf3(() => graft.api.DedupOps.fingerprintPairs(
        fps, "doc_id", "vhash64", bits = 64, hammingMax = 6).count())
      graft.api.Lifecycle.releaseLocalCheckpoint(fps)
      r
    }
    val (decB, nB) = decodeOf(baseDir)
    val (decS, nS) = decodeOf(outDir)
    val (prB, pB) = pairsOf(baseDir)
    val (prS, pS) = pairsOf(outDir)
    import BenchHarness.num
    def ratio(b: Double, s: Double) = if (b <= 0) -1.0 else s / math.max(b, 0.15)
    println(s"""{"metric":"video_substages","k":$k,"base":"$baseDir",""" +
      s""""decode":{"base":${num(decB)},"scaled":${num(decS)},"ratio":${num(ratio(decB, decS))},"rows_base":$nB,"rows_scaled":$nS},""" +
      s""""pairs":{"base":${num(prB)},"scaled":${num(prS)},"ratio":${num(ratio(prB, prS))},"pairs_base":$pB,"pairs_scaled":$pS}}""")
    spark.stop()
  }
}

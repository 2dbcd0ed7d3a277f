package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Records the measured in-band recall/overlap minima that
  * [[graft.queries.AnnFloors]] pins its per-SF floors against
  * (floor = measured minimum − 1). Run:
  *
  * {{{
  * sbt "runMain graft.AnnFloorMeasure /root/testdata/sf0.001 \
  *   /root/testdata/sf0.01 /root/testdata/sf0.1"
  * }}}
  *
  * Prints one line per (query, sf): the per-query-minimum recall@10
  * (q94/q99/q115) or brute-overlap-of-10 (q114/q129). The retrieval
  * pipelines are deterministic (seeded KMeans with sorted centroids,
  * fixed rank tie-breaks), so repeated runs print identical minima —
  * re-run after any change to the embedding, PQ, routing, or fusion
  * code and re-pin AnnFloors if a minimum legitimately moved.
  *
  * Measured 2026-08-15 (three consecutive runs per SF, all three
  * identical on every cell; REMEASURED the same day at
  * SPARK_GRAFT_CPUS=4 and =32 — every cell identical to the
  * default-16 table below, so the minima are parallelism-invariant
  * across the {4, 16, 32} config set [[graft.queries.AnnFloors]]
  * accepts; any other parallelism falls back to conservative floors):
  *
  * | query (per-query minimum)      | sf0.001 | sf0.01 | sf0.1 |
  * |---|---|---|---|
  * | q94_ann_pq recall@10           | 9 | 9 | 6 |
  * | q99_ann_ivfpq recall@10        | 4 | 4 | 4 |
  * | q115_fold_ivfpq recall@10      | 3 | 5 | 5 |
  * | q114_hybrid overlap-of-10      | 6 | 5 | 4 |
  * | q129_passage overlap-of-10     | 10 | 10 | 6 |
  */
object AnnFloorMeasure {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", BenchHarness.ansiEnabled)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- dirs) {
      val sf = dir.stripSuffix("/").split('/').last
      def minOf(df: org.apache.spark.sql.DataFrame, c: String): Long =
        df.agg(min(col(c))).head().getLong(0)
      println(s"[annfloor] $sf q94_ann_pq min_recall10=" +
        minOf(queries.MlQueries.pqRecallCounts(spark, dir), "recall10"))
      println(s"[annfloor] $sf q99_ann_ivfpq min_recall10=" +
        minOf(queries.MlQueries.ivfPqRecallCounts(spark, dir,
          queries.MlQueries.ivfPqIndexDir(spark, dir)), "recall10"))
      println(s"[annfloor] $sf q115_fold_ivfpq_probe min_recall10=" +
        minOf(queries.MlQueries.ivfPqRecallCounts(spark, dir,
          queries.MlQueries.foldedIvfPqDir(spark, dir)), "recall10"))
      println(s"[annfloor] $sf q114_hybrid_retrieval_ivfpq min_ov=" +
        minOf(queries.PipelineQueries.hybridIvfPqCounts(spark, dir), "_ov"))
      println(s"[annfloor] $sf q129_passage_retrieval_ivfpq min_ov=" +
        minOf(queries.PipelineQueries.passageIvfPqCounts(spark, dir), "_ov"))
      BenchHarness.drainLocalCheckpoints(spark)
    }
    spark.stop()
  }
}

package graft

/** Benchmark main: runs every catalog query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line (driver contract → BENCH_r{N}.json).
  * Methodology (session config, noop sink, warmup, min-of-two) lives in
  * [[BenchHarness]], shared with [[BenchScale]].
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = BenchHarness.session()
    BenchHarness.warmup(spark, SparkEntry.queries.keys)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, _) =>
      name -> BenchHarness.minOf2(spark, name, sfDir)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

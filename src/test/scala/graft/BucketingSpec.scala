package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.functions.IncrementalAvg

/** Scale mechanics that COVERAGE.md promises: bucketed co-located joins
  * (no shuffle at join time — the 100TB repeated-join pattern) and the
  * typed Aggregator surface.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join with zero shuffle exchanges") {
    // warehouse dir is a static conf; use the session default and drop
    // the tables (and their files) afterwards
    import spark.implicits._
    val n = 10000
    (1 to n).map(i => (i.toLong, s"left_$i")).toDF("k", "lv")
      .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("graft_bl")
    (1 to n).map(i => (i.toLong, i * 2L)).toDF("k", "rv")
      .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("graft_br")
    try {
      val joined = spark.table("graft_bl").join(spark.table("graft_br"), "k")
      joined.collect()
      def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Int = p.collect {
        case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
        case s: ShuffleExchangeLike   => 1
      }.sum
      assert(shuffles(joined.queryExecution.executedPlan) == 0,
        "bucketed join should not shuffle:\n" +
          joined.queryExecution.executedPlan.treeString)
      assert(joined.count() == n)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bl")
      spark.sql("DROP TABLE IF EXISTS graft_br")
    }
  }

  test("IncrementalAvg == built-in avg, typed and untyped") {
    import spark.implicits._
    val vals = (1L to 999L).toDS()
    val typed = vals.select(IncrementalAvg.toColumn).collect()(0)
    val builtin = vals.agg(avg("value")).collect()(0).getDouble(0)
    assert(typed == builtin)
    // untyped via udaf on a grouped frame, partitioning-invariant
    val u = udaf(IncrementalAvg)
    val df = (1 to 1000).map(i => (i % 7, i.toLong)).toDF("g", "v")
    val a = df.repartition(13).groupBy("g").agg(u(col("v")).as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val b = df.groupBy("g").agg(avg("v").as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(a == b)
  }
}

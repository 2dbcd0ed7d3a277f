package graft

import org.apache.spark.sql.functions._

import graft.operators.Joins

/** saltedJoin must be result-identical to the plain join it replaces. */
class JoinsSpec extends SparkSpec {

  test("saltedJoin == plain join on a skewed key distribution") {
    import spark.implicits._
    // 90% of left rows share one hot key
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i % 50 else 7, i))
      .toDF("k", "payload")
    val small = (0 until 50).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).collect().map(_.toSeq).toSet
    val salted = Joins.saltedJoin(big, small, Seq("k"), buckets = 8)
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("saltedJoin spreads the hot key across buckets") {
    import spark.implicits._
    val big = Seq.fill(1000)((7, 1)).toDF("k", "v")
    val small = Seq((7, "x")).toDF("k", "name")
    val salted = big.withColumn("_salt", (rand(42L) * 8).cast("int"))
    val spread = salted.groupBy("_salt").count().count()
    assert(spread >= 6, s"salt only hit $spread of 8 buckets")
    assert(Joins.saltedJoin(big, small, Seq("k"), 8).count() == 1000)
  }

  test("AQE splits the skewed partition of a shuffle join (the other skew remedy)") {
    // the scale-notes cite AQE skew-join as the runtime complement to
    // saltedJoin — prove the conf path actually engages: one hot key
    // dominating a sort-merge join must come out of AQE with the
    // skew-split marker on the join node
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force SMJ
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ~94% of left rows share key 0 -> one reducer partition far over
      // both the byte threshold and factor x median
      val big = spark.range(200000)
        .selectExpr("CASE WHEN id % 16 < 15 THEN 0 ELSE id END AS k", "id AS v")
      val right = spark.range(2000).selectExpr("id AS k", "id AS w")
      val joined = big.join(right, "k")
      // collect() executes THIS QueryExecution, finalizing AQE in place
      // (a write/count would wrap a fresh plan and leave this one initial)
      joined.collect()
      val s = joined.queryExecution.executedPlan.toString
      assert(s.contains("skew=true"),
        s"no skew-split marker in AQE-final plan:\n$s")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}

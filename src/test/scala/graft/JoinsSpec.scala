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
}

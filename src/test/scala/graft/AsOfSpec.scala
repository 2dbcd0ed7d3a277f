package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** AsOfJoin semantics: equality with the brute-force join+rank spelling,
  * simultaneous-row visibility, no-match drop.
  */
class AsOfSpec extends SparkSpec {

  test("asOf == brute-force join+rank on sf0.001 events") {
    val out = SparkEntry.queries("q33_asof_join")(spark, sf)
      .collect().map(_.toSeq).toSet
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("ts_ns div 1000").as("us"),
        col("event_id"), col("event_type"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("us").as("vus"),
        col("event_id").as("vid"))
    val p = ev.filter(col("event_type") === "purchase")
    val brute = p.join(v, col("user_id") === col("vu") && col("vus") <= col("us"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_id"))
          .orderBy(col("vus").desc, col("vid").desc)))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("us"),
        col("vus"), col("vid"))
      .collect().map(_.toSeq).toSet
    assert(out == brute)
  }

  test("simultaneous right row is visible; later right row is not") {
    import spark.implicits._
    val left = Seq((1L, 100L, 900L)).toDF("k", "ts", "pid")
    val right = Seq((1L, 100L, 7L), (1L, 101L, 8L), (1L, 90L, 5L))
      .toDF("k", "ts", "rid")
    val m = AsOfJoin.asOf(left, right, Seq("k"), "ts", "rid", Seq("ts", "rid"))
      .select("right_rid").collect().map(_.getLong(0)).toSeq
    assert(m == Seq(7L)) // ts=100 matches; ts=101 ignored; 90 superseded
  }

  test("left rows with no prior right row are dropped (inner as-of)") {
    import spark.implicits._
    val left = Seq((1L, 50L, 900L), (2L, 50L, 901L)).toDF("k", "ts", "pid")
    val right = Seq((1L, 60L, 7L)).toDF("k", "ts", "rid")
    assert(AsOfJoin.asOf(left, right, Seq("k"), "ts", "rid", Seq("rid"))
      .count() == 0)
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog helpers over the driver-generated parquet corpus
  * (`/root/testdata/sf*`, see TESTDATA.md). One parquet file per table.
  *
  * All readers keep the scan declarative so Catalyst pushes filters and
  * prunes columns at the parquet level — on a 100 TB corpus the scan is
  * the dominant cost, so nothing here materializes or caches eagerly.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` with its parquet timestamp normalized to the repo-wide
    * event-time contract: `ts_ns` = BIGINT epoch nanoseconds (for
    * oracle-exact integer arithmetic) and `ts` = microsecond
    * TimestampType (Spark's native resolution), so event-time
    * windowing behaves identically to the reference's epoch-ms event
    * time (SURVEY.md §1.3). Handles both corpus generations: the old
    * TIMESTAMP(NANOS) layout (surfaced as a raw Long via the legacy
    * reader flag) and the current timestamp[us] layout (read as
    * TIMESTAMP_NTZ; wall time is UTC — every session here pins
    * spark.sql.session.timeZone=UTC, so the cast is exact).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events").withColumnRenamed("ts", "_ts_raw")
    val ns = raw.schema("_ts_raw").dataType match {
      case org.apache.spark.sql.types.LongType => col("_ts_raw")
      case _ => unix_micros(col("_ts_raw").cast("timestamp")) * lit(1000L)
    }
    raw.withColumn("ts_ns", ns)
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .drop("_ts_raw")
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "embeddings")
}

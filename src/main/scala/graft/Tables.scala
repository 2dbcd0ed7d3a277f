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

  /** `events` with its nanosecond parquet timestamp normalized to a
    * microsecond TimestampType column `ts` (Spark's native resolution),
    * so event-time windowing behaves identically to the reference's
    * epoch-ms event time (SURVEY.md §1.3). The raw nanos survive as
    * `ts_ns` for oracle-exact second arithmetic.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // The corpus writes TIMESTAMP(NANOS), which Spark's parquet reader
    // rejects unless told to surface it as a raw Long.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
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

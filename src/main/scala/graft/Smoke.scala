package graft

import org.apache.spark.sql.SparkSession

/** Throwaway local smoke: can Spark read every test table (esp. the
  * nanosecond-timestamp events parquet)?
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.001"
    Tables.names.foreach { n =>
      val df = if (n == "events") Tables.events(spark, dir)
               else Tables.load(spark, dir, n)
      println(s"$n :: ${df.schema.simpleString} :: rows=${df.count()}")
    }
    Tables.events(spark, dir).show(3, truncate = false)
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed through the driver contract.
  *
  * @param name    stable key (appears in SparkEntry.queries / CORRECTNESS)
  * @param doc     which SURVEY.md §2 rows this covers
  * @param oracle  DuckDB ANSI-SQL equivalent over the same parquet tables;
  *                None for ops whose output is not exactly SQL-expressible
  *                (approx sketches) — the driver then records rows-only.
  * @param build   the Spark-native implementation
  */
final case class QueryDef(
    name: String,
    doc: String,
    oracle: Option[String],
    build: (SparkSession, String) => DataFrame)

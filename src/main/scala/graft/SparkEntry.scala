package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{ClassifierQueries, CurationQueries, DedupQueries, MlQueries, OlapQueries, PipelineQueries, ReferenceQueries, SketchQueries, StateQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The catalog is assembled from per-domain registries; each QueryDef
  * carries its Spark plan and (when exactly SQL-expressible) its DuckDB
  * oracle. Names and output column names are kept identical between the
  * two formulations — the driver hash-compares column-sorted values.
  */
object SparkEntry {

  val catalog: Seq[QueryDef] =
    ReferenceQueries.all ++ PipelineQueries.all ++ DedupQueries.all ++
      SketchQueries.all ++ MlQueries.all ++ OlapQueries.all ++
      StateQueries.all ++ CurationQueries.all ++ ClassifierQueries.all

  /** Flagship query (HotItems top-N) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q02_hot_items_topn")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.build).toMap

  /** DuckDB-equivalent SQL for every exactly-expressible query. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** Similarity-search API over caller-named embedding columns. Dot
  * products run through the codegen `dot_f` expression (left-to-right
  * double fold — bit-identical to DuckDB's list_dot_product).
  */
object VectorOps {

  /** Casts + pre-computes the L2 norm: idCol, v, nrm. */
  def normalized(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    VectorExpressions.register(df.sparkSession)
    df.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(expr("dot_f(v, v)")))
  }

  /** Brute-force cosine top-k: rows matching `queryPred` are the query
    * set (broadcast), ranked per query with deterministic ties. Output:
    * qid, nid, rn. The recall baseline — LSH/IVF prune at scale.
    */
  def annBruteTopK(df: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int): DataFrame = {
    val base = normalized(df, idCol, vecCol)
    val q = base.filter(queryPred)
      .select(col(idCol).as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val n = base.select(col(idCol).as("nid"), col("v").as("nv"),
      col("nrm").as("nn"))
    broadcast(q).join(n, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (expr("dot_f(qv, nv)") / (col("qn") * col("nn"))).as("sim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("sim").desc, col("nid").asc)).cast("long"))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("rn"))
  }
}

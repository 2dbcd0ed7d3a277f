package graft.queries

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** MLlib-backed operators — the trained-index path of the similarity
  * layer (north star names "Structured Streaming + MLlib").
  */
object MlQueries {

  val all: Seq[QueryDef] = Seq(

    QueryDef(
      "q30_ann_kmeans_ivf",
      "IVF ANN with TRAINED partitions: MLlib KMeans (k=8, fixed seed) " +
        "learns the coarse quantizer instead of q24's fixed centroids; " +
        "vectors carry their cluster id as the pruning key and queries " +
        "probe only their own cell for top-5 by cosine. At 100TB the " +
        "model trains on a sample, assignment is a broadcast-model map, " +
        "and the cell id becomes the parquet partition column — scans " +
        "touch 1/k of the corpus. No SQL oracle (KMeans is iterative, " +
        "engine-specific) — structural invariants asserted in MlSpec.",
      None,
      (s, dir) => {
        graft.functions.VectorExpressions.register(s)
        val base = Tables.embeddings(s, dir)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
          .withColumn("nrm", sqrt(expr("dot_f(v, v)")))
          .withColumn("features", array_to_vector(col("v")))
        val model = new KMeans().setK(8).setSeed(42L).setMaxIter(5)
          .setFeaturesCol("features").setPredictionCol("cell")
          .fit(base)
        val asg = model.transform(base)
          .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
        val q = asg.filter(col("vec_id") >= 100 && col("vec_id") < 110)
          .select(col("vec_id").as("qid"), col("v").as("qv"),
            col("nrm").as("qn"), col("cell").as("qcell"))
        broadcast(q).join(asg,
            col("cell") === col("qcell") && col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("nid"),
            (expr("dot_f(qv, v)") / (col("qn") * col("nrm"))).as("sim"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("qid"))
              .orderBy(col("sim").desc, col("nid").asc)).cast("long"))
          .filter(col("rn") <= 5)
          .select("qid", "nid", "rn")
      })
  )
}

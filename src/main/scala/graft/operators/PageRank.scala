package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer-exact PageRank over an undirected edge list — the
  * power-iteration centrality scorer, expressed as the same
  * vertex-keyed join + partial-aggregated sum per round as
  * [[ConnectedComponents]] (Spark's canonical iterative-graph shape).
  *
  * In a curation pipeline the edges are the near-dup pair graph, and
  * the score is a DENSITY signal: boilerplate/template hubs sit at the
  * center of large duplication neighborhoods and accumulate rank,
  * while isolated chains stay near the floor — the "prune dense
  * regions harder" knob of density-aware data selection, computed
  * from the pair list the dedup stages already derived.
  *
  * Arithmetic is INTEGER throughout so the result is exact and
  * engine-independent (the catalog oracle replays it in DuckDB as an
  * unrolled CTE chain): every vertex starts at `scale`; each round a
  * vertex emits `rank div degree` along every edge (Long floor
  * division — operands are non-negative, so Spark's truncation and
  * DuckDB's floor agree) and collects
  * `(100-dampingPct)*scale div 100  +  dampingPct * sum(incoming) div 100`.
  * Sums are associative Long adds — no float order sensitivity. The
  * undirected symmetrization means no dangling vertices and no
  * zero-in-degree vertices, the two mass leaks the textbook directed
  * formulation has to patch.
  *
  * Cost shape at 100 TB: the edge list is persisted ONCE and never
  * rewritten; the iterated state is one (id, degree, rank) row per
  * vertex. Each round is one shuffle join of edges⋈ranks on the
  * source key plus one partial-aggregated sum keyed by destination —
  * partial aggregation collapses the per-edge contributions
  * map-side, so the shuffle carries vertex-count rows. Ranks are
  * localCheckpointed per round (the iterative-algorithm contract:
  * lineage would otherwise nest every prior round into the plan).
  */
object PageRank {

  /** Default per-vertex starting mass: large enough that `rank div
    * degree` keeps ~9 significant decimal digits against degree in
    * the thousands. Overflow bound: a vertex's rank never exceeds the
    * graph's total mass ≈ |V| × scale, and the hottest intermediate is
    * `dampingPct × in_sum` — so callers with billion-vertex graphs
    * should pass a smaller `scale` (keep dampingPct × |V| × scale
    * under 2^63).
    */
  val Scale = 1000000000000L

  /** Is this edge frame small enough to BROADCAST into the per-round
    * joins instead of caching it pre-partitioned (VERDICT r16 #8)?
    * Decided from the LOGICAL plan's size statistics — file-size-based
    * for parquet-backed graphs, the planner's own broadcast heuristic
    * — so the check costs no job and no extra pass. Unknown or
    * join-inflated stats read as huge and safely keep the partitioned
    * path. On the broadcast path every round's edge⋈state join builds
    * the tiny edge hash table and the state side streams with ZERO
    * exchange (and HITS needs only ONE cached edge copy, halving the
    * #9 footprint); past the threshold nothing changes — the
    * pre-partitioned cache remains the 100 TB shape.
    */
  private[graft] def broadcastableEdges(df: DataFrame): Boolean = {
    val thr = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    thr > 0 &&
      df.queryExecution.optimizedPlan.stats.sizeInBytes <= thr
  }

  /** @return one row per vertex of `edges`: (id, degree, rank) with
    *         rank on the integer `scale` (a vertex with no edges does
    *         not appear — it would hold the constant floor forever).
    */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5, dampingPct: Int = 85,
      scale: Long = Scale): DataFrame = {
    require(iterations >= 1 && dampingPct >= 0 && dampingPct <= 100)
    // the edge list is cached PRE-PARTITIONED on the per-round join
    // key (guide §2.4: operations keyed the same way share one
    // exchange): every round's edges⋈ranks join and the degree
    // aggregate read the cached s-partitioning instead of re-shuffling
    // the edge list once per round — at scale the per-round shuffle
    // drops from edge-count rows to vertex-count rows. A
    // BROADCAST-SIZED graph (logical stats, VERDICT r16 #8) skips the
    // pre-partition entirely and broadcasts the cached edges into each
    // round's join instead — the rank side then streams with no
    // exchange at all.
    val small = broadcastableEdges(edges)
    val sym0 = edges
      .select(col(srcCol).cast("long").as("s"), col(dstCol).cast("long").as("t"))
      .union(edges
        .select(col(dstCol).cast("long").as("s"), col(srcCol).cast("long").as("t")))
    val sym = (if (small) sym0 else sym0.repartition(col("s"))).persist()
    val symJ = if (small) broadcast(sym) else sym
    val deg = sym.groupBy(col("s").as("id"))
      .agg(count(lit(1)).as("degree")).persist()
    val base = (100L - dampingPct) * scale / 100L

    var rank = deg.withColumn("rank", lit(scale))
    for (i <- 1 to iterations) {
      val prev = rank
      val incoming = symJ
        .join(rank.withColumnRenamed("id", "s"), Seq("s"))
        .select(col("t").as("id"), expr("rank div degree").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("in_sum"))
      rank = deg.join(incoming, Seq("id"))
        .select(col("id"), col("degree"),
          (lit(base) + expr(s"($dampingPct * in_sum) div 100")).as("rank"))
        // one job per round; truncates the nested-round lineage
        .localCheckpoint()
      // the new round materialized eagerly off the old one, so the
      // previous round's checkpoint blocks are dead — release them
      // (i > 1 only: round 1's prev is the caller-derived seed, not a
      // checkpoint this loop created). Long-lived sessions calling
      // rank-any-time serving paths would otherwise pin one cached
      // frame per round per call forever (ADVICE r14).
      if (i > 1) graft.api.Lifecycle.releaseLocalCheckpoint(prev)
    }
    // the final checkpointed ranks no longer reference either cache;
    // the final round's checkpoint itself is the RETURN value and
    // stays live for the caller.
    sym.unpersist()
    deg.unpersist()
    rank
  }

  /** Similarity-WEIGHTED PageRank: a vertex splits its rank across
    * neighbors proportionally to edge weight (`rank × w div Σw`
    * instead of `rank div degree`), so a 0.9-Jaccard twin pulls more
    * centrality than a barely-over-threshold neighbor — the weighted
    * refinement of [[ranks]] for similarity graphs, same integer
    * discipline (non-negative Longs, floor division, associative
    * sums) and same per-round plan shape. With UNIFORM weights this
    * is exactly [[ranks]]: floor(r·w / (d·w)) = floor(r / d) —
    * DedupSpec pins the equality. Overflow bound: the hottest term is
    * `rank × w`, so weights on a ×1000 scale tighten [[Scale]]'s |V|
    * bound by 1000× — callers with huge graphs shrink `scale`.
    *
    * @return one row per vertex: (id, w_degree, rank) where w_degree
    *         is the summed incident weight.
    */
  def weightedRanks(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, iterations: Int = 5, dampingPct: Int = 85,
      scale: Long = Scale): DataFrame = {
    require(iterations >= 1 && dampingPct >= 0 && dampingPct <= 100)
    // cached pre-partitioned on the round key (the [[ranks]] argument),
    // or broadcast per round when the graph is broadcast-sized
    val small = broadcastableEdges(edges)
    val sym0 = edges
      .select(col(srcCol).cast("long").as("s"),
        col(dstCol).cast("long").as("t"),
        col(weightCol).cast("long").as("w"))
      .union(edges
        .select(col(dstCol).cast("long").as("s"),
          col(srcCol).cast("long").as("t"),
          col(weightCol).cast("long").as("w")))
    val sym = (if (small) sym0 else sym0.repartition(col("s"))).persist()
    val symJ = if (small) broadcast(sym) else sym
    val deg = sym.groupBy(col("s").as("id"))
      .agg(sum(col("w")).as("w_degree")).persist()
    val base = (100L - dampingPct) * scale / 100L

    var rank = deg.withColumn("rank", lit(scale))
    for (i <- 1 to iterations) {
      val prev = rank
      val incoming = symJ
        .join(rank.withColumnRenamed("id", "s"), Seq("s"))
        .select(col("t").as("id"),
          expr("(rank * w) div w_degree").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("in_sum"))
      rank = deg.join(incoming, Seq("id"))
        .select(col("id"), col("w_degree"),
          (lit(base) + expr(s"($dampingPct * in_sum) div 100")).as("rank"))
        .localCheckpoint()
      // release the dead previous round (the [[ranks]] discipline)
      if (i > 1) graft.api.Lifecycle.releaseLocalCheckpoint(prev)
    }
    sym.unpersist()
    deg.unpersist()
    rank
  }

  /** Integer-exact HITS (Kleinberg hubs-and-authorities) over a
    * DIRECTED edge list — the second classic link-analysis signal a
    * crawl scheduler wants next to [[ranks]]' PageRank: an AUTHORITY
    * score (pointed to by good hubs — fetch its pages sooner) and a
    * HUB score (points at good authorities — mine its outlinks
    * harder). PageRank's single score cannot separate the two roles;
    * directory-style hub hosts and content-authority hosts are
    * exactly the split a frontier scheduler acts on differently.
    *
    * Same engine-exact discipline as [[ranks]], adapted to HITS'
    * mutual recursion: every vertex starts at hub = `scale`; each
    * round computes raw authority in-sums `a_raw(t) = Σ_{(s,t)} h(s)`
    * and renormalizes by the round's MAX — `a = a_raw·scale div
    * max(a_raw)` — then the same for hubs off the new authorities.
    * L∞ normalization instead of the textbook L2: the max is one
    * integer row (exact, broadcast), where an L2 norm needs a square
    * root of a sum of squares — float, order-sensitive, not
    * oracle-replayable. Ranking-equivalent per round (both are a
    * positive scalar rescale of the same vector; only the fixed-point
    * rounding differs and it is identical in both engines).
    * Vertices with no in-edges hold authority 0; no out-edges, hub 0.
    * The in-sums and the `raw × scale` renormalization products run
    * in decimal(38,0) — Long would wrap at in-degree × scale ≈ 2^63,
    * i.e. at ~9M in-links for the default scale, which real web-graph
    * authorities exceed; 128-bit keeps the arithmetic exact at any
    * graph size (the oracle replays it in DuckDB HUGEINT), and the
    * normalized scores themselves are ≤ `scale`, safely Long.
    *
    * Cost shape at 100 TB: edges persist once; each round is two
    * edge⋈vertex joins with partial-aggregated sums (vertex-count
    * rows on the wire) plus two 1-row max broadcasts; per-round
    * state localCheckpoints exactly as [[ranks]].
    *
    * @return one row per vertex of `edges`: (id, hub, auth) on the
    *         integer `scale`.
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3, scale: Long = Scale): DataFrame = {
    require(iterations >= 1)
    // HITS joins edges on s (authority round) AND on t (hub round):
    // cache the list once per key — two copies, zero per-round edge
    // shuffles (guide §2.4; the bucket-both-ways trade: 2 extra
    // materializations beat 2·iterations edge-list exchanges). eT
    // derives from the cached eS so the distinct runs once. A
    // BROADCAST-SIZED graph (VERDICT r16 #8/#9) keeps ONE unpartitioned
    // cache and broadcasts it into both join directions instead —
    // no second copy, no repartition exchanges, no per-round state
    // exchange.
    val small = broadcastableEdges(edges)
    val e0 = edges
      .select(col(srcCol).cast("long").as("s"), col(dstCol).cast("long").as("t"))
      .filter(col("s") =!= col("t"))
      .distinct()
    val eS = (if (small) e0 else e0.repartition(col("s"))).persist()
    val eT = if (small) eS else eS.repartition(col("t")).persist()
    val (eSJ, eTJ) = if (small) (broadcast(eS), broadcast(eT)) else (eS, eT)

    // Round frames cover only the vertices the NEXT consumer can use
    // (round 17, guide §2.4/§2.3 — shuffle fewer rows AND two fewer
    // vertex-sized join exchanges per round): auth rows exist only for
    // vertices with in-edges, hub rows only for vertices with
    // out-edges. The old per-round `v LEFT JOIN` re-attached zero rows
    // that the following INNER edge join then multiplied by nothing —
    // a zero contributes exactly as much as an absent row to the sums,
    // and the per-round max is over the same positive support — so the
    // iterated values are unchanged; the zeros are re-attached ONCE in
    // the final projection instead of once per half-round.
    // Support invariant: hRaw groups by s over (eT ⋈ auth) and auth
    // covers every t of eT (every target has an in-edge), so hub
    // covers EVERY source vertex of eS each round — round 1 seeds it
    // with exactly the distinct sources. Likewise auth covers every
    // t. The per-round maxes stay ≥ scale > 0 (the argmax row of the
    // previous half-round renormalizes to exactly `scale` and owns an
    // incident edge by construction), so the `div` can never see a
    // zero divisor; the coalesce stays as a pure guard. A separate
    // vertex frame is NOT needed: support(hub) ∪ support(auth) =
    // sources ∪ targets = the whole vertex set, so the final
    // zero-reattach is a full-outer join of the two final frames —
    // the old per-query v cache (union + distinct + materialization)
    // is gone.
    var hub = eS.select(col("s").as("id")).distinct()
      .withColumn("h", lit(scale))
    var auth = hub.select(col("id")).withColumn("a", lit(0L))
    for (i <- 1 to iterations) {
      val (prevHub, prevAuth) = (hub, auth)
      val aRaw = eSJ.join(hub.withColumnRenamed("id", "s"), Seq("s"))
        .groupBy(col("t").as("id"))
        .agg(sum(col("h").cast("decimal(38,0)")).as("_ar"))
      val aMax = aRaw.agg(max(col("_ar")).as("_am"))
      // LAZY mid-round checkpoint (round 16): the authority frame is
      // consumed by this round's hub step and by the final join — a
      // lazy cut still truncates the plan but materializes INSIDE the
      // hub checkpoint's job, halving the per-round job barriers. By
      // the time anything could release or re-read it, the hub step
      // has stored its blocks.
      auth = aRaw.crossJoin(broadcast(aMax))
        .select(col("id"),
          coalesce(expr(s"(_ar * $scale) div _am"), lit(0L)).as("a"))
        .localCheckpoint(eager = false)
      val hRaw = eTJ.join(auth.withColumnRenamed("id", "t"), Seq("t"))
        .groupBy(col("s").as("id"))
        .agg(sum(col("a").cast("decimal(38,0)")).as("_hr"))
      val hMax = hRaw.agg(max(col("_hr")).as("_hm"))
      hub = hRaw.crossJoin(broadcast(hMax))
        .select(col("id"),
          coalesce(expr(s"(_hr * $scale) div _hm"), lit(0L)).as("h"))
        .localCheckpoint()
      // round k's auth derives from hub(k-1) and round k's hub from
      // auth(k) — once hub(k) materialized (eager checkpoint), the
      // PREVIOUS round's pair is dead; release it so a long-lived
      // serving session does not pin 2×iterations frames per call
      // (ADVICE r14). Round 1's prevs are the non-checkpointed seeds.
      if (i > 1) {
        graft.api.Lifecycle.releaseLocalCheckpoint(prevHub)
        graft.api.Lifecycle.releaseLocalCheckpoint(prevAuth)
      }
    }
    // zeros re-attached here, once: a vertex with no out-edges holds
    // hub 0, no in-edges authority 0 — exactly what the per-round
    // left joins produced (full outer: hub covers all sources, auth
    // all targets, their union is every vertex)
    val out = hub.join(auth, Seq("id"), "full_outer")
      .select(col("id"), coalesce(col("h"), lit(0L)).as("hub"),
        coalesce(col("a"), lit(0L)).as("auth"))
      .localCheckpoint()
    // `out` materialized eagerly: the final round's frames are dead too
    graft.api.Lifecycle.releaseLocalCheckpoint(hub)
    graft.api.Lifecycle.releaseLocalCheckpoint(auth)
    eS.unpersist()
    if (!small) eT.unpersist()
    out
  }

  /** Shared key→hash derivation — (s, _sk, t, _tk) rows with
    * self-loops dropped. ONE definition behind [[ranksByKey]],
    * [[hitsByKey]] and the persisted [[writeEdgeIndex]] family, so the
    * inline consumers and the index can never key, hash or
    * self-loop-filter differently (the edgeRows/bm25Rank shared-front
    * discipline).
    */
  private def keyedEdges(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame =
    edges.select(
        graft.functions.TextHashing.hash60(col(srcCol)).as("s"),
        col(srcCol).as("_sk"),
        graft.functions.TextHashing.hash60(col(dstCol)).as("t"),
        col(dstCol).as("_tk"))
      .filter(col("s") =!= col("t"))

  /** The hash→key join-back map off a [[keyedEdges]] frame. */
  private def vertexMap(h: DataFrame): DataFrame =
    h.select(col("s").as("id"), col("_sk").as("key"))
      .union(h.select(col("t").as("id"), col("_tk").as("key")))
      .distinct()

  /** Distinct unordered pairs — the SIMPLE undirected graph every
    * PageRank consumer ranks, whether the (s, t) rows came inline or
    * from the persisted index.
    */
  private def symmetrized(e: DataFrame): DataFrame =
    e.select(least(col("s"), col("t")).as("a"),
      greatest(col("s"), col("t")).as("b")).distinct()

  /** [[hits]] over STRING-keyed vertices — the [[ranksByKey]] shape
    * for the directed host graph: keys map through the shared 60-bit
    * hash (oracle-replayable), edges collapse to DISTINCT directed
    * host pairs before any iteration (a hub linked from a thousand
    * pages is still one edge — in-link VOLUME is
    * [[graft.api.TextOps.frontierBudget]]'s signal; HITS measures
    * graph position), self-links drop, and the final scores join the
    * key back through a broadcast-sized vertex map. Unlike
    * [[ranksByKey]] the graph stays DIRECTED — hub/authority duality
    * IS the direction structure; symmetrizing would collapse the two
    * scores into one.
    *
    * @return one row per vertex: (key, hub, auth).
    */
  def hitsByKey(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3, scale: Long = Scale): DataFrame = {
    val h = keyedEdges(edges, srcCol, dstCol)
    hits(h.select(col("s"), col("t")), "s", "t", iterations, scale)
      .join(vertexMap(h), Seq("id"))
      .select(col("key"), col("hub"), col("auth"))
  }

  /** [[ranks]] over STRING-keyed vertices — hosts, canonical URLs,
    * tokens: the domain-centrality shape of a crawl scheduler (rank
    * hosts by their position in the host link graph, the signal
    * Common-Crawl-style domain ranking feeds back into frontier
    * priority). Keys map to 60-bit md5-prefix ids
    * ([[graft.functions.TextHashing.hash60]] — the corpus-wide
    * cross-engine hash discipline, so catalog oracles replay the
    * mapping exactly), the power iteration runs in Long space over
    * the SIMPLE undirected graph (distinct unordered key pairs; a
    * host pair linked from a thousand pages is ONE edge, and
    * self-links drop — centrality here measures the host's position
    * in the graph, not its in-link volume, which
    * [[graft.api.TextOps.frontierBudget]] already counts), and the
    * final ranks join the key back. A 60-bit collision merges two
    * vertices (P ≈ n²/2^61 — one in a billion at n = 2M hosts);
    * acceptable for a priority signal, replayed exactly by oracles
    * computing the same hashes.
    *
    * Cost shape at 100 TB: the edge distinct is one exchange keyed on
    * the (a, b) hash pair of HOST-sized rows (web-graph edges are ~
    * millions of hosts, not billions of pages — the whole point of
    * aggregating to host granularity before iterating); each round
    * then moves vertex-count rows exactly as [[ranks]] does; the
    * key join-back is one broadcast-sized vertex map.
    *
    * @return one row per vertex with at least one non-loop edge:
    *         (key, degree, rank).
    */
  def ranksByKey(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5, dampingPct: Int = 85,
      scale: Long = Scale): DataFrame = {
    val h = keyedEdges(edges, srcCol, dstCol)
    ranks(symmetrized(h.select(col("s"), col("t"))), "a", "b",
        iterations, dampingPct, scale)
      .join(vertexMap(h), Seq("id"))
      .select(col("key"), col("degree"), col("rank"))
  }

  // ------------------------------------------------------------------
  // Persisted host-graph EDGE INDEX — the NINTH persisted index family,
  // giving link analysis the same O(delta)-daily-ingest posture as the
  // dedup/retrieval families: re-extracting and re-distincting a
  // 100 TB crawl's links for every re-rank is corpus work, but the
  // distinct DIRECTED host-pair set is host-graph-sized and ADDITIVE
  // under set union — a day's crawl folds in as its own sorted run and
  // layered runs reconcile by DISTINCT (the set-semantics sibling of
  // the gram/line families' reconcile-by-SUM). Both consumers
  // ([[ranksByKeyAgainstIndex]] PageRank, [[hitsByKeyAgainstIndex]]
  // HITS) read one reconciled graph, so the two crawl signals can
  // never rank different edge sets.
  // ------------------------------------------------------------------

  /** Shared write-side derivation: distinct directed hash pairs
    * (self-loops dropped) + the vertex key map, both prefix-
    * partitioned for the layout discipline. ONE definition serves
    * write and fold, so a fold cannot band edges differently from the
    * index it folds into.
    */
  private def edgeRows(edges: DataFrame, srcCol: String, dstCol: String,
      prefixPartitions: Int): (DataFrame, DataFrame) = {
    val h = keyedEdges(edges, srcCol, dstCol)
    val e = h.select(col("s"), col("t")).distinct()
      .withColumn("__ep", pmod(col("s"), lit(prefixPartitions.toLong)))
    val v = vertexMap(h)
      .withColumn("__vp", pmod(col("id"), lit(prefixPartitions.toLong)))
    (e, v)
  }

  // meta read/write is the shared (prefix_partitions, layers) pair in
  // IndexMaintenance — the line family's exact shape, no clone
  private def writeEdgeMeta(s: org.apache.spark.sql.SparkSession,
      path: String, prefixPartitions: Int, layers: Int): Unit =
    graft.api.IndexMaintenance.writeIndexMeta(s, path, prefixPartitions, layers)

  private def readEdgeMeta(s: org.apache.spark.sql.SparkSession,
      indexPath: String, op: String): (Int, Int) =
    graft.api.IndexMaintenance.readIndexMeta(s, indexPath, op)

  /** Materialize a link stream's distinct directed host graph to
    * parquet: `$path/edges` = (s, t) 60-bit hash pairs partitioned by
    * `__ep = s mod prefixPartitions` and sorted by (s, t);
    * `$path/vertices` = (id, key) the hash→key map;
    * `$path/meta` = (prefix_partitions, layers). Build once per
    * corpus version, fold daily ([[foldIntoEdgeIndex]] /
    * [[maintainEdgeIndex]]), rank any time
    * ([[ranksByKeyAgainstIndex]] / [[hitsByKeyAgainstIndex]]).
    */
  def writeEdgeIndex(edges: DataFrame, srcCol: String, dstCol: String,
      path: String, prefixPartitions: Int = 16): Unit = {
    val (e, v) = edgeRows(edges, srcCol, dstCol, prefixPartitions)
    // independent tables — overlapped writes (guide §2.6)
    graft.api.Par.run(
      () => graft.jobs.Sinks.layout(e, s"$path/edges",
        partitionCols = Seq("__ep"), sortCols = Seq("s", "t"), numFiles = 4),
      () => graft.jobs.Sinks.layout(v, s"$path/vertices",
        partitionCols = Seq("__vp"), sortCols = Seq("id"), numFiles = 4),
      // the (empty) tombstone table — one schema-bearing file, so reads
      // are unconditional (no absent-dir fallback to get silently wrong)
      () => e.select(col("s"), col("t")).limit(0).coalesce(1)
        .write.mode("overwrite").parquet(s"$path/removals"))
    writeEdgeMeta(edges.sparkSession, path, prefixPartitions, 1)
  }

  /** Fold edge TOMBSTONES into a persisted [[writeEdgeIndex]] — the
    * delete path a robots change or host takedown needs (without it
    * only a full rebuild honors a removal). Tombstones are (src, dst)
    * rows in the STORED orientation; they land as their own run in
    * `$indexPath/removals` and reconcile BY ANTI-JOIN at read: a
    * tombstoned pair is invisible no matter how many edge runs assert
    * it — including runs folded AFTER the tombstone — until a
    * compaction makes the removal durable and CLEARS the tombstone
    * set, after which a re-fold re-adds (the LSM delete contract
    * without sequence numbers, stated honestly: tombstones are
    * absolute within a compaction epoch). Set semantics make this
    * crash-shaped like [[foldIntoEdgeIndex]]: the meta bumps FIRST
    * (a partial tombstone run read early is a consistent
    * partially-applied removal; anti-join is idempotent, so the retry
    * completes it). To take down a whole host use
    * [[removeKeysFromEdgeIndex]], which derives the incident pairs
    * from the index itself.
    */
  def foldRemovalsIntoEdgeIndex(removals: DataFrame, srcCol: String,
      dstCol: String, indexPath: String): Unit = {
    val s = removals.sparkSession
    val (prefixPartitions, layers) =
      readEdgeMeta(s, indexPath, "foldRemovalsIntoEdgeIndex")
    writeEdgeMeta(s, indexPath, prefixPartitions, layers + 1)
    keyedEdges(removals, srcCol, dstCol)
      .select(col("s"), col("t")).distinct()
      .coalesce(1)
      .write.mode("append").parquet(s"$indexPath/removals")
  }

  /** Take DOWN whole hosts (keys): every stored edge incident to any
    * of `keys` — either endpoint, any run — tombstones in one call,
    * the removal a robots Disallow-all or a de-listing demands. The
    * incident pairs derive from the index's own reconciled edge set
    * (one index-sized scan, tombstone-sized write), so the caller
    * needs no link re-extraction. Runs under the writer lock with
    * crash recovery at entry (it is a maintain*-class mutation).
    */
  def removeKeysFromEdgeIndex(s: org.apache.spark.sql.SparkSession,
      keys: Seq[String], indexPath: String): Unit = {
    require(keys.nonEmpty, "removeKeysFromEdgeIndex: no keys")
    graft.api.IndexMaintenance.withWriterLock(s, indexPath) {
      graft.api.IndexMaintenance.recoverAtEntry(s, indexPath)
      val (prefixPartitions, layers) =
        readEdgeMeta(s, indexPath, "removeKeysFromEdgeIndex")
      writeEdgeMeta(s, indexPath, prefixPartitions, layers + 1)
      import s.implicits._
      val kid = broadcast(keys.toDF("key")
        .select(graft.functions.TextHashing.hash60(col("key")).as("kid")))
      val (e, _) = edgesFromIndex(s, indexPath, "removeKeysFromEdgeIndex")
      e.join(kid, col("s") === col("kid"), "left_semi")
        .union(e.join(kid, col("t") === col("kid"), "left_semi"))
        .distinct()
        .coalesce(1)
        .write.mode("append").parquet(s"$indexPath/removals")
    }
  }

  /** Fold a DELTA of links into a persisted [[writeEdgeIndex]] IN
    * PLACE with O(delta) write bytes: the delta's distinct pairs and
    * vertices land as their own sorted runs, meta bumps `layers`.
    * Reconcile is EXACT BY SET UNION — an edge present in several
    * runs is still ONE edge after the read-side distinct (unlike the
    * count families nothing sums, so duplicate-ACROSS-runs edges are
    * the reconcile hazard: without the distinct they would inflate
    * degrees and corrupt every rank). Same single-writer
    * restore-on-failure crash contract as every in-place fold — but
    * the meta bump deliberately lands BEFORE the appends (ADVICE
    * r14): under SET-UNION reconcile a bumped layer count with a
    * missing or partial run is harmless (distinct is idempotent and
    * any readable subset of the delta is a consistent edge set),
    * whereas appends landing before the bump would leave layers=1
    * with duplicate cross-run rows that [[edgesFromIndex]]'s
    * layers<=1 fast path reads WITHOUT the distinct — silently
    * inflated degrees until the next successful fold. A crashed fold
    * still means the delta is partially applied and must be retried
    * (re-folding the same delta is safe: duplicates collapse in the
    * read-side distinct). This ordering is exclusive to the SET
    * families; the SUM-reconciled count families (gram/line/weighted
    * edge) cannot use it — for them a partial run corrupts totals
    * either way, so they carry per-run manifests instead (see
    * [[foldIntoWeightedEdgeIndex]]). One cost of meta-first, stated
    * for operators: a fold whose delta job fails BEFORE any append
    * still bumped `layers`, so repeated failed folds creep the layer
    * count toward the compaction threshold without adding data —
    * reads stay correct throughout (distinct is idempotent and a
    * bumped count merely disables the layers<=1 fast path until the
    * next compaction), i.e. a layered meta does NOT imply layered
    * data. DedupSpec pins the harmless-bump property.
    */
  def foldIntoEdgeIndex(edges: DataFrame, srcCol: String, dstCol: String,
      indexPath: String): Unit = {
    val s = edges.sparkSession
    val (prefixPartitions, layers) =
      readEdgeMeta(s, indexPath, "foldIntoEdgeIndex")
    writeEdgeMeta(s, indexPath, prefixPartitions, layers + 1)
    val (e, v) = edgeRows(edges, srcCol, dstCol, prefixPartitions)
    graft.api.Par.run(
      () => graft.jobs.Sinks.layoutAppend(e, s"$indexPath/edges",
        partitionCols = Seq("__ep"), sortCols = Seq("s", "t"), numFiles = 4),
      () => graft.jobs.Sinks.layoutAppend(v, s"$indexPath/vertices",
        partitionCols = Seq("__vp"), sortCols = Seq("id"), numFiles = 4))
  }

  /** Compact a layered edge index back to ONE sorted run per table
    * (the set-union reconcile AND the tombstone anti-join made
    * durable — removed edges' bytes drop from disk and the tombstone
    * set RESETS to empty, opening the next compaction epoch: a fold
    * after this point may re-add a previously removed edge), meta
    * reset to layers=1. Identical reads before and after.
    */
  def compactEdgeIndex(s: org.apache.spark.sql.SparkSession,
      indexPath: String, outPath: String): Unit = {
    require(indexPath != outPath,
      "compactEdgeIndex: outPath must differ from indexPath")
    val (prefixPartitions, _) =
      readEdgeMeta(s, indexPath, "compactEdgeIndex")
    val removals = removalsOf(s, indexPath, "compactEdgeIndex")
    graft.jobs.Sinks.layout(
      s.read.parquet(s"$indexPath/edges").drop("__ep").distinct()
        .join(removals, Seq("s", "t"), "left_anti")
        .withColumn("__ep", pmod(col("s"), lit(prefixPartitions.toLong))),
      s"$outPath/edges",
      partitionCols = Seq("__ep"), sortCols = Seq("s", "t"), numFiles = 4)
    graft.jobs.Sinks.layout(
      s.read.parquet(s"$indexPath/vertices").drop("__vp").distinct()
        .withColumn("__vp", pmod(col("id"), lit(prefixPartitions.toLong))),
      s"$outPath/vertices",
      partitionCols = Seq("__vp"), sortCols = Seq("id"), numFiles = 4)
    removals.limit(0).coalesce(1)
      .write.mode("overwrite").parquet(s"$outPath/removals")
    writeEdgeMeta(s, outPath, prefixPartitions, 1)
  }

  /** The edge family's maintain* entry point — crash-recover at
    * entry, O(delta) fold, compact-and-swap iff post-fold layers
    * reach `compactThreshold`; all inside
    * [[graft.api.IndexMaintenance.withWriterLock]]. NOT reader-safe
    * across the swap (the family reader contract).
    */
  def maintainEdgeIndex(edges: DataFrame, srcCol: String, dstCol: String,
      indexPath: String,
      compactThreshold: Int =
        graft.api.IndexMaintenance.DefaultCompactThreshold): Boolean = {
    val s = edges.sparkSession
    graft.api.IndexMaintenance.withWriterLock(s, indexPath) {
      graft.api.IndexMaintenance.recoverAtEntry(s, indexPath)
      foldIntoEdgeIndex(edges, srcCol, dstCol, indexPath)
      val (_, layers) = readEdgeMeta(s, indexPath, "maintainEdgeIndex")
      graft.api.IndexMaintenance.compactIfLayered(s, indexPath, layers,
        compactThreshold)(out => compactEdgeIndex(s, indexPath, out))
    }
  }

  /** Reconciled reads: (directed distinct edges (s, t) minus the
    * tombstone set, vertex map (id, key)). The distinct is skipped at
    * layers=1 — one compacted run is distinct by construction. The
    * tombstone anti-join always applies (the removals table is
    * takedown-sized; a missing table means the index predates the
    * delete path and must be rebuilt once — the named error below).
    */
  private def edgesFromIndex(s: org.apache.spark.sql.SparkSession,
      indexPath: String, op: String): (DataFrame, DataFrame) = {
    val (_, layers) = readEdgeMeta(s, indexPath, op)
    val e0 = s.read.parquet(s"$indexPath/edges").select(col("s"), col("t"))
    val v0 = s.read.parquet(s"$indexPath/vertices")
      .select(col("id"), col("key"))
    val e1 = e0.join(removalsOf(s, indexPath, op), Seq("s", "t"),
      "left_anti")
    if (layers <= 1) (e1, v0) else (e1.distinct(), v0.distinct())
  }

  /** The tombstone table of a [[writeEdgeIndex]], with the
    * rebuild-once error contract (an index written before the delete
    * path existed has no removals table; silently treating that as
    * empty would be correct TODAY but would hide a path typo
    * forever).
    */
  private def removalsOf(s: org.apache.spark.sql.SparkSession,
      indexPath: String, op: String): DataFrame =
    try s.read.parquet(s"$indexPath/removals").select(col("s"), col("t"))
    catch {
      case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalStateException(
          s"$op: cannot read $indexPath/removals — indexes written " +
            "before the tombstone path existed must be rebuilt once", e)
    }

  /** [[ranksByKey]] over a persisted [[writeEdgeIndex]] — identical
    * output to ranking the raw link stream the index was built+folded
    * from, at INDEX-sized cost (no link re-extraction, no
    * corpus-sized edge distinct: the one big exchange already
    * happened at write/fold time).
    */
  def ranksByKeyAgainstIndex(s: org.apache.spark.sql.SparkSession,
      indexPath: String, iterations: Int = 5, dampingPct: Int = 85,
      scale: Long = Scale): DataFrame = {
    val (e, v) = edgesFromIndex(s, indexPath, "ranksByKeyAgainstIndex")
    ranks(symmetrized(e), "a", "b", iterations, dampingPct, scale)
      .join(v, Seq("id"))
      .select(col("key"), col("degree"), col("rank"))
  }

  /** [[hitsByKey]] over a persisted [[writeEdgeIndex]] — the directed
    * consumer of the same reconciled graph.
    */
  def hitsByKeyAgainstIndex(s: org.apache.spark.sql.SparkSession,
      indexPath: String, iterations: Int = 3,
      scale: Long = Scale): DataFrame = {
    val (e, v) = edgesFromIndex(s, indexPath, "hitsByKeyAgainstIndex")
    hits(e, "s", "t", iterations, scale)
      .join(v, Seq("id"))
      .select(col("key"), col("hub"), col("auth"))
  }

  // ------------------------------------------------------------------
  // Persisted WEIGHTED edge index — the TENTH persisted family, giving
  // [[weightedRanks]] the deployed posture [[writeEdgeIndex]] gives
  // [[ranks]]: the unweighted family deliberately collapses a thousand
  // anchors into ONE edge (graph position, not in-link volume), so
  // anchor-count/in-link-weighted centrality — the signal
  // [[graft.api.TextOps.extractAnchors]] already extracts — cannot run
  // at index-sized cost against it. Edge WEIGHTS are SUM-additive
  // across runs (today's anchors between two hosts add to
  // yesterday's), so the gram/line families' reconcile-by-SUM algebra
  // carries directly: a day's links fold in as their own per-run
  // (s, t, w) partial sums, and the reconciled weight of an edge is
  // the sum of its per-run weights.
  //
  // Unlike the count families there is NO layers<=1 fast path to
  // protect: the weighted consumer must aggregate to canonical
  // unordered pairs anyway ([[weightedPairs]] — one row per pair,
  // total weight, the form [[weightedRanks]]' floor divisions are
  // exact over), and that aggregation IS the cross-run SUM reconcile.
  // `layers` therefore only schedules compaction; reads are correct at
  // any layer count by construction.
  // ------------------------------------------------------------------

  /** [[keyedEdges]] carrying a Long weight — ONE derivation behind
    * [[weightedRanksByKey]] and the persisted weighted family, so the
    * inline and deployed consumers can never key, hash, weight-cast or
    * self-loop-filter differently. Weights must be >= 1 (a zero total
    * incident weight would divide by zero in the power iteration).
    */
  private def keyedWeightedEdges(edges: DataFrame, srcCol: String,
      dstCol: String, weightCol: String): DataFrame =
    edges.select(
        graft.functions.TextHashing.hash60(col(srcCol)).as("s"),
        col(srcCol).as("_sk"),
        graft.functions.TextHashing.hash60(col(dstCol)).as("t"),
        col(dstCol).as("_tk"),
        col(weightCol).cast("long").as("w"))
      .filter(col("s") =!= col("t"))

  /** Canonical UNDIRECTED weighted pairs off (s, t, w) rows: one row
    * per unordered pair with the SUMMED weight — the exact form
    * [[weightedRanks]] iterates over (feeding it duplicate rows for
    * one pair would change the floor-division rounding:
    * floor(r·w1/D) + floor(r·w2/D) ≠ floor(r·(w1+w2)/D)). Shared by
    * the inline and index read paths; over a layered index this
    * aggregation doubles as the cross-run SUM reconcile — and the
    * net-positive filter IS the delete path: a signed removal run
    * ([[foldRemovalsIntoWeightedEdgeIndex]]) nets a fully-removed
    * pair to 0, which drops here (a no-op for the all-positive inline
    * paths).
    */
  private def weightedPairs(e: DataFrame): DataFrame =
    e.select(least(col("s"), col("t")).as("a"),
        greatest(col("s"), col("t")).as("b"), col("w"))
      .groupBy(col("a"), col("b")).agg(sum(col("w")).as("w"))
      .filter(col("w") > 0)

  /** [[weightedRanks]] over STRING-keyed vertices — the [[ranksByKey]]
    * shape for weighted host graphs: keys map through the shared
    * 60-bit hash, per-occurrence link rows (or pre-aggregated weighted
    * edges) collapse to canonical unordered pairs with SUMMED weight
    * ([[weightedPairs]]), self-links drop, and the final scores join
    * the key back through the broadcast-sized vertex map. With one
    * input row per unordered pair this is EXACTLY [[weightedRanks]]
    * on the raw pair list (the aggregation is the identity), which is
    * what lets the q163 catalog query check the deployed path against
    * q126's oracle verbatim.
    *
    * @return one row per vertex: (key, w_degree, rank).
    */
  def weightedRanksByKey(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, iterations: Int = 5, dampingPct: Int = 85,
      scale: Long = Scale): DataFrame = {
    val h = keyedWeightedEdges(edges, srcCol, dstCol, weightCol)
    weightedRanks(weightedPairs(h), "a", "b", "w", iterations,
        dampingPct, scale)
      .join(vertexMap(h), Seq("id"))
      .select(col("key"), col("w_degree"), col("rank"))
  }

  /** Shared write-side derivation for the weighted family: per-run
    * partial sums over distinct DIRECTED hash pairs (self-loops
    * dropped) + the vertex key map, prefix-partitioned. Directed like
    * [[edgeRows]] — orientation is preserved in storage (the
    * [[weightedHitsByKeyAgainstIndex]] consumer iterates the directed
    * graph) and the undirected consumer collapses at read.
    */
  private def weightedEdgeRows(edges: DataFrame, srcCol: String,
      dstCol: String, weightCol: String,
      prefixPartitions: Int): (DataFrame, DataFrame) = {
    val h = keyedWeightedEdges(edges, srcCol, dstCol, weightCol)
    val e = h.groupBy(col("s"), col("t")).agg(sum(col("w")).as("w"))
      .withColumn("__ep", pmod(col("s"), lit(prefixPartitions.toLong)))
    val v = vertexMap(h)
      .withColumn("__vp", pmod(col("id"), lit(prefixPartitions.toLong)))
    (e, v)
  }

  /** Materialize a link stream's weighted directed host graph to
    * parquet: `$path/edges` = (s, t, w) with w the summed weight per
    * directed 60-bit hash pair, partitioned by `__ep = s mod
    * prefixPartitions` and sorted by (s, t); `$path/vertices` and
    * `$path/meta` as in [[writeEdgeIndex]]. Build once per corpus
    * version, fold daily ([[foldIntoWeightedEdgeIndex]] /
    * [[maintainWeightedEdgeIndex]]), rank any time
    * ([[weightedRanksByKeyAgainstIndex]]). Pass `lit(1)`-style unit
    * weights for anchor-count semantics: the per-run partial sum
    * makes w the occurrence count.
    */
  def writeWeightedEdgeIndex(edges: DataFrame, srcCol: String,
      dstCol: String, weightCol: String, path: String,
      prefixPartitions: Int = 16): Unit = {
    val (e, v) = weightedEdgeRows(edges, srcCol, dstCol, weightCol,
      prefixPartitions)
    val run = graft.api.IndexMaintenance.newRunId()
    graft.api.Par.run(
      () => graft.jobs.Sinks.layout(e.withColumn("__run", lit(run)),
        s"$path/edges",
        partitionCols = Seq("__ep"), sortCols = Seq("s", "t"),
        numFiles = 4),
      () => graft.jobs.Sinks.layout(v.withColumn("__run", lit(run)),
        s"$path/vertices",
        partitionCols = Seq("__vp"), sortCols = Seq("id"),
        numFiles = 4))
    graft.api.IndexMaintenance.writeIndexMetaRunsTags(edges.sparkSession,
      path, prefixPartitions, 1, Seq(run), Seq.empty)
  }

  /** Fold a DELTA of weighted links into a persisted
    * [[writeWeightedEdgeIndex]] IN PLACE with O(delta) write bytes:
    * the delta's per-pair partial sums land as their own sorted runs,
    * meta bumps `layers`. Reconcile is EXACT BY SUM-ADDITIVITY — an
    * edge present in several runs totals the sum of its run weights
    * (the gram/line algebra with DISTINCT swapped for SUM), applied
    * at read inside the consumer's canonical pair aggregation. Meta
    * bumps AFTER the appends (the count families' order — a partial
    * run corrupts totals either way under SUM, so the SET family's
    * harmless meta-first trick does not apply here) — and the meta
    * COMMITS the run: both tables' appended rows carry a fresh
    * `__run` id that only becomes readable once
    * [[graft.api.IndexMaintenance.writeIndexMetaRuns]] lists it, so a
    * crash between append and commit leaves orphan files every
    * consumer filters out, and the retried fold's fresh id can never
    * merge with them (RecoverySpec pins it). Single-writer still
    * governs (the lock). `tag = Some(t)` is the exactly-once form
    * (the card family's discipline): a tag already in the meta's
    * logical `committed_tags` manifest makes the fold a NO-OP
    * (returns false) — the streaming maintainer's re-delivery
    * protection ([[graft.streaming.EdgeGate]]).
    *
    * @return true iff the fold applied (always, when untagged).
    */
  def foldIntoWeightedEdgeIndex(edges: DataFrame, srcCol: String,
      dstCol: String, weightCol: String, indexPath: String,
      tag: Option[String] = None): Boolean = {
    val s = edges.sparkSession
    val (prefixPartitions, layers, runs, tags) = graft.api.IndexMaintenance
      .readIndexMetaRunsTags(s, indexPath, "foldIntoWeightedEdgeIndex")
    if (tag.exists(tags.contains)) false
    else {
      val (e, v) = weightedEdgeRows(edges, srcCol, dstCol, weightCol,
        prefixPartitions)
      val run = graft.api.IndexMaintenance.newRunId()
      graft.api.Par.run(
        () => graft.jobs.Sinks.layoutAppend(e.withColumn("__run", lit(run)),
          s"$indexPath/edges",
          partitionCols = Seq("__ep"), sortCols = Seq("s", "t"),
          numFiles = 4),
        () => graft.jobs.Sinks.layoutAppend(v.withColumn("__run", lit(run)),
          s"$indexPath/vertices",
          partitionCols = Seq("__vp"), sortCols = Seq("id"),
          numFiles = 4))
      graft.api.IndexMaintenance.writeIndexMetaRunsTags(s, indexPath,
        prefixPartitions, layers + 1, runs :+ run, tags ++ tag)
      true
    }
  }

  /** The weighted family's DELETE path — a SIGNED run the existing
    * SUM reconcile absorbs for free: the removal rows fold in with
    * NEGATED weights, so a fully-removed edge nets to 0 and drops at
    * every consumer's net-positive filter ([[weightedPairs]] /
    * [[weightedHits]]), while a partial removal (an anchor retracted,
    * not a takedown) just lowers the weight. Removal rows must mirror
    * the ORIGINAL (src, dst, weight) orientation and must not exceed
    * the added weight — over-removal is a caller error whose residual
    * negative net reads as absent and is DROPPED at compaction (the
    * balance does not carry across epochs). Crash shape = the fold's
    * (per-run manifest; an uncommitted removal run is invisible). To
    * take down whole hosts use [[removeKeysFromWeightedEdgeIndex]].
    */
  def foldRemovalsIntoWeightedEdgeIndex(removals: DataFrame,
      srcCol: String, dstCol: String, weightCol: String,
      indexPath: String): Unit = {
    foldIntoWeightedEdgeIndex(
      removals.withColumn("__negw", -col(weightCol).cast("long")),
      srcCol, dstCol, "__negw", indexPath)
    ()
  }

  /** Take DOWN whole hosts (keys) in the weighted index: every stored
    * directed pair incident to any of `keys` folds back in at its
    * NEGATED reconciled net weight, so the pair nets to exactly 0 —
    * gone from both weighted consumers — with no link re-extraction
    * (one index-sized scan, tombstone-sized write). Runs under the
    * writer lock with crash recovery at entry.
    */
  def removeKeysFromWeightedEdgeIndex(s: org.apache.spark.sql.SparkSession,
      keys: Seq[String], indexPath: String): Unit = {
    require(keys.nonEmpty, "removeKeysFromWeightedEdgeIndex: no keys")
    graft.api.IndexMaintenance.withWriterLock(s, indexPath) {
      graft.api.IndexMaintenance.recoverAtEntry(s, indexPath)
      import s.implicits._
      val kid = broadcast(keys.toDF("key")
        .select(graft.functions.TextHashing.hash60(col("key")).as("kid")))
      val (e, _) = weightedFromIndex(s, indexPath,
        "removeKeysFromWeightedEdgeIndex")
      // reconciled net per directed pair, incident to any key
      val nets = e.groupBy(col("s"), col("t")).agg(sum(col("w")).as("w"))
        .filter(col("w") > 0)
      val incident = nets
        .join(kid, col("s") === col("kid"), "left_semi")
        .union(nets.join(kid, col("t") === col("kid"), "left_semi"))
        .distinct()
      // fold the negation as its own (manifested) run — the meta
      // commit inside makes the takedown atomic; the logical tag
      // manifest carries through untouched
      val (prefixPartitions, layers, runs, tags) =
        graft.api.IndexMaintenance.readIndexMetaRunsTags(s, indexPath,
          "removeKeysFromWeightedEdgeIndex")
      val run = graft.api.IndexMaintenance.newRunId()
      graft.jobs.Sinks.layoutAppend(
        incident.select(col("s"), col("t"), (-col("w")).as("w"))
          .withColumn("__ep", pmod(col("s"), lit(prefixPartitions.toLong)))
          .withColumn("__run", lit(run)),
        s"$indexPath/edges",
        partitionCols = Seq("__ep"), sortCols = Seq("s", "t"),
        numFiles = 4)
      graft.api.IndexMaintenance.writeIndexMetaRunsTags(s, indexPath,
        prefixPartitions, layers + 1, runs :+ run, tags)
    }
  }

  /** Compact a layered weighted edge index back to ONE run per table
    * (per-pair sums over COMMITTED runs and the vertex distinct made
    * durable — orphan rows from crashed folds are dropped from disk
    * here, and so are pairs whose net weight is <= 0: signed removal
    * runs become durable deletions, their bytes gone and any
    * over-removal's residual negative balance NOT carried into the
    * next epoch), meta reset to layers=1 with a single-run manifest.
    * Identical reads before and after.
    */
  def compactWeightedEdgeIndex(s: org.apache.spark.sql.SparkSession,
      indexPath: String, outPath: String): Unit = {
    require(indexPath != outPath,
      "compactWeightedEdgeIndex: outPath must differ from indexPath")
    val (prefixPartitions, _, runs, tags) = graft.api.IndexMaintenance
      .readIndexMetaRunsTags(s, indexPath, "compactWeightedEdgeIndex")
    val run = graft.api.IndexMaintenance.newRunId()
    graft.jobs.Sinks.layout(
      graft.api.IndexMaintenance.committedOnly(
          s.read.parquet(s"$indexPath/edges").drop("__ep"), runs)
        .groupBy(col("s"), col("t")).agg(sum(col("w")).as("w"))
        .filter(col("w") > 0)
        .withColumn("__ep", pmod(col("s"), lit(prefixPartitions.toLong)))
        .withColumn("__run", lit(run)),
      s"$outPath/edges",
      partitionCols = Seq("__ep"), sortCols = Seq("s", "t"), numFiles = 4)
    graft.jobs.Sinks.layout(
      graft.api.IndexMaintenance.committedOnly(
          s.read.parquet(s"$indexPath/vertices").drop("__vp"), runs)
        .distinct()
        .withColumn("__vp", pmod(col("id"), lit(prefixPartitions.toLong)))
        .withColumn("__run", lit(run)),
      s"$outPath/vertices",
      partitionCols = Seq("__vp"), sortCols = Seq("id"), numFiles = 4)
    // the tag manifest SURVIVES the rewrite — a streaming epoch
    // replayed after a compaction must still no-op
    graft.api.IndexMaintenance.writeIndexMetaRunsTags(s, outPath,
      prefixPartitions, 1, Seq(run), tags)
  }

  /** The weighted family's maintain* entry point — the
    * [[maintainEdgeIndex]] policy verbatim: crash-recover at entry,
    * O(delta) fold, compact-and-swap iff post-fold layers reach
    * `compactThreshold`, all inside the writer lock. NOT reader-safe
    * across the swap.
    */
  def maintainWeightedEdgeIndex(edges: DataFrame, srcCol: String,
      dstCol: String, weightCol: String, indexPath: String,
      compactThreshold: Int =
        graft.api.IndexMaintenance.DefaultCompactThreshold): Boolean = {
    val s = edges.sparkSession
    graft.api.IndexMaintenance.withWriterLock(s, indexPath) {
      graft.api.IndexMaintenance.recoverAtEntry(s, indexPath)
      foldIntoWeightedEdgeIndex(edges, srcCol, dstCol, weightCol, indexPath)
      compactWeightedIfDue(s, indexPath, compactThreshold)
    }
  }

  /** [[maintainWeightedEdgeIndex]] with the exactly-once logical tag
    * (the [[graft.api.CardOps.maintainCardIndexTagged]] discipline for
    * the weighted family — [[graft.streaming.EdgeGate]]'s per-epoch
    * fold): a tag already in the meta's `committed_tags` manifest
    * makes the whole call a NO-OP (returns false, no run appended, no
    * compaction — a no-op must be a no-op), a fresh tag folds under a
    * fresh physical run id and commits run + tag atomically, and the
    * manifest survives compaction. Returns true iff the fold APPLIED.
    */
  def maintainWeightedEdgeIndexTagged(edges: DataFrame, srcCol: String,
      dstCol: String, weightCol: String, indexPath: String, tag: String,
      compactThreshold: Int =
        graft.api.IndexMaintenance.DefaultCompactThreshold): Boolean = {
    val s = edges.sparkSession
    graft.api.IndexMaintenance.withWriterLock(s, indexPath) {
      graft.api.IndexMaintenance.recoverAtEntry(s, indexPath)
      val applied = foldIntoWeightedEdgeIndex(edges, srcCol, dstCol,
        weightCol, indexPath, Some(tag))
      if (applied) compactWeightedIfDue(s, indexPath, compactThreshold)
      applied
    }
  }

  private def compactWeightedIfDue(s: org.apache.spark.sql.SparkSession,
      indexPath: String, compactThreshold: Int): Boolean = {
    val (_, layers, _) = graft.api.IndexMaintenance
      .readIndexMetaRuns(s, indexPath, "maintainWeightedEdgeIndex")
    graft.api.IndexMaintenance.compactIfLayered(s, indexPath, layers,
      compactThreshold)(out => compactWeightedEdgeIndex(s, indexPath, out))
  }

  /** [[weightedRanksByKey]] over a persisted
    * [[writeWeightedEdgeIndex]] — identical output to weighted-ranking
    * the raw link stream the index was built+folded from, at
    * INDEX-sized cost: the canonical pair aggregation
    * ([[weightedPairs]]) both collapses the stored directed pairs to
    * unordered form AND sum-reconciles the layered runs in one
    * host-pair-sized exchange. The vertex map always distincts —
    * layered runs repeat keys, and the map is broadcast-sized.
    */
  /** Committed reads of a weighted index's two tables: rows filter to
    * the meta's run manifest (orphans from crashed folds are
    * invisible), then project to the consumer columns. ONE definition
    * behind both weighted consumers.
    */
  private def weightedFromIndex(s: org.apache.spark.sql.SparkSession,
      indexPath: String, op: String): (DataFrame, DataFrame) = {
    val (_, _, runs) =
      graft.api.IndexMaintenance.readIndexMetaRuns(s, indexPath, op)
    val e = graft.api.IndexMaintenance.committedOnly(
        s.read.parquet(s"$indexPath/edges"), runs)
      .select(col("s"), col("t"), col("w"))
    val v = graft.api.IndexMaintenance.committedOnly(
        s.read.parquet(s"$indexPath/vertices"), runs)
      .select(col("id"), col("key")).distinct()
    (e, v)
  }

  def weightedRanksByKeyAgainstIndex(s: org.apache.spark.sql.SparkSession,
      indexPath: String, iterations: Int = 5, dampingPct: Int = 85,
      scale: Long = Scale): DataFrame = {
    val (e, v) =
      weightedFromIndex(s, indexPath, "weightedRanksByKeyAgainstIndex")
    weightedRanks(weightedPairs(e), "a", "b", "w", iterations,
        dampingPct, scale)
      .join(v, Seq("id"))
      .select(col("key"), col("w_degree"), col("rank"))
  }

  /** Weight-scaled HITS over a DIRECTED weighted edge list — the
    * [[hits]] mutual recursion with each hop multiplied by the edge
    * weight: `a_raw(t) = Σ_{(s,t)} w · h(s)` and `h_raw(s) =
    * Σ_{(s,t)} w · a(t)`, renormalized per round by the integer max
    * exactly as [[hits]]. On the anchor-count host graph this is the
    * volume-aware split of the two crawl roles the unweighted [[hits]]
    * cannot see: a host pointed to by a thousand anchors from one good
    * hub outranks a host the same hub mentions once.
    *
    * Input rows need NOT be pre-aggregated: edges first collapse to
    * canonical DIRECTED pairs with SUMMED weight — for the raw sums
    * themselves this is a no-op (multiplication distributes over the
    * sum, unlike the weighted-PageRank floor divisions), but it fixes
    * the iterated graph at pair-count size and IS the cross-run SUM
    * reconcile when the rows come from a layered
    * [[writeWeightedEdgeIndex]]. Self-loops drop ([[hits]]'
    * discipline). With one row per directed pair and unit weights this
    * is EXACTLY [[hits]]: every product is h·1 — DedupSpec pins the
    * equality. Arithmetic: the h·w products and their sums run in
    * decimal(38,0) (h ≤ scale = 10^12 and Σw·scale must stay under
    * 10^38 — anchor-count weights leave ~10^14 total-weight headroom;
    * the oracle replays the same products in DuckDB HUGEINT), and the
    * renormalized scores are ≤ `scale`, safely Long.
    *
    * @return one row per vertex: (id, hub, auth) on the integer
    *         `scale`.
    */
  def weightedHits(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, iterations: Int = 3,
      scale: Long = Scale): DataFrame = {
    require(iterations >= 1)
    val small = broadcastableEdges(edges)
    val e0 = edges
      .select(col(srcCol).cast("long").as("s"),
        col(dstCol).cast("long").as("t"),
        col(weightCol).cast("long").as("w"))
      .filter(col("s") =!= col("t"))
      .groupBy(col("s"), col("t")).agg(sum(col("w")).as("w"))
      // net-positive only: the directed twin of [[weightedPairs]]'
      // delete-path filter — a signed removal run nets a removed
      // directed pair to 0 and it drops here
      .filter(col("w") > 0)
    val e = (if (small) e0 else e0.repartition(col("s"))).persist()
    // the hub round joins on t — second partitioned copy (the [[hits]]
    // bucket-both-ways trade), derived off the cached s-copy; ONE
    // broadcast copy serves both directions when the graph is small
    val eT = if (small) e else e.repartition(col("t")).persist()
    val (eJ, eTJ) = if (small) (broadcast(e), broadcast(eT)) else (e, eT)

    // Rounds carry positive-support frames only, zeros re-attached
    // once at the end — the [[hits]] round-17 argument verbatim (the
    // weighted sums multiply h·w, and an absent row contributes to a
    // sum exactly what a zero row did; no separate vertex frame, the
    // final full-outer join covers sources ∪ targets = all vertices).
    var hub = e.select(col("s").as("id")).distinct()
      .withColumn("h", lit(scale))
    var auth = hub.select(col("id")).withColumn("a", lit(0L))
    for (i <- 1 to iterations) {
      val (prevHub, prevAuth) = (hub, auth)
      val aRaw = eJ.join(hub.withColumnRenamed("id", "s"), Seq("s"))
        .groupBy(col("t").as("id"))
        .agg(sum(col("h").cast("decimal(38,0)") * col("w")).as("_ar"))
      val aMax = aRaw.agg(max(col("_ar")).as("_am"))
      // lazy mid-round cut — the [[hits]] round-16 argument
      auth = aRaw.crossJoin(broadcast(aMax))
        .select(col("id"),
          coalesce(expr(s"(_ar * $scale) div _am"), lit(0L)).as("a"))
        .localCheckpoint(eager = false)
      val hRaw = eTJ.join(auth.withColumnRenamed("id", "t"), Seq("t"))
        .groupBy(col("s").as("id"))
        .agg(sum(col("a").cast("decimal(38,0)") * col("w")).as("_hr"))
      val hMax = hRaw.agg(max(col("_hr")).as("_hm"))
      hub = hRaw.crossJoin(broadcast(hMax))
        .select(col("id"),
          coalesce(expr(s"(_hr * $scale) div _hm"), lit(0L)).as("h"))
        .localCheckpoint()
      // release the dead previous round (the [[hits]] discipline)
      if (i > 1) {
        graft.api.Lifecycle.releaseLocalCheckpoint(prevHub)
        graft.api.Lifecycle.releaseLocalCheckpoint(prevAuth)
      }
    }
    val out = hub.join(auth, Seq("id"), "full_outer")
      .select(col("id"), coalesce(col("h"), lit(0L)).as("hub"),
        coalesce(col("a"), lit(0L)).as("auth"))
      .localCheckpoint()
    graft.api.Lifecycle.releaseLocalCheckpoint(hub)
    graft.api.Lifecycle.releaseLocalCheckpoint(auth)
    e.unpersist()
    if (!small) eT.unpersist()
    out
  }

  /** [[weightedHits]] over STRING-keyed vertices — the [[hitsByKey]]
    * shape at anchor-volume granularity: keys map through the shared
    * 60-bit hash, per-occurrence (src, dst, w) rows collapse to
    * directed pairs with SUMMED weight inside [[weightedHits]], and
    * the scores join the key back through the broadcast-sized vertex
    * map. The graph stays DIRECTED ([[hitsByKey]]'s reasoning —
    * hub/authority duality IS the direction structure).
    *
    * @return one row per vertex: (key, hub, auth).
    */
  def weightedHitsByKey(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, iterations: Int = 3,
      scale: Long = Scale): DataFrame = {
    val h = keyedWeightedEdges(edges, srcCol, dstCol, weightCol)
    weightedHits(h.select(col("s"), col("t"), col("w")), "s", "t", "w",
        iterations, scale)
      .join(vertexMap(h), Seq("id"))
      .select(col("key"), col("hub"), col("auth"))
  }

  /** [[weightedHitsByKey]] over a persisted [[writeWeightedEdgeIndex]]
    * — the DIRECTED consumer the family stores its orientation for:
    * identical output to weighted-HITS-ing the raw link stream the
    * index was built+folded from, at index-sized cost. The canonical
    * directed pair aggregation inside [[weightedHits]] doubles as the
    * cross-run SUM reconcile (the [[weightedRanksByKeyAgainstIndex]]
    * argument, directed), so reads are correct at any layer count and
    * both weighted consumers — undirected rank and directed
    * hub/authority — rank ONE reconciled graph.
    */
  def weightedHitsByKeyAgainstIndex(s: org.apache.spark.sql.SparkSession,
      indexPath: String, iterations: Int = 3,
      scale: Long = Scale): DataFrame = {
    val (e, v) =
      weightedFromIndex(s, indexPath, "weightedHitsByKeyAgainstIndex")
    weightedHits(e, "s", "t", "w", iterations, scale)
      .join(v, Seq("id"))
      .select(col("key"), col("hub"), col("auth"))
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.TextOps

/** The streaming CRAWL SCHEDULER — the whole front door composed as
  * ONE gate, closing the loop the batch pieces prove individually:
  * q147 discovery ([[FrontierGate]]), q148/q166 robots compliance
  * ([[TextOps.robotsFilterMapOnly]] — the map-only verdict form,
  * because the batch op's rank window cannot run on a streaming
  * frame), q146's politeness budget (per-(host, time-window) fetch
  * cap — the [[QuotaCap.firstNPerKey]] discipline with cost = 1), and
  * q162's deployed host priority (the maintained edge index's
  * PageRank, authored as a static snapshot). A crawler subscribes to
  * the output and fetches: each emitted row is a never-scheduled,
  * robots-allowed canonical URL within its host's window budget,
  * carrying its host's link-graph rank.
  *
  *   fetched docs (stream)
  *   → extract + canonicalize + visited anti-join + within-watermark
  *     dedup                       ([[FrontierGate.discoveries]];
  *                                  stateful op #1, dedup state)
  *   → robots verdict + keep allowed  (broadcast rule arrays —
  *                                  map-only, stateless)
  *   → per-(host, window) fetch budget ([[QuotaCap.firstNPerKey]] on
  *                                  key = host × window start; fMGWS,
  *                                  stateful op #2 and the LAST
  *                                  stateful op — nothing downstream
  *                                  needs the watermark, so the
  *                                  no-event-time-output limitation
  *                                  of fMGWS is moot here)
  *   → stream-static LEFT join of the authored rank snapshot
  *     (host-count-sized broadcast; LEFT because a frontier's whole
  *     point is NEW hosts — they carry a null rank, the scheduler's
  *     cold-start tier, rather than silently vanishing)
  *
  * SEMANTICS DELTA vs the batch q154/q162 scheduler, stated like
  * [[QuotaCap.firstNPerKey]]'s: the batch budget keeps each host's
  * MOST-REFERENCED URLs (a pure function of the final extraction);
  * a stream cannot know final in-link counts, so the streaming budget
  * is FIRST-N-ARRIVALS-WIN per (host, window) — within a micro-batch,
  * event-time order breaks ties. Both obey the same politeness law
  * (at most `budgetPerWindow` fetches per host per window); the
  * in-link priority is recoverable downstream by re-ranking the
  * emitted window with the batch op. StreamingSpec pins row-for-row
  * parity against the equivalent batch composition on a split where
  * the budget does not bind, the budget law where it does, and the
  * fold-while-serving snapshot contract for the rank side.
  *
  * SNAPSHOT CONTRACT (the gate-family author-once posture, and the
  * same trade as [[GramGate]]): [[author]] reads the edge index and
  * the rules ONCE — the rank snapshot and the grouped rule arrays
  * localCheckpoint eagerly (cache-owned), so a
  * [[graft.operators.PageRank.foldIntoEdgeIndex]] landing while the
  * gate serves is INVISIBLE until re-author (a scheduler wants a
  * stable priority epoch per crawl cycle), and no micro-batch ever
  * re-runs the rank iteration. Quiesce across any maintain* that may
  * compact, per the [[graft.api.IndexMaintenance]] reader contract.
  *
  * Output (append): canonical_url, host, idCol (the discovering doc),
  * tsCol, window_start, host_rank (nullable for unranked hosts).
  */
object SchedulerGate {

  /** The authored static state: per-host robots rule arrays + the
    * host-rank snapshot off the edge index. Releasing it is the
    * caller's job once the gate's query stops.
    */
  case class SchedulerState(rules: DataFrame, ranks: DataFrame) {
    def unpersist(): Unit = {
      graft.api.Lifecycle.releaseLocalCheckpoint(rules)
      graft.api.Lifecycle.releaseLocalCheckpoint(ranks)
      ()
    }
  }

  /** Author the scheduler's static inputs ONCE: snapshot the (host,
    * prefix, allow) rules frame (e.g. [[TextOps.parseRobots]] output)
    * and rank the persisted
    * [[graft.operators.PageRank.writeEdgeIndex]] host graph — both
    * localCheckpoint eagerly (the rank iteration must never run
    * inside a micro-batch). A missing/meta-less index fails HERE by
    * name, at author time, not mid-stream. Rules columns must be
    * (host, prefix, allow) — parseRobots' output contract.
    */
  def author(spark: SparkSession, rules: DataFrame, edgeIndexPath: String,
      iterations: Int = 5): SchedulerState =
    authorWith(rules, graft.operators.PageRank
      .ranksByKeyAgainstIndex(spark, edgeIndexPath, iterations)
      .select(col("key").as("host"), col("rank").as("host_rank")))

  /** [[author]] from ANY precomputed (host, host_rank) frame — e.g.
    * `weightedRanksByKeyAgainstIndex` output off the WEIGHTED edge
    * index when the queue should order by anchor VOLUME (q167's
    * deployed signal) instead of graph position, or an externally
    * blended priority. Same author-once snapshot semantics: both
    * frames materialize here and stay fixed until re-author.
    */
  def authorWith(rules: DataFrame, ranks: DataFrame): SchedulerState = {
    val r = rules.select(col("host"), col("prefix").cast("string"),
        col("allow").cast("boolean"))
      .localCheckpoint()
    graft.api.Lifecycle.registerCacheOwned(r)
    val rk = ranks.select(col("host"), col("host_rank")).localCheckpoint()
    graft.api.Lifecycle.registerCacheOwned(rk)
    SchedulerState(r, rk)
  }

  /** docs: a STREAMING frame with (idCol: Long doc ids, textCol,
    * tsCol). `window` is the politeness cycle ("1 hour": at most
    * `budgetPerWindow` fetches per host per hour); `visitedPath` per
    * [[FrontierGate.discoveries]].
    */
  def schedule(docs: DataFrame, idCol: String, textCol: String,
      tsCol: String, delay: String, window: String, visitedPath: String,
      state: SchedulerState, budgetPerWindow: Int): DataFrame = {
    require(budgetPerWindow >= 1,
      s"SchedulerGate.schedule: budgetPerWindow must be >= 1, got " +
        s"$budgetPerWindow")
    val s = docs.sparkSession
    import s.implicits._
    val disc = FrontierGate.discoveries(docs, idCol, textCol, tsCol,
      delay, visitedPath)
    // map-only robots verdict over the canonical URL (the form q148
    // enforces on raw hrefs; a canonical URL is still scheme://host/
    // path, so HostPattern and the path strip apply unchanged)
    val verdicts = TextOps.robotsFilterMapOnly(disc, idCol,
      "canonical_url", state.rules, extraCols = Seq("host", tsCol))
    // per-(host, politeness-window) fetch budget: the QuotaCap
    // first-N-arrivals discipline with cost = 1 per fetch; the window
    // bucket is a deterministic function of the event time, so it is
    // recomputable after the quota stage
    val win = org.apache.spark.sql.functions.window(col(tsCol), window)
    val keyed = verdicts.filter(col("allowed"))
      .withColumn("_w", win)
      .select(
        concat(col("host"), lit("|"),
          col("_w").getField("start").cast("long").cast("string")).as("key"),
        col(idCol).cast("long").as("docId"),
        col("canonical_url").as("payload"),
        col(tsCol).as("ts"))
      .as[KeyedDoc]
    val budgeted = QuotaCap.firstNPerKey(keyed, budgetPerWindow).toDF()
    budgeted
      .withColumn("_w",
        org.apache.spark.sql.functions.window(col("ts"), window))
      .select(col("payload").as("canonical_url"),
        regexp_extract(col("payload"), TextOps.HostPattern, 1).as("host"),
        col("docId").as(idCol), col("ts").as(tsCol),
        col("_w").getField("start").as("window_start"))
      .join(broadcast(state.ranks), Seq("host"), "left")
      .select(col("canonical_url"), col("host"), col(idCol), col(tsCol),
        col("window_start"), col("host_rank"))
  }
}

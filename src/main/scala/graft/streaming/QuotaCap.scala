package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-key quota — the unbounded twin of the q84 capability
  * (SampleOps.capPerKey): admit at most `cap` records per key over the
  * stream's lifetime, the crawl-throttling / source-balancing gate of
  * a continuous ingest ("no domain contributes more than N documents
  * to this collection window").
  *
  * Semantics delta vs batch, stated like Dedup.firstPerKey's: the
  * batch cap keeps the hash-PRIORITY top-N per key (a pure function of
  * the final corpus); a stream cannot know the global priority order,
  * so the streaming contract is FIRST-N-ARRIVALS-WIN (within a batch,
  * event-time order breaks ties — the same unordered-micro-batch
  * discipline as SequenceMatch). A post-hoc batch capPerKey over the
  * admitted set re-establishes the deterministic selection if needed.
  *
  * Scale: state is ONE counter (a long) per key, never the admitted
  * rows; the single shuffle is the groupByKey exchange. Counters for
  * retired keys persist for the stream's lifetime in [[firstNPerKey]];
  * [[firstNPerKeyWithinHorizon]] is the bounded-state variant — the
  * counter purges once a key goes idle past the event-time horizon, so
  * state size is bounded by the ACTIVE key set (the property that
  * keeps a 100TB ingest's state store finite), at the price of the
  * quota resetting for keys that fall silent.
  */
case class KeyedDoc(key: String, docId: Long, payload: String,
    ts: java.sql.Timestamp)

object QuotaCap {

  private implicit val cntEnc: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
  private implicit val keyEnc: org.apache.spark.sql.Encoder[String] = Encoders.STRING
  private implicit val docEnc: org.apache.spark.sql.Encoder[KeyedDoc] = Encoders.product[KeyedDoc]

  /** First `cap` arrivals per key pass; everything after is dropped. */
  def firstNPerKey(docs: Dataset[KeyedDoc], cap: Int): Dataset[KeyedDoc] = {
    require(cap > 0, s"firstNPerKey: cap must be positive, got $cap")
    docs.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(admit(cap) _)
  }

  private def admit(cap: Int)(key: String, batch: Iterator[KeyedDoc],
      state: GroupState[Long]): Iterator[KeyedDoc] = {
    var n = state.getOption.getOrElse(0L)
    if (n >= cap) {
      // quota already exhausted — drain without buffering
      Iterator.empty
    } else {
      // micro-batches arrive unordered; event time (then id) is the
      // arrival order, matching the reference's parallelism-1 total
      // order discipline
      val admitted = batch.toSeq
        .sortBy(d => (d.ts.getTime, d.docId))
        .take(cap - n.toInt)
      n += admitted.length
      state.update(n)
      admitted.iterator
    }
  }

  /** Horizon-quota state: admitted count + latest activity seen, so
    * the purge timer is MONOTONE (an out-of-order batch must never
    * move it backward). Public: Catalyst codegen instantiates it.
    */
  case class QuotaState(n: Long, lastMs: Long)

  private implicit val qsEnc: org.apache.spark.sql.Encoder[QuotaState] =
    Encoders.product[QuotaState]

  /** [[firstNPerKey]] with a purge horizon: the counter evicts via
    * event-time timeout once the key has been idle for `delay` past
    * the watermark — bounded state, quota-per-activity-burst
    * semantics. `docs` must carry the event-time in `ts`.
    *
    * Semantics delta vs [[firstNPerKey]]: under EventTimeTimeout,
    * Spark drops rows at or behind the current watermark BEFORE the
    * state function runs, so LATE data is neither admitted nor counted
    * here (the unbounded variant, which declares no watermark, admits
    * it) — the usual bounded-state trade, same as
    * `dropDuplicatesWithinWatermark`.
    */
  def firstNPerKeyWithinHorizon(docs: Dataset[KeyedDoc], cap: Int,
      delay: String): Dataset[KeyedDoc] = {
    require(cap > 0, s"firstNPerKeyWithinHorizon: cap must be positive, got $cap")
    docs.withWatermark("ts", delay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(admitWithTimeout(cap, delay) _)
  }

  private def admitWithTimeout(cap: Int, horizon: String)(key: String,
      batch: Iterator[KeyedDoc], state: GroupState[QuotaState]): Iterator[KeyedDoc] = {
    if (state.hasTimedOut) {
      // idle past the horizon: purge the counter — the next burst from
      // this key starts a fresh quota
      state.remove()
      Iterator.empty
    } else {
      val prev = state.getOption.getOrElse(QuotaState(0L, Long.MinValue))
      var batchMax = Long.MinValue
      val admitted =
        if (prev.n >= cap) {
          // exhausted: single streaming pass for the activity max —
          // no buffering, no sort (the sibling admit()'s discipline)
          batch.foreach(d => batchMax = math.max(batchMax, d.ts.getTime))
          Seq.empty
        } else {
          // under quota: the sort (arrival order = event time, the
          // unordered-micro-batch discipline) buffers the key's batch;
          // the activity max covers EVERY row, admitted or dropped
          val rows = batch.toSeq.sortBy(d => (d.ts.getTime, d.docId))
          rows.foreach(d => batchMax = math.max(batchMax, d.ts.getTime))
          rows.take(cap - prev.n.toInt)
        }
      // monotone re-arm: latest activity EVER, not just this batch's —
      // an out-of-order batch must not pull the purge timer backward
      // and reset the quota early. (Rows reaching this function are
      // already > watermark, so the timer always lands ahead of it.)
      val lastMs = math.max(prev.lastMs, batchMax)
      state.update(QuotaState(prev.n + admitted.length, lastMs))
      state.setTimeoutTimestamp(lastMs, horizon)
      admitted.iterator
    }
  }
}

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

  /** [[firstNPerKey]] with a purge horizon: the counter evicts via
    * event-time timeout once the key has been idle for `delay` past
    * the watermark — bounded state, quota-per-activity-burst
    * semantics. `docs` must carry the event-time in `ts`.
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
      batch: Iterator[KeyedDoc], state: GroupState[Long]): Iterator[KeyedDoc] = {
    if (state.hasTimedOut) {
      // idle past the horizon: purge the counter — the next burst from
      // this key starts a fresh quota
      state.remove()
      Iterator.empty
    } else {
      val rows = batch.toSeq.sortBy(d => (d.ts.getTime, d.docId))
      val n = state.getOption.getOrElse(0L)
      val admitted = if (n >= cap) Seq.empty else rows.take(cap - n.toInt)
      state.update(n + admitted.length)
      // re-arm the purge timer at (latest activity + horizon); the
      // base must sit above the current watermark — a late burst whose
      // event times already fell behind it re-arms from the watermark
      val base = math.max(rows.map(_.ts.getTime).max,
        state.getCurrentWatermarkMs() + 1)
      state.setTimeoutTimestamp(base, horizon)
      admitted.iterator
    }
  }
}

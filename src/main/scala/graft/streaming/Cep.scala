package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Generic CEP-lite sequence matcher (SURVEY.md §4.2 must-build #1) —
  * the library form of the reference's `Pattern.begin(...).next/
  * followedBy(...).within(...)` + `PatternTimeoutFunction` surface
  * (LoginFailWithCep.scala:28-36, OrderTimeout.scala:33-45), built on
  * `flatMapGroupsWithState`.
  *
  * Semantics per key:
  *  - events are processed in event-time order (batch-internal sort;
  *    the reference's ascending-watermark total order);
  *  - a partial match advances when the next step's predicate accepts
  *    the event AND the event is within `withinMs` of the match start;
  *  - STRICT contiguity (CEP `next`): a non-advancing event KILLS the
  *    partial; RELAXED (`followedBy`): the partial survives gaps;
  *  - completing the last step emits tag="matched";
  *  - a partial whose `withinMs` deadline passes the watermark emits
  *    tag="timeout" carrying the steps it did reach (the reference's
  *    timed-out side output) — driven by EventTimeTimeout.
  *
  * Scale: one hash exchange (groupByKey); state per key is the live
  * partial-match list, bounded by (steps × concurrent starts inside
  * one `withinMs` horizon) — the same envelope as Flink's NFA state.
  */
case class CepPartial(stepDone: Int, firstTsMs: Long, lastTsMs: Long,
    eventIds: Seq[Long])

case class CepState(partials: Seq[CepPartial])

case class CepMatch(key: Long, tag: String, stepsDone: Int,
    eventIds: Seq[Long], firstTsMs: Long, lastTsMs: Long)

final case class Pattern(
    steps: Seq[StreamEvent => Boolean],
    withinMs: Long,
    strict: Boolean) {
  require(steps.size >= 2, "Pattern needs at least two steps")
}

/** [[Pattern]]'s gap-bounded sibling ([[Cep.withinSession]]): a partial
  * stays alive while CONSECUTIVE accepted events arrive within `gapMs`
  * of each other — the `session_window` contract applied to sequence
  * matching, the shape real funnels use ("the user kept going", not
  * "the user finished inside a fixed horizon"): a slow-but-continuous
  * funnel matches regardless of total span, while any single gap over
  * `gapMs` times the partial out.
  */
final case class SessionPattern(
    steps: Seq[StreamEvent => Boolean],
    gapMs: Long,
    strict: Boolean) {
  require(steps.size >= 2, "SessionPattern needs at least two steps")
}

object Cep {

  private implicit val stateEnc: org.apache.spark.sql.Encoder[CepState] = Encoders.product[CepState]
  private implicit val matchEnc: org.apache.spark.sql.Encoder[CepMatch] = Encoders.product[CepMatch]
  private implicit val longEnc: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong

  /** Overflow-safe deadline addition: a caller using a huge horizon
    * ("effectively unbounded" withinMs/gapMs near Long.MaxValue) must
    * saturate, not wrap to a negative deadline that would expire every
    * partial instantly.
    */
  private def satAdd(base: Long, horizon: Long): Long = {
    val d = base + horizon
    if (horizon > 0 && d < base) Long.MaxValue else d
  }

  def matchPattern(events: Dataset[StreamEvent], pattern: Pattern)
      : Dataset[CepMatch] =
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        step(pattern.steps, pattern.strict,
          p => satAdd(p.firstTsMs, pattern.withinMs)) _)

  /** [[matchPattern]] under SESSION-GAP survival ([[SessionPattern]]):
    * identical machinery, one changed deadline — `lastTsMs + gapMs`
    * (advances with every accepted event) instead of the fixed
    * `firstTsMs + withinMs`. Everything else (strict/relaxed
    * contiguity, timeout side output carrying the reached steps, the
    * per-key state envelope) is shared code, so the two horizon
    * semantics cannot drift.
    */
  def withinSession(events: Dataset[StreamEvent], pattern: SessionPattern)
      : Dataset[CepMatch] =
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        step(pattern.steps, pattern.strict,
          p => satAdd(p.lastTsMs, pattern.gapMs)) _)

  /** A partial can accept events until (exclusive) this event-time; at
    * it, the partial times out. Funnel patterns pin it to the match
    * start, session patterns to the last accepted event.
    */
  private def expire(key: Long, live: Seq[CepPartial], watermarkMs: Long,
      deadline: CepPartial => Long): (Seq[CepPartial], Seq[CepMatch]) = {
    val (dead, alive) = live.partition(deadline(_) <= watermarkMs)
    (alive, dead.map(p => CepMatch(key, "timeout", p.stepDone, p.eventIds,
      p.firstTsMs, p.lastTsMs)))
  }

  private def step(steps: Seq[StreamEvent => Boolean], strict: Boolean,
      deadline: CepPartial => Long)(key: Long,
      events: Iterator[StreamEvent], state: GroupState[CepState])
      : Iterator[CepMatch] = {
    val wm = state.getCurrentWatermarkMs()
    var live = state.getOption.map(_.partials).getOrElse(Seq.empty)
    val out = Seq.newBuilder[CepMatch]

    if (state.hasTimedOut || events.isEmpty) {
      val (alive, timedOut) = expire(key, live, wm, deadline)
      out ++= timedOut
      live = alive
    }

    events.toSeq.sortBy(e => (e.tsMs, e.eventId)).foreach { e =>
      val advanced = Seq.newBuilder[CepPartial]
      live.foreach { p =>
        val withinBound = e.tsMs <= deadline(p)
        if (withinBound && e.tsMs >= p.lastTsMs &&
            steps(p.stepDone)(e)) {
          val np = CepPartial(p.stepDone + 1, p.firstTsMs, e.tsMs,
            p.eventIds :+ e.eventId)
          if (np.stepDone == steps.size)
            out += CepMatch(key, "matched", np.stepDone, np.eventIds,
              np.firstTsMs, np.lastTsMs)
          else advanced += np
        } else if (!withinBound) {
          // can never complete → timed out
          out += CepMatch(key, "timeout", p.stepDone, p.eventIds,
            p.firstTsMs, p.lastTsMs)
        } else if (!strict) {
          advanced += p // relaxed: survive the gap event
        }
        // strict + non-matching event: partial dies silently (CEP `next`)
      }
      live = advanced.result()
      if (steps.head(e))
        live :+= CepPartial(1, e.tsMs, e.tsMs, Seq(e.eventId))
      // a single event can both complete one partial and start another —
      // matches CEP's skip-to-next-row behavior
    }

    if (live.isEmpty) state.remove()
    else {
      state.update(CepState(live))
      state.setTimeoutTimestamp(live.map(deadline).min)
    }
    out.result().iterator
  }
}

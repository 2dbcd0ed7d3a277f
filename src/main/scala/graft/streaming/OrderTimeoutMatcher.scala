package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode,
  TimerValues, ValueState}

/** F3/J4: order-payment timeout detection — the reference's
  * `OrderPayMatch` KeyedProcessFunction with event-time timers
  * (OrderTimeoutWithoutCep.scala:33-97) and the CEP-with-timeout
  * variant (OrderTimeout.scala:33-45), rebuilt on
  * `flatMapGroupsWithState` + EventTimeTimeout.
  *
  * Outcomes (the 4-label superset, SURVEY.md §2.7 F3):
  *  - "payed successfully"       pay within `timeoutMs` of create
  *  - "payed but already timeout" pay after the deadline
  *  - "payed but no create log"  pay with no/later create
  *  - "order timeout"            create with no pay by watermark deadline
  *
  * State is O(1) per in-flight key and cleared on resolution; the
  * event-time timer is the watermark-driven GroupState timeout — the
  * same mechanism the reference builds from Flink timer services.
  */
/** State for OrderTimeoutMatcher (public: Catalyst codegen). */
case class Pending(createMs: Long, hasCreate: Boolean,
    payMs: Long, hasPay: Boolean)

object OrderTimeoutMatcher {

  private implicit val pendingEnc: org.apache.spark.sql.Encoder[Pending] = Encoders.product[Pending]
  private implicit val outEnc: org.apache.spark.sql.Encoder[OrderOutcome] = Encoders.product[OrderOutcome]
  private implicit val longEnc: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong

  /** `creates`/`pays` discriminated by eventType ("create" / "pay"). */
  def detect(events: Dataset[StreamEvent], timeoutMs: Long)
      : Dataset[OrderOutcome] = {
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(machine(timeoutMs) _)
  }

  private def resolve(p: Pending, timeoutMs: Long): OrderOutcome = {
    val msg =
      if (!p.hasPay) "order timeout"
      else if (!p.hasCreate || p.payMs < p.createMs) "payed but no create log"
      else if (p.payMs - p.createMs <= timeoutMs) "payed successfully"
      else "payed but already timeout"
    OrderOutcome(0L, if (p.hasCreate) p.createMs else -1L, msg)
  }

  /** [[detect]] re-expressed on Spark 4's `transformWithState` — the
    * second (and richest) fMGWS operator migrated after the QuotaCap
    * pilot: 4 outcomes, an event-time timer per in-flight key, and
    * match-and-clear resolution. Same contract as [[detect]];
    * StreamingSpec asserts outcome parity against the batch q09
    * catalog query under the RocksDB store (which `transformWithState`
    * requires — the fMGWS path stays the default-store default).
    *
    * Timer discipline (vs fMGWS's single implicit timeout slot): the
    * armed deadline is always derivable from state (`base(p) +
    * timeoutMs`), so a re-arm deletes the previously-armed timer
    * first, and the expiry handler re-checks against the CURRENT
    * deadline before resolving — an undeleted stale timer can never
    * time out a key whose deadline moved.
    */
  def detectTws(events: Dataset[StreamEvent], timeoutMs: Long)
      : Dataset[OrderOutcome] = {
    events
      .groupByKey(_.userId)
      .transformWithState(new TimeoutProcessor(timeoutMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Unresolved deadline base: create if seen, else the lone pay. */
  private def base(p: Pending): Long = if (p.hasCreate) p.createMs else p.payMs

  /** [[detectTws]]'s state machine: Pending in a named ValueState +
    * one real event-time timer at base + timeout.
    */
  private class TimeoutProcessor(timeoutMs: Long)
      extends StatefulProcessor[Long, StreamEvent, OrderOutcome] {
    @transient private var st: ValueState[Pending] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Pending]("pending", pendingEnc, TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[StreamEvent],
        timerValues: TimerValues): Iterator[OrderOutcome] = {
      val prev = if (st.exists()) Some(st.get()) else None
      var p = prev.getOrElse(Pending(-1L, false, -1L, false))
      rows.toSeq.sortBy(e => (e.tsMs, e.eventId)).foreach { e =>
        if (e.eventType == "create" && (!p.hasCreate || e.tsMs < p.createMs))
          p = p.copy(createMs = e.tsMs, hasCreate = true)
        if (e.eventType == "pay" && (!p.hasPay || e.tsMs < p.payMs))
          p = p.copy(payMs = e.tsMs, hasPay = true)
      }
      // the deadline armed by the previous batch, if any — recomputed
      // from prior state, so no extra timer bookkeeping state
      prev.foreach { q =>
        if (base(q) != base(p)) getHandle.deleteTimer(base(q) + timeoutMs)
      }
      if (p.hasCreate && p.hasPay) {
        if (prev.exists(q => base(q) == base(p)))
          getHandle.deleteTimer(base(p) + timeoutMs)
        st.clear()
        Iterator.single(resolve(p, timeoutMs).copy(userId = userId))
      } else {
        st.update(p)
        getHandle.registerTimer(base(p) + timeoutMs)
        Iterator.empty
      }
    }

    override def handleExpiredTimer(userId: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[OrderOutcome] = {
      // staleness guard: resolve only at the CURRENT deadline
      if (st.exists() &&
          expiredTimerInfo.getExpiryTimeInMs() >= base(st.get()) + timeoutMs) {
        val out = resolve(st.get(), timeoutMs).copy(userId = userId)
        st.clear()
        Iterator.single(out)
      } else Iterator.empty
    }
  }

  private def machine(timeoutMs: Long)(userId: Long,
      events: Iterator[StreamEvent], state: GroupState[Pending])
      : Iterator[OrderOutcome] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(p => resolve(p, timeoutMs).copy(userId = userId))
      state.remove()
      return out.iterator
    }
    var p = state.getOption.getOrElse(Pending(-1L, false, -1L, false))
    events.toSeq.sortBy(e => (e.tsMs, e.eventId)).foreach { e =>
      if (e.eventType == "create" && (!p.hasCreate || e.tsMs < p.createMs))
        p = p.copy(createMs = e.tsMs, hasCreate = true)
      if (e.eventType == "pay" && (!p.hasPay || e.tsMs < p.payMs))
        p = p.copy(payMs = e.tsMs, hasPay = true)
    }
    if (p.hasCreate && p.hasPay) {
      // Resolved: emit now, clear state (ref :58-69 match-and-clear).
      state.remove()
      Iterator.single(resolve(p, timeoutMs).copy(userId = userId))
    } else {
      state.update(p)
      // Timer at create+timeout (ref :55); lone pays flush at +timeout too.
      val base = if (p.hasCreate) p.createMs else p.payMs
      state.setTimeoutTimestamp(base + timeoutMs)
      Iterator.empty
    }
  }
}

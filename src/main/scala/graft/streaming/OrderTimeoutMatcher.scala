package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

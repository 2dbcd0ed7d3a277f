package graft.streaming

import java.sql.Timestamp

/** Typed records for the streaming operators. `ts` drives watermarks
  * (ms precision — the reference's event-time resolution, SURVEY.md §1.3).
  */
case class StreamEvent(userId: Long, eventId: Long, eventType: String,
    ts: Timestamp) {
  def tsMs: Long = ts.getTime
}

/** F1/J3 output (ref LoginFail.scala:23 `Warning`). */
case class FailWarning(userId: Long, firstEvent: Long, lastEvent: Long,
    firstTsMs: Long, lastTsMs: Long)

/** F3/J4 output (ref OrderTimeout.scala:16 `OrderResult`). */
case class OrderOutcome(userId: Long, createTsMs: Long, resultMsg: String)

/** J2/F5 two-sided input: side 0 = pay, 1 = receipt
  * (ref TxMacthDetect.scala:10,13).
  */
case class TxEvent(txKey: String, side: Int, eventId: Long, ts: Timestamp) {
  def tsMs: Long = ts.getTime
}

/** J2/F5 output: matched pair or unmatched single side. */
case class TxResult(txKey: String, tag: String, payId: Long, receiptId: Long)

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J1 streaming-NATIVE form: a watermarked stream-stream interval join
  * — the Spark twin of the reference's
  * `orderStream.intervalJoin(receiptStream).between(-5s, +5s)`
  * (ref TxMatchByJoin.scala:36-51).
  *
  * Both sides carry an event-time watermark, so Spark bounds the join
  * state: a buffered pay can be dropped once the receipt-side watermark
  * passes payTs + tolerance (and vice versa) — the micro-batch
  * equivalent of the reference's interval-join state eviction. At
  * scale both streams hash-partition on txId, so each task joins only
  * its own key range with O(tolerance x rate) state per task.
  *
  * Same output columns as the batch `Jobs.txMatchByJoin`, with
  * epoch-second times (parity proven in StreamingSpec). The
  * timer-exact fMGWS reconciler (TxReconcile) stays the J2/F5 form —
  * this is the declarative J1 join.
  */
object TxIntervalJoin {

  /** @param orders   streaming frame: eventType, txId, orderId, ts (timestamp)
    * @param receipts streaming frame: txId, payChannel, ts (timestamp)
    * @return txId, orderId, payChannel, payTime, receiptTime (epoch sec)
    */
  def txMatchByJoinStream(orders: DataFrame, receipts: DataFrame,
      toleranceSec: Long = 5L, watermarkDelay: String = "0 seconds"): DataFrame = {
    val pays = orders
      .filter(col("eventType") === "pay" && col("txId") =!= "")
      .select(col("txId"), col("orderId"), col("ts").as("payTs"))
      .withWatermark("payTs", watermarkDelay)
    val rcpt = receipts
      .select(col("txId").as("rTxId"), col("payChannel"),
        col("ts").as("receiptTs"))
      .withWatermark("receiptTs", watermarkDelay)
    pays.join(rcpt,
        col("txId") === col("rTxId") &&
          col("receiptTs") >= col("payTs") - expr(s"INTERVAL $toleranceSec seconds") &&
          col("receiptTs") <= col("payTs") + expr(s"INTERVAL $toleranceSec seconds"))
      .select(col("txId"), col("orderId"), col("payChannel"),
        unix_timestamp(col("payTs")).as("payTime"),
        unix_timestamp(col("receiptTs")).as("receiptTime"))
  }
}

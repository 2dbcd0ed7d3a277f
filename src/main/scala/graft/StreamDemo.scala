package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming._

/** Dev runner: drives the streaming operators through their public API
  * with micro-batched input, printing what each emits. (Library-surface
  * demo; the parity checks live in StreamingSpec.)
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // base offset: rows at/below the initial watermark (epoch 0) are dropped
    // by the late-data filter, so never feed ts=0 into a watermarked op.
    val base = 24 * 3600000L
    def ts(ms: Long) = new Timestamp(base + ms)

    // ---- OrderTimeoutMatcher: create→pay in time, late pay, no pay ----
    val in = MemoryStream[StreamEvent]
    val q = OrderTimeoutMatcher.detect(
        in.toDS().withWatermark("ts", "0 seconds"), 15 * 60 * 1000L)
      .writeStream.format("memory").queryName("demo_orders")
      .outputMode("append").start()
    in.addData(
      StreamEvent(1, 10, "create", ts(0)),       // pays at +5min → success
      StreamEvent(1, 11, "pay", ts(5 * 60000L)),
      StreamEvent(2, 20, "create", ts(0)),       // pays at +20min → late
      StreamEvent(2, 21, "pay", ts(20 * 60000L)),
      StreamEvent(3, 30, "create", ts(0)),       // never pays → timeout
      StreamEvent(4, 41, "pay", ts(60000L)))     // pay only → no create log
    q.processAllAvailable()
    in.addData(StreamEvent(-9, -1, "create", ts(3 * 3600000L)))
    q.processAllAvailable()
    in.addData(StreamEvent(-9, -2, "create", ts(6 * 3600000L)))
    q.processAllAvailable()
    q.stop()
    println("=== OrderTimeoutMatcher ===")
    spark.table("demo_orders").orderBy("userId").show(20, false)

    // ---- TxReconcile: both orders, lone sides ----
    val tin = MemoryStream[TxEvent]
    val tq = TxReconcile.reconcile(
        tin.toDS().withWatermark("ts", "0 seconds"), 5000L)
      .writeStream.format("memory").queryName("demo_tx")
      .outputMode("append").start()
    tin.addData(
      TxEvent("a", 0, 1, ts(1000)), TxEvent("a", 1, 2, ts(2000)),
      TxEvent("b", 1, 3, ts(1000)), TxEvent("b", 0, 4, ts(2000)),
      TxEvent("lone_pay", 0, 5, ts(1000)),
      TxEvent("lone_rcpt", 1, 6, ts(1000)))
    tq.processAllAvailable()
    tin.addData(TxEvent("w1", 0, -1, ts(600000L))); tq.processAllAvailable()
    tin.addData(TxEvent("w2", 1, -2, ts(1200000L))); tq.processAllAvailable()
    tq.stop()
    println("=== TxReconcile ===")
    spark.table("demo_tx").orderBy("txKey").show(20, false)

    // ---- SequenceMatch: 2 fails in gap, fail after gap ----
    val sin = MemoryStream[StreamEvent]
    val sq = SequenceMatch.consecutiveFails(sin.toDS(), 2000L)
      .writeStream.format("memory").queryName("demo_seq")
      .outputMode("append").start()
    sin.addData(
      StreamEvent(7, 1, "fail", ts(1000)),
      StreamEvent(7, 2, "fail", ts(2500)),   // within 2s of #1 → warn
      StreamEvent(7, 3, "fail", ts(99000)),  // far → no warn
      StreamEvent(8, 4, "fail", ts(1000)))   // single → no warn
    sq.processAllAvailable()
    // cross-batch pair: #5 arrives a batch later, within gap of #3
    sin.addData(StreamEvent(7, 5, "fail", ts(100000L)))
    sq.processAllAvailable()
    sq.stop()
    println("=== SequenceMatch ===")
    spark.table("demo_seq").orderBy("firstEvent").show(20, false)

    // ---- Cep: generic 3-step funnel view→cart→buy within 10min,
    //      relaxed contiguity, timeout branch for abandoned carts ----
    val cin = MemoryStream[StreamEvent]
    val funnel = Pattern(Seq(
      (e: StreamEvent) => e.eventType == "view",
      (e: StreamEvent) => e.eventType == "cart",
      (e: StreamEvent) => e.eventType == "buy"), 10 * 60000L, strict = false)
    val cq = Cep.matchPattern(
        cin.toDS().withWatermark("ts", "0 seconds"), funnel)
      .writeStream.format("memory").queryName("demo_cep")
      .outputMode("append").start()
    cin.addData(
      StreamEvent(1, 1, "view", ts(1000)),      // full funnel → matched
      StreamEvent(1, 2, "other", ts(2000)),     // survives (relaxed)
      StreamEvent(1, 3, "cart", ts(3000)),
      StreamEvent(1, 4, "buy", ts(4000)),
      StreamEvent(2, 5, "view", ts(1000)),      // abandons at cart → timeout
      StreamEvent(2, 6, "cart", ts(2000)))
    cq.processAllAvailable()
    cin.addData(StreamEvent(-9, -1, "other", ts(3600000L)))
    cq.processAllAvailable()
    cin.addData(StreamEvent(-9, -2, "other", ts(7200000L)))
    cq.processAllAvailable()
    cq.stop()
    println("=== Cep (view→cart→buy funnel) ===")
    spark.table("demo_cep").orderBy("key").show(20, false)

    // ---- Cep.withinSession: the same funnel under a SESSION gap —
    //      "the user kept going" (each step within 2min of the last)
    //      instead of a fixed total horizon: a slow-but-continuous
    //      funnel matches at any total span; one 2min+ gap times out ----
    val csin = MemoryStream[StreamEvent]
    val sessionFunnel = SessionPattern(Seq(
      (e: StreamEvent) => e.eventType == "view",
      (e: StreamEvent) => e.eventType == "cart",
      (e: StreamEvent) => e.eventType == "buy"), 2 * 60000L, strict = false)
    val csq = Cep.withinSession(
        csin.toDS().withWatermark("ts", "0 seconds"), sessionFunnel)
      .writeStream.format("memory").queryName("demo_cep_session")
      .outputMode("append").start()
    csin.addData(
      StreamEvent(1, 1, "view", ts(1000)),        // continuous shopper:
      StreamEvent(1, 2, "cart", ts(110 * 1000)),  // every gap < 2min,
      StreamEvent(1, 3, "buy", ts(215 * 1000)),   // span 3.5min → matched
      StreamEvent(2, 4, "view", ts(1000)),        // walked away 3min
      StreamEvent(2, 5, "cart", ts(181 * 1000)))  // → view times out
    csq.processAllAvailable()
    csin.addData(StreamEvent(-9, -1, "other", ts(3600000L)))
    csq.processAllAvailable()
    csin.addData(StreamEvent(-9, -2, "other", ts(7200000L)))
    csq.processAllAvailable()
    csq.stop()
    println("=== Cep.withinSession (same funnel, 2min session gap) ===")
    spark.table("demo_cep_session").orderBy("key").show(20, false)

    spark.stop()
  }
}

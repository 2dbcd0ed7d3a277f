package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming._

/** Streaming twins vs batch semantics: the stateful operators run over
  * MemoryStream micro-batches and must agree with the batch catalog
  * queries on the same data (order-insensitive compare — SURVEY.md §7.4
  * item 7).
  */
class StreamingSpec extends SparkSpec {

  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(ms: Long) = new Timestamp(ms)

  /** Pump a far-future sentinel through twice so the watermark passes
    * every real event-time timer (watermark advances one batch behind).
    */
  private def flush[T](input: MemoryStream[StreamEvent],
      q: org.apache.spark.sql.streaming.StreamingQuery, farMs: Long): Unit = {
    input.addData(StreamEvent(-999L, -1L, "sentinel", ts(farMs)))
    q.processAllAvailable()
    input.addData(StreamEvent(-999L, -2L, "sentinel", ts(farMs + 3600 * 1000L)))
    q.processAllAvailable()
  }

  test("SequenceMatch streaming == batch q08 on the same events") {
    val fails = Tables.events(spark, sf)
      .filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"),
        expr("ts_ns div 1000000").as("ms"))
      .collect()
      .map(r => StreamEvent(r.getLong(0), r.getLong(1), "fail",
        ts(r.getLong(2))))

    val input = MemoryStream[StreamEvent]
    val out = SequenceMatch.consecutiveFails(input.toDS(), 3600 * 1000L)
    val q = out.writeStream.format("memory").queryName("seq_warn")
      .outputMode("append").start()
    try {
      // two micro-batches to exercise cross-batch state
      val (a, b) = fails.splitAt(fails.length / 2)
      input.addData(a.toSeq); q.processAllAvailable()
      input.addData(b.toSeq); q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("seq_warn").as[FailWarning].collect()
      .map(w => (w.userId, w.firstEvent, w.lastEvent)).toSet
    val want = SparkEntry.queries("q08_login_fail_consecutive")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("first_event"),
        r.getAs[Long]("last_event"))).toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("OrderTimeoutMatcher streaming == batch q09 outcomes") {
    val evs = Tables.events(spark, sf)
      .filter(col("event_type").isin("signup", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts_ns div 1000000").as("ms"))
      .collect()
      .map { r =>
        val t = if (r.getString(2) == "signup") "create" else "pay"
        StreamEvent(r.getLong(0), r.getLong(1), t, ts(r.getLong(3)))
      }

    val input = MemoryStream[StreamEvent]
    val out = OrderTimeoutMatcher.detect(
      input.toDS().filter($"eventType" =!= "sentinel")
        .withWatermark("ts", "0 seconds"), 1800 * 1000L)
    val q = out.writeStream.format("memory").queryName("order_out")
      .outputMode("append").start()
    try {
      input.addData(evs.toSeq); q.processAllAvailable()
      flush(input, q, evs.map(_.tsMs).max + 24 * 3600 * 1000L)
    } finally q.stop()

    val got = spark.table("order_out").as[OrderOutcome].collect()
      .map(o => (o.userId, o.resultMsg)).toSet
    val want = SparkEntry.queries("q09_order_timeout")(spark, sf)
      .select("user_id", "result_msg").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // streaming sees only signup/purchase users; batch q09 covers the same
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("TxReconcile: golden scenarios (match both orders, lone sides, overwrite)") {
    val input = MemoryStream[TxEvent]
    val out = TxReconcile.reconcile(
      input.toDS().withWatermark("ts", "0 seconds"), 5000L)
    val q = out.writeStream.format("memory").queryName("tx_out")
      .outputMode("append").start()
    try {
      input.addData(
        TxEvent("t1", 0, 10L, ts(1000)), TxEvent("t1", 1, 11L, ts(2000)), // pay→receipt
        TxEvent("t2", 1, 20L, ts(1000)), TxEvent("t2", 0, 21L, ts(2000)), // receipt→pay
        TxEvent("t3", 0, 30L, ts(1000)),                                  // lone pay
        TxEvent("t4", 1, 40L, ts(1000)))                                  // lone receipt
      q.processAllAvailable()
      input.addData(TxEvent("flush", 0, -1L, ts(10 * 60 * 1000L)))
      q.processAllAvailable()
      input.addData(TxEvent("flush2", 1, -2L, ts(20 * 60 * 1000L)))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("tx_out").as[TxResult].collect()
      .map(r => (r.txKey, r.tag, r.payId, r.receiptId)).toSet
    assert(got.contains(("t1", "matched", 10L, 11L)))
    assert(got.contains(("t2", "matched", 21L, 20L)))
    assert(got.contains(("t3", "unmatched_pay", 30L, -1L)))
    assert(got.contains(("t4", "unmatched_receipt", -1L, 40L)))
  }

  test("streaming session_window == batch q31 sessions") {
    // microsecond-exact timestamps (batch q31 compares in integer us)
    def tsUs(us: Long) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L))
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), expr("ts_ns div 1000").as("us"))
      .collect()
      .map(r => StreamEvent(r.getLong(0), r.getLong(1), "e", tsUs(r.getLong(2))))
    val maxMs = evs.map(_.tsMs).max

    val input = MemoryStream[StreamEvent]
    val sessions = input.toDS()
      .withWatermark("ts", "0 seconds")
      .filter($"eventType" === "e")
      .groupBy($"userId", session_window($"ts", "30 minutes"))
      .count()
      .select($"userId".as("user_id"),
        unix_micros($"session_window.start").as("start_us"),
        (unix_micros($"session_window.end") -
          unix_micros($"session_window.start") -
          lit(1800L * 1000000)).as("dur_us"),
        $"count".as("n_events"))
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // one batch: with a 0s watermark, a second batch containing any
      // event older than the first batch's max would drop it as late
      input.addData(evs.toSeq); q.processAllAvailable()
      // flush sentinels must PASS the filter: rows that are filtered out
      // before the session aggregate advance the watermark but do not
      // trigger its state eviction
      input.addData(StreamEvent(-1L, -1L, "e", ts(maxMs + 48 * 3600000L)))
      q.processAllAvailable()
      input.addData(StreamEvent(-1L, -2L, "e", ts(maxMs + 96 * 3600000L)))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sess_out").filter($"user_id" >= 0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val want = SparkEntry.queries("q31_sessionization")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("sess_start_us"),
        r.getAs[Long]("dur_us"), r.getAs[Long]("n_events"))).toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("streaming approx UV per day == batch q25 (UvWithBloom analog)") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), expr("ts_ns div 1000000").as("ms"))
      .collect()
      .map(r => StreamEvent(r.getLong(0), r.getLong(1), "e", ts(r.getLong(2))))
    val maxMs = evs.map(_.tsMs).max

    val input = MemoryStream[StreamEvent]
    val uv = input.toDS()
      .withWatermark("ts", "0 seconds")
      .groupBy(window($"ts", "1 day"))
      .agg(approx_count_distinct($"userId").as("uv_approx"))
      .select(unix_timestamp($"window.end").as("window_end"), $"uv_approx")
    val q = uv.writeStream.format("memory").queryName("uv_out")
      .outputMode("append").start()
    try {
      input.addData(evs.toSeq); q.processAllAvailable()
      input.addData(StreamEvent(-1L, -1L, "e", ts(maxMs + 72 * 3600000L)))
      q.processAllAvailable()
      input.addData(StreamEvent(-1L, -2L, "e", ts(maxMs + 144 * 3600000L)))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("uv_out").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // q25's catalog output now carries (exact, bound-check); the batch
    // twin of THIS stream is the raw HLL++ aggregate
    val want = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 day"))
      .agg(approx_count_distinct(col("user_id")).as("uv"))
      .select(unix_timestamp(col("window.end")).as("we"), col("uv"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // sentinel days exist only in streaming output; real days must agree
    want.foreach { case (w, v) =>
      assert(got.get(w).contains(v), s"day $w: got=${got.get(w)} want=$v")
    }
    assert(want.nonEmpty)
  }

  test("streaming-native topk_agg ranks == batch q02 (no foreachBatch)") {
    val views = Tables.events(spark, sf)
      .filter(col("event_type") === "view")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item_id"),
        expr("ts_ns div 1000000").as("ms"))
      .collect()
      .map(r => StreamEvent(r.getLong(1), r.getLong(0), "view", ts(r.getLong(2))))
    val maxMs = views.map(_.tsMs).max

    val input = MemoryStream[StreamEvent]
    val ranked = WindowedCounts.topNStreaming(
      input.toDS().toDF().withColumnRenamed("userId", "item_id"),
      "ts", "item_id", "60 minutes", "5 minutes", "0 seconds", n = 3)
    val q = ranked.writeStream.format("memory").queryName("hot_ranked")
      .outputMode("append").start()
    try {
      // split into time-ordered batches so open windows span batches:
      // the first agg must carry cross-batch state before the watermark
      // closes each window and the topk stage sees it
      val ordered = views.sortBy(_.tsMs)
      val (a, b) = ordered.splitAt(ordered.length / 2)
      input.addData(a.toSeq); q.processAllAvailable()
      input.addData(b.toSeq); q.processAllAvailable()
      input.addData(StreamEvent(-1L, -1L, "sentinel", ts(maxMs + 48 * 3600 * 1000L)))
      q.processAllAvailable()
      input.addData(StreamEvent(-1L, -2L, "sentinel", ts(maxMs + 96 * 3600 * 1000L)))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("hot_ranked")
      .filter(col("item_id") >= 0) // drop sentinel-only windows
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val want = SparkEntry.queries("q02_hot_items_topn")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("window_end"), r.getAs[Long]("item_id"),
        r.getAs[Long]("cnt"), r.getAs[Long]("rn"))).toSet
    // sentinel items may displace rank-3 entries in the sliding windows
    // that contain a sentinel ts; restrict to windows without sentinels
    val sentinelWindows = spark.table("hot_ranked")
      .filter(col("item_id") < 0).select("window_end")
      .collect().map(_.getLong(0)).toSet
    assert(got.filterNot(r => sentinelWindows(r._1)) ==
      want.filterNot(r => sentinelWindows(r._1)))
    assert(want.nonEmpty)
  }

  test("streaming sliding window + foreachBatch rank == batch q02") {
    val views = Tables.events(spark, sf)
      .filter(col("event_type") === "view")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("user_id"),
        expr("ts_ns div 1000000").as("ms"))
      .collect()
      .map(r => StreamEvent(r.getLong(1), r.getLong(0), "view",
        ts(r.getLong(2))))
    val maxMs = views.map(_.tsMs).max

    val input = MemoryStream[StreamEvent]
    val counts = WindowedCounts.slidingCount(
      input.toDS().toDF().withColumnRenamed("userId", "item_id"),
      "ts", "item_id", "60 minutes", "5 minutes", "0 seconds")
    val q = counts.writeStream.format("memory").queryName("hot_counts")
      .outputMode("append").start()
    try {
      input.addData(views.toSeq); q.processAllAvailable()
      input.addData(StreamEvent(-1L, -1L, "sentinel", ts(maxMs + 48 * 3600 * 1000L)))
      q.processAllAvailable()
      input.addData(StreamEvent(-1L, -2L, "sentinel", ts(maxMs + 96 * 3600 * 1000L)))
      q.processAllAvailable()
    } finally q.stop()

    val ranked = WindowedCounts.topNPerWindow(3, "item_id")(
        spark.table("hot_counts").filter(col("item_id") >= 0))
      .select("window_end", "item_id", "cnt", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val want = SparkEntry.queries("q02_hot_items_topn")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("window_end"), r.getAs[Long]("item_id"),
        r.getAs[Long]("cnt"), r.getAs[Long]("rn"))).toSet
    assert(ranked == want)
    assert(want.nonEmpty)
  }
}

package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's 12 pipelines (SURVEY.md §0 table) over its own
  * schemas. Each is a pure DataFrame → DataFrame function: feed it a
  * batch CSV read (Sources.csv) or a streaming read (Sources.csvStream /
  * kafkaLines) — Catalyst inserts the streaming state operators when
  * the input is unbounded. Exception: the fine-slide sliding counts
  * (hotUrls, marketingByChannel/Total, adClicksByProvince) use the
  * batch two-level shape (operators.SlidingCounts); their streaming
  * twins are streaming.WindowedCounts.slidingCountKeys (any key arity,
  * parity-tested in StreamingSpec), where the per-window Expand is the
  * correct incremental-state form.
  *
  * Outputs keep the reference's semantics but normalize presentation:
  * epoch-second window bounds, deterministic tie-breaks (SURVEY.md §7.4
  * items 6-7), tag columns instead of side-output streams.
  */
object Jobs {

  private def winEnd: Column = unix_timestamp(col("window.end"))

  // ---- HotItemsAnalysis (ref HotItems.scala:51-57,111-155) --------------

  /** Top-N viewed items per sliding 1h/5min window. */
  def hotItems(behavior: DataFrame, n: Int = 3): DataFrame = {
    val counts = behavior
      .filter(col("behavior") === "pv")
      .groupBy(window(col("ts"), "60 minutes", "5 minutes"), col("itemId"))
      .agg(count(lit(1)).as("cnt"))
      .select(winEnd.as("windowEnd"), col("itemId"), col("cnt"))
    counts.withColumn("rank", row_number().over(
        Window.partitionBy(col("windowEnd"))
          .orderBy(col("cnt").desc, col("itemId").asc)).cast("long"))
      .filter(col("rank") <= n)
  }

  // ---- NetworkFlowAnalysis ----------------------------------------------

  /** Top-N hot URLs per sliding 10min/5s window
    * (ref NetworkFlow.scala:45-48,85-117). The MapState dedup of late
    * re-fires becomes last-write-wins upsert semantics in streaming
    * update mode; batch needs no dedup. Fine slide (120 windows/event)
    * → two-level bucket count, not a 120x per-event Expand
    * (operators.SlidingCounts).
    */
  def hotUrls(log: DataFrame, n: Int = 5): DataFrame = {
    val counts = graft.operators.SlidingCounts.slidingCount(
      log.filter(col("method") === "GET"), "ts", Seq("url"), 600L, 5L)
    counts.withColumn("rank", row_number().over(
        Window.partitionBy(col("windowEnd"))
          .orderBy(col("cnt").desc, col("url").asc)).cast("long"))
      .filter(col("rank") <= n)
      .select("windowEnd", "url", "cnt", "rank")
  }

  /** Hourly page views (ref PageView.scala:24-28). */
  def pageViews(behavior: DataFrame): DataFrame =
    behavior.filter(col("behavior") === "pv")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("pv"))
      .select(winEnd.as("windowEnd"), col("pv"))

  /** Hourly exact unique visitors (ref UniqueVisitor.scala:28,37-47). */
  def uniqueVisitors(behavior: DataFrame): DataFrame =
    behavior.filter(col("behavior") === "pv")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(countDistinct(col("userId")).as("uv"))
      .select(winEnd.as("windowEnd"), col("uv"))

  /** Hourly approximate UV — the UvWithBloom capability
    * (ref UvWithBloom.scala:42-103): bounded-memory distinct via HLL++
    * instead of a Redis-backed 2^29-bit Bloom bitmap.
    */
  def uniqueVisitorsApprox(behavior: DataFrame): DataFrame =
    behavior.filter(col("behavior") === "pv")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(approx_count_distinct(col("userId")).as("uv"))
      .select(winEnd.as("windowEnd"), col("uv"))

  // ---- MarketAnalysis -----------------------------------------------------

  /** Install/click counts by (channel, behavior) per sliding 1h/10s
    * window, uninstalls excluded (ref AppMarketingByChannel.scala:31-36).
    * 360 windows/event → two-level bucket count (SlidingCounts).
    */
  def marketingByChannel(mkt: DataFrame): DataFrame =
    graft.operators.SlidingCounts.slidingCount(
        mkt.filter(col("behavior") =!= "UNINSTALL"),
        "ts", Seq("channel", "behavior"), 3600L, 10L)
      .select("windowEnd", "channel", "behavior", "cnt")

  /** Channel-agnostic totals (ref AppMarketing.scala:22-28). */
  def marketingTotal(mkt: DataFrame): DataFrame =
    graft.operators.SlidingCounts.slidingCount(
        mkt.filter(col("behavior") =!= "UNINSTALL"),
        "ts", Seq.empty, 3600L, 10L)
      .select("windowEnd", "cnt")

  /** Ad clicks by province per sliding 1h/5s window
    * (ref AdStatisticsByGeo.scala:41-54). 720 windows/event → two-level
    * bucket count (SlidingCounts).
    */
  def adClicksByProvince(clicks: DataFrame): DataFrame =
    graft.operators.SlidingCounts.slidingCount(
        clicks, "ts", Seq("province"), 3600L, 5L)
      .select("windowEnd", "province", "cnt")

  /** Click-fraud blacklist: (user, ad) pairs over `threshold` clicks in
    * one event-time day (ref AdStatisticsByGeo.scala:59-101; the
    * processing-time midnight timer becomes the event-time day bucket —
    * SURVEY.md §7.4 item 3). Returns warning rows; `filterWithBlacklist`
    * gives the reference's main-stream behavior (drop blacklisted).
    */
  def adBlacklist(clicks: DataFrame, threshold: Long = 100L): DataFrame =
    clicks
      .groupBy(col("userId"), col("adId"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("clickCount"))
      .filter(col("clickCount") >= threshold)
      .withColumn("msg", concat(lit("Click over "), lit(threshold),
        lit(" times today")))

  def filterWithBlacklist(clicks: DataFrame, threshold: Long = 100L): DataFrame = {
    // ONE definition of the blacklist rule (adBlacklist); the probe side
    // derives its day column once and joins on it rather than
    // re-evaluating date_format inside the join condition per row
    val withDay = clicks.withColumn("_day", date_format(col("ts"), "yyyy-MM-dd"))
    val bl = adBlacklist(clicks, threshold)
      .select(col("userId").as("blUser"), col("adId").as("blAd"),
        col("day").as("blDay"))
    withDay.join(bl,
        col("userId") === col("blUser") && col("adId") === col("blAd") &&
          col("_day") === col("blDay"),
        "left_anti")
      .drop("_day")
  }

  // ---- LoginFailDetect (ref LoginFail.scala:51-105) -----------------------

  /** Users with two consecutive failures within `gapSec` (batch form:
    * lag window; streaming twin: graft.streaming.SequenceMatch).
    */
  def loginFailWarnings(logins: DataFrame, gapSec: Long = 2L): DataFrame = {
    val w = Window.partitionBy(col("userId")).orderBy(col("eventTime").asc)
    logins.filter(col("eventType") === "fail")
      .withColumn("prevTime", lag(col("eventTime"), 1).over(w))
      .filter(col("prevTime").isNotNull &&
        col("eventTime") - col("prevTime") <= gapSec)
      .select(col("userId"), col("prevTime").as("firstFailTime"),
        col("eventTime").as("lastFailTime"),
        lit("login fail!").as("warningMsg"))
  }

  // ---- OrderPayDetect ------------------------------------------------------

  /** Order create→pay matching with 15min timeout; the reference's full
    * 4-outcome message set (OrderTimeoutWithoutCep.scala:40-95). Batch
    * form; streaming twin: graft.streaming.OrderTimeoutMatcher.
    */
  def orderTimeouts(orders: DataFrame, timeoutSec: Long = 900L): DataFrame =
    orders.filter(col("eventType").isin("create", "pay"))
      .groupBy(col("orderId"))
      .agg(
        min(when(col("eventType") === "create", col("eventTime"))).as("createTime"),
        min(when(col("eventType") === "pay", col("eventTime"))).as("payTime"))
      .select(col("orderId"),
        when(col("payTime").isNull, "order timeout")
          .when(col("createTime").isNull || col("payTime") < col("createTime"),
            "already payed but not found create log")
          .when(col("payTime") - col("createTime") <= timeoutSec,
            "payed successfully")
          .otherwise("payed but already timeout").as("resultMsg"))

  /** Pay↔receipt reconciliation on txId (ref TxMacthDetect.scala:42-98):
    * matched pairs + unmatched sides as one tagged frame. Batch form;
    * streaming twin: graft.streaming.TxReconcile.
    */
  def txMatch(orders: DataFrame, receipts: DataFrame): DataFrame = {
    val pays = orders.filter(col("eventType") === "pay" && col("txId") =!= "")
      .select(col("txId"), col("orderId"), col("eventTime").as("payTime"))
    val rcpt = receipts
      .select(col("txId").as("rTxId"), col("payChannel"),
        col("eventTime").as("receiptTime"))
    pays.join(rcpt, col("txId") === col("rTxId"), "full_outer")
      .select(
        coalesce(col("txId"), col("rTxId")).as("txId"),
        col("orderId"), col("payChannel"), col("payTime"), col("receiptTime"),
        when(col("txId").isNull, "unmatched_receipt")
          .when(col("rTxId").isNull, "unmatched_pay")
          .otherwise("matched").as("tag"))
  }

  /** J1 interval-join form: pay and receipt within ±`toleranceSec`
    * (ref TxMatchByJoin.scala:36-38).
    */
  def txMatchByJoin(orders: DataFrame, receipts: DataFrame,
      toleranceSec: Long = 5L): DataFrame = {
    val pays = orders.filter(col("eventType") === "pay" && col("txId") =!= "")
      .select(col("txId"), col("orderId"), col("eventTime").as("payTime"))
    val rcpt = receipts
      .select(col("txId").as("rTxId"), col("payChannel"),
        col("eventTime").as("receiptTime"))
    pays.join(rcpt,
      col("txId") === col("rTxId") &&
        col("receiptTime") >= col("payTime") - toleranceSec &&
        col("receiptTime") <= col("payTime") + toleranceSec)
      .select(col("txId"), col("orderId"), col("payChannel"),
        col("payTime"), col("receiptTime"))
  }
}

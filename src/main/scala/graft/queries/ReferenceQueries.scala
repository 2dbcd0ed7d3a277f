package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryDef, Tables}

/** Reference-parity capabilities (SURVEY.md §2) re-expressed as Spark-first
  * declarative plans over the synthetic corpus. The `events` table stands in
  * for the reference's behavior/click/login/order streams (FIXTURES.md §8);
  * the TPC-H-ish tables exercise the join/aggregation surface.
  *
  * Correctness conventions shared with the DuckDB oracles:
  *  - window bounds → epoch-second BIGINT (`unix_timestamp(window.end)` vs
  *    `epoch(...)::BIGINT`) so no timestamp precision/encoding skew;
  *  - event-time arithmetic in integer MICROSECONDS (`ts_ns div 1000` ==
  *    DuckDB's µs-truncated TIMESTAMP read of the nanos parquet column);
  *  - money/quantity sums via DECIMAL(18,2) (exact, engine-independent);
  *  - every rank has a deterministic tie-break.
  *
  * Scale notes are on each query: the plans are shuffle-minimal (partial
  * aggregation before exchange, broadcast for dims, rank only after
  * aggregation has collapsed cardinality).
  */
object ReferenceQueries {

  private val dec = DecimalType(18, 2)

  /** Sliding-window fan-out used by the DuckDB oracles: Spark's
    * window(ts, dur, slide) assigns each row to dur/slide aligned windows.
    */
  private[queries] def slidingOracle(
      src: String, keyExpr: String, keyName: String,
      slideMin: Int, slides: Int, topN: Option[Int]): String = {
    val rank = topN.map { n =>
      s""",
r AS (SELECT window_end, $keyName, cnt,
             row_number() OVER (PARTITION BY window_end
                                ORDER BY cnt DESC, $keyName ASC) AS rn
      FROM c)
SELECT window_end, $keyName, cnt, rn FROM r WHERE rn <= $n"""
    }.getOrElse(s"\nSELECT window_end, $keyName, cnt FROM c")
    s"""WITH e AS (
  SELECT time_bucket(INTERVAL '$slideMin minutes', ts::TIMESTAMP) AS b,
         $keyExpr AS $keyName
  FROM $src),
w AS (SELECT epoch(b - t.k * INTERVAL '$slideMin minutes'
               + INTERVAL '${slideMin * slides} minutes')::BIGINT AS window_end,
             $keyName
      FROM e CROSS JOIN generate_series(0, ${slides - 1}) t(k)),
c AS (SELECT window_end, $keyName, count(*) AS cnt FROM w GROUP BY 1, 2)$rank"""
  }

  val all: Seq[QueryDef] = Seq(

    // ----- aggregation core ------------------------------------------------

    QueryDef(
      "q01_pricing_summary",
      "A1/A2 partial-aggregation counts+sums+avg (TPC-H Q1 shape). " +
        "One hash-aggregate exchange on 2 low-cardinality keys; " +
        "map-side partial agg makes the shuffle O(groups), scale-safe.",
      Some("""
SELECT l_returnflag, l_linestatus,
       sum(l_quantity::DECIMAL(18,2))::DOUBLE AS sum_qty,
       sum(l_extendedprice::DECIMAL(18,2))::DOUBLE AS sum_base_price,
       sum(l_extendedprice::DECIMAL(18,2) * (1 - l_discount::DECIMAL(18,2)))::DOUBLE AS sum_disc_price,
       sum(l_extendedprice::DECIMAL(18,2))::DOUBLE / count(*) AS avg_price,
       count(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus"""),
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
            sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_base_price"),
            sum(col("l_extendedprice").cast(dec) * (lit(1) - col("l_discount").cast(dec)))
              .cast("double").as("sum_disc_price"),
            (sum(col("l_extendedprice").cast(dec)).cast("double") / count(lit(1)))
              .as("avg_price"),
            count(lit(1)).as("count_order"))
      }),

    // ----- windowed aggregation + grouped top-N (HotItems, R1/W1/A1/A4) ----

    QueryDef(
      "q02_hot_items_topn",
      "W1+A1+A4+R1 HotItems: sliding 1h/5min count per item, top-3 per " +
        "window (ref HotItems.scala:51-57). Rank runs AFTER the windowed " +
        "aggregate collapsed cardinality to O(windows×items), so the " +
        "row_number exchange is tiny at any scale.",
      Some(slidingOracle(
        "(SELECT ts, props FROM events WHERE event_type = 'view')",
        "json_extract(props, '$.k')::BIGINT", "item_id", 5, 12, Some(3))),
      (s, dir) => {
        val e = Tables.events(s, dir)
          .filter(col("event_type") === "view")
          .select(col("ts"),
            get_json_object(col("props"), "$.k").cast("long").as("item_id"))
        val counts = e
          .groupBy(window(col("ts"), "60 minutes", "5 minutes"), col("item_id"))
          .agg(count(lit(1)).as("cnt"))
          .select(unix_timestamp(col("window.end")).as("window_end"),
            col("item_id"), col("cnt"))
        counts
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("window_end"))
              .orderBy(col("cnt").desc, col("item_id").asc)).cast("long"))
          .filter(col("rn") <= 3)
      }),

    QueryDef(
      "q05_hot_pages_topn",
      "W2+R2 NetworkFlow hot URLs: sliding 10min/1min count per page " +
        "(event_type as url analog), top-5 per window " +
        "(ref NetworkFlow.scala:45-48,85-117).",
      Some(slidingOracle("events", "event_type", "page", 1, 10, Some(5))),
      (s, dir) => {
        val counts = Tables.events(s, dir)
          .select(col("ts"), col("event_type").as("page"))
          .groupBy(window(col("ts"), "10 minutes", "1 minute"), col("page"))
          .agg(count(lit(1)).as("cnt"))
          .select(unix_timestamp(col("window.end")).as("window_end"),
            col("page"), col("cnt"))
        counts
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("window_end"))
              .orderBy(col("cnt").desc, col("page").asc)).cast("long"))
          .filter(col("rn") <= 5)
      }),

    QueryDef(
      "q03_page_views",
      "W3+A3 PageView: tumbling 1h page-view count " +
        "(ref PageView.scala:24-28).",
      Some("""
SELECT epoch(time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) + INTERVAL '1 hour')::BIGINT AS window_end,
       count(*) AS pv
FROM events WHERE event_type = 'view'
GROUP BY 1"""),
      (s, dir) =>
        Tables.events(s, dir)
          .filter(col("event_type") === "view")
          .groupBy(window(col("ts"), "1 hour"))
          .agg(count(lit(1)).as("pv"))
          .select(unix_timestamp(col("window.end")).as("window_end"), col("pv"))),

    QueryDef(
      "q04_unique_visitors",
      "W4+A6 UniqueVisitor: tumbling 1-day exact distinct users " +
        "(ref UniqueVisitor.scala:28,37-47). Catalyst two-phase distinct " +
        "replaces the reference's in-heap Set.",
      Some("""
SELECT epoch(time_bucket(INTERVAL '1 day', ts::TIMESTAMP) + INTERVAL '1 day')::BIGINT AS window_end,
       count(DISTINCT user_id) AS uv
FROM events
GROUP BY 1"""),
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(window(col("ts"), "1 day"))
          .agg(countDistinct(col("user_id")).as("uv"))
          .select(unix_timestamp(col("window.end")).as("window_end"), col("uv"))),

    QueryDef(
      "q06_clicks_by_province",
      "W6 AdStatisticsByGeo: sliding 1h/10min click count by province " +
        "(ref AdStatisticsByGeo.scala:41-54; province derived " +
        "deterministically from user_id).",
      Some(slidingOracle(
        "(SELECT ts, 'province_' || (user_id % 7)::VARCHAR AS province FROM events WHERE event_type = 'click')",
        "province", "province", 10, 6, None)),
      (s, dir) =>
        Tables.events(s, dir)
          .filter(col("event_type") === "click")
          .select(col("ts"),
            concat(lit("province_"), (col("user_id") % 7).cast("string")).as("province"))
          .groupBy(window(col("ts"), "60 minutes", "10 minutes"), col("province"))
          .agg(count(lit(1)).as("cnt"))
          .select(unix_timestamp(col("window.end")).as("window_end"),
            col("province"), col("cnt"))),

    QueryDef(
      "q07_marketing_by_channel",
      "W7+S3+P4 AppMarketingByChannel: tumbling 1h count by " +
        "(channel, behavior), uninstall-analog filtered out " +
        "(ref AppMarketingByChannel.scala:31-36).",
      Some("""
SELECT epoch(time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) + INTERVAL '1 hour')::BIGINT AS window_end,
       CASE user_id % 4 WHEN 0 THEN 'wechat' WHEN 1 THEN 'weibo'
            WHEN 2 THEN 'appstore' ELSE 'huaweistore' END AS channel,
       event_type AS behavior,
       count(*) AS cnt
FROM events WHERE event_type <> 'error'
GROUP BY 1, 2, 3"""),
      (s, dir) =>
        Tables.events(s, dir)
          .filter(col("event_type") =!= "error")
          .select(col("ts"), col("event_type").as("behavior"),
            expr("CASE user_id % 4 WHEN 0 THEN 'wechat' WHEN 1 THEN 'weibo' " +
              "WHEN 2 THEN 'appstore' ELSE 'huaweistore' END").as("channel"))
          .groupBy(window(col("ts"), "1 hour"), col("channel"), col("behavior"))
          .agg(count(lit(1)).as("cnt"))
          .select(unix_timestamp(col("window.end")).as("window_end"),
            col("channel"), col("behavior"), col("cnt"))),

    // ----- sequence / state-machine detectors (F1/J3, J4/F3, F2) -----------

    QueryDef(
      "q08_login_fail_consecutive",
      "F1+J3 LoginFail: two consecutive failures (error events) per user " +
        "within 1h (ref LoginFail.scala:51-105, LoginFailWithCep.scala:" +
        "28-36). Batch form = lag() over user partition; streaming twin " +
        "uses flatMapGroupsWithState (graft.streaming).",
      Some("""
WITH f AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         lag(event_id) OVER w AS prev_event,
         lag(epoch_us(ts)) OVER w AS prev_us
  FROM events WHERE event_type = 'error'
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
SELECT user_id, prev_event AS first_event, event_id AS last_event,
       prev_us // 1000000 AS first_ts, us // 1000000 AS last_ts
FROM f
WHERE prev_us IS NOT NULL AND us - prev_us <= 3600000000"""),
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us").asc, col("event_id").asc)
        Tables.events(s, dir)
          .filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id"), expr("ts_ns div 1000").as("us"))
          .withColumn("prev_event", lag(col("event_id"), 1).over(w))
          .withColumn("prev_us", lag(col("us"), 1).over(w))
          .filter(col("prev_us").isNotNull &&
            col("us") - col("prev_us") <= 3600000000L)
          .select(col("user_id"), col("prev_event").as("first_event"),
            col("event_id").as("last_event"),
            expr("prev_us div 1000000").as("first_ts"),
            expr("us div 1000000").as("last_ts"))
      }),

    QueryDef(
      "q09_order_timeout",
      "J4+F3 OrderTimeout: signup (create-analog) followed by purchase " +
        "(pay-analog) within 30min → paid, else timed out; pay-before-" +
        "create and missing-pay branches tagged like " +
        "OrderTimeoutWithoutCep.scala:40-95. Single conditional " +
        "aggregation — one exchange on user_id.",
      Some("""
WITH a AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS s_us,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p_us
  FROM events
  GROUP BY user_id)
SELECT user_id, s_us // 1000000 AS create_ts,
       CASE
         WHEN p_us IS NULL THEN 'order timeout'
         WHEN s_us IS NULL OR p_us < s_us THEN 'payed but no create log'
         WHEN p_us - s_us <= 1800000000 THEN 'payed successfully'
         ELSE 'payed but already timeout'
       END AS result_msg
FROM a
WHERE s_us IS NOT NULL OR p_us IS NOT NULL"""),
      (s, dir) =>
        Tables.events(s, dir)
          .select(col("user_id"), col("event_type"), expr("ts_ns div 1000").as("us"))
          .groupBy(col("user_id"))
          .agg(
            min(when(col("event_type") === "signup", col("us"))).as("s_us"),
            min(when(col("event_type") === "purchase", col("us"))).as("p_us"))
          .filter(col("s_us").isNotNull || col("p_us").isNotNull)
          .select(col("user_id"), expr("s_us div 1000000").as("create_ts"),
            when(col("p_us").isNull, "order timeout")
              .when(col("s_us").isNull || col("p_us") < col("s_us"),
                "payed but no create log")
              .when(col("p_us") - col("s_us") <= 1800000000L, "payed successfully")
              .otherwise("payed but already timeout").as("result_msg"))),

    QueryDef(
      "q10_tx_reconcile",
      "J2+F5 TxMatchDetect: reconcile pay stream (purchase) against " +
        "receipt stream (click) on tx key (user_id, props.k); matched + " +
        "unmatched-on-either-side, as a full-outer join of pre-aggregated " +
        "sides (ref TxMacthDetect.scala:42-98). Pre-aggregation first " +
        "makes both join inputs O(distinct keys).",
      Some("""
WITH p AS (SELECT user_id, json_extract(props, '$.k')::BIGINT AS tx_k, count(*) AS pay_cnt
           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
r AS (SELECT user_id, json_extract(props, '$.k')::BIGINT AS tx_k, count(*) AS receipt_cnt
      FROM events WHERE event_type = 'click' GROUP BY 1, 2)
SELECT coalesce(p.user_id, r.user_id) AS user_id,
       coalesce(p.tx_k, r.tx_k) AS tx_k,
       coalesce(pay_cnt, 0) AS pay_cnt,
       coalesce(receipt_cnt, 0) AS receipt_cnt,
       CASE WHEN pay_cnt IS NULL THEN 'unmatched_receipt'
            WHEN receipt_cnt IS NULL THEN 'unmatched_pay'
            ELSE 'matched' END AS tag
FROM p FULL OUTER JOIN r ON p.user_id = r.user_id AND p.tx_k = r.tx_k"""),
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("tx_k"))
        val pays = e.filter(col("event_type") === "purchase")
          .groupBy("user_id", "tx_k").agg(count(lit(1)).as("pay_cnt"))
        val receipts = e.filter(col("event_type") === "click")
          .groupBy("user_id", "tx_k").agg(count(lit(1)).as("receipt_cnt"))
        pays.join(receipts, Seq("user_id", "tx_k"), "full_outer")
          .select(col("user_id"), col("tx_k"),
            coalesce(col("pay_cnt"), lit(0L)).as("pay_cnt"),
            coalesce(col("receipt_cnt"), lit(0L)).as("receipt_cnt"),
            when(col("pay_cnt").isNull, "unmatched_receipt")
              .when(col("receipt_cnt").isNull, "unmatched_pay")
              .otherwise("matched").as("tag"))
      }),

    QueryDef(
      "q11_click_blacklist",
      "F2 FilterBlackListUser: per (user, event_type, event-time day) " +
        "count over threshold → blacklist warning (ref " +
        "AdStatisticsByGeo.scala:59-101; processing-time midnight reset " +
        "replaced by the event-time day bucket per SURVEY.md §7.4).",
      Some("""
SELECT user_id, event_type AS ad_key, strftime(ts::TIMESTAMP, '%Y-%m-%d') AS day,
       count(*) AS cnt
FROM events
GROUP BY 1, 2, 3
HAVING count(*) >= 3"""),
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("user_id"), col("event_type").as("ad_key"),
            date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") >= 3)),

    // ----- joins ------------------------------------------------------------

    QueryDef(
      "q12_priority_by_nation",
      "Join surface: orders ⋈ customer ⋈ nation rollup. nation is " +
        "broadcast (tiny dim); customer⋈orders shuffles on the key both " +
        "sides already need. At 100TB: same plan, AQE handles skew.",
      Some("""
SELECT o_orderpriority, n_name,
       count(*) AS n_orders,
       sum(o_totalprice::DECIMAL(18,2))::DOUBLE AS total
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1, 2"""),
      (s, dir) =>
        Tables.orders(s, dir)
          .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, dir)),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("o_orderpriority"), col("n_name"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast(dec)).cast("double").as("total"))),

    QueryDef(
      "q13_view_purchase_interval_join",
      "J1 interval join: purchase within 30min after a view by the same " +
        "user (ref TxMatchByJoin.scala:36-51). Equi-key on user_id keeps " +
        "it a hash join; the range predicate filters inside the join.",
      Some("""
SELECT v.user_id AS user_id, v.event_id AS view_id, p.event_id AS purchase_id,
       (epoch_us(p.ts) - epoch_us(v.ts)) // 1000000 AS lag_sec
FROM (SELECT * FROM events WHERE event_type = 'view') v
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON v.user_id = p.user_id
 AND epoch_us(p.ts) >= epoch_us(v.ts)
 AND epoch_us(p.ts) <= epoch_us(v.ts) + 1800000000"""),
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("event_type"),
            expr("ts_ns div 1000").as("us"))
        val v = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_id"), col("us").as("v_us"))
        val p = e.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
            col("us").as("p_us"))
        v.join(p, col("user_id") === col("p_user") &&
            col("p_us") >= col("v_us") &&
            col("p_us") <= col("v_us") + 1800000000L)
          .select(col("user_id"), col("view_id"), col("purchase_id"),
            expr("(p_us - v_us) div 1000000").as("lag_sec"))
      }),

    QueryDef(
      "q14_top_brands_by_revenue",
      "R1 (batch, global): top-10 part brands by discounted revenue; " +
        "lineitem ⋈ broadcast(part), aggregate collapses to O(brands) " +
        "before the single-partition rank.",
      Some("""
WITH rev AS (
  SELECT p_brand,
         sum(l_extendedprice::DECIMAL(18,2) * (1 - l_discount::DECIMAL(18,2)))::DOUBLE AS revenue,
         count(*) AS n_items
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1)
SELECT p_brand, revenue, n_items,
       row_number() OVER (ORDER BY revenue DESC, p_brand ASC) AS rn
FROM rev
QUALIFY rn <= 10"""),
      (s, dir) => {
        val rev = Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(sum(col("l_extendedprice").cast(dec) *
              (lit(1) - col("l_discount").cast(dec))).cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
        // top-10 via TakeOrderedAndProject (distributed partial top-k),
        // rank derived on the 10 survivors — no unpartitioned WindowExec
        val ord = Seq(col("revenue").desc, col("p_brand").asc)
        rev.orderBy(ord: _*).limit(10)
          .withColumn("rn", row_number().over(
            Window.partitionBy(spark_partition_id()).orderBy(ord: _*)).cast("long"))
      })
  )
}

package graft.jobs

import org.apache.spark.sql.types._

/** The reference's seven record schemas (SURVEY.md §1.2), declared once
  * as StructTypes for explicit-schema CSV reads — never inferSchema, so
  * coercion matches the reference's hand-rolled `split/trim/toLong`
  * parsing exactly.
  */
object Schemas {

  /** ref HotItems.scala:24 — userId,itemId,categoryId,behavior,ts(sec). */
  val userBehavior: StructType = StructType(Seq(
    StructField("userId", LongType, nullable = false),
    StructField("itemId", LongType, nullable = false),
    StructField("categoryId", IntegerType, nullable = false),
    StructField("behavior", StringType, nullable = false),
    StructField("timestamp", LongType, nullable = false)))

  /** ref AdStatisticsByGeo.scala:16 — userId,adId,province,city,ts(sec). */
  val adClick: StructType = StructType(Seq(
    StructField("userId", LongType, nullable = false),
    StructField("adId", LongType, nullable = false),
    StructField("province", StringType, nullable = false),
    StructField("city", StringType, nullable = false),
    StructField("timestamp", LongType, nullable = false)))

  /** ref LoginFail.scala:20 — userId,ip,eventType,eventTime(sec). */
  val loginEvent: StructType = StructType(Seq(
    StructField("userId", LongType, nullable = false),
    StructField("ip", StringType, nullable = false),
    StructField("eventType", StringType, nullable = false),
    StructField("eventTime", LongType, nullable = false)))

  /** ref OrderTimeout.scala:13 — orderId,eventType,txId,eventTime(sec). */
  val orderEvent: StructType = StructType(Seq(
    StructField("orderId", LongType, nullable = false),
    StructField("eventType", StringType, nullable = false),
    StructField("txId", StringType, nullable = true),
    StructField("eventTime", LongType, nullable = false)))

  /** ref TxMacthDetect.scala:10 — txId,payChannel,eventTime(sec). */
  val receiptEvent: StructType = StructType(Seq(
    StructField("txId", StringType, nullable = false),
    StructField("payChannel", StringType, nullable = false),
    StructField("eventTime", LongType, nullable = false)))

  /** ref AppMarketingByChannel.scala:18 — generated stream record. */
  val marketingUserBehavior: StructType = StructType(Seq(
    StructField("userId", StringType, nullable = false),
    StructField("behavior", StringType, nullable = false),
    StructField("channel", StringType, nullable = false),
    StructField("timestamp", LongType, nullable = false)))
}

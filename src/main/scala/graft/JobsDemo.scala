package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.jobs.{Jobs, Schemas, Sources}

/** Dev runner: the reference pipelines end-to-end over CSV fixtures via
  * the public API — what a reference user's main() would look like on
  * this engine.
  */
object JobsDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val d = Files.createTempDirectory("jobs-demo")
    def w(name: String, rows: String): Unit =
      Files.writeString(d.resolve(name), rows.trim + "\n")
    w("UserBehavior.csv",
      "1,100,10,pv,1511658000\n2,100,10,pv,1511658060\n3,200,10,pv,1511658120\n" +
      "1,100,10,buy,1511658180\n4,300,10,pv,1511661600")
    w("OrderLog.csv",
      "1,create,,1558430842\n1,pay,tx1,1558430844\n2,create,,1558430842\n" +
      "3,create,,1558430842\n3,pay,tx3,1558432000\n4,pay,tx4,1558430850")
    w("ReceiptLog.csv", "tx1,wechat,1558430845\ntx9,alipay,1558430850")
    w("LoginLog.csv",
      "1,ip1,fail,1558430842\n1,ip1,fail,1558430843\n1,ip1,success,1558430845\n" +
      "2,ip2,fail,1558430842\n2,ip2,fail,1558430846")
    w("Malformed.csv", "not,a,valid,row\n1,100,xx,pv,notatime")

    val behavior = Sources.csv(spark, s"$d/UserBehavior.csv",
      Schemas.userBehavior, "timestamp")
    val orders = Sources.csv(spark, s"$d/OrderLog.csv",
      Schemas.orderEvent, "eventTime")
    val receipts = Sources.csv(spark, s"$d/ReceiptLog.csv",
      Schemas.receiptEvent, "eventTime")
    val logins = Sources.csv(spark, s"$d/LoginLog.csv",
      Schemas.loginEvent, "eventTime")

    println("=== hotItems (window ending 1511661600) ===")
    Jobs.hotItems(behavior).filter(org.apache.spark.sql.functions
      .col("windowEnd") === 1511661600L).show(5, false)
    println("=== orderTimeouts ===")
    Jobs.orderTimeouts(orders).orderBy("orderId").show(10, false)
    println("=== txMatch ===")
    Jobs.txMatch(orders, receipts).orderBy("txId").show(10, false)
    println("=== loginFailWarnings ===")
    Jobs.loginFailWarnings(logins, 2).show(10, false)
    println("=== malformed CSV through the explicit schema ===")
    Jobs.orderTimeouts(Sources.csv(spark, s"$d/Malformed.csv",
      Schemas.orderEvent, "eventTime")).show(10, false)
    spark.stop()
  }
}

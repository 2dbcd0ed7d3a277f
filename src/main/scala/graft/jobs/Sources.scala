package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source builders (SURVEY.md §2.1). Batch and streaming variants share
  * the same schema + projection so a pipeline can swap `read` for
  * `readStream` without touching downstream code.
  */
object Sources {

  /** S2: headerless CSV with explicit schema (ref readTextFile + manual
    * split/trim parse, e.g. HotItems.scala:45-48). `ts` is the epoch-sec
    * column promoted to TimestampType (the ×1000 at ref :49).
    */
  def csv(spark: SparkSession, path: String, schema: StructType,
      tsCol: String): DataFrame =
    spark.read.schema(schema)
      .option("ignoreLeadingWhiteSpace", "true")
      .csv(path)
      .withColumn("ts", timestamp_seconds(col(tsCol)))

  /** S2 streaming twin: file-source directory stream. */
  def csvStream(spark: SparkSession, dir: String, schema: StructType,
      tsCol: String): DataFrame =
    spark.readStream.schema(schema)
      .option("ignoreLeadingWhiteSpace", "true")
      .csv(dir)
      .withColumn("ts", timestamp_seconds(col(tsCol)))

  /** P2: Apache access-log line parse (ref NetworkFlow.scala:33-39):
    * `ip - userId dd/MM/yyyy:HH:mm:ss +0000 method url` space-split,
    * fields 0,2,3,5,6; the SimpleDateFormat parse becomes to_timestamp.
    */
  def apacheLog(lines: DataFrame): DataFrame = {
    val f = split(col("value"), " ")
    lines.select(
      element_at(f, 1).as("ip"),
      element_at(f, 3).as("userId"),
      to_timestamp(element_at(f, 4), "dd/MM/yyyy:HH:mm:ss").as("ts"),
      element_at(f, 6).as("method"),
      element_at(f, 7).as("url"))
  }

  /** Shared value-line parse: raw CSV strings (Kafka `value`, socket,
    * memory stream, `read.text`) through the SAME schema and ts
    * promotion as the file source — the byte-stream and file pipelines
    * are column-for-column identical (asserted in JobsSpec), so every
    * Jobs.* pipeline accepts either interchangeably.
    */
  def csvLines(lines: DataFrame, schema: StructType, tsCol: String): DataFrame =
    lines
      .select(from_csv(col("value"), schema,
        Map("ignoreLeadingWhiteSpace" -> "true")).as("r"))
      .select(col("r.*"))
      .withColumn("ts", timestamp_seconds(col(tsCol)))

  /** The kafka connector is NOT part of spark core — a deployment
    * missing `spark-sql-kafka-0-10` surfaces as a raw
    * ClassNotFound deep inside `load()`. Fail the builders instead,
    * by name, with the fix in the message. Checked EAGERLY (at
    * builder time, not first-action time) so a misdeployed pipeline
    * dies before it builds a plan it can never run.
    */
  private[jobs] def requireKafkaDataSource(spark: SparkSession,
      op: String): Unit = {
    def classNotFound(e: Throwable): Boolean =
      e != null && (e.isInstanceOf[ClassNotFoundException] ||
        classNotFound(e.getCause))
    try {
      org.apache.spark.sql.execution.datasources.DataSource
        .lookupDataSource("kafka", spark.sessionState.conf)
      ()
    } catch {
      case e: Throwable if classNotFound(e) ||
          e.getMessage != null && e.getMessage.contains("kafka") =>
        throw new IllegalStateException(
          s"$op: the 'kafka' DataSource is not on the classpath. Deploy " +
            "the connector matching your Spark version, e.g. " +
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> " +
            "(brings kafka-clients transitively), or place the jars under " +
            "$SPARK_HOME/jars. The pipeline logic itself is broker-free " +
            "testable via Sources.csvLines on a memory stream.", e)
    }
  }

  /** S1: Kafka line source (ref FlinkKafkaConsumer, HotItems.scala:37-44).
    * Not runnable in this container (no broker/connector) — the builder
    * is the contract: value-as-string lines, same downstream parse as
    * csv. Fails by name via [[requireKafkaDataSource]] when the
    * connector jar is absent.
    */
  def kafkaLines(spark: SparkSession, servers: String, topic: String): DataFrame = {
    requireKafkaDataSource(spark, "Sources.kafkaLines")
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .option("startingOffsets", "latest")
      .load()
      .selectExpr("CAST(value AS STRING) AS value")
  }

  /** S1 end-to-end: a Kafka topic of CSV lines parsed exactly like the
    * file source (ref HotItems.scala:37-48 — the flagship's front door).
    * The value-parse path itself is exercised broker-free in JobsSpec by
    * feeding `csvLines` from a memory stream.
    */
  def kafkaCsv(spark: SparkSession, servers: String, topic: String,
      schema: StructType, tsCol: String): DataFrame =
    csvLines(kafkaLines(spark, servers, topic), schema, tsCol)

  /** JSONL source — the read side of [[Sinks.jsonl]]'s training-data
    * interchange (one JSON object per line). Schema is EXPLICIT: at
    * 100TB an inference pass is a second full scan, and a drifting
    * inferred type (long → double on one bad row) silently corrupts
    * downstream arithmetic. Malformed lines → null row fields
    * (PERMISSIVE), never a crash.
    */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** JSONL streaming twin: directory stream, same explicit schema. */
  def jsonlStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).json(dir)

  /** WARC-style crawl-record source: the raw-crawl front door of a
    * training-data pipeline. Files are split into records at I/O time
    * by the multi-byte record-BOUNDARY separator "\r\nWARC/1.0\r\n" —
    * anchored on the full boundary byte sequence, so a payload merely
    * CONTAINING the string "WARC/1.0" (a page about the WARC format)
    * cannot split a record — and the text source's Hadoop delimited
    * reader keeps uncompressed files SPLITTABLE, so a 100TB crawl
    * shards across executors without any whole-file parsing.
    *
    * Header fields (target URI, record type, declared content length)
    * extract from the HEADER BLOCK ONLY (before the first blank line)
    * — matching against the whole record would let an HTTP
    * `Content-Length:` inside the payload masquerade as the WARC
    * header on malformed records. The payload is the declared
    * Content-Length prefix of the post-blank-line text (exact —
    * payload-owned trailing newlines survive); records without a
    * parseable length fall back to stripping the record-separator
    * CRLFs. Character-indexed, so byte-exact for single-byte
    * encodings; a multi-byte-payload crawl needs a byte-level reader.
    * Map-only, codegen'd + regex, zero shuffles.
    *
    * Output: url, warc_type, content_length, payload.
    */
  def warc(spark: SparkSession, path: String): DataFrame = {
    val rec = spark.read.option("lineSep", "\r\nWARC/1.0\r\n").text(path)
      .filter(length(trim(col("value"))) > 0)
      // the file-leading record keeps its version line (no preceding
      // boundary to consume it) — strip it so every chunk is
      // headers + blank line + payload
      .select(regexp_replace(col("value"), "^WARC/1\\.0\\r\\n", "").as("v"))
    val blank = instr(col("v"), "\r\n\r\n")
    val hdr = when(blank > 0, col("v").substr(lit(1), blank - 1))
      .otherwise(col("v"))
    val after = when(blank > 0,
      col("v").substr(blank + lit(4), length(col("v")))).otherwise(lit(""))
    val len = when(
      regexp_extract(hdr, "(?m)^Content-Length:\\s*(\\d+)", 1) =!= "",
      regexp_extract(hdr, "(?m)^Content-Length:\\s*(\\d+)", 1).cast("long"))
    rec.select(
      regexp_extract(hdr, "(?m)^WARC-Target-URI:\\s*(\\S+)", 1).as("url"),
      regexp_extract(hdr, "(?m)^WARC-Type:\\s*(\\S+)", 1).as("warc_type"),
      len.as("content_length"),
      // clamp before the int cast: a declared length above Int.MaxValue
      // would wrap negative and truncate the payload to empty instead
      // of taking at-most-the-available text
      when(len.isNotNull,
          after.substr(lit(1), least(len, length(after).cast("long")).cast("int")))
        .otherwise(regexp_replace(after, "(\\r\\n){1,2}$", ""))
        .as("payload"))
  }

  /** S3: seeded deterministic replacement for the reference's wall-clock
    * random generator (AppMarketingByChannel.scala:44-74): `rate` rows
    * are projected through pure hash expressions — reproducible, and
    * identical logic works on a batch `range` for tests.
    */
  val behaviors = Seq("CLICK", "DOWNLOAD", "INSTALL", "UNINSTALL")
  val channels = Seq("wechat", "weibo", "appstore", "huaweistore")

  private def project(idCol: String): Seq[org.apache.spark.sql.Column] = Seq(
    md5(concat(lit("u"), col(idCol).cast("string"))).as("userId"),
    element_at(lit(behaviors.toArray),
      (abs(hash(col(idCol) * 31)) % behaviors.size).cast("int") + 1).as("behavior"),
    element_at(lit(channels.toArray),
      (abs(hash(col(idCol) * 17)) % channels.size).cast("int") + 1).as("channel"))

  def marketingStream(spark: SparkSession, rowsPerSec: Int): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSec.toString).load()
      .select(project("value") :+ col("timestamp").as("ts"): _*)

  /** Batch twin over spark.range — same projection, fixed event times. */
  def marketingBatch(spark: SparkSession, n: Long, startEpochSec: Long,
      stepSec: Long): DataFrame =
    spark.range(n).toDF("value")
      .select(project("value") :+
        timestamp_seconds(lit(startEpochSec) + col("value") * stepSec).as("ts"): _*)
}

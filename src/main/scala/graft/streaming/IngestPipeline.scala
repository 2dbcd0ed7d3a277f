package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType, TimestampType}

/** The COMPOSED continuous-ingest graph — the production shape that the
  * individually-proven pieces exist for, wired as ONE streaming query:
  *
  *   jsonl drop-dir source        (Sources.jsonlStream — the crawler
  *                                 handoff format, explicit schema)
  *   → per-source horizon quota   (QuotaCap.firstNPerKeyWithinHorizonTws
  *                                 — no domain floods an ingest window;
  *                                 stateful op #1, transformWithState
  *                                 with an event-time purge timer)
  *   → exact content dedup        (Dedup.firstPerKey on the md5 digest —
  *                                 byte-identical re-crawls drop before
  *                                 paying LSH; stateful op #2,
  *                                 dropDuplicatesWithinWatermark)
  *   → corpus near-dup probe      (NearDupIngest.pairs — bands map-only,
  *                                 stream-static join against the capped
  *                                 bucket index, within-watermark pair
  *                                 dedup; stateful op #3)
  *   → append sink                (pairs; a doc_new appearing IS the
  *                                 drop decision for the ingest sink)
  *
  * Spark 4 runs this as one query graph: every stateful operator is in
  * append mode (multiple fMGWS/dedup states chain under the
  * multi-stateful-operator support), and the event-time column is
  * re-watermarked after the quota stage — a fMGWS output is a NEW row
  * set, so the watermark annotation must be re-declared before the
  * downstream stateful ops.
  *
  * Why the quota stage is the `transformWithState` variant and not the
  * fMGWS one: a fMGWS output carries NO event-time column — Spark both
  * fails the conservative global-watermark pattern check and, more
  * fundamentally, leaves downstream `dropDuplicatesWithinWatermark`
  * with no watermark to run against ("not supported ... without
  * watermark"). `transformWithState` declares `ts` as its OUTPUT
  * event-time column, so the source watermark propagates through the
  * quota stage and the downstream dedup states chain legally — this
  * composition is precisely what the tws migration buys. Spark
  * validates at runtime that emitted rows are not behind the
  * watermark (UpdateEventTimeWatermarkColumn); the quota satisfies it
  * by construction (it emits only current-batch rows). Inherited
  * requirement: the RocksDB state store provider (tws rejects the
  * default store) — the production-store choice anyway.
  * StreamingSpec proves the composition end-to-end against a
  * batch-computed oracle of the same semantics, including a
  * checkpointed kill-and-restart mid-stream.
  *
  * Scale notes: state is one counter per ACTIVE source (quota), one
  * 16-byte digest per in-watermark doc (exact dedup), one pair key per
  * in-watermark candidate (probe dedup) — all watermark- or
  * active-set-bounded; the corpus index is the one static O(corpus)
  * artifact, persisted once per corpus version.
  */
object IngestPipeline {

  /** The drop-dir contract: one JSON object per line. */
  val DropSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("source", StringType), StructField("at", TimestampType)))

  /** The one-graph pipeline. Emits verified (doc_new, doc_old,
    * jaccard_x1000) pairs in append mode; `capPerSource`/`horizon`
    * configure the quota gate, `delay` the dedup/probe watermarks.
    */
  def pairs(spark: SparkSession, dropDir: String,
      corpus: NearDupIngest.CorpusIndex, capPerSource: Int,
      horizon: String, delay: String,
      jaccardX1000Threshold: Int = 500): DataFrame = {
    import spark.implicits._
    // ONE watermark declaration for the whole chain (multi-stateful
    // rule: re-declaring downstream fails the query; Spark propagates
    // this one through every stateful op). `delay` bounds all
    // downstream dedup state; the quota's idle horizon rides the same
    // propagated watermark.
    val docs = graft.jobs.Sources.jsonlStream(spark, dropDir, DropSchema)
      .withWatermark("at", delay)
    val admitted = QuotaCap.firstNPerKeyWithinHorizonTws(
      docs.select(col("source").as("key"), col("doc_id").as("docId"),
        col("text").as("payload"), col("at").as("ts")).as[KeyedDoc],
      capPerSource, horizon)
    // exact dedup ACROSS sources by content digest: state is the digest,
    // never the payload; first arrival (in batch order) survives. Raw
    // dropDuplicatesWithinWatermark — the Dedup.firstPerKey wrapper
    // would re-declare the watermark
    val exact = admitted.toDF()
      .withColumn("sig", md5(col("payload").cast("binary")))
      .dropDuplicatesWithinWatermark("sig")
    NearDupIngest.pairs(
      exact.select(col("docId").as("doc_id"), col("payload").as("text"),
        col("ts")),
      "doc_id", "text", "ts", delay, corpus, jaccardX1000Threshold,
      declareWatermark = false)
  }
}

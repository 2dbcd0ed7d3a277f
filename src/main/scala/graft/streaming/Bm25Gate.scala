package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.api.TextOps

/** Streaming BM25 retrieval gate — rank the top-k corpus documents for
  * every query arriving on a continuous stream, against a STATIC
  * corpus, in ONE streaming graph with NO foreachBatch:
  *
  *   - the static side is [[TextOps.bm25ContribIndex]]: the per-(term,
  *     doc) quantized contributions, the SAME materialized frame the
  *     batch ranker consumes — stream and batch scores are identical
  *     by construction, not by parallel maintenance;
  *   - query terms are a stateless per-row projection
  *     ([[TextOps.bm25QueryTerms]]: `array_distinct` inside the row,
  *     so no cross-row distinct state), joined STREAM-STATIC;
  *   - ranking is a CHAINED streaming aggregation (Spark's
  *     multiple-stateful-operators): the (window, qid, doc) score
  *     rollup feeds a (window, qid) single-pass `topk_agg`
  *     (functions.GroupedTopK ranks by score DESC, doc ASC — exactly
  *     the batch rank's order), both watermark-bounded, append mode —
  *     the WindowedCounts.topNStreaming architecture applied to
  *     retrieval.
  *
  * Self-matches (a query that is itself a corpus doc) are excluded,
  * as in the batch ranker. Output: qid, window_end, rank, doc id
  * (idCol's name), score — StreamingSpec proves row-for-row parity
  * with [[TextOps.bm25TopK]] on the same query set.
  */
object Bm25Gate {

  def topKGate(queries: DataFrame, qidCol: String, textCol: String,
      tsCol: String, delay: String, window: String,
      corpus: DataFrame, corpusIdCol: String, corpusTextCol: String,
      k: Int = 10, declareWatermark: Boolean = true): DataFrame = {
    require(k >= 1, s"Bm25Gate: k must be >= 1, got $k")
    graft.functions.SketchAggregates.register(queries.sparkSession)
    val idx = TextOps.bm25ContribIndex(corpus, corpusIdCol, corpusTextCol)
    val src =
      if (declareWatermark) queries.withWatermark(tsCol, delay) else queries
    val qTerms = TextOps.bm25QueryTerms(src, qidCol, textCol,
      extraCols = Seq(tsCol))
    qTerms.join(idx, Seq("_t"))
      .filter(col("_qid") =!= col(corpusIdCol))
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window),
        col("_qid"), col(corpusIdCol))
      .agg(sum(col("_c")).as("score"))
      .groupBy(col("window"), col("_qid"))
      .agg(call_function("topk_agg", lit(k), col("score"),
        col(corpusIdCol)).as("top"))
      .select(col("_qid").as("qid"),
        unix_timestamp(col("window.end")).as("window_end"),
        explode(col("top")).as("e"))
      .select(col("qid"), col("window_end"),
        col("e.rn").cast("long").as("rank"),
        col("e.key").as(corpusIdCol), col("e.cnt").as("score"))
  }
}

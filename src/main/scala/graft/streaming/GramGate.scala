package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.api.DedupOps

/** Streaming exact-substring DECONTAMINATION gate — score every
  * document on a continuous stream by how much of it appears VERBATIM
  * in the corpus behind a PERSISTED
  * [[graft.api.DedupOps.writeGramIndex]], in ONE streaming graph: the
  * admission question of a training-data front door ("does this crawl
  * page quote the eval set / the training corpus?"), asked per
  * micro-batch instead of per batch job.
  *
  *   - gramming is the SAME [[graft.api.DedupOps.gramPositions]] front
  *     end as every batch path, with the gram width read off the
  *     index's OWN meta at graph build time (mismatched widths would
  *     silently match nothing — the geometry contract);
  *   - the over-threshold gram set is a STREAM-STATIC left join. The
  *     batch probe's driver-side `__gp` prefix pruning does not apply
  *     (a stream's key set is unbounded), but the layout still serves
  *     the scan; layered runs reconcile by the shared
  *     [[graft.api.DedupOps.reconcileGramRuns]] SUM at author time,
  *     and the min/cap thresholds apply to the reconciled totals —
  *     exactly the batch probe's read;
  *   - the batch op's island-merge back half is a per-doc WINDOW,
  *     which streaming frames cannot run — the gate computes the SAME
  *     numbers aggregate-only: per (window, doc, pos) collapse first
  *     (delivery idempotence: a doc redelivered inside one window
  *     collapses to one position set), then ONE windowed aggregate
  *     whose sorted hit-position array folds through an integer
  *     `aggregate` HOF into (covered_tokens, n_spans) — the fold's
  *     "new island iff pos > prev_end, extend otherwise" recurrence is
  *     mergeSpans' break condition exactly, so covered_tokens ==
  *     Σ span_tokens and n_spans == the span count of the batch probe
  *     (StreamingSpec parity);
  *   - gram-less docs (fewer tokens than the gram width, or null
  *     text) union in as 0-gram rows through their OWN windowed
  *     aggregate, so late short rows are watermark-dropped exactly
  *     like late gram-ful rows (the CdcGate row-preservation
  *     contract).
  *
  * FOLD-WHILE-SERVING CONTRACT (the stream-static gate family
  * contract, StreamingSpec-pinned on its siblings): the static side
  * is a GRAPH-BUILD SNAPSHOT — an in-place
  * [[graft.api.DedupOps.foldIntoGramIndex]] landing while the gate
  * serves is invisible until re-author; quiesce the gate across a
  * [[graft.api.DedupOps.maintainGramIndex]] compaction swap (the swap
  * deletes files the authored plan's listing still points at).
  *
  * Output (append): idCol, window_end, n_grams, n_hit, n_spans,
  * covered_tokens — n_grams the doc's gram count, n_hit how many of
  * them exist in the corpus at the threshold policy, n_spans /
  * covered_tokens the island-merged duplication measure (what the
  * batch probe reports as spans).
  */
object GramGate {

  def spansGate(docs: DataFrame, idCol: String, textCol: String,
      tsCol: String, delay: String, window: String, indexPath: String,
      minCorpusDocs: Int = 1, maxDocsPerGram: Int = 1000,
      declareWatermark: Boolean = true): DataFrame = {
    require(minCorpusDocs >= 1,
      s"GramGate.spansGate: minCorpusDocs $minCorpusDocs < 1")
    require(maxDocsPerGram >= minCorpusDocs,
      s"GramGate.spansGate: maxDocsPerGram $maxDocsPerGram < " +
        s"minCorpusDocs $minCorpusDocs — the cap would reject every gram")
    val s = docs.sparkSession
    val (gramTokens, _, layers) =
      DedupOps.readGramMeta(s, indexPath, "GramGate.spansGate")
    val shared = DedupOps.reconcileGramRuns(
        s.read.parquet(s"$indexPath/grams").drop("__gp"), layers)
      .filter(col("n_docs") >= minCorpusDocs &&
        col("n_docs") <= maxDocsPerGram)
      .select(col("gh").as("__gh"), lit(1L).as("_hit"))

    val src = if (declareWatermark) docs.withWatermark(tsCol, delay)
      else docs
    // null text splits to null → size null → gram-less branch (never a
    // crash); docs shorter than the gram width are gram-less by the
    // same predicate gramPositions filters on
    val tokenized = src.withColumn("_ntk",
      coalesce(size(split(col(textCol), " ", -1)), lit(-1)))
    val win = org.apache.spark.sql.functions.window(col(tsCol), window)

    val grams = DedupOps.gramPositions(
      tokenized.filter(col("_ntk") >= gramTokens), idCol, textCol,
      gramTokens, extraCols = Seq(tsCol))
    // the island fold over the sorted hit positions: a position p
    // starts a new span iff p > prev_end (mergeSpans' break is
    // pos − lag > k ⟺ p > lag + k), otherwise it extends the island
    // by p + k − prev_end; the summed extensions ARE Σ span_tokens
    val fold = s"""aggregate(_hp,
      named_struct('cov', 0L, 'pe', -1L, 'spans', 0L),
      (a, p) -> named_struct(
        'cov', a.cov + greatest(0L, p + ${gramTokens}L - greatest(a.pe, p)),
        'pe', greatest(a.pe, p + ${gramTokens}L),
        'spans', a.spans + IF(p > a.pe, 1L, 0L)))"""
    val scored = grams
      .join(shared, Seq("__gh"), "left")
      .groupBy(win, col("doc_id"), col("pos"))
      .agg(max(coalesce(col("_hit"), lit(0L))).as("_h"))
      .groupBy(col("window"), col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("_h")).as("n_hit"),
        sort_array(collect_list(when(col("_h") === 1L, col("pos"))))
          .as("_hp"))
      .withColumn("_agg", expr(fold))
      .select(col("doc_id").as(idCol), col("window.end").as("window_end"),
        col("n_grams"), col("n_hit"),
        col("_agg.spans").as("n_spans"),
        col("_agg.cov").as("covered_tokens"))
    val empty = tokenized.filter(col("_ntk") < gramTokens)
      .groupBy(win, col(idCol))
      .agg(count(lit(1)).as("_n"))
      .select(col(idCol), col("window.end").as("window_end"),
        lit(0L).as("n_grams"), lit(0L).as("n_hit"),
        lit(0L).as("n_spans"), lit(0L).as("covered_tokens"))
    scored.unionByName(empty)
  }
}

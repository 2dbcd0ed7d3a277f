package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted CORPUS-STATS (dataset-card) index — the ELEVENTH
  * maintained family, generalizing the LSM fold discipline from
  * retrieval structures to the ACCOUNTING a training-data release
  * ships with: [[TextOps.datasetCard]]'s per-(source, lang,
  * quality-bucket) doc/token counts, kept current at O(delta) cost
  * instead of a full-corpus rescan per report. At 100 TB the
  * difference is the whole point — the card is one map-only pass plus
  * a group-count-sized aggregate, but "one pass" over 100 TB is hours
  * of cluster time for numbers that changed by yesterday's crawl; the
  * index stores the leaf sums (SUM-additive by construction, the
  * gram/line/weighted-edge algebra with counts for weights), a day's
  * docs fold in as their own per-run partial sums, and the card
  * renders from group-count rows any time.
  *
  * Family posture (the [[IndexMaintenance]] policy verbatim):
  *   - `$path/stats` = (source, lang, quality, n_docs, n_tokens,
  *     `__run`) leaf partial sums, one appended run per fold;
  *     `$path/meta` = the SUM families' committed-run manifest
  *     ([[IndexMaintenance.writeIndexMetaRunsTags]] — append THEN
  *     commit, orphans from crashed folds invisible to every read)
  *     plus the logical `committed_tags` manifest for the streaming
  *     maintainer below.
  *   - Reconcile is exact by SUM-additivity, applied at read inside
  *     [[reconciledLeaves]]' per-leaf aggregation; like the weighted
  *     edge family there is NO layers<=1 fast path to protect — the
  *     consumer aggregates to leaves anyway, and that aggregation IS
  *     the cross-run reconcile. `layers` only schedules compaction.
  *   - Delete path = signed runs for free
  *     ([[foldRemovalsIntoCardIndex]]): a dedup pass's drops or a
  *     takedown fold in with NEGATED counts, so the card tracks the
  *     CURRENT corpus without rescan; a fully-removed leaf nets to 0
  *     docs and drops at the consumers' net-positive filter, and
  *     compaction makes the deletion durable (bytes gone,
  *     over-removal's residual balance NOT carried — the weighted
  *     family's epoch contract).
  *   - EXACTLY-ONCE streaming maintenance
  *     ([[foldIntoCardIndexTagged]] /
  *     [[graft.streaming.CardGate]]): foreachBatch re-delivers a
  *     failed micro-batch, and under plain folds a replay would
  *     double-count — the tagged fold consults the meta's logical
  *     `committed_tags` manifest and NO-OPS on a tag it has already
  *     committed, while each physical attempt still appends under a
  *     fresh `__run` id (a crashed attempt's orphan can never merge
  *     into the retry). Compaction PRESERVES the tag manifest —
  *     replay-after-compact must still no-op.
  *
  * The quality axis is [[TextOps.qualityScore]]'s bucket — the same
  * formula the batch card, the quality gate (q17) and the curriculum
  * orderer (q109) use — and the render half is
  * [[TextOps.renderCard]], shared verbatim with the batch op, so the
  * deployed card can disagree with [[TextOps.datasetCard]] only if
  * the LEAF SUMS disagree, which is exactly what the q171 fold-parity
  * oracle pins (maintained index == q158's full-corpus SQL).
  *
  * Scale shape: leaves number |sources| × |langs| × 3 — thousands of
  * rows for any real corpus — so every read is broadcast-sized; folds
  * scan ONLY the delta (one map-only scoring pass + one partial
  * aggregate); nothing in the family ever rescans the corpus.
  */
object CardOps {

  /** One fold's leaf partial sums over `df`: per (source, lang,
    * quality) doc and token counts, columns CANONICALIZED to (source,
    * lang, quality, n_docs, n_tokens) so the stored schema does not
    * depend on caller column names. ONE derivation behind write, fold
    * and removal — the two sides of a remove cannot bucket a doc
    * differently from the add that counted it.
    */
  private def leafStats(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, langCol: String, stopword: String): DataFrame =
    TextOps.qualityScore(df, idCol, textCol, stopword,
        keep = Seq(sourceCol, langCol))
      .groupBy(col(sourceCol).as("source"), col(langCol).as("lang"),
        col("quality"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))

  private def writeStatsRun(leaves: DataFrame, indexPath: String,
      run: String, append: Boolean): Unit = {
    val write = if (append) graft.jobs.Sinks.layoutAppend _
    else graft.jobs.Sinks.layout _
    write(leaves.withColumn("__run", lit(run)), s"$indexPath/stats",
      Seq.empty, Seq("source", "lang", "quality"), 1)
  }

  /** Build the card index at `path` from a corpus version: the leaf
    * partial sums land as one committed run, meta carries the run
    * manifest and an EMPTY tag manifest. Build once, fold daily
    * ([[foldIntoCardIndex]] / [[maintainCardIndex]] / the streaming
    * [[graft.streaming.CardGate]]), render any time
    * ([[datasetCardAgainstIndex]]).
    */
  def writeCardIndex(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, langCol: String, path: String,
      stopword: String = " the "): Unit = {
    val run = IndexMaintenance.newRunId()
    writeStatsRun(leafStats(df, idCol, textCol, sourceCol, langCol,
      stopword), path, run, append = false)
    IndexMaintenance.writeIndexMetaRunsTags(df.sparkSession, path,
      prefixPartitions = 1, layers = 1, Seq(run), Seq.empty)
  }

  /** Fold a DELTA of documents into a persisted [[writeCardIndex]] IN
    * PLACE with O(delta) cost: the delta's leaf partial sums land as
    * their own run under a fresh `__run` id, and the meta COMMITS the
    * run after the append (the SUM families' crash contract — an
    * uncommitted run is invisible). `tag = Some(t)` is the
    * exactly-once form: a tag already in the meta's logical manifest
    * makes the whole fold a NO-OP (returns false), and a committed
    * fold records it — the streaming maintainer's re-delivery
    * discipline. Single-writer per index (use [[maintainCardIndex]] /
    * [[maintainCardIndexTagged]] for the locked form).
    *
    * @return true iff the fold applied (always, when untagged).
    */
  def foldIntoCardIndex(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, langCol: String, indexPath: String,
      stopword: String = " the ", tag: Option[String] = None): Boolean = {
    val s = df.sparkSession
    val (prefixPartitions, layers, runs, tags) = IndexMaintenance
      .readIndexMetaRunsTags(s, indexPath, "foldIntoCardIndex")
    if (tag.exists(tags.contains)) false
    else {
      val run = IndexMaintenance.newRunId()
      writeStatsRun(leafStats(df, idCol, textCol, sourceCol, langCol,
        stopword), indexPath, run, append = true)
      IndexMaintenance.writeIndexMetaRunsTags(s, indexPath,
        prefixPartitions, layers + 1, runs :+ run, tags ++ tag)
      true
    }
  }

  /** The card family's DELETE path — a SIGNED run the SUM reconcile
    * absorbs for free: `df` holds the REMOVED documents (a dedup
    * pass's drops, a takedown, a license retraction) and their leaf
    * stats fold in NEGATED, so the card tracks the post-removal
    * corpus at O(removed) cost with no rescan. Removals must mirror
    * docs previously counted in — over-removal is a caller error
    * whose residual negative net reads as absent and is dropped at
    * compaction (the weighted-edge epoch contract). Crash shape = the
    * fold's (per-run manifest; an uncommitted removal run is
    * invisible).
    */
  def foldRemovalsIntoCardIndex(df: DataFrame, idCol: String,
      textCol: String, sourceCol: String, langCol: String,
      indexPath: String, stopword: String = " the "): Unit = {
    val s = df.sparkSession
    val (prefixPartitions, layers, runs, tags) = IndexMaintenance
      .readIndexMetaRunsTags(s, indexPath, "foldRemovalsIntoCardIndex")
    val run = IndexMaintenance.newRunId()
    writeStatsRun(
      leafStats(df, idCol, textCol, sourceCol, langCol, stopword)
        .select(col("source"), col("lang"), col("quality"),
          (-col("n_docs")).as("n_docs"), (-col("n_tokens")).as("n_tokens")),
      indexPath, run, append = true)
    IndexMaintenance.writeIndexMetaRunsTags(s, indexPath,
      prefixPartitions, layers + 1, runs :+ run, tags)
  }

  /** Compact a layered card index back to ONE run: per-leaf sums over
    * COMMITTED rows made durable (orphans from crashed folds dropped
    * from disk; leaves whose net doc count is <= 0 dropped — signed
    * removal runs become durable deletions and over-removal's
    * residual balance does not carry), meta reset to layers=1 with a
    * single-run manifest and the TAG MANIFEST PRESERVED (a batch
    * re-delivered after a compaction must still no-op). Identical
    * reads before and after.
    */
  def compactCardIndex(s: org.apache.spark.sql.SparkSession,
      indexPath: String, outPath: String): Unit = {
    require(indexPath != outPath,
      "compactCardIndex: outPath must differ from indexPath")
    val (prefixPartitions, _, runs, tags) = IndexMaintenance
      .readIndexMetaRunsTags(s, indexPath, "compactCardIndex")
    val run = IndexMaintenance.newRunId()
    writeStatsRun(
      IndexMaintenance.committedOnly(
          s.read.parquet(s"$indexPath/stats"), runs)
        .groupBy(col("source"), col("lang"), col("quality"))
        .agg(sum(col("n_docs")).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"))
        .filter(col("n_docs") > 0),
      outPath, run, append = false)
    IndexMaintenance.writeIndexMetaRunsTags(s, outPath,
      prefixPartitions, 1, Seq(run), tags)
  }

  /** The family's maintain* entry point — the
    * [[graft.operators.PageRank.maintainWeightedEdgeIndex]] policy
    * verbatim: crash-recover at entry, O(delta) fold,
    * compact-and-swap iff post-fold layers reach `compactThreshold`,
    * all inside the writer lock. NOT reader-safe across the swap.
    *
    * @return true iff a compaction ran.
    */
  def maintainCardIndex(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, langCol: String, indexPath: String,
      stopword: String = " the ",
      compactThreshold: Int =
        IndexMaintenance.DefaultCompactThreshold): Boolean = {
    val s = df.sparkSession
    IndexMaintenance.withWriterLock(s, indexPath) {
      IndexMaintenance.recoverAtEntry(s, indexPath)
      foldIntoCardIndex(df, idCol, textCol, sourceCol, langCol,
        indexPath, stopword)
      compactIfDue(s, indexPath, compactThreshold)
    }
  }

  /** [[maintainCardIndex]] with the exactly-once tag: returns true
    * iff the fold APPLIED (the tag was new — a replayed tag no-ops
    * without touching the index, and without compacting either: a
    * no-op must be a no-op).
    */
  def maintainCardIndexTagged(df: DataFrame, idCol: String,
      textCol: String, sourceCol: String, langCol: String,
      indexPath: String, tag: String, stopword: String = " the ",
      compactThreshold: Int =
        IndexMaintenance.DefaultCompactThreshold): Boolean = {
    val s = df.sparkSession
    IndexMaintenance.withWriterLock(s, indexPath) {
      IndexMaintenance.recoverAtEntry(s, indexPath)
      val applied = foldIntoCardIndex(df, idCol, textCol, sourceCol,
        langCol, indexPath, stopword, Some(tag))
      if (applied) compactIfDue(s, indexPath, compactThreshold)
      applied
    }
  }

  private def compactIfDue(s: org.apache.spark.sql.SparkSession,
      indexPath: String, compactThreshold: Int): Boolean = {
    val (_, layers, _, _) = IndexMaintenance
      .readIndexMetaRunsTags(s, indexPath, "maintainCardIndex")
    IndexMaintenance.compactIfLayered(s, indexPath, layers,
      compactThreshold)(out => compactCardIndex(s, indexPath, out))
  }

  /** Committed, reconciled leaf rows of a card index: runs filter to
    * the meta's manifest, per-leaf SUM reconcile, net-positive only
    * (a fully-removed leaf reads as absent — the delete path's
    * read-side half). Broadcast-sized by construction.
    */
  def reconciledLeaves(s: org.apache.spark.sql.SparkSession,
      indexPath: String): DataFrame = {
    val (_, _, runs, _) = IndexMaintenance
      .readIndexMetaRunsTags(s, indexPath, "reconciledLeaves")
    IndexMaintenance.committedOnly(
        s.read.parquet(s"$indexPath/stats"), runs)
      .groupBy(col("source"), col("lang"), col("quality"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"))
      .filter(col("n_docs") > 0)
  }

  /** [[TextOps.datasetCard]] off the persisted index — identical
    * output to running the batch card over every document the index
    * has folded (minus removals), at LEAF-sized cost: the rollup and
    * the exact-ppm render run over the reconciled leaf sums
    * (counts are SUM-additive, so rollup-over-leaves ==
    * rollup-over-docs identically), through the SAME
    * [[TextOps.renderCard]] the batch op uses. No corpus scan exists
    * anywhere in the plan. `sourceCol`/`langCol` name the output
    * columns (the stored schema is canonical).
    */
  def datasetCardAgainstIndex(s: org.apache.spark.sql.SparkSession,
      indexPath: String, sourceCol: String = "source",
      langCol: String = "lang"): DataFrame =
    TextOps.renderCard(cardRolledFromIndex(s, indexPath, sourceCol,
      langCol), sourceCol, langCol)

  /** The index card's pre-render rollup (leaf sums → the four
    * grouping levels) — factored like [[TextOps.datasetCardRolled]]
    * so PlanSpec can pin its shape (stats-parquet scan only, no
    * documents scan, one Expand); [[TextOps.renderCard]]'s checkpoint
    * makes this subtree invisible in the final plan.
    */
  private[graft] def cardRolledFromIndex(
      s: org.apache.spark.sql.SparkSession, indexPath: String,
      sourceCol: String, langCol: String): DataFrame =
    reconciledLeaves(s, indexPath)
      .select(col("source").as(sourceCol), col("lang").as(langCol),
        col("quality"), col("n_docs"), col("n_tokens"))
      .rollup(col(sourceCol), col(langCol), col("quality"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        grouping(col(sourceCol)).as("_gs"),
        grouping(col(langCol)).as("_gl"),
        grouping(col("quality")).as("_gq"))
}

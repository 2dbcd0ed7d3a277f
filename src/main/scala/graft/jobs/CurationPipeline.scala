package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.api.{DedupOps, SampleOps, TextOps}
import graft.operators.ConnectedComponents

/** The end-to-end BATCH curation pipeline — the batch twin of
  * [[graft.streaming.IngestPipeline]]: every corpus-cleaning stage this
  * library ships, composed into ONE DataFrame program in the order a
  * production training-data build runs them:
  *
  *   1. URL dedup (q86): canonical-URL keepers — the crawl front door,
  *      upstream of any text comparison.
  *   2. Exact dedup (q15): md5-digest keepers over the URL survivors.
  *   3. Near-dup dedup (q21 → q46 → q58): capped MinHash-LSH pairs →
  *      connected components → one keeper per cluster by token-count
  *      score (longest copy wins, ties to the smallest id).
  *   4. Passage gate (q85): docs where half or more of their 25-token
  *      chunks duplicate passages of an EARLIER (lower-id) surviving
  *      doc are dropped — stitched-together boilerplate that doc-level
  *      dedup cannot see.
  *   5. Quality gates (q44 ∧ q88's scorer): within-doc repetition
  *      ≤ 30% AND bigram-LM average quantized log-prob within
  *      `lmSlackBits` of the CORPUS MEAN (the LM is trained on the
  *      gate's own input corpus, CCNet-style). The threshold is
  *      RELATIVE, unlike standalone q88's absolute cut: an absolute
  *      bits threshold is a function of corpus size (smaller corpus →
  *      smaller bigram counts → every score shifts down together), so
  *      inside a pipeline whose earlier stages shrink the corpus it
  *      would mis-fire; mean-minus-slack self-normalizes. The
  *      comparison is cross-multiplied integers — exact in both
  *      engines, no floor-division sign traps.
  *   6. Mixture (q60): per-source resampling to target weights.
  *   7. Packing (q50): deterministic-order concat-then-chunk into
  *      2048-token bins.
  *
  * Each stage consumes the previous stage's SURVIVOR set, so order
  * matters and is part of the contract: dedup before quality (a
  * duplicate should not vote in the LM), quality before mixture (the
  * mix is over kept docs), mixture before packing (bins hold the final
  * corpus). All decisions are integer/hash-deterministic — the whole
  * composition is oracle-checkable end-to-end (q89's DuckDB twin).
  *
  * Scale shape: every keep-set is an id-frame joined back LEFT SEMI on
  * the id (digest/pair stages shuffle ids + digests, never text);
  * stage internals carry their own documented contracts (capped
  * buckets, pointer-doubling clustering, broadcast mixture rates,
  * two-phase packing prefix sum). At 100 TB each stage's survivor set
  * would be MATERIALIZED to parquet between stages ([[Sinks.layout]],
  * the SharedStages discipline) rather than recomputed through one
  * lineage tree. This in-process composition applies the same
  * discipline with [[org.apache.spark.sql.Dataset.localCheckpoint]]
  * on each stage's KEEP-SET (an id frame, tiny next to the corpus):
  * without truncation the plan tree is EXPONENTIAL in the stage count
  * — minhashPairs alone references its input ~4× (two band sides +
  * two verify sides), so stage k's subtree appears 4^… times by stage
  * 7 and compilation alone blows up. With it, every stage is
  * corpus-scan ⋈ checkpointed-id-set and the whole pipeline stays
  * linear in the stage count.
  */
object CurationPipeline {

  /** Every stage's survivor frame, exposed for inspection/tests; the
    * driver-facing result is [[packed]]. `checkpointed` tracks the
    * stage-boundary localCheckpoint frames so [[close]] can release
    * their storage blocks.
    */
  final case class Stages(
      urlSurvivors: DataFrame,
      exactSurvivors: DataFrame,
      nearDupSurvivors: DataFrame,
      passageSurvivors: DataFrame,
      qualitySurvivors: DataFrame,
      mixed: DataFrame,
      packed: DataFrame,
      checkpointed: Seq[DataFrame] = Nil) {

    /** Release every stage-boundary checkpoint's storage blocks.
      * localCheckpoint persists its RDD for the life of the context
      * and truncates lineage, so WITHOUT this a long-lived driver
      * re-running the pipeline (a bench JVM, a per-ingest-batch
      * production loop) accretes storage memory run over run — the
      * blocks die only when the RDDs are GC'd, which references from
      * a Stages cache prevent. Call once the terminal frame has been
      * materialized. AFTER close() no stage frame can be recomputed
      * (truncated lineage + released blocks) — close is the END of
      * this Stages' life, mirroring what dropping a between-stage
      * parquet materialization would be at 100 TB. Goes through
      * [[graft.api.Lifecycle.releaseLocalCheckpoint]] so any
      * cache-owned registration (CurationQueries' Stages cache) is
      * dropped in the same step — a closed Stages must not keep its
      * dead ids drain-exempt.
      */
    def close(): Unit =
      checkpointed.foreach(graft.api.Lifecycle.releaseLocalCheckpoint)
  }

  /** Run the full pipeline over `docs` (doc_id, text, source, + any
    * other columns) with `urlCol` carrying the raw crawl URL.
    * Output ([[Stages.packed]]): doc_id, source, start_tok, bin.
    */
  def run(docs: DataFrame, urls: DataFrame,
      chunkTokens: Int = 25,
      repetitionMaxX1000: Int = 300,
      lmSlackBits: Long = 1L,
      packBudget: Long = 2048L): Stages = {
    val nTok = size(split(col("text"), " ", -1)).cast("long")
    // stage-boundary lineage cut (see scaladoc): keep-sets are id
    // frames, tiny next to the corpus — checkpointing them keeps the
    // composed plan linear in the stage count. Each cut frame is
    // tracked so Stages.close() can release its blocks.
    val cuts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // stage labels (spark_optimization_guide §1.5): each keep-set cut
    // runs as its own job — labeling makes the per-stage cost readable
    // in the UI/listener without changing what executes
    // LAZY checkpoints (the ConnectedComponents discipline): the
    // logical plan is truncated at cut() time — the linear-plan
    // guarantee is unchanged — but materialization folds into the
    // first consuming job instead of an eager barrier per stage.
    // Nine stage barriers collapse into the terminal action's DAG,
    // where independent subtrees (e.g. the two quality gates) can
    // also overlap. Job descriptions are submission-time thread-locals,
    // so with eager=false only the AQE stage jobs executed AT cut()
    // time carry the label; the final result-stage materialization
    // folds into whichever consumer job triggers it and runs under
    // that job's own description (ADVICE r16). The enclosing
    // description is saved and restored rather than nulled, so cut()
    // composes under a caller's own setJobDescription.
    def cut(df: DataFrame, label: String): DataFrame = {
      val sc = df.sparkSession.sparkContext
      val prev = sc.getLocalProperty("spark.job.description")
      sc.setJobDescription(s"curation: $label")
      val c = try df.localCheckpoint(eager = false)
      finally sc.setJobDescription(prev)
      cuts += c
      c
    }

    // 1. URL dedup: keeper ids of each canonical-URL group
    val urlKeepers = cut(TextOps.urlDuplicates(urls, "doc_id", "url")
      .select(col("keeper_id").as("doc_id")), "1_url_keepers")
    val s1 = docs.join(urlKeepers, Seq("doc_id"), "left_semi")

    // 2. exact dedup over URL survivors
    val exactKeepers = cut(DedupOps.exactDuplicates(s1, "doc_id", "text")
      .select(col("keeper_id").as("doc_id")), "2_exact_keepers")
    val s2 = s1.join(exactKeepers, Seq("doc_id"), "left_semi")

    // 3. near-dup: pairs → clusters → keeper per cluster by n_tok
    // (longest copy wins, tie to min id — q58's rule); docs in no pair
    // are not cluster members and survive untouched
    val pairs = DedupOps.minhashPairs(s2, "doc_id", "text",
      jaccardX1000Threshold = 500)
    val clusters = ConnectedComponents.minLabel(pairs, "doc_a", "doc_b")
    // ONE (doc_id, n_tok) pass over the s2 corpus, checkpointed:
    // n_tok decides the near-dup keeper (here), the passage chunk
    // totals (stage 4) and the packing prefix sum (stage 7) — none of
    // those consumers needs to touch text again (guide §8: decide
    // with small rows — 2 longs a row vs three corpus re-tokenizes)
    val nToks = cut(s2.select(col("doc_id"), nTok.as("n_tok")), "3_ntok")
    val scored = clusters.join(nToks, clusters("id") === col("doc_id"))
      .select(col("id"), col("cluster_id"), col("n_tok"))
    val keepers = DedupOps.keepersByScore(scored, "id", "cluster_id", "n_tok")
      .select(col("keeper_id"))
    val nonKeepers = cut(clusters.select(col("id"))
      .join(keepers, clusters("id") === col("keeper_id"), "left_anti")
      .select(col("id").as("doc_id")), "3_neardup_nonkeepers")
    val s3 = s2.join(nonKeepers, Seq("doc_id"), "left_anti")

    // 4. passage gate: a doc is dropped when >= half its chunks
    // duplicate passages of a lower-id survivor (passagePairs emits
    // doc_a < doc_b, so doc_b is always the later doc)
    val pp = DedupOps.passagePairs(s3, "doc_id", "text",
      chunkTokens = chunkTokens, maxChunksPerDoc = 100000L,
      jaccardX1000Threshold = 500)
    val dupChunks = pp.groupBy(col("doc_b").as("doc_id"))
      .agg(count_distinct(col("chunk_b")).as("_ndup"))
    // chunk totals derive from the checkpointed n_tok frame restricted
    // to s3's ids (id-frame anti join) — no third corpus tokenize;
    // (n_tok - 1) div k + 1 is the same integer arithmetic as before
    // because n_tok IS size(split(text, ' ', -1))
    val totalChunks = nToks.join(nonKeepers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"),
        expr(s"(n_tok - 1) div $chunkTokens + 1").cast("long").as("_nch"))
    val passageKeep = cut(totalChunks
      .join(dupChunks, Seq("doc_id"), "left")
      .filter(coalesce(col("_ndup"), lit(0L)) * 2 < col("_nch"))
      .select(col("doc_id")), "4_passage_keep")
    val s4 = s3.join(passageKeep, Seq("doc_id"), "left_semi")

    // 5. quality: repetition AND bigram-LM, both trained/thresholded
    // on the gate's own input corpus
    val repKeep = cut(TextOps.repetitionFilter(s4, "doc_id", "text",
      keepBelowX1000 = repetitionMaxX1000)
      .filter(col("keep")).select(col("doc_id")), "5a_repetition_keep")
    // relative LM gate: keep iff sum_q2/n >= S/N - slack, compared as
    // sum_q2 * N >= (S - slack*N) * n (n, N > 0 so the inequality
    // direction is preserved; keepAvgQx1000 is irrelevant here — only
    // the scorer columns are used). 0-bigram docs keep, as in q88.
    // the scorer frame is consumed TWICE (the corpus-stats aggregate
    // and the keep filter) — without a cut the whole LM DAG (tokenize,
    // bigram_counts rollup, model joins) executes twice per run; the
    // frame is doc-count-sized (3 longs a row), so checkpointing it is
    // the q93 consumed-twice discipline (guide §5 caching)
    val lmScored = cut(TextOps.bigramLmScore(s4, "doc_id", "text")
      .select(col("doc_id"), col("sum_q2"), col("n_bigrams")),
      "5b_lm_scored")
    val lmStats = lmScored.agg(sum(col("sum_q2")).as("_S"),
      sum(col("n_bigrams")).as("_N"))
    val lmKeep = cut(lmScored.crossJoin(broadcast(lmStats))
      .filter(col("n_bigrams") === 0 ||
        col("sum_q2") * col("_N") >=
          (col("_S") - lit(lmSlackBits) * col("_N")) * col("n_bigrams"))
      .select(col("doc_id")), "5b_lm_keep")
    val s5 = s4.join(repKeep, Seq("doc_id"), "left_semi")
      .join(lmKeep, Seq("doc_id"), "left_semi")

    // 6. mixture to per-source target weights (q60's weight rule)
    val mixed = cut(SampleOps.mixtureResample(
      s5.select(col("doc_id"), col("source")), "doc_id", "source",
      expr("cast(replace(source, 'src', '') as bigint) % 3 + 1")), "6_mixture")

    // 7. pack survivors into budget-token bins; re-join source so the
    // output names a training shard AND its provenance
    // packing decisions need only (doc_id, n_tok): joining the mixed
    // id frame with the stage-3 checkpoint keeps the terminal job
    // corpus-scan-free — no fourth tokenize of the survivors
    val packed = SampleOps.packSequences(
      mixed.join(nToks, Seq("doc_id")),
      "doc_id", "n_tok", budget = packBudget)
      .join(mixed.select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("start_tok"), col("bin"))

    Stages(s1, s2, s3, s4, s5, mixed, packed, cuts.toSeq)
  }

  /** Per-stage, per-source survivor counts — the drop-accounting
    * report a production curation run ships to its dashboard: which
    * gate removed how much of which source. Stage labels are
    * alphabetically ordered in pipeline order so the report sorts
    * correctly as plain data. Output: stage, source, n_docs.
    */
  def report(docs: DataFrame, stages: Stages): DataFrame = {
    def cnt(stage: String, df: DataFrame): DataFrame =
      df.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        .select(lit(stage).as("stage"), col("source"), col("n_docs"))
    cnt("a_raw", docs)
      .unionByName(cnt("b_url", stages.urlSurvivors))
      .unionByName(cnt("c_exact", stages.exactSurvivors))
      .unionByName(cnt("d_neardup", stages.nearDupSurvivors))
      .unionByName(cnt("e_passage", stages.passageSurvivors))
      .unionByName(cnt("f_quality", stages.qualitySurvivors))
      .unionByName(cnt("g_mixed", stages.mixed))
  }
}

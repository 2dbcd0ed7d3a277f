package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextHashExpressions, TextHashing}
import graft.operators.ConnectedComponents

/** User-facing dedup API over caller-named columns. The catalog queries
  * (q15, q21, q22, q37, q46) wrap these, keeping every path under the
  * DuckDB oracle gate.
  */
object DedupOps {

  /** Exact duplicate groups by content digest. Output: sig, keeper_id,
    * n_copies. Only the 16-byte digest shuffles.
    */
  def exactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(md5(col(textCol).cast("binary")).as("sig"), col(idCol))
      .groupBy(col("sig"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Band buckets larger than this generate no candidate pairs (the
    * skew cap). Mirrored in q21's oracle SQL — keep the two in sync.
    */
  val DefaultMaxBucket = 100

  /** THE skew-cap contract, defined once for every pair generator
    * (minhash, n-gram, simhash, embedding-LSH): group by the blocking
    * key(s), aggregate ids through `capped_list` (NULL = bucket too hot
    * to block on — skipped, bounded partials), explode the capped sets
    * into ordered distinct pairs. A change to the cap semantics here is
    * the only place it can happen — the mirrored oracle SQL CTEs must
    * follow.
    */
  private[api] def cappedCandidatePairs(df: DataFrame, groupCols: Seq[Column],
      idCol: String, maxBucket: Int, aCol: String, bCol: String): DataFrame = {
    graft.functions.SketchAggregates.register(df.sparkSession)
    df.groupBy(groupCols: _*)
      .agg(call_function("capped_list", col(idCol), lit(maxBucket)).as("__ds"))
      .filter(col("__ds").isNotNull && size(col("__ds")) >= 2)
      .select(col("__ds"), explode(col("__ds")).as(aCol))
      .select(col(aCol), explode(col("__ds")).as(bCol))
      .filter(col(aCol) < col(bCol))
      .dropDuplicates(aCol, bCol)
  }

  /** MinHash+LSH near-duplicate pairs with exact shingle-Jaccard
    * verification. Output: doc_a, doc_b, jaccard_x1000 (>= threshold).
    * Band keys shuffle id-only; shingle sets rejoin candidates only.
    *
    * Skew safety: candidates come from a `capped_list` aggregation per
    * (band, bucket) — a bucket with more than `maxBucket` ids evaluates
    * to NULL and yields NO pairs, so one pathological band key (10k
    * docs sharing a signature) costs O(cap²), never O(10k²). Giant
    * buckets are mass-duplication, which the O(n) digest pass
    * ([[exactDuplicates]]) catches without pair explosion — LSH's job
    * is the near-dups. Requires a BIGINT id column (as do
    * [[ngramJaccardPairs]] and [[clusters]]).
    */
  /** doc → (idCol, carry..., hs): the shared shingle→hash front end.
    * `private[graft]` so the streaming ingest probe
    * (streaming.NearDupIngest) derives its hashes through the EXACT
    * same shingle config as the batch pair generators — LSH blocking
    * only works if both sides band identically. `carry` threads extra
    * columns (a stream's event-time) through untouched.
    */
  private[graft] def shingleHashed(df: DataFrame, idCol: String,
      textCol: String, carry: Seq[String] = Nil): DataFrame = {
    import TextHashing._
    TextHashExpressions.register(df.sparkSession)
    graft.functions.SketchAggregates.register(df.sparkSession)
    val cs = carry.map(col)
    df.select((col(idCol) +: cs :+ split(col(textCol), " ", -1).as("toks")): _*)
      .filter(size(col("toks")) >= 3)
      .select((col(idCol) +: cs :+ expr(s"shingle_hashes(toks, 3, $P)").as("hs")): _*)
  }

  /** hashed (…, hs) → + (band, bkey): 16 minhash permutations → Bands
    * band keys, one output row per (input row, band); every input
    * column is preserved. Batch pair generators project down to
    * (id, band, bkey) so payloads never ride the band shuffle; the
    * streaming probe instead carries (ts, hs) because a stream cannot
    * self-join back for the verify step.
    */
  private[graft] def withBandKeys(hashed: DataFrame): DataFrame = {
    import TextHashing._
    val keep = hashed.columns.map(col).toSeq
    hashed
      .withColumn("__mh", minhash(col("hs")))
      .select((keep :+ posexplode(array((0 until Bands).map { b =>
        concat_ws(":", (0 until RowsPerBand).map(r =>
          element_at(col("__mh"), b * RowsPerBand + r + 1)): _*)
      }: _*))): _*)
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bkey")
  }

  /** Corpus band rows → the capped (band, bkey, __cs) bucket index —
    * the [[DefaultMaxBucket]] skew contract applied to an index that a
    * delta (batch or stream) probes: an over-hot corpus bucket
    * aggregates to NULL and blocks nothing.
    */
  private[graft] def bandBuckets(bands: DataFrame, idCol: String,
      maxBucket: Int): DataFrame =
    bandBucketsAll(bands, idCol, maxBucket)
      .filter(col("__cs").isNotNull)

  /** [[bandBuckets]] KEEPING the over-cap buckets as `__cs = null`
    * TOMBSTONE rows. In-process consumers filter them (a null bucket
    * blocks nothing, so carrying it is pure overhead), but the
    * PERSISTED index must record them: a fold
    * ([[foldIntoMinhashIndex]]) cannot otherwise distinguish "bucket
    * never seen" from "bucket already over cap", and would resurrect
    * a skipped bucket with only its delta members — diverging from
    * the from-scratch build the fold must reproduce. Probes are
    * tombstone-tolerant by construction (`explode(__cs)` of null
    * emits nothing).
    */
  private[graft] def bandBucketsAll(bands: DataFrame, idCol: String,
      maxBucket: Int): DataFrame =
    bands.groupBy(col("band"), col("bkey"))
      .agg(call_function("capped_list", col(idCol), lit(maxBucket)).as("__cs"))

  /** Shared MinHash front end: (hashed = id + distinct shingle hashes,
    * bands = id + LSH band keys). Factored so self-join dedup
    * ([[minhashPairs]]) and incremental new-vs-corpus dedup
    * ([[minhashPairsAgainst]]) block on identical signatures.
    */
  private def shingleBands(df: DataFrame, idCol: String,
      textCol: String): (DataFrame, DataFrame) = {
    val hashed = shingleHashed(df, idCol, textCol)
    (hashed, withBandKeys(hashed).select(col(idCol), col("band"), col("bkey")))
  }

  /** Exact-Jaccard verification of candidate pairs against the shingle
    * sets of each side (shared by the self-join and two-corpus paths).
    */
  private def verifyJaccard(cand: DataFrame, leftHashed: DataFrame,
      rightHashed: DataFrame, idCol: String, aCol: String, bCol: String,
      jaccardX1000Threshold: Int): DataFrame =
    cand
      .join(leftHashed.select(col(idCol).as(aCol), col("hs").as("hs_a")),
        Seq(aCol))
      .join(rightHashed.select(col(idCol).as(bCol), col("hs").as("hs_b")),
        Seq(bCol))
      .withColumn("it", size(array_intersect(col("hs_a"), col("hs_b"))).cast("long"))
      .withColumn("un", size(array_distinct(concat(col("hs_a"), col("hs_b")))).cast("long"))
      .select(col(aCol), col(bCol),
        expr("(it * 1000) div un").as("jaccard_x1000"))
      .filter(col("jaccard_x1000") >= jaccardX1000Threshold)

  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      jaccardX1000Threshold: Int = 500,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val (hashed, bands) = shingleBands(df, idCol, textCol)
    // one bounded shuffle replaces the unbounded bucket self-join:
    // partials carry <= cap+1 ids per bucket, pairs explode from the
    // capped set only
    val cand = cappedCandidatePairs(bands, Seq(col("band"), col("bkey")),
      idCol, maxBucket, "doc_a", "doc_b")
    verifyJaccard(cand, hashed, hashed, idCol, "doc_a", "doc_b",
      jaccardX1000Threshold)
  }

  /** Incremental dedup: near-dup pairs between a NEW batch and the
    * EXISTING corpus (the daily-ingestion path — never re-pair the
    * corpus against itself, only the delta against the index). Corpus
    * band buckets aggregate to capped id-lists (the [[DefaultMaxBucket]]
    * skew contract: an over-hot corpus bucket blocks nothing), then the
    * new batch's band keys probe them — a join whose build side is
    * O(corpus buckets), carrying <= cap ids each, and whose probe side
    * is only the delta. Exact-Jaccard verify joins candidates only.
    * At 100TB the corpus bucket index is the thing you materialize
    * once and re-probe per batch. Output: doc_new, doc_old,
    * jaccard_x1000 (>= threshold).
    */
  def minhashPairsAgainst(newDf: DataFrame, corpusDf: DataFrame,
      idCol: String, textCol: String,
      jaccardX1000Threshold: Int = 500,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val (hashedNew, bandsNew) = shingleBands(newDf, idCol, textCol)
    val (hashedOld, bandsOld) = shingleBands(corpusDf, idCol, textCol)
    val buckets = bandBuckets(bandsOld, idCol, maxBucket)
    val cand = bandsNew
      .join(buckets, Seq("band", "bkey"))
      .select(col(idCol).as("doc_new"), explode(col("__cs")).as("doc_old"))
      .dropDuplicates("doc_new", "doc_old")
    verifyJaccard(cand, hashedNew, hashedOld, idCol, "doc_new", "doc_old",
      jaccardX1000Threshold)
  }

  /** Materialize the corpus side of [[minhashPairsAgainstIndex]] to
    * parquet: `$path/buckets` = the capped (band, bkey, __cs) LSH
    * bucket index PARTITIONED by `__bp` (a band-hash prefix:
    * `xxhash64(band, bkey) mod prefixPartitions`) and sorted by
    * (band, bkey) within partitions, `$path/hashed` = (doc_old,
    * hs_old) shingle sets sorted by id for the verify join,
    * `$path/meta` = one row recording `prefix_partitions` so probes
    * derive the SAME prefix without a caller-side knob to keep in
    * sync. This is the "build once, probe per ingest batch" contract
    * made literal — at 100TB the index build is the one full-corpus
    * LSH scan per corpus version ([[minhashPairsAgainst]] re-derives
    * it per CALL, NearDupIngest.index per SESSION), and every daily
    * delta pays only the probe. The `__bp` layout is what makes the
    * probe's index-scan term sub-linear in the INDEX: a delta touching
    * k of the prefixes reads k/prefixPartitions of the bucket files
    * (directory-level partition pruning), and the (band, bkey) sort
    * gives row-group min/max pruning within each file. Both frames are
    * tiny next to the corpus: ids + 60-bit hash sets, never text.
    */
  def writeMinhashIndex(corpus: DataFrame, idCol: String, textCol: String,
      path: String, maxBucket: Int = DefaultMaxBucket,
      prefixPartitions: Int = 64): Unit = {
    require(prefixPartitions >= 1,
      s"writeMinhashIndex: prefixPartitions $prefixPartitions < 1")
    // one persisted shingle pass feeds both outputs (the
    // NearDupIngest.index single-scan discipline)
    val hashed = shingleHashed(corpus, idCol, textCol).persist()
    try {
      // the two tables are independent given the shared shingle cache
      // — overlap their writes (guide §2.6, graft.api.Par)
      Par.run(
        () => graft.jobs.Sinks.layout(
          // tombstones INCLUDED (bandBucketsAll): the fold operator
          // needs to see which buckets are already over cap
          bandBucketsAll(withBandKeys(hashed)
            .select(col(idCol), col("band"), col("bkey")), idCol, maxBucket)
            .withColumn("__bp",
              pmod(xxhash64(col("band"), col("bkey")), lit(prefixPartitions.toLong))),
          s"$path/buckets", partitionCols = Seq("__bp"),
          sortCols = Seq("band", "bkey"), numFiles = 8),
        () => graft.jobs.Sinks.layout(
          hashed.select(col(idCol).as("doc_old"), col("hs").as("hs_old")),
          s"$path/hashed", partitionCols = Nil,
          sortCols = Seq("doc_old"), numFiles = 8))
      writeMinhashMeta(corpus.sparkSession, path, prefixPartitions,
        maxBucket, 1)
    } finally hashed.unpersist()
  }

  /** The exact from-scratch cap arithmetic over two (band, bkey,
    * `__cs`) bucket frames WITH tombstones: a tombstone on either side
    * persists (adding docs cannot shrink a bucket), an under-cap union
    * that crosses the cap becomes one, a one-sided bucket keeps its
    * list. The `_has` indicators distinguish "row absent" from "row
    * present with a null (tombstone) list" across the full-outer
    * join. Shared by the minhash and sign-index folds.
    */
  private[graft] def mergeCappedBuckets(oldBuckets: DataFrame,
      deltaBuckets: DataFrame, maxBucket: Int): DataFrame = {
    val listType = deltaBuckets.schema("__cs").dataType
    val o = oldBuckets.select(col("band"), col("bkey"),
      col("__cs").as("_ocs"), lit(true).as("_ohas"))
    val d = deltaBuckets.select(col("band"), col("bkey"),
      col("__cs").as("_dcs"), lit(true).as("_dhas"))
    o.join(d, Seq("band", "bkey"), "full_outer")
      .select(col("band"), col("bkey"),
        when(col("_ohas").isNotNull && col("_ocs").isNull ||
             col("_dhas").isNotNull && col("_dcs").isNull,
          lit(null).cast(listType))
        .when(col("_ohas").isNotNull && col("_dhas").isNotNull,
          when(size(concat(col("_ocs"), col("_dcs"))) > maxBucket,
            lit(null).cast(listType))
          .otherwise(concat(col("_ocs"), col("_dcs"))))
        .when(col("_ohas").isNotNull, col("_ocs"))
        .otherwise(col("_dcs")).as("__cs"))
  }

  /** N-way reconcile of LAYERED (band, bkey, `__cs`) bucket runs — the
    * read side of the O(delta)-write fold ([[foldIntoMinhashIndex]]'s
    * in-place overload, [[graft.jobs.Sinks.layoutAppend]]): each
    * append lands the delta's capped buckets as its own run, so a key
    * may appear once per layer; one grouped pass restores the exact
    * from-scratch semantics. The arithmetic is order-free (unlike the
    * 2-way [[mergeCappedBuckets]], which encodes sides): a tombstone
    * in ANY layer means that layer alone was over cap, so the union
    * is too; otherwise the concat of disjoint per-layer member lists
    * IS the full bucket, tombstoned iff it crosses the cap — term for
    * term what `capped_list` computes over the union corpus.
    * `collect_list` skips nulls, so tombstones are detected by an
    * explicit indicator, not by their (absent) lists.
    */
  private[graft] def mergeLayeredBuckets(buckets: DataFrame,
      maxBucket: Int): DataFrame = {
    val listType = buckets.schema("__cs").dataType
    buckets.groupBy(col("band"), col("bkey"))
      .agg(max(when(col("__cs").isNull, 1).otherwise(0)).as("_tomb"),
        flatten(collect_list(col("__cs"))).as("_all"))
      .select(col("band"), col("bkey"),
        when(col("_tomb") === 1 || size(col("_all")) > maxBucket,
          lit(null).cast(listType))
          .otherwise(col("_all")).as("__cs"))
  }

  /** (prefix_partitions, max_bucket, layers) off a
    * [[writeMinhashIndex]] meta. BOTH geometry fields are REQUIRED
    * with a named rebuild-once error: a pre-tombstone index (no
    * `max_bucket` in meta) has no tombstone rows, so folding it would
    * silently resurrect over-cap buckets with delta-only members —
    * violating fold==rebuild with no error anywhere (the
    * foldIntoBm25Index / foldIntoSignIndex posture, applied here).
    * `layers` defaults to 1 (single-run indexes predate the column).
    */
  private def readMinhashMeta(s: org.apache.spark.sql.SparkSession,
      indexPath: String, op: String): (Int, Int, Int) = {
    val metaDf =
      try s.read.parquet(s"$indexPath/meta")
      catch {
        case e: Exception => throw new IllegalStateException(
          s"$op: cannot read $indexPath/meta — the fold must " +
            "reproduce the build's prefix/cap geometry", e)
      }
    require(metaDf.columns.contains("max_bucket"),
      s"$op: $indexPath/meta lacks max_bucket — a pre-tombstone index " +
        "records no over-cap buckets, so a fold would silently " +
        "resurrect them with delta-only members; rebuild it once with " +
        "the current writeMinhashIndex")
    val row = metaDf.head(1).headOption.getOrElse(
      throw new IllegalStateException(s"$op: $indexPath/meta is empty"))
    val layers =
      if (metaDf.columns.contains("layers"))
        row.getAs[Number]("layers").intValue()
      else 1
    (row.getAs[Number]("prefix_partitions").intValue(),
      row.getAs[Number]("max_bucket").intValue(), layers)
  }

  private def writeMinhashMeta(s: org.apache.spark.sql.SparkSession,
      path: String, prefixPartitions: Int, maxBucket: Int,
      layers: Int): Unit =
    s.range(1)
      .select(lit(prefixPartitions).as("prefix_partitions"),
        lit(maxBucket).as("max_bucket"), lit(layers).as("layers"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")

  /** Fold a DELTA of new documents into a persisted
    * [[writeMinhashIndex]] WITHOUT re-scanning the corpus text, and
    * WITHOUT rewriting the index: the delta's capped buckets and
    * shingle sets land as their OWN sorted parquet runs
    * ([[graft.jobs.Sinks.layoutAppend]]) inside the index's existing
    * `__bp` directory layout — write cost O(delta) bytes, the daily
    * index-maintenance operation at 100 TB (the compacting overload
    * below writes O(index) bytes per fold, which at scale would
    * rewrite the whole signature store every day). `layers` in meta
    * counts the runs; readers reconcile per-key duplicates through
    * [[mergeLayeredBuckets]] (exact fold==rebuild arithmetic, q110's
    * driver-checked hash), and the `hashed/` runs need NO reconcile —
    * disjoint delta ids make the row-set union literal. Each appended
    * run keeps its own (band, bkey) row-group stats, so point/range
    * pruning still works per file; periodic [[compactMinhashIndex]]
    * folds the runs back to one when their count starts to matter
    * (the LSM posture: append daily, compact weekly).
    *
    * Crash consistency (applies to ALL FOUR in-place folds): the
    * appends and the meta rewrite are separate filesystem commits, so
    * a crash mid-fold can leave a partial delta (appended runs the
    * meta's layer count does not yet cover). The operational contract
    * is single-writer with restore-on-failure: treat the fold as a job
    * that either completes or rolls back to the previous index copy
    * (never retried in place — re-appending the delta would duplicate
    * its rows). Callers needing an atomic fold use the to-`outPath`
    * overloads, which build a FRESH directory and leave the old index
    * untouched — O(index) writes is the price of that atomicity, which
    * is exactly the trade a transactional table layout (manifest
    * commit) would dissolve at the storage layer, out of scope here.
    */
  def foldIntoMinhashIndex(delta: DataFrame, idCol: String,
      textCol: String, indexPath: String): Unit = {
    val s = delta.sparkSession
    val (prefixPartitions, maxBucket, layers) =
      readMinhashMeta(s, indexPath, "foldIntoMinhashIndex")
    val hashed = shingleHashed(delta, idCol, textCol).persist()
    try {
      // independent appends off the shared shingle cache — overlapped
      // (guide §2.6); the meta bump stays AFTER both (the count-family
      // crash ordering)
      Par.run(
        () => graft.jobs.Sinks.layoutAppend(
          bandBucketsAll(withBandKeys(hashed)
            .select(col(idCol), col("band"), col("bkey")), idCol, maxBucket)
            .withColumn("__bp",
              pmod(xxhash64(col("band"), col("bkey")),
                lit(prefixPartitions.toLong))),
          s"$indexPath/buckets", partitionCols = Seq("__bp"),
          sortCols = Seq("band", "bkey"), numFiles = 8),
        () => graft.jobs.Sinks.layoutAppend(
          hashed.select(col(idCol).as("doc_old"), col("hs").as("hs_old")),
          s"$indexPath/hashed", partitionCols = Nil,
          sortCols = Seq("doc_old"), numFiles = 8))
      writeMinhashMeta(s, indexPath, prefixPartitions, maxBucket, layers + 1)
    } finally hashed.unpersist()
  }

  /** Fold-and-COMPACT: delta + old index merged into a fresh
    * single-layer index at `outPath` — O(index) read AND write, the
    * right cost class when the fold cadence is the compaction cadence
    * (small indexes, tests, one-shot migrations). For the daily path
    * at scale use the in-place overload above (O(delta) writes) and
    * compact separately. Exactness: identical probes to a
    * from-scratch `writeMinhashIndex(corpus ∪ delta)` (DedupSpec
    * parity) — tombstone/cap arithmetic via [[mergeCappedBuckets]],
    * with a layered old index first reconciled through
    * [[mergeLayeredBuckets]] so both fold shapes compose.
    */
  def foldIntoMinhashIndex(delta: DataFrame, idCol: String,
      textCol: String, indexPath: String, outPath: String): Unit = {
    require(indexPath != outPath,
      "foldIntoMinhashIndex: outPath must differ from indexPath (the " +
        "merge reads the old index lazily while writing the new one)")
    val s = delta.sparkSession
    val (prefixPartitions, maxBucket, layers) =
      readMinhashMeta(s, indexPath, "foldIntoMinhashIndex")
    val hashed = shingleHashed(delta, idCol, textCol).persist()
    try {
      val deltaBuckets = bandBucketsAll(withBandKeys(hashed)
        .select(col(idCol), col("band"), col("bkey")), idCol, maxBucket)
      val oldRaw = s.read.parquet(s"$indexPath/buckets").drop("__bp")
      val oldBuckets =
        if (layers > 1) mergeLayeredBuckets(oldRaw, maxBucket) else oldRaw
      val merged = mergeCappedBuckets(oldBuckets, deltaBuckets, maxBucket)
      graft.jobs.Sinks.layout(
        merged.withColumn("__bp",
          pmod(xxhash64(col("band"), col("bkey")),
            lit(prefixPartitions.toLong))),
        s"$outPath/buckets", partitionCols = Seq("__bp"),
        sortCols = Seq("band", "bkey"), numFiles = 8)
      graft.jobs.Sinks.layout(
        s.read.parquet(s"$indexPath/hashed").unionByName(
          hashed.select(col(idCol).as("doc_old"), col("hs").as("hs_old"))),
        s"$outPath/hashed", partitionCols = Nil,
        sortCols = Seq("doc_old"), numFiles = 8)
      writeMinhashMeta(s, outPath, prefixPartitions, maxBucket, 1)
    } finally hashed.unpersist()
  }

  /** The maintenance policy as one call: in-place O(delta) fold, then
    * compact-and-swap iff the post-fold layer count has reached
    * `compactThreshold` ([[IndexMaintenance.compactIfLayered]] — the
    * "append daily, compact weekly" cadence without a separate
    * scheduler). Probes are identical before and after the compaction
    * (reconcile-at-read == reconcile-at-compact). Returns true when
    * this fold triggered the compaction.
    */
  def maintainMinhashIndex(delta: DataFrame, idCol: String,
      textCol: String, indexPath: String,
      compactThreshold: Int =
        IndexMaintenance.DefaultCompactThreshold): Boolean = {
    val s = delta.sparkSession
    IndexMaintenance.withWriterLock(s, indexPath) {
      IndexMaintenance.recoverAtEntry(s, indexPath)
      foldIntoMinhashIndex(delta, idCol, textCol, indexPath)
      val (_, _, layers) =
        readMinhashMeta(s, indexPath, "maintainMinhashIndex")
      IndexMaintenance.compactIfLayered(s, indexPath, layers,
        compactThreshold)(out => compactMinhashIndex(s, indexPath, out))
    }
  }

  /** Compact a layered index ([[foldIntoMinhashIndex]] in-place folds)
    * back to ONE sorted run per side: buckets reconciled through
    * [[mergeLayeredBuckets]], hashed rows re-laid into globally sorted
    * files, meta reset to layers=1. O(index) read and write — the
    * amortized cost the daily O(delta) appends defer; identical probe
    * results before and after (reconcile-at-read == reconcile-at-
    * compact, same arithmetic).
    */
  def compactMinhashIndex(s: org.apache.spark.sql.SparkSession,
      indexPath: String, outPath: String): Unit = {
    require(indexPath != outPath,
      "compactMinhashIndex: outPath must differ from indexPath")
    val (prefixPartitions, maxBucket, _) =
      readMinhashMeta(s, indexPath, "compactMinhashIndex")
    graft.jobs.Sinks.layout(
      mergeLayeredBuckets(
        s.read.parquet(s"$indexPath/buckets").drop("__bp"), maxBucket)
        .withColumn("__bp",
          pmod(xxhash64(col("band"), col("bkey")),
            lit(prefixPartitions.toLong))),
      s"$outPath/buckets", partitionCols = Seq("__bp"),
      sortCols = Seq("band", "bkey"), numFiles = 8)
    graft.jobs.Sinks.layout(
      s.read.parquet(s"$indexPath/hashed"),
      s"$outPath/hashed", partitionCols = Nil,
      sortCols = Seq("doc_old"), numFiles = 8)
    writeMinhashMeta(s, outPath, prefixPartitions, maxBucket, 1)
  }

  /** [[minhashPairsAgainst]] probing a PERSISTED index
    * ([[writeMinhashIndex]]) instead of re-deriving the corpus side:
    * the delta bands map-only, joins the bucket parquet, and verifies
    * against the hashed parquet — identical output to the inline path
    * on the same split (parity-tested), but the per-batch cost is
    * O(delta work + index scan) with NO corpus shingle/minhash
    * re-derivation. BenchScale's `probe_const_delta` rows measure
    * exactly this: a fixed delta's probe time stays ~flat while the
    * corpus behind the index grows 10×. The index-scan term itself is
    * PRUNED, not just bounded: the delta's distinct `__bp` prefixes
    * (at most `prefix_partitions` ints — a partition-pruning list
    * collected driver-side, the same role as a pushed-down IN filter,
    * never data) filter the `__bp`-partitioned bucket parquet, so the
    * probe reads only the directories its keys can hit, and the
    * (band, bkey) sort prunes row groups within them. Pre-`__bp`
    * indexes (no meta/partition column) probe unpruned, unchanged.
    * Output: doc_new, doc_old, jaccard_x1000.
    */
  def minhashPairsAgainstIndex(newDf: DataFrame, idCol: String,
      textCol: String, indexPath: String,
      jaccardX1000Threshold: Int = 500): DataFrame = {
    val reserved = Set("hs", "band", "bkey", "pos", "col", "__mh",
      "__cs", "toks", "doc_new", "doc_old", "hs_new", "hs_old", "__bp")
    require(!reserved.contains(idCol),
      s"minhashPairsAgainstIndex: id column '$idCol' collides with a " +
        s"working column (${reserved.mkString(", ")}) — rename it first")
    val s = newDf.sparkSession
    val bucketsRaw = s.read.parquet(s"$indexPath/buckets")
    val hashedOld = s.read.parquet(s"$indexPath/hashed")
    val deltaBands = withBandKeys(shingleHashed(newDf, idCol, textCol))
    // the prefix count AND the layer count come from the index's own
    // meta — pruning is still only an optimization, but since the
    // in-place layered folds exist, the layer count is a CORRECTNESS
    // dependency (see the hard-fail below)
    val metaRow: Option[org.apache.spark.sql.Row] =
      try s.read.parquet(s"$indexPath/meta").head(1).headOption
      catch { case _: Exception => None }
    // an index WITHOUT the __bp layout predates both pruning and
    // layering — single-run by construction, safe to probe unpruned
    // and unreconciled. An index WITH the layout always shipped a
    // meta, and since layered folds exist an unreadable meta can no
    // longer degrade to "correct, slower": without `layers` we cannot
    // rule out per-key duplicate runs whose unreconciled join would
    // resurrect tombstones and cap-crossing unions — fail loudly (the
    // CDC/BM25 probes' posture), never probe possibly-wrong.
    if (bucketsRaw.columns.contains("__bp") && metaRow.isEmpty)
      throw new IllegalStateException(
        s"minhashPairsAgainstIndex: cannot read $indexPath/meta for a " +
          "__bp-layout index — the meta carries the layer count, and " +
          "probing a possibly-layered index without reconcile would be " +
          "silently wrong; restore the meta or rebuild the index")
    def metaInt(name: String): Option[Int] = metaRow
      .filter(_.schema.fieldNames.contains(name))
      .map(_.getAs[Number](name).intValue())
    val prefixPartitions: Option[Int] =
      if (!bucketsRaw.columns.contains("__bp")) None
      else metaInt("prefix_partitions").filter(_ >= 1)
    if (bucketsRaw.columns.contains("__bp") && prefixPartitions.isEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"minhashPairsAgainstIndex: $indexPath/meta lacks a usable " +
          "prefix_partitions — probing UNPRUNED (correct, slower)")
    val buckets = prefixPartitions match {
      case Some(p) =>
        // the delta re-derives its band keys for this list (map-only
        // over the delta — cheap by the delta-size contract); the
        // returned plan recomputes them for the join itself
        val prefixes = deltaBands
          .select(pmod(xxhash64(col("band"), col("bkey")), lit(p.toLong))
            .as("__bp"))
          .distinct().collect().map(_.getLong(0)).toSeq
        // Int literals: the read-back partition column infers as int,
        // and a cast on the partition side would defeat directory
        // pruning — the whole point of the layout
        bucketsRaw.filter(col("__bp").isin(prefixes.map(_.toInt): _*))
          .drop("__bp")
      case None =>
        if (bucketsRaw.columns.contains("__bp")) bucketsRaw.drop("__bp")
        else bucketsRaw
    }
    // LAYERED index (in-place O(delta) folds): a (band, bkey) may
    // appear once per appended run, and exact fold==rebuild semantics
    // need the cross-run cap arithmetic — reconcile the PRUNED subset
    // through mergeLayeredBuckets (the agg runs over only the
    // directories the delta's keys can hit, so the probe's sub-linear
    // index-scan term is untouched). Single-layer indexes skip the
    // agg entirely. A layered index always carries meta (the in-place
    // fold both requires and rewrites it), so layers/max_bucket are
    // reliably present exactly when they matter.
    val layers = metaInt("layers").getOrElse(1)
    val reconciled =
      if (layers <= 1) buckets
      else mergeLayeredBuckets(buckets,
        metaInt("max_bucket").getOrElse(throw new IllegalStateException(
          s"minhashPairsAgainstIndex: $indexPath/meta has layers=" +
            s"$layers but no max_bucket — layered reconcile needs the " +
            "build's cap; the index is corrupt or hand-edited")))
        .filter(col("__cs").isNotNull)
    deltaBands
      .join(reconciled, Seq("band", "bkey"))
      .select(col(idCol).as("doc_new"), col("hs").as("hs_new"),
        explode(col("__cs")).as("doc_old"))
      .dropDuplicates("doc_new", "doc_old")
      .join(hashedOld, Seq("doc_old"))
      .withColumn("it", size(array_intersect(col("hs_new"), col("hs_old"))).cast("long"))
      .withColumn("un", size(array_distinct(concat(col("hs_new"), col("hs_old")))).cast("long"))
      .select(col("doc_new"), col("doc_old"),
        expr("(it * 1000) div un").as("jaccard_x1000"))
      .filter(col("jaccard_x1000") >= jaccardX1000Threshold)
  }

  /** Passage-level (sub-document) near-dup spans — duplicate
    * PARAGRAPHS across documents (license blocks, boilerplate
    * passages, syndicated fragments) that doc-level [[minhashPairs]]
    * cannot see when the surrounding documents differ. Composition of
    * existing primitives: fixed-window non-overlapping chunks
    * ([[graft.api.TextOps.chunk]] with stride = chunkTokens) → each
    * chunk becomes a pseudo-document with the synthetic BIGINT id
    * `doc_id * maxChunksPerDoc + chunk_idx` → the standard capped
    * MinHash-LSH pair generation + exact shingle-Jaccard verify at
    * CHUNK granularity → ids decode back to (doc, chunk) spans, and
    * same-doc pairs are dropped (within-doc repetition is
    * [[graft.api.TextOps.repetitionFilter]]'s job). Output: doc_a,
    * chunk_a, doc_b, chunk_b, jaccard_x1000 with doc_a < doc_b.
    *
    * Scale shape: identical to [[minhashPairs]] with the corpus row
    * count multiplied by ~tokens/chunkTokens — the chunk explode is
    * map-only (rows never leave their input partition), band keys
    * shuffle id-only, and the same [[DefaultMaxBucket]] skew contract
    * bounds hot buckets (a license block shared by 10k docs is exactly
    * such a bucket: it blocks nothing here and belongs to the common-
    * gram / boilerplate pass, TextOps.commonGramRatio).
    *
    * Id encoding contract: requires non-negative doc ids (div/mod
    * decode; negative ids would also disagree with a floor-div oracle)
    * and fewer than `maxChunksPerDoc` chunks per document (default
    * 100k chunks ≈ 4M tokens per doc at the default chunk size —
    * beyond it, ids would collide silently; raise it for book-length
    * corpora, the headroom to Long overflow is ~9e13 docs).
    */
  def passagePairs(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 40, maxChunksPerDoc: Long = 100000L,
      jaccardX1000Threshold: Int = 500,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    require(chunkTokens >= 3,
      s"passagePairs: chunks of $chunkTokens tokens cannot carry a 3-token shingle")
    require(maxChunksPerDoc >= 2, "passagePairs: maxChunksPerDoc must be >= 2")
    val chunks = TextOps.chunk(df, idCol, textCol, chunkTokens,
        stride = chunkTokens)
      .select((col(idCol) * maxChunksPerDoc + col("chunk_idx")).as("__cid"),
        col("chunk_text"))
    minhashPairs(chunks, "__cid", "chunk_text", jaccardX1000Threshold,
        maxBucket)
      .select(
        expr(s"doc_a div ${maxChunksPerDoc}L").as("da"),
        (col("doc_a") % maxChunksPerDoc).as("chunk_a"),
        expr(s"doc_b div ${maxChunksPerDoc}L").as("db"),
        (col("doc_b") % maxChunksPerDoc).as("chunk_b"),
        col("jaccard_x1000"))
      .filter(col("da") =!= col("db"))
      .select(col("da").as("doc_a"), col("chunk_a"),
        col("db").as("doc_b"), col("chunk_b"), col("jaccard_x1000"))
  }

  /** Exact n-gram Jaccard pairs via a rare-gram inverted index: the
    * single-pass capped_list index bounds hot-gram postings (NULL =
    * too common to block on), so candidate generation never explodes
    * on stop-word grams. Output: doc_a, doc_b, jaccard_x1000.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 2, maxDf: Int = 20, jaccardX1000Threshold: Int = 300): DataFrame = {
    graft.functions.SketchAggregates.register(df.sparkSession)
    TextHashExpressions.register(df.sparkSession)
    val grams = df
      .select(col(idCol), split(col(textCol), " ", -1).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col(idCol),
        expr(s"shingle_hashes(toks, $n, ${TextHashing.P})").as("gs"))
    // df cap == bucket cap: a gram posting list over maxDf yields no
    // candidates (rare-gram inverted index)
    val cand = cappedCandidatePairs(
      grams.select(col(idCol), explode(col("gs")).as("g")),
      Seq(col("g")), idCol, maxDf, "doc_a", "doc_b")
    cand
      .join(grams.select(col(idCol).as("doc_a"), col("gs").as("gs_a")),
        Seq("doc_a"))
      .join(grams.select(col(idCol).as("doc_b"), col("gs").as("gs_b")),
        Seq("doc_b"))
      .withColumn("it", size(array_intersect(col("gs_a"), col("gs_b"))).cast("long"))
      .withColumn("un", size(array_distinct(concat(col("gs_a"), col("gs_b")))).cast("long"))
      .select(col("doc_a"), col("doc_b"),
        expr("(it * 1000) div un").as("jaccard_x1000"))
      .filter(col("jaccard_x1000") >= jaccardX1000Threshold)
  }

  /** 60-bit SimHash + 12-bit blocking prefix. Output: idCol, simhash,
    * block. Map-only; the whole distinct→hash→majority pipeline is one
    * native codegen'd `simhash60` call (functions.SimHash60), not the
    * interpreted HOF chain it replaces.
    */
  def simhashFingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    TextHashExpressions.register(df.sparkSession)
    df.select(col(idCol),
        call_function("simhash60", split(col(textCol), " ", -1)).as("simhash"))
      .withColumn("block", shiftright(col("simhash"), 48).cast("long"))
  }

  /** SimHash near-duplicate PAIRS with GUARANTEED recall at the
    * hamming threshold: the 60-bit fingerprint splits into
    * `hammingMax + 1` disjoint blocks, and by pigeonhole any pair
    * within `hammingMax` bit flips agrees EXACTLY on at least one
    * block — so blocking on exact block values is lossless, unlike the
    * probabilistic MinHash/hyperplane bands. Candidates come from the
    * same capped bucket aggregation as [[minhashPairs]] (same skew
    * contract, BIGINT ids); the exact `bit_count(xor)` verify touches
    * candidates only. Output: doc_a, doc_b, hamming.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      hammingMax: Int = 3, maxBucket: Int = DefaultMaxBucket): DataFrame =
    simhashPairsFromFingerprints(
      simhashFingerprint(df, idCol, textCol).select(col(idCol), col("simhash")),
      idCol, hammingMax, maxBucket)

  /** [[simhashPairs]] over a pre-computed fingerprint frame
    * (idCol, simhash). The pair generation reads the fingerprints three
    * times (band explode + both verify sides) — at scale, persist or
    * materialize the frame (2 longs/doc) and call this directly rather
    * than paying three full-corpus simhash60 scans through
    * [[simhashPairs]]'s lazy lineage.
    */
  def simhashPairsFromFingerprints(fps: DataFrame, idCol: String,
      hammingMax: Int = 3, maxBucket: Int = DefaultMaxBucket): DataFrame =
    fingerprintPairs(fps, idCol, "simhash", bits = 60,
      hammingMax = hammingMax, maxBucket = maxBucket)

  /** Pigeonhole-exact hamming pairs over ANY fixed-width bit
    * fingerprint column — the [[simhashPairsFromFingerprints]] block
    * machinery generalized to `bits` in [8, 64] so 64-bit perceptual
    * image hashes (operators.Multimodal aHash/dHash) reuse the SAME
    * lossless-recall blocking and capped-bucket skew contract as the
    * 60-bit text simhash. The fingerprint splits into `hammingMax + 1`
    * disjoint blocks; any pair within `hammingMax` bit flips agrees
    * exactly on >= 1 block. Unsigned shifts throughout: a 64-bit hash
    * with the sign bit set must not smear 1s into the high block.
    * Output: doc_a, doc_b, hamming.
    */
  def fingerprintPairs(fps: DataFrame, idCol: String, fpCol: String,
      bits: Int, hammingMax: Int = 3,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    fingerprintValidate("fingerprintPairs", idCol, fpCol, bits, hammingMax)
    val bands = fingerprintBands(fps, idCol, fpCol, bits, hammingMax)
    cappedCandidatePairs(bands, Seq(col("band"), col("bkey")),
        idCol, maxBucket, "doc_a", "doc_b")
      .join(fps.select(col(idCol).as("doc_a"), col(fpCol).as("sh_a")),
        Seq("doc_a"))
      .join(fps.select(col(idCol).as("doc_b"), col(fpCol).as("sh_b")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= hammingMax)
  }

  private[graft] def fingerprintValidate(op: String, idCol: String,
      fpCol: String, bits: Int, hammingMax: Int): Unit = {
    require(bits >= 8 && bits <= 64, s"$op: bits $bits outside [8, 64]")
    require(hammingMax >= 0 && bits / (hammingMax + 1) >= 4,
      s"$op: hammingMax $hammingMax leaves blocks under 4 bits at " +
        s"width $bits — blocking would degenerate to hot buckets")
    // the OUTPUT and working names are fixed; an id column shadowing one
    // would go ambiguous deep in the plan — fail fast instead
    val reserved = Set(fpCol, "band", "bkey", "pos", "col", "doc_a",
      "doc_b", "doc_new", "doc_old", "sh_a", "sh_b", "hamming")
    require(!reserved.contains(idCol),
      s"$op: id column '$idCol' collides with an output/working column " +
        s"(${reserved.mkString(", ")}) — rename it first")
    val fpReserved = Set(idCol, "band", "bkey", "pos", "col", "doc_a",
      "doc_b", "doc_new", "doc_old", "sh_a", "sh_b", "hamming")
    require(!fpReserved.contains(fpCol),
      s"$op: fingerprint column '$fpCol' collides with an output/" +
        s"working column (${fpReserved.mkString(", ")}) — rename it first")
  }

  /** The pigeonhole block keys of a `bits`-wide fingerprint at
    * `hammingMax`: `hammingMax + 1` disjoint blocks (the last absorbs
    * remainder bits — any disjoint partition preserves the
    * pigeonhole). Unsigned shifts throughout: a 64-bit hash with the
    * sign bit set must not smear 1s into the high block. Shared by
    * the self-join ([[fingerprintPairs]]), the incremental probe
    * ([[fingerprintPairsAgainst]]), and the streaming gate
    * ([[graft.streaming.FingerprintGate]]) — blocking only works if
    * every consumer bands identically.
    */
  private[graft] def fingerprintBlockCols(fpCol: String, bits: Int,
      hammingMax: Int): Seq[Column] = {
    val nBlocks = hammingMax + 1
    val w = bits / nBlocks
    (0 until nBlocks).map { b =>
      val lo = w * b
      val width = if (b == nBlocks - 1) bits - lo else w
      val shifted =
        if (lo == 0) col(fpCol) else shiftrightunsigned(col(fpCol), lo)
      // a full-top block needs no mask (and (1L << 64) - 1 would wrap
      // to 0); unsigned shift already zeroed everything above it
      if (lo + width >= 64) shifted
      else shifted.bitwiseAND(lit((1L << width) - 1L))
    }
  }

  /** (id, carry..., band, bkey) rows — one per pigeonhole block. */
  private[graft] def fingerprintBands(fps: DataFrame, idCol: String,
      fpCol: String, bits: Int, hammingMax: Int,
      carry: Seq[String] = Nil): DataFrame =
    fps.select(col(idCol) +: carry.map(col) :+
        posexplode(array(fingerprintBlockCols(fpCol, bits, hammingMax): _*)): _*)
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bkey")

  /** Incremental fingerprint dedup — [[minhashPairsAgainst]]'s shape
    * for the 64-bit hash modalities (text simhash, image dHash, audio
    * envelope, video majority-dHash): a DELTA of fingerprints probes
    * the CORPUS's capped pigeonhole block buckets and verifies
    * candidates by exact bit_count(xor). The corpus is never
    * self-paired; probe cost is proportional to the delta (bands
    * map-only, candidates bounded by blocks × cap per delta row).
    * Output: doc_new, doc_old, hamming (<= hammingMax). The streaming
    * twin is [[graft.streaming.FingerprintGate]] — same blocks, same
    * caps, same verify, StreamingSpec-pinned parity.
    *
    * PRECONDITION (here, the index twin, and the gate): `newFps`
    * carries each id AT MOST ONCE. Candidate pairs dedupe on
    * (doc_new, doc_old) and then re-join the delta by id, so a delta
    * holding the same id twice with DIFFERENT fingerprints would fan
    * each candidate back out into one verify row per fingerprint
    * while banding came only from whichever rows happened to band —
    * duplicate, inconsistent output, not an error. Deduplicating
    * here would cost the probe an extra delta shuffle and silently
    * pick an arbitrary fingerprint for an id that IS a data bug
    * upstream, so the contract is documented instead: re-emissions
    * must collapse before the probe (the gate's within-watermark
    * dedup handles exactly-once delivery of identical rows; differing
    * fingerprints for one id are upstream corruption either way).
    */
  def fingerprintPairsAgainst(newFps: DataFrame, corpusFps: DataFrame,
      idCol: String, fpCol: String, bits: Int, hammingMax: Int = 3,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    fingerprintValidate("fingerprintPairsAgainst", idCol, fpCol, bits,
      hammingMax)
    graft.functions.SketchAggregates.register(newFps.sparkSession)
    val buckets = bandBuckets(
      fingerprintBands(corpusFps, idCol, fpCol, bits, hammingMax),
      idCol, maxBucket)
    fingerprintBands(newFps, idCol, fpCol, bits, hammingMax)
      .join(buckets, Seq("band", "bkey"))
      .select(col(idCol).as("doc_new"), explode(col("__cs")).as("doc_old"))
      .dropDuplicates("doc_new", "doc_old")
      .join(newFps.select(col(idCol).as("doc_new"), col(fpCol).as("sh_a")),
        Seq("doc_new"))
      .join(corpusFps.select(col(idCol).as("doc_old"),
        col(fpCol).as("sh_b")), Seq("doc_old"))
      .select(col("doc_new"), col("doc_old"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= hammingMax)
  }

  /** Materialize the corpus side of [[fingerprintPairsAgainstIndex]]:
    * the [[writeMinhashIndex]] layout applied to the fingerprint
    * modalities (text simhash, image dHash, audio envelope).
    * `$path/buckets` = capped pigeonhole block buckets WITH over-cap
    * tombstones, PARTITIONED by `__bp` and (band, bkey)-sorted;
    * `$path/fps` = (doc_old, fp_old) — one Long per corpus row, never
    * payloads; `$path/meta` = prefix/cap geometry PLUS the banding
    * geometry (bits, hamming_max): a probe banding with different
    * geometry would be silently meaningless, so the geometry lives in
    * the index, not in caller code (the CDC meta contract).
    */
  def writeFingerprintIndex(corpusFps: DataFrame, idCol: String,
      fpCol: String, bits: Int, hammingMax: Int, path: String,
      maxBucket: Int = DefaultMaxBucket,
      prefixPartitions: Int = 64): Unit = {
    fingerprintValidate("writeFingerprintIndex", idCol, fpCol, bits,
      hammingMax)
    require(prefixPartitions >= 1,
      s"writeFingerprintIndex: prefixPartitions $prefixPartitions < 1")
    val s = corpusFps.sparkSession
    graft.functions.SketchAggregates.register(s)
    // both outputs consume the input frame; persisting it keeps an
    // expensive upstream lineage (e.g. a real media decode) at ONE
    // pass (the writeMinhashIndex single-scan discipline)
    val fps = corpusFps
      .select(col(idCol), col(fpCol)).persist()
    try {
      // independent tables off the shared fps cache — overlapped
      // writes (guide §2.6)
      graft.api.Par.run(
        () => graft.jobs.Sinks.layout(
          bandBucketsAll(
            fingerprintBands(fps, idCol, fpCol, bits, hammingMax),
            idCol, maxBucket)
            .withColumn("__bp", pmod(xxhash64(col("band"), col("bkey")),
              lit(prefixPartitions.toLong))),
          s"$path/buckets", partitionCols = Seq("__bp"),
          sortCols = Seq("band", "bkey"), numFiles = 8),
        () => graft.jobs.Sinks.layout(
          fps.select(col(idCol).as("doc_old"), col(fpCol).as("fp_old")),
          s"$path/fps", partitionCols = Nil,
          sortCols = Seq("doc_old"), numFiles = 8))
      writeFpMeta(s, path, prefixPartitions, maxBucket, bits, hammingMax, 1)
    } finally { fps.unpersist(); () }
  }

  private def writeFpMeta(s: org.apache.spark.sql.SparkSession,
      path: String, prefixPartitions: Int, maxBucket: Int, bits: Int,
      hammingMax: Int, layers: Int): Unit =
    s.range(1)
      .select(lit(prefixPartitions).as("prefix_partitions"),
        lit(maxBucket).as("max_bucket"), lit(bits).as("bits"),
        lit(hammingMax).as("hamming_max"), lit(layers).as("layers"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")

  /** (prefixPartitions, maxBucket, bits, hammingMax, layers) off a
    * [[writeFingerprintIndex]] meta — every field REQUIRED with a
    * named rebuild-once error (banding geometry AND cap arithmetic are
    * both correctness dependencies; there is no degraded mode).
    */
  /** [[readFpMeta]] surfaced for the streaming gate (same named-error
    * contract). */
  private[graft] def readFingerprintIndexMeta(
      s: org.apache.spark.sql.SparkSession, indexPath: String,
      op: String): (Int, Int, Int, Int, Int) =
    readFpMeta(s, indexPath, op)

  private def readFpMeta(s: org.apache.spark.sql.SparkSession,
      indexPath: String, op: String): (Int, Int, Int, Int, Int) = {
    val metaDf =
      try s.read.parquet(s"$indexPath/meta")
      catch {
        case e: Exception => throw new IllegalStateException(
          s"$op: cannot read $indexPath/meta — probes must band with " +
            "the index's own (bits, hamming_max) geometry and folds " +
            "must reproduce its prefix/cap arithmetic; the index is " +
            "missing or partially copied", e)
      }
    Seq("prefix_partitions", "max_bucket", "bits", "hamming_max")
      .foreach(c => require(metaDf.columns.contains(c),
        s"$op: $indexPath/meta lacks $c — rebuild the index once with " +
          "the current writeFingerprintIndex"))
    val row = metaDf.head(1).headOption.getOrElse(
      throw new IllegalStateException(s"$op: $indexPath/meta is empty"))
    val layers =
      if (metaDf.columns.contains("layers"))
        row.getAs[Number]("layers").intValue()
      else 1
    (row.getAs[Number]("prefix_partitions").intValue(),
      row.getAs[Number]("max_bucket").intValue(),
      row.getAs[Number]("bits").intValue(),
      row.getAs[Number]("hamming_max").intValue(), layers)
  }

  /** [[fingerprintPairsAgainst]] probing a PERSISTED
    * [[writeFingerprintIndex]]: delta fingerprints band map-only with
    * the INDEX's own geometry (read off meta — never a caller knob),
    * the `__bp` prefix list prunes the bucket parquet to only the
    * directories the delta's keys can hit, layered runs reconcile
    * through the SHARED [[mergeLayeredBuckets]] cap arithmetic over
    * just the pruned subset, and candidates verify by exact
    * bit_count(xor) against the fps parquet. Identical output to the
    * inline path on the same split (DedupSpec parity). Cost shape:
    * the BUCKETS term is prefix-pruned (directories the delta's keys
    * can hit), while the verify join reads the fps sidecar — one id +
    * one Long per corpus row, never text or payloads — so the
    * per-batch cost is O(delta work + pruned buckets + fps sidecar
    * scan); what the probe never pays is re-deriving the corpus's
    * fingerprints or banding. Output: doc_new, doc_old, hamming.
    */
  def fingerprintPairsAgainstIndex(newFps: DataFrame, idCol: String,
      fpCol: String, indexPath: String): DataFrame = {
    val s = newFps.sparkSession
    val (prefixPartitions, maxBucket, bits, hammingMax, layers) =
      readFpMeta(s, indexPath, "fingerprintPairsAgainstIndex")
    fingerprintValidate("fingerprintPairsAgainstIndex", idCol, fpCol,
      bits, hammingMax)
    val deltaBands = fingerprintBands(newFps, idCol, fpCol, bits,
      hammingMax)
    val prefixes = deltaBands
      .select(pmod(xxhash64(col("band"), col("bkey")),
        lit(prefixPartitions.toLong)).as("__bp"))
      .distinct().collect().map(_.getLong(0).toInt).toSeq
    val pruned = s.read.parquet(s"$indexPath/buckets")
      .filter(col("__bp").isin(prefixes: _*)).drop("__bp")
    val reconciled =
      (if (layers <= 1) pruned
       else mergeLayeredBuckets(pruned, maxBucket))
        .filter(col("__cs").isNotNull)
    deltaBands
      .join(reconciled, Seq("band", "bkey"))
      .select(col(idCol).as("doc_new"), explode(col("__cs")).as("doc_old"))
      .dropDuplicates("doc_new", "doc_old")
      .join(newFps.select(col(idCol).as("doc_new"), col(fpCol).as("sh_a")),
        Seq("doc_new"))
      .join(s.read.parquet(s"$indexPath/fps")
        .select(col("doc_old"), col("fp_old").as("sh_b")), Seq("doc_old"))
      .select(col("doc_new"), col("doc_old"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= hammingMax)
  }

  /** Fold a DELTA of fingerprints into a persisted index IN PLACE with
    * O(delta) write bytes: the delta's capped buckets (banded with the
    * INDEX's meta geometry) land as their own sorted layered run, fps
    * rows append, meta bumps `layers` — the
    * [[foldIntoMinhashIndex]] posture for the fingerprint family;
    * probes reconcile runs through [[mergeLayeredBuckets]]. Crash
    * consistency: single-writer, restore-on-failure (the shared fold
    * contract, [[foldIntoMinhashIndex]]).
    */
  def foldIntoFingerprintIndex(delta: DataFrame, idCol: String,
      fpCol: String, indexPath: String): Unit = {
    val s = delta.sparkSession
    graft.functions.SketchAggregates.register(s)
    val (prefixPartitions, maxBucket, bits, hammingMax, layers) =
      readFpMeta(s, indexPath, "foldIntoFingerprintIndex")
    // two appends consume the delta; one persisted pass (see
    // writeFingerprintIndex)
    val fps = delta
      .select(col(idCol), col(fpCol)).persist()
    try {
      // overlapped independent appends (guide §2.6); meta bump stays
      // after both
      graft.api.Par.run(
        () => graft.jobs.Sinks.layoutAppend(
          bandBucketsAll(
            fingerprintBands(fps, idCol, fpCol, bits, hammingMax),
            idCol, maxBucket)
            .withColumn("__bp", pmod(xxhash64(col("band"), col("bkey")),
              lit(prefixPartitions.toLong))),
          s"$indexPath/buckets", partitionCols = Seq("__bp"),
          sortCols = Seq("band", "bkey"), numFiles = 8),
        () => graft.jobs.Sinks.layoutAppend(
          fps.select(col(idCol).as("doc_old"), col(fpCol).as("fp_old")),
          s"$indexPath/fps", partitionCols = Nil,
          sortCols = Seq("doc_old"), numFiles = 8))
      writeFpMeta(s, indexPath, prefixPartitions, maxBucket, bits,
        hammingMax, layers + 1)
    } finally { fps.unpersist(); () }
  }

  /** Compact a layered fingerprint index back to ONE sorted run per
    * side (buckets reconciled through [[mergeLayeredBuckets]], fps
    * re-laid globally sorted, meta reset to layers=1) — O(index) read
    * and write, the [[compactMinhashIndex]] shape.
    */
  def compactFingerprintIndex(s: org.apache.spark.sql.SparkSession,
      indexPath: String, outPath: String): Unit = {
    require(indexPath != outPath,
      "compactFingerprintIndex: outPath must differ from indexPath")
    val (prefixPartitions, maxBucket, bits, hammingMax, _) =
      readFpMeta(s, indexPath, "compactFingerprintIndex")
    graft.functions.SketchAggregates.register(s)
    graft.jobs.Sinks.layout(
      mergeLayeredBuckets(
        s.read.parquet(s"$indexPath/buckets").drop("__bp"), maxBucket)
        .withColumn("__bp", pmod(xxhash64(col("band"), col("bkey")),
          lit(prefixPartitions.toLong))),
      s"$outPath/buckets", partitionCols = Seq("__bp"),
      sortCols = Seq("band", "bkey"), numFiles = 8)
    graft.jobs.Sinks.layout(
      s.read.parquet(s"$indexPath/fps"),
      s"$outPath/fps", partitionCols = Nil,
      sortCols = Seq("doc_old"), numFiles = 8)
    writeFpMeta(s, outPath, prefixPartitions, maxBucket, bits,
      hammingMax, 1)
  }

  /** [[maintainMinhashIndex]]'s fingerprint twin: crash-recover at
    * entry, O(delta) fold, compact-and-swap iff post-fold layers reach
    * `compactThreshold`. Returns true when this fold compacted. NOT
    * reader-safe across the swap — see
    * [[IndexMaintenance]]'s reader contract.
    */
  def maintainFingerprintIndex(delta: DataFrame, idCol: String,
      fpCol: String, indexPath: String,
      compactThreshold: Int =
        IndexMaintenance.DefaultCompactThreshold): Boolean = {
    val s = delta.sparkSession
    IndexMaintenance.withWriterLock(s, indexPath) {
      IndexMaintenance.recoverAtEntry(s, indexPath)
      foldIntoFingerprintIndex(delta, idCol, fpCol, indexPath)
      val (_, _, _, _, layers) =
        readFpMeta(s, indexPath, "maintainFingerprintIndex")
      IndexMaintenance.compactIfLayered(s, indexPath, layers,
        compactThreshold)(out => compactFingerprintIndex(s, indexPath, out))
    }
  }

  /** Exact-substring duplicate SPANS (the ExactSubstr dedup of Lee et
    * al. 2022, "Deduplicating Training Data Makes Language Models
    * Better", arXiv:2107.06499, re-expressed for Spark): every maximal
    * token interval of a document covered by `gramTokens`-token runs
    * that also appear VERBATIM in at least `minDocs` distinct
    * documents. Complements q85's passage near-dup: passages are
    * fixed 25-token chunks matched approximately; this finds exact
    * repeats at ARBITRARY offsets (license blocks, syndicated
    * sentences) at gram resolution. Grams repeated only WITHIN one doc
    * don't count (within-doc repetition is q44's job).
    *
    * Scale shape — the hash analog of the paper's suffix array, which
    * would need a global sort of every token position at 100 TB:
    *   1. gram explode + hash60 is MAP-ONLY (one row per token), and
    *      runs ONCE: the explicit repartition on the gram hash is the
    *      single exchange both consumers sit on — the distinct +
    *      count >= minDocs aggregate AND the probe side of the
    *      existence join are hash(__gh)-clustered already, so Spark
    *      reuses the one shuffle (ReusedExchange) instead of
    *      re-exploding and re-hashing the corpus per branch;
    *   2. shared positions come back via a LEFT SEMI join — pure
    *      existence, NEVER a positions x positions pair join, so a
    *      boilerplate gram in a million docs costs postings (linear),
    *      not pairs (quadratic);
    *   3. grams in MORE than `maxDocsPerGram` distinct docs are
    *      dropped from the shared set (the q21/q29 capped-bucket
    *      contract): a license block present in 10⁶ docs would
    *      otherwise ship every occurrence's positions into the
    *      island-merge window. Recall contract: over-cap grams are
    *      corpus-wide boilerplate, which the common-grams pass (q70)
    *      identifies and strips at O(n) — this operator's job is the
    *      mid-frequency exact repeats;
    *   4. the interval merge windows only the SHARED positions per
    *      doc — output-sized, not corpus-sized.
    * Two shuffles total: the gram-hash repartition and the per-doc
    * island merge. Tokenization contract: single-space split keeping
    * empty tokens (repo-wide; mirrored by DuckDB's string_split), so
    * runs of consecutive spaces form empty-token grams that can merge
    * spans across them — callers wanting whitespace-insensitive spans
    * should normalize first ([[TextOps]] normalize). Output: doc_id,
    * span_start, span_end (token offsets, end exclusive), span_tokens.
    */
  def exactSubstringSpans(df: DataFrame, idCol: String, textCol: String,
      gramTokens: Int = 8, minDocs: Int = 2,
      maxDocsPerGram: Int = 1000): DataFrame = {
    require(gramTokens >= 2, s"exactSubstringSpans: gramTokens $gramTokens < 2")
    require(minDocs >= 2, s"exactSubstringSpans: minDocs $minDocs < 2")
    require(maxDocsPerGram >= minDocs,
      s"exactSubstringSpans: maxDocsPerGram $maxDocsPerGram < minDocs " +
        s"$minDocs — the cap would reject every shared gram")
    val grams = gramPositions(df, idCol, textCol, gramTokens)
      .repartition(col("__gh"))
    val shared = grams.select(col("__gh"), col("doc_id")).distinct()
      .groupBy(col("__gh")).agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") >= minDocs && col("__nd") <= maxDocsPerGram)
      .select(col("__gh"))
    mergeSpans(grams.join(shared, Seq("__gh"), "left_semi")
      .select(col("doc_id"), col("pos")), gramTokens)
  }

  /** (doc_id, pos, __gh) token-gram position rows — the ONE definition
    * of the gram hashing (single-space split keeping empty tokens,
    * hash60 of the space-joined gram), shared by the self-join
    * ([[exactSubstringSpans]]), incremental
    * ([[exactSubstringSpansAgainst]]), and persisted-index
    * ([[writeGramIndex]] / [[exactSubstringSpansAgainstIndex]]) paths
    * so corpus and delta can never gram differently.
    */
  private[graft] def gramPositions(df: DataFrame, idCol: String,
      textCol: String, gramTokens: Int,
      extraCols: Seq[String] = Nil): DataFrame =
    gramPositionsTokens(
      Spread.ifNarrow(df.select(col(idCol).as("doc_id") +:
          extraCols.map(col) :+ col(textCol).as("__txt"): _*))
        .select(col("doc_id") +: extraCols.map(col) :+
          split(col("__txt"), " ", -1).as("__tk"): _*),
      gramTokens, extraCols)

  /** [[gramPositions]] off a PRE-SPLIT frame carrying
    * (doc_id, extraCols..., __tk) — the streaming gate tokenizes once
    * for both its gram-less-branch length check and the gram explode
    * instead of paying the split twice per micro-batch. One body
    * behind both entry points.
    */
  private[graft] def gramPositionsTokens(pre: DataFrame, gramTokens: Int,
      extraCols: Seq[String] = Nil): DataFrame = {
    val extras = extraCols.map(col)
    pre.filter(size(col("__tk")) >= gramTokens)
      .select(col("doc_id") +: extras :+
        explode(sequence(lit(0), size(col("__tk")) - gramTokens)).as("__p") :+
        col("__tk"): _*)
      .select(col("doc_id") +: extras :+
        col("__p").cast("long").as("pos") :+
        TextHashing.hash60(concat_ws(" ",
          slice(col("__tk"), col("__p") + 1, lit(gramTokens))))
          .as("__gh"): _*)
  }

  /** The island-merge back half: maximal intervals over covered
    * positions — intervals [p, p+k) sorted by start merge iff
    * next − prev <= k (overlap or exact adjacency = contiguous
    * duplicated coverage). Windows only the SHARED positions per doc
    * (output-sized, not corpus-sized). Output: doc_id, span_start,
    * span_end, span_tokens.
    */
  private def mergeSpans(positions: DataFrame, gramTokens: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    positions
      .withColumn("__brk",
        when(lag(col("pos"), 1).over(w).isNull ||
          col("pos") - lag(col("pos"), 1).over(w) > gramTokens, 1L)
          .otherwise(0L))
      .withColumn("__grp", sum(col("__brk")).over(w))
      .groupBy(col("doc_id"), col("__grp"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + gramTokens).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("span_tokens"))
  }

  /** Exact-substring DECONTAMINATION spans — [[exactSubstringSpans]]'s
    * incremental posture (the q59/q91 train-vs-delta split applied to
    * ExactSubstr): every maximal token interval of a NEW document
    * covered by `gramTokens`-token runs that appear VERBATIM in at
    * least `minCorpusDocs` CORPUS documents. minCorpusDocs defaults to
    * 1 — "appears anywhere in the training corpus" is the
    * decontamination question; the self-join's minDocs >= 2 exists
    * because there a gram trivially appears in its own document.
    * Grams in more than `maxDocsPerGram` CORPUS docs are dropped (the
    * capped contract — corpus-wide boilerplate is q70's O(n) job).
    * The corpus is never self-paired and the delta never counts toward
    * the threshold; at 100 TB the corpus side is materialized once
    * ([[writeGramIndex]]) and probed per ingest batch
    * ([[exactSubstringSpansAgainstIndex]]). Output: doc_id (the NEW
    * doc), span_start, span_end, span_tokens.
    */
  def exactSubstringSpansAgainst(newDf: DataFrame, corpusDf: DataFrame,
      idCol: String, textCol: String, gramTokens: Int = 8,
      minCorpusDocs: Int = 1, maxDocsPerGram: Int = 1000): DataFrame = {
    require(gramTokens >= 2,
      s"exactSubstringSpansAgainst: gramTokens $gramTokens < 2")
    require(minCorpusDocs >= 1,
      s"exactSubstringSpansAgainst: minCorpusDocs $minCorpusDocs < 1")
    require(maxDocsPerGram >= minCorpusDocs,
      s"exactSubstringSpansAgainst: maxDocsPerGram $maxDocsPerGram < " +
        s"minCorpusDocs $minCorpusDocs — the cap would reject every gram")
    val shared = gramPositions(corpusDf, idCol, textCol, gramTokens)
      .select(col("__gh"), col("doc_id")).distinct()
      .groupBy(col("__gh")).agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") >= minCorpusDocs && col("__nd") <= maxDocsPerGram)
      .select(col("__gh"))
    mergeSpans(
      gramPositions(newDf, idCol, textCol, gramTokens)
        .join(shared, Seq("__gh"), "left_semi")
        .select(col("doc_id"), col("pos")), gramTokens)
  }

  /** Materialize the corpus side of [[exactSubstringSpansAgainst]] to
    * parquet — the SEVENTH persisted index family, and the simplest:
    * `$path/grams` = (gh, n_docs) per-gram distinct-corpus-doc COUNTS,
    * partitioned by `__gp = hash60-mod-prefixPartitions` (the `__bp`
    * prefix-pruning discipline) and sorted by gh; `$path/meta` carries
    * the gram geometry (gram_tokens, prefix_partitions, layers). RAW
    * counts are stored — the probe applies min/cap thresholds at read,
    * so one index serves any (minCorpusDocs, maxDocsPerGram) policy.
    * Build once per corpus version, probe per ingest batch.
    */
  def writeGramIndex(corpus: DataFrame, idCol: String, textCol: String,
      path: String, gramTokens: Int = 8,
      prefixPartitions: Int = 64): Unit = {
    require(gramTokens >= 2, s"writeGramIndex: gramTokens $gramTokens < 2")
    val run = IndexMaintenance.newRunId()
    graft.jobs.Sinks.layout(
      gramPositions(corpus, idCol, textCol, gramTokens)
        .select(col("__gh").as("gh"), col("doc_id")).distinct()
        .groupBy(col("gh")).agg(count(lit(1)).as("n_docs"))
        .withColumn("__gp", pmod(col("gh"), lit(prefixPartitions.toLong)))
        .withColumn("__run", lit(run)),
      s"$path/grams", partitionCols = Seq("__gp"),
      sortCols = Seq("gh"), numFiles = 8)
    writeGramMeta(corpus.sparkSession, path, gramTokens, prefixPartitions,
      1, Seq(run))
  }

  // the gram family's richer meta (gram geometry) carries the same
  // committed-run manifest as the shared SUM-family meta
  // (IndexMaintenance.writeIndexMetaRuns) — reads filter to committed
  // runs, so the append-before-commit crash window is structural here
  // too
  private[graft] def writeGramMeta(s: org.apache.spark.sql.SparkSession,
      path: String, gramTokens: Int, prefixPartitions: Int,
      layers: Int, runs: Seq[String]): Unit = {
    require(runs.nonEmpty, "writeGramMeta: empty run manifest")
    s.range(1)
      .select(lit(gramTokens).as("gram_tokens"),
        lit(prefixPartitions).as("prefix_partitions"),
        lit(layers).as("layers"),
        array(runs.map(lit(_)): _*).as("committed_runs"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** (gramTokens, prefixPartitions, layers, committedRuns) off a
    * [[writeGramIndex]] meta — REQUIRED with a named rebuild-once
    * error (the delta must gram with the index's own geometry;
    * mismatched gram widths would silently match nothing).
    */
  private[graft] def readGramMeta(s: org.apache.spark.sql.SparkSession,
      indexPath: String, op: String): (Int, Int, Int, Seq[String]) = {
    val metaDf =
      try s.read.parquet(s"$indexPath/meta")
      catch {
        case e: Exception => throw new IllegalStateException(
          s"$op: cannot read $indexPath/meta — probes and folds must " +
            "use the index's own gram geometry (indexes written before " +
            "the meta existed must be rebuilt once)", e)
      }
    val row = metaDf.head(1).headOption.getOrElse(
      throw new IllegalStateException(s"$op: $indexPath/meta is empty"))
    (row.getAs[Number]("gram_tokens").intValue(),
      row.getAs[Number]("prefix_partitions").intValue(),
      row.getAs[Number]("layers").intValue(),
      IndexMaintenance.committedRunsOf(s, indexPath, op))
  }

  /** Fold a DELTA of new documents into a persisted [[writeGramIndex]]
    * IN PLACE with O(delta) write bytes: the delta's per-gram
    * distinct-doc counts land as their own sorted run, meta bumps
    * `layers`. Reconcile is EXACT BY ADDITIVITY — delta doc ids are
    * disjoint from indexed ids (the incremental contract everywhere in
    * this api), so the total distinct-doc count of a gram is simply
    * the SUM of its per-run counts; no cap arithmetic or tombstones
    * exist in this family because the cap is a PROBE-side threshold
    * over the reconciled total, not a storage contract. Crash
    * consistency: the run lands under a fresh `__run` id and the meta
    * — written AFTER the append — commits it: a crash between append
    * and commit leaves orphan files every reader filters out, and the
    * retry's fresh id can never merge with them (RecoverySpec pins
    * it). Single-writer still governs (the lock).
    */
  def foldIntoGramIndex(delta: DataFrame, idCol: String, textCol: String,
      indexPath: String): Unit = {
    val s = delta.sparkSession
    val (gramTokens, prefixPartitions, layers, runs) =
      readGramMeta(s, indexPath, "foldIntoGramIndex")
    val run = IndexMaintenance.newRunId()
    graft.jobs.Sinks.layoutAppend(
      gramPositions(delta, idCol, textCol, gramTokens)
        .select(col("__gh").as("gh"), col("doc_id")).distinct()
        .groupBy(col("gh")).agg(count(lit(1)).as("n_docs"))
        .withColumn("__gp", pmod(col("gh"), lit(prefixPartitions.toLong)))
        .withColumn("__run", lit(run)),
      s"$indexPath/grams", partitionCols = Seq("__gp"),
      sortCols = Seq("gh"), numFiles = 8)
    writeGramMeta(s, indexPath, gramTokens, prefixPartitions, layers + 1,
      runs :+ run)
  }

  /** Compact a layered gram index back to ONE sorted run: per-gram
    * counts summed across COMMITTED runs (the exact reconcile
    * arithmetic — orphan rows from crashed folds are dropped from
    * disk here), meta reset to layers=1 with a single-run manifest.
    * Identical probe results before and after.
    */
  def compactGramIndex(s: org.apache.spark.sql.SparkSession,
      indexPath: String, outPath: String): Unit = {
    require(indexPath != outPath,
      "compactGramIndex: outPath must differ from indexPath")
    val (gramTokens, prefixPartitions, _, runs) =
      readGramMeta(s, indexPath, "compactGramIndex")
    val run = IndexMaintenance.newRunId()
    graft.jobs.Sinks.layout(
      IndexMaintenance.committedOnly(
          s.read.parquet(s"$indexPath/grams").drop("__gp"), runs)
        .groupBy(col("gh")).agg(sum(col("n_docs")).as("n_docs"))
        .withColumn("__gp", pmod(col("gh"), lit(prefixPartitions.toLong)))
        .withColumn("__run", lit(run)),
      s"$outPath/grams", partitionCols = Seq("__gp"),
      sortCols = Seq("gh"), numFiles = 8)
    writeGramMeta(s, outPath, gramTokens, prefixPartitions, 1, Seq(run))
  }

  /** [[maintainMinhashIndex]]'s gram-count twin: crash-recover at
    * entry, O(delta) fold, compact-and-swap iff post-fold layers reach
    * `compactThreshold`. All inside [[IndexMaintenance.withWriterLock]];
    * NOT reader-safe across the swap.
    */
  def maintainGramIndex(delta: DataFrame, idCol: String, textCol: String,
      indexPath: String,
      compactThreshold: Int =
        IndexMaintenance.DefaultCompactThreshold): Boolean = {
    val s = delta.sparkSession
    IndexMaintenance.withWriterLock(s, indexPath) {
      IndexMaintenance.recoverAtEntry(s, indexPath)
      foldIntoGramIndex(delta, idCol, textCol, indexPath)
      val (_, _, layers, _) =
        readGramMeta(s, indexPath, "maintainGramIndex")
      IndexMaintenance.compactIfLayered(s, indexPath, layers,
        compactThreshold)(out => compactGramIndex(s, indexPath, out))
    }
  }

  /** [[exactSubstringSpansAgainst]] probing a PERSISTED
    * [[writeGramIndex]]: the delta's grams derive with the INDEX's own
    * geometry (meta-required), the delta's distinct `__gp` prefixes
    * become an `isin` literal the scan planner turns into partition-
    * directory pruning (decisive for the primary use — an eval set's
    * handful of documents touches a handful of prefixes, never the
    * corpus-wide gram table), layered runs reconcile by per-gram SUM,
    * and the min/cap thresholds apply to the reconciled totals. Output
    * identical to the inline path on the same split (DedupSpec parity;
    * q150 gates fold==rebuild on the driver's hash).
    */
  def exactSubstringSpansAgainstIndex(newDf: DataFrame, idCol: String,
      textCol: String, indexPath: String, minCorpusDocs: Int = 1,
      maxDocsPerGram: Int = 1000): DataFrame = {
    require(minCorpusDocs >= 1,
      s"exactSubstringSpansAgainstIndex: minCorpusDocs $minCorpusDocs < 1")
    require(maxDocsPerGram >= minCorpusDocs,
      s"exactSubstringSpansAgainstIndex: maxDocsPerGram $maxDocsPerGram " +
        s"< minCorpusDocs $minCorpusDocs — the cap would reject every gram")
    val s = newDf.sparkSession
    val (gramTokens, prefixPartitions, layers, runs) =
      readGramMeta(s, indexPath, "exactSubstringSpansAgainstIndex")
    val deltaGrams = gramPositions(newDf, idCol, textCol, gramTokens)
    val prefixes = deltaGrams
      .select(pmod(col("__gh"), lit(prefixPartitions.toLong)).as("__gp"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val pruned = IndexMaintenance.committedOnly(
      s.read.parquet(s"$indexPath/grams")
        .filter(col("__gp").isin(prefixes: _*)).drop("__gp"), runs)
    val shared = reconcileGramRuns(pruned, layers)
      .filter(col("n_docs") >= minCorpusDocs &&
        col("n_docs") <= maxDocsPerGram)
      .select(col("gh").as("__gh"))
    mergeSpans(deltaGrams.join(shared, Seq("__gh"), "left_semi")
      .select(col("doc_id"), col("pos")), gramTokens)
  }

  /** Layered-run reconcile for the gram index — per-gram counts SUM
    * across runs (exact by additivity); ONE definition shared by the
    * batch probe and the streaming gate's author-time read (the
    * reconcileLineRuns discipline).
    */
  private[graft] def reconcileGramRuns(raw: DataFrame,
      layers: Int): DataFrame =
    if (layers <= 1) raw
    else raw.groupBy(col("gh")).agg(sum(col("n_docs")).as("n_docs"))

  /** Transitive near-dup clusters over a pair frame. Output: doc_id,
    * cluster_id (= component min). See ConnectedComponents for rounds.
    */
  def clusters(pairs: DataFrame, leftCol: String = "doc_a",
      rightCol: String = "doc_b"): DataFrame =
    ConnectedComponents.minLabel(pairs, leftCol, rightCol)
      .select(col("id").as("doc_id"), col("cluster_id"))

  /** Quality-aware keeper selection: one row per cluster, keeping the
    * member with the highest score (ties → smallest id), plus the
    * member count. Replaces min-id keeper choice when a quality signal
    * exists (keep the longest/cleanest copy, not the lexically first).
    * One hash-aggregate over the (tiny) cluster assignment — the
    * custom `latest_by` argmax on a (score, -id) struct, so no
    * per-cluster sort or window (built-in max_by's struct buffer would
    * demote the whole aggregation to SortAggregate).
    *
    * @param scored (id, cluster, score) rows — typically [[clusters]]
    *               joined to a quality column.
    */
  def keepersByScore(scored: DataFrame, idCol: String, clusterCol: String,
      scoreCol: String): DataFrame = {
    graft.functions.SketchAggregates.register(scored.sparkSession)
    scored.groupBy(col(clusterCol))
      .agg(
        call_function("latest_by", col(idCol),
          struct(col(scoreCol), -col(idCol))).as("keeper_id"),
        count(lit(1)).as("n_members"),
        max(col(scoreCol)).as("keeper_score"))
  }

  /** Incremental crawl merge with source precedence:
    * preferred ∪ (secondary ∖ content-digests(preferred)) — when the
    * same content exists in both corpora, the preferred copy wins and
    * the secondary copy never enters. The union step of a re-crawl /
    * multi-source ingest, upstream of near-dup passes.
    *
    * Content identity is the md5 digest of the text column — unhex'd
    * to its raw 16 BYTES (Spark's md5() returns a 32-char hex string;
    * joining on that would shuffle and compare 32+ bytes per row) —
    * so the anti-join shuffles 16-byte binary digests plus the
    * secondary payload, co-partitioned on the digest; the preferred
    * corpus contributes only its digest column to the join.
    */
  def unionWithPrecedence(preferred: DataFrame, secondary: DataFrame,
      textCol: String): DataFrame = {
    def dg = unhex(md5(col(textCol).cast("binary")))
    val pd = preferred.select(dg.as("_dg")).distinct()
    preferred.unionByName(
      secondary.withColumn("_dg", dg)
        .join(pd, Seq("_dg"), "left_anti")
        .drop("_dg"))
  }

  /** Corpus-version diff by content digest — the what-changed-between-
    * crawls audit ([[graft.api.EventOps.snapshotDiff]]'s discipline
    * applied to document content): per id, `added` (only in v2),
    * `removed` (only in v1), `changed` (both, digests differ),
    * `unchanged`. Presence is detected by MARKER columns, never
    * payload null-ness (a null text must not read as absence), and
    * identity is the 16-byte raw md5 digest (unhex'd — the
    * [[unionWithPrecedence]] rationale: the join and compare carry 16
    * bytes, not document bodies). One co-partitioned full-outer hash
    * join on the id; `carry` columns come back coalesced v2-first
    * (the newer crawl names the row).
    */
  def corpusDiff(v1: DataFrame, v2: DataFrame, idCol: String,
      textCol: String, carry: Seq[String] = Nil): DataFrame = {
    def side(df: DataFrame, tag: String) =
      df.select(col(idCol) +:
        (carry.map(c => col(c).as(s"${c}__$tag")) ++
          Seq(unhex(md5(col(textCol).cast("binary"))).as(s"_d$tag"),
            lit(true).as(s"_in$tag"))): _*)
    side(v1, "1").join(side(v2, "2"), Seq(idCol), "full_outer")
      .select(col(idCol) +:
        (carry.map(c => coalesce(col(s"${c}__2"), col(s"${c}__1")).as(c)) ++
          Seq(when(col("_in1").isNull, lit("added"))
            .when(col("_in2").isNull, lit("removed"))
            .when(col("_d1") === col("_d2"), lit("unchanged"))
            .otherwise(lit("changed")).as("status"))): _*)
  }

  /** The dedup pipeline's consumable output: the corpus minus every doc
    * appearing as the higher id of a near-dup pair (pair-wise form; use
    * [[clusters]] keepers for chain-exact dedup).
    */
  def dropNearDuplicates(df: DataFrame, idCol: String,
      pairs: DataFrame): DataFrame =
    df.join(broadcast(pairs.select(col("doc_b").as(idCol)).distinct()),
      Seq(idCol), "left_anti")

  /** The three stages of the end-to-end dedup, all reading ONE
    * materialized pair list (see [[pipeline]]).
    */
  case class DedupPipeline(pairs: DataFrame, clusters: DataFrame,
      deduped: DataFrame)

  /** End-to-end dedup with the pair list computed ONCE: the LSH pair
    * scan ([[minhashPairs]]) is materialized to `pairsPath` as sorted
    * parquet, and both consumers — transitive [[clusters]] and the
    * [[dropNearDuplicates]] corpus — read the persisted list instead of
    * re-deriving the whole LSH DAG (what running q37 and q46
    * independently costs). At 100TB the pair list is tiny next to the
    * corpus, so persisting it turns clusters+keepers into two cheap
    * reads; the iterative clustering in particular re-reads its edges
    * once per round, which must never mean one LSH pass per round. The
    * in-file sort by (doc_a, doc_b) gives downstream point-reads
    * row-group pruning, and the keeper anti-join's scan prunes to the
    * single doc_b column (PlanSpec-style assertion in DedupSpec).
    */
  def pipeline(df: DataFrame, idCol: String, textCol: String,
      pairsPath: String, jaccardX1000Threshold: Int = 500,
      maxBucket: Int = DefaultMaxBucket, numFiles: Int = 8): DedupPipeline = {
    graft.jobs.Sinks.layout(
      minhashPairs(df, idCol, textCol, jaccardX1000Threshold, maxBucket),
      pairsPath, partitionCols = Nil, sortCols = Seq("doc_a", "doc_b"),
      numFiles = numFiles)
    val persisted = df.sparkSession.read.parquet(pairsPath)
    DedupPipeline(persisted, clusters(persisted),
      dropNearDuplicates(df, idCol, persisted))
  }

  // ---- content-defined-chunk incremental dedup (the exact-passage ---
  // ---- sibling of the minhash/sign probe family) --------------------

  /** (idCol, extraCols..., `_ch` = distinct CDC chunk hashes) per doc
    * — the shared front end of [[cdcChunkHits]], the index
    * build/probe, AND the streaming gate ([[graft.streaming.CdcGate]]
    * passes its event-time column through `extraCols`), via the fused
    * native `cdc_chunk_hashes` kernel. The null contract lives HERE
    * and only here: null text keeps its row with an empty array.
    */
  private[graft] def cdcChunked(df: DataFrame, idCol: String,
      textCol: String, modulus: Int, window: Int,
      extraCols: Seq[String] = Nil): DataFrame = {
    TextHashExpressions.register(df.sparkSession)
    df.select(col(idCol) +: extraCols.map(col) :+
        split(col(textCol), " ", -1).as("_tk"): _*)
      .withColumn("_ch",
        when(col("_tk").isNotNull,
          expr(s"cdc_chunk_hashes(_tk, $window, $modulus)"))
          .otherwise(expr("cast(array() as array<bigint>)")))
      .select(col(idCol) +: extraCols.map(col) :+ col("_ch"): _*)
  }

  /** Incremental exact-passage dedup: which CDC chunks of a NEW batch
    * already exist anywhere in the corpus — the content-defined twin
    * of [[minhashPairsAgainst]] (doc-level fuzzy) and the passage gate
    * (fixed windows): boundary-shift-robust, exact at chunk
    * granularity. Output per delta doc: idCol, n_chunks, n_hits
    * (chunks present in the corpus's chunk set), hit_x1000.
    *
    * Scale shape: both sides travel as 60-bit chunk hashes (never
    * text); the corpus chunk SET is a distinct over the exploded
    * postings (map-side partial distinct), the delta semi-joins it
    * co-partitioned on the hash, and the per-doc rollup keys the
    * delta id. At 100 TB the corpus side is materialized once by
    * [[writeCdcChunkIndex]] and every batch pays only
    * [[cdcChunkHitsAgainstIndex]]'s O(delta + pruned index scan).
    */
  def cdcChunkHits(newDf: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String, modulus: Int = 64, window: Int = 4): DataFrame = {
    val delta = cdcChunked(newDf, idCol, textCol, modulus, window)
    val corpusSet = cdcChunked(corpus, idCol, textCol, modulus, window)
      .select(explode(col("_ch")).as("_c")).distinct()
    cdcHitsRollup(delta, corpusSet, idCol)
  }

  private def cdcHitsRollup(delta: DataFrame, corpusSet: DataFrame,
      idCol: String): DataFrame = {
    val posting = delta.select(col(idCol), explode(col("_ch")).as("_c"))
    val hits = posting.join(corpusSet, Seq("_c"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("_nh"))
    delta.select(col(idCol), size(col("_ch")).cast("long").as("n_chunks"))
      .join(hits, Seq(idCol), "left")
      .withColumn("n_hits", coalesce(col("_nh"), lit(0L)))
      .withColumn("hit_x1000",
        when(col("n_chunks") > 0,
          expr("(n_hits * 1000) div n_chunks")).otherwise(lit(0L)))
      .select(col(idCol), col("n_chunks"), col("n_hits"), col("hit_x1000"))
  }

  /** Materialize the corpus side of [[cdcChunkHitsAgainstIndex]]:
    * `$path/chunks` = the corpus's DISTINCT chunk hashes PARTITIONED
    * by `__bp = xxhash64(c) mod prefixPartitions` and sorted by `c`
    * within partitions (directory-level pruning + row-group min/max,
    * the [[writeMinhashIndex]] layout applied to a plain hash set);
    * `$path/meta` = one row recording prefix_partitions AND the
    * chunking parameters (modulus, window) so a probe chunks with
    * EXACTLY the index's geometry — a CDC probe against an index
    * built with different parameters would be silently meaningless,
    * which is why the params live in the index, not in caller code.
    */
  def writeCdcChunkIndex(corpus: DataFrame, idCol: String, textCol: String,
      path: String, modulus: Int = 64, window: Int = 4,
      prefixPartitions: Int = 64): Unit = {
    require(prefixPartitions >= 1,
      s"writeCdcChunkIndex: prefixPartitions $prefixPartitions < 1")
    graft.jobs.Sinks.layout(
      cdcChunked(corpus, idCol, textCol, modulus, window)
        .select(explode(col("_ch")).as("c")).distinct()
        .withColumn("__bp",
          pmod(xxhash64(col("c")), lit(prefixPartitions.toLong))),
      s"$path/chunks", partitionCols = Seq("__bp"),
      sortCols = Seq("c"), numFiles = 8)
    writeCdcMeta(corpus.sparkSession, path, prefixPartitions, modulus,
      window, 1)
  }

  /** Fold a DELTA of new documents into a persisted
    * [[writeCdcChunkIndex]] IN PLACE with O(delta) write bytes — the
    * CDC sibling of the in-place [[foldIntoMinhashIndex]], simpler on
    * BOTH sides because the index is a plain distinct hash set: the
    * delta's distinct chunk hashes land as their own sorted run
    * ([[graft.jobs.Sinks.layoutAppend]]) inside the existing `__bp`
    * directories, chunked with EXACTLY the index's meta geometry, and
    * the read side needs NO reconcile at all — the probe's corpus set
    * feeds a `left_semi` join ([[cdcHitsRollup]]), which is
    * duplicate-insensitive, so a chunk appearing in two runs changes
    * nothing. `layers` in meta counts the runs; periodic
    * [[compactCdcChunkIndex]] re-distincts them into one (pure read
    * amplification cleanup, never a correctness event). Crash
    * consistency: single-writer, restore-on-failure, never retry in
    * place — see [[foldIntoMinhashIndex]]'s contract note.
    */
  def foldIntoCdcChunkIndex(delta: DataFrame, idCol: String,
      textCol: String, indexPath: String): Unit = {
    val s = delta.sparkSession
    val (prefixes, modulus, window) = readCdcMeta(s, indexPath)
    val layers = readCdcLayers(s, indexPath)
    graft.jobs.Sinks.layoutAppend(
      cdcChunked(delta, idCol, textCol, modulus, window)
        .select(explode(col("_ch")).as("c")).distinct()
        .withColumn("__bp", pmod(xxhash64(col("c")), lit(prefixes.toLong))),
      s"$indexPath/chunks", partitionCols = Seq("__bp"),
      sortCols = Seq("c"), numFiles = 8)
    writeCdcMeta(s, indexPath, prefixes, modulus, window, layers + 1)
  }

  /** Fold-and-COMPACT variant: old chunk set ∪ delta chunk set
    * re-distincted into a fresh single-run index at `outPath` —
    * O(index) read and write, the right shape when fold cadence ==
    * compaction cadence. Chunked with exactly the old index's meta
    * geometry (a fold with different modulus/window would be silently
    * meaningless, the probe's contract applied to maintenance).
    * Probes identically to a from-scratch build on corpus ∪ delta
    * (DedupSpec parity).
    */
  def foldIntoCdcChunkIndex(delta: DataFrame, idCol: String,
      textCol: String, indexPath: String, outPath: String): Unit = {
    require(indexPath != outPath,
      "foldIntoCdcChunkIndex: outPath must differ from indexPath")
    val s = delta.sparkSession
    val (prefixes, modulus, window) = readCdcMeta(s, indexPath)
    val deltaChunks = cdcChunked(delta, idCol, textCol, modulus, window)
      .select(explode(col("_ch")).as("c"))
    graft.jobs.Sinks.layout(
      s.read.parquet(s"$indexPath/chunks").select(col("c"))
        .unionByName(deltaChunks).distinct()
        .withColumn("__bp", pmod(xxhash64(col("c")), lit(prefixes.toLong))),
      s"$outPath/chunks", partitionCols = Seq("__bp"),
      sortCols = Seq("c"), numFiles = 8)
    writeCdcMeta(s, outPath, prefixes, modulus, window, 1)
  }

  /** [[maintainMinhashIndex]]'s CDC twin: O(delta) fold, then
    * compact-and-swap iff post-fold layers ≥ `compactThreshold`.
    * Returns true when this fold triggered the compaction.
    */
  def maintainCdcChunkIndex(delta: DataFrame, idCol: String,
      textCol: String, indexPath: String,
      compactThreshold: Int =
        IndexMaintenance.DefaultCompactThreshold): Boolean = {
    val s = delta.sparkSession
    IndexMaintenance.withWriterLock(s, indexPath) {
      IndexMaintenance.recoverAtEntry(s, indexPath)
      foldIntoCdcChunkIndex(delta, idCol, textCol, indexPath)
      IndexMaintenance.compactIfLayered(s, indexPath,
        readCdcLayers(s, indexPath), compactThreshold)(
        out => compactCdcChunkIndex(s, indexPath, out))
    }
  }

  /** Compact a layered CDC index (in-place [[foldIntoCdcChunkIndex]]
    * appends) back to one globally distinct sorted run — O(index)
    * read/write, pure read-amplification cleanup (layered and
    * compacted indexes probe identically; the semi-join never saw
    * the duplicates).
    */
  def compactCdcChunkIndex(s: org.apache.spark.sql.SparkSession,
      indexPath: String, outPath: String): Unit = {
    require(indexPath != outPath,
      "compactCdcChunkIndex: outPath must differ from indexPath")
    val (prefixes, modulus, window) = readCdcMeta(s, indexPath)
    graft.jobs.Sinks.layout(
      s.read.parquet(s"$indexPath/chunks").select(col("c")).distinct()
        .withColumn("__bp", pmod(xxhash64(col("c")), lit(prefixes.toLong))),
      s"$outPath/chunks", partitionCols = Seq("__bp"),
      sortCols = Seq("c"), numFiles = 8)
    writeCdcMeta(s, outPath, prefixes, modulus, window, 1)
  }

  private def writeCdcMeta(s: org.apache.spark.sql.SparkSession,
      path: String, prefixes: Int, modulus: Int, window: Int,
      layers: Int): Unit =
    s.range(1)
      .select(lit(prefixes).as("prefix_partitions"),
        lit(modulus).as("modulus"), lit(window).as("window"),
        lit(layers).as("layers"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")

  /** `layers` off a CDC index meta (default 1 — pre-layering indexes
    * lack the column). Observability only for CDC: probes are
    * duplicate-insensitive regardless.
    */
  private def readCdcLayers(s: org.apache.spark.sql.SparkSession,
      indexPath: String): Int =
    try {
      val m = s.read.parquet(s"$indexPath/meta")
      if (m.columns.contains("layers"))
        m.head(1).headOption.map(_.getAs[Number]("layers").intValue())
          .getOrElse(1)
      else 1
    } catch { case _: Exception => 1 }

  /** [[cdcChunkHits]] probing a PERSISTED [[writeCdcChunkIndex]]
    * instead of re-chunking the corpus: identical output on the same
    * split (parity-tested), per-batch cost O(delta + pruned index
    * scan). The delta's distinct `__bp` prefixes (at most
    * prefix_partitions ints, collected driver-side) prune the chunk
    * parquet to the directories its hashes can hit; the `c` sort
    * prunes row groups within them. The meta is REQUIRED — it carries
    * the chunking geometry — so a missing/partial index fails with a
    * named error rather than probing with guessed parameters (the
    * minhash/sign probes converged on the same posture once layered
    * folds made the layer count a correctness input).
    */
  /** (prefix_partitions, modulus, window) off a [[writeCdcChunkIndex]]
    * meta — REQUIRED (it carries the chunking geometry): named error
    * on a missing/partial index, never a guessed-parameter probe.
    */
  private[graft] def readCdcMeta(s: org.apache.spark.sql.SparkSession,
      indexPath: String): (Int, Int, Int) = {
    val meta =
      try {
        s.read.parquet(s"$indexPath/meta")
          .select(col("prefix_partitions").cast("int"),
            col("modulus").cast("int"), col("window").cast("int"))
          .head(1).headOption
      } catch {
        case e: Exception =>
          throw new IllegalStateException(
            s"cdc probe: cannot read $indexPath/meta — the index is " +
              "missing or partially copied; the meta carries the " +
              "chunking geometry (modulus, window), so probing " +
              "without it would be silently meaningless", e)
      }
    val row = meta.getOrElse(throw new IllegalStateException(
      s"cdc probe: $indexPath/meta is empty"))
    (row.getInt(0), row.getInt(1), row.getInt(2))
  }

  def cdcChunkHitsAgainstIndex(newDf: DataFrame, idCol: String,
      textCol: String, indexPath: String): DataFrame = {
    val s = newDf.sparkSession
    val (prefixes, modulus, window) = readCdcMeta(s, indexPath)
    val delta = cdcChunked(newDf, idCol, textCol, modulus, window)
      .localCheckpoint() // consumed twice (prefix list + rollup)
    val touched = delta.select(explode(col("_ch")).as("_c"))
      .select(pmod(xxhash64(col("_c")), lit(prefixes.toLong)).as("__bp"))
      .distinct().collect().map(_.getLong(0))
    val corpusSet = s.read.parquet(s"$indexPath/chunks")
      .filter(col("__bp").isin(touched.toSeq: _*))
      .select(col("c").as("_c"))
    cdcHitsRollup(delta, corpusSet, idCol)
  }
}

package graft.api

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Opportunistic compaction for the layered persisted indexes
  * (minhash / CDC / sign / BM25 / fingerprint / IVF-PQ /
  * gram-count): the in-place
  * `foldInto*` appends are O(delta) by design, so layer count — and
  * with it per-probe reconcile work and file-open fan-out — grows one
  * run per fold until a `compact*` folds the runs back to one. The
  * `maintain*` entry points in each ops object wrap
  * fold-then-compact-if-layered around this policy, turning the LSM
  * posture ("append daily, compact weekly") into a single call whose
  * amortized cost is O(delta + index/threshold) writes per fold.
  *
  * IVF-PQ is under the policy with one structural difference: its fold
  * never rewrites `meta` (the frozen-codebook contract that makes
  * fold-while-serving safe — [[VectorOps.ivfPqProbeEachBatch]] caches
  * the model at stream-author time), so its run count lives in a
  * `runs` sidecar no probe path reads, and its compaction is a pure
  * re-layout: codes runs need no read-side reconcile (per-vector rows,
  * disjoint ids) and probes prune by `cell` DIRECTORY, so what
  * [[VectorOps.maintainIvfPqIndex]] buys is file-count — every fold
  * adds up to `numFiles` files inside each routed cell, and a
  * cell-pruned scan over an uncompacted year of daily folds opens
  * 365× the files one run needs.
  *
  * Compaction-in-place mechanics: `compact*` contracts require a
  * fresh output directory (the merge reads the old index lazily while
  * writing the new one), so the swap goes through two siblings —
  * compact to `<index>__compacting`, rename the live index to
  * `<index>__old`, rename the fresh one into place, delete the old.
  * Directory rename is a metadata op on HDFS-like filesystems; on a
  * pure object store the same swap is a manifest flip in a
  * transactional table layout, out of scope here (same position as
  * the fold crash contract, [[DedupOps.foldIntoMinhashIndex]]).
  * Crash consistency inherits that contract — single-writer,
  * restore-on-failure: a crash between the two renames leaves the
  * index path briefly absent, and every `maintain*` entry point runs
  * [[recoverAtEntry]] FIRST (before its fold): a missing live path
  * with an `__old` sibling restores `__old` into place, and stale
  * `__compacting`/`__old` siblings are deleted UNCONDITIONALLY — a
  * crashed attempt can neither strand the index absent nor leave a
  * full-size copy lingering while folds stay under the threshold.
  *
  * READER CONTRACT: the swap is NOT reader-safe. A probe running
  * concurrently sees a briefly-absent path between the renames, and a
  * probe that listed files pre-swap can hit deleted files after the
  * old copy is removed. Quiesce probes across any maintain* call that
  * may compact (layer count at threshold), or gate the call behind
  * the serving layer's lock. This is deliberately WEAKER than the
  * IVF-PQ serving path ([[VectorOps.ivfPqProbeEachBatch]] is
  * fold-while-serving safe because IVF-PQ folds never rewrite meta
  * and never delete files) — the difference is visible at the call
  * site: maintain* families reconcile layers and rewrite on compact.
  */
object IndexMaintenance {

  /** Shared meta writer for the (prefix_partitions, layers)-shaped
    * index families (line-count, edge) — one schema and one
    * rebuild-once error message instead of a per-family clone that
    * can drift. Families with richer metas (gram's max_bucket,
    * fingerprint's bits/hamming_max) keep their own.
    */
  def writeIndexMeta(s: SparkSession, path: String,
      prefixPartitions: Int, layers: Int): Unit = {
    import org.apache.spark.sql.functions.lit
    s.range(1)
      .select(lit(prefixPartitions).as("prefix_partitions"),
        lit(layers).as("layers"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** (prefixPartitions, layers) off a [[writeIndexMeta]] meta —
    * REQUIRED with a named rebuild-once error (probes and folds must
    * use the index's own prefix modulus; a mismatched modulus would
    * silently prune away real postings).
    */
  def readIndexMeta(s: SparkSession, indexPath: String,
      op: String): (Int, Int) = {
    val metaDf =
      try s.read.parquet(s"$indexPath/meta")
      catch {
        case e: Exception => throw new IllegalStateException(
          s"$op: cannot read $indexPath/meta — probes and folds must " +
            "use the index's own prefix modulus (indexes written " +
            "before the meta existed must be rebuilt once)", e)
      }
    val row = metaDf.head(1).headOption.getOrElse(
      throw new IllegalStateException(s"$op: $indexPath/meta is empty"))
    (row.getAs[Number]("prefix_partitions").intValue(),
      row.getAs[Number]("layers").intValue())
  }

  // ---- per-run manifests (the SUM-reconciled families) ---------------
  //
  // The SET-reconciled families bump meta BEFORE their appends (a
  // partial run is harmless under distinct); the SUM-reconciled
  // families (gram / line / weighted edge) cannot — a partial run
  // would corrupt totals — so their crash window between append and
  // meta bump was covered only by the single-writer
  // restore-on-failure contract. Per-run manifests close it
  // STRUCTURALLY: every appended file set carries a fresh `__run` id
  // column, the meta lists the COMMITTED run ids (written atomically
  // with `layers`, AFTER the append), and readers filter to committed
  // runs — a crash between append and meta bump leaves orphan files
  // that are INVISIBLE to every read instead of contractually
  // excluded. A retried fold mints a NEW id (so a partial first
  // attempt can never merge into the retry's committed run), and
  // compaction — which rewrites from the committed rows only — drops
  // orphan bytes from disk. Cost: one dictionary-encoded constant
  // string column per row and one pushed-down `isin` filter per read.

  /** A fresh run id for one appended file set. */
  def newRunId(): String = java.util.UUID.randomUUID().toString

  /** [[writeIndexMeta]] with the committed-run manifest — the meta
    * shape of the SUM-reconciled (prefix_partitions, layers) families
    * (line-count, weighted edge). `layers` stays authoritative for
    * compaction scheduling; `committed_runs` is authoritative for
    * reads.
    */
  def writeIndexMetaRuns(s: SparkSession, path: String,
      prefixPartitions: Int, layers: Int, runs: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.{array, lit}
    require(runs.nonEmpty, "writeIndexMetaRuns: empty run manifest")
    s.range(1)
      .select(lit(prefixPartitions).as("prefix_partitions"),
        lit(layers).as("layers"),
        array(runs.map(lit(_)): _*).as("committed_runs"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** (prefixPartitions, layers, committedRuns) off a
    * [[writeIndexMetaRuns]] meta — the [[readIndexMeta]] error
    * contract, plus a named rebuild-once error for a manifest-less
    * meta (an index written before the manifest existed must be
    * rebuilt once; reading it WITHOUT the run filter would resurrect
    * any orphan rows a past crash left behind).
    */
  def readIndexMetaRuns(s: SparkSession, indexPath: String,
      op: String): (Int, Int, Seq[String]) = {
    val (prefixPartitions, layers) = readIndexMeta(s, indexPath, op)
    (prefixPartitions, layers, committedRunsOf(s, indexPath, op))
  }

  /** The committed-run manifest off any meta frame that carries one —
    * shared by the (prefix_partitions, layers) families and the gram
    * family's richer meta.
    */
  def committedRunsOf(s: SparkSession, indexPath: String,
      op: String): Seq[String] = {
    val row = s.read.parquet(s"$indexPath/meta").head()
    if (!row.schema.fieldNames.contains("committed_runs"))
      throw new IllegalStateException(
        s"$op: $indexPath/meta carries no committed_runs manifest — " +
          "SUM-reconciled indexes written before the per-run manifest " +
          "existed must be rebuilt once (reading without the run " +
          "filter would resurrect orphan rows from crashed folds)")
    val runs = row.getSeq[String](row.fieldIndex("committed_runs"))
    require(runs.nonEmpty, s"$op: $indexPath/meta has an empty run manifest")
    runs
  }

  /** Keep only committed rows and drop the manifest column — the ONE
    * read-side filter every SUM-family consumer applies before its
    * reconcile aggregation.
    */
  def committedOnly(df: org.apache.spark.sql.DataFrame,
      runs: Seq[String]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    df.filter(col("__run").isin(runs: _*)).drop("__run")
  }

  // ---- logical batch tags (exactly-once streaming folds) -------------
  //
  // The per-run manifest makes a CRASHED append invisible, but a
  // RETRIED fold still lands as a new committed run — correct for a
  // caller that retries deliberately, double-counting for a streaming
  // engine that re-delivers a whole micro-batch after a failure
  // (foreachBatch's at-least-once contract). Families maintained FROM
  // a stream therefore carry a second, LOGICAL manifest next to the
  // physical one: `committed_tags` lists the batch tags whose fold
  // has committed, a tagged fold is a NO-OP when its tag is already
  // listed, and the physical run id stays fresh per attempt (so a
  // crashed attempt's orphan can never merge into the retry). The two
  // manifests answer different questions — "which FILES are real"
  // (runs; reset to one at compaction) vs "which BATCHES are applied"
  // (tags; preserved ACROSS compaction, else a replay after compact
  // would re-apply its batch).

  /** [[writeIndexMetaRuns]] plus the logical `committed_tags`
    * manifest. `tags` may be empty (a batch-built index that has seen
    * no tagged folds yet).
    */
  def writeIndexMetaRunsTags(s: SparkSession, path: String,
      prefixPartitions: Int, layers: Int, runs: Seq[String],
      tags: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.{array, lit}
    require(runs.nonEmpty, "writeIndexMetaRunsTags: empty run manifest")
    s.range(1)
      .select(lit(prefixPartitions).as("prefix_partitions"),
        lit(layers).as("layers"),
        array(runs.map(lit(_)): _*).as("committed_runs"),
        (if (tags.isEmpty) array().cast("array<string>")
         else array(tags.map(lit(_)): _*)).as("committed_tags"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** (prefixPartitions, layers, committedRuns, committedTags) off a
    * [[writeIndexMetaRunsTags]] meta. The tag manifest is REQUIRED by
    * name — an index written without it cannot answer "was this batch
    * applied", so a tagged fold against it must fail loudly rather
    * than default to re-applying.
    */
  def readIndexMetaRunsTags(s: SparkSession, indexPath: String,
      op: String): (Int, Int, Seq[String], Seq[String]) = {
    val (prefixPartitions, layers, runs) =
      readIndexMetaRuns(s, indexPath, op)
    val row = s.read.parquet(s"$indexPath/meta").head()
    if (!row.schema.fieldNames.contains("committed_tags"))
      throw new IllegalStateException(
        s"$op: $indexPath/meta carries no committed_tags manifest — " +
          "tag-folded indexes written before the tag manifest existed " +
          "must be rebuilt once (folding without it would re-apply " +
          "re-delivered batches)")
    (prefixPartitions, layers, runs,
      row.getSeq[String](row.fieldIndex("committed_tags")))
  }

  /** Compact once layer count reaches this many appended runs.
    * 8 runs ≈ a week of daily folds; read-side reconcile cost and
    * file-open fan-out both scale with the run count, so the
    * threshold bounds probe overhead at ~8× one run's files while
    * keeping compaction (O(index) read+write) amortized to
    * 1/threshold of the fold cadence.
    */
  val DefaultCompactThreshold = 8

  /** Best-effort single-writer guard wrapping every maintain* entry
    * point: atomically creates `<index>__writer.lock`
    * (FileSystem.createNewFile) and deletes it when the body
    * completes or throws. A second concurrent maintain on the same
    * path fails BY NAME here instead of racing [[recoverAtEntry]]'s
    * unconditional sibling cleanup into the first writer's in-flight
    * `__compacting` directory mid-compact (the silent-corruption
    * shape ADVICE r12 flagged). Best-effort by design: createNewFile
    * is atomic on HDFS-like filesystems and the local FS (object
    * stores would want a conditional-put manifest instead — same
    * position as the rename-swap contract above), and a hard crash
    * strands the lock, so the error message names the exact file to
    * delete once the operator confirms no maintain is live. The
    * documented single-writer contract still governs; the lock turns
    * concurrent-maintain misuse from corruption into a loud failure.
    */
  def withWriterLock[T](s: SparkSession, indexPath: String)(body: => T): T = {
    val fs = new Path(indexPath).getFileSystem(
      s.sparkContext.hadoopConfiguration)
    val live = fs.makeQualified(new Path(indexPath))
    val lock = new Path(live.getParent, live.getName + "__writer.lock")
    // Only "lock already exists" means a concurrent writer; any OTHER
    // IOException is a real filesystem fault and must surface as
    // itself, not as a misleading "another maintain* appears to be
    // running" (ADVICE r13). createNewFile signals existence either by
    // returning false or by FileAlreadyExistsException, FS-dependent.
    val acquired =
      try fs.createNewFile(lock)
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    if (!acquired) throw new IllegalStateException(
      s"withWriterLock: another maintain* appears to be running on " +
        s"$live (lock file $lock exists) — maintain* is single-writer " +
        "per index. If the previous writer crashed, delete the lock " +
        "file and re-run; recoverAtEntry will repair any half-finished " +
        "swap.")
    try body finally fs.delete(lock, false)
  }

  /** Crash recovery, run by every maintain* entry point BEFORE its
    * fold (inside [[withWriterLock]]): restore `__old` into place
    * when the live path is absent (a crash landed between the swap's
    * two renames), then delete stale `__compacting`/`__old` siblings
    * unconditionally (a crashed attempt's full-index copy must not
    * linger while folds stay under the compaction threshold).
    * Idempotent; no-op on a healthy index. The unconditional sibling
    * cleanup is what makes this single-writer-only — hence the lock.
    */
  def recoverAtEntry(s: SparkSession, indexPath: String): Unit = {
    val fs = new Path(indexPath).getFileSystem(
      s.sparkContext.hadoopConfiguration)
    val live = fs.makeQualified(new Path(indexPath))
    val fresh = new Path(live.getParent, live.getName + "__compacting")
    val old = new Path(live.getParent, live.getName + "__old")
    if (!fs.exists(live) && fs.exists(old) && !fs.rename(old, live))
      throw new IllegalStateException(
        s"recoverAtEntry: live index $live is absent (crashed swap) and " +
          s"restoring $old into place failed — manual restore required")
    fs.delete(fresh, true)
    fs.delete(old, true)
    ()
  }

  /** Run `compactTo(freshDir)` and swap the result into `indexPath`
    * iff `layers >= threshold`. Returns true when a compaction ran.
    * NOT reader-safe — see the object Scaladoc's reader contract.
    */
  def compactIfLayered(s: SparkSession, indexPath: String, layers: Int,
      threshold: Int)(compactTo: String => Unit): Boolean = {
    require(threshold >= 2,
      s"compactIfLayered: threshold $threshold would compact on every " +
        "fold — use the fold-and-compact to-outPath overloads for that " +
        "cost class")
    if (layers < threshold) false
    else {
      val fs = new Path(indexPath).getFileSystem(
        s.sparkContext.hadoopConfiguration)
      val live = fs.makeQualified(new Path(indexPath))
      val fresh = new Path(live.getParent, live.getName + "__compacting")
      val old = new Path(live.getParent, live.getName + "__old")
      // leftovers from a crashed previous attempt
      fs.delete(fresh, true)
      fs.delete(old, true)
      compactTo(fresh.toString)
      if (!fs.rename(live, old)) throw new IllegalStateException(
        s"compactIfLayered: cannot move live index $live aside to $old")
      if (!fs.rename(fresh, live)) {
        fs.rename(old, live) // restore — the fresh copy stays for triage
        throw new IllegalStateException(
          s"compactIfLayered: cannot move compacted index $fresh into " +
            s"place at $live — live index restored, fresh copy kept")
      }
      fs.delete(old, true)
      true
    }
  }
}

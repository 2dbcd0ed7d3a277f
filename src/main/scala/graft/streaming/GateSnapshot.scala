package graft.streaming

import org.apache.spark.sql.DataFrame

/** The two author-time snapshot strategies behind the dedup gates'
  * static sides (Fingerprint/Gram/Line) — ONE implementation so the
  * gates cannot drift on the isolation contract:
  *
  *   - [[inMemory]] (the default): eager `localCheckpoint` + cache-
  *     owned registration. Fold-invisible by construction (no file
  *     relation for a write-triggered refresh to match — the round-13
  *     FingerprintGate lesson) and drain-safe (registered blocks are
  *     skipped by [[graft.BenchHarness.drainLocalCheckpoints]]), but
  *     NON-RECOMPUTABLE: an executor lost mid-serve permanently fails
  *     the gate query. Right for `local[n]` and restart-supervised
  *     streams.
  *   - [[toPath]]: COPY the reconciled frame to a caller-owned stable
  *     location and author the gate against the copy — the
  *     long-lived multi-executor alternative the FingerprintGate note
  *     documents (r14 watch item #4). Same fold isolation (folds
  *     target the LIVE index path; the copy has its own files), and
  *     executor loss simply RECOMPUTES from the copied files; an
  *     explicit unpersist or a checkpoint drain cannot touch it
  *     either (StreamingSpec pins survival). The caller owns the
  *     path's lifecycle: re-author to a FRESH path (or quiesce the
  *     gate) rather than overwriting a path a live gate still reads —
  *     an in-place overwrite is the compaction-swap hazard in
  *     miniature.
  */
private[graft] object GateSnapshot {

  /** Eager lineage-cut snapshot: materialize, cut lineage, register
    * cache-owned so a checkpoint drain cannot truncate a frame a live
    * gate still joins.
    */
  def inMemory(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint()
    graft.api.Lifecycle.registerCacheOwned(cp)
    cp
  }

  /** Path-stable snapshot: write the frame to `path` (overwrite) and
    * serve the files — recomputable, drain-proof, fold-isolated.
    */
  def toPath(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Strategy switch: Some(path) → [[toPath]], None → [[inMemory]]. */
  def of(df: DataFrame, snapshotPath: Option[String]): DataFrame =
    snapshotPath.map(toPath(df, _)).getOrElse(inMemory(df))
}

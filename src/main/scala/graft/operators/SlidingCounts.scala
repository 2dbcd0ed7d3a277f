package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-level sliding-window counting — the batch shape for fine-slide
  * windows (duration/slide in the hundreds).
  *
  * `window(ts, duration, slide)` plans an Expand that copies EVERY
  * event duration/slide times (720x for 1h/5s) before the aggregation
  * — at 100TB that multiplies shuffle input by the window count, and
  * its generated switch is large enough that whole-stage codegen fails
  * to compile (Spark's split `expand_switchCaseCode_*` methods spill
  * into a nested class the call site can't see) and silently falls
  * back to interpreted execution.
  *
  * This operator instead aggregates per slide-sized tumbling bucket
  * first (a plain projection — no Expand, full map-side combine), then
  * explodes each BUCKET count into the duration/slide windows it
  * belongs to (a Generate over O(buckets x keys) rows, not events) and
  * sums. Identical output to the window() spelling — proven by q40 ==
  * q02 and the JobsSpec goldens — with event-proportional work done
  * exactly once.
  *
  * Streaming twins keep the window() spelling (streaming.WindowedCounts):
  * incremental per-window state is the point there, and the streaming
  * Expand feeds a stateful agg that dedups per (window, key) in state.
  */
object SlidingCounts {

  /** Count per key per sliding window. Output: windowEndCol (epoch
    * seconds), keyCols..., cnt. Windows are epoch-aligned, end-labeled,
    * and only windows containing at least one input row appear —
    * exactly `window(ts, duration, slide)` + count semantics.
    */
  def slidingCount(df: DataFrame, tsCol: String, keyCols: Seq[String],
      durationSec: Long, slideSec: Long,
      windowEndCol: String = "windowEnd"): DataFrame = {
    require(durationSec > 0 && slideSec > 0 && durationSec % slideSec == 0,
      s"duration ${durationSec}s must be a positive multiple of slide ${slideSec}s")
    // internal working columns carry a __sc_ prefix (and the window
    // struct is explicitly aliased) so caller keys named "window" etc.
    // neither collide nor go ambiguous; "cnt" is the fixed OUTPUT name
    // and __sc_* are the working names, so neither may appear among the
    // caller-controlled names — fail fast, not an ambiguous-reference
    // error (or silent corruption) downstream
    val callerNames = keyCols :+ windowEndCol
    require(keyCols.size == keyCols.distinct.size &&
        !keyCols.contains(windowEndCol) &&
        callerNames.forall(n => n != "cnt" && !n.startsWith("__sc_")),
      s"slidingCount: caller columns $callerNames must be distinct and may " +
        "not use the reserved names cnt or __sc_*")
    val nWin = durationSec / slideSec
    val keys: Seq[Column] = keyCols.map(col)
    val bucketed = df
      .groupBy(window(col(tsCol), s"$slideSec seconds").as("__sc_w") +: keys: _*)
      .agg(count(lit(1)).as("__sc_bcnt"))
      .select(unix_timestamp(col("__sc_w.start")).as("__sc_bstart") +:
        (keys :+ col("__sc_bcnt")): _*)
    bucketed
      .withColumn("__sc_i", explode(sequence(lit(1L), lit(nWin))))
      .withColumn(windowEndCol, col("__sc_bstart") + col("__sc_i") * slideSec)
      .groupBy(col(windowEndCol) +: keys: _*)
      .agg(sum(col("__sc_bcnt")).as("cnt"))
  }
}

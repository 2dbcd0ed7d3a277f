package graft.api

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism floor for CHEAP-INPUT / EXPENSIVE-MAP
  * stages (optimization guide §2.5 "input skew" / §6 small-files):
  * Spark sizes scan tasks by input BYTES (split packing, bounded below
  * by one task per parquet row group), so a stage whose per-row work is
  * orders of magnitude above its scan cost — shingle/gram hashing over
  * a small corpus file, media container decode — inherits the scan's
  * 1–3-task parallelism and leaves the rest of the box idle.
  *
  * [[ifNarrow]] round-robin-repartitions such a frame to the session's
  * default parallelism, but ONLY when the frame currently has fewer
  * partitions than cores: at production scale the scan has ≫ cores
  * splits and the call is a structural no-op (no exchange in the
  * plan). Never key-partitions; downstream keyed exchanges are
  * unaffected. Streaming frames pass through untouched (their
  * micro-batch partitioning is the source's contract, and `.rdd` is
  * illegal on them).
  */
private[graft] object Spread {
  def ifNarrow(df: DataFrame): DataFrame = {
    if (df.isStreaming) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < target) df.repartition(target) else df
    }
  }
}

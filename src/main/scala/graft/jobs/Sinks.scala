package graft.jobs

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Sink builders (SURVEY.md §2.8). The reference's outputs are stdout
  * prints, Redis writes, and a Kafka loader util; here every sink is a
  * normal Spark writer so one pipeline can fan out to any of them.
  */
object Sinks {

  /** Render rows to the CSV value strings the Kafka/line sources parse
    * — the EXACT inverse of `Sources.csvLines` (`to_csv` ↔ `from_csv`,
    * quoting included), proven by round-trip in JobsSpec. This is the
    * projection both Kafka producers below apply, so the produce side
    * is testable without a broker just like the consume side.
    */
  def csvValue(df: DataFrame): DataFrame =
    df.select(to_csv(struct(df.columns.toIndexedSeq.map(col): _*)).as("value"))

  /** S4/K-analog: Kafka producer (ref KafkaProducer.scala:13-27 reads a
    * CSV and sends each line to a topic). Batch write: rows are rendered
    * via [[csvValue]]; `keyCol` (optional) becomes the Kafka key for
    * partition affinity. Not runnable in this container (no broker) —
    * the builder is the contract; the value projection is tested.
    */
  def toKafka(df: DataFrame, servers: String, topic: String,
      keyCol: Option[String] = None): Unit = {
    Sources.requireKafkaDataSource(df.sparkSession, "Sinks.toKafka")
    val value = to_csv(struct(df.columns.toIndexedSeq.map(col): _*)).as("value")
    val out = keyCol match {
      case Some(k) => df.select(col(k).cast("string").as("key"), value)
      case None    => df.select(value)
    }
    out.write.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topic)
      .save()
  }

  /** Streaming twin of [[toKafka]]. */
  def toKafkaStream[T](ds: Dataset[T], servers: String, topic: String,
      checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] = {
    Sources.requireKafkaDataSource(ds.sparkSession, "Sinks.toKafkaStream")
    csvValue(ds.toDF()).writeStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
  }

  /** K1 console sink (ref `.print()`): batch show or streaming console. */
  def console(df: DataFrame, rows: Int = 20): Unit = df.show(rows, truncate = false)

  /** Partitioned parquet sink — the batch materialization path; partition
    * columns pick the downstream pruning key (e.g. window_end day).
    */
  def parquet(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }

  /** Write-OPTIMIZED layout: directory partitions for partition pruning
    * plus range-clustered, sorted files within each partition so parquet
    * row-group min/max statistics prune point and range reads. The
    * range repartition spans (partitionCols ++ sortCols), so each task
    * writes a contiguous slice: few files per directory, disjoint sort
    * ranges across them. This is the layout step between a pipeline's
    * last transform and its consumers at 100TB — without it, every
    * downstream point-read scans every file.
    */
  def layout(df: DataFrame, path: String, partitionCols: Seq[String],
      sortCols: Seq[String], numFiles: Int): Unit =
    rangedWrite(df, path, partitionCols, sortCols, numFiles, "overwrite")

  /** The one ranged writer behind [[layout]] / [[layoutAppend]].
    * `repartitionByRange`'s RangePartitioner SAMPLES its child before
    * the exchange, which executes the child plan a second time
    * (VERDICT r16 #4: this double-compute bottlenecked the timed
    * index/stage-build bench entries). When the child carries real
    * recompute cost — any wide operator (join/aggregate/window/
    * distinct/repartition/global sort) above its leaves — it is cut
    * ONCE with a lazy localCheckpoint: the sampling pass materializes
    * the blocks (MEMORY_AND_DISK — spill-safe), the exchange re-reads
    * them, and the blocks release as soon as the write commits. A
    * NARROW child (a projection over a parquet scan, a checkpoint, or
    * a cache — e.g. writeBm25Index's second table, a pmod over an
    * already-checkpointed postings frame) is deliberately NOT cut:
    * re-reading it for the sampler costs about what reading the cut's
    * own cache would, so the extra materialization is pure overhead
    * (measured +0.6 s on q141_index_build before this gate). Sampling,
    * range boundaries, hot-directory splitting and the written bytes
    * are unchanged either way — only how many times the child
    * COMPUTES (2 → 1 where computing is expensive).
    */
  private def rangedWrite(df: DataFrame, path: String,
      partitionCols: Seq[String], sortCols: Seq[String], numFiles: Int,
      mode: String): Unit = {
    val keys = (partitionCols ++ sortCols).map(col)
    val needsCut = graft.api.Spread.hasWideOp(df)
    val src = if (needsCut) df.localCheckpoint(eager = false) else df
    try {
      src.repartitionByRange(numFiles, keys: _*)
        .sortWithinPartitions(keys: _*)
        .write.mode(mode).partitionBy(partitionCols: _*).parquet(path)
    } finally if (needsCut) graft.api.Lifecycle.releaseLocalCheckpoint(src)
  }

  /** [[layout]] with mode=append: NEW sorted files land next to the
    * existing ones (dynamic-partition append inside each directory
    * partition). This is what makes index FOLDS O(delta) on the write
    * side — a delta's rows arrive as their own sorted run instead of
    * forcing a corpus-sized rewrite; each appended run keeps its own
    * row-group min/max stats, so point/range pruning still works per
    * file. Readers that need one logical row per key reconcile the
    * runs at read (see DedupOps.mergeLayeredBuckets).
    */
  def layoutAppend(df: DataFrame, path: String, partitionCols: Seq[String],
      sortCols: Seq[String], numFiles: Int): Unit =
    rangedWrite(df, path, partitionCols, sortCols, numFiles, "append")

  /** Z-ORDERED layout: multi-dimensional data skipping. [[layout]]'s
    * sort clusters one leading column — its files prune range reads on
    * that column and no other. This writes the rows ordered by a
    * Morton (Z-order) key over TWO columns ([[graft.functions.MortonCode]]:
    * each column min/max-scaled to [0, 2^bits), bits interleaved), so
    * every file and row group covers a tight BOX in (x, y) space and
    * parquet min/max statistics prune a predicate on EITHER column —
    * the layout for the 100-TB table that serves both "this user" and
    * "this hour" reads without being written twice. LayoutSpec
    * measures the effect: on a 2-D box predicate the z-ordered layout
    * materializes a fraction of the rows the single-column sort must.
    *
    * Range scaling is computed from the frame itself (one O(1)
    * min/max aggregate — the same build-once discipline as
    * [[bucketedTable]]); the Morton key is layout-only and is not
    * written. `rowGroupBytes` sizes parquet row groups — the skipping
    * granularity (at 100 TB the default 128 MB is right; tests shrink
    * it to get many groups from small data).
    */
  def zorderedLayout(df: DataFrame, path: String, xCol: String,
      yCol: String, numFiles: Int, bits: Int = 20,
      rowGroupBytes: Long = 128L << 20): Unit = {
    // Three consumers of `df` (min/max agg, range sampler, exchange):
    // cut once so the input computes ONE time (the rangedWrite
    // argument, plus the stats pass) — the agg below materializes the
    // lazy checkpoint's blocks, and everything after reads them.
    val cut = df.localCheckpoint(eager = false)
    try {
      val Seq(xMin, xMax, yMin, yMax) = cut
        .agg(min(col(xCol)).cast("double"), max(col(xCol)).cast("double"),
          min(col(yCol)).cast("double"), max(col(yCol)).cast("double"))
        .head().toSeq.map(_.asInstanceOf[Double])
      val hi = (1L << bits) - 1
      def scaled(c: String, lo: Double, span: Double) =
        ((col(c).cast("double") - lit(lo)) / lit(if (span > 0) span else 1.0) *
          lit(hi.toDouble)).cast("long")
      graft.functions.LayoutExpressions.register(df.sparkSession)
      val mort = call_function("morton2",
        scaled(xCol, xMin, xMax - xMin), scaled(yCol, yMin, yMax - yMin))
      cut.withColumn("__z", mort)
        .repartitionByRange(numFiles, col("__z"))
        .sortWithinPartitions(col("__z"))
        .drop("__z")
        .write.mode("overwrite")
        .option("parquet.block.size", rowGroupBytes)
        .parquet(path)
    } finally graft.api.Lifecycle.releaseLocalCheckpoint(cut)
  }

  /** BUCKETED external table: the co-location layout for repeated
    * joins/aggregations on one key. `bucketBy` hash-assigns rows to
    * `numBuckets` files by `bucketCol` (Spark's HashPartitioning
    * arithmetic), `sortBy` orders within each bucket, and the leading
    * `repartition(numBuckets, bucketCol)` — the SAME hash — lands each
    * bucket in exactly ONE file. Two tables bucketed by their join key
    * with the same bucket count then sort-merge-join with ZERO
    * exchange on either side (PlanSpec proves it non-vacuously against
    * the plain-parquet contrast); the join's sorts remain but are
    * bucket-LOCAL — Spark ≥3 re-sorts rather than trust writer sort
    * metadata (SPARK-28595) — so the shuffle, the cost that scales
    * with the cluster, is the one that disappears.
    *
    * This is the 100-TB layout investment: pay one shuffle at write
    * time, then every daily join/agg on that key — the fact⋈fact join
    * no broadcast can save — reads co-located buckets forever. Bucket
    * count scales with the cluster (thousands at 100 TB; callers pick
    * it so one bucket fits an executor core's memory).
    *
    * Registers `table` in the session catalog backed by files at
    * `path` (external — survives session teardown; a new session
    * re-registers over the same files).
    */
  def bucketedTable(df: DataFrame, table: String, path: String,
      numBuckets: Int, bucketCol: String): Unit = {
    df.repartition(numBuckets, col(bucketCol))
      .write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)
  }

  /** JSONL export — the training-data interchange format (one JSON
    * object per line; trainers and dataset tooling consume this
    * directly). Same partition-directory contract as [[parquet]]; each
    * task writes its own file, so the export parallelizes like any
    * other action. Column types follow Spark's JSON encoding (UTC
    * timestamps, base64 binary).
    */
  def jsonl(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .json(path)
  }
}

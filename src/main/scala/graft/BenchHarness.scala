package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ONE benchmark methodology, shared by [[Bench]] (per-round driver
  * bench) and [[BenchScale]] (10× scale-stress): same session config,
  * same noop sink, same warmup, same timing discipline. SCALE.md's
  * comparability claim ("Bench's methodology") is true by construction
  * because both mains call these.
  */
object BenchHarness {

  /** ANSI-SQL lane toggle: `SPARK_GRAFT_ANSI=true` runs every session
    * (bench, verify, tests) under `spark.sql.ansi.enabled=true` —
    * Spark 4's strict arithmetic/cast semantics. The catalog is
    * ANSI-clean (the whole suite + all 116 hash oracles pass in both
    * lanes); the default stays non-ANSI so round-over-round bench
    * numbers remain comparable.
    */
  def ansiEnabled: String = sys.env.getOrElse("SPARK_GRAFT_ANSI", "false")

  /** Cluster-job-shaped local session: AQE on, shuffle partitions =
    * core count (not 200), codegen compile failures THROW (a silent
    * interpreted fallback would invalidate every number).
    */
  def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.sql.ansi.enabled", ansiEnabled)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** noop sink: every output row is fully computed and then discarded.
    * count() would let Catalyst prune the projection, so map-only
    * queries would time scan+count instead of their real work.
    */
  def exec(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** JIT/codegen warmup on the smallest SF so per-query numbers measure
    * the plan, not first-call classloading.
    */
  def warmup(spark: SparkSession, names: Iterable[String],
      warmDir: String = "/root/testdata/sf0.001"): Unit =
    names.foreach { q =>
      try exec(SparkEntry.queries(q)(spark, warmDir))
      catch { case _: Throwable => () }
    }

  /** `n` timed runs of a plan thunk, raw times in order. A failed run
    * short-circuits to a single -1.0. The raw array is part of the
    * bench artifact (bench_out.json `runs`): a one-off 6× outlier
    * under driver load is then self-diagnosing instead of reading as
    * a regression.
    */
  def timedRuns(n: Int, build: () => DataFrame): Seq[Double] = {
    def once(): Double = {
      val t0 = System.nanoTime()
      try exec(build())
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Double]
    var i = 0
    while (i < n && (out.isEmpty || out.last >= 0)) { out += once(); i += 1 }
    out.toSeq
  }

  /** min over raw runs: JIT/GC jitter at local scale is larger than
    * most plan differences; the min is the steady-state cost of the
    * plan itself. -1.0 marks a failed query.
    */
  def minOfRuns(rs: Seq[Double]): Double =
    if (rs.isEmpty || rs.exists(_ < 0)) -1.0 else rs.min

  /** min of two timed runs (BenchScale's per-SF rows; Bench proper
    * uses three runs and reports the raw array too).
    */
  def minOf2(spark: SparkSession, name: String, dir: String): Double =
    minOf2Of(() => SparkEntry.queries(name)(spark, dir))

  /** [[minOf2]] for any plan thunk (BenchScale's const-delta probes
    * time API calls that are not catalog entries).
    */
  def minOf2Of(build: () => DataFrame): Double =
    minOfRuns(timedRuns(2, build))

  /** Leak signature on a raw run array: strictly monotone-increasing
    * with meaningful growth (≥1.2× first→last and ≥0.2s absolute).
    * Jitter is symmetric; state accreting across invocations in one
    * session only grows (the round-7 q89 localCheckpoint class). A
    * single sample of this signature is also what a CONTENDED machine
    * produces when load ramps during the three runs (the r10 q14/q39
    * false accusation), which is why [[adjudicateLeaks]] requires the
    * signature to reproduce before the artifact names a suspect.
    */
  def monotoneLeak(rs: Seq[Double]): Boolean =
    rs.size >= 3 && rs.forall(_ >= 0) &&
      rs.zip(rs.tail).forall { case (a, b) => b > a } &&
      rs.last >= rs.head * 1.2 && rs.last - rs.head >= 0.2

  /** Self-adjudicating leak flagging: a candidate (first-pass
    * [[monotoneLeak]] hit) is confirmed only if a FRESH retest of the
    * same thunk reproduces the monotone signature. A real leak leaks
    * again — the retest ramps exactly like the first pass. Contention
    * noise is time-local — the odds the machine ramps again during
    * that query's retest are the odds the first hit was wrong.
    * Returns (confirmed, retest arrays for the artifact — an empty
    * map means no candidate needed adjudication).
    */
  def adjudicateLeaks(candidates: Seq[String],
      retest: String => Seq[Double]): (Seq[String], Map[String, Seq[Double]]) = {
    val retests = candidates.map(k => k -> retest(k)).toMap
    (candidates.filter(k => monotoneLeak(retests(k))), retests)
  }

  /** Release every locally-checkpointed RDD still pinned on the
    * context. localCheckpoint persists its RDD for the LIFE of the
    * session (the q89 round-7 lesson, generalized): a bench loop
    * re-invoking every catalog thunk 3× each creates fresh checkpoint
    * RDDs per invocation and never references the old ones again —
    * they accrete until the 8g driver heap is mostly pinned storage
    * and multi-second major GCs land on whichever query is running
    * (the r8 q56/q32/q102 third-run spikes). Draining after each
    * query's runs is semantics-free for thunk-private checkpoints: no
    * thunk invocation can see a PREVIOUS invocation's checkpoint (each
    * builds its own), and cacheManager `.persist()` caches — which ARE
    * legitimately shared across runs and queries — are left untouched
    * (`isLocallyCheckpointed` is false for them). The ONE cross-query
    * sharing shape that argument does not cover — long-lived session
    * caches of checkpointed frames (q92 reads q89's cached
    * CurationPipeline Stages) — is handled by the
    * [[graft.api.Lifecycle]] cache-owned registry: owners register
    * their live checkpoint RDD ids and the drain skips them (the
    * round-9 q92 -1.0 lesson — draining a cache-owned checkpoint
    * truncates lineage on a frame a LATER query still reads,
    * unrecoverably). The leak bound survives because owners release
    * the old run's ids on every refresh. Returns the number of RDDs
    * released so the bench artifact can report drain activity.
    */
  def drainLocalCheckpoints(spark: SparkSession): Int = {
    val pinned = spark.sparkContext.getPersistentRDDs.values
      .filter(r => isLocallyCheckpointed(r) &&
        !graft.api.Lifecycle.isCacheOwned(r.id)).toSeq
    pinned.foreach(_.unpersist(blocking = false))
    pinned.size
  }

  /** RDD.isLocallyCheckpointed is `private[rdd]` at the Scala level
    * but (like all Scala package-private members) a public method in
    * bytecode — one reflective handle keeps the drain dependent only
    * on Spark's own lifecycle flag, not on storage-level heuristics
    * that would also match legitimate `.persist()` caches.
    */
  private val locallyCheckpointedM =
    classOf[org.apache.spark.rdd.RDD[_]].getMethod("isLocallyCheckpointed")
  def isLocallyCheckpointed(rdd: org.apache.spark.rdd.RDD[_]): Boolean =
    locallyCheckpointedM.invoke(rdd).asInstanceOf[Boolean]

  /** Locale-safe fixed-ish decimal rendering for the JSON contract
    * lines: Double.toString never uses the JVM default locale, while
    * an f-interpolator `%.3f` under a comma-decimal locale would emit
    * invalid JSON.
    */
  def num(x: Double): String = (math.rint(x * 1000) / 1000).toString
}

package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextHashing

/** Dataset assembly API: reproducible splits, sampling, and sequence
  * packing. Everything keys on md5-hash60 of the id — deterministic
  * across runs/engines and stable under corpus growth — never rand().
  */
object SampleOps {

  /** Deterministic id-hash bucket in [0, mod). */
  def hashBucket(idCol: Column, mod: Long): Column =
    pmod(TextHashing.hash60(idCol.cast("string")), lit(mod))

  /** Train/val/test assignment column from the id hash: train < trainPct,
    * val < trainPct+valPct, else test (percent of 100).
    */
  def splitColumn(idCol: Column, trainPct: Int, valPct: Int): Column = {
    val b = hashBucket(idCol, 100L)
    when(b < trainPct, "train").when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Deterministic uniform k-sample: the k rows with the smallest id
    * hash (ties broken by id). Equivalent to a uniform random sample
    * under the md5 hash, but reproducible across runs/engines and
    * incrementally stable — adding rows to the corpus can only swap
    * members in/out at the hash boundary, never reshuffle the whole
    * sample the way rand() does. Physically a TakeOrderedAndProject:
    * each partition keeps its local top-k, the driver merges k rows
    * per partition — no global sort at any scale.
    */
  def prioritySample(df: DataFrame, idCol: String, k: Int): DataFrame =
    df.orderBy(TextHashing.hash60(col(idCol).cast("string")).asc,
      col(idCol).asc).limit(k)

  /** Per-key cap: keep at most `cap` rows per key, selected by the
    * deterministic id-hash priority ([[prioritySample]]'s order applied
    * WITHIN each key) — the domain-balancing pass of a crawl pipeline
    * ("no single domain/source contributes more than N documents"),
    * run after dedup and before mixing. Reproducible across engines
    * and incrementally stable (a new crawl can only swap members at
    * the hash boundary), never rand(). One window PARTITIONED by the
    * key (never global — the PlanSpec contract); Spark's rank-limit
    * pushdown (WindowGroupLimit) prunes every partition to its local
    * top-cap before the exchange, so the shuffle carries
    * O(keys × cap), not the corpus.
    */
  def capPerKey(df: DataFrame, idCol: String, keyCol: String,
      cap: Int): DataFrame = {
    require(cap > 0, s"capPerKey: cap must be positive, got $cap")
    // the hash priority is inlined into the window order (no temp
    // column to clobber); the one working column is the rank, and a
    // caller column with that name would be silently overwritten and
    // dropped — fail fast instead (the simhashPairs reserved-name
    // contract)
    require(!df.columns.contains("_rn"),
      "capPerKey: input already has a '_rn' column — rename it first")
    df.withColumn("_rn", row_number().over(
        Window.partitionBy(col(keyCol))
          .orderBy(TextHashing.hash60(col(idCol).cast("string")).asc,
            col(idCol).asc)))
      .filter(col("_rn") <= cap)
      .drop("_rn")
  }

  /** Weighted deterministic k-sample: top-k by hash60(id) div weight
    * ascending — a row with weight w is selected roughly w× as often
    * as a weight-1 row (the integer-arithmetic analogue of
    * exponential-rank weighted reservoir sampling), but the selection
    * is a pure function of (id, weight): reproducible across engines
    * and runs, incrementally stable under corpus growth, and
    * hash-oracle-able (float -ln(u)/w priorities are none of these).
    * The quality-weighted data-selection pass: weight = doc quality /
    * length / source trust. Rows with weight < 1 are NEVER selected
    * (filtered before ranking) — without the guard a zero weight is a
    * division by zero and a negative weight would sort first, the
    * opposite of intent.
    *
    * Physically TakeOrderedAndProject, like [[prioritySample]]: local
    * top-k per partition, k-row driver merge, no global sort.
    */
  def weightedPrioritySample(df: DataFrame, idCol: String,
      weightCol: String, k: Int): DataFrame =
    df.withColumn("_h", TextHashing.hash60(col(idCol).cast("string")))
      .withColumn("_w", col(weightCol).cast("long"))
      .filter(col("_w") >= 1L)
      .withColumn("_prio", expr("_h div _w")) // integer div — exact at 2^60
      .orderBy(col("_prio").asc, col(idCol).asc)
      .limit(k)
      .drop("_h", "_w", "_prio")

  /** Top-p (nucleus) selection by mass: per stratum, keep the smallest
    * prefix of rows — ordered by (mass desc, id asc) — whose cumulative
    * mass reaches pX1000‰ of the stratum total. The "keep the best docs
    * covering 80% of the quality mass per source" selection pass;
    * unlike a fixed top-k it adapts to how concentrated each stratum's
    * mass is. A row enters while the EXCLUSIVE prefix mass is still
    * below the target, so the prefix overshoots by at most one row and
    * is never empty (for pX1000 > 0). Integer arithmetic only —
    * engine-exact.
    *
    * Both windows partition by the stratum (never global — the PlanSpec
    * scale-killer) and share one exchange; the unique (mass, id) order
    * makes RANGE and ROWS frames agree across engines.
    */
  def topPByMass(df: DataFrame, idCol: String, stratumCol: String,
      massCol: String, pX1000: Int): DataFrame = {
    require(pX1000 >= 0 && pX1000 <= 1000, "pX1000 must be 0..1000")
    val ordered = Window.partitionBy(col(stratumCol))
      .orderBy(col(massCol).desc, col(idCol).asc)
    val whole = Window.partitionBy(col(stratumCol))
    df.withColumn("_cum", sum(col(massCol).cast("long")).over(ordered))
      .withColumn("_tot", sum(col(massCol).cast("long")).over(whole))
      .filter((col("_cum") - col(massCol)) * 1000 < lit(pX1000.toLong) * col("_tot"))
      .drop("_cum", "_tot")
  }

  /** Per-stratum hash-rate sampling: keeps rows whose id-hash (mod 1000)
    * falls under their stratum's rate. Map-only, reproducible,
    * growth-stable per stratum.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      ratesX1000: Map[String, Int], defaultX1000: Int): DataFrame = {
    val rate = ratesX1000.foldLeft(when(lit(false), defaultX1000)) {
      case (acc, (stratum, r)) => acc.when(col(stratumCol) === stratum, r)
    }.otherwise(defaultX1000)
    df.filter(hashBucket(col(idCol), 1000L) < rate)
  }

  /** Mixture resampling toward target proportions (the data-mixing
    * pass that rebalances a corpus to per-source weights before
    * training): given a per-stratum target weight expression, keep the
    * LARGEST subsample whose stratum sizes are proportional to the
    * weights, selected by id-hash (reproducible, growth-stable).
    *
    * k1000 = min over strata of floor(1000·count/weight); each
    * stratum's keep-rate is then floor(k1000·weight/count) per mille —
    * the binding stratum samples at ~100%, everything else downsamples
    * to match. Integer arithmetic end-to-end, so the kept set is
    * engine-exact.
    *
    * Physically: one tiny count-by-stratum aggregate, a 1-row global
    * min (broadcast), and a broadcast rate join back onto the corpus —
    * the corpus itself never shuffles.
    */
  def mixtureResample(df: DataFrame, idCol: String, stratumCol: String,
      weightX: Column): DataFrame = {
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("_c"))
      .withColumn("_w", weightX.cast("long"))
    val k = counts.agg(min(expr("_c * 1000 div _w")).as("_k1000"))
    val rates = counts.crossJoin(broadcast(k))
      .select(col(stratumCol),
        expr("_k1000 * _w div _c").as("_rate_x1000"))
    df.join(broadcast(rates), stratumCol)
      .filter(hashBucket(col(idCol), 1000L) < col("_rate_x1000"))
      .select(col(idCol), col(stratumCol))
  }

  /** TOKEN-budget mixture sampling — [[mixtureResample]] in the unit
    * production mixtures are actually specified in: per-stratum TOKEN
    * budgets, not doc counts (a source of long documents exhausts its
    * share in far fewer docs). Within each stratum, docs take a
    * deterministic shuffled order (md5-hash key — reproducible across
    * runs/engines, no rand()) and each doc KEEPS iff the total tokens
    * of the docs BEFORE it in that order is still under the stratum's
    * budget — "fill to budget": the budget-crossing doc is kept (the
    * overshoot is bounded by one document), everything after drops.
    * `budgetX` is a per-stratum budget expression over `stratumCol`
    * (the [[mixtureResample]] weight-expression contract).
    *
    * The per-stratum running sum is the [[packSequences]] TWO-PHASE
    * prefix sum, per stratum: docs cumsum inside (stratum, hash-bucket)
    * partitions and each bucket adds a tiny triangular offset — no
    * stratum-wide window funnels a whole source through one task, so
    * the plan survives sources of any size. The offsets also PRUNE:
    * a bucket whose offset already reaches the budget can contain no
    * keeper (every keeper has `_off + _lc < budget` and `_lc >= 0`),
    * so the window's sort runs over only the ~budget-sized surviving
    * slice — at 100 TB the corpus pays one cheap count/sum aggregate
    * and one pruning join, while the sort cost tracks the BUDGET,
    * not the corpus (the same cost class as the output itself).
    * Output: idCol, stratumCol, n_tok, tok_before (the exclusive
    * prefix — tok_before + n_tok is this stratum's running total
    * through the doc).
    */
  def tokenBudgetSample(df: DataFrame, idCol: String, stratumCol: String,
      nTokCol: String, budgetX: Column, buckets: Int = 32): DataFrame =
    // budgetX is an expression over stratumCol (the mixtureResample
    // weight contract), so it attaches to the tiny offsets frame as a
    // plain column — no extra corpus scan
    fillToBudget(df, idCol, stratumCol, nTokCol,
      off => off.withColumn("_budget", budgetX.cast("long")), buckets)

  /** The shared fill-to-budget core behind [[tokenBudgetSample]] and
    * [[temperatureResample]] — ONE implementation of the two-phase
    * prefix sum + bucket prune + budget cut, so the closed-form-budget
    * and data-derived-budget entry points cannot drift (the bm25Rank /
    * semanticLeg shared-back-half discipline). `attachBudget` receives
    * the TINY per-(stratum, bucket) offsets frame (it carries
    * stratumCol) and must return it with a `_budget` Long column —
    * a closed-form expression attaches for free, a data-derived budget
    * table joins as a broadcast; either way the corpus is scanned
    * exactly once. Rows of strata left without a budget (inner-join
    * attachment) keep nothing.
    */
  private def fillToBudget(df: DataFrame, idCol: String, stratumCol: String,
      nTokCol: String, attachBudget: DataFrame => DataFrame,
      buckets: Int): DataFrame = {
    val docs = df
      .select(col(idCol), col(stratumCol),
        col(nTokCol).cast("long").as("_nt"),
        TextHashing.hash60(col(idCol).cast("string")).as("_h"))
      .withColumn("_bkt", pmod(col("_h"), lit(buckets.toLong)))
    val totals = docs.groupBy(col(stratumCol), col("_bkt"))
      .agg(sum(col("_nt")).as("_t"))
    val offsets = attachBudget(totals.join(
        broadcast(totals.select(col(stratumCol).as("_s2"),
          col("_bkt").as("_b2"), col("_t").as("_t2"))),
        col("_s2") === col(stratumCol) && col("_b2") < col("_bkt"), "left")
      .groupBy(col(stratumCol), col("_bkt"))
      .agg(coalesce(sum(col("_t2")), lit(0L)).as("_off")))
    // bucket-level prune BEFORE the window (see scaladoc): inner join
    // against only the offsets still under budget
    val live = docs.join(
      broadcast(offsets.filter(col("_off") < col("_budget"))),
      Seq(stratumCol, "_bkt"))
    val w = Window.partitionBy(col(stratumCol), col("_bkt"))
      .orderBy(col("_h").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    live.withColumn("_lc", coalesce(sum(col("_nt")).over(w), lit(0L)))
      .filter(col("_off") + col("_lc") < col("_budget"))
      .select(col(idCol), col(stratumCol), col("_nt").as("n_tok"),
        (col("_off") + col("_lc")).as("tok_before"))
  }

  /** Exact integer square root — floor(√x) for non-negative Longs,
    * engine-independent: IEEE-754 double sqrt is correctly rounded in
    * both Spark and DuckDB, so `floor(sqrt(double(x)))` lands within
    * ±1 of the true isqrt at any int64 magnitude; the three-candidate
    * CASE collapses both engines onto the exact value regardless of
    * which side of the truth the float landed on. [[isqrtSql]] is the
    * character-identical DuckDB spelling (the hash60/hash60Sql
    * discipline) so catalog oracles replay the arithmetic exactly.
    */
  def isqrt(x: Column): Column = {
    val s0 = floor(sqrt(x.cast("double"))).cast("long")
    // candidate squares compare in decimal(38,0): near Long.MaxValue
    // (s0+1)² is ~9.2e18 + 6e9 — past Long, so a Long square wraps in
    // the default lane and raises in the ANSI lane; 128-bit stays
    // exact (DuckDB mirrors in HUGEINT)
    def sq(c: Column): Column = c.cast("decimal(38,0)") * c
    when(sq(s0 + 1) <= x.cast("decimal(38,0)"), s0 + 1)
      .when(sq(s0) <= x.cast("decimal(38,0)"), s0)
      .otherwise(s0 - 1)
  }

  /** [[isqrt]]'s DuckDB spelling; `x` must be a side-effect-free
    * expression (it is interpolated several times).
    */
  def isqrtSql(x: String): String = {
    val s0 = s"floor(sqrt(($x)::DOUBLE))::BIGINT"
    s"(CASE WHEN ($s0 + 1)::HUGEINT * ($s0 + 1) <= ($x)::HUGEINT THEN $s0 + 1 " +
      s"WHEN ($s0)::HUGEINT * $s0 <= ($x)::HUGEINT THEN $s0 ELSE $s0 - 1 END)"
  }

  /** Temperature-rebalanced mixture sampling at α = 1/2 — the
    * multilingual/multi-source rebalance of mT5/XLM-R (sample
    * probability ∝ (source share)^α, α < 1 flattens the head and
    * up-weights the tail) composed from the engine's two existing
    * mixture disciplines, in exact integer arithmetic:
    *
    *  - per-stratum token mass m_s (one tiny aggregate);
    *  - temperature weight w_s = isqrt(m_s) — m^(1/2) is the one
    *    sub-linear power with an EXACT integer form ([[isqrt]]), so
    *    the rebalance stays engine-identical (arbitrary α needs float
    *    pow and would demote the catalog check to approximate);
    *  - the largest feasible global scale, [[mixtureResample]]'s
    *    arithmetic in token units: k1000 = min_s floor(1000·m_s/w_s),
    *    budget B_s = floor(k1000·w_s/1000) ≤ m_s — the binding
    *    stratum keeps ~all its tokens, every other stratum keeps
    *    tokens proportional to √(its mass);
    *  - fill-to-budget within each stratum in deterministic id-hash
    *    order — [[tokenBudgetSample]]'s exact keep rule through the
    *    same shared two-phase-prefix core ([[fillToBudget]]).
    *
    * Strata with zero token mass keep nothing (their weight would be
    * 0; they cannot bind the min). Cost shape at 100 TB: two tiny
    * per-stratum aggregates + one 1-row global min, then the
    * fill-to-budget plan whose sort tracks the BUDGET, not the
    * corpus. Output: idCol, stratumCol, n_tok, tok_before.
    */
  def temperatureResample(df: DataFrame, idCol: String, stratumCol: String,
      nTokCol: String, buckets: Int = 32): DataFrame = {
    val masses = df.groupBy(col(stratumCol))
      .agg(sum(col(nTokCol).cast("long")).as("_m"))
      .filter(col("_m") > 0L)
      .withColumn("_w", isqrt(col("_m")))
    // the ×1000 products run in decimal(38,0): m·1000 wraps Long past
    // ~9.2e15 tokens per stratum, and k1000·w past ~9.2e18/w — the
    // isqrt/HITS overflow discipline (DuckDB mirrors in HUGEINT)
    val k = masses.agg(
      min(expr("cast(_m as decimal(38,0)) * 1000 div _w")).as("_k1000"))
    val budgets = masses.crossJoin(broadcast(k))
      .select(col(stratumCol),
        expr("cast(_k1000 as decimal(38,0)) * _w div 1000").as("_budget"))
    fillToBudget(df, idCol, stratumCol, nTokCol,
      off => off.join(broadcast(budgets), Seq(stratumCol)), buckets)
  }

  /** Balanced shard assignment by token mass — the training-data
    * shard writer's placement rule: distribute docs over `shards`
    * output shards so every shard carries near-equal TOKEN mass (a
    * doc-count round-robin over skewed doc lengths yields shards a
    * long-doc tail makes 2–3× heavier — stragglers in every data-
    * parallel training epoch). Deterministic boustrophedon ("snake")
    * over the token-descending global order: rank docs by
    * (n_tok DESC, seeded-hash, id), then row r goes to shard
    * `r mod K` on even passes and `K-1 - r mod K` on odd passes —
    * each K-row pass places exactly one doc per shard with the
    * pass-to-pass direction flip canceling the within-pass descent,
    * so the max-min shard imbalance is bounded by ONE document's
    * tokens per pass pair and in practice lands within the largest
    * single doc (PipelineOpsSpec pins the bound).
    *
    * The global rank is [[epochOrder]] with tier = −n_tok — literally
    * the same two-phase prefix count (per-(tier, hash-bucket) rank +
    * triangular offsets, no global-order window at any corpus size),
    * so the shard assigner and the curriculum orderer CANNOT rank
    * differently. Equal-length docs sub-bucket by seeded hash, so a
    * corpus of mostly short equal-length docs still fans out across
    * `buckets` window partitions instead of funneling one task.
    * Output: idCol, n_tok, pos (the global 0-based rank), shard.
    */
  def shardByTokens(df: DataFrame, idCol: String, nTokCol: String,
      shards: Int, seed: String, buckets: Int = 32): DataFrame = {
    require(shards >= 1, s"shardByTokens: shards must be >= 1, got $shards")
    val tiers = df.select(col(idCol),
      (-col(nTokCol).cast("long")).as("_negtok"))
    val k = lit(shards.toLong)
    epochOrder(tiers, idCol, "_negtok", seed, buckets)
      .select(col(idCol), (-col("_negtok")).as("n_tok"), col("pos"),
        when(pmod(expr(s"pos div $shards"), lit(2L)) === 0L,
            pmod(col("pos"), k))
          .otherwise(k - 1L - pmod(col("pos"), k)).as("shard"))
  }

  /** PUBLISH the corpus as train-ready shards — the export step
    * between [[shardByTokens]]' assignment and a training run's data
    * loader, which until this op existed only as a query result.
    * Writes two tables under `path`:
    *
    *   - `$path/data`: (idCol, textCol, n_tok, shard), directory-
    *     partitioned BY SHARD ([[graft.jobs.Sinks.layout]] — each
    *     shard is a self-contained directory a loader mounts directly;
    *     within a shard, files sort by id for deterministic iteration
    *     order), with the token-balance guarantee shardByTokens
    *     proves: max−min shard token mass bounded by one document.
    *   - `$path/manifest`: one row per shard (shard, n_docs,
    *     n_tokens) — the release accounting a loader checks BEFORE
    *     reading data (steps-per-epoch, balance verification), and
    *     the COMMIT MARKER: it is written LAST, so a crashed publish
    *     leaves data files with no manifest and [[readShardManifest]]
    *     fails by name instead of a loader silently training on a
    *     partial release (the index families' append-then-commit
    *     posture, applied to the export surface). Re-publishing to
    *     the same path overwrites atomically per-table in that same
    *     order.
    *
    * `nTokCol` is caller-supplied (the tokenization is the caller's
    * policy, as in [[shardByTokens]]); the assignment join back to
    * the payload is id-keyed. Scale shape: the assignment's two-phase
    * prefix count (no global-order window), one id-keyed join of
    * assignment (2 longs/doc) back to the payload, one range-
    * partitioned write, and a shard-count-sized aggregate for the
    * manifest.
    */
  def publishShards(df: DataFrame, idCol: String, textCol: String,
      nTokCol: String, path: String, shards: Int, seed: String,
      buckets: Int = 32, numFiles: Int = 0): Unit = {
    val asg = shardByTokens(df.select(col(idCol), col(nTokCol)),
      idCol, nTokCol, shards, seed, buckets)
    val data = df.select(col(idCol), col(textCol))
      .join(asg.select(col(idCol), col("n_tok"), col("shard")), Seq(idCol))
    graft.jobs.Sinks.layout(
      data.select(col(idCol), col(textCol), col("n_tok"), col("shard")),
      s"$path/data", partitionCols = Seq("shard"),
      sortCols = Seq(idCol),
      numFiles = if (numFiles > 0) numFiles else shards)
    // manifest LAST — the commit marker; computed from the written
    // data so it attests what is actually on disk
    df.sparkSession.read.parquet(s"$path/data")
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/manifest")
  }

  /** The published release's per-shard accounting — REQUIRED with a
    * named error when absent: data files without a manifest are an
    * uncommitted (crashed) publish and must not be read as a release.
    */
  def readShardManifest(s: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    try {
      val m = s.read.parquet(s"$path/manifest")
      m.head(1) // force existence/readability now, not at first action
      m
    } catch {
      case e: Exception => throw new IllegalStateException(
        s"readShardManifest: cannot read $path/manifest — a data " +
          "directory without a manifest is an UNCOMMITTED publish " +
          "(crashed before its commit marker); re-run publishShards " +
          "rather than reading partial data as a release", e)
    }

  /** Sequence packing: concat-then-chunk bin assignment. Docs are
    * ordered by (id-hash bucket, id-hash, id) and each doc's bin is its
    * start offset div `budget` — the global running sum computed as a
    * TWO-PHASE prefix sum (per-bucket exclusive cumsum + triangular
    * bucket offsets) so no global-order window exists. Output: input
    * id column, start_tok, bin.
    */
  def packSequences(df: DataFrame, idCol: String, nTokCol: String,
      budget: Long, buckets: Int = 32): DataFrame = {
    val docs = df
      .select(col(idCol), col(nTokCol).cast("long").as("n_tok"),
        TextHashing.hash60(col(idCol).cast("string")).as("h"))
      .withColumn("bucket", pmod(col("h"), lit(buckets.toLong)))
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("h").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = docs.withColumn("local_cum",
      coalesce(sum(col("n_tok")).over(w), lit(0L)))
    val totals = docs.groupBy(col("bucket")).agg(sum(col("n_tok")).as("tot"))
    val offsets = totals.join(
        broadcast(totals.select(col("bucket").as("b2"), col("tot").as("t2"))),
        col("b2") < col("bucket"), "left")
      .groupBy(col("bucket"))
      .agg(coalesce(sum(col("t2")), lit(0L)).as("bucket_off"))
    local.join(broadcast(offsets), Seq("bucket"))
      .select(col(idCol),
        (col("bucket_off") + col("local_cum")).as("start_tok"),
        expr(s"(bucket_off + local_cum) div $budget").as("bin"))
  }

  /** Deterministic epoch ordering with curriculum tiers — the
    * training-order generator of a data pipeline: every row gets a
    * GLOBAL 0-based position `pos` such that (a) tiers are strictly
    * ordered (every tier-0 row precedes every tier-1 row — curriculum:
    * clean/easy data first), (b) within a tier the order is a seeded
    * hash shuffle (`hash60(seed ':' id)` — a new seed string per epoch
    * reshuffles deterministically; the same seed replays the exact
    * order, the property that makes a training run resumable and
    * reproducible), ties to the smaller id. The precise within-tier
    * key is (h mod `buckets`, h, id) — bucket-major, so the global
    * rank decomposes exactly into per-bucket ranks plus offsets; for
    * a hash shuffle the bucket-major and plain-h orders are equally
    * random.
    *
    * The global position is computed WITHOUT a global-order window
    * (the [[packSequences]] two-phase discipline): rows rank inside
    * (tier, hash-bucket) partitions, and each partition adds a
    * triangular offset — counts, not data, cross the wire. Output:
    * idCol, tierCol, pos.
    */
  def epochOrder(df: DataFrame, idCol: String, tierCol: String,
      seed: String, buckets: Int = 32): DataFrame = {
    require(buckets >= 1, s"epochOrder: buckets must be >= 1, got $buckets")
    // A null or non-numeric tier must fail loudly: a silent cast-to-null
    // would drop the row from the inequality offsets self-join, alias it
    // onto _off=0 and duplicate `pos` values — breaking the documented
    // global-bijection property. raise_error is map-side (no extra pass).
    val tierChecked = when(col(tierCol).cast("long").isNull,
        raise_error(concat(
          lit(s"epochOrder: null or non-numeric '$tierCol' tier for id "),
          col(idCol).cast("string"))))
      .otherwise(col(tierCol).cast("long"))
    val docs = df
      .select(col(idCol), tierChecked.as("_tier"),
        TextHashing.hash60(
          concat(lit(seed), lit(":"), col(idCol).cast("string"))).as("_h"))
      .withColumn("_bucket", pmod(col("_h"), lit(buckets.toLong)))
    val w = Window.partitionBy(col("_tier"), col("_bucket"))
      .orderBy(col("_h").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = docs.withColumn("_local",
      coalesce(count(lit(1)).over(w), lit(0L)))
    val totals = docs.groupBy(col("_tier"), col("_bucket"))
      .agg(count(lit(1)).as("_tot"))
    val offsets = totals.join(
        broadcast(totals.select(col("_tier").as("_t2"),
          col("_bucket").as("_b2"), col("_tot").as("_n2"))),
        col("_t2") < col("_tier") ||
          (col("_t2") === col("_tier") && col("_b2") < col("_bucket")),
        "left")
      .groupBy(col("_tier"), col("_bucket"))
      .agg(coalesce(sum(col("_n2")), lit(0L)).as("_off"))
    local.join(broadcast(offsets), Seq("_tier", "_bucket"))
      .select(col(idCol), col("_tier").as(tierCol),
        (col("_off") + col("_local")).as("pos"))
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}

/** Physical-plan regression guards: the properties that make the catalog
  * 100TB-viable are asserted, not eyeballed — filter/column pushdown
  * reaching the parquet scans, broadcasts on the small sides, bounded
  * shuffle counts, codegen on the hot paths.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan

  private def planString(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  // AQE-boundary flattening is shared suite infrastructure — one
  // definition in SparkSpec.collectAll
  private def collectAll(p: SparkPlan): Seq[SparkPlan] =
    SparkSpec.collectAll(p)

  test("q02: behavior filter is pushed to the parquet scan") {
    val s = planString("q02_hot_items_topn")
    assert(s.contains("EqualTo(event_type,view)") && s.contains("PushedFilters"),
      s"expected event_type pushdown in:\n$s")
  }

  test("q01: scan reads only the 4 needed lineitem columns") {
    val s = planString("q01_pricing_summary")
    val readSchema = s.linesIterator.filter(_.contains("ReadSchema")).mkString
    Seq("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
      .foreach(c => assert(readSchema.contains(c), s"missing $c in $readSchema"))
    assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_comment"),
      s"over-read: $readSchema")
  }

  test("q14: dimension join is a broadcast, not a shuffle join") {
    val nodes = collectAll(plan("q14_top_brands_by_revenue"))
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "part should broadcast-join lineitem")
  }

  test("q24: centroids and queries broadcast; no shuffle of the corpus for assignment") {
    val nodes = collectAll(plan("q24_ann_ivf"))
    assert(nodes.count(n => n.isInstanceOf[BroadcastHashJoinExec] ||
      n.isInstanceOf[BroadcastNestedLoopJoinExec]) >= 2)
    // the ONLY shuffle allowed is the final per-qid rank exchange — the
    // corpus reaches centroid assignment and the probe join map-only
    val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeLike])
    assert(shuffles <= 1, s"expected <=1 shuffle (final rank), got $shuffles")
  }

  test("q42: benchmark gram set broadcasts; corpus side never shuffles pre-agg") {
    val nodes = collectAll(plan("q42_decontamination"))
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "benchmark grams should broadcast-join the corpus gram stream")
  }

  test("q51: bucketized range join is a hash join, not a nested loop") {
    val nodes = collectAll(plan("q51_range_band_join"))
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "bucketization should yield an equi hash join")
    assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "the BETWEEN theta-join shape (nested loop) must not appear")
  }

  test("global top-k queries use TakeOrderedAndProject, not a global sort") {
    Seq("q14_top_brands_by_revenue", "q23_embedding_topk_pairs", "q39_ann_lsh",
      "q55_priority_sample")
      .foreach { q =>
        val nodes = collectAll(plan(q))
        assert(nodes.exists(
          _.isInstanceOf[org.apache.spark.sql.execution.TakeOrderedAndProjectExec]),
          s"$q: no TakeOrderedAndProject in\n${planString(q)}")
      }
  }

  test("no catalog query contains an unpartitioned WindowExec") {
    // an empty partitionSpec funnels ALL rows through one task — the
    // named 100TB scale-killer; every window must be partitioned (a
    // constant key over a SinglePartition input is fine: tiny post-limit
    // rank derivation, no exchange, no warning)
    SparkEntry.catalog.foreach { q =>
      val offenders = collectAll(q.build(spark, sf).queryExecution.executedPlan)
        .collect {
          case w: org.apache.spark.sql.execution.window.WindowExecBase
              if w.partitionSpec.isEmpty => w.nodeName
        }
      assert(offenders.isEmpty, s"${q.name}: unpartitioned windows $offenders")
    }
  }

  test("map-only pipeline queries have ZERO shuffles") {
    Seq("q16_token_stats", "q17_quality_score", "q18_lang_id",
      "q19_doc_fingerprint", "q22_simhash_fingerprint", "q26_multimodal_meta",
      "q38_text_normalize", "q44_repetition_filter", "q45_stratified_sample",
      "q52_pii_redaction", "q69_vec_quantize", "q124_token_entropy",
      "q144_markup_strip", "q145_link_extraction")
      .foreach { q =>
        val shuffles = collectAll(plan(q)).count(_.isInstanceOf[ShuffleExchangeLike])
        assert(shuffles == 0, s"$q: expected map-only, got $shuffles shuffles")
      }
  }

  test("q156/q157: the two-phase rank/budget offset joins BROADCAST — " +
      "the corpus never meets a sort-merge join, and no global sort " +
      "exists") {
    Seq("q156_shard_by_tokens", "q157_temperature_mixture").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect() // finalize AQE
      val nodes = collectAll(df.queryExecution.executedPlan)
      assert(!nodes.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.joins.SortMergeJoinExec]),
        s"$q: offset/budget join regressed to a shuffled sort-merge join")
      // the only sorts are the window's per-partition sorts
      val globalSorts = nodes.collect {
        case s: org.apache.spark.sql.execution.SortExec if s.global => s
      }
      assert(globalSorts.isEmpty, s"$q: global sort found — the " +
        s"two-phase prefix discipline exists to avoid exactly this")
    }
  }

  test("q158: the corpus pass happens ONCE (checkpointed rolled frame); " +
      "the card's join/ppm plan never touches documents again") {
    val df = SparkEntry.queries("q158_dataset_card")(spark, sf)
    df.collect()
    val nodes = collectAll(df.queryExecution.executedPlan)
    // the rolled group-count frame localCheckpoints after its one
    // Expand+aggregate pass, so the FINAL plan (both the card rows and
    // the broadcast grand-total branch) must read the checkpointed
    // RDD — any FileSourceScan here means the total re-tokenized the
    // corpus (the exact double-scan Catalyst produces without the
    // eager cut: the grand-row filter pushes below the aggregate into
    // its own Expand branch and exchange reuse breaks)
    val scans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.isEmpty,
      s"final plan re-scans the corpus (${scans.size} scans):\n" +
        df.queryExecution.executedPlan)
    assert(nodes.count(_.isInstanceOf[ShuffleExchangeLike]) == 0,
      "post-checkpoint card work should be broadcast-only")
    assert(!nodes.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.CartesianProductExec]))
    // and the checkpointed pass ITSELF (invisible above) keeps its
    // shape: one Expand feeding all four grouping levels, one corpus
    // scan, one exchange — pinned on the factored pre-checkpoint frame
    val pre = graft.api.TextOps.datasetCardRolled(
      Tables.documents(spark, sf), "doc_id", "text", "source", "lang",
      " the ")
    pre.collect()
    val preNodes = collectAll(pre.queryExecution.executedPlan)
    assert(preNodes.count(_.isInstanceOf[
      org.apache.spark.sql.execution.ExpandExec]) == 1,
      "expected exactly one Expand in the corpus pass")
    assert(preNodes.count(_.isInstanceOf[
      org.apache.spark.sql.execution.FileSourceScanExec]) == 1,
      "the corpus pass must scan documents exactly once")
    assert(preNodes.count(_.isInstanceOf[ShuffleExchangeLike]) <= 1,
      "the corpus pass is one partial+final aggregate")
  }

  test("q171: the maintained card probe never scans the corpus — " +
      "every file scan in the pre-render pass reads the leaf-stats " +
      "parquet, one Expand feeds all grouping levels, and the " +
      "rendered plan is checkpoint+broadcast only") {
    val ix = graft.queries.PipelineQueries.foldedCardDir(spark, sf)
    val df = graft.api.CardOps.datasetCardAgainstIndex(spark, ix)
    df.collect()
    val nodes = collectAll(df.queryExecution.executedPlan)
    // post-checkpoint: the q158 render contract verbatim
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]),
      "rendered card plan re-reads files")
    assert(nodes.count(_.isInstanceOf[ShuffleExchangeLike]) == 0,
      "post-checkpoint card work should be broadcast-only")
    // pre-render: leaf-stats scan only — a documents scan here means
    // the 'no corpus rescan' claim of the whole family is false
    val pre = graft.api.CardOps.cardRolledFromIndex(spark, ix,
      "source", "lang")
    pre.collect()
    val preNodes = collectAll(pre.queryExecution.executedPlan)
    val scans = preNodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty && scans.forall(
        _.relation.location.rootPaths.forall(_.toString.contains(ix))),
      s"card probe scans outside the index:\n$scans")
    assert(preNodes.count(_.isInstanceOf[
      org.apache.spark.sql.execution.ExpandExec]) == 1,
      "expected exactly one Expand in the leaf rollup")
  }

  test("q159: HITS rounds move vertex-count rows — no cartesian " +
      "product, every renorm max is a broadcast") {
    val df = SparkEntry.queries("q159_host_hits")(spark, sf)
    df.collect()
    val nodes = collectAll(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.CartesianProductExec]),
      "round-max renorm must be a broadcast nested loop, not cartesian")
  }

  test("q151: the boilerplate marker join BROADCASTS — the corpus-sized " +
      "line stream reaches its re-assembly exchange unshuffled") {
    val df = SparkEntry.queries("q151_line_dedup")(spark, sf)
    df.collect() // finalize AQE
    val nodes = collectAll(df.queryExecution.executedPlan)
    // the left-outer marker join must be a broadcast (the common set
    // is boilerplate-sized); a shuffled join here would move the whole
    // exploded line stream twice
    val joins = nodes.collect { case j: BroadcastHashJoinExec => j }
    assert(joins.exists(_.joinType.toString == "LeftOuter"),
      s"expected a broadcast LeftOuter marker join, got:\n" +
        df.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.SortMergeJoinExec]),
      "marker join regressed to a shuffled sort-merge join")
  }

  test("q146: exactly ONE host-keyed exchange on URL-sized rows — the " +
      "branch-free window formulation keeps the dedup aggregate, host " +
      "stats, and rank cut partition-local on the one repartition") {
    val df = SparkEntry.queries("q146_frontier_budget")(spark, sf)
    df.collect()
    val nodes = collectAll(df.queryExecution.executedPlan)
    val exchanges = nodes.collect { case s: ShuffleExchangeLike => s }
    assert(exchanges.nonEmpty, "no exchange at all — not the claimed plan")
    assert(exchanges.map(_.id).distinct.size == 1,
      s"expected ONE distinct host exchange (reused), got " +
        s"${exchanges.map(_.id).distinct.size}:\n" +
        df.queryExecution.executedPlan)
    assert(exchanges.head.outputPartitioning.toString.contains("host"),
      s"exchange not keyed on host: ${exchanges.head.outputPartitioning}")
  }

  test("parseRobots plans exactly ONE exchange (the host-keyed group " +
      "windows) — the text→rules step is rules-sized work, and the " +
      "parsed frame stays broadcastable") {
    import org.apache.spark.sql.functions.{concat, lit}
    val bodies = spark.range(9).select(
      concat(lit("ex"), col("id").cast("string"), lit(".org")).as("host"),
      concat(lit("User-agent: *\nDisallow: /hub/\nAllow: /hub/"),
        col("id").cast("string"), lit("\n")).as("body"))
    val df = graft.api.TextOps.parseRobots(bodies, "host", "body")
    df.collect()
    val nodes = collectAll(df.queryExecution.executedPlan)
    val exchanges = nodes.collect { case s: ShuffleExchangeLike => s }
    assert(exchanges.map(_.id).distinct.size <= 1,
      s"parseRobots should reuse ONE host exchange, got " +
        s"${exchanges.map(_.id).distinct.size}:\n" +
        df.queryExecution.executedPlan)
    exchanges.headOption.foreach(e =>
      assert(e.outputPartitioning.toString.contains("host"),
        s"exchange not keyed on host: ${e.outputPartitioning}"))
  }

  test("q167: the weighted deployed scheduler joins without cartesian " +
      "or nested-loop shapes; the closing host join broadcasts") {
    val df = SparkEntry.queries("q167_weighted_frontier_priority")(spark, sf)
    df.collect()
    val nodes = collectAll(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.CartesianProductExec]),
      "cartesian product in the weighted scheduler")
    assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "nested-loop join in the weighted scheduler")
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "the host-count rank frame should broadcast into the budget leg")
  }

  test("q64 latest-state is one shuffle of partial-agg survivors, no sort") {
    // the latest_by formulation's whole point: no rank window (which
    // would sort every key's full history) AND no SortAggregate (which
    // built-in max_by's struct buffer forces — a per-task sort of the
    // change log); one hash exchange of |keys| partials
    val nodes = collectAll(plan("q64_latest_state"))
    assert(nodes.count(_.isInstanceOf[ShuffleExchangeLike]) == 1,
      planString("q64_latest_state"))
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExecBase]),
      s"q64 must not plan a window:\n${planString("q64_latest_state")}")
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.aggregate.SortAggregateExec]),
      s"q64 must hash-aggregate, not sort:\n${planString("q64_latest_state")}")
    assert(nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec]),
      s"q64 should use ObjectHashAggregate:\n${planString("q64_latest_state")}")
  }

  test("q64 shuffle carries partial-agg survivors, not the change log") {
    // runtime proof of the map-side collapse: the exchange's write
    // metric must be far below the event count (bounded by
    // |keys| x tasks), or latestState is shuffling the full history
    val df = SparkEntry.queries("q64_latest_state")(spark, sf)
    df.collect()
    val written = collectAll(df.queryExecution.executedPlan)
      .collect { case s: ShuffleExchangeLike => s }
      .map(_.metrics("shuffleRecordsWritten").value).sum
    val events = spark.read.parquet(s"$sf/events.parquet").count()
    assert(written > 0 && written < events / 2,
      s"shuffle carried $written of $events change-log rows")
  }

  test("q67 per-user aggregate reuses the lag window's partitioning") {
    // window exchange on user_id, then groupBy(user_id) must NOT add a
    // second exchange — same key domain
    val shuffles = collectAll(plan("q67_interarrival_bots"))
      .count(_.isInstanceOf[ShuffleExchangeLike])
    assert(shuffles == 1,
      s"expected 1 shuffle, got $shuffles:\n${planString("q67_interarrival_bots")}")
  }

  test("q01 aggregates with partial (map-side) aggregation") {
    val s = planString("q01_pricing_summary")
    // two HashAggregate nodes per agg: partial then final
    assert(s.linesIterator.count(_.contains("HashAggregate")) >= 2, s)
  }

  test("q03: exactly one shuffle (the windowed aggregation exchange)") {
    val shuffles = collectAll(plan("q03_page_views"))
      .count(_.isInstanceOf[ShuffleExchangeLike])
    assert(shuffles == 1, s"expected 1 shuffle, got $shuffles")
  }

  test("hot paths stay inside WholeStageCodegen") {
    Seq("q01_pricing_summary", "q02_hot_items_topn", "q16_token_stats",
      "q22_simhash_fingerprint").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect() // executes THIS QueryExecution → AQE finalizes in place
      // (count() would wrap a new plan and leave this one un-finalized)
      val s = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(s.contains("codegen id :"), s"$q has no codegen span:\n$s")
    }
  }

  test("fine-slide sliding jobs plan NO per-event Expand") {
    // 120-720 windows/event: window()'s Expand multiplies shuffle input
    // by the window count AND its generated switch hits the
    // expand_switchCaseCode nested-class codegen bug (silent interpreted
    // fallback — loud now via spark.sql.codegen.fallback=false). The
    // two-level SlidingCounts shape must keep these plans Expand-free.
    import graft.jobs.{Jobs, Schemas, Sources}
    val clicks = spark.range(4).selectExpr("id AS userId", "id AS adId",
      "'p' AS province", "'c' AS city",
      "timestamp_seconds(1511658000 + id * 60) AS ts")
    val mkt = spark.range(4).selectExpr("'u' AS userId", "'CLICK' AS behavior",
      "'wechat' AS channel", "timestamp_seconds(1600000000 + id) AS ts")
    val log = spark.range(4).selectExpr("'1.1.1.1' AS ip", "'GET' AS method",
      "'/a' AS url", "timestamp_seconds(1431857103 + id) AS ts")
    Seq(
      "adClicksByProvince" -> Jobs.adClicksByProvince(clicks),
      "marketingByChannel" -> Jobs.marketingByChannel(mkt),
      "marketingTotal" -> Jobs.marketingTotal(mkt),
      "hotUrls" -> Jobs.hotUrls(log)
    ).foreach { case (name, df) =>
      df.collect() // finalize AQE + prove the plan compiles (fallback off)
      val expands = collectAll(df.queryExecution.executedPlan)
        .count(_.isInstanceOf[org.apache.spark.sql.execution.ExpandExec])
      assert(expands == 0, s"$name: $expands ExpandExec nodes")
    }
  }

  test("q84: rank-limit pushdown prunes per-source groups before the exchange") {
    // the scale property capPerKey's doc claims: WindowGroupLimit keeps
    // each task's local top-cap per key, so the window exchange carries
    // O(sources x cap) — without the pushdown it would carry the corpus
    val nodes = collectAll(plan("q84_per_source_cap"))
    assert(nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowGroupLimitExec]),
      s"no WindowGroupLimit in:\n${planString("q84_per_source_cap")}")
  }

  test("AQE splits a skewed planner-inserted join at runtime") {
    // the load-bearing claim behind q88's model join and q35's fact
    // join: a hot key in a PLANNER-inserted exchange is not a lost
    // reducer — AQE's OptimizeSkewedJoin splits the oversized
    // partition and replicates the matching side. (A USER repartition
    // would opt out of this — which is exactly why bigramLmScore
    // dropped its explicit repartition in round 7.)
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.get(k))
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // one hot key carrying ~100k rows vs 99 cold keys with one row
      // each. The payload must be INCOMPRESSIBLE (md5 chains, not a
      // repeated literal) and SURVIVE column pruning into the shuffle
      // (selected in the output) — skew detection reads compressed
      // map-output sizes, and a pruned or compressible pad shrinks
      // the hot partition below any threshold
      val left = spark.range(100000).selectExpr(
        "CASE WHEN id < 99 THEN id + 1 ELSE 0 END AS k",
        "concat(md5(cast(id as string)), md5(cast(id+1 as string))) AS pad")
      val right = spark.range(100).selectExpr("id AS k", "id * 10 AS w")
      val joined = left.join(right, "k").select(col("k"), col("w"), col("pad"))
      // collect() executes THIS QueryExecution so AQE finalizes in
      // place (count() would wrap a new plan — the codegen-test trap)
      assert(joined.collect().length == 100000)
      val smjs = collectAll(joined.queryExecution.executedPlan).collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(smjs.nonEmpty, "expected a SortMergeJoin")
      assert(smjs.exists(_.isSkewJoin),
        s"AQE did not mark the join skew=true:\n${smjs.map(_.nodeName)}")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("q114 semantic leg: no nested-loop join against the corpus") {
    // the scale property that makes hybridTopKIvfPq the 100-TB leg:
    // the brute variant's semantic leg is a broadcast theta-join
    // (every corpus vector dotted per query — a
    // BroadcastNestedLoopJoin), the IVF-PQ variant routes queries to
    // cells and equi-joins the codes parquet. Assert the contrast so
    // the absence check cannot go vacuous.
    import graft.queries.PipelineQueries
    val docs = Tables.documents(spark, sf)
    val qs = docs.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id").as("qid"), col("text"))
    val iv = graft.api.TextOps.hybridTopKIvfPq(docs, qs,
      "doc_id", "text", "qid", PipelineQueries.hybridIvfPqDir(spark, sf),
      k = 10, nprobe = 3)
    val ivNodes = collectAll(iv.queryExecution.executedPlan)
    assert(!ivNodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "IVF-PQ hybrid must not plan a nested-loop join anywhere")
    val br = graft.api.TextOps.hybridTopK(docs, qs,
      "doc_id", "text", "qid", k = 10)
    assert(collectAll(br.queryExecution.executedPlan)
      .exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "brute hybrid's semantic leg should be the nested-loop contrast")
    // and the codes scan is partition-PRUNED to the routed cells
    val codesScans = ivNodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("codes"))
        => f
    }
    assert(codesScans.nonEmpty && codesScans.forall(_.partitionFilters.nonEmpty),
      "codes scan should carry cell partition filters (literal pruning)")
  }

  test("q132: literal key filters prune BUCKETS on both scans; the " +
      "co-located join stays exchange-free") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val nodes = collectAll(plan("q132_bucket_pruned_read"))
    val scans = nodes.collect {
      case f: FileSourceScanExec if f.relation.bucketSpec.isDefined => f }
    assert(scans.size >= 2, s"expected both bucketed scans, got $scans")
    scans.foreach { f =>
      val sel = f.optionalBucketSet
      assert(sel.isDefined, s"no bucket pruning on ${f.nodeName}")
      val n = sel.get.cardinality()
      assert(n > 0 && n < 8,
        s"expected a strict bucket subset of 8, got $n selected")
    }
    // pruning must not cost the layout its co-location: the join is
    // still a zero-exchange sort-merge over the surviving buckets
    assert(nodes.exists(_.isInstanceOf[SortMergeJoinExec]))
    assert(nodes.count(_.isInstanceOf[ShuffleExchangeLike]) <= 1,
      "expected at most the final rollup exchange")
  }

  test("q121: bucketed fact join plans zero join exchange; " +
      "plain parquet pays two plus sorts") {
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    // the bucketed plan: the ONLY shuffle is the 5-group rollup — the
    // join itself reads co-located, pre-sorted buckets
    val nodes = collectAll(plan("q121_bucketed_join"))
    assert(nodes.exists(_.isInstanceOf[SortMergeJoinExec]),
      "bucketed join should sort-merge-join")
    assert(nodes.count(_.isInstanceOf[ShuffleExchangeLike]) == 1,
      s"expected exactly the rollup exchange, got " +
        nodes.filter(_.isInstanceOf[ShuffleExchangeLike]).mkString("; "))
    // (the join's sorts remain, but they are bucket-LOCAL — Spark ≥3
    // does not trust writer sort metadata by default, SPARK-28595; the
    // exchange elimination is the 100-TB win)
    // non-vacuous contrast: the same merge join over plain parquet
    // shuffles and sorts both sides
    val pl = Tables.lineitem(spark, sf).hint("merge")
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_items"))
    val plain = collectAll(pl.queryExecution.executedPlan)
    assert(plain.count(_.isInstanceOf[ShuffleExchangeLike]) >= 3 &&
      plain.count(_.isInstanceOf[SortExec]) >= 2,
      "plain-parquet contrast should pay two join exchanges + sorts")
    // the same layout serves aggregation: grouping by the bucket key
    // satisfies the hash-aggregate's distribution at read time —
    // ZERO exchanges anywhere
    val (li, _) = graft.queries.OlapQueries.bucketedPair(spark, sf)
    val agg = spark.table(li).groupBy(col("l_orderkey"))
      .agg(org.apache.spark.sql.functions.sum(col("l_quantity")))
    assert(collectAll(agg.queryExecution.executedPlan)
      .count(_.isInstanceOf[ShuffleExchangeLike]) == 0,
      "bucketed groupBy on the bucket key should plan no exchange")
  }

  test("q122: both box-filter dims reach the z-ordered scan as " +
      "PushedFilters") {
    val scans = collectAll(plan("q122_zorder_box")).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val pushed = scans.map(_.metadata("PushedFilters")).mkString(" ")
    for (c <- Seq("user_id", "us")) {
      assert(pushed.contains(s"GreaterThanOrEqual($c") &&
        pushed.contains(s"LessThanOrEqual($c"),
        s"expected both range bounds on $c pushed to parquet: $pushed")
    }
  }

  test("q128: queries broadcast; the rank window is the only exchange") {
    val nodes = collectAll(plan("q128_passage_retrieval"))
    // the not-own-doc condition is non-equi, so the brute leg is a
    // broadcast NESTED-LOOP over the streamed chunks — the q112 brute
    // shape, and exactly what the IVF-PQ swap replaces at scale
    assert(nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]),
      "the human-scale query side should broadcast (nested-loop brute leg)")
    // chunk explode + both embeddings are map-only; the per-qid rank
    // window is the single exchange (at 100TB the brute scan swaps
    // for the IVF-PQ probe and this stays the only exchange)
    assert(nodes.count(_.isInstanceOf[ShuffleExchangeLike]) <= 1,
      "expected at most the rank-window exchange")
  }

  test("q129: no nested loop anywhere; chunk-codes scan is cell-pruned") {
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    val nodes = collectAll(plan("q129_passage_retrieval_ivfpq"))
    // the brute contrast reads the materialized passage stage, so the
    // WHOLE query — probe, refine, and oracle legs — plans zero
    // nested-loop joins (the q128 brute shape is entirely absent)
    assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "q129 must not plan a nested-loop join anywhere")
    val codesScans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("codes"))
        => f
    }
    assert(codesScans.nonEmpty && codesScans.forall(_.partitionFilters.nonEmpty),
      "chunk-codes scan should carry cell partition filters")
  }

  test("q133/q135/q139: the real-decode hash tables carry no KEYED " +
      "exchange — at most the round-robin decode spread") {
    // round 16: Multimodal.spreadForDecode may insert ONE round-robin
    // repartition below the decode when the payload scan produced
    // fewer splits than cores (cheap-input/expensive-map — guide §2.5);
    // it is conditional (absent once the scan has >= cores splits, i.e.
    // at any real corpus size) and never hash-partitions by a key.
    // The AUDIO builder (q135) deliberately has NO spread — the 8-bit
    // PCM header parse is cheaper than the exchange (round-16 A/B,
    // 0.30 → 0.56 s) — so its pin is exactly ZERO shuffles; an
    // accidental spread on the audio path must fail here (ADVICE r16).
    for (q <- Seq("q133_image_phash", "q139_video_phash")) {
      val nodes = collectAll(plan(q))
      val shuffles = nodes.collect { case e: ShuffleExchangeLike => e }
      assert(shuffles.size <= 1,
        s"$q should be scan -> [spread] -> decode -> hash projection")
      assert(shuffles.forall(_.outputPartitioning.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning]),
        s"$q must never key-partition the decode input")
    }
    assert(!collectAll(plan("q135_audio_fingerprint"))
        .exists(_.isInstanceOf[ShuffleExchangeLike]),
      "q135 must plan ZERO shuffles (no decode spread on the audio path)")
  }

  test("q130: strict contiguity is ONE lead() window pass — a single " +
      "user-key exchange, no joins") {
    val nodes = collectAll(plan("q130_strict_sequence"))
    // the oracle's rn-self-join spelling is the O(pairs) contrast; the
    // Spark side must never plan a join at all
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec]),
      "q130 must not plan any join (k adjacent rows = one lead() pass)")
    val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeLike])
    assert(shuffles <= 1, s"expected the single user-key exchange, got $shuffles")
  }

  test("q131: funnel type filter reaches the scan; one exchange, no joins") {
    val s = planString("q131_session_funnel")
    assert(s.contains("In(event_type") && s.contains("PushedFilters"),
      s"expected funnel-type pushdown in:\n$s")
    val nodes = collectAll(plan("q131_session_funnel"))
    // k-1 stacked last(ignoreNulls) passes share ONE (user, ts DESC)
    // sort — the oracle's LATERAL spelling is the per-pair contrast
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec]),
      "q131 must not plan any join (chained window passes)")
    val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeLike])
    assert(shuffles <= 1, s"expected the single user-key exchange, got $shuffles")
  }

  test("q129: exact refine reads STORED chunk vectors (cell-pruned), " +
      "never re-chunks or re-embeds the corpus") {
    val nodes = collectAll(plan("q129_passage_retrieval_ivfpq"))
    // the refine leg's vectors scan: persisted beside the codes by
    // writeIvfPqIndex(storeVectors = true), pruned to the routed cells
    val vecScans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("vectors"))
        => f
    }
    assert(vecScans.nonEmpty, "refine should scan the stored-vector parquet")
    assert(vecScans.forall(_.partitionFilters.nonEmpty),
      "stored-vector scan should carry cell partition filters")
    // the old scale-killer shape — chunk(corpus) + embedText per
    // retrieval batch — planned a PosExplode Generate over the corpus
    // (TextOps.chunk's signature shape); with stored vectors the whole
    // q129 plan has none. The probe's tiny query-side cell-routing
    // Explode is the only Generate allowed.
    val posExplodes = nodes.collect {
      case g: org.apache.spark.sql.execution.GenerateExec
        if g.generator.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.PosExplode] => g
    }
    assert(posExplodes.isEmpty,
      "q129 must not re-chunk the corpus (no PosExplode in the plan)")
  }

  test("no catalog query exceeds 6 shuffles at sf0.001") {
    // q89 is the COMPOSED curation pipeline — seven individually
    // budgeted operators chained over survivor sets, so its plan is
    // the sum of its stages' plans by construction. It gets a
    // composition allowance instead of the single-operator budget
    // (still bounded: a regression that doubles a stage's shuffles
    // trips this too).
    val compositionBudget = Map(
      "q89_curation_pipeline" -> 40,
      "q92_curation_report" -> 40,
      "q93_dsir_importance" -> 20,
      // two retrievers + fusion: embedText's 2 rollups + the BM25
      // leg's 2 (tf rollup, rank) + semantic rank + fusion agg +
      // final rank = 7, each individually budgeted elsewhere
      "q112_hybrid_retrieval" -> 8,
      // q114 is a COMPARISON harness: it runs BOTH hybrid variants
      // (q112's 8-shuffle budget twice) plus the per-qid agreement
      // rollups — the shipped operator itself is hybridTopKIvfPq,
      // whose own plan is covered by the nested-loop-free assertion
      "q114_hybrid_retrieval_ivfpq" -> 24,
      // q141 is the same comparison-harness shape: the deployed
      // hybrid (whose own plan ApiSpec pins as index-scans-only) vs
      // the catalog-gated hybrid, full-outer parity join + per-qid
      // rollup on top
      "q141_hybrid_deployed_parity" -> 24)
    SparkEntry.catalog.foreach { q =>
      val budget = compositionBudget.getOrElse(q.name, 6)
      val shuffles = collectAll(
        q.build(spark, sf).queryExecution.executedPlan)
        .count(_.isInstanceOf[ShuffleExchangeLike])
      assert(shuffles <= budget, s"${q.name}: $shuffles shuffles")
    }
  }
}

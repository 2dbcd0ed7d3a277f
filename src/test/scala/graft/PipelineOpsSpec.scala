package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-2 pipeline operators (decontamination,
  * TF-IDF, repetition filter, stratified sample) beyond the oracle
  * hash-match.
  */
class PipelineOpsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q42: flagged docs are non-benchmark and genuinely share an 8-gram") {
    val flagged = run("q42_decontamination").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared_grams")).toMap
    assert(flagged.nonEmpty, "fixture should contain contamination")
    flagged.keys.foreach(id => assert(id % 50 != 0, s"benchmark doc $id flagged"))
    flagged.values.foreach(n => assert(n > 0))
    // brute-force confirm one flagged doc against the benchmark set
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ", -1).as("t")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).sliding(8).map(_.mkString(" ")).toSet)
      .toMap
    val benchGrams = docs.filter(_._1 % 50 == 0).values.flatten.toSet
    val (id, n) = flagged.head
    assert(docs(id).count(benchGrams.contains) == n,
      s"doc $id: brute-force overlap != $n")
  }

  test("q43: rn dense per doc, scores non-increasing, terms from the doc") {
    val rows = run("q43_tfidf_topterms").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term"),
        r.getAs[Long]("score_x"), r.getAs[Long]("rn")))
    val total = Tables.documents(spark, sf).count()
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.size == total) // every doc has top terms
    byDoc.values.foreach { ts =>
      val sorted = ts.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1L to ts.length))
      assert(sorted.sliding(2).forall(w =>
        w.length < 2 || w(0)._3 >= w(1)._3))
    }
    // spot-check membership: every reported term occurs in its document
    val text = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSet).toMap
    rows.take(50).foreach { case (d, t, _, _) =>
      assert(text(d).contains(t), s"term '$t' not in doc $d")
    }
  }

  test("q46: clusters == brute-force union-find over the q21 pairs") {
    val pairs = run("q21_dedup_minhash_lsh").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(pairs.nonEmpty)
    // reference union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val verts = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val want = verts.map(v => v -> find(v)).toMap
    val got = run("q46_dedup_clusters").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(got == want)
    // at least one transitive chain should exist for the test to mean
    // anything beyond pairs; if not, the corpus only has 2-cliques
    val sizes = want.groupBy(_._2).map(_._2.size)
    assert(sizes.forall(_ >= 2))
  }

  test("q44: fixed-point bounds, keep threshold, gram count arithmetic") {
    val nTok = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ", -1)).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = run("q44_repetition_filter").collect()
    assert(rows.length == nTok.size)
    rows.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      val dup = r.getAs[Long]("dup_x1000")
      assert(r.getAs[Long]("total_grams") == math.max(0L, nTok(d) - 2))
      assert(dup >= 0 && dup <= 1000)
      assert(r.getAs[Boolean]("keep") == (dup <= 300))
    }
  }

  test("q50: packing is a permutation prefix-sum — offsets contiguous, bins dense") {
    val rows = run("q50_sequence_packing").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("start_tok"),
        r.getAs[Long]("bin")))
    val nTok = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ", -1)).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == nTok.size)
    // sorted by start offset, each doc begins exactly where the previous
    // ended — the two-phase prefix sum IS a single global concatenation
    val ordered = rows.sortBy(_._2)
    ordered.foldLeft(0L) { case (expected, (d, start, bin)) =>
      assert(start == expected, s"doc $d starts at $start, expected $expected")
      assert(bin == start / 2048)
      expected + nTok(d)
    }
    val bins = ordered.map(_._3)
    assert(bins.distinct.sorted.sameElements(bins.min to bins.max),
      "bins must be dense")
  }

  test("q142: token-budget mixture — per-source prefix chain from 0, " +
      "fill-to-budget coverage, budget-shaped under corpus growth") {
    import spark.implicits._
    def mk(ids: Range) = ids.map(i =>
      (i.toLong, s"src${i % 4}", 10L + (i % 7))).toDF("id", "src", "nt")
    def sample(df: org.apache.spark.sql.DataFrame) =
      graft.api.SampleOps.tokenBudgetSample(df, "id", "src", "nt",
        lit(500L)).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val base = mk(1 to 400)
    val out = sample(base)
    val totalBySrc = (1 to 400).groupBy(i => s"src${i % 4}")
      .view.mapValues(_.map(i => 10L + (i % 7)).sum).toMap
    out.groupBy(_._2).foreach { case (src, rows) =>
      // every kept doc STARTED under budget (the fill-to-budget law)
      assert(rows.forall(_._4 < 500L), s"$src kept a doc at/over budget")
      // the kept set is a PREFIX of the per-source order: sorted by
      // tok_before it chains exactly from 0 (this also proves the
      // two-phase bucket offsets stitch into one consistent prefix
      // sum — a broken offset join would leave a gap in the chain)
      val chain = rows.sortBy(_._4)
      assert(chain.head._4 == 0L, s"$src prefix does not start at 0")
      chain.sliding(2).foreach {
        case Array(a, b) => assert(b._4 == a._4 + a._3,
          s"$src chain gap between ${a._1} and ${b._1}")
        case _ => ()
      }
      // coverage: the budget is genuinely filled (or the source ran out)
      val last = chain.last
      assert(last._4 + last._3 >= 500L || rows.length == 100,
        s"$src under-filled: ${last._4 + last._3} of 500")
      assert(totalBySrc(src) > 500L, "fixture must exceed the budget")
    }
    // deterministic
    assert(sample(base).toSet == out.toSet)
    // budget-shaped: a 2x corpus still yields ~budget tokens per
    // source — kept token mass stays in [budget, budget + max doc)
    sample(mk(1 to 800)).groupBy(_._2).foreach { case (src, rows) =>
      val mass = rows.map(_._3).sum
      assert(mass >= 500L && mass < 500L + 17L,
        s"$src mass $mass escaped the budget band on the grown corpus")
    }
  }

  test("q47: approx quantiles inside the bound at sf0.001 too") {
    val rows = run("q47_percentiles_approx").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("approx_ok"), r.toString)
      assert(r.getAs[Double]("p50") <= r.getAs[Double]("p95"))
      assert(r.getAs[Double]("p95") <= r.getAs[Double]("p99"))
    }
  }

  test("q48: rolling 7d window matches a brute-force scan for sample users") {
    val rows = run("q48_rolling_7d_features").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"),
        r.getAs[Long]("cnt_7d"))).toSeq
    val byUser = rows.groupBy(_._1)
    val week = 604800000000L
    byUser.take(5).foreach { case (_, evs) =>
      evs.foreach { case (_, us, cnt) =>
        val want = evs.count(e => e._2 >= us - week && e._2 <= us)
        assert(cnt == want, s"at us=$us: cnt_7d=$cnt brute=$want")
      }
    }
  }

  test("q45: per-stratum rates respected, long stratum fully kept, deterministic") {
    val sampled = run("q45_stratified_sample").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("stratum")))
    val strata = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(split(col("text"), " ", -1)).cast("long").as("n")).collect()
      .map { r =>
        val n = r.getLong(1)
        r.getLong(0) -> (if (n < 40) "short" else if (n < 70) "medium" else "long")
      }.toMap
    sampled.foreach { case (d, st) => assert(strata(d) == st) }
    val bySt = sampled.groupBy(_._2).view.mapValues(_.length).toMap
    val popSt = strata.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(bySt("long") == popSt("long")) // 100% rate
    // hash sampling at 10%/50% should land near the rate (binomial, loose)
    assert(bySt("short") < popSt("short") * 0.3)
    assert(bySt("medium") > popSt("medium") * 0.25 &&
      bySt("medium") < popSt("medium") * 0.75)
    val again = run("q45_stratified_sample").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("stratum")))
    assert(sampled.sorted.sameElements(again.sorted))
  }

  test("isqrt: exact floor(sqrt) at every int64 magnitude (incl. the " +
      "float-rounding danger zone near Long.MaxValue)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    // perfect squares, off-by-one neighbors, random draws per decade,
    // and the top of the Long range where double sqrt loses ulps
    val xs = (Seq(0L, 1L, 2L, 3L, 4L, Long.MaxValue,
        Long.MaxValue - 1, 3037000499L * 3037000499L) ++
      (1 to 18).flatMap { d =>
        val base = math.pow(10, d).toLong
        Seq(base, base - 1, base + 1,
          (rnd.nextDouble() * base).toLong.max(0L))
      } ++
      (1 to 40).map(_ => rnd.nextLong().abs)).distinct
    val got = xs.toDF("x")
      .select(col("x"), graft.api.SampleOps.isqrt(col("x")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach { x =>
      val s = BigInt(got(x))
      assert(s * s <= x && (s + 1) * (s + 1) > BigInt(x),
        s"isqrt($x) = $s is not floor(sqrt)")
    }
  }

  test("q156 shardByTokens: pos is a bijection, shard token masses are " +
      "near-equal (max-min within the largest doc), snake replays a " +
      "local sort, deterministic") {
    val rows = run("q156_shard_by_tokens").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tok"),
        r.getAs[Long]("pos"), r.getAs[Long]("shard")))
    val n = Tables.documents(spark, sf).count()
    assert(rows.length == n)
    // pos is a 0-based global bijection
    assert(rows.map(_._3).sorted.sameElements(0L until n))
    // every shard used, snake bound holds: max-min token mass within
    // the largest single doc
    val byShard = rows.groupBy(_._4).view.mapValues(_.map(_._2).sum).toMap
    assert(byShard.keySet == (0L until 8L).toSet, s"got ${byShard.keySet}")
    val imbalance = byShard.values.max - byShard.values.min
    val maxDoc = rows.map(_._2).max
    assert(imbalance <= maxDoc,
      s"imbalance $imbalance exceeds largest doc $maxDoc: $byShard")
    // pos replays the (n_tok DESC, seeded-hash-order) local sort: token
    // counts must be non-increasing along pos
    val along = rows.sortBy(_._3).map(_._2)
    assert(along.sliding(2).forall(w => w.length < 2 || w(0) >= w(1)),
      "n_tok must be non-increasing along pos")
    // snake arithmetic
    rows.foreach { case (_, _, pos, shard) =>
      val want = if ((pos / 8) % 2 == 0) pos % 8 else 7 - pos % 8
      assert(shard == want, s"pos $pos -> shard $shard, want $want")
    }
    val again = run("q156_shard_by_tokens").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard")))
    assert(rows.map(r => (r._1, r._4)).sorted.sameElements(again.sorted))
  }

  test("q157 temperatureResample: per-source kept tokens respect the " +
      "sqrt-law budgets, the binding source keeps everything, and the " +
      "rebalance genuinely flattens the mixture") {
    val kept = run("q157_temperature_mixture").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_tok"), r.getAs[Long]("tok_before")))
    val masses = Tables.documents(spark, sf)
      .groupBy(col("source"))
      .agg(sum(size(split(col("text"), " ", -1)).cast("long")).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def isqrt(x: Long): Long = {
      val s = math.sqrt(x.toDouble).toLong
      Seq(s - 1, s, s + 1).filter(c => BigInt(c) * c <= x).max
    }
    val k1000 = masses.values.map(m => m * 1000L / isqrt(m)).min
    val budgets = masses.view.mapValues(m => k1000 * isqrt(m) / 1000L).toMap
    // keep rule: every kept doc started under its source's budget
    kept.foreach { case (_, src, _, before) =>
      assert(before < budgets(src), s"$src: tok_before $before >= budget")
    }
    // the binding source keeps ~everything: its budget is within
    // (w + 998)/1000 + 1 tokens of its full mass (two floor losses),
    // so with multi-token docs the whole source survives
    val binding = masses.minBy(m => m._2 * 1000L / isqrt(m._2))._1
    assert(budgets(binding) >= masses(binding) - isqrt(masses(binding)) / 1000L - 2,
      s"binding budget ${budgets(binding)} too far under mass ${masses(binding)}")
    val keptBySrc = kept.groupBy(_._2).view.mapValues(_.length).toMap
    val popBySrc = Tables.documents(spark, sf).groupBy(col("source"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(keptBySrc(binding) == popBySrc(binding),
      s"binding source $binding must keep everything " +
        s"(budget ${budgets(binding)}, mass ${masses(binding)})")
    // flattening law: kept-token ratios follow sqrt(mass), so for the
    // extreme sources the kept ratio must sit strictly between 1 and
    // the raw mass ratio
    val keptTokBySrc = kept.groupBy(_._2).view.mapValues(_.map(_._3).sum)
      .toMap
    val (big, small) = (masses.maxBy(_._2)._1, masses.minBy(_._2)._1)
    if (masses(big) > masses(small) * 3 / 2) {
      val massRatio = masses(big).toDouble / masses(small)
      val keptRatio = keptTokBySrc(big).toDouble / keptTokBySrc(small)
      assert(keptRatio < massRatio && keptRatio < math.sqrt(massRatio) * 1.3,
        s"kept ratio $keptRatio should flatten mass ratio $massRatio")
    }
  }

  test("qualityScore keep: a keep column shadowing an internal/output " +
      "name fails by name, not with a raw ambiguous-reference error") {
    val docs = Tables.documents(spark, sf)
    val e = intercept[IllegalArgumentException](
      graft.api.TextOps.qualityScore(docs, "doc_id", "text",
        keep = Seq("n_tok")))
    assert(e.getMessage.contains("n_tok") &&
      e.getMessage.contains("collide"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](
      graft.api.TextOps.qualityScore(docs, "doc_id", "text",
        keep = Seq("quality")))
    assert(e2.getMessage.contains("quality"), e2.getMessage)
  }

  test("q158 datasetCard: grand total covers the corpus at ppm 1e6, " +
      "leaves sum to every subtotal, markers consistent") {
    val rows = run("q158_dataset_card").collect()
      .map(r => ((r.getAs[String]("source"), r.getAs[String]("lang"),
        r.getAs[String]("quality")),
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("tok_ppm")))).toMap
    val n = Tables.documents(spark, sf).count()
    val grand = rows(("(all)", "(all)", "(all)"))
    assert(grand._1 == n && grand._3 == 1000000L, s"grand = $grand")
    // rollup consistency: leaves sum to the (source, lang, all) level,
    // those to (source, all, all), those to the grand total
    val leaves = rows.filterNot { case ((s, l, q), _) =>
      s == "(all)" || l == "(all)" || q == "(all)" }
    assert(leaves.nonEmpty)
    leaves.groupBy { case ((s, l, _), _) => (s, l) }.foreach {
      case ((s, l), grp) =>
        val sub = rows((s, l, "(all)"))
        assert(grp.values.map(_._1).sum == sub._1 &&
          grp.values.map(_._2).sum == sub._2, s"($s, $l) subtotal mismatch")
    }
    assert(leaves.values.map(_._2).sum == grand._2)
    // ppm shares: each leaf's ppm is exactly (tokens * 1e6) div total
    leaves.foreach { case (k, (_, tok, ppm)) =>
      assert(ppm == (BigInt(tok) * 1000000 / grand._2).toLong,
        s"$k ppm drifted")
    }
    // a rollup marker never carries a finer-level split: no row with
    // source '(all)' but a concrete lang
    rows.keys.foreach { case (s, l, q) =>
      if (s == "(all)") assert(l == "(all)" && q == "(all)")
      if (l == "(all)") assert(q == "(all)")
    }
  }
}

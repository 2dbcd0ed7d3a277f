package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained classifier scoring — the supervised half of the curation
  * stack (the fastText-style quality/domain filter of CCNet and every
  * LLM corpus pipeline since; reference analog: the per-key scoring
  * process functions of UserBehaviorAnalysis, e.g.
  * LoginFailWithCep/src/main/scala — a learned gate instead of a
  * hand-written one).
  *
  * Two model families, both with the q91 deployment posture — train
  * ONCE per corpus version into a small persistable frame, score
  * every ingest batch against it with vocabulary-sized (or literal
  * broadcast) join work only:
  *
  *   - [[nbModel]] / [[nbClassify]]: multinomial Naive Bayes over
  *     bag-of-words with add-V smoothing, all arithmetic in WHOLE-BIT
  *     quantized log-probs (floor(log2 n) = length(bin(n))-1 — the
  *     q88/q91 integer-LM precedent), so a doc's class scores hash
  *     identically cross-engine where float log sums would not.
  *   - [[centroidModel]] / [[centroidClassify]]: nearest-class-centroid
  *     over embeddings in micro fixed-point (the q69 quantization
  *     grid); centroids are floor(mean) integers, distances exact
  *     int64 sums — order-independent, overflow-safe by construction
  *     (|q| <= ~2e6 => 64-dim squared distance <= ~2.6e14).
  *
  * Quantization is lossy ON PURPOSE: it buys exact cross-engine
  * determinism (the correctness-gate contract) at the cost of
  * fine-grained likelihood resolution. ClassifySpec proves both
  * families learn (100% held-out accuracy on corpora with separable
  * classes); on the driver corpus the label columns are
  * content-uncorrelated by construction, so held-out accuracy sits at
  * the data's ceiling (~majority class) — the catalog oracles check
  * exact score/argmax parity, not accuracy.
  */
object ClassifyOps {

  /** floor(log2 n) for n >= 1, as pure integer ops. */
  private def fl2(c: Column): Column = (length(bin(c)) - 1).cast("long")
  private def fl2L(n: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(n)

  /** Train a multinomial NB model on `corpus` and return ONE
    * vocabulary×classes-sized frame (cls, w, cw, tc, dc, d, c, v):
    * cw = occurrences of token w in class cls, tc = total token
    * occurrences in cls (constant per cls), dc = training docs in cls,
    * d = total training docs, c = number of classes, v = training
    * vocabulary size (d/c/v constant). Rows are token TYPES per class,
    * never corpus-sized — the persistable artifact.
    *
    * Shape at 100 TB: one exchange of per-task partial (cls, w) counts
    * (map-side combine collapses a hot token to one partial row per
    * task); every other agg is class- or vocabulary-sized. Tokens are
    * the repo-wide `split(text, ' ', -1)` convention.
    *
    * Null-labeled rows are excluded (unlabeled data cannot vote in a
    * supervised model). A class whose training rows carry no tokens
    * at all (every text null) has no (cls, w) rows and is therefore
    * absent from the model — it can never be predicted.
    */
  def nbModel(corpus: DataFrame, idCol: String, textCol: String,
      classCol: String): DataFrame = {
    // null-labeled rows are UNLABELED — they cannot vote in a
    // supervised model, and a "null" class would poison the
    // driver-side class sort in the scorers. The class column is
    // NORMALIZED to string at train time (the model frame's `cls` is
    // always StringType), so an int- or long-labeled corpus trains a
    // valid model instead of deferring a ClassCastException to the
    // scorer's driver-side stats read.
    val labeled = corpus.filter(col(classCol).isNotNull)
      .withColumn("__cls", col(classCol).cast("string"))
    val occ = labeled.select(col("__cls").as("cls"),
      explode(split(col(textCol), " ", -1)).as("w"))
    val cw = occ.groupBy(col("cls"), col("w"))
      .agg(count(lit(1)).as("cw"))
    val tc = cw.groupBy(col("cls")).agg(sum(col("cw")).as("tc"))
    val dcF = labeled.groupBy(col("__cls").as("cls"))
      .agg(count(lit(1)).as("dc"))
    val gl = dcF.agg(sum(col("dc")).as("d"), count(lit(1)).as("c"))
    val vv = cw.agg(count_distinct(col("w")).as("v"))
    cw.join(broadcast(tc), Seq("cls"))
      .join(broadcast(dcF), Seq("cls"))
      .crossJoin(broadcast(gl)).crossJoin(broadcast(vv))
      .select(col("cls"), col("w"), col("cw"), col("tc"), col("dc"),
        col("d"), col("c"), col("v"))
  }

  /** Driver-side class stats off a materialized [[nbModel]] frame —
    * class-count-sized (the LmGate literal-v precedent). Classes come
    * back sorted ascending so argmax CASE chains realize the
    * smallest-class tie-break; `nullPrediction` is the prior-only
    * argmax for token-less rows.
    */
  private[graft] final case class NbStats(classes: IndexedSeq[String],
      prior: IndexedSeq[Long], denom: IndexedSeq[Long]) {
    def nullPrediction: (String, Long) = {
      val i = prior.indices.minBy(i => (-prior(i), classes(i)))
      (classes(i), prior(i))
    }
    /** score_c columns over the `_s$i` per-class rollup sums. */
    def scoreCols: IndexedSeq[Column] =
      classes.indices.map(i => col(s"_s$i") + lit(prior(i)))
    /** (winning score, winning class) — ascending CASE = min-class tie-break. */
    def bestAndPredicted: (Column, Column) = {
      val sc = scoreCols
      val best = if (sc.size == 1) sc.head else greatest(sc: _*)
      val predicted = classes.indices.drop(1).foldLeft(
        when(sc(0) === best, lit(classes(0)))) { (acc, i) =>
        acc.when(sc(i) === best, lit(classes(i)))
      }
      (best, predicted)
    }
    /** per-class quantized-contribution aggregate columns `_s$i`. */
    def rollupAggs: IndexedSeq[Column] =
      classes.indices.map { i =>
        sum(fl2(coalesce(col(s"_cw$i"), lit(0L)) + 1) - lit(denom(i)))
          .as(s"_s$i") }
    /** per-ROW (pre-aggregation) contributions `_q$i` — the same
      * arithmetic as [[rollupAggs]] split out so a multi-gate union
      * can zero non-classifier rows BEFORE one shared aggregate
      * (summing `_q$i` over a doc's token rows == `_s$i`).
      */
    def contribCols: IndexedSeq[Column] =
      classes.indices.map { i =>
        (fl2(coalesce(col(s"_cw$i"), lit(0L)) + 1) - lit(denom(i)))
          .as(s"_q$i") }
  }

  private[graft] def nbStats(model: DataFrame): NbStats = {
    val stats = model.select(col("cls"), col("tc"), col("dc"),
        col("d"), col("c"), col("v")).distinct().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1).toIndexedSeq
    require(stats.nonEmpty, "nb classify: empty model")
    NbStats(stats.map(_._1),
      stats.map { case (_, _, dc, d, c, _) => fl2L(dc + 1) - fl2L(d + c) },
      stats.map { case (_, tc, _, _, _, v) => fl2L(tc + v) })
  }

  /** Per-token pivoted model: one row per vocabulary token, one count
    * column `_cw$i` per class (vocabulary-sized broadcast side).
    */
  private[graft] def nbPivoted(model: DataFrame, st: NbStats): DataFrame = {
    val aggs = st.classes.zipWithIndex.map { case (cl, i) =>
      sum(when(col("cls") === lit(cl), col("cw"))).as(s"_cw$i") }
    model.groupBy(col("w")).agg(aggs.head, aggs.tail: _*)
  }

  /** Score `df` against a PRE-TRAINED [[nbModel]] frame and predict
    * the argmax class per row (ties break to the lexicographically
    * smallest class). Output: idCol, keepCols..., `predicted`
    * (string), `score` (BIGINT — the winner's quantized log-posterior
    * numerator: prior + sum over token occurrences of
    * fl2(cw+1) - fl2(tc+v), with out-of-vocabulary tokens taking
    * cw = 0 — smoothing extended off the training set, the q91 OOV
    * posture).
    *
    * Pass a MATERIALIZED model (parquet read or `.localCheckpoint()`):
    * the class list, priors, and per-class denominators are read off
    * it DRIVER-SIDE at build time (class-count-sized, the LmGate
    * literal-v precedent) and enter the plan as literals; the one
    * corpus-scale stage left is a map-only explode + broadcast join
    * against the per-token pivoted model, then ONE id-keyed exchange
    * whose map-side partial agg collapses each doc (its tokens are
    * co-located by construction) to a single row per task. Null-text
    * rows union in with the prior-only prediction — row preservation
    * is config-independent (the q88 ANSI contract).
    *
    * If the vocabulary ever outgrows broadcast at the full 100 TB
    * vocabulary tail, flip the pivoted-model join to a planner
    * shuffle join (AQE-skew-splittable) — the formulation is
    * unchanged.
    */
  def nbClassify(df: DataFrame, idCol: String, textCol: String,
      model: DataFrame, keepCols: Seq[String] = Nil): DataFrame = {
    val reserved = Set("_toks", "_m", "_w", "w", "predicted", "score")
    def bad(n: String) =
      reserved.contains(n) || n.matches("_cw\\d+") || n.matches("_s\\d+")
    require(!bad(idCol) && !keepCols.exists(bad),
      s"nbClassify: id/keep columns may not use reserved names " +
        s"$reserved or the _cw<i>/_s<i> rollup pattern")
    val st = nbStats(model)
    val pivoted = nbPivoted(model, st)

    val keeps = keepCols.map(col)
    val toks = df.select(col(idCol) +: keeps :+
        split(col(textCol), " ", -1).as("_toks"): _*)
      .withColumn("_m", coalesce(size(col("_toks")), lit(-1)))

    // main path: explode occurrences, broadcast-join the pivoted
    // model, roll per-class quantized contributions up per row
    val aggs = st.rollupAggs
    val perClass = toks.filter(col("_m") >= 1)
      .select(col(idCol) +: keeps :+ explode(col("_toks")).as("_w"): _*)
      .join(broadcast(pivoted), col("_w") === pivoted("w"), "left")
      .groupBy(col(idCol) +: keeps: _*)
      .agg(aggs.head, aggs.tail: _*)
    val (best, predicted) = st.bestAndPredicted
    val scored = perClass.select(
      col(idCol) +: keeps :+ predicted.as("predicted") :+
        best.as("score"): _*)

    // prior-only path for null-text rows (split(null) => no tokens)
    val (nc, np) = st.nullPrediction
    val nulls = toks.filter(col("_m") < 1)
      .select(col(idCol) +: keeps :+ lit(nc).as("predicted") :+
        lit(np).as("score"): _*)
    scored.unionByName(nulls)
  }

  /** Train a nearest-class-centroid model over an embedding column:
    * one row per class with `n` (training rows) and `centroid` — the
    * per-dimension floor(mean) of the micro-fixed-point quantized
    * vectors (qj = round(vj * 1e6), the q69 grid; floor of an
    * exact-int-over-int double division, so the centroid is
    * bit-identical cross-engine). Classes-sized output; ONE exchange
    * of per-task partial (label, dim) sums.
    */
  def centroidModel(train: DataFrame, vecCol: String,
      labelCol: String): DataFrame = {
    // null-labeled rows are unlabeled (cannot seed a centroid); rows
    // with a null vector contribute nothing either way (posexplode of
    // null yields no rows)
    val q = train.filter(col(labelCol).isNotNull)
      .select(col(labelCol).as("label"),
        transform(col(vecCol).cast("array<double>"),
          x => round(x * lit(1000000d)).cast("long")).as("_q"))
    val dims = q.select(col("label"), posexplode(col("_q")).as(Seq("_i", "_x")))
    dims.groupBy(col("label"), col("_i"))
      .agg(sum(col("_x")).as("_s"), count(lit(1)).as("_n"))
      .withColumn("_m",
        floor(col("_s").cast("double") / col("_n").cast("double"))
          .cast("long"))
      .groupBy(col("label"))
      .agg(max(col("_n")).as("n"),
        array_sort(collect_list(struct(col("_i"), col("_m")))).as("_im"))
      .select(col("label"), col("n"),
        expr("transform(_im, p -> p._m)").as("centroid"))
  }

  /** Classify rows by nearest centroid — MAP-ONLY: the classes-sized
    * model is read driver-side at build time (the q30 "broadcast-model
    * map" shape made literal) and every row's squared distance to each
    * centroid is an exact int64 fold over dimensions; argmin with
    * smallest-label tie-break = array_min over (dist, label) structs.
    * Output: all input columns + `predicted` (label type), `dist`
    * (BIGINT, micro² units). Zero shuffles, zero joins — at 100 TB
    * this is the assignment pass of every partition in parallel with
    * the model riding the closure.
    */
  def centroidClassify(df: DataFrame, vecCol: String,
      model: DataFrame): DataFrame = {
    // labels collect GENERICALLY (any orderable label type, not just
    // int32): the DataFrame sorts by the label's own type ordering and
    // the collected Seq preserves that order, so no driver-side sort
    // (and no type-specific getter) is needed
    val cents = model.select(col("label"), col("centroid"))
      .orderBy(col("label").asc).collect()
      .map(r => (r.get(0), r.getSeq[Long](1)))
    require(cents.nonEmpty, "centroidClassify: empty model")
    val q = transform(col(vecCol).cast("array<double>"),
      x => round(x * lit(1000000d)).cast("long"))
    // a class whose centroid length differs from the input (null
    // input, ragged vector, or a model trained on mixed-dim vectors)
    // folds to a null dist via zip_with padding; coalesce it to
    // Long.MaxValue so a VALID class still wins against it, and only
    // an input no class matches comes back with predicted = null
    val Unreachable = Long.MaxValue
    val scored = cents.map { case (lab, m) =>
      val mLit = typedlit(m)
      val d = aggregate(zip_with(q, mLit, (x, c) => (x - c) * (x - c)),
        lit(0L), (acc, t) => acc + t)
      struct(coalesce(d, lit(Unreachable)).as("dist"), lit(lab).as("label"))
    }
    df.withColumn("_best", array_min(array(scored: _*)))
      .withColumn("predicted",
        when(col("_best.dist") < Unreachable, col("_best.label")))
      .withColumn("dist",
        when(col("_best.dist") < Unreachable, col("_best.dist")))
      .drop("_best")
  }
}

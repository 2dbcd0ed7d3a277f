package graft

import org.apache.spark.sql.functions._

import graft.api.BpeOps

/** BPE induction semantics: hand-computed merge tables, the pinned
  * replace-run behavior shared with the DuckDB oracle, early stop,
  * and tokenization with a learned merge list. The q95 catalog entry
  * additionally hash-checks the full 12-step table against the
  * unrolled SQL oracle.
  */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  test("train: hand-computed merges with deterministic tie-break") {
    // "ab" x3, "abc" x2 -> pairs: (a,b)=5, (b,c)=2
    val df = Seq("ab ab ab abc abc").toDF("body")
    val m = BpeOps.train(df, "body", 3)
    assert(m.map(t => (t.step, t.left, t.right, t.cnt)) ==
      Seq((1, "a", "b", 5L), (2, "ab", "c", 2L)))
    // stops after 2: no remaining pair occurs twice
    assert(m.length == 2)
  }

  test("train: tie on count falls to (left, right) binary order") {
    // "xy" x2 and "zw" x2 tie at 2; x < z so (x,y) merges first
    val df = Seq("xy xy zw zw").toDF("body")
    val m = BpeOps.train(df, "body", 2)
    assert(m.map(t => (t.left, t.right)) == Seq(("x", "y"), ("z", "w")))
  }

  test("repeated-symbol runs: the replace semantics both engines share") {
    // 'llll' x2: pair (l,l) counts 3 per word = 6; replace ' l l '
    // consumes the shared delimiter -> ' ll l l ' -> step 2 can then
    // merge the remainder. This pins the documented delta vs greedy
    // in-word rescan AND proves Spark's replace matches DuckDB's
    // (the oracle computes the same table from the same corpus).
    val df = Seq("llll llll").toDF("body")
    val m = BpeOps.train(df, "body", 2)
    assert(m(0) == BpeOps.Merge(1, "l", "l", 6L))
    // after step 1 each word is ' ll l l ': pairs (ll,l)=2, (l,l)=2
    // -> tie, 'l' < 'll' so (l,l) wins step 2
    assert(m(1) == BpeOps.Merge(2, "l", "l", 2L))
  }

  test("tokenCounts: learned merges shrink the per-doc symbol count") {
    val df = Seq((1L, "banana band"), (2L, "an an an")).toDF("id", "body")
    val merges = BpeOps.train(df, "body", 2)
    // (a,n) dominates: banana(2) + band(1) + an*3 = 6
    assert(merges.head.left == "a" && merges.head.right == "n")
    val none = BpeOps.tokenCounts(df, "id", "body", Nil)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val learned = BpeOps.tokenCounts(df, "id", "body", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(none(1L) == 10L && none(2L) == 6L) // chars per doc
    assert(learned(1L) < none(1L) && learned(2L) < none(2L))
    // doc 2 is 'an' x3 -> one symbol per word after the (a,n) merge
    assert(learned(2L) == 3L)
  }

  test("fertility: exact per-source integer ratios, merges shrink them") {
    val df = Seq(("s1", "banana band"), ("s2", "an an an"))
      .toDF("src", "body")
    val merges = BpeOps.train(df, "body", 2)
    def fert(m: Seq[BpeOps.Merge]) = BpeOps.fertility(df, "src", "body", m)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // no merges: fertility = chars per word x1000
    val none = fert(Nil)
    assert(none("s1") == (2L, 10L, 5000L)) // banana(6)+band(4) over 2 words
    assert(none("s2") == (3L, 6L, 2000L))
    // the learned (a,n)-led merges shrink tokens, words are unchanged
    val learned = fert(merges)
    assert(learned("s1")._1 == 2L && learned("s2")._1 == 3L)
    assert(learned("s1")._2 < 10L && learned("s2")._2 == 3L)
    assert(learned("s2")._3 == 1000L) // 'an' -> exactly 1 token per word
  }

  test("dried chain: tokenCounts on a corpus with fewer merges than " +
      "asked matches the oracle's pass-through semantics") {
    // nMerges=5 but only 2 pairs ever reach count >= 2 — the oracle's
    // seg CTEs now PASS THROUGH on an empty step (LEFT JOIN) instead
    // of collapsing to zero rows; these exact numbers were verified
    // against the generated SQL in DuckDB: merges (a,b,6),(ab,c,2);
    // tokens doc1=5 ('ab'x3 + 'abc'x2 one symbol each), doc2=2
    val df = Seq((1L, "ab ab ab abc abc"), (2L, "ab q")).toDF("id", "body")
    val m = BpeOps.train(df, "body", 5)
    assert(m.map(t => (t.left, t.right, t.cnt)) ==
      Seq(("a", "b", 6L), ("ab", "c", 2L)))
    val toks = BpeOps.tokenCounts(df, "id", "body", m)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(toks == Map(1L -> 5L, 2L -> 2L))
  }

  test("model cache: trainCached reuses, trainOwning always retrains " +
      "and refreshes (the q95-owner / q98-consumer contract)") {
    val key = s"bpe-cache-test-${System.identityHashCode(this)}"
    val df1 = Seq("ab ab ab").toDF("body")
    val df2 = Seq("xy xy xy").toDF("body")
    val first = BpeOps.trainCached(key, df1, "body", 1)
    assert(first.map(m => (m.left, m.right)) == Seq(("a", "b")))
    // cached: a DIFFERENT corpus under the same key returns the old model
    assert(BpeOps.trainCached(key, df2, "body", 1) == first)
    // owner: retrains on the new corpus and refreshes the cache
    val owned = BpeOps.trainOwning(key, df2, "body", 1)
    assert(owned.map(m => (m.left, m.right)) == Seq(("x", "y")))
    assert(BpeOps.trainCached(key, df1, "body", 1) == owned)
  }

  test("q95 catalog entry: 12 rows, counts non-increasing, pairs distinct") {
    val rows = SparkEntry.queries("q95_bpe_vocab_induction")(spark, sf)
      .orderBy("step").collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("cnt")))
    assert(rows.length == 12)
    assert(rows.map(_._1).toSeq == (1L to 12L))
    // the BPE theorem: the selected count never increases step-over-step
    assert(rows.map(_._4).sliding(2).forall(w => w(0) >= w(1)))
    // a merged pair of DISTINCT symbols cannot re-occur (adjacencies
    // only shrink); a repeated-symbol pair (l == r) legitimately CAN —
    // the pinned 'llll' run semantics merge alternate pairs per step,
    // so (l,l) may be selected again on the leftovers
    val pairs = rows.map(r => (r._2, r._3)).filter(p => p._1 != p._2)
    assert(pairs.distinct.length == pairs.length)
  }
}

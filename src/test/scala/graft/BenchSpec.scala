package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The bench leak heuristic and its self-adjudication (VERDICT r10
  * #2): a contended first pass must not ship `leak_suspects` a clean
  * retest refutes, while a REAL leak — state accreting across thunk
  * invocations in one session — must still be flagged.
  */
class BenchSpec extends SparkSpec {

  test("monotoneLeak: signature cases, including the r10 false accusations") {
    // the r10 driver-run arrays that were flagged — monotone, so they
    // ARE candidates (adjudication, not the signature, exonerates them)
    assert(BenchHarness.monotoneLeak(Seq(2.20, 2.74, 3.09)))
    assert(BenchHarness.monotoneLeak(Seq(0.97, 1.23, 4.36)))
    // the same queries' clean-run arrays: not monotone, never candidates
    assert(!BenchHarness.monotoneLeak(Seq(1.25, 0.99, 1.32)))
    assert(!BenchHarness.monotoneLeak(Seq(0.69, 0.36, 0.39)))
    // symmetric jitter, equal runs, tiny growth, failures, short arrays
    assert(!BenchHarness.monotoneLeak(Seq(1.0, 1.5, 1.2)))
    assert(!BenchHarness.monotoneLeak(Seq(1.0, 1.0, 1.0)))
    assert(!BenchHarness.monotoneLeak(Seq(0.10, 0.11, 0.13))) // < 0.2s abs
    assert(!BenchHarness.monotoneLeak(Seq(5.0, 5.2, 5.5)))    // < 1.2x ratio
    assert(!BenchHarness.monotoneLeak(Seq(1.0, 2.0, -1.0)))
    assert(!BenchHarness.monotoneLeak(Seq(1.0, 2.0)))
  }

  test("adjudicateLeaks: flat retest exonerates, monotone retest confirms") {
    val retests = Map(
      "q_contended" -> Seq(0.9, 1.0, 0.95), // machine load passed
      "q_leaky" -> Seq(1.1, 1.5, 2.0))      // leaks again on retest
    val (confirmed, recorded) = BenchHarness.adjudicateLeaks(
      Seq("q_contended", "q_leaky"), retests(_))
    assert(confirmed == Seq("q_leaky"))
    // both retest arrays are recorded for the artifact either way
    assert(recorded == retests)
    // no candidates => no retest calls, empty artifact map
    val (none, empty) = BenchHarness.adjudicateLeaks(Seq.empty,
      _ => fail("retest must not run without candidates"))
    assert(none.isEmpty && empty.isEmpty)
  }

  test("a REAL leak (intentionally-cached frames accreting) reproduces " +
      "through the retest and stays flagged") {
    // the thunk leaks deliberately: every invocation caches ANOTHER
    // block and the query unions ALL blocks cached so far — run i
    // does i blocks of work, the exact accretion shape of the round-7
    // q89 localCheckpoint bug. Work per block is sized so structural
    // growth (one full block per run) dominates local jitter.
    val leaked = collection.mutable.ArrayBuffer.empty[DataFrame]
    // per-block digest cost must DOMINATE run-to-run jitter for the
    // ramp to be a reliable signature: three chained sha2 rounds per
    // row make each accreted block worth ~2s of structural work, an
    // increment scheduler noise (a few hundred ms) cannot mask
    def digestAll(df: DataFrame) = {
      val h1 = sha2(concat_ws(":", col("x"), col("x") * 31), 256)
      df.agg(count(sha2(sha2(h1, 256), 256)).as("n"))
    }
    def leakyThunk(): DataFrame = {
      val block = spark.range(0, 4000000L, 1, 4).toDF("x").persist()
      block.count() // materialize into pinned storage
      leaked += block
      // the read side re-derives the expensive digest over EVERY block
      // cached so far — run i does i blocks of hash work, while the
      // new block's build cost stays constant and small
      digestAll(leaked.reduce(_ unionByName _))
    }
    try {
      // JIT/codegen warmup (Bench's discipline), on the FULL thunk
      // shape (persist + union + digest agg) with a throwaway block:
      // without it the first run pays multi-second classloading that
      // swamps the signature
      // (both plan shapes — run 1 has no Union node, runs 2+ do — AND
      // full-size blocks: the first big persist pays memory-store ramp
      // that would otherwise land inside timed run 1)
      val warm = spark.range(0, 4000000L, 1, 4).toDF("x").persist()
      warm.count()
      BenchHarness.exec(digestAll(warm))
      BenchHarness.exec(digestAll(warm.unionByName(warm)))
      warm.unpersist(blocking = true)
      val firstPass = BenchHarness.timedRuns(3, () => leakyThunk())
      assert(BenchHarness.monotoneLeak(firstPass),
        s"leaky thunk did not trip the signature: $firstPass")
      // adjudication re-runs the SAME leaking thunk AFTER the cleanup
      // Bench performs before a retest (drain + GC): for a
      // state-accretion leak the pinned state resets and the retest
      // re-accretes from zero — ramping 1x..3x again, the signature a
      // real leak cannot help reproducing. (Continuing to accrete
      // 4x..6x instead would shrink the relative growth toward the
      // heuristic's 1.2x floor, where scheduler jitter can flip a
      // run — a flaky test, and NOT what Bench does.)
      val (confirmed, retests) = BenchHarness.adjudicateLeaks(
        Seq("q_leaky"), { _ =>
          leaked.foreach(_.unpersist(blocking = true))
          leaked.clear()
          BenchHarness.timedRuns(3, () => leakyThunk())
        })
      assert(confirmed == Seq("q_leaky"),
        s"real leak exonerated: first=$firstPass retest=${retests("q_leaky")}")
    } finally leaked.foreach(_.unpersist(blocking = false))
  }
}

package graft

import graft.api.TextOps

/** Property laws for line-level corpus dedup, over GENERATED inputs
  * (the UrlLawsSpec philosophy): both the corpus-rewriting form
  * ([[TextOps.dedupLines]]) and the incremental form
  * ([[TextOps.dedupLinesAgainst]]) must agree with a 15-line in-JVM
  * reference model of the semantics — normalize trim+lower, count
  * DISTINCT docs per non-blank key, drop keys over the threshold,
  * re-assemble survivors in order. The differential check explores
  * casing/padding/blank/duplicate-within-doc combinations the
  * example-based ApiSpec cases don't: in particular a doc repeating
  * the same key on several lines must vote ONCE in the frequency
  * count but lose EVERY copy when the key crosses the threshold.
  */
class LineLawsSpec extends SparkSpec {

  import spark.implicits._

  private def norm(s: String) = s.trim.toLowerCase

  /** The reference model: (id -> (n_lines, n_dropped, clean)) given a
    * document-frequency function over normalized non-blank keys. */
  private def model(docs: Seq[(Long, String)],
      common: String => Boolean): Map[Long, (Long, Long, String)] =
    docs.map { case (id, text) =>
      val ls = text.split("\n", -1)
      val kept = ls.filter(l => norm(l).isEmpty || !common(norm(l)))
      id -> ((ls.length.toLong, (ls.length - kept.length).toLong,
        kept.mkString("\n")))
    }.toMap

  private def dfOver(docs: Seq[(Long, String)]): Map[String, Int] =
    docs.flatMap { case (id, text) =>
      text.split("\n", -1).map(norm).filter(_.nonEmpty).distinct
        .map(_ -> id)
    }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct.size }

  private def gen(seed: Long, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    def mixCase(s: String) =
      s.map(c => if (rnd.nextBoolean()) c.toUpper else c)
    (0 until n).map { i =>
      val lines = (0 to rnd.nextInt(6)).map { _ =>
        rnd.nextInt(5) match {
          case 0 => "" // blank: immune by contract
          case 1 => " " * rnd.nextInt(3) + mixCase(s"pool ${rnd.nextInt(12)}") +
            " " * rnd.nextInt(3) // shared key, junked spelling
          case 2 => mixCase(s"pool ${rnd.nextInt(12)}") // shared, no pad
          case _ => s"unique $i-${rnd.nextInt(1000)}"
        }
      }
      (i.toLong, lines.mkString("\n"))
    }
  }

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

  test("dedupLines == the reference model on generated junk-cased " +
      "multi-line corpora (three seeds, three thresholds)") {
    Seq((1L, 3), (2L, 1), (3L, 7)).foreach { case (seed, t) =>
      val docs = gen(20260816L + seed, 120)
      val df = dfOver(docs)
      val want = model(docs, k => df.getOrElse(k, 0) > t)
      assert(want.values.exists(_._2 > 0),
        s"seed $seed t=$t: generator produced no drops — law vacuous")
      assert(want.values.exists(v => v._2 == 0 && v._1 > 0),
        s"seed $seed t=$t: generator dropped everywhere — law weak")
      val got = collect(TextOps.dedupLines(
        docs.toDF("id", "body"), "id", "body", maxDocFreq = t))
      assert(got == want, s"seed $seed t=$t: " +
        s"first diff ${(want.toSet -- got.toSet).take(2)}")
    }
  }

  test("dedupLinesAgainst == the reference model with CORPUS-only " +
      "frequencies: the delta never votes, repeated in-doc keys vote " +
      "once but lose every copy") {
    val corpus = gen(20260816L, 150)
    val delta = gen(99990816L, 60).map { case (id, t) => (id + 1000L, t) }
    val df = dfOver(corpus) // corpus-only, by contract
    val t = 4
    val want = model(delta, k => df.getOrElse(k, 0) > t)
    assert(want.values.exists(_._2 > 0), "no drops — law vacuous")
    val got = collect(TextOps.dedupLinesAgainst(
      delta.toDF("id", "body"), corpus.toDF("id", "body"),
      "id", "body", maxDocFreq = t))
    assert(got == want,
      s"first diff ${(want.toSet -- got.toSet).take(2)}")
  }
}

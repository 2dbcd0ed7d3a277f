package graft

import org.apache.spark.sql.functions._

import graft.api.TextOps

/** Property laws for the crawl front door, over GENERATED inputs (one
  * seeded deterministic corpus per law, evaluated as a single Spark
  * job — the AggLawsSpec philosophy applied to Column functions):
  *
  *  - canonicalUrl collapses every junk variant (scheme/host case,
  *    userinfo, default ports, tracking params, fragments, trailing
  *    slashes) of a logical URL to ONE clean form, and is IDEMPOTENT
  *    — canonical(canonical(u)) == canonical(u). Idempotency is the
  *    classic canonicalizer bug class: a pass that re-mangles its own
  *    output makes q147-style visited-set suppression non-convergent
  *    (the same URL re-enters the frontier under a new spelling every
  *    crawl cycle).
  *  - robotsFilter agrees with a 10-line in-JVM reference model of
  *    the REP longest-match semantics over random rule sets — the
  *    differential check explores host/prefix/allow combinations the
  *    example-based ApiSpec cases don't.
  */
class UrlLawsSpec extends SparkSpec {

  import spark.implicits._

  private def mixCase(s: String, rnd: scala.util.Random): String =
    s.map(c => if (rnd.nextBoolean()) c.toUpper else c)

  test("canonicalUrl: every generated junk variant collapses to the " +
      "clean form, and the pass is idempotent") {
    val rnd = new scala.util.Random(20260815L)
    val trackingNames = Seq("utm_source", "utm_a1", "fbclid", "gclid")
    val cases = (0 until 400).map { i =>
      val scheme = if (rnd.nextBoolean()) "https" else "http"
      val host = s"site${rnd.nextInt(50)}.example.org"
      val segs = (0 to rnd.nextInt(3)).map(j => s"s${rnd.nextInt(9)}$j")
      val path = segs.mkString("/", "/", "")
      val realParams = (0 until rnd.nextInt(3))
        .map(j => s"k$j=v${rnd.nextInt(9)}")
      // clean form: what canonicalization must converge to
      val cleanQuery =
        if (realParams.isEmpty) "" else realParams.mkString("?", "&", "")
      val clean = s"$scheme://$host$path$cleanQuery"
      // junk variant: mixed-case scheme+host, optional userinfo,
      // optional default port, tracking params interleaved at random
      // positions, optional fragment, trailing slashes
      val userinfo = if (rnd.nextBoolean()) s"u${rnd.nextInt(9)}:pw@" else ""
      val port = rnd.nextInt(3) match {
        case 0 => ""
        case 1 => if (scheme == "https") ":443" else ":80"
        case _ => "" // non-default ports change the clean form; kept out
      }
      val tracking = (0 until rnd.nextInt(3)).map(_ =>
        s"${trackingNames(rnd.nextInt(trackingNames.size))}=t${rnd.nextInt(9)}")
      val allParams = rnd.shuffle(realParams ++ tracking)
      // order of REAL params is semantic (canonicalUrl preserves it),
      // so only accept shuffles that keep their relative order
      val shuffled =
        if (allParams.filter(realParams.contains) == realParams) allParams
        else tracking ++ realParams
      val junkQuery =
        if (shuffled.isEmpty) "" else shuffled.mkString("?", "&", "")
      val slashes = "/" * rnd.nextInt(3)
      val fragment = if (rnd.nextBoolean()) s"#frag${rnd.nextInt(9)}" else ""
      val junk = s"${mixCase(scheme, rnd)}://$userinfo${mixCase(host, rnd)}" +
        s"$port$path$slashes$junkQuery$fragment"
      (i.toLong, junk, clean)
    }
    val df = cases.toDF("i", "junk", "clean")
      .withColumn("c1", TextOps.canonicalUrl(col("junk")))
    val out = df
      .withColumn("c2", TextOps.canonicalUrl(col("c1")))
      .select("i", "junk", "clean", "c1", "c2").collect()
    out.foreach { r =>
      assert(r.getString(3) == r.getString(2),
        s"collapse failed for ${r.getString(1)}: got ${r.getString(3)}, " +
          s"want ${r.getString(2)}")
      assert(r.getString(4) == r.getString(3),
        s"NOT idempotent: ${r.getString(3)} re-canonicalized to " +
          s"${r.getString(4)} (from ${r.getString(1)})")
    }
    // non-URLs (no scheme://) pass through byte-identical
    val plain = Seq("no url here", "a/b?c=1", "mailto-ish@x", "")
      .toDF("s").withColumn("c", TextOps.canonicalUrl(col("s")))
      .collect().map(r => (r.getString(0), r.getString(1)))
    plain.foreach { case (s, c) =>
      assert(s == c, s"non-URL '$s' was mangled to '$c'") }
  }

  test("robotsFilter: differential vs an in-JVM reference model of " +
      "REP longest-match over random rule sets") {
    val rnd = new scala.util.Random(20260816L)
    val prefixPool = Seq("/", "/a/", "/a/b", "/ab", "/b/", "/a/b/c")
    // each case gets its OWN synthetic host, so 150 independent rule
    // sets evaluate in one robotsFilter call
    val all = (0 until 150).map { i =>
      val host = s"case$i.test"
      val rules = (0 until rnd.nextInt(5)).map { _ =>
        (host, prefixPool(rnd.nextInt(prefixPool.size)), rnd.nextBoolean())
      }
      val paths = (0 until 4).map { _ =>
        val depth = rnd.nextInt(4)
        Seq("/a", "/b", "/ab", "/a/b", "/a/b/c", "/x")(rnd.nextInt(6)) +
          (if (depth > 0) s"/p$depth" else "")
      }
      (host, rules, paths)
    }
    val rulesDf = all.flatMap(_._2).toDF("host", "prefix", "allow")
    val urls = all.zipWithIndex.flatMap { case ((host, _, paths), i) =>
      paths.zipWithIndex.map { case (p, j) =>
        (i * 10L + j, s"https://$host$p")
      }
    }
    val got = TextOps.robotsFilter(urls.toDF("id", "href"), "id", "href",
        rulesDf)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(2), r.getString(3)))).toMap
    // the reference model: longest matching prefix decides, equal
    // length -> allow wins; no match -> allowed with empty prefix
    val ruleMap = all.map(c => c._1 -> c._2).toMap
    urls.foreach { case (id, href) =>
      val host = href.stripPrefix("https://").takeWhile(_ != '/')
      val path = href.stripPrefix(s"https://$host")
      val matches = ruleMap(host).filter(r => path.startsWith(r._2))
      val want =
        if (matches.isEmpty) (true, "")
        else {
          val best = matches.maxBy(r => (r._2.length, r._3))
          (best._3, best._2)
        }
      assert(got(id) == want,
        s"$href vs rules ${ruleMap(host)}: got ${got(id)}, want $want")
    }
  }
}

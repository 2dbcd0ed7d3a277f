package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.TextHashing.hash60Sql

/** The composed batch curation pipeline as a catalog query — q89 runs
  * [[graft.jobs.CurationPipeline]] end-to-end and its oracle re-runs
  * the SAME stage SQL generators the standalone queries use
  * (urlDedupSql, minhashPairsSql, passagePairsSql, repetitionSql,
  * bigramKeepSql — one generator per rule, so the composition cannot
  * drift from the pieces), chained over survivor CTEs in pipeline
  * order. The correctness claim this buys: not just "each stage
  * matches DuckDB in isolation" but "the stage ORDER and survivor
  * plumbing match too" — a wrong join type or an off-by-one survivor
  * set anywhere flips the final kept-set hash.
  */
object CurationQueries {

  import PipelineQueries.{urlFixtureSql, urlDedupSql, repetitionSql, bigramKeepSql}
  import DedupQueries.{minhashPairsSql, passagePairsSql}

  /** The q86 URL fixture as a Spark frame (doc_id, url) — the one
    * generator both the catalog query and the integration suite feed
    * into the pipeline's front door.
    */
  def urlFixture(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.select(col("doc_id"), expr(urlFixtureSql("string", "div")).as("url"))

  // session-scoped Stages cache (the SharedStages/BpeOps discipline):
  // q89 is the OWNER — it always runs the pipeline end-to-end (the
  // honest composed benchmark) and refreshes the cache; q92 reports on
  // the cached run, which makes "the report cannot disagree with the
  // pipeline it reports on" LITERAL — same frames, not a re-derivation.
  // Contract: one JVM-wide SparkContext and immutable SF dirs (the
  // Stages hold localCheckpointed frames, which live on the context).
  private val stagesCache = new java.util.concurrent.ConcurrentHashMap[
    String, graft.jobs.CurationPipeline.Stages]

  private def runOwning(s: org.apache.spark.sql.SparkSession,
      dir: String): graft.jobs.CurationPipeline.Stages = {
    val docs = Tables.documents(s, dir)
    val st = graft.jobs.CurationPipeline.run(docs, urlFixture(docs))
    // the cached Stages' checkpoints are deliberately shared across
    // query invocations (q92 reads q89's frames), so they must survive
    // BenchHarness.drainLocalCheckpoints — register them cache-owned
    // (drain-exempt; the round-9 lesson: the drain killed them and q92
    // hard-failed with truncated lineage).
    st.checkpointed.foreach(graft.api.Lifecycle.registerCacheOwned)
    // the evicted run's checkpoint blocks are released NOW, not at RDD
    // GC: without this a long-lived session re-running q89 accretes
    // storage memory per invocation (the round-7 bench showed runs
    // growing 4.94 → 6.76 s). close() also unregisters the old ids, so
    // at most one run's worth of cache-owned blocks is ever pinned.
    // The new run's frames are independent of the old ones, and the
    // single-threaded catalog contract means no consumer is mid-flight
    // on the evicted frames.
    Option(stagesCache.put(dir, st)).foreach(_.close())
    st
  }

  /** q92's read path: the cached Stages of q89's run — IF still live.
    * Liveness is checked frame-by-frame (Lifecycle.isLive): if anything
    * released the cached checkpoints (an unregistered drain, an
    * explicit close), the frames are unrecoverable (truncated lineage),
    * so recompute as the new owner rather than throw. This makes q92
    * correct under EVERY catalog iteration order — the round-9 verdict
    * flagged that Verify's unordered Map happened to run q92 before q89
    * and any reshuffle would have flipped its correctness row red.
    */
  private def stagesCached(s: org.apache.spark.sql.SparkSession,
      dir: String): graft.jobs.CurationPipeline.Stages = {
    val cur = stagesCache.get(dir)
    if (cur != null && cur.checkpointed.forall(graft.api.Lifecycle.isLive)) cur
    else runOwning(s, dir)
  }

  /** Teardown hook (Bench's final residual assertion): close every
    * cached Stages — releases its checkpoint blocks and unregisters
    * its cache-owned ids — and empty the cache.
    */
  def clearCache(): Unit = {
    val it = stagesCache.values().iterator()
    while (it.hasNext) { it.next().close(); it.remove() }
  }

  /** The survivor-CTE chain shared by q89 (packed output) and q92
    * (per-stage drop accounting) — ONE generator, so the report can
    * never disagree with the pipeline it reports on.
    */
  private val chainCtes: String = s"""WITH RECURSIVE
urlk AS MATERIALIZED (${urlDedupSql("documents")}),
s1 AS MATERIALIZED (SELECT d.* FROM documents d JOIN urlk ON d.doc_id = urlk.keeper_id),
exk AS MATERIALIZED (SELECT min(doc_id) AS doc_id FROM s1 GROUP BY md5(text)),
s2 AS MATERIALIZED (SELECT d.* FROM s1 d JOIN exk USING (doc_id)),
mp AS MATERIALIZED (${minhashPairsSql("s2")}),
edges AS (SELECT doc_a AS s, doc_b AS t FROM mp
          UNION SELECT doc_b, doc_a FROM mp),
reach(s, t) AS (
  SELECT s, t FROM edges
  UNION
  SELECT r.s, edges.t FROM reach r JOIN edges ON r.t = edges.s),
cl AS MATERIALIZED (SELECT s AS doc_id, least(s, min(t)) AS cluster_id
       FROM reach GROUP BY s),
mem AS MATERIALIZED (SELECT cl.cluster_id, cl.doc_id,
               len(string_split(d.text, ' '))::BIGINT AS n_tok
        FROM cl JOIN s2 d USING (doc_id)),
kp AS MATERIALIZED (SELECT doc_id FROM (
         SELECT doc_id, row_number() OVER (PARTITION BY cluster_id
                  ORDER BY n_tok DESC, doc_id ASC) AS rn
         FROM mem) WHERE rn = 1),
s3 AS MATERIALIZED (SELECT * FROM s2
       WHERE doc_id NOT IN (SELECT doc_id FROM mem)
          OR doc_id IN (SELECT doc_id FROM kp)),
pp AS MATERIALIZED (${passagePairsSql("s3")}),
dup AS MATERIALIZED (SELECT doc_b AS doc_id, count(DISTINCT chunk_b) AS ndup
        FROM pp GROUP BY 1),
tot AS MATERIALIZED (SELECT doc_id,
               ((len(string_split(text, ' ')) - 1) // 25 + 1)::BIGINT AS nch
        FROM s3),
s4 AS MATERIALIZED (SELECT s3.* FROM s3
       JOIN tot USING (doc_id)
       LEFT JOIN dup USING (doc_id)
       WHERE coalesce(dup.ndup, 0) * 2 < tot.nch),
rep AS MATERIALIZED (${repetitionSql("s4")}),
lm AS MATERIALIZED (${bigramKeepSql("s4")}),
lmstat AS MATERIALIZED (SELECT sum(sum_q2)::BIGINT AS s, sum(n_bigrams)::BIGINT AS n
           FROM lm),
s5 AS MATERIALIZED (SELECT s4.* FROM s4
       JOIN rep ON s4.doc_id = rep.doc_id AND rep.keep
       JOIN lm ON s4.doc_id = lm.doc_id
       CROSS JOIN lmstat
       WHERE lm.n_bigrams = 0
          OR lm.sum_q2 * lmstat.n >= (lmstat.s - lmstat.n) * lm.n_bigrams),
mixc AS MATERIALIZED (SELECT source, count(*) AS c,
                (replace(source, 'src', '')::BIGINT % 3) + 1 AS w
         FROM s5 GROUP BY 1),
mk AS (SELECT min(c * 1000 // w) AS k1000 FROM mixc),
mr AS MATERIALIZED (SELECT source, (k1000 * w) // c AS rate FROM mixc, mk),
s6 AS MATERIALIZED (SELECT d.doc_id, d.source,
              len(string_split(d.text, ' '))::BIGINT AS n_tok
       FROM s5 d JOIN mr USING (source)
       WHERE ${hash60Sql("d.doc_id::VARCHAR")} % 1000 < mr.rate),
o AS (SELECT doc_id, source,
        COALESCE(sum(n_tok) OVER (
          ORDER BY ${hash60Sql("doc_id::VARCHAR")} % 32,
                   ${hash60Sql("doc_id::VARCHAR")}, doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
          AS start_tok
      FROM s6)"""

  private val oracle: String = s"""$chainCtes
SELECT doc_id, source, start_tok, start_tok // 2048 AS bin FROM o"""

  private val reportOracle: String = s"""$chainCtes
SELECT stage, source, n_docs FROM (
  SELECT 'a_raw' AS stage, source, count(*)::BIGINT AS n_docs
  FROM documents GROUP BY 2
  UNION ALL
  SELECT 'b_url', source, count(*)::BIGINT FROM s1 GROUP BY 2
  UNION ALL
  SELECT 'c_exact', source, count(*)::BIGINT FROM s2 GROUP BY 2
  UNION ALL
  SELECT 'd_neardup', source, count(*)::BIGINT FROM s3 GROUP BY 2
  UNION ALL
  SELECT 'e_passage', source, count(*)::BIGINT FROM s4 GROUP BY 2
  UNION ALL
  SELECT 'f_quality', source, count(*)::BIGINT FROM s5 GROUP BY 2
  UNION ALL
  SELECT 'g_mixed', source, count(*)::BIGINT FROM s6 GROUP BY 2)"""

  val all: Seq[QueryDef] = Seq(
    QueryDef(
      "q89_curation_pipeline",
      "The COMPOSED batch curation pipeline (jobs/CurationPipeline — " +
        "the batch twin of streaming/IngestPipeline): URL dedup (q86) " +
        "→ exact dedup (q15) → MinHash-LSH cluster keepers " +
        "(q21/q46/q58) → passage-duplication gate (q85, drop docs " +
        "with >= half their chunks seen in an earlier doc) → quality " +
        "gates (q44 repetition AND q88's bigram-LM scorer with a " +
        "RELATIVE corpus-mean-minus-1-bit threshold — absolute cuts " +
        "don't survive the corpus shrinking upstream) → per-source " +
        "mixture (q60) → 2048-token sequence packing (q50), as ONE " +
        "DataFrame program. The oracle chains the SAME per-stage SQL " +
        "generators over survivor CTEs, so stage order and survivor " +
        "plumbing are hash-checked end-to-end, not just each stage in " +
        "isolation. Exceeds the single-operator shuffle budget BY " +
        "CONSTRUCTION (it is seven budgeted operators chained); " +
        "PlanSpec grants it the composition allowance.",
      Some(oracle),
      (s, dir) => runOwning(s, dir).packed),

    QueryDef(
      "q92_curation_report",
      "Per-stage, per-source drop accounting for the composed curation " +
        "pipeline (CurationPipeline.report): survivor counts by source " +
        "after every gate — raw → url → exact → neardup → passage → " +
        "quality → mixed — the observability output a production " +
        "curation run ships to its dashboard (which gate removed how " +
        "much of which source). Reports on the CACHED Stages of q89's " +
        "run (the SharedStages discipline — q89 owns the honest " +
        "end-to-end cost, the report reads the very same frames) and " +
        "chains the SAME oracle CTE generators, so the report cannot " +
        "disagree with the pipeline it reports on — literally. " +
        "Physically: seven tiny per-source aggregates unioned — the " +
        "report itself is free next to the pipeline.",
      Some(reportOracle),
      (s, dir) =>
        graft.jobs.CurationPipeline.report(
          Tables.documents(s, dir), stagesCached(s, dir)))
  )
}

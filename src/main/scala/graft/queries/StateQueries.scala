package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.api.{EventOps, TextOps, VectorOps}
import graft.functions.TextHashing

/** State-of-the-world + data-health operators a 100 TB training-data
  * pipeline runs between ingestion and training: CDC latest-state
  * compaction, snapshot diffing, decayed activity scoring, cadence-based
  * bot detection, robust outlier reporting, embedding quantization
  * pre-flight, and cross-document boilerplate measurement. All exact
  * integer/decimal arithmetic — no float aggregation — so every one is
  * hash-oracled against DuckDB.
  */
object StateQueries {

  /** Shared events CTE: micro-second epoch + the payload columns. */
  private val evSql =
    "SELECT user_id, epoch_us(ts) AS us, event_id, event_type, value FROM events"

  /** Snapshot cut for q65 — inside the events table's time range. */
  private val CutUs = 1705400000000000L

  val all: Seq[QueryDef] = Seq(

    QueryDef(
      "q64_latest_state",
      "CDC latest-state compaction (EventOps.latestState): one row per " +
        "user — the payload of their greatest (us, event_id). The " +
        "custom latest_by argmax aggregate (ObjectHashAggregate), NOT " +
        "a rank window or built-in max_by (whose struct buffer demotes " +
        "to SortAggregate): partial agg keeps one row per key per " +
        "task, so only |users| candidates cross the single shuffle and " +
        "the change log is never sorted — not even per-task.",
      Some(s"""
WITH e AS ($evSql)
SELECT user_id, us, event_id, event_type, value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        ORDER BY us DESC, event_id DESC) AS rn FROM e)
WHERE rn = 1"""),
      (s, dir) =>
        EventOps.latestState(
          Tables.events(s, dir)
            .select(col("user_id"), expr("ts_ns div 1000").as("us"),
              col("event_id"), col("event_type"), col("value")),
          "user_id", Seq("us", "event_id"), Seq("event_type", "value"))),

    QueryDef(
      "q65_snapshot_diff",
      "Keyed snapshot diff (EventOps.snapshotDiff): latest state at a " +
        "cutoff vs latest state now, full-outer joined on user_id with " +
        "added/removed/changed/unchanged status (marker columns, not " +
        "payload null-ness). Both sides aggregate to |users| rows " +
        "before the join; everything keys on user_id (one shuffle " +
        "domain, co-partitioned full-outer hash join).",
      Some(s"""
WITH e AS ($evSql),
o AS (SELECT user_id, event_type, value FROM (
        SELECT user_id, event_type, value, row_number() OVER (
          PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn
        FROM e WHERE us <= $CutUs) WHERE rn = 1),
n AS (SELECT user_id, event_type, value FROM (
        SELECT user_id, event_type, value, row_number() OVER (
          PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn
        FROM e) WHERE rn = 1)
SELECT coalesce(o.user_id, n.user_id) AS user_id,
       o.event_type AS old_event_type, o.value AS old_value,
       n.event_type AS new_event_type, n.value AS new_value,
       CASE WHEN o.user_id IS NULL THEN 'added'
            WHEN n.user_id IS NULL THEN 'removed'
            WHEN o.event_type IS DISTINCT FROM n.event_type
              OR o.value IS DISTINCT FROM n.value THEN 'changed'
            ELSE 'unchanged' END AS status
FROM o FULL JOIN n ON o.user_id = n.user_id"""),
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), expr("ts_ns div 1000").as("us"),
            col("event_id"), col("event_type"), col("value"))
        def latest(d: org.apache.spark.sql.DataFrame) =
          EventOps.latestState(d, "user_id", Seq("us", "event_id"),
            Seq("event_type", "value"))
            .select("user_id", "event_type", "value")
        EventOps.snapshotDiff(
          latest(ev.filter(col("us") <= CutUs)), latest(ev),
          "user_id", Seq("event_type", "value"))
      }),

    QueryDef(
      "q66_decayed_hotness",
      "Half-life-decayed activity per event type (EventOps." +
        "decayedCounts): weight = 1048576 >> min(age_days, 20) — " +
        "right-shifted integers, NOT exp(), so the sum is exact int64 " +
        "and partitioning-independent. Reference clock = one-row " +
        "global max, broadcast back; weighted count partial-aggregates " +
        "map-side into a |types|-row shuffle.",
      Some(s"""
WITH e AS (SELECT event_type, epoch_us(ts) AS us FROM events),
m AS (SELECT max(us) AS now FROM e)
SELECT event_type, count(*) AS n_events,
       sum(1048576 >> least((now - us) // 86400000000, 20))::BIGINT
         AS decayed_x1m
FROM e, m GROUP BY 1"""),
      (s, dir) =>
        EventOps.decayedCounts(
          Tables.events(s, dir)
            .select(col("event_type"), expr("ts_ns div 1000").as("us")),
          "event_type", "us", halfLifeDays = 1, maxHalfLives = 20)),

    QueryDef(
      "q67_interarrival_bots",
      "Per-user inter-arrival stats + bot heuristic (EventOps." +
        "interArrival): gap min/max/avg over (us, event_id)-ordered " +
        "events; suspected_bot = >=10 events with all gaps within 6h " +
        "of each other (machine-regular cadence). ONE exchange: the " +
        "lag window partitions by user_id and the per-user aggregate " +
        "reuses that partitioning.",
      Some(s"""
WITH e AS ($evSql),
l AS (SELECT user_id,
             us - lag(us) OVER (PARTITION BY user_id
                                ORDER BY us, event_id) AS gap
      FROM e)
SELECT user_id, count(*) AS n_events,
       min(gap) AS min_gap_us, max(gap) AS max_gap_us,
       CASE WHEN count(gap) > 0
            THEN (sum(gap) // count(gap))::BIGINT END AS avg_gap_us,
       count(*) >= 10 AND max(gap) - min(gap) <= 21600000000
         AS suspected_bot
FROM l GROUP BY 1"""),
      (s, dir) =>
        EventOps.interArrival(
          Tables.events(s, dir)
            .select(col("user_id"), expr("ts_ns div 1000").as("us"),
              col("event_id")),
          "user_id", "us", "event_id",
          minEvents = 10, toleranceUs = 21600000000L)),

    QueryDef(
      "q68_value_outliers",
      "Robust per-type outlier report (EventOps.robustOutliers): " +
        "values in micro fixed-point, mean and mean-absolute-deviation " +
        "as integer divisions, outlier = |v - mean| > 4*MAD. Zero " +
        "float aggregation -> partitioning- and engine-independent " +
        "(stddev z-scores are neither). Three passes over two pruned " +
        "columns, each collapsing map-side to |types| rows; tiny " +
        "stats frames broadcast back.",
      Some("""
WITH e AS (SELECT event_type,
                  CAST(round(value * 1000000) AS BIGINT) AS vm FROM events),
s AS (SELECT event_type, count(*) AS n,
             (sum(vm) // count(*))::BIGINT AS mean_micro FROM e GROUP BY 1),
d AS (SELECT e.event_type, abs(vm - mean_micro) AS ad
      FROM e JOIN s USING (event_type)),
m AS (SELECT event_type, (sum(ad) // count(*))::BIGINT AS mad_micro
      FROM d GROUP BY 1),
o AS (SELECT d.event_type,
             sum(CASE WHEN ad > 4 * mad_micro THEN 1 ELSE 0 END)::BIGINT
               AS n_outliers
      FROM d JOIN m USING (event_type) GROUP BY 1)
SELECT s.event_type, s.n, s.mean_micro, m.mad_micro, o.n_outliers
FROM s JOIN m USING (event_type) JOIN o USING (event_type)"""),
      (s, dir) =>
        EventOps.robustOutliers(Tables.events(s, dir), "event_type",
          "value", k = 4)),

    QueryDef(
      "q69_vec_quantize",
      "Int8 scalar-quantization pre-flight per embedding (VectorOps." +
        "quantizeStats): dims, min/max in micro fixed-point, summed " +
        "quantization codes. Map-only, zero shuffles; the code loop is " +
        "the native codegen'd quant_code_sum expression (HOF chains " +
        "run interpreted — the q22 lesson). Double promotion and op " +
        "order match DuckDB bit-for-bit.",
      Some("""
WITH b AS (SELECT vec_id, embedding,
                  list_aggregate(embedding, 'min')::DOUBLE AS mn,
                  list_aggregate(embedding, 'max')::DOUBLE AS mx
           FROM embeddings)
SELECT vec_id, len(embedding)::BIGINT AS n_dims,
       CAST(round(mn * 1000000) AS BIGINT) AS mn_x1m,
       CAST(round(mx * 1000000) AS BIGINT) AS mx_x1m,
       CASE WHEN mx = mn THEN 0
            ELSE list_sum(list_transform(embedding,
              v -> floor((v::DOUBLE - mn) * 255.0 / (mx - mn))::BIGINT))
       END::BIGINT AS code_sum
FROM b"""),
      (s, dir) =>
        VectorOps.quantizeStats(Tables.embeddings(s, dir), "vec_id",
          "embedding")),

    QueryDef(
      "q70_common_grams",
      "Cross-document boilerplate ratio (TextOps.commonGramRatio): " +
        "fraction of each doc's distinct trigrams appearing in >= 5 " +
        "docs corpus-wide (the C4 boilerplate signal). Grams travel as " +
        "60-bit hashes via codegen shingle_hashes; document-frequency " +
        "agg and the postings semi-join are co-partitioned on the " +
        "gram hash; zero-overlap docs kept via left join.",
      Some(s"""
WITH s AS (SELECT doc_id,
  list_distinct(list_transform(
    list_transform(generate_series(1, len(string_split(text,' '))-2),
      i -> string_split(text,' ')[i] || ' ' ||
           string_split(text,' ')[i+1] || ' ' ||
           string_split(text,' ')[i+2]),
    g -> ${TextHashing.hash60Sql("g")} % ${TextHashing.P})) AS gs
  FROM documents WHERE len(string_split(text,' ')) >= 3),
e AS (SELECT doc_id, unnest(gs) AS g FROM s),
c AS (SELECT g FROM (SELECT g, count(*) AS d FROM e GROUP BY 1)
      WHERE d >= 5),
cc AS (SELECT doc_id, count(*) AS n_common
       FROM e JOIN c USING (g) GROUP BY 1)
SELECT s.doc_id, len(gs)::BIGINT AS n_grams,
       coalesce(cc.n_common, 0)::BIGINT AS n_common,
       (coalesce(cc.n_common, 0) * 1000) // len(gs) AS common_x1000
FROM s LEFT JOIN cc ON s.doc_id = cc.doc_id"""),
      (s, dir) =>
        TextOps.commonGramRatio(Tables.documents(s, dir), "doc_id",
          "text", n = 3, commonDocFreq = 5)),

    QueryDef(
      "q71_distribution_drift",
      "Distribution-drift report (EventOps.distributionDrift): value " +
        "histogram before vs after the q65 cutoff, per-bucket counts " +
        "and per-million proportions, drifted where the proportion " +
        "moved > 5%. PSI minus the log term - exact integers only, so " +
        "the report is engine- and partitioning-independent. Each side " +
        "collapses map-side to <=11 rows before its single shuffle; " +
        "totals ride along as one-row broadcasts. Power-of-two bucket " +
        "width keeps the double division exact IEEE cross-engine.",
      Some(s"""
WITH e AS (SELECT epoch_us(ts) AS us, value FROM events),
r AS (SELECT greatest(least(floor(value / 32.0), 10), 0)::BIGINT AS bucket,
             count(*) AS n_ref FROM e WHERE us <= $CutUs GROUP BY 1),
c AS (SELECT greatest(least(floor(value / 32.0), 10), 0)::BIGINT AS bucket,
             count(*) AS n_cur FROM e WHERE us > $CutUs GROUP BY 1),
t AS (SELECT (SELECT sum(n_ref) FROM r)::BIGINT AS tr,
             (SELECT sum(n_cur) FROM c)::BIGINT AS tc)
SELECT coalesce(r.bucket, c.bucket) AS bucket,
       coalesce(n_ref, 0)::BIGINT AS n_ref,
       coalesce(n_cur, 0)::BIGINT AS n_cur,
       ((coalesce(n_ref, 0) * 1000000) // tr)::BIGINT AS p_ref_ppm,
       ((coalesce(n_cur, 0) * 1000000) // tc)::BIGINT AS p_cur_ppm,
       abs((coalesce(n_cur, 0) * 1000000) // tc
         - (coalesce(n_ref, 0) * 1000000) // tr) > 50000 AS drifted
FROM r FULL JOIN c ON r.bucket = c.bucket, t"""),
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(expr("ts_ns div 1000").as("us"), col("value"))
        EventOps.distributionDrift(
          ev.filter(col("us") <= CutUs), ev.filter(col("us") > CutUs),
          "value", bucketWidth = 32.0, maxBucket = 10)
      }),

    QueryDef(
      "q72_chunking",
      "Fixed-window token chunking with stride (TextOps.chunk): every " +
        "doc becomes overlapping 16-token windows at stride 8 - the " +
        "training-data windowing step upstream of sequence packing " +
        "(q50). Map-only Generate fan-out of ceil(len/stride) rows per " +
        "doc, no shuffle, builtins only (sequence -> posexplode -> " +
        "slice -> concat_ws) so the whole pipeline codegens.",
      Some("""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
x AS (SELECT doc_id, toks,
             unnest(generate_series(0, (len(toks) - 1) // 8)) AS chunk_idx
      FROM t)
SELECT doc_id, chunk_idx::BIGINT AS chunk_idx,
       len(list_slice(toks, chunk_idx * 8 + 1, chunk_idx * 8 + 16))::BIGINT
         AS n_tok,
       array_to_string(list_slice(toks, chunk_idx * 8 + 1, chunk_idx * 8 + 16),
         ' ') AS chunk_text
FROM x"""),
      (s, dir) =>
        TextOps.chunk(Tables.documents(s, dir), "doc_id", "text",
          chunkTokens = 16, stride = 8)),

    QueryDef(
      "q73_weighted_sample",
      "Weighted deterministic k-sample (SampleOps." +
        "weightedPrioritySample): top-100 docs by hash60(id) div " +
        "weight, weight = n_chars/100 + 1 - longer docs selected " +
        "proportionally more often, but the selection is a pure " +
        "function of (id, weight): reproducible, growth-stable, " +
        "hash-oracled (a float -ln(u)/w priority is none of these). " +
        "Physically TakeOrderedAndProject: per-partition local top-k, " +
        "k-row driver merge, no global sort.",
      Some(s"""
SELECT doc_id, source, n_chars
FROM documents
ORDER BY ${graft.functions.TextHashing.hash60Sql("doc_id::VARCHAR")}
           // (n_chars // 100 + 1),
         doc_id
LIMIT 100"""),
      (s, dir) =>
        graft.api.SampleOps.weightedPrioritySample(
          Tables.documents(s, dir)
            .select(col("doc_id"), col("source"), col("n_chars"),
              expr("n_chars div 100 + 1").as("_wt")),
          "doc_id", "_wt", k = 100)
          .select(col("doc_id"), col("source"), col("n_chars"))),

    QueryDef(
      "q74_union_precedence",
      "Incremental crawl merge (DedupOps.unionWithPrecedence): even-id " +
        "half is the preferred corpus, odd-id half the secondary; a " +
        "secondary doc enters only if its exact content digest is " +
        "absent from the preferred side. Anti-join co-partitioned on " +
        "the 16-byte md5 digest; the preferred corpus contributes only " +
        "its digest column to the join.",
      Some("""
SELECT doc_id, n_chars FROM documents WHERE doc_id % 2 = 0
UNION ALL
SELECT d.doc_id, d.n_chars FROM documents d
WHERE d.doc_id % 2 = 1
  AND NOT EXISTS (SELECT 1 FROM documents p
                  WHERE p.doc_id % 2 = 0 AND p.text = d.text)"""),
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("n_chars"), col("text"))
        graft.api.DedupOps.unionWithPrecedence(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1), "text")
          .select(col("doc_id"), col("n_chars"))
      }),

    QueryDef(
      "q76_top_p_selection",
      "Top-p (nucleus) selection by mass (SampleOps.topPByMass): per " +
        "source, keep the smallest (n_chars desc, doc_id) prefix of " +
        "docs covering 80% of that source's total character mass - " +
        "adapts to mass concentration, unlike a fixed top-k. Both " +
        "windows PARTITION BY source (never global) and share one " +
        "exchange; unique order keys make RANGE and ROWS frames agree " +
        "cross-engine; integer-only predicate.",
      Some("""
WITH t AS (SELECT source, doc_id, n_chars,
    sum(n_chars) OVER (PARTITION BY source
                       ORDER BY n_chars DESC, doc_id) AS cum,
    sum(n_chars) OVER (PARTITION BY source) AS tot
  FROM documents)
SELECT source, doc_id, n_chars
FROM t WHERE (cum - n_chars) * 1000 < 800 * tot"""),
      (s, dir) =>
        graft.api.SampleOps.topPByMass(
          Tables.documents(s, dir)
            .select(col("source"), col("doc_id"), col("n_chars")),
          "doc_id", "source", "n_chars", pX1000 = 800)),

    QueryDef(
      "q77_winsorized_stats",
      "Per-type winsorized value stats (EventOps.winsorizedStats): " +
        "values capped at the type's exact p95 and summed - the " +
        "tail-taming transform before averaging heavy-tailed metrics. " +
        "One float step (percentile == quantile_cont bit-for-bit, the " +
        "q34 precedent) floor()ed to an integer cap; clip and sum are " +
        "pure int64. Tiny cap frame broadcasts back; both aggregations " +
        "collapse map-side.",
      Some("""
WITH e AS (SELECT event_type,
                  CAST(round(value * 1000000) AS BIGINT) AS vm FROM events),
c AS (SELECT event_type, floor(quantile_cont(vm, 0.95))::BIGINT AS cap_micro
      FROM e GROUP BY 1)
SELECT e.event_type, count(*) AS n, c.cap_micro,
       sum(CASE WHEN vm > cap_micro THEN 1 ELSE 0 END)::BIGINT AS n_clipped,
       sum(least(vm, cap_micro))::BIGINT AS sum_winsorized_micro
FROM e JOIN c USING (event_type) GROUP BY 1, 3"""),
      (s, dir) =>
        EventOps.winsorizedStats(Tables.events(s, dir), "event_type",
          "value", p = 0.95)),

    QueryDef(
      "q82_winsorized_approx",
      "q77's 100TB path, oracled: winsorized stats with the cap from " +
        "approx_percentile (EventOps.winsorizedStatsApprox - GK " +
        "sketch, bounded memory, mergeable partials; no per-key sort). " +
        "The sketch output is engine-specific, so the check is IN-BAND " +
        "(q47's rank-space precedent): the approx cap must lie between " +
        "the exact p +/- 0.01-rank quantiles, and the derived clip " +
        "count / winsorized sum must lie inside the envelopes those " +
        "guard caps imply (clip count anti-monotone, sum monotone in " +
        "the cap). Keys with n < 200 pass trivially: below that the " +
        "+/-0.01-rank envelope is narrower than one inter-element gap, " +
        "so an interpolated guard can cross the DISCRETE element the " +
        "GK sketch returns and the check would flag correct sketches " +
        "(tiny keys are exactly q77's domain anyway). The oracle " +
        "computes n exactly and expects every predicate uniformly " +
        "true.",
      Some("""
WITH e AS (SELECT event_type,
                  CAST(round(value * 1000000) AS BIGINT) AS vm FROM events)
SELECT event_type, count(*) AS n,
       true AS approx_cap_ok, true AS approx_clip_ok, true AS approx_sum_ok
FROM e GROUP BY 1"""),
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val approx = EventOps.winsorizedStatsApprox(
          ev, "event_type", "value", p = 0.95)
        // exact rank-space guard caps at p +/- 0.01, then the exact
        // clip/sum envelopes they imply (both need the caps first, so
        // guard derivation is two-phase like the stats themselves)
        val base = ev.select(col("event_type").as("_k"),
          round(col("value") * lit(1000000d)).cast("long").as("_vm"))
        val g0 = base.groupBy(col("_k"))
          .agg(floor(element_at(expr("percentile(_vm, array(0.94d, 0.96d))"), 1))
              .cast("long").as("_lo"),
            floor(element_at(expr("percentile(_vm, array(0.94d, 0.96d))"), 2))
              .cast("long").as("_hi"))
        val guards = base.join(broadcast(g0), "_k")
          .groupBy(col("_k"), col("_lo"), col("_hi"))
          .agg(
            sum(when(col("_vm") > col("_lo"), 1L).otherwise(0L)).as("_ngl"),
            sum(when(col("_vm") > col("_hi"), 1L).otherwise(0L)).as("_ngh"),
            sum(least(col("_vm"), col("_lo"))).as("_sl"),
            sum(least(col("_vm"), col("_hi"))).as("_sh"))
        // rank envelopes only bracket a DISCRETE sketch element when
        // 0.01·n spans at least one inter-element step — gate on n
        val big = col("n") >= 200
        approx.join(broadcast(guards), col("event_type") === col("_k"))
          .select(col("event_type"), col("n"),
            (!big || (col("cap_micro") >= col("_lo") &&
              col("cap_micro") <= col("_hi"))).as("approx_cap_ok"),
            (!big || (col("n_clipped") <= col("_ngl") &&
              col("n_clipped") >= col("_ngh"))).as("approx_clip_ok"),
            (!big || (col("sum_winsorized_micro") >= col("_sl") &&
              col("sum_winsorized_micro") <= col("_sh"))).as("approx_sum_ok"))
      }),

    QueryDef(
      "q79_gap_fill",
      "Dense daily series (EventOps.gapFill): per-type daily counts " +
        "with every missing day between the type's first and last " +
        "active day as an explicit 0 row - the regularization step " +
        "before time-series models (a missing row and a zero row mean " +
        "different things). The day grid explodes from the TINY " +
        "per-key span frame, never the event log; the counts join is " +
        "co-partitioned on (key, day).",
      Some("""
WITH d AS (SELECT event_type,
                  epoch_us(ts) // 86400000000 AS day FROM events),
c AS (SELECT event_type, day, count(*) AS n FROM d GROUP BY 1, 2),
s AS (SELECT event_type, min(day) AS d0, max(day) AS d1
      FROM d GROUP BY 1),
f AS (SELECT event_type, unnest(generate_series(d0, d1)) AS day FROM s)
SELECT f.event_type, f.day, coalesce(c.n, 0)::BIGINT AS n_events
FROM f LEFT JOIN c USING (event_type, day)"""),
      (s, dir) =>
        EventOps.gapFill(
          Tables.events(s, dir)
            .select(col("event_type"),
              expr("ts_ns div 1000 div 86400000000").as("day")),
          "event_type", "day")),

    QueryDef(
      "q81_source_profile",
      "Per-source corpus profile: TextOps.qualityScore composed per " +
        "source - doc counts, token mass, integer mean tokens, " +
        "quality-bucket shares, distinct languages. The decide-the-mix " +
        "report a pipeline runs before weighting sources (q60's " +
        "mixture weights come FROM a report like this). Map-only " +
        "scoring then one |sources|-row rollup with partial aggs; all " +
        "integer arithmetic.",
      Some("""
WITH t AS (
  SELECT source, lang, len(string_split(text, ' '))::BIGINT AS n_tok,
         ((length(text) - length(replace(text, ' the ', ''))) / 5)::BIGINT
           AS n_stop
  FROM documents),
q AS (SELECT source, lang, n_tok,
             CASE WHEN n_tok >= 40 AND (n_stop * 1000) // n_tok >= 20
                    THEN 'high'
                  WHEN n_tok >= 15 THEN 'medium' ELSE 'low' END AS quality
      FROM t)
SELECT source, count(*) AS n_docs,
       sum(n_tok)::BIGINT AS total_tok,
       (sum(n_tok) // count(*))::BIGINT AS mean_tok,
       sum(CASE WHEN quality = 'high' THEN 1 ELSE 0 END)::BIGINT AS n_high,
       sum(CASE WHEN quality = 'medium' THEN 1 ELSE 0 END)::BIGINT AS n_medium,
       sum(CASE WHEN quality = 'low' THEN 1 ELSE 0 END)::BIGINT AS n_low,
       count(DISTINCT lang) AS n_langs
FROM q GROUP BY 1"""),
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val scored = graft.api.TextOps.qualityScore(docs, "doc_id", "text")
          .select(col("doc_id"), col("n_tok"), col("quality"))
        docs.select(col("doc_id"), col("source"), col("lang"))
          .join(scored, "doc_id")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok")).as("total_tok"),
            expr("sum(n_tok) div count(1)").as("mean_tok"),
            sum(when(col("quality") === "high", 1L).otherwise(0L)).as("n_high"),
            sum(when(col("quality") === "medium", 1L).otherwise(0L)).as("n_medium"),
            sum(when(col("quality") === "low", 1L).otherwise(0L)).as("n_low"),
            countDistinct(col("lang")).as("n_langs"))
      }),

    QueryDef(
      "q97_incremental_agg_maintenance",
      "Incremental aggregate maintenance (EventOps.aggState/" +
        "mergeAggState): per-source token statistics kept as a " +
        "MERGEABLE state triple (count, Σv, Σv²) and updated by " +
        "merging the persisted state with the delta batch's partials " +
        "— never by rescanning the corpus. Here the 90% corpus " +
        "(doc_id % 10 != 0) builds the state, the 10% delta merges " +
        "in, and the oracle recomputes the SAME stats from the full " +
        "table in one pass — merge-equals-recompute is exactly the " +
        "associativity claim. Derived integer mean rides along. At " +
        "100TB each ingest pays O(|delta| + |sources|); the recompute " +
        "alternative pays the corpus. All-integer arithmetic.",
      Some("""
SELECT source,
       count(*) AS n_rows,
       sum(n_tok)::BIGINT AS sum_v,
       sum(n_tok * n_tok)::BIGINT AS sum_v2,
       (sum(n_tok) // count(*))::BIGINT AS mean_tok
FROM (SELECT source, len(string_split(text, ' '))::BIGINT AS n_tok
      FROM documents)
GROUP BY source"""),
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val nTok = size(split(col("text"), " ", -1)).cast("long")
        val state = EventOps.aggState(
          docs.filter(col("doc_id") % 10 =!= 0), "source", nTok)
        val deltaState = EventOps.aggState(
          docs.filter(col("doc_id") % 10 === 0), "source", nTok)
        EventOps.mergeAggState(state, deltaState, "source")
          .withColumn("mean_tok", expr("sum_v div n_rows"))
      }),

    QueryDef(
      "q118_fold_distinct_state",
      "Incremental DISTINCT-COUNT maintenance (EventOps.distinctState/" +
        "mergeDistinctState) — the maintained statistic q97's moment " +
        "triple cannot express: per-event-type distinct users kept as " +
        "a mergeable Datasketches HLL state, the 90% corpus building " +
        "the state and the 10% delta (event_id % 10 = 0) merging in " +
        "via per-key HLL union — duplicate-insensitive (a user seen " +
        "on both sides sets the same registers), so merge-equals-" +
        "recompute holds at the register level with NO corpus rescan. " +
        "Estimates are engine-specific, so the oracle is in-band " +
        "(q100's posture): exact distinct counts ride along and " +
        "approx_ok bounds the folded estimate within max(2, 10%). At " +
        "100TB each ingest pays O(|delta| + |keys| x KB-sketches); " +
        "the recompute alternative re-shuffles every user id ever " +
        "seen.",
      Some("""
SELECT event_type, count(DISTINCT user_id) AS uv_exact, true AS approx_ok
FROM events GROUP BY 1"""),
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val state = EventOps.distinctState(
          ev.filter(col("event_id") % 10 =!= 0), "event_type",
          col("user_id"))
        val deltaState = EventOps.distinctState(
          ev.filter(col("event_id") % 10 === 0), "event_type",
          col("user_id"))
        val merged = EventOps.mergeDistinctState(state, deltaState,
          "event_type")
        val exact = ev.groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("uv_exact"))
        EventOps.distinctEstimate(merged, "event_type")
          .join(exact, Seq("event_type"))
          .select(col("event_type"), col("uv_exact"),
            (abs(col("distinct_est") - col("uv_exact")) <=
              greatest(lit(2L), (col("uv_exact") / 10L).cast("long")))
              .as("approx_ok"))
      }),

    QueryDef(
      "q119_fold_quantile_state",
      "Incremental QUANTILE maintenance (EventOps.quantileState/" +
        "mergeQuantileState) — the third maintained statistic: q97 " +
        "folds moments, q118 folds cardinality, this folds the whole " +
        "value DISTRIBUTION as a per-key mergeable Datasketches KLL " +
        "sketch. The 90% corpus builds the state, the 10% delta " +
        "(event_id % 10 = 0) merges in per-key; KLL mergeability " +
        "preserves the +-1.65% (k=200) rank-error guarantee across " +
        "ANY merge tree, so fold==build-over-union holds at the " +
        "guarantee level with no corpus rescan. KLL compaction is " +
        "randomized, so the oracle is in-band in RANK space (q47's " +
        "discipline, guards at +-0.05 rank = 3x the error bound): " +
        "exact interpolated p50/p95/p99 ride along as the hashed " +
        "output, approx_ok bounds each folded estimate between the " +
        "exact quantiles at the guard ranks. At 100TB each ingest " +
        "pays O(|delta| + |keys| x KB-sketches); the exact " +
        "alternative re-sorts every value ever seen.",
      Some("""
SELECT event_type,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.95) AS p95,
       quantile_cont(value, 0.99) AS p99,
       true AS approx_ok
FROM events GROUP BY 1"""),
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val state = EventOps.quantileState(
          ev.filter(col("event_id") % 10 =!= 0), "event_type",
          col("value"))
        val deltaState = EventOps.quantileState(
          ev.filter(col("event_id") % 10 === 0), "event_type",
          col("value"))
        val merged = EventOps.mergeQuantileState(state, deltaState,
          "event_type")
        val ap = EventOps.quantileEstimate(merged, "event_type",
          Seq(0.5, 0.95, 0.99))
        // ex: the three outputs + the ±0.05-rank guard positions
        // [.5,.95,.99, .45,.55, .90, .94, 1.0] (p95/p99 cap at max).
        val exact = ev.groupBy(col("event_type"))
          .agg(expr("percentile(value, " +
            "array(0.5, 0.95, 0.99, 0.45, 0.55, 0.90, 0.94, 1.0))")
            .as("ex"))
        def g(i: Int) = element_at(col("ex"), i)
        exact.join(ap, Seq("event_type"))
          .select(col("event_type"),
            g(1).as("p50"), g(2).as("p95"), g(3).as("p99"),
            (col("q_0") >= g(4) && col("q_0") <= g(5) &&
              col("q_1") >= g(6) && col("q_1") <= g(8) &&
              col("q_2") >= g(7) && col("q_2") <= g(8)).as("approx_ok"))
      }),

    QueryDef(
      "q120_fold_heavy_hitters",
      "Incremental HEAVY-HITTERS maintenance (EventOps." +
        "heavyHittersState/mergeHeavyHittersState) — the fourth " +
        "maintained statistic: q97 folds moments, q118 cardinality, " +
        "q119 the distribution, this folds the HOT KEYS. The 90% " +
        "corpus's per-event-type Misra-Gries summaries (48 counters) " +
        "persist as a |keys|-row state; the 10% delta's partials fold " +
        "in via heavy_hitters_merge — the SAME counter/trim algebra " +
        "the base aggregate uses across partitions, and the MG merge " +
        "guarantees (Agarwal et al., PODS'12) hold for ANY merge " +
        "tree, so q56's theorem oracle applies to the FOLDED state " +
        "verbatim: every estimate under-counts by at most delta, " +
        "every key above delta is present, delta*(cap+1) <= N — " +
        "checked in-band (mg_ok) with exact per-type row/key counts " +
        "riding along as the hashed output. Capacity lives IN the " +
        "state (mg_cap); mixed-capacity folds fail loudly. Each " +
        "ingest pays O(|keys| x capacity), never a corpus rescan.",
      Some("""
SELECT event_type, count(*) AS n_events,
       count(DISTINCT json_extract(props, '$.k')::BIGINT) AS n_keys,
       true AS mg_ok
FROM events GROUP BY event_type"""),
      (s, dir) => {
        val cap = 48
        val ev = Tables.events(s, dir)
          .select(col("event_type"), col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
        val state = EventOps.heavyHittersState(
          ev.filter(col("event_id") % 10 =!= 0), "event_type",
          col("k"), cap)
        val deltaState = EventOps.heavyHittersState(
          ev.filter(col("event_id") % 10 === 0), "event_type",
          col("k"), cap)
        val folded = EventOps.mergeHeavyHittersState(state, deltaState,
          "event_type")
        val exact = ev.groupBy(col("event_type"), col("k"))
          .agg(count(lit(1)).as("cnt"))
        val est = folded
          .select(col("event_type"), explode(col("mg_items")).as("it"))
          .select(col("event_type"), col("it.key").as("k"),
            col("it.est").as("est"))
        // MG only under-counts, so folded keys are a subset of exact
        // keys: a left join from exact covers both directions (q56).
        // n_events = sum of the exact per-key counts, folded in the
        // final rollup — no separate corpus-count scan or shuffle.
        exact.join(est, Seq("event_type", "k"), "left")
          .join(broadcast(folded.select(col("event_type"),
            col("mg_delta").as("delta"))), Seq("event_type"))
          .groupBy(col("event_type"))
          .agg(sum(col("cnt")).as("n_events"),
            count(lit(1)).as("n_keys"),
            (every(when(col("est").isNull, col("cnt") <= col("delta"))
              .otherwise(col("est") <= col("cnt") &&
                col("cnt") - col("est") <= col("delta"))) &&
              max(col("delta")) * (cap + 1) <= sum(col("cnt")))
              .as("mg_ok"))
      })
  )
}

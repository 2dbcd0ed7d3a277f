package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextHashing._
import graft.{QueryDef, Tables}

/** Near-duplicate detection + similarity-search operators — the
  * scale-path components of a training-data pipeline. MinHash/SimHash
  * use TextHashing (single source of truth for permutation constants in
  * both the Spark plan and the DuckDB oracle).
  */
object DedupQueries {

  /** q39 hyperplanes: 16 planes × 64 dims, deterministic hash-derived
    * values in [-1, 1). One generator feeds identical double literals
    * (shortest-roundtrip toString) to the Spark plan and the oracle.
    */
  private val LshPlanes = 16
  private val LshDims = 64
  private def plane(j: Int): Seq[Double] =
    (0 until LshDims).map { d =>
      (((j * LshDims + d).toLong * 2654435761L) % 1000003L) / 1000003.0 * 2.0 - 1.0
    }
  private def planeSqlList(j: Int): String =
    plane(j).mkString("[", ", ", "]")

  /** The full q39/q53/q83 hyperplane set — exposed so BenchScale's
    * const-delta probe bands EXACTLY like the catalog queries.
    */
  private[graft] def lshPlanes: Seq[Seq[Double]] =
    (0 until LshPlanes).map(plane)
  private def planeSqlArray(j: Int): String =
    plane(j).map(x => s"${x}D").mkString("array(", ", ", ")")

  // Spark-side shingling runs through the native ShingleHashes
  // expression (TextHashExpressions); shingledSql below is the oracle's
  // declarative spelling of the same values. Parameterized by source
  // table so the composed curation pipeline (CurationQueries) re-runs
  // the SAME stage SQL over its survivor CTEs — one generator, no
  // drift.
  private def shingledSql(table: String) =
    s"""SELECT doc_id,
       list_distinct(list_transform(generate_series(1, len(string_split(text,' '))-2),
         i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS shs
FROM $table WHERE len(string_split(text,' ')) >= 3"""

  /** Shared oracle prefix for the hyperplane-LSH embedding queries
    * (q53 self-join, q83 incremental): normalized vectors, per-plane
    * sign bits, banded keys — ONE generator (the q21OracleSql pattern)
    * so both oracles band identically; a banding change that reached
    * one but not the other would drift silently otherwise.
    */
  private lazy val lshBandsCte: String = s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
s AS (SELECT vec_id,
${(0 until LshPlanes).map(j =>
    s"  (CASE WHEN list_dot_product(v, ${planeSqlList(j)}) > 0 THEN ${1 << (j % 4)} ELSE 0 END) AS s$j")
    .mkString(",\n")}
      FROM n),
bands AS (
${(0 until LshPlanes / 4).map(b =>
    s"  SELECT vec_id, $b AS band, s${4 * b} + s${4 * b + 1} + s${4 * b + 2} + s${4 * b + 3} AS bkey FROM s")
    .mkString("\n  UNION ALL\n")})"""

  /** q21's pair SQL over any doc table — shared by q37/q46/q58 (via
    * [[q21OracleSql]]) and re-run over the curation pipeline's
    * survivor set (bucket caps are a function of the INPUT set, so the
    * composed stage must re-derive, not reuse, the full-corpus pairs).
    */
  private[queries] def minhashPairsSql(table: String): String = s"""
WITH s AS (${shingledSql(table)}),
h AS (SELECT doc_id,
             list_distinct(list_transform(shs, sh -> ${hash60Sql("sh")} % $P)) AS hs
      FROM s),
m AS (SELECT doc_id, ${minhashSqlArray("hs")} AS mh FROM h),
bands AS (
  SELECT doc_id, g.b AS band,
         mh[4*g.b+1]::VARCHAR || ':' || mh[4*g.b+2]::VARCHAR || ':' ||
         mh[4*g.b+3]::VARCHAR || ':' || mh[4*g.b+4]::VARCHAR AS bkey
  FROM m CROSS JOIN generate_series(0, ${Bands - 1}) g(b)),
ok AS (
  SELECT band, bkey FROM bands
  GROUP BY band, bkey
  HAVING count(*) <= ${graft.api.DedupOps.DefaultMaxBucket}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN ok o ON a.band = o.band AND a.bkey = o.bkey
  JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
  WHERE a.doc_id < b.doc_id),
v AS (
  SELECT doc_a, doc_b,
         len(list_intersect(ha.hs, hb.hs)) AS it,
         len(list_distinct(list_concat(ha.hs, hb.hs))) AS un
  FROM cand JOIN h ha ON ha.doc_id = doc_a JOIN h hb ON hb.doc_id = doc_b)
SELECT doc_a, doc_b, (it * 1000) // un AS jaccard_x1000
FROM v WHERE (it * 1000) // un >= 500"""

  /** q21's full oracle SQL — shared by q37 (materialization) and q46
    * (transitive clustering), which build on the same pair list.
    */
  private[queries] lazy val q21OracleSql: String = minhashPairsSql("documents")

  /** First-principles derivation of the q133/q134 perceptual image
    * hashes, shared by both oracles (the q89/q92 one-generator
    * discipline — the hash and the pair query cannot drift). Pixel
    * (x, y) of doc d is byte ((y*16 + x) mod n) of the doc's UTF-8
    * bytes (exactly how Multimodal.grayBmp16 seeds the REAL BMP the
    * Spark side decodes); every aHash/dHash bit decision reduces to
    * an integer cross-multiplication because all the engine-side
    * doubles are exact (gray luminance == the pixel byte; block
    * counts are powers of two — MediaSpec pins the law).
    */
  private lazy val imageHashCtes: String = s"""
WITH imgd AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM documents
  WHERE text IS NOT NULL AND octet_length(encode(text)) >= 1),
px AS (
  SELECT doc_id, (g.j % 16) AS x, (g.j // 16) AS y,
         ('0x' || substr(hx, 2 * (g.j % n) + 1, 2))::BIGINT AS v
  FROM imgd CROSS JOIN generate_series(0, 255) g(j)),
ab AS (
  SELECT doc_id, (y // 2) * 8 + (x // 2) AS i, sum(v) AS s
  FROM px GROUP BY 1, 2),
atot AS (SELECT doc_id, sum(s) AS t FROM ab GROUP BY 1),
ah AS (
  SELECT ab.doc_id,
         sum(CASE WHEN ab.s * 64 > atot.t THEN
               CASE WHEN ab.i = 63 THEN -9223372036854775808
                    ELSE (1::BIGINT << ab.i::INT) END
             ELSE 0 END)::BIGINT AS ahash64
  FROM ab JOIN atot USING (doc_id) GROUP BY 1),
gb AS (
  SELECT cx, (cx * 16) // 9 AS x0,
         least(16, greatest((cx * 16) // 9 + 1, ((cx + 1) * 16) // 9)) AS x1
  FROM generate_series(0, 8) t(cx)),
db AS (
  SELECT px.doc_id, gb.cx, (px.y // 2) AS cy, sum(px.v) AS s,
         count(*) AS c
  FROM px JOIN gb ON px.x >= gb.x0 AND px.x < gb.x1
  GROUP BY 1, 2, 3),
dh AS (
  SELECT l.doc_id,
         sum(CASE WHEN l.s * r.c < r.s * l.c THEN
               CASE WHEN l.cy * 8 + l.cx = 63 THEN -9223372036854775808
                    ELSE (1::BIGINT << (l.cy * 8 + l.cx)::INT) END
             ELSE 0 END)::BIGINT AS dhash64
  FROM db l JOIN db r ON l.doc_id = r.doc_id AND l.cy = r.cy
        AND r.cx = l.cx + 1
  WHERE l.cx < 8
  GROUP BY 1)"""

  /** q137's full oracle SQL — shared VERBATIM by q138 (persisted-index
    * fold probe): the fold's contract is that a folded index probes
    * identically to the inline delta-vs-corpus path, so the expected
    * rows are literally q137's (the q59/q110 shared-string pattern).
    */
  private lazy val q137OracleSql: String = s"""
$imageHashCtes,
blocks AS (
  SELECT doc_id, g.b AS band,
         CASE WHEN g.b = 6 THEN (dhash64 >> 54) & 1023
              ELSE (dhash64 >> (9 * g.b)) & 511 END AS bkey
  FROM dh CROSS JOIN generate_series(0, 6) g(b)),
ok AS (
  SELECT band, bkey FROM blocks WHERE doc_id % 5 <> 0
  GROUP BY band, bkey
  HAVING count(*) <= ${graft.api.DedupOps.DefaultMaxBucket}),
cand AS (
  SELECT DISTINCT n.doc_id AS doc_new, o.doc_id AS doc_old
  FROM blocks n
  JOIN ok k ON n.band = k.band AND n.bkey = k.bkey
  JOIN blocks o ON o.band = n.band AND o.bkey = n.bkey
  WHERE n.doc_id % 5 = 0 AND o.doc_id % 5 <> 0)
SELECT doc_new, doc_old,
       bit_count(xor(a.dhash64, b.dhash64))::BIGINT AS hamming
FROM cand
JOIN dh a ON a.doc_id = doc_new
JOIN dh b ON b.doc_id = doc_old
WHERE bit_count(xor(a.dhash64, b.dhash64)) <= 6"""

  /** First-principles derivation of the q135/q136 audio envelope
    * fingerprint (the [[imageHashCtes]] discipline on the audio
    * axis). Sample j of doc d is byte (j mod n) of the doc's UTF-8
    * bytes, stored VERBATIM as 8-bit unsigned PCM by
    * Multimodal.pcmWav8 and extracted NATIVELY in 8-bit by
    * envelopeHash — NOT through the JDK's 8→16 widener, whose
    * per-sample rounding (round(d·32767/127) on the positive side)
    * would break the exact replay (the MediaSpec law test caught it).
    * |sample distance from the midpoint| is therefore exactly
    * |v − 128|, and bit w is the integer comparison wsum·64 > total
    * (256 samples, 64 windows of 4 — MediaSpec pins the law through
    * the real decode).
    */
  private lazy val audioHashCtes: String = s"""
WITH auda AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM documents
  WHERE text IS NOT NULL AND octet_length(encode(text)) >= 1),
smp AS (
  SELECT doc_id, g.j // 4 AS w,
         abs(('0x' || substr(hx, 2 * (g.j % n) + 1, 2))::BIGINT - 128) AS a
  FROM auda CROSS JOIN generate_series(0, 255) g(j)),
wsum AS (SELECT doc_id, w, sum(a) AS s FROM smp GROUP BY 1, 2),
wtot AS (SELECT doc_id, sum(s) AS t FROM wsum GROUP BY 1),
eh AS (
  SELECT wsum.doc_id,
         sum(CASE WHEN wsum.s * 64 > wtot.t THEN
               CASE WHEN wsum.w = 63 THEN -9223372036854775808
                    ELSE (1::BIGINT << wsum.w::INT) END
             ELSE 0 END)::BIGINT AS envhash64
  FROM wsum JOIN wtot USING (doc_id) GROUP BY 1)"""

  /** First-principles derivation of the q139/q140 video fingerprint
    * (the [[imageHashCtes]] discipline lifted to a container-of-
    * containers). Frame f of doc d is the doc's 16x16 BMP with pixel
    * (x, y) = byte ((f + y*16 + x) mod n) — exactly how
    * Multimodal.bmpAvi16 rotates the seed per frame — and the oracle
    * REPLAYS THE SAMPLER: 6 container frames, 4 sampled, indices
    * (i*6)//4 = {0, 1, 3, 4} (the `vf` CTE derives them from the
    * formula, not a literal list, so a drifted engine-side sampler
    * breaks the compare). Per sampled frame the dHash gradient bits
    * re-derive by the q133 integer cross-multiplication, and the
    * 64-bit video fingerprint takes each bit by strict majority over
    * the 4 frames (cnt*2 > 4). Block geometry CTEs are per-frame
    * copies of [[imageHashCtes]]'s (9-column bounds, row pairs).
    */
  private lazy val videoHashCtes: String = s"""
WITH vidd AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM documents
  WHERE text IS NOT NULL AND octet_length(encode(text)) >= 1),
vf AS (SELECT (t.i * 6) // 4 AS f FROM generate_series(0, 3) t(i)),
vpx AS (
  SELECT doc_id, vf.f AS f, (g.j % 16) AS x, (g.j // 16) AS y,
         ('0x' || substr(hx, 2 * ((g.j + vf.f) % n) + 1, 2))::BIGINT AS v
  FROM vidd CROSS JOIN vf CROSS JOIN generate_series(0, 255) g(j)),
vgb AS (
  SELECT cx, (cx * 16) // 9 AS x0,
         least(16, greatest((cx * 16) // 9 + 1, ((cx + 1) * 16) // 9)) AS x1
  FROM generate_series(0, 8) t(cx)),
vdb AS (
  SELECT vpx.doc_id, vpx.f, vgb.cx, (vpx.y // 2) AS cy, sum(vpx.v) AS s,
         count(*) AS c
  FROM vpx JOIN vgb ON vpx.x >= vgb.x0 AND vpx.x < vgb.x1
  GROUP BY 1, 2, 3, 4),
vbit AS (
  SELECT l.doc_id, l.cy * 8 + l.cx AS i,
         sum(CASE WHEN l.s * r.c < r.s * l.c THEN 1 ELSE 0 END) AS cnt
  FROM vdb l JOIN vdb r ON l.doc_id = r.doc_id AND l.f = r.f
        AND l.cy = r.cy AND r.cx = l.cx + 1
  WHERE l.cx < 8
  GROUP BY 1, 2),
vh AS (
  SELECT doc_id,
         sum(CASE WHEN cnt * 2 > 4 THEN
               CASE WHEN i = 63 THEN -9223372036854775808
                    ELSE (1::BIGINT << i::INT) END
             ELSE 0 END)::BIGINT AS vhash64
  FROM vbit GROUP BY 1)"""

  /** q53's full oracle SQL — shared by q90 (semantic-dedup keepers),
    * which clusters the same pair list (the q21OracleSql pattern in
    * vector space).
    */
  private[queries] lazy val q53OracleSql: String = s"""
WITH $lshBandsCte,
ok AS (
  SELECT band, bkey FROM bands
  GROUP BY band, bkey
  HAVING count(*) <= ${graft.api.DedupOps.DefaultMaxBucket}),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bands a
  JOIN ok o ON a.band = o.band AND a.bkey = o.bkey
  JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
  WHERE a.vec_id < b.vec_id),
v AS (
  SELECT vec_a, vec_b,
         list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm) AS sim
  FROM cand
  JOIN n na ON na.vec_id = vec_a
  JOIN n nb ON nb.vec_id = vec_b)
SELECT vec_a, vec_b, floor(sim * 1000)::BIGINT AS sim_x1000
FROM v WHERE floor(sim * 1000) >= 400"""

  /** The q101 feature-hash text embedding + sign-band CTE chain over
    * `documents` (tt..bands, ending at `n` vectors + `bands` keys) —
    * ONE generator shared by the q102 and q103 oracles, the BpeOps
    * chainSql discipline: the two SQL consumers can never disagree
    * about the embedding or the banding.
    */
  private[queries] lazy val textEmbeddingBandsCte: String = s"""tt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
hh AS (SELECT doc_id, ${hash60Sql("w")} AS h FROM tt WHERE w <> ''),
hc AS (SELECT doc_id, h % 64 AS dim,
              sum(CASE WHEN (h // 4294967296) % 2 = 0 THEN 1
                       ELSE -1 END)::BIGINT AS c
       FROM hh GROUP BY 1, 2),
n2t AS (SELECT doc_id, sum(c * c)::BIGINT AS n2 FROM hc GROUP BY 1),
grid AS (SELECT d.doc_id, g.i AS dim
         FROM (SELECT DISTINCT doc_id FROM documents) d,
              generate_series(0, 63) g(i)),
dense AS (SELECT g.doc_id, g.dim, coalesce(hc.c, 0) AS c
          FROM grid g LEFT JOIN hc
            ON hc.doc_id = g.doc_id AND hc.dim = g.dim),
e AS MATERIALIZED (
  SELECT dense.doc_id AS vec_id,
         list(dense.c / sqrt(n2t.n2) ORDER BY dense.dim) AS v
  FROM dense JOIN n2t ON n2t.doc_id = dense.doc_id
  WHERE n2t.n2 > 0 GROUP BY 1),
n AS MATERIALIZED (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
s AS (SELECT vec_id,
${(0 until LshPlanes).map(j =>
        s"  (CASE WHEN list_dot_product(v, ${planeSqlList(j)}) > 0 THEN ${1 << (j % 4)} ELSE 0 END) AS s$j")
        .mkString(",\n")}
      FROM n),
bands AS MATERIALIZED (
${(0 until LshPlanes / 4).map(b =>
        s"  SELECT vec_id, $b AS band, s${4 * b} + s${4 * b + 1} + s${4 * b + 2} + s${4 * b + 3} AS bkey FROM s")
        .mkString("\n  UNION ALL\n")})"""


  /** q85's passage-pair SQL over any doc table (see minhashPairsSql
    * for why the curation pipeline re-derives it over survivors).
    */
  private[queries] def passagePairsSql(table: String): String = s"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM $table),
ix AS (SELECT doc_id, tk,
              unnest(generate_series(0, (len(tk)-1)//25)) AS i
       FROM toks),
chunks AS (
  SELECT doc_id * 100000 + i AS cid,
         array_to_string(tk[(i*25+1):(i*25+25)], ' ') AS ctext
  FROM ix),
s AS (SELECT cid,
       list_distinct(list_transform(generate_series(1, len(string_split(ctext,' '))-2),
         i -> string_split(ctext,' ')[i] || ' ' || string_split(ctext,' ')[i+1] || ' ' || string_split(ctext,' ')[i+2])) AS shs
      FROM chunks WHERE len(string_split(ctext,' ')) >= 3),
h AS (SELECT cid,
             list_distinct(list_transform(shs, sh -> ${hash60Sql("sh")} % $P)) AS hs
      FROM s),
m AS (SELECT cid, ${minhashSqlArray("hs")} AS mh FROM h),
bands AS (
  SELECT cid, g.b AS band,
         mh[4*g.b+1]::VARCHAR || ':' || mh[4*g.b+2]::VARCHAR || ':' ||
         mh[4*g.b+3]::VARCHAR || ':' || mh[4*g.b+4]::VARCHAR AS bkey
  FROM m CROSS JOIN generate_series(0, ${Bands - 1}) g(b)),
ok AS (
  SELECT band, bkey FROM bands
  GROUP BY band, bkey
  HAVING count(*) <= ${graft.api.DedupOps.DefaultMaxBucket}),
cand AS (
  SELECT DISTINCT a.cid AS ca, b.cid AS cb
  FROM bands a
  JOIN ok o ON a.band = o.band AND a.bkey = o.bkey
  JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
  WHERE a.cid < b.cid),
v AS (
  SELECT ca, cb,
         len(list_intersect(ha.hs, hb.hs)) AS it,
         len(list_distinct(list_concat(ha.hs, hb.hs))) AS un
  FROM cand JOIN h ha ON ha.cid = ca JOIN h hb ON hb.cid = cb),
p AS (
  SELECT ca, cb, (it * 1000) // un AS jaccard_x1000
  FROM v WHERE (it * 1000) // un >= 500)
SELECT ca // 100000 AS doc_a, ca % 100000 AS chunk_a,
       cb // 100000 AS doc_b, cb % 100000 AS chunk_b, jaccard_x1000
FROM p WHERE ca // 100000 <> cb // 100000"""

  /** The q106/q107 CDC front end: `ck` = (doc_id, chs) with chs the
    * DISTINCT content-defined chunk hashes of each doc — the DuckDB
    * transcription of the native `cdc_chunk_hashes` kernel
    * (TextHashLawsSpec pins the equivalence).
    */
  /** ONE pair of CDC geometry constants for q106/q107: both the
    * DuckDB oracle fragment and the Scala kernel call sites read
    * these, so oracle and kernel geometry cannot drift.
    */
  private val CdcMod = 32
  private val CdcWindow = 4

  private def cdcChunksSql(table: String, modulus: Int,
      window: Int = 4): String = s"""
t AS (SELECT doc_id, string_split(text,' ') AS tk FROM $table),
tb AS (SELECT doc_id, tk, len(tk) AS n,
       CASE WHEN len(tk) >= $window THEN
         list_filter(generate_series($window, len(tk)),
           i -> ${hash60Sql(s"array_to_string(tk[i-${window - 1}:i], ' ')")} % $modulus = 0)
       ELSE [] END AS b
       FROM t),
ck AS (SELECT doc_id,
       list_distinct(list_transform(
         list_filter(generate_series(1, len(st)), j -> en[j] > st[j]),
         j -> ${hash60Sql("array_to_string(tk[st[j]+1:en[j]], ' ')")})) AS chs
       FROM (SELECT doc_id, tk, [0] || b AS st, b || [n] AS en FROM tb))"""

  /** q59's oracle, shared VERBATIM by q110 (probe through a FOLDED
    * persisted index): the fold's exactness contract — folded index ==
    * from-scratch build — makes the two queries' expected output
    * literally identical, so one oracle string serves both and they
    * cannot drift.
    */
  private[queries] val q59OracleSql: String = s"""
WITH s AS (${shingledSql("documents")}),
h AS (SELECT doc_id,
             list_distinct(list_transform(shs, sh -> ${hash60Sql("sh")} % $P)) AS hs
      FROM s),
m AS (SELECT doc_id, ${minhashSqlArray("hs")} AS mh FROM h),
bands AS (
  SELECT doc_id, g.b AS band,
         mh[4*g.b+1]::VARCHAR || ':' || mh[4*g.b+2]::VARCHAR || ':' ||
         mh[4*g.b+3]::VARCHAR || ':' || mh[4*g.b+4]::VARCHAR AS bkey
  FROM m CROSS JOIN generate_series(0, ${Bands - 1}) g(b)),
cb AS (SELECT * FROM bands WHERE doc_id % 5 <> 0),
nb AS (SELECT * FROM bands WHERE doc_id % 5 = 0),
ok AS (
  SELECT band, bkey FROM cb
  GROUP BY band, bkey
  HAVING count(*) <= ${graft.api.DedupOps.DefaultMaxBucket}),
cand AS (
  SELECT DISTINCT n.doc_id AS doc_new, c.doc_id AS doc_old
  FROM nb n
  JOIN ok o ON n.band = o.band AND n.bkey = o.bkey
  JOIN cb c ON c.band = o.band AND c.bkey = o.bkey),
v AS (
  SELECT doc_new, doc_old,
         len(list_intersect(hn.hs, ho.hs)) AS it,
         len(list_distinct(list_concat(hn.hs, ho.hs))) AS un
  FROM cand JOIN h hn ON hn.doc_id = doc_new
            JOIN h ho ON ho.doc_id = doc_old)
SELECT doc_new, doc_old, (it * 1000) // un AS jaccard_x1000
FROM v WHERE (it * 1000) // un >= 500"""

  /** q107's oracle, shared VERBATIM by q111 (probe through a FOLDED
    * persisted CDC chunk index) — same drift-proofing as [[q59OracleSql]].
    */
  private[queries] val q107OracleSql: String = s"""
WITH ${cdcChunksSql("documents", CdcMod, CdcWindow)},
corpus AS (SELECT DISTINCT unnest(chs) AS c FROM ck WHERE doc_id % 5 <> 0),
delta AS (SELECT doc_id, unnest(chs) AS c FROM ck WHERE doc_id % 5 = 0),
hits AS (SELECT doc_id, count(*) AS nh FROM delta JOIN corpus USING (c)
         GROUP BY 1)
SELECT ck.doc_id, len(chs)::BIGINT AS n_chunks,
       coalesce(nh, 0)::BIGINT AS n_hits,
       (CASE WHEN len(chs) > 0
             THEN (coalesce(nh, 0) * 1000) // len(chs)
             ELSE 0 END)::BIGINT AS hit_x1000
FROM ck LEFT JOIN hits USING (doc_id) WHERE ck.doc_id % 5 = 0"""

  /** q83's oracle, shared VERBATIM by q113 (probe through a FOLDED
    * persisted sign index) — the [[q59OracleSql]] drift-proofing for
    * the vector family.
    */
  private[queries] val q83OracleSql: String = s"""
WITH $lshBandsCte,
corpb AS (SELECT * FROM bands WHERE vec_id % 5 <> 0),
newb AS (SELECT * FROM bands WHERE vec_id % 5 = 0),
ok AS (
  SELECT band, bkey FROM corpb
  GROUP BY band, bkey
  HAVING count(*) <= ${graft.api.DedupOps.DefaultMaxBucket}),
cand AS (
  SELECT DISTINCT nw.vec_id AS vec_new, c.vec_id AS vec_old
  FROM newb nw
  JOIN ok o ON nw.band = o.band AND nw.bkey = o.bkey
  JOIN corpb c ON c.band = o.band AND c.bkey = o.bkey),
v AS (
  SELECT vec_new, vec_old,
         list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm) AS sim
  FROM cand
  JOIN n na ON na.vec_id = vec_new
  JOIN n nb ON nb.vec_id = vec_old)
SELECT vec_new, vec_old, floor(sim * 1000)::BIGINT AS sim_x1000
FROM v WHERE floor(sim * 1000) >= 400"""

  val all: Seq[QueryDef] = Seq(

    QueryDef(
      "q21_dedup_minhash_lsh",
      "MinHash+LSH near-dup detection: 3-token shingles → 60-bit md5 " +
        "hashes → 16 minhash permutations → 4 bands of 4 → capped " +
        "band-bucket aggregation for candidates → exact shingle-Jaccard " +
        "verification (>= 0.5). At 100TB only band keys (4×~32B/doc) " +
        "shuffle, buckets over " +
        s"${graft.api.DedupOps.DefaultMaxBucket} ids are skipped (skew " +
        "cap — mass duplication belongs to the O(n) exact-digest pass), " +
        "and the verify re-reads shingles only for candidates.",
      Some(q21OracleSql),
      (s, dir) =>
        // Band join carries ONLY (band, key, id); shingle-hash sets
        // rejoin just for surviving candidates (see DedupOps.minhashPairs
        // — shuffle volume O(docs × 4 keys) + O(candidates × set)).
        graft.api.DedupOps.minhashPairs(
          Tables.documents(s, dir), "doc_id", "text",
          jaccardX1000Threshold = 500)),

    QueryDef(
      "q85_passage_dedup",
      "Passage-level (sub-document) dedup (DedupOps.passagePairs): " +
        "duplicate SPANS across documents — license blocks, " +
        "boilerplate paragraphs, syndicated fragments — that doc-level " +
        "q15/q21 cannot see when the surrounding documents differ. " +
        "Non-overlapping 25-token chunks (TextOps.chunk) become " +
        "pseudo-docs with id = doc_id*100000 + chunk_idx, run through " +
        "the SAME capped MinHash-LSH pair pipeline as q21 (identical " +
        "skew contract), then decode back to (doc, chunk) spans; " +
        "same-doc pairs drop (within-doc repetition is q44's job). " +
        "The chunk explode is map-only — rows never leave their input " +
        "partition — so the scale shape is exactly q21's with " +
        "~tokens/25 more rows.",
      Some(passagePairsSql("documents")),
      (s, dir) =>
        graft.api.DedupOps.passagePairs(
          Tables.documents(s, dir), "doc_id", "text",
          chunkTokens = 25, maxChunksPerDoc = 100000L,
          jaccardX1000Threshold = 500)),

    QueryDef(
      "q87_exact_substring_spans",
      "Exact-substring duplicate spans (DedupOps.exactSubstringSpans; " +
        "Lee et al. 2022's ExactSubstr dedup): maximal token intervals " +
        "covered by 8-token runs appearing VERBATIM in >= 2 distinct " +
        "docs — exact repeats at arbitrary offsets that q85's fixed " +
        "25-token approximate chunks round away. The hash analog of " +
        "the paper's suffix array (a global token-position sort at " +
        "100 TB): map-only gram explode, ONE partial-agg'd exchange on " +
        "the 60-bit gram hash, a co-partitioned LEFT SEMI back-join " +
        "(existence only — a boilerplate gram in a million docs costs " +
        "postings, never pairs), and an island-merge window over just " +
        "the shared positions. Grams in > 1000 distinct docs are " +
        "dropped (the capped-bucket contract): corpus-wide boilerplate " +
        "is q70's O(n) job, and the cap stops any one gram from " +
        "shipping corpus-scale positions into the window.",
      Some(s"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
ix AS (SELECT doc_id, tk, unnest(generate_series(0, len(tk) - 8)) AS pos
       FROM toks WHERE len(tk) >= 8),
g AS (SELECT doc_id, pos,
             ${hash60Sql("array_to_string(tk[pos+1:pos+8], ' ')")} AS gh
      FROM ix),
sh AS (SELECT gh FROM (SELECT DISTINCT gh, doc_id FROM g)
       GROUP BY gh HAVING count(*) >= 2 AND count(*) <= 1000),
p AS (SELECT doc_id, pos FROM g WHERE gh IN (SELECT gh FROM sh)),
b AS (SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                    OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
                  THEN 1 ELSE 0 END AS brk
      FROM p),
i AS (SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      FROM b)
SELECT doc_id, min(pos) AS span_start, max(pos) + 8 AS span_end,
       max(pos) + 8 - min(pos) AS span_tokens
FROM i GROUP BY doc_id, grp"""),
      (s, dir) =>
        graft.api.DedupOps.exactSubstringSpans(
          Tables.documents(s, dir), "doc_id", "text",
          gramTokens = 8, minDocs = 2, maxDocsPerGram = 1000)),

    QueryDef(
      "q149_substring_decontamination",
      "Exact-substring DECONTAMINATION spans " +
        "(DedupOps.exactSubstringSpansAgainst) — q87's incremental " +
        "posture, and the decontamination question proper: every " +
        "maximal token interval of a NEW document (the 20% doc_id%5=0 " +
        "delta) covered by 8-token runs appearing VERBATIM anywhere " +
        "in the CORPUS (minCorpusDocs=1 — the self-join needs >= 2 " +
        "only because a gram trivially appears in its own doc). Grams " +
        "in > 1000 corpus docs drop (boilerplate is q70's O(n) job). " +
        "The corpus is never self-paired and the delta never counts " +
        "toward the threshold; the SAME gramPositions + mergeSpans " +
        "internals as q87, so self-join and incremental paths cannot " +
        "gram or merge differently. The oracle replays gram hashing, " +
        "the corpus-side count thresholds, and the island merge " +
        "value-for-value.",
      Some(substringDecontSql),
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        graft.api.DedupOps.exactSubstringSpansAgainst(
          docs.filter(col("doc_id") % 5 === 0),
          docs.filter(col("doc_id") % 5 =!= 0),
          "doc_id", "text", gramTokens = 8, minCorpusDocs = 1,
          maxDocsPerGram = 1000)
      }),

    QueryDef(
      "q150_fold_gram_probe",
      "Gram-count index maintenance proven end-to-end " +
        "(DedupOps.writeGramIndex / maintainGramIndex / " +
        "exactSubstringSpansAgainstIndex) — the SEVENTH persisted " +
        "family, and the simplest reconcile in the LSM stable: the " +
        "index stores per-gram distinct-CORPUS-doc COUNTS partitioned " +
        "by a 64-way gram-hash prefix; v1 indexes the doc_id%5 in " +
        "{1,2} slice, the {3,4} slice folds IN PLACE through the full " +
        "maintain* policy (writer lock, recoverAtEntry, O(delta) " +
        "appended run — layers stays under the default threshold, so " +
        "the probe exercises the LAYERED path), and reconcile is " +
        "exact BY ADDITIVITY (disjoint delta doc ids => a gram's " +
        "total count is the sum of its per-run counts — no cap " +
        "tombstones exist; the cap is a probe-side threshold over " +
        "reconciled totals). The probe derives the delta's grams with " +
        "the INDEX's meta geometry, prunes the gram table to the " +
        "delta's hash prefixes (isin partition literals — decisive " +
        "when the probe is an eval set's handful of documents), and " +
        "must emit EXACTLY q149's spans: fold==rebuild is literally " +
        "the driver-checked hash, on the q110/q113/q138 pattern.",
      Some(substringDecontSql),
      (s, dir) =>
        graft.api.DedupOps.exactSubstringSpansAgainstIndex(
          Tables.documents(s, dir).filter(col("doc_id") % 5 === 0),
          "doc_id", "text", foldedGramDir(s, dir),
          minCorpusDocs = 1, maxDocsPerGram = 1000)),

    QueryDef(
      "q29_ngram_jaccard",
      "Exact n-gram Jaccard dedup via rare-gram inverted index: distinct " +
        "token bigrams per doc → document-frequency per gram → candidate " +
        "pairs only from grams with df <= 20 (the posting-list explosion " +
        "cap) → exact bigram-Jaccard >= 0.3. At scale the df cap bounds " +
        "the self-join to rare postings — common grams never generate " +
        "pairs; the exact verify touches candidates only.",
      Some(s"""
WITH s AS (SELECT doc_id,
  list_distinct(list_transform(
    list_transform(generate_series(1, len(string_split(text,' '))-1),
      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]),
    g -> ${hash60Sql("g")} % $P)) AS gs
  FROM documents WHERE len(string_split(text,' ')) >= 2),
e AS (SELECT doc_id, unnest(gs) AS g FROM s),
df AS (SELECT g, count(*) AS d FROM e GROUP BY 1),
rare AS (SELECT g FROM df WHERE d <= 20),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM e a JOIN e b ON a.g = b.g JOIN rare r ON a.g = r.g
  WHERE a.doc_id < b.doc_id),
v AS (SELECT doc_a, doc_b,
  len(list_intersect(sa.gs, sb.gs)) AS it,
  len(list_distinct(list_concat(sa.gs, sb.gs))) AS un
  FROM cand JOIN s sa ON sa.doc_id = doc_a JOIN s sb ON sb.doc_id = doc_b)
SELECT doc_a, doc_b, (it * 1000) // un AS jaccard_x1000
FROM v WHERE (it * 1000) // un >= 300"""),
      (s, dir) =>
        // single-pass skew-safe inverted index: capped_list bounds each
        // gram's posting list (NULL = too common to block on), so the
        // df-filter + pair-generation is one aggregation over one scan
        graft.api.DedupOps.ngramJaccardPairs(
          Tables.documents(s, dir), "doc_id", "text",
          n = 2, maxDf = 20, jaccardX1000Threshold = 300)),

    QueryDef(
      "q22_simhash_fingerprint",
      "SimHash document fingerprinting: 60-bit majority-vote hash over " +
        "distinct token hashes + a 12-bit blocking prefix. Map-only, no " +
        "shuffle; the distinct→hash→majority pipeline is ONE native " +
        "codegen'd expression (functions.SimHash60) — HOFs run " +
        "interpreted, so the old transform+aggregate spelling was the " +
        "catalog's slowest per-byte map job.",
      Some(s"""
WITH t AS (
  SELECT doc_id,
         list_transform(list_distinct(string_split(text, ' ')),
                        tok -> ${hash60Sql("tok")}) AS hs
  FROM documents),
f AS (SELECT doc_id, ${simhashSql("hs")} AS simhash FROM t)
SELECT doc_id, simhash, simhash // ${1L << 48} AS block
FROM f"""),
      (s, dir) =>
        graft.api.DedupOps.simhashFingerprint(
          Tables.documents(s, dir), "doc_id", "text")),

    QueryDef(
      "q54_simhash_pairs",
      "SimHash near-dup PAIRS with a pigeonhole recall GUARANTEE " +
        "(DedupOps.simhashPairs): the 60-bit fingerprint splits into 4 " +
        "disjoint 15-bit blocks; any pair within hamming <= 3 agrees " +
        "exactly on >= 1 block, so exact-block blocking is LOSSLESS — " +
        "unlike the probabilistic MinHash/hyperplane bands. Candidates " +
        "from capped block buckets (q21's skew contract), verified by " +
        "exact bit_count(xor). The third pair-generating dedup modality " +
        "next to shingle-Jaccard (q21/q29) and embedding-cosine (q53).",
      Some(s"""
WITH t AS (
  SELECT doc_id,
         list_transform(list_distinct(string_split(text, ' ')),
                        tok -> ${hash60Sql("tok")}) AS hs
  FROM documents),
f AS (SELECT doc_id, ${simhashSql("hs")} AS simhash FROM t),
blocks AS (
  SELECT doc_id, g.b AS band,
         (simhash >> (15 * g.b)) & 32767 AS bkey
  FROM f CROSS JOIN generate_series(0, 3) g(b)),
ok AS (
  SELECT band, bkey FROM blocks
  GROUP BY band, bkey
  HAVING count(*) <= ${graft.api.DedupOps.DefaultMaxBucket}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM blocks a
  JOIN ok o ON a.band = o.band AND a.bkey = o.bkey
  JOIN blocks b ON a.band = b.band AND a.bkey = b.bkey
  WHERE a.doc_id < b.doc_id)
SELECT doc_a, doc_b,
       bit_count(xor(fa.simhash, fb.simhash))::BIGINT AS hamming
FROM cand
JOIN f fa ON fa.doc_id = doc_a
JOIN f fb ON fb.doc_id = doc_b
WHERE bit_count(xor(fa.simhash, fb.simhash)) <= 3"""),
      (s, dir) =>
        graft.api.DedupOps.simhashPairs(
          Tables.documents(s, dir), "doc_id", "text", hammingMax = 3)),

    QueryDef(
      "q23_embedding_topk_pairs",
      "Embedding-cosine near-dup: global top-20 most-similar vector " +
        "pairs (brute force over the n² pair space — at scale the LSH/" +
        "IVF variants below prune candidates first). Left-to-right " +
        "double folds keep sims bit-identical to the oracle.",
      Some("""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS sim
      FROM n a, n b WHERE a.vec_id < b.vec_id)
SELECT vec_a, vec_b,
       row_number() OVER (ORDER BY sim DESC, vec_a ASC, vec_b ASC) AS rn
FROM p
QUALIFY rn <= 20"""),
      (s, dir) =>
        // TakeOrderedAndProject top-k: each task keeps a local top-20,
        // only those merge; rank derived on the survivors (see
        // VectorOps.cosineTopKPairs)
        graft.api.VectorOps.cosineTopKPairs(
          Tables.embeddings(s, dir), "vec_id", "embedding", k = 20)),

    QueryDef(
      "q39_ann_lsh",
      "Random-hyperplane LSH for embeddings (SimHash-for-vectors): 16 " +
        "deterministic hyperplanes → 16-bit sign signature → bucket; " +
        "top-20 most-similar pairs computed ONLY within buckets. At " +
        "100TB the signature is a map-only projection and the pair scan " +
        "touches ~n²/2^16 of the brute-force space (q23's full scan is " +
        "the recall baseline). Hyperplane literals come from one Scala " +
        "generator, embedded in both the plan and the oracle.",
      Some(s"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
s AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
             (${(0 until LshPlanes).map(j =>
               s"(CASE WHEN list_dot_product(v, ${planeSqlList(j)}) > 0 THEN ${1 << j} ELSE 0 END)")
               .mkString(" + ")}) AS bucket
      FROM e),
cand AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS sim
         FROM s a JOIN s b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
SELECT vec_a, vec_b,
       row_number() OVER (ORDER BY sim DESC, vec_a ASC, vec_b ASC) AS rn
FROM cand
QUALIFY rn <= 20"""),
      (s, dir) =>
        graft.api.VectorOps.lshTopKPairs(
          Tables.embeddings(s, dir), "vec_id", "embedding",
          planes = (0 until LshPlanes).map(plane), k = 20)),

    QueryDef(
      "q53_embedding_near_dup",
      "Embedding-cosine near-dup PAIRS above a similarity threshold " +
        "(VectorOps.nearDupPairs): 16 deterministic hyperplanes in 4 " +
        "bands of 4 — candidates iff some band's sign bits all agree " +
        "(banded recall ≈98.6% at sim ≥ .95 where one 16-bit signature " +
        "catches ~18%) — capped_list-bounded buckets (q21's skew " +
        "contract), exact cosine on candidates only. The pair frame " +
        "feeds the same clusters/keeper consumers as MinHash pairs.",
      Some(q53OracleSql),
      (s, dir) =>
        graft.api.VectorOps.nearDupPairs(
          Tables.embeddings(s, dir), "vec_id", "embedding",
          planes = (0 until LshPlanes).map(plane),
          simX1000Threshold = 400)),

    QueryDef(
      "q90_semantic_dedup_keepers",
      "Semantic (embedding-space) dedup keepers — the SemDeDup idea " +
        "(Abbas et al. 2023) with this library's primitives: q53's " +
        "capped banded-LSH cosine pairs → pointer-doubling connected " +
        "components → ONE keeper per semantic cluster, chosen by " +
        "highest squared-norm (the 'most informative copy' heuristic, " +
        "the embedding analog of q58's longest-doc rule; floor(1000·" +
        "‖v‖²) is an exact left-to-right double fold in both engines, " +
        "ties to the smallest id). The embedding story now matches " +
        "the text story end-to-end: pairs (q53) ≡ (q21), incremental " +
        "probe (q83) ≡ (q59), keepers (q90) ≡ (q58). Scale shape " +
        "inherited wholesale: capped buckets, O(log d) clustering, " +
        "one hash-agg keeper pass — no new exchange kinds.",
      Some(s"""
WITH RECURSIVE p AS ($q53OracleSql),
-- outer CTE names must not collide with names q53's inner chain
-- REFERENCES (e/n/s/bands): DuckDB binds an inner reference to the
-- outer recursive scope when both exist, so the edge list is edg
edg AS (SELECT vec_a AS s, vec_b AS t FROM p
        UNION SELECT vec_b, vec_a FROM p),
reach(s, t) AS (
  SELECT s, t FROM edg
  UNION
  SELECT r.s, edg.t FROM reach r JOIN edg ON r.t = edg.s),
c AS (SELECT s AS vec_id, least(s, min(t)) AS cluster_id
      FROM reach GROUP BY s),
m AS (SELECT c.cluster_id, c.vec_id,
             floor(list_dot_product(ev.v, ev.v) * 1000)::BIGINT AS nrm2
      FROM c JOIN (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) ev
        ON ev.vec_id = c.vec_id)
SELECT cluster_id, vec_id AS keeper_id, n_members, keeper_score FROM (
  SELECT cluster_id, vec_id, nrm2 AS keeper_score,
         count(*) OVER (PARTITION BY cluster_id) AS n_members,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY nrm2 DESC, vec_id ASC) AS rn
  FROM m) WHERE rn = 1"""),
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val pairs = graft.api.VectorOps.nearDupPairs(
          emb, "vec_id", "embedding",
          planes = (0 until LshPlanes).map(plane),
          simX1000Threshold = 400)
        val clusters = graft.operators.ConnectedComponents.minLabel(
          pairs, "vec_a", "vec_b")
        val scored = clusters.join(
          graft.api.VectorOps.normalized(emb, "vec_id", "embedding")
            .select(col("vec_id"),
              floor(expr("dot_f(v, v)") * 1000).cast("long").as("nrm2")),
          clusters("id") === col("vec_id"))
          .select(col("id"), col("cluster_id"), col("nrm2"))
        graft.api.DedupOps.keepersByScore(scored, "id", "cluster_id", "nrm2")
      }),

    QueryDef(
      "q102_text_semantic_dedup",
      "Semantic dedup on RAW TEXT, end-to-end and hash-exact: q101's " +
        "model-free feature-hash embedding (TextOps.embedText) feeds " +
        "the SAME banded-LSH pair machinery as q53, pointer-doubling " +
        "clusters, and longest-doc keepers (q58's rule) — the full " +
        "SemDeDup shape with NO external encoder and NO pre-computed " +
        "embedding table. Cosine >= 0.9 over 64-dim hash embeddings " +
        "(shared vocabulary sets the baseline high on this corpus; " +
        ".9 selects the near-dup tail). Zero vectors (token-less or " +
        "fully-cancelled docs) are excluded BEFORE banding in both " +
        "engines (n2 > 0), so they can never consume bucket cap. The " +
        "oracle derives the embedding, the bands, the capped pairs, " +
        "the recursive closure and the keepers in one SQL chain — " +
        "every float is a single-IEEE-op-per-dim or a left-to-right " +
        "fold, so the whole trained-free pipeline hash-matches.",
      Some(s"""
WITH RECURSIVE
$textEmbeddingBandsCte,
ok AS (SELECT band, bkey FROM bands
       GROUP BY band, bkey
       HAVING count(*) <= ${graft.api.DedupOps.DefaultMaxBucket}),
cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
         FROM bands a
         JOIN ok o ON a.band = o.band AND a.bkey = o.bkey
         JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
         WHERE a.vec_id < b.vec_id),
p AS MATERIALIZED (
  SELECT vec_a, vec_b
  FROM (SELECT vec_a, vec_b,
               list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm) AS sim
        FROM cand JOIN n na ON na.vec_id = vec_a
                  JOIN n nb ON nb.vec_id = vec_b)
  WHERE floor(sim * 1000) >= 900),
edg AS (SELECT vec_a AS s, vec_b AS t FROM p
        UNION SELECT vec_b, vec_a FROM p),
reach(s, t) AS (
  SELECT s, t FROM edg
  UNION
  SELECT r.s, edg.t FROM reach r JOIN edg ON r.t = edg.s),
cl AS (SELECT s AS doc_id, least(s, min(t)) AS cluster_id
       FROM reach GROUP BY s),
m AS (SELECT cl.cluster_id, cl.doc_id,
             len(string_split(d.text, ' '))::BIGINT AS n_tok
      FROM cl JOIN documents d ON d.doc_id = cl.doc_id)
SELECT cluster_id, doc_id AS keeper_id, n_members, keeper_score FROM (
  SELECT cluster_id, doc_id, n_tok AS keeper_score,
         count(*) OVER (PARTITION BY cluster_id) AS n_members,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY n_tok DESC, doc_id ASC) AS rn
  FROM m) WHERE rn = 1"""),
      (s, dir) => {
        graft.functions.VectorExpressions.register(s)
        val docs = Tables.documents(s, dir)
        val emb = graft.api.TextOps.embedText(docs, "doc_id", "text", d = 64)
          .filter(expr("dot_f(v, v)") > 0)
        val pairs = graft.api.VectorOps.nearDupPairs(
          emb, "doc_id", "v", planes = (0 until LshPlanes).map(plane),
          simX1000Threshold = 900)
        val clusters = graft.operators.ConnectedComponents.minLabel(
          pairs, "vec_a", "vec_b")
        val scored = clusters.join(
          docs.select(col("doc_id"),
            size(split(col("text"), " ", -1)).cast("long").as("n_tok")),
          clusters("id") === col("doc_id"))
          .select(col("id"), col("cluster_id"), col("n_tok"))
        graft.api.DedupOps.keepersByScore(scored, "id", "cluster_id", "n_tok")
          .select(col("cluster_id"), col("keeper_id"), col("n_members"),
            col("keeper_score"))
      }),

    QueryDef(
      "q103_semantic_decontamination",
      "SEMANTIC benchmark decontamination — q42's n-gram rule catches " +
        "verbatim leakage; this catches PARAPHRASE-level leakage the " +
        "gram hashes miss: corpus docs whose q101 hash embedding is " +
        "cosine >= 0.8 to ANY eval-set doc (doc_id % 50 = 0, q42's " +
        "convention) are flagged with their match count and max " +
        "similarity. The small eval set is the CAPPED bucket-index " +
        "side (q83's incremental shape — the right direction at " +
        "100TB: the benchmark is the index, the corpus is the probe, " +
        "so corpus rows never pair with each other), and the whole " +
        "chain — embedding, bands, capped candidates, exact cosine, " +
        "rollup — hash-matches the SQL oracle exactly.",
      Some(s"""
WITH $textEmbeddingBandsCte,
corpb AS (SELECT * FROM bands WHERE vec_id % 50 = 0),
newb AS (SELECT * FROM bands WHERE vec_id % 50 <> 0),
ok AS (SELECT band, bkey FROM corpb
       GROUP BY band, bkey
       HAVING count(*) <= ${graft.api.DedupOps.DefaultMaxBucket}),
cand AS (SELECT DISTINCT nw.vec_id AS vec_new, c.vec_id AS vec_old
         FROM newb nw
         JOIN ok o ON nw.band = o.band AND nw.bkey = o.bkey
         JOIN corpb c ON c.band = o.band AND c.bkey = o.bkey),
p AS (SELECT vec_new, vec_old, floor(sim * 1000)::BIGINT AS sim_x1000
      FROM (SELECT vec_new, vec_old,
                   list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm) AS sim
            FROM cand JOIN n na ON na.vec_id = vec_new
                      JOIN n nb ON nb.vec_id = vec_old)
      WHERE floor(sim * 1000) >= 800)
SELECT vec_new AS doc_id, count(*) AS n_eval_matches,
       max(sim_x1000) AS max_sim_x1000
FROM p GROUP BY 1"""),
      (s, dir) => {
        graft.functions.VectorExpressions.register(s)
        val docs = Tables.documents(s, dir)
        // embed ONCE, probe twice: without the checkpoint the eval and
        // corpus branches each re-derive the full embedText subtree
        // (its exchanges doubled — 9 shuffles; the CurationPipeline
        // materialize-between-stages discipline applies)
        val emb = graft.api.TextOps.embedText(docs, "doc_id", "text", d = 64)
          .filter(expr("dot_f(v, v)") > 0)
          .localCheckpoint()
        graft.api.VectorOps.nearDupPairsAgainst(
            emb.filter(col("doc_id") % 50 =!= 0),
            emb.filter(col("doc_id") % 50 === 0),
            "doc_id", "v", planes = (0 until LshPlanes).map(plane),
            simX1000Threshold = 800)
          .groupBy(col("vec_new").as("doc_id"))
          .agg(count(lit(1)).as("n_eval_matches"),
            max(col("sim_x1000")).as("max_sim_x1000"))
      }),

    QueryDef(
      "q83_embedding_incremental_dedup",
      "Incremental EMBEDDING dedup (VectorOps.nearDupPairsAgainst): " +
        "q59's daily-ingestion shape in vector space - a 20% NEW batch " +
        "(vec_id % 5 = 0) probes the 80% corpus's banded sign-signature " +
        "LSH bucket index; the corpus is never re-paired against " +
        "itself. Corpus buckets carry capped id-lists (q21's skew " +
        "contract), the probe side is only the delta, and exact cosine " +
        "verifies candidates only. Same hyperplane generator as q39/" +
        "q53, so batch self-join and incremental paths band " +
        "identically.",
      Some(q83OracleSql),
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        graft.api.VectorOps.nearDupPairsAgainst(
          emb.filter(col("vec_id") % 5 === 0),
          emb.filter(col("vec_id") % 5 =!= 0),
          "vec_id", "embedding",
          planes = (0 until LshPlanes).map(plane),
          simX1000Threshold = 400)
      }),

    QueryDef(
      "q24_ann_ivf",
      "IVF-style ANN (the 100TB path): vectors are assigned to their " +
        "nearest of 8 fixed centroids (vec_id < 8); queries " +
        "(vec_id in [100,110)) probe ONLY their own cluster for top-5. " +
        "The cluster assignment is the partition-pruning key — at scale " +
        "each query scans 1/8th of the corpus instead of all of it.",
      Some("""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
c AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
asg AS (
  SELECT vec_id, v, nrm, cid,
         row_number() OVER (PARTITION BY vec_id
           ORDER BY list_dot_product(v, cv) / (nrm * cn) DESC, cid ASC) AS cr
  FROM n CROSS JOIN c QUALIFY cr = 1),
q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn, cid AS qcid
      FROM asg WHERE vec_id >= 100 AND vec_id < 110),
srch AS (
  SELECT qid, a.vec_id AS nid,
         list_dot_product(qv, a.v) / (qn * a.nrm) AS sim
  FROM q JOIN asg a ON a.cid = q.qcid AND a.vec_id <> q.qid)
SELECT qid, nid,
       row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rn
FROM srch
QUALIFY rn <= 5"""),
      (s, dir) => {
        graft.functions.VectorExpressions.register(s)
        val base = Tables.embeddings(s, dir)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
          .withColumn("nrm", sqrt(expr("dot_f(v, v)")))
        // Centroid assignment is map-only: the 8 centroids collapse to a
        // ONE-ROW array (coalesce(1) makes the agg exchange-free), the
        // broadcast nest-loop join glues it onto every corpus row, and
        // argmin-over-8 is an array_min of (-sim, cid) structs — struct
        // ordering = sim DESC, cid ASC, exactly the old rank's order.
        // The previous spelling (per-vec_id Window over the 8n expanded
        // rows) hash-exchanged the whole corpus just to pick a max.
        val cents = base.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
        val centArr = cents.coalesce(1)
          .agg(collect_list(struct(col("cid"), col("cv"), col("cn"))).as("cents"))
        val asg = base.crossJoin(broadcast(centArr))
          .withColumn("best", expr(
            "array_min(transform(cents, c -> " +
              "struct(-(dot_f(v, c.cv) / (nrm * c.cn)) AS ns, c.cid AS cid)))"))
          .select(col("vec_id"), col("v"), col("nrm"), col("best.cid").as("cid"))
        val q = asg.filter(col("vec_id") >= 100 && col("vec_id") < 110)
          .select(col("vec_id").as("qid"), col("v").as("qv"),
            col("nrm").as("qn"), col("cid").as("qcid"))
        broadcast(q).join(asg,
            col("cid") === col("qcid") && col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("nid"),
            (expr("dot_f(qv, v)") / (col("qn") * col("nrm"))).as("sim"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("qid"))
              .orderBy(col("sim").desc, col("nid").asc)).cast("long"))
          .filter(col("rn") <= 5)
          .select("qid", "nid", "rn")
      }),

    QueryDef(
      "q46_dedup_clusters",
      "Transitive near-dup clustering (operators.ConnectedComponents): " +
        "q21's pairs are edges; iterative min-label propagation " +
        "collapses chains {A~B, B~C} into ONE cluster per component " +
        "(pair-wise dropping alone under-dedups chains). Each round is " +
        "one vertex-keyed shuffle join + partial-agg min; rounds = " +
        "component diameter (tiny for copy-chains). The oracle is the " +
        "recursive-CTE transitive closure of the same pair SQL. Reads " +
        "the SHARED materialized pair stage (SharedStages) — the edges " +
        "are a persisted parquet list, never a per-query LSH re-derive.",
      Some(s"""
WITH RECURSIVE p AS ($q21OracleSql),
e AS (SELECT doc_a AS s, doc_b AS t FROM p
      UNION SELECT doc_b, doc_a FROM p),
reach(s, t) AS (
  SELECT s, t FROM e
  UNION
  SELECT r.s, e.t FROM reach r JOIN e ON r.t = e.s)
SELECT s AS doc_id, least(s, min(t)) AS cluster_id
FROM reach GROUP BY s"""),
      (s, dir) => SharedStages.clusters(s, dir)),

    QueryDef(
      "q58_keeper_by_quality",
      "Quality-aware keeper selection (DedupOps.keepersByScore): q46's " +
        "clusters joined to a per-doc quality signal (token count); the " +
        "kept copy per cluster is the HIGHEST-quality member (ties -> " +
        "min id), not the lexically-first one. One hash-aggregate via " +
        "the custom latest_by argmax on a (score, -id) struct - no " +
        "per-cluster window sort, and no built-in max_by (whose struct " +
        "buffer demotes the whole aggregation to SortAggregate); the " +
        "cluster assignment is tiny next to the corpus (and read from " +
        "the SHARED materialized cluster stage), so the score join " +
        "shuffles only (id, cluster, score).",
      Some(s"""
WITH RECURSIVE p AS ($q21OracleSql),
e AS (SELECT doc_a AS s, doc_b AS t FROM p
      UNION SELECT doc_b, doc_a FROM p),
reach(s, t) AS (
  SELECT s, t FROM e
  UNION
  SELECT r.s, e.t FROM reach r JOIN e ON r.t = e.s),
c AS (SELECT s AS doc_id, least(s, min(t)) AS cluster_id
      FROM reach GROUP BY s),
m AS (SELECT c.cluster_id, c.doc_id,
             len(string_split(d.text, ' '))::BIGINT AS n_tok
      FROM c JOIN documents d ON d.doc_id = c.doc_id)
SELECT cluster_id, doc_id AS keeper_id, n_members, keeper_score FROM (
  SELECT cluster_id, doc_id, n_tok AS keeper_score,
         count(*) OVER (PARTITION BY cluster_id) AS n_members,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY n_tok DESC, doc_id ASC) AS rn
  FROM m) WHERE rn = 1"""),
      (s, dir) => {
        val clusters = SharedStages.clusters(s, dir)
        val scored = clusters.join(
          Tables.documents(s, dir).select(col("doc_id"),
            size(split(col("text"), " ", -1)).cast("long").as("n_tok")),
          Seq("doc_id"))
        graft.api.DedupOps.keepersByScore(
          scored, "doc_id", "cluster_id", "n_tok")
      }),

    QueryDef(
      "q96_cluster_aware_split",
      "Leakage-free train/val/test split: q41's deterministic hash " +
        "split, but keyed on the doc's NEAR-DUP CLUSTER representative " +
        "(q46's transitive clusters; singletons represent themselves) " +
        "instead of the doc id — so two near-duplicate documents can " +
        "NEVER land on opposite sides of the train/test wall, the " +
        "contamination mode a doc-id split silently permits. The " +
        "guarantee is structural (same rep -> same hash -> same " +
        "split), and the oracle rebuilds the identical rep/hash chain. " +
        "Per-split docs, tokens and distinct groups; cluster stage " +
        "read from SharedStages, split+agg is one tiny exchange over " +
        "(split) after map-side partial agg.",
      Some(s"""
WITH RECURSIVE p AS ($q21OracleSql),
e AS (SELECT doc_a AS s, doc_b AS t FROM p
      UNION SELECT doc_b, doc_a FROM p),
reach(s, t) AS (
  SELECT s, t FROM e
  UNION
  SELECT r.s, e.t FROM reach r JOIN e ON r.t = e.s),
c AS (SELECT s AS doc_id, least(s, min(t)) AS cluster_id
      FROM reach GROUP BY s),
a AS (SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS rep,
             len(string_split(d.text, ' '))::BIGINT AS n_tok
      FROM documents d LEFT JOIN c ON c.doc_id = d.doc_id),
t AS (SELECT CASE WHEN ${hash60Sql("rep::VARCHAR")} % 100 < 90 THEN 'train'
                  WHEN ${hash60Sql("rep::VARCHAR")} % 100 < 95 THEN 'val'
                  ELSE 'test' END AS split, rep, n_tok FROM a)
SELECT split, count(*) AS n_docs, sum(n_tok)::BIGINT AS n_tokens,
       count(DISTINCT rep) AS n_groups
FROM t GROUP BY split"""),
      (s, dir) => {
        val rep = coalesce(col("cluster_id"), col("doc_id"))
        Tables.documents(s, dir)
          .select(col("doc_id"),
            size(split(col("text"), " ", -1)).cast("long").as("n_tok"))
          .join(SharedStages.clusters(s, dir), Seq("doc_id"), "left")
          .select(
            graft.api.SampleOps.splitColumn(rep, 90, 5).as("split"),
            rep.as("rep"), col("n_tok"))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok")).as("n_tokens"),
            count_distinct(col("rep")).as("n_groups"))
      }),

    QueryDef(
      "q59_incremental_dedup",
      "Incremental new-vs-corpus dedup (DedupOps.minhashPairsAgainst): " +
        "the daily-ingestion path - a 20% NEW batch (doc_id % 5 = 0) " +
        "probes the 80% corpus's banded LSH bucket index; the corpus is " +
        "never re-paired against itself. Corpus buckets carry capped " +
        "id-lists (same skew contract as q21), the probe side is only " +
        "the delta, and exact-Jaccard verify joins candidates only. At " +
        "100TB the bucket index is materialized once and re-probed per " +
        "batch.",
      Some(q59OracleSql),
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        graft.api.DedupOps.minhashPairsAgainst(
          docs.filter(col("doc_id") % 5 === 0),
          docs.filter(col("doc_id") % 5 =!= 0),
          "doc_id", "text")
      }),

    QueryDef(
      "q25_uv_approx",
      "A7 UvWithBloom-analog: bounded-memory approximate distinct users " +
        "per day via HLL++ (constant state ~KBs per window vs the " +
        "reference's 64MB Redis bitmap, UvWithBloom.scala:64). Sketches " +
        "merge associatively → map-side partials at any scale. The " +
        "estimate is engine-specific, so the oracle checks it IN-BAND: " +
        "the exact count rides along (verification column — at 100TB " +
        "you'd drop it and keep only the sketch) and approx_ok asserts " +
        "|approx-exact| <= max(2, 10% of exact) as a hashed predicate.",
      Some("""
SELECT epoch(time_bucket(INTERVAL '1 day', ts::TIMESTAMP) + INTERVAL '1 day')::BIGINT AS window_end,
       count(DISTINCT user_id) AS uv_exact,
       true AS approx_ok
FROM events GROUP BY 1"""),
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(window(col("ts"), "1 day"))
          .agg(approx_count_distinct(col("user_id")).as("uv_approx"),
            countDistinct(col("user_id")).as("uv_exact"))
          .select(unix_timestamp(col("window.end")).as("window_end"),
            col("uv_exact"),
            (abs(col("uv_approx") - col("uv_exact")) <=
              greatest(lit(2.0), col("uv_exact") * lit(0.10))).as("approx_ok"))),

    QueryDef(
      "q26_multimodal_meta",
      "Multimodal plumbing: documents as opaque binary payloads with " +
        "typed decoded metadata (the decode itself is a deterministic " +
        "stub — the real image/audio libs live behind the same column " +
        "contract, see graft.operators.Multimodal). Map-only.",
      Some("""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       (octet_length(encode(text)) % 64) + 16 AS width,
       ((octet_length(encode(text)) // 64) % 64) + 16 AS height,
       (octet_length(encode(text)) % 7) + 1 AS n_frames
FROM documents"""),
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .select(col("doc_id"),
            octet_length(col("payload")).cast("long").as("n_bytes"))
          .select(col("doc_id"), col("n_bytes"),
            (col("n_bytes") % 64 + 16).as("width"),
            expr("((n_bytes div 64) % 64) + 16").as("height"),
            (col("n_bytes") % 7 + 1).as("n_frames"))),

    QueryDef(
      "q133_image_phash",
      "Perceptual image hashes through the REAL decode path " +
        "(operators.Multimodal.imageHashes): each doc's text bytes " +
        "seed a genuine 16x16 grayscale 24-bit BMP (grayBmp16 — a " +
        "real container, not a stub), javax.imageio decodes it, and " +
        "aHash (8x8 block mean vs global mean) + dHash (9x8 " +
        "horizontal gradient signs) come off the TRUE pixels. The " +
        "oracle re-derives both 64-bit hashes from FIRST PRINCIPLES " +
        "over the same bytes (pixel (x,y) = byte((y*16+x) mod n); " +
        "block sums compare by integer cross-multiplication — every " +
        "intermediate double is exact, see MediaSpec), so a single " +
        "pixel corrupted anywhere in the encode->decode->downsample " +
        "path flips the hash compare: the decode itself is " +
        "cross-engine-gated, not just the plumbing around it. " +
        "Map-only at any scale (mapPartitions decode, no shuffle).",
      Some(s"""
$imageHashCtes
SELECT doc_id, ahash64, dhash64 FROM ah JOIN dh USING (doc_id)"""),
      (s, dir) =>
        graft.operators.Multimodal.imageHashes(
          graft.operators.Multimodal.documentsAsBmpMedia(s, dir))),

    QueryDef(
      "q134_image_near_dup",
      "Near-duplicate IMAGE pairs (operators.Multimodal." +
        "imageNearDupPairs): dHash-64 hamming <= 6 with the same " +
        "pigeonhole-lossless blocking + capped-bucket skew contract " +
        "as the text simhash (q54) — 7 disjoint blocks of the 64-bit " +
        "gradient hash, any pair within hamming 6 agrees exactly on " +
        ">= 1 block, candidates only from capped block buckets, " +
        "verified by exact bit_count(xor). The image sibling of the " +
        "q54 text modality: exact-duplicate texts seed identical " +
        "BMPs (hamming 0) and near-dup texts seed near-identical " +
        "pixel streams, so the fixture's dup structure surfaces at " +
        "the image level. The oracle replays blocking, caps, and " +
        "verification over its first-principles dHash derivation.",
      Some(s"""
$imageHashCtes,
blocks AS (
  SELECT doc_id, g.b AS band,
         CASE WHEN g.b = 6 THEN (dhash64 >> 54) & 1023
              ELSE (dhash64 >> (9 * g.b)) & 511 END AS bkey
  FROM dh CROSS JOIN generate_series(0, 6) g(b)),
ok AS (
  SELECT band, bkey FROM blocks
  GROUP BY band, bkey
  HAVING count(*) <= ${graft.api.DedupOps.DefaultMaxBucket}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM blocks a
  JOIN ok o ON a.band = o.band AND a.bkey = o.bkey
  JOIN blocks b ON a.band = b.band AND a.bkey = b.bkey
  WHERE a.doc_id < b.doc_id)
SELECT doc_a, doc_b,
       bit_count(xor(da.dhash64, db.dhash64))::BIGINT AS hamming
FROM cand
JOIN dh da ON da.doc_id = doc_a
JOIN dh db ON db.doc_id = doc_b
WHERE bit_count(xor(da.dhash64, db.dhash64)) <= 6"""),
      (s, dir) =>
        graft.operators.Multimodal.imageNearDupPairs(
          graft.operators.Multimodal.documentsAsBmpMedia(s, dir),
          hammingMax = 6)),

    QueryDef(
      "q135_audio_fingerprint",
      "Audio envelope fingerprints through the REAL decode path " +
        "(operators.Multimodal.audioFingerprints): each doc's text " +
        "bytes seed a genuine 8-bit mono PCM WAV (pcmWav8 — a real " +
        "RIFF container), AudioSystem parses it, samples extract " +
        "NATIVELY in the container's 8-bit width (the JDK's 8-to-16 " +
        "widener rounds per sample — round(d*32767/127) — which " +
        "would break the exact integer replay; the MediaSpec law " +
        "test caught it), and the 64-bit fingerprint thresholds 64 " +
        "windows' mean |amplitude| against the global mean " +
        "(volume-invariant — uniform gain shifts both). The oracle " +
        "re-derives the fingerprint from first principles over " +
        "|v - 128| of the same bytes, so the container parse + " +
        "sample extraction is cross-engine-gated. Map-only at any " +
        "scale.",
      Some(s"""
$audioHashCtes
SELECT doc_id, envhash64 FROM eh"""),
      (s, dir) =>
        graft.operators.Multimodal.audioFingerprints(
          graft.operators.Multimodal.documentsAsWavMedia(s, dir))),

    QueryDef(
      "q136_audio_near_dup",
      "Near-duplicate AUDIO pairs (operators.Multimodal." +
        "audioNearDupPairs): envelope-hash-64 hamming <= 6 with the " +
        "SAME pigeonhole-lossless blocking + capped-bucket contract " +
        "as the image (q134) and text (q54) modalities — ONE pair " +
        "engine (DedupOps.fingerprintPairs), three modalities. The " +
        "oracle replays blocking, caps, and bit_count(xor) " +
        "verification over its first-principles fingerprint " +
        "derivation.",
      Some(s"""
$audioHashCtes,
blocks AS (
  SELECT doc_id, g.b AS band,
         CASE WHEN g.b = 6 THEN (envhash64 >> 54) & 1023
              ELSE (envhash64 >> (9 * g.b)) & 511 END AS bkey
  FROM eh CROSS JOIN generate_series(0, 6) g(b)),
ok AS (
  SELECT band, bkey FROM blocks
  GROUP BY band, bkey
  HAVING count(*) <= ${graft.api.DedupOps.DefaultMaxBucket}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM blocks a
  JOIN ok o ON a.band = o.band AND a.bkey = o.bkey
  JOIN blocks b ON a.band = b.band AND a.bkey = b.bkey
  WHERE a.doc_id < b.doc_id)
SELECT doc_a, doc_b,
       bit_count(xor(ea.envhash64, eb.envhash64))::BIGINT AS hamming
FROM cand
JOIN eh ea ON ea.doc_id = doc_a
JOIN eh eb ON eb.doc_id = doc_b
WHERE bit_count(xor(ea.envhash64, eb.envhash64)) <= 6"""),
      (s, dir) =>
        graft.operators.Multimodal.audioNearDupPairs(
          graft.operators.Multimodal.documentsAsWavMedia(s, dir),
          hammingMax = 6)),

    QueryDef(
      "q137_image_incremental_dedup",
      "Incremental IMAGE dedup — q59's delta-vs-corpus shape for the " +
        "fingerprint modalities (DedupOps.fingerprintPairsAgainst): " +
        "the delta slice's dHashes (through the q133 REAL-decode " +
        "path) probe the corpus slice's capped pigeonhole block " +
        "buckets, candidates verify by exact bit_count(xor), the " +
        "corpus is never self-paired and probe cost is proportional " +
        "to the delta. ONE banding implementation " +
        "(fingerprintBlockCols) serves the self-join (q134), this " +
        "probe, and the streaming FingerprintGate (StreamingSpec-" +
        "pinned parity), so the three deploy shapes cannot block " +
        "differently. The oracle replays corpus-side capping and the " +
        "cross join over its first-principles dHash derivation.",
      Some(q137OracleSql),
      (s, dir) => {
        // both probe sides filter the SAME hash frame — checkpointed so
        // the BMP build + decode pass runs once, not once per side
        // (2 longs a row; the q93 consumed-twice discipline)
        val dh = imageDhash(s, dir).localCheckpoint()
        graft.api.DedupOps.fingerprintPairsAgainst(
          dh.filter(col("doc_id") % 5 === 0),
          dh.filter(col("doc_id") % 5 =!= 0),
          "doc_id", "dhash64", bits = 64, hammingMax = 6)
      }),

    QueryDef(
      "q138_fold_fingerprint_probe",
      "Fingerprint-index MAINTENANCE proven end-to-end (DedupOps." +
        "writeFingerprintIndex / foldIntoFingerprintIndex, IN-PLACE): " +
        "the corpus slice's image dHashes indexed as v1 (40%) + a 40% " +
        "delta folded in place — the delta's capped pigeonhole " +
        "buckets land as their own O(delta) layered run, banded with " +
        "the index's OWN meta geometry (bits, hamming_max live in the " +
        "index, never caller code), and fingerprintPairsAgainstIndex " +
        "probes with __bp prefix pruning + the SHARED " +
        "mergeLayeredBuckets cap arithmetic. Oracle = q137's VERBATIM " +
        "(one shared string) by the fold-equals-rebuild contract — " +
        "the q110/q113 pattern completing the SIXTH persisted index " +
        "family (minhash, sign, CDC, BM25, IVF-PQ, fingerprint); the " +
        "five layered families share the maintain* auto-compaction " +
        "policy, IVF-PQ staying deliberately exempt (frozen-codebook " +
        "contract — its probes prune by cell directory, so extra " +
        "runs are harmless).",
      Some(q137OracleSql),
      (s, dir) =>
        // the probe consumes the delta frame three times (prefix
        // collect, band join, verify join) — checkpointed so the
        // decode pass runs once (the q93/q137 discipline)
        graft.api.DedupOps.fingerprintPairsAgainstIndex(
          imageDhash(s, dir).filter(col("doc_id") % 5 === 0)
            .localCheckpoint(),
          "doc_id", "dhash64", foldedFpDir(s, dir))),

    QueryDef(
      "q139_video_phash",
      "Perceptual VIDEO fingerprints through the REAL container walk " +
        "+ frame decode (operators.Multimodal.videoFingerprints): " +
        "each doc's text bytes seed a genuine RIFF AVI (bmpAvi16 — " +
        "hdrl/avih header, movi LIST, 6 even-padded 00dc chunks, " +
        "each a complete 16x16 BMP with the seed rotated by the " +
        "frame index), parseAviVideoFrames walks the container and " +
        "UNIFORMLY SAMPLES 4 of the 6 frames (i*6/4 = {0,1,3,4} — " +
        "work per record is bounded regardless of video length), " +
        "javax.imageio decodes each sampled frame, and bit i of the " +
        "64-bit fingerprint is the strict majority of the frames' " +
        "dHash bit i (the q134 gradient hash lifted to the time " +
        "axis). The oracle re-derives the fingerprint from FIRST " +
        "PRINCIPLES — including the sampling indices from the " +
        "formula, so a drifted sampler (not just a corrupted pixel) " +
        "flips the cross-engine compare. MediaSpec pins the same " +
        "path over ImageIO-written REAL JPEG frames (MJPEG). " +
        "Map-only at any scale (container walk + decode inside one " +
        "mapPartitions, zero shuffles).",
      Some(s"""
$videoHashCtes
SELECT doc_id, vhash64 FROM vh"""),
      (s, dir) =>
        graft.operators.Multimodal.videoFingerprints(
          graft.operators.Multimodal.documentsAsAviMedia(s, dir))),

    QueryDef(
      "q140_video_near_dup",
      "Near-duplicate VIDEO pairs (operators.Multimodal." +
        "videoNearDupPairs): majority-dHash-64 hamming <= 6 with the " +
        "SAME pigeonhole-lossless blocking + capped-bucket contract " +
        "as the text (q54), image (q134), and audio (q136) " +
        "modalities — ONE pair engine (DedupOps.fingerprintPairs), " +
        "FOUR modalities, so none can band differently. The oracle " +
        "replays blocking, caps, and bit_count(xor) verification " +
        "over its first-principles fingerprint derivation.",
      Some(s"""
$videoHashCtes,
blocks AS (
  SELECT doc_id, g.b AS band,
         CASE WHEN g.b = 6 THEN (vhash64 >> 54) & 1023
              ELSE (vhash64 >> (9 * g.b)) & 511 END AS bkey
  FROM vh CROSS JOIN generate_series(0, 6) g(b)),
ok AS (
  SELECT band, bkey FROM blocks
  GROUP BY band, bkey
  HAVING count(*) <= ${graft.api.DedupOps.DefaultMaxBucket}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM blocks a
  JOIN ok o ON a.band = o.band AND a.bkey = o.bkey
  JOIN blocks b ON a.band = b.band AND a.bkey = b.bkey
  WHERE a.doc_id < b.doc_id)
SELECT doc_a, doc_b,
       bit_count(xor(va.vhash64, vb.vhash64))::BIGINT AS hamming
FROM cand
JOIN vh va ON va.doc_id = doc_a
JOIN vh vb ON vb.doc_id = doc_b
WHERE bit_count(xor(va.vhash64, vb.vhash64)) <= 6"""),
      (s, dir) =>
        graft.operators.Multimodal.videoNearDupPairs(
          graft.operators.Multimodal.documentsAsAviMedia(s, dir),
          hammingMax = 6)),

    QueryDef(
      "q143_video_incremental_dedup",
      "Incremental VIDEO dedup — q137's delta-vs-corpus shape on the " +
        "round-13 video fingerprints: the delta slice's " +
        "majority-dHashes (through the q139 REAL container walk + " +
        "frame decode + sampler) probe the corpus slice's capped " +
        "pigeonhole block buckets, candidates verify by exact " +
        "bit_count(xor), the corpus is never self-paired and probe " +
        "cost is proportional to the delta. The SAME " +
        "fingerprintPairsAgainst engine serves image (q137) and " +
        "video (here) — and the FingerprintGate streaming twin is " +
        "StreamingSpec-pinned on these exact video fingerprints — " +
        "so every modality gets every deploy shape from one " +
        "implementation. The oracle replays corpus-side capping and " +
        "the cross join over its first-principles video-fingerprint " +
        "derivation (sampler included).",
      Some(s"""
$videoHashCtes,
blocks AS (
  SELECT doc_id, g.b AS band,
         CASE WHEN g.b = 6 THEN (vhash64 >> 54) & 1023
              ELSE (vhash64 >> (9 * g.b)) & 511 END AS bkey
  FROM vh CROSS JOIN generate_series(0, 6) g(b)),
ok AS (
  SELECT band, bkey FROM blocks WHERE doc_id % 5 <> 0
  GROUP BY band, bkey
  HAVING count(*) <= ${graft.api.DedupOps.DefaultMaxBucket}),
cand AS (
  SELECT DISTINCT n.doc_id AS doc_new, o.doc_id AS doc_old
  FROM blocks n
  JOIN ok k ON n.band = k.band AND n.bkey = k.bkey
  JOIN blocks o ON o.band = n.band AND o.bkey = n.bkey
  WHERE n.doc_id % 5 = 0 AND o.doc_id % 5 <> 0)
SELECT doc_new, doc_old,
       bit_count(xor(a.vhash64, b.vhash64))::BIGINT AS hamming
FROM cand
JOIN vh a ON a.doc_id = doc_new
JOIN vh b ON b.doc_id = doc_old
WHERE bit_count(xor(a.vhash64, b.vhash64)) <= 6"""),
      (s, dir) => {
        // both probe sides filter the SAME fingerprint frame —
        // checkpointed so the AVI build + walk + decode pass runs
        // once, not once per side (the q137 discipline)
        val vh = graft.operators.Multimodal.videoFingerprints(
          graft.operators.Multimodal.documentsAsAviMedia(s, dir))
          .localCheckpoint()
        graft.api.DedupOps.fingerprintPairsAgainst(
          vh.filter(col("doc_id") % 5 === 0),
          vh.filter(col("doc_id") % 5 =!= 0),
          "doc_id", "vhash64", bits = 64, hammingMax = 6)
      }),

    QueryDef(
      "q78_cross_source_dups",
      "Cross-source duplication report: q21's near-dup pairs joined to " +
        "each doc's source, rolled up to (src_a, src_b) pair counts " +
        "with the pair lexically ordered so (a,b) and (b,a) collapse. " +
        "The which-feeds-duplicate-which diagnostic that decides crawl " +
        "priorities. The doc->source map is a broadcast dimension; the " +
        "pair list is tiny post-LSH (and read from the SHARED " +
        "materialized pair stage), so the rollup collapses to " +
        "|sources|^2 rows map-side.",
      Some(s"""
WITH p AS ($q21OracleSql),
s AS (SELECT doc_id, source FROM documents),
j AS (SELECT least(sa.source, sb.source) AS src_a,
             greatest(sa.source, sb.source) AS src_b
      FROM p JOIN s sa ON sa.doc_id = p.doc_a
             JOIN s sb ON sb.doc_id = p.doc_b)
SELECT src_a, src_b, count(*) AS n_pairs
FROM j GROUP BY 1, 2"""),
      (s, dir) => {
        val pairs = SharedStages.minhashPairs(s, dir)
        val srcs = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"))
        pairs
          .join(broadcast(srcs.select(col("doc_id").as("doc_a"),
            col("source").as("_sa"))), Seq("doc_a"))
          .join(broadcast(srcs.select(col("doc_id").as("doc_b"),
            col("source").as("_sb"))), Seq("doc_b"))
          .select(least(col("_sa"), col("_sb")).as("src_a"),
            greatest(col("_sa"), col("_sb")).as("src_b"))
          .groupBy(col("src_a"), col("src_b"))
          .agg(count(lit(1)).as("n_pairs"))
      }),

    QueryDef(
      "q80_dup_graph_degrees",
      "Near-dup graph degree histogram: per-doc pair degree from the " +
        "q21 pair list, rolled up to (degree, n_docs). The dup-graph " +
        "health check - a fat tail means hub documents (boilerplate " +
        "near-duplicating half the corpus) that make transitive " +
        "clustering degenerate and deserve removal BEFORE clustering. " +
        "Both aggregations collapse map-side; the pair list is tiny " +
        "post-LSH and read from the SHARED materialized pair stage.",
      Some(s"""
WITH p AS ($q21OracleSql),
d AS (SELECT doc_a AS doc FROM p UNION ALL SELECT doc_b FROM p),
deg AS (SELECT doc, count(*) AS degree FROM d GROUP BY 1)
SELECT degree, count(*) AS n_docs FROM deg GROUP BY 1"""),
      (s, dir) => {
        val pairs = SharedStages.minhashPairs(s, dir)
        pairs.select(col("doc_a").as("doc"))
          .unionAll(pairs.select(col("doc_b").as("doc")))
          .groupBy(col("doc")).agg(count(lit(1)).as("degree"))
          .groupBy(col("degree")).agg(count(lit(1)).as("n_docs"))
      })
  ,

    QueryDef(
      "q106_cdc_chunk_shares",
      "Content-defined chunking (Rabin-style CDC) + cross-document " +
        "chunk sharing (TextOps.cdcChunkShares): chunk boundaries " +
        "fall where the rolling 4-token gram hash is 0 mod 32, so " +
        "an edit near a doc's head re-chunks only the segment it " +
        "touches and every downstream chunk re-aligns — the " +
        "boundary-shift robustness q85's FIXED 25-token windows " +
        "cannot have (ApiSpec proves the one-token-prefix case). " +
        "Per doc: distinct chunk hashes, those appearing in >= 2 " +
        "docs, ratio x1000. The q70 postings shape: chunks travel " +
        "as 60-bit hashes, document frequency aggregates with " +
        "map-side combine, the common set semi-joins back " +
        "co-partitioned on the hash, the rollup keys the doc id.",
      Some(s"""
WITH ${cdcChunksSql("documents", CdcMod, CdcWindow)},
p AS (SELECT doc_id, unnest(chs) AS c FROM ck),
cm AS (SELECT c FROM (SELECT c, count(*) AS df FROM p GROUP BY 1)
       WHERE df >= 2),
sh AS (SELECT doc_id, count(*) AS ns FROM p JOIN cm USING (c) GROUP BY 1)
SELECT ck.doc_id, len(chs)::BIGINT AS n_chunks,
       coalesce(sh.ns, 0)::BIGINT AS n_shared,
       (CASE WHEN len(chs) > 0
             THEN (coalesce(sh.ns, 0) * 1000) // len(chs)
             ELSE 0 END)::BIGINT AS shared_x1000
FROM ck LEFT JOIN sh USING (doc_id)"""),
      (s, dir) =>
        graft.api.TextOps.cdcChunkShares(
          Tables.documents(s, dir), "doc_id", "text",
          modulus = CdcMod, window = CdcWindow, minDf = 2))
  ,

    QueryDef(
      "q107_cdc_incremental_dedup",
      "Incremental exact-passage dedup (DedupOps.cdcChunkHits): a 20% " +
        "NEW batch (doc_id % 5 = 0) probes the 80% corpus's " +
        "content-defined chunk set — which of the delta's CDC chunks " +
        "already exist ANYWHERE in the corpus. The content-defined " +
        "twin of q59 (doc-level fuzzy minhash) at exact chunk " +
        "granularity, boundary-shift-robust where fixed windows are " +
        "not (q106's property). Both sides travel as 60-bit hashes; " +
        "the corpus chunk set distincts with map-side partials, the " +
        "delta semi-joins it co-partitioned on the hash, the rollup " +
        "keys the delta id. At 100TB the corpus side is " +
        "writeCdcChunkIndex's __bp-partitioned parquet, built once per " +
        "corpus version, and every batch pays " +
        "cdcChunkHitsAgainstIndex's O(delta + pruned index scan) — " +
        "parity- and pruning-tested in DedupSpec.",
      Some(q107OracleSql),
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        graft.api.DedupOps.cdcChunkHits(
          docs.filter(col("doc_id") % 5 === 0),
          docs.filter(col("doc_id") % 5 =!= 0),
          "doc_id", "text", modulus = CdcMod, window = CdcWindow)
      })
  ,

    QueryDef(
      "q110_fold_minhash_probe",
      "Incremental index MAINTENANCE proven end-to-end " +
        "(DedupOps.foldIntoMinhashIndex, IN-PLACE): the corpus's 80% " +
        "side is indexed as v1 (40%) + a 40% delta folded in place — " +
        "no corpus re-scan, and O(delta) WRITE bytes: the delta's " +
        "capped buckets land as their own sorted layered run " +
        "(Sinks.layoutAppend) and the probe reconciles per-key runs " +
        "through mergeLayeredBuckets' exact cap-tombstone arithmetic. " +
        "The 20% probe batch runs minhashPairsAgainstIndex against " +
        "the layered index. The oracle is q59's VERBATIM (one shared " +
        "string): the fold's contract is that a folded index probes " +
        "identically to a from-scratch build, so the expected rows " +
        "are literally q59's. At 100TB this is the daily operation: " +
        "append the day's run to yesterday's index, compact weekly " +
        "(compactMinhashIndex).",
      Some(q59OracleSql),
      (s, dir) =>
        graft.api.DedupOps.minhashPairsAgainstIndex(
          Tables.documents(s, dir).filter(col("doc_id") % 5 === 0),
          "doc_id", "text", foldedMinhashDir(s, dir))),

    QueryDef(
      "q113_fold_sign_probe",
      "Embedding-index maintenance proven end-to-end " +
        "(VectorOps.foldIntoSignIndex, IN-PLACE): the 80% vector " +
        "corpus indexed as v1 (40%) + a 40% delta appended as its own " +
        "layered run — O(delta) write bytes — with probeSignIndex " +
        "reconciling runs through the SHARED mergeLayeredBuckets cap " +
        "arithmetic; the 20% probe batch runs against the layered " +
        "index. Oracle = q83's VERBATIM (shared string) by the " +
        "fold-equals-rebuild contract — the q110/q111 pattern " +
        "completing the vector family.",
      Some(q83OracleSql),
      (s, dir) =>
        graft.api.VectorOps.probeSignIndex(
          Tables.embeddings(s, dir).filter(col("vec_id") % 5 === 0),
          "vec_id", "embedding", (0 until LshPlanes).map(plane),
          foldedSignDir(s, dir), simX1000Threshold = 400)),

    QueryDef(
      "q111_fold_cdc_probe",
      "CDC chunk-index maintenance proven end-to-end " +
        "(DedupOps.foldIntoCdcChunkIndex, IN-PLACE): v1 chunk index " +
        "on 40% of the corpus, the other 40% appended as its own " +
        "layered run chunked with v1's own meta geometry — O(delta) " +
        "write bytes, and NO read-side reconcile needed (the probe's " +
        "left_semi join is duplicate-insensitive); the 20% probe " +
        "batch scored by cdcChunkHitsAgainstIndex against the layered " +
        "index. Oracle = q107's VERBATIM (shared string) by the same " +
        "fold-equals-rebuild contract.",
      Some(q107OracleSql),
      (s, dir) =>
        graft.api.DedupOps.cdcChunkHitsAgainstIndex(
          Tables.documents(s, dir).filter(col("doc_id") % 5 === 0),
          "doc_id", "text", foldedCdcDir(s, dir))),

    QueryDef(
      "q116_fold_clusters",
      "Incremental CLUSTER maintenance " +
        "(ConnectedComponents.foldAssignment) — the transitive-closure " +
        "side of the daily dedup fold, closing the last from-scratch " +
        "recompute in the incremental story: yesterday's persisted " +
        "(doc, cluster) assignment + the delta's pairs (cross pairs " +
        "from the layered persisted index probe — q110's artifact " +
        "reused — plus the delta's self-pairs) re-close WITHOUT the " +
        "old pair list. Exact because an assignment IS its components " +
        "(the star edges id->cluster_id connect exactly what the " +
        "original pairs connected), so min-label over assignment " +
        "edges ∪ delta edges equals min-label over ALL pairs — which " +
        "is literally what the oracle computes: a recursive-CTE " +
        "closure over the union of the three split-semantics pair " +
        "sets (corpus self, delta-vs-corpus, delta self; shared SQL " +
        "generators). Cost is vertex-shaped, not pair-shaped: the " +
        "iterated edge set is |assignment| + |delta pairs|, and old " +
        "components are stars (diameter <= 2), so propagation rounds " +
        "are spent only on the delta's chains.",
      Some(q116OracleSql),
      (s, dir) => foldedClustersShared(s, dir)),

    QueryDef(
      "q117_fold_keepers",
      "The incremental dedup DECISION, end-to-end: quality-aware " +
        "keeper selection (DedupOps.keepersByScore, q58's operator) " +
        "over q116's FOLDED clusters — fold the delta's pairs into " +
        "yesterday's assignment, then pick each merged cluster's " +
        "highest-token-count member (ties -> min id) in one " +
        "latest_by hash-aggregate. This is what a daily ingest " +
        "actually ships: the updated keep/drop set after maintenance, " +
        "with zero full-corpus recomputation anywhere upstream " +
        "(persisted assignment + layered-index probe + delta-only " +
        "pair derivation); the folded assignment itself is read from " +
        "the materialized shared stage (first consumer pays the fold " +
        "once — the SharedStages discipline; like every index-backed " +
        "row, min-of-N bench numbers measure the artifact read path " +
        "and the honest fold cost is the SCALE fold rows + the first " +
        "run). Oracle = the SHARED q116 closure CTEs " +
        "(one generator — the fold and the decision cannot drift) " +
        "extended with q58's verbatim argmax shape.",
      Some(q117OracleSql),
      (s, dir) => {
        val nTok = Tables.documents(s, dir)
          .select(col("doc_id"),
            size(split(col("text"), " ", -1)).cast("long").as("n_tok"))
        graft.api.DedupOps.keepersByScore(
          foldedClustersShared(s, dir).join(nTok, Seq("doc_id")),
          "doc_id", "cluster_id", "n_tok")
      }),

    QueryDef(
      "q123_graph_centrality",
      "Integer-exact PageRank over the near-dup pair graph " +
        "(operators.PageRank): 5 undirected power-iteration rounds, " +
        "damping 85/100, every step in Long arithmetic (emit rank div " +
        "degree per edge, collect base + 85*sum div 100) so the scores " +
        "hash-match an unrolled DuckDB CTE replay exactly — no float " +
        "order sensitivity anywhere. The score is a DENSITY signal for " +
        "curation: boilerplate hubs at the center of big duplication " +
        "neighborhoods accumulate rank (q80's degree histogram is the " +
        "1-hop version; this weighs the whole neighborhood), the " +
        "prune-dense-regions knob of density-aware selection. Cost " +
        "shape: edges persisted once from the SHARED materialized pair " +
        "stage, iterated state is one row per vertex, each round one " +
        "vertex-keyed shuffle join + partial-agg sum, ranks " +
        "localCheckpointed per round (the iterative contract).",
      Some(pagerankOracleSql),
      (s, dir) => graft.operators.PageRank
        .ranks(SharedStages.minhashPairs(s, dir), "doc_a", "doc_b",
          iterations = 5)
        .select(col("id").as("doc_id"), col("degree"), col("rank"))),

    QueryDef(
      "q126_weighted_centrality",
      "Similarity-WEIGHTED PageRank over the near-dup pair graph " +
        "(operators.PageRank.weightedRanks): q123's power iteration " +
        "with each vertex splitting rank proportionally to edge " +
        "weight — rank x jaccard_x1000 div sum-of-incident-weights — " +
        "so a 0.9-Jaccard twin pulls more centrality than a " +
        "barely-over-threshold neighbor. The refinement that matters " +
        "on REAL dup graphs, where hub strength varies: q123 treats " +
        "all pairs equally, this weighs the strength of each tie. " +
        "Same integer discipline (non-negative Longs, floor division " +
        "— Spark div == DuckDB //), same unrolled-CTE oracle, same " +
        "per-round plan (one vertex-keyed shuffle join + partial-agg " +
        "sum over the persisted edges, ranks localCheckpointed); " +
        "DedupSpec pins exact hand-computed weighted-star ranks AND " +
        "that uniform weights reproduce q123's ranks exactly " +
        "(floor(r*w/(d*w)) = floor(r/d)).",
      Some(weightedPagerankOracleSql),
      (s, dir) => graft.operators.PageRank
        .weightedRanks(SharedStages.minhashPairs(s, dir), "doc_a",
          "doc_b", "jaccard_x1000", iterations = 5)
        .select(col("id").as("doc_id"), col("w_degree"), col("rank"))),

    QueryDef(
      "q127_corpus_diff",
      "Corpus-version diff report (DedupOps.corpusDiff) — the " +
        "what-changed-between-crawls audit a re-crawl pipeline runs " +
        "before re-processing: per (source, status) counts of added / " +
        "removed / changed / unchanged docs between two corpus " +
        "versions, with identity = the 16-byte raw content digest " +
        "(the q74 rationale: the full-outer join and compare carry 16 " +
        "bytes per row, never document bodies) and presence detected " +
        "by marker columns, never payload null-ness (q65's " +
        "discipline). Fixture versions are deterministic slices: v1 = " +
        "id % 7 != 0, v2 = id % 5 != 0 with id % 9 == 0 texts " +
        "reversed — all four statuses populated. ONE co-partitioned " +
        "full-outer hash join on the id, then a |sources x 4| rollup " +
        "with map-side partials.",
      Some("""
WITH v1 AS (SELECT doc_id, source, md5(text) AS d
            FROM documents WHERE doc_id % 7 <> 0),
v2 AS (SELECT doc_id, source,
              md5(CASE WHEN doc_id % 9 = 0 THEN reverse(text)
                       ELSE text END) AS d
       FROM documents WHERE doc_id % 5 <> 0)
SELECT coalesce(v2.source, v1.source) AS source,
       CASE WHEN v1.doc_id IS NULL THEN 'added'
            WHEN v2.doc_id IS NULL THEN 'removed'
            WHEN v1.d = v2.d THEN 'unchanged'
            ELSE 'changed' END AS status,
       count(*) AS n_docs
FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
GROUP BY 1, 2"""),
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val v1 = docs.filter(col("doc_id") % 7 =!= 0)
        val v2 = docs.filter(col("doc_id") % 5 =!= 0)
          .withColumn("text",
            when(col("doc_id") % 9 === 0, reverse(col("text")))
              .otherwise(col("text")))
        graft.api.DedupOps.corpusDiff(v1, v2, "doc_id", "text",
            carry = Seq("source"))
          .groupBy(col("source"), col("status"))
          .agg(count(lit(1)).as("n_docs"))
      }),

    QueryDef(
      "q163_fold_weighted_edge_rank",
      "Weighted-edge index maintenance proven end-to-end " +
        "(PageRank.writeWeightedEdgeIndex / maintainWeightedEdgeIndex " +
        "/ weightedRanksByKeyAgainstIndex) - the TENTH persisted " +
        "family, giving q126's similarity-weighted centrality the " +
        "q160 deployed posture: the unweighted edge family stores " +
        "DISTINCT pairs (graph position, not tie strength), so " +
        "weighted centrality could not run at index-sized cost. Edge " +
        "weights are SUM-additive across layered runs (the gram/line " +
        "reconcile algebra where the unweighted family's is " +
        "set-union), and the read-side canonical pair aggregation - " +
        "one row per unordered pair with summed weight, the exact " +
        "form the floor divisions are defined over - doubles as the " +
        "cross-run reconcile, so no layers fast path exists to " +
        "corrupt. The engine builds v1 from the doc_a%5!=0 pairs of " +
        "the SHARED q21 list, maintain-folds the %5==0 slice (writer " +
        "lock + recoverAtEntry + O(delta) appended run), and ranks " +
        "over the INDEX; the oracle is q126's weighted-pagerank SQL " +
        "VERBATIM (one shared definition) - fold==rebuild is " +
        "literally the driver-checked hash. Keys travel as strings " +
        "through the shared 60-bit hash and join back through the " +
        "vertex map, so the output doc_ids are exact.",
      Some(weightedPagerankOracleSql),
      (s, dir) =>
        graft.operators.PageRank.weightedRanksByKeyAgainstIndex(
            s, foldedWeightedDir(s, dir))
          .select(col("key").cast("long").as("doc_id"),
            col("w_degree"), col("rank")))
  )

  /** The hash-embedding CTE chain (the q101 arithmetic — identical
    * to [[textEmbeddingBandsCte]]'s embed half) over an ARBITRARY
    * (id, text) source CTE, with every emitted CTE name prefixed so
    * two chains can coexist in one oracle (q128 embeds chunks AND
    * queries). Ends at `${pfx}e` = (id, v) unit vectors; rows with a
    * zero vector are dropped, mirroring embedText's signal filter.
    */
  private[queries] def hashEmbedCte(pfx: String, srcCte: String): String =
    s"""${pfx}tt AS (SELECT id, unnest(string_split(text, ' ')) AS w FROM $srcCte),
${pfx}hh AS (SELECT id, ${hash60Sql("w")} AS h FROM ${pfx}tt WHERE w <> ''),
${pfx}hc AS (SELECT id, h % 64 AS dim,
              sum(CASE WHEN (h // 4294967296) % 2 = 0 THEN 1
                       ELSE -1 END)::BIGINT AS c
       FROM ${pfx}hh GROUP BY 1, 2),
${pfx}n2 AS (SELECT id, sum(c * c)::BIGINT AS n2 FROM ${pfx}hc GROUP BY 1),
${pfx}grid AS (SELECT d.id, g.i AS dim
         FROM (SELECT DISTINCT id FROM $srcCte) d,
              generate_series(0, 63) g(i)),
${pfx}dense AS (SELECT g.id, g.dim, coalesce(hc.c, 0) AS c
          FROM ${pfx}grid g LEFT JOIN ${pfx}hc hc
            ON hc.id = g.id AND hc.dim = g.dim),
${pfx}e AS MATERIALIZED (
  SELECT dense.id, list(dense.c / sqrt(n2.n2) ORDER BY dense.dim) AS v
  FROM ${pfx}dense dense JOIN ${pfx}n2 n2 ON n2.id = dense.id
  WHERE n2.n2 > 0 GROUP BY 1)"""

  /** The unrolled WEIGHTED-PageRank round CTEs `r1..r{iterations}`
    * over pre-existing CTEs `e(s, t, w)` (symmetrized weighted
    * edges), `deg(id, w_degree)`, and `r0(id, w_degree, r)` —
    * contribution = (r × w) // w_degree. ONE generator for every
    * weighted-pagerank oracle (q126's jaccard-weighted doc graph,
    * q164/q165's anchor-count-weighted host graph), the
    * [[pagerankRoundsSql]] shared-fragment discipline: the weighted
    * round arithmetic cannot drift between consumers by edit.
    */
  private[queries] def weightedPagerankRoundsSql(
      iterations: Int = 5): String = {
    val scale = graft.operators.PageRank.Scale
    val base = 15L * scale / 100L
    (1 to iterations).map { k =>
      s"""r$k AS (
  SELECT deg.id, deg.w_degree,
         ($base + (85 * agg.c) // 100)::BIGINT AS r
  FROM deg JOIN (
    SELECT e.t AS id, sum((r${k - 1}.r * e.w) // r${k - 1}.w_degree) AS c
    FROM e JOIN r${k - 1} ON e.s = r${k - 1}.id
    GROUP BY e.t) agg ON deg.id = agg.id)"""
    }.mkString(",\n")
  }

  /** q126's oracle: the q123 unrolled chain with weighted splits —
    * contribution = (r × w) // w_degree, w_degree = summed incident
    * weight — over the SHARED q21 pair SQL (jaccard_x1000 is the
    * edge weight). Shared VERBATIM with q163 (weighted ranks over
    * the FOLDED weighted edge index), the q152/q160 discipline:
    * fold==rebuild is checked against literally the same SQL.
    */
  private[queries] lazy val weightedPagerankOracleSql: String = {
    val scale = graft.operators.PageRank.Scale
    s"""
WITH p AS ($q21OracleSql),
e AS (SELECT doc_a AS s, doc_b AS t, jaccard_x1000 AS w FROM p
      UNION ALL SELECT doc_b, doc_a, jaccard_x1000 FROM p),
deg AS (SELECT s AS id, sum(w)::BIGINT AS w_degree FROM e GROUP BY 1),
r0 AS (SELECT id, w_degree, $scale::BIGINT AS r FROM deg),
${weightedPagerankRoundsSql(5)}
SELECT id AS doc_id, w_degree, r AS rank FROM r5"""
  }

  /** The materialized FOLDED weighted edge index per SF dir (the
    * foldedEdgeDir pattern): v1 = the pairs of docs with doc_a % 5
    * != 0, the doc_a % 5 == 0 slice maintain-folds in. Disjoint pair
    * runs, so the SUM reconcile is exercised as pure additivity;
    * the OVERLAPPING-run sum lives in q165's host fixture and the
    * DedupSpec law. Keys pass as STRINGS (hash60 casts to binary —
    * a Long key would be an ANSI-mode cast violation).
    */
  private val foldedWeightedCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]

  private def foldedWeightedDir(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    foldedWeightedCache.computeIfAbsent(dir, { _ =>
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-foldedwedge-").toString + "/ix"
      val pairs = SharedStages.minhashPairs(s, dir)
        .select(col("doc_a").cast("string").as("ka"),
          col("doc_b").cast("string").as("kb"),
          col("jaccard_x1000").as("w"), col("doc_a").as("_da"))
      graft.operators.PageRank.writeWeightedEdgeIndex(
        pairs.filter(pmod(col("_da"), lit(5)) =!= 0), "ka", "kb", "w", tmp)
      graft.operators.PageRank.maintainWeightedEdgeIndex(
        pairs.filter(pmod(col("_da"), lit(5)) === 0), "ka", "kb", "w", tmp)
      tmp
    })

  /** q123's oracle: the identical integer power iteration unrolled as
    * a CTE chain over the SHARED q21 pair SQL (the BpeOps unrolled-
    * oracle discipline). Non-negative Long arithmetic only, so
    * DuckDB's floor `//` and Spark's truncating `div` agree; each
    * round's rank is cast back to BIGINT so both engines carry the
    * same type.
    */
  /** The unrolled integer-PageRank round CTEs `r1..r{iterations}`
    * over pre-existing CTEs `e(s, t)` (symmetrized distinct edges),
    * `deg(id, degree)`, and `r0(id, degree, r)` — ONE generator for
    * every pagerank oracle (q123's doc graph, q152's host graph),
    * the shared-fragment discipline: the round arithmetic cannot
    * drift between consumers by edit.
    */
  private[queries] def pagerankRoundsSql(iterations: Int = 5): String = {
    val scale = graft.operators.PageRank.Scale
    val base = 15L * scale / 100L
    (1 to iterations).map { k =>
      s"""r$k AS (
  SELECT deg.id, deg.degree,
         ($base + (85 * agg.c) // 100)::BIGINT AS r
  FROM deg JOIN (
    SELECT e.t AS id, sum(r${k - 1}.r // r${k - 1}.degree) AS c
    FROM e JOIN r${k - 1} ON e.s = r${k - 1}.id
    GROUP BY e.t) agg ON deg.id = agg.id)"""
    }.mkString(",\n")
  }

  private[queries] lazy val pagerankOracleSql: String = {
    val scale = graft.operators.PageRank.Scale
    s"""
WITH p AS ($q21OracleSql),
e AS (SELECT doc_a AS s, doc_b AS t FROM p
      UNION SELECT doc_b, doc_a FROM p),
deg AS (SELECT s AS id, count(*) AS degree FROM e GROUP BY 1),
r0 AS (SELECT id, degree, $scale::BIGINT AS r FROM deg),
${pagerankRoundsSql(5)}
SELECT id AS doc_id, degree, r AS rank FROM r5"""
  }

  /** q116's folded assignment (ONE definition, shared with q117's
    * keeper selection): persisted corpus assignment + the delta's
    * cross pairs (layered persisted-index probe) + the delta's
    * self-pairs, re-closed through foldAssignment.
    */
  /** The materialized folded assignment (SharedStages discipline —
    * q116 and q117 both consume the identical derivation, so the
    * first consumer pays the fold once per SF dir and the other reads
    * the persisted parquet; keyed by dir only, like SharedStages: the
    * output is a pure function of the input directory).
    */
  private val foldedClustersCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]

  private def foldedClustersShared(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val path = foldedClustersCache.computeIfAbsent(dir, { _ =>
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-foldedclusters-").toString
      graft.jobs.Sinks.layout(foldedClusters(s, dir), tmp,
        partitionCols = Nil, sortCols = Seq("cluster_id", "doc_id"),
        numFiles = 1)
      tmp
    })
    s.read.parquet(path)
  }

  private def foldedClusters(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val delta = Tables.documents(s, dir).filter(col("doc_id") % 5 === 0)
    val cross = graft.api.DedupOps.minhashPairsAgainstIndex(
      delta, "doc_id", "text", foldedMinhashDir(s, dir))
    val selfNew = graft.api.DedupOps.minhashPairs(
      delta, "doc_id", "text")
    graft.operators.ConnectedComponents.foldAssignment(
      s.read.parquet(corpusAssignmentDir(s, dir)),
      cross.select(col("doc_new").as("src"), col("doc_old").as("dst"))
        .unionByName(selfNew.select(col("doc_a").as("src"),
          col("doc_b").as("dst"))),
      "src", "dst")
      .select(col("id").as("doc_id"), col("cluster_id"))
  }

  /** q116's oracle: the recursive transitive closure over the UNION of
    * the three split-semantics pair sets — corpus self-pairs (capped
    * within the corpus), delta-vs-corpus pairs (q59's verbatim SQL:
    * corpus-side buckets, corpus-side caps), delta self-pairs (capped
    * within the delta). The fold's contract is that folding the
    * latter two into the corpus assignment reproduces this closure
    * exactly.
    */
  private lazy val q116ClosureCtes: String = s"""
cb_docs AS MATERIALIZED (SELECT * FROM documents WHERE doc_id % 5 <> 0),
nb_docs AS MATERIALIZED (SELECT * FROM documents WHERE doc_id % 5 = 0),
po AS MATERIALIZED (${minhashPairsSql("cb_docs")}),
pn AS MATERIALIZED (${minhashPairsSql("nb_docs")}),
pc AS MATERIALIZED ($q59OracleSql),
e AS (SELECT doc_a AS s, doc_b AS t FROM po
      UNION SELECT doc_b, doc_a FROM po
      UNION SELECT doc_a, doc_b FROM pn
      UNION SELECT doc_b, doc_a FROM pn
      UNION SELECT doc_new, doc_old FROM pc
      UNION SELECT doc_old, doc_new FROM pc),
reach(s, t) AS (
  SELECT s, t FROM e
  UNION
  SELECT r.s, e.t FROM reach r JOIN e ON r.t = e.s)"""

  private lazy val q116OracleSql: String = s"""
WITH RECURSIVE $q116ClosureCtes
SELECT s AS doc_id, least(s, min(t)) AS cluster_id
FROM reach GROUP BY s"""

  /** q117's oracle: the SHARED q116 closure extended with q58's
    * verbatim argmax shape over per-doc token counts.
    */
  private lazy val q117OracleSql: String = s"""
WITH RECURSIVE $q116ClosureCtes,
c AS (SELECT s AS doc_id, least(s, min(t)) AS cluster_id
      FROM reach GROUP BY s),
m AS (SELECT c.cluster_id, c.doc_id,
             len(string_split(d.text, ' '))::BIGINT AS n_tok
      FROM c JOIN documents d ON d.doc_id = c.doc_id)
SELECT cluster_id, doc_id AS keeper_id, n_members, keeper_score FROM (
  SELECT cluster_id, doc_id, n_tok AS keeper_score,
         count(*) OVER (PARTITION BY cluster_id) AS n_members,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY n_tok DESC, doc_id ASC) AS rn
  FROM m) WHERE rn = 1"""

  // session-scoped persisted corpus cluster assignment (the
  // SharedStages discipline): "yesterday's" (doc, cluster) parquet
  // that q116 folds the delta into — built once per SF dir from the
  // corpus slice's own pairs, read (never recomputed) by every fold.
  private val clusterAsgCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]

  private def corpusAssignmentDir(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    clusterAsgCache.computeIfAbsent(dir, { _ =>
      val corpus = Tables.documents(s, dir).filter(col("doc_id") % 5 =!= 0)
      val asg = graft.operators.ConnectedComponents.minLabel(
        graft.api.DedupOps.minhashPairs(corpus, "doc_id", "text"),
        "doc_a", "doc_b")
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-foldcc-").toString
      asg.write.mode("overwrite").parquet(tmp)
      tmp
    })

  // session-scoped folded-index caches (the MlQueries.ivfPqIndexDir
  // discipline): build v1 on the 40% slice, fold the other 40% in,
  // first consumer pays the build, every later run probes the same
  // parquet — which is the fold's own deployment story
  /** The q133 dHash frame (doc_id, dhash64) through the real decode —
    * shared front end of q137 (inline probe) and q138 (persisted
    * index); callers checkpoint as needed. */
  private def imageDhash(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    graft.operators.Multimodal.imageHashes(
        graft.operators.Multimodal.documentsAsBmpMedia(s, dir))
      .select(col("doc_id"), col("dhash64"))

  private val foldFpCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]

  /** q138's persisted fingerprint index: v1 over the 40% slice, the
    * other 40% folded IN PLACE as its own layered run (the
    * foldedMinhashDir discipline for the sixth family). */
  private def foldedFpDir(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    foldFpCache.computeIfAbsent(dir, { _ =>
      val dh = imageDhash(s, dir).localCheckpoint()
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-foldfp-").toString
      graft.api.DedupOps.writeFingerprintIndex(
        dh.filter(col("doc_id") % 5 === 1 || col("doc_id") % 5 === 2),
        "doc_id", "dhash64", bits = 64, hammingMax = 6, s"$tmp/v1")
      graft.api.DedupOps.foldIntoFingerprintIndex(
        dh.filter(col("doc_id") % 5 === 3 || col("doc_id") % 5 === 4),
        "doc_id", "dhash64", s"$tmp/v1")
      s"$tmp/v1"
    })

  /** The q149/q150 oracle: ONE SQL generator for the inline and
    * persisted-index probes (the q59/q110 discipline — fold==rebuild
    * IS the driver's hash compare). Corpus side = doc_id % 5 <> 0,
    * delta = % 5 = 0; thresholds replay the engine's
    * (minCorpusDocs=1, maxDocsPerGram=1000) over CORPUS-side counts.
    */
  private def substringDecontSql: String = s"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
ix AS (SELECT doc_id, tk, unnest(generate_series(0, len(tk) - 8)) AS pos
       FROM toks WHERE len(tk) >= 8),
g AS (SELECT doc_id, pos,
             ${hash60Sql("array_to_string(tk[pos+1:pos+8], ' ')")} AS gh
      FROM ix),
sh AS (SELECT gh
       FROM (SELECT DISTINCT gh, doc_id FROM g WHERE doc_id % 5 <> 0)
       GROUP BY gh HAVING count(*) >= 1 AND count(*) <= 1000),
p AS (SELECT doc_id, pos FROM g
      WHERE doc_id % 5 = 0 AND gh IN (SELECT gh FROM sh)),
b AS (SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                    OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
                  THEN 1 ELSE 0 END AS brk
      FROM p),
i AS (SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      FROM b)
SELECT doc_id, min(pos) AS span_start, max(pos) + 8 AS span_end,
       max(pos) + 8 - min(pos) AS span_tokens
FROM i GROUP BY doc_id, grp"""

  private val foldGramCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]

  /** q150's persisted gram-count index: v1 over the 40% slice, the
    * other 40% folded IN PLACE through the FULL maintain* policy
    * (writer lock + recoverAtEntry + O(delta) run; the default
    * threshold keeps it LAYERED, so the probe exercises the
    * sum-reconcile path — the foldedMinhashDir discipline for the
    * seventh family).
    */
  private[graft] def foldedGramDir(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    foldGramCache.computeIfAbsent(dir, { _ =>
      val docs = Tables.documents(s, dir)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-foldgram-").toString
      graft.api.DedupOps.writeGramIndex(
        docs.filter(col("doc_id") % 5 === 1 || col("doc_id") % 5 === 2),
        "doc_id", "text", s"$tmp/v1")
      val compacted = graft.api.DedupOps.maintainGramIndex(
        docs.filter(col("doc_id") % 5 === 3 || col("doc_id") % 5 === 4),
        "doc_id", "text", s"$tmp/v1")
      require(!compacted,
        "foldedGramDir: the fixture is specified to stay LAYERED " +
          "(probe must exercise the sum-reconcile path)")
      s"$tmp/v1"
    })

  private val foldMinhashCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]
  private val foldCdcCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]

  private def foldedMinhashDir(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    foldMinhashCache.computeIfAbsent(dir, { _ =>
      val docs = Tables.documents(s, dir)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-foldmh-").toString
      graft.api.DedupOps.writeMinhashIndex(
        docs.filter(col("doc_id") % 5 === 1 || col("doc_id") % 5 === 2),
        "doc_id", "text", s"$tmp/v1")
      // the IN-PLACE O(delta)-write fold: the delta lands as its own
      // layered run and the probe reconciles at read — so the driver's
      // q110 hash gates the layered fold==rebuild contract (the
      // compacting overload keeps its own DedupSpec parity)
      graft.api.DedupOps.foldIntoMinhashIndex(
        docs.filter(col("doc_id") % 5 === 3 || col("doc_id") % 5 === 4),
        "doc_id", "text", s"$tmp/v1")
      s"$tmp/v1"
    })

  private val foldSignCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]

  private def foldedSignDir(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    foldSignCache.computeIfAbsent(dir, { _ =>
      val emb = Tables.embeddings(s, dir)
      val planes = (0 until LshPlanes).map(plane)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-foldsign-").toString
      graft.api.VectorOps.writeSignIndex(
        emb.filter(col("vec_id") % 5 === 1 || col("vec_id") % 5 === 2),
        "vec_id", "embedding", planes, s"$tmp/v1")
      // in-place layered fold (q110 comment applies): q113's hash
      // gates layered fold==rebuild for the vector family
      graft.api.VectorOps.foldIntoSignIndex(
        emb.filter(col("vec_id") % 5 === 3 || col("vec_id") % 5 === 4),
        "vec_id", "embedding", planes, s"$tmp/v1")
      s"$tmp/v1"
    })

  private def foldedCdcDir(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    foldCdcCache.computeIfAbsent(dir, { _ =>
      val docs = Tables.documents(s, dir)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-foldcdc-").toString
      graft.api.DedupOps.writeCdcChunkIndex(
        docs.filter(col("doc_id") % 5 === 1 || col("doc_id") % 5 === 2),
        "doc_id", "text", s"$tmp/v1",
        modulus = CdcMod, window = CdcWindow)
      // in-place layered fold (q110 comment applies): q111's hash
      // gates the appended-run read path
      graft.api.DedupOps.foldIntoCdcChunkIndex(
        docs.filter(col("doc_id") % 5 === 3 || col("doc_id") % 5 === 4),
        "doc_id", "text", s"$tmp/v1")
      s"$tmp/v1"
    })
}

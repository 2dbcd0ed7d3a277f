package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.api.ClassifyOps

/** Supervised classifier scoring (api.ClassifyOps) — the trained
  * quality/domain-filter family of the curation stack, under the
  * exact-oracle gate.
  *
  * A note on what the oracle proves here: the driver corpus's label
  * columns (`lang`, `label`) are content-uncorrelated by construction
  * (a float-log NB ceiling measured at ~32% on 5 classes), so
  * held-out ACCURACY sits at the data's ceiling and is not the
  * contract — ClassifySpec proves both families reach 100% held-out
  * accuracy on corpora with separable classes. What the catalog
  * oracle proves is the hard part for a distributed engine: exact
  * score arithmetic, smoothing, OOV handling, and argmax tie-breaks,
  * hash-identical to a second engine on every row.
  */
object ClassifierQueries {

  val all: Seq[QueryDef] = Seq(

    QueryDef(
      "q104_nb_text_classifier",
      "Multinomial Naive Bayes text classifier (ClassifyOps.nbModel + " +
        "nbClassify; the fastText-style trained filter of CCNet-like " +
        "curation): trained on the 80% doc_id%5<>0 slice predicting " +
        "`lang`, scoring the 20% held-out slice. Whole-bit quantized " +
        "log-probs (fl2 = length(bin(n))-1, the q88/q91 integer-LM " +
        "precedent) with add-V smoothing and OOV cw=0, so every " +
        "held-out doc's winning class and score hash exactly " +
        "cross-engine. Deployment = q91's: the model is ONE " +
        "vocabulary-sized persistable frame; scoring is a map-only " +
        "explode + vocabulary broadcast + ONE id-keyed exchange that " +
        "collapses map-side (docs are single rows). Argmax ties break " +
        "to the smallest class.",
      Some("""
WITH tr AS (SELECT doc_id, lang, string_split(text,' ') AS tk
            FROM documents WHERE doc_id % 5 <> 0 AND lang IS NOT NULL),
occ AS (SELECT lang AS cls, unnest(tk) AS w FROM tr),
cw AS (SELECT cls, w, count(*)::BIGINT AS cw FROM occ GROUP BY 1,2),
tc AS (SELECT cls, sum(cw)::BIGINT AS tc FROM cw GROUP BY 1),
dc AS (SELECT lang AS cls, count(*)::BIGINT AS dc FROM tr GROUP BY 1),
gl AS (SELECT sum(dc)::BIGINT AS d, count(*)::BIGINT AS c FROM dc),
vv AS (SELECT count(DISTINCT w)::BIGINT AS v FROM cw),
te AS (SELECT doc_id, lang, unnest(string_split(text,' ')) AS w
       FROM documents WHERE doc_id % 5 = 0),
contrib AS (
  SELECT te.doc_id, te.lang, tc.cls,
         (len(bin(coalesce(cw.cw,0)+1))-1) - (len(bin(tc.tc + vv.v))-1) AS q
  FROM te CROSS JOIN tc CROSS JOIN vv
  LEFT JOIN cw ON cw.cls = tc.cls AND cw.w = te.w),
sc AS (SELECT doc_id, lang, cls, sum(q)::BIGINT AS s
       FROM contrib GROUP BY 1,2,3),
scored AS (SELECT sc.doc_id, sc.lang, sc.cls,
                  (s + (len(bin(dc.dc+1))-1) -
                       (len(bin(gl.d+gl.c))-1))::BIGINT AS score
           FROM sc JOIN dc USING (cls) CROSS JOIN gl),
best AS (SELECT doc_id, lang, cls, score,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, cls ASC) AS rn
         FROM scored),
np AS (SELECT cls AS npc,
              ((len(bin(dc+1))-1) - (len(bin(d+c))-1))::BIGINT AS nps
       FROM (SELECT dc.cls, dc.dc, gl.d, gl.c,
                    row_number() OVER (
                      ORDER BY (len(bin(dc.dc+1))-1) -
                               (len(bin(gl.d+gl.c))-1) DESC,
                               dc.cls ASC) AS rn
             FROM dc CROSS JOIN gl)
       WHERE rn = 1)
SELECT doc_id, lang AS actual, cls AS predicted, score,
       (lang = cls) AS correct
FROM best WHERE rn = 1
UNION ALL
SELECT d.doc_id, d.lang AS actual, np.npc AS predicted, np.nps AS score,
       (d.lang = np.npc) AS correct
FROM documents d CROSS JOIN np
WHERE d.doc_id % 5 = 0 AND d.text IS NULL"""),
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        // materialized before scoring (the q91 contract): the classify
        // plan reads the model several ways (pivot, stats driver-read)
        val model = ClassifyOps.nbModel(
          docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text", "lang")
          .localCheckpoint()
        ClassifyOps.nbClassify(
            docs.filter(col("doc_id") % 5 === 0), "doc_id", "text",
            model, keepCols = Seq("lang"))
          .select(col("doc_id"), col("lang").as("actual"),
            col("predicted"), col("score"),
            (col("lang") === col("predicted")).as("correct"))
      }),

    QueryDef(
      "q105_centroid_classifier",
      "Nearest-class-centroid embedding classifier (ClassifyOps." +
        "centroidModel + centroidClassify; the seed-centroid domain " +
        "tagger of embedding-based curation): centroids = per-class " +
        "floor(mean) over micro-fixed-point quantized vectors (the " +
        "q69 grid) trained on the 80% vec_id%5<>0 slice; the held-out " +
        "20% classifies MAP-ONLY — the classes-sized model enters the " +
        "plan as literals (the q30 broadcast-model shape made " +
        "literal), each row pays one exact int64 fold per class, " +
        "argmin ties break to the smallest label via (dist, label) " +
        "struct ordering. Zero joins, zero shuffles at any corpus " +
        "size; training is one exchange of per-task partial " +
        "(label, dim) sums.",
      Some("""
WITH q AS (SELECT vec_id, label,
                  list_transform(embedding,
                    x -> CAST(round(x::DOUBLE * 1000000) AS BIGINT)) AS qv
           FROM embeddings),
tr AS (SELECT * FROM q WHERE vec_id % 5 <> 0 AND label IS NOT NULL),
te AS (SELECT * FROM q WHERE vec_id % 5 = 0),
dims AS (SELECT label, i, qv[i] AS x
         FROM tr CROSS JOIN unnest(generate_series(1, len(qv))) AS t(i)),
cents AS (SELECT label, i,
                 CAST(floor(sum(x)::DOUBLE / count(*)) AS BIGINT) AS m
          FROM dims GROUP BY 1,2),
cl AS (SELECT label, list(m ORDER BY i) AS mv FROM cents GROUP BY 1),
scored AS (SELECT te.vec_id, te.label AS actual, cl.label AS cls,
                  (CASE WHEN te.qv IS NOT NULL AND len(te.qv) = len(cl.mv)
                        THEN list_sum(list_transform(
                               generate_series(1, len(cl.mv)),
                               j -> (te.qv[j]-cl.mv[j])*(te.qv[j]-cl.mv[j])))
                        ELSE NULL END)::BIGINT AS dist
           FROM te CROSS JOIN cl),
best AS (SELECT vec_id, actual, cls, dist,
                row_number() OVER (PARTITION BY vec_id
                                   ORDER BY dist ASC NULLS LAST,
                                            cls ASC) AS rn
         FROM scored)
SELECT vec_id, actual,
       (CASE WHEN dist IS NULL THEN NULL ELSE cls END) AS predicted,
       dist,
       (actual = (CASE WHEN dist IS NULL THEN NULL ELSE cls END)) AS correct
FROM best WHERE rn = 1"""),
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val model = ClassifyOps.centroidModel(
          emb.filter(col("vec_id") % 5 =!= 0), "embedding", "label")
          .localCheckpoint()
        ClassifyOps.centroidClassify(
            emb.filter(col("vec_id") % 5 === 0), "embedding", model)
          .select(col("vec_id"), col("label").as("actual"),
            col("predicted"), col("dist"),
            (col("label") === col("predicted")).as("correct"))
      })
  )
}

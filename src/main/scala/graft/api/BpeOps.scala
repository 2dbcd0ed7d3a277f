package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction (Sennrich et al., 2016) as
  * a Spark program — the tokenizer-training step of an LLM data
  * pipeline.
  *
  * Scale shape: ONE corpus pass builds the (word, cnt) frequency table
  * — from then on every merge iteration runs over the VOCABULARY frame
  * (|V| rows, ~10⁵–10⁷ at web scale), never the corpus. Each step is a
  * pair-explode + partial-agg'd count + a driver-side argmax of one
  * row (the model update — the same action pattern as a KMeans
  * iteration), then a map-only merge application. At 100 TB the corpus
  * contributes one shuffle (the word count); N merges cost N
  * vocabulary-sized jobs.
  *
  * Determinism contract (shared with the DuckDB oracle, which unrolls
  * the SAME chain step by step in SQL): words are single-space splits;
  * a word's working segmentation is the space-padded, space-delimited
  * symbol string (`" h e l l o "`); pair counts weight each adjacent
  * symbol pair by the word's corpus frequency; the merged pair is the
  * argmax by (count DESC, left ASC, right ASC — binary string order);
  * applying a merge is `replace(seg, " l r ", " lr ")` with standard
  * left-to-right non-overlapping replace semantics IN BOTH ENGINES.
  * For runs of a repeated symbol ("l l l l") that replace consumes the
  * shared delimiter and merges alternate pairs per step — a documented
  * delta from greedy BPE's in-word rescan, chosen because it is the
  * one semantics both engines implement natively (the remaining pairs
  * merge in later steps, so the learned vocabulary converges the
  * same way).
  */
object BpeOps {

  /** One learned merge: step (1-based), the two symbols, their count
    * at selection time.
    */
  final case class Merge(step: Int, left: String, right: String, cnt: Long)

  /** Corpus word-frequency table: word, cnt. The single corpus-sized
    * pass — everything after runs on this frame.
    */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ", -1)).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** The initial segmentation column — chars space-joined, space-padded.
    * Bound by NAME to a column called `word` in the enclosing frame
    * (the lambda-expression string can't close over an arbitrary
    * Column); both call sites guarantee it.
    */
  private def seg0 =
    concat(lit(" "),
      array_join(expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"), " "),
      lit(" "))

  /** Train `nMerges` BPE merges over the corpus. Returns the learned
    * merge table in selection order; stops early when no pair occurs
    * twice — matching the unrolled oracle, whose later steps then
    * produce no rows.
    */
  def train(df: DataFrame, textCol: String, nMerges: Int): Seq[Merge] = {
    val wc = wordCounts(df, textCol).withColumn("seg", seg0)
      .select("seg", "cnt").cache()
    try {
      val merges = Seq.newBuilder[Merge]
      var seg = col("seg")
      var done = false
      var step = 1
      while (step <= nMerges && !done) {
        val pairs = wc.select(seg.as("_seg"), col("cnt"))
          .select(split(trim(col("_seg")), " ", -1).as("syms"), col("cnt"))
          // guard: Spark's sequence(0, -1) DESCENDS instead of being
          // empty, so 1-symbol words must not reach the pair transform
          .filter(size(col("syms")) >= 2)
          .select(explode(expr(
            "transform(sequence(0, size(syms) - 2), " +
              "i -> struct(syms[i] AS l, syms[i+1] AS r))")).as("p"),
            col("cnt"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("cnt")).as("c"))
          .filter(col("c") >= 2)
          .orderBy(col("c").desc, col("l").asc, col("r").asc)
          .limit(1).collect()
        if (pairs.isEmpty) done = true
        else {
          val row = pairs.head
          val (l, r, c) = (row.getString(0), row.getString(1), row.getLong(2))
          merges += Merge(step, l, r, c)
          seg = call_function("replace", seg,
            lit(s" $l $r "), lit(s" $l$r "))
          step += 1
        }
      }
      merges.result()
    } finally { wc.unpersist(); () }
  }

  /** The learned merge table as a DataFrame (step, left, right, cnt).
    * Trains unconditionally via [[trainOwning]] when a corpus key is
    * given (the q95 posture), seeding the model cache for consumers.
    */
  def trainTable(spark: SparkSession, df: DataFrame, textCol: String,
      nMerges: Int, corpusKey: Option[String] = None): DataFrame = {
    import spark.implicits._
    val merges = corpusKey match {
      case Some(key) => trainOwning(key, df, textCol, nMerges)
      case None => train(df, textCol, nMerges)
    }
    merges
      .toDF("step", "left", "right", "cnt")
      .select(col("step").cast("long").as("step"), col("left"),
        col("right"), col("cnt"))
  }

  // session-scoped model cache, the SharedStages discipline applied to
  // a DRIVER-SIDE model: the merge list is a pure function of (corpus
  // key, text column, merge count), so the first consumer trains and
  // every later one reuses. Same immutability contract as SharedStages:
  // the keyed corpus must not change for the JVM lifetime.
  private val modelCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Int), Seq[Merge]]

  /** [[train]] memoized by corpus key (e.g. the SF dir): derived
    * consumers (q98 tokenization) reuse the learned merges, exactly
    * like q46/q58 reading the shared pair stage.
    */
  def trainCached(corpusKey: String, df: DataFrame, textCol: String,
      nMerges: Int): Seq[Merge] =
    modelCache.computeIfAbsent((corpusKey, textCol, nMerges),
      _ => train(df, textCol, nMerges))

  /** [[train]] as the model OWNER: always trains (q95 stays the honest
    * end-to-end training benchmark, like q21 never reading the shared
    * pair stage) and refreshes the cache for the derived consumers.
    */
  def trainOwning(corpusKey: String, df: DataFrame, textCol: String,
      nMerges: Int): Seq[Merge] = {
    val m = train(df, textCol, nMerges)
    modelCache.put((corpusKey, textCol, nMerges), m)
    m
  }

  /** Tokenize with a learned merge list: idCol, n_tokens (BPE symbols
    * per doc). The merge replaces run ONCE PER DISTINCT WORD — the
    * vocabulary frame — not once per corpus occurrence: with a real
    * merge list (10⁴–10⁵ rules) the replace chain is the expensive
    * part, and |V| ≪ corpus occurrences. The corpus pays one word
    * explode and one word-keyed join (distinct + join co-partition on
    * the same key, so the exchange is reused), then the per-doc
    * rollup. The merge table travels as expression literals (it IS
    * the model).
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame =
    wordSyms(df, idCol, textCol, merges)
      .groupBy(col(idCol))
      .agg(sum(col("n_syms")).as("n_tokens"))

  /** Tokenizer-FIT (fertility) report: per key (typically the source
    * column), whitespace word count, BPE token count under `merges`,
    * and fertility = tokens-per-word ×1000 (integer-exact). THE
    * metric for judging a vocabulary against a corpus mix — a source
    * whose fertility stays near the character count is one the vocab
    * doesn't cover (wrong language/domain), and token budgets per
    * source (q60's mixture weights) should be set from these counts,
    * not whitespace proxies. Same vocabulary-level application shape
    * as [[tokenCounts]]; the rollup keys the handful of sources.
    */
  def fertility(df: DataFrame, sourceCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame =
    wordSyms(df, sourceCol, textCol, merges)
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_words"), sum(col("n_syms")).as("n_tokens"))
      .select(col(sourceCol), col("n_words"), col("n_tokens"),
        expr("(n_tokens * 1000) div n_words").as("fertility_x1000"))

  /** The shared vocabulary-level merge application: (keyCol, word,
    * n_syms) — one word explode, the replace chain run once per
    * DISTINCT word, one word-keyed join back.
    */
  private def wordSyms(df: DataFrame, keyCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val words = df.select(col(keyCol),
      explode(split(col(textCol), " ", -1)).as("word"))
      .filter(col("word") =!= "")
    val seg = merges.foldLeft(seg0) { (s, m) =>
      call_function("replace", s,
        lit(s" ${m.left} ${m.right} "), lit(s" ${m.left}${m.right} "))
    }
    val vocab = words.select(col("word")).distinct()
      .select(col("word"),
        size(split(trim(seg), " ", -1)).cast("long").as("n_syms"))
    words.join(vocab, "word")
  }

  /** The merge-chain CTE block shared by [[oracleSql]] (q95: the merge
    * table) and [[tokenOracleSql]] (q98: the tokenized corpus) — ONE
    * generator, so the two oracles can never disagree about the model.
    * Produces wc, seg0..seg{n} (word, seg, cnt) and p{t}/b{t}.
    */
  private def chainSql(table: String, textCol: String,
      nMerges: Int): String = {
    // every CTE is MATERIALIZED: seg{t-1} is referenced by BOTH p{t}
    // and seg{t} — inlined (DuckDB's default) the chain re-derives
    // each level twice and the plan doubles per step
    val steps = (1 to nMerges).map { t =>
      s"""p$t AS MATERIALIZED (
  SELECT l, r, sum(cnt)::BIGINT AS c FROM (
    SELECT syms[i] AS l, syms[i + 1] AS r, cnt
    FROM (SELECT string_split(trim(seg), ' ') AS syms, cnt FROM seg${t - 1}),
         LATERAL unnest(generate_series(1, len(syms) - 1)) AS u(i))
  GROUP BY l, r HAVING sum(cnt) >= 2),
b$t AS MATERIALIZED (SELECT $t::BIGINT AS step, l, r, c FROM p$t
        ORDER BY c DESC, l ASC, r ASC LIMIT 1),
seg$t AS MATERIALIZED (SELECT word,
                 CASE WHEN b.l IS NULL THEN seg
                      ELSE replace(seg, ' ' || b.l || ' ' || b.r || ' ',
                                   ' ' || b.l || b.r || ' ') END AS seg, cnt
          FROM seg${t - 1} LEFT JOIN b$t b ON true)"""
    }.mkString(",\n")
    s"""wc AS MATERIALIZED (
  SELECT word, count(*)::BIGINT AS cnt FROM (
    SELECT unnest(string_split($textCol, ' ')) AS word FROM $table)
  WHERE word <> '' GROUP BY word),
seg0 AS MATERIALIZED (
  SELECT word,
         ' ' || array_to_string(
           list_transform(generate_series(1, length(word)),
                          i -> substring(word, i, 1)), ' ') || ' ' AS seg,
         cnt
  FROM wc),
$steps"""
  }

  /** q95's oracle: the learned merge table (step, left, right, cnt). */
  def oracleSql(table: String, textCol: String, nMerges: Int): String = {
    val union = (1 to nMerges)
      .map(t => s"SELECT step, l AS left, r AS right, c AS cnt FROM b$t")
      .mkString("\nUNION ALL\n")
    s"""WITH ${chainSql(table, textCol, nMerges)}
$union"""
  }

  /** q98's oracle: train the chain, then tokenize the corpus with the
    * final per-word segmentation — seg$n maps each DISTINCT word to
    * its symbol count, the doc-word list joins it, per-doc sum.
    * Mirrors [[tokenCounts]]'s vocabulary-level application exactly.
    */
  def tokenOracleSql(table: String, idCol: String, textCol: String,
      nMerges: Int): String =
    s"""WITH ${chainSql(table, textCol, nMerges)},
toks AS MATERIALIZED (
  SELECT word, len(string_split(trim(seg), ' '))::BIGINT AS n_syms
  FROM seg$nMerges),
docw AS (
  SELECT $idCol, word FROM (
    SELECT $idCol, unnest(string_split($textCol, ' ')) AS word FROM $table)
  WHERE word <> '')
SELECT $idCol, sum(n_syms)::BIGINT AS n_tokens
FROM docw JOIN toks USING (word)
GROUP BY $idCol"""

  /** q125's oracle: the same trained chain + vocabulary-level
    * application as [[tokenOracleSql]], rolled up per source with the
    * integer fertility ratio — mirrors [[fertility]] exactly.
    */
  def fertilityOracleSql(table: String, sourceCol: String, textCol: String,
      nMerges: Int): String =
    s"""WITH ${chainSql(table, textCol, nMerges)},
toks AS MATERIALIZED (
  SELECT word, len(string_split(trim(seg), ' '))::BIGINT AS n_syms
  FROM seg$nMerges),
srcw AS (
  SELECT $sourceCol, word FROM (
    SELECT $sourceCol, unnest(string_split($textCol, ' ')) AS word FROM $table)
  WHERE word <> '')
SELECT $sourceCol, count(*)::BIGINT AS n_words,
       sum(n_syms)::BIGINT AS n_tokens,
       ((sum(n_syms) * 1000) // count(*))::BIGINT AS fertility_x1000
FROM srcw JOIN toks USING (word)
GROUP BY $sourceCol"""
}

package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BloomDistinct, CappedList, DotProduct, FnArgs, GroupedTopK, ShingleHashes}

/** Library entry point for `spark.sql.extensions`: injects every graft
  * SQL function at session build, so
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  * makes `topk_agg`, `bloom_distinct`, `capped_list`, `shingle_hashes`
  * and `dot_f` available in EVERY session — pure-SQL users and
  * thriftserver clients included — without any runtime `register` call.
  * The per-query `register` helpers remain for ad-hoc sessions; both
  * paths build the identical expressions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, usage: String,
      builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name, usage),
      builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("topk_agg",
      "topk_agg(k, cnt, key) - bounded single-pass grouped top-k by (cnt DESC, key ASC)",
      exprs => GroupedTopK(
        FnArgs.litInt("topk_agg", "k", exprs.head), exprs(1), exprs(2))))
    ext.injectFunction(fn("bloom_distinct",
      "bloom_distinct(value, numBits) - mergeable Bloom-bitmap distinct estimate",
      exprs => BloomDistinct(
        exprs.head, FnArgs.litInt("bloom_distinct", "numBits", exprs(1)))))
    ext.injectFunction(fn("capped_list",
      "capped_list(value, cap) - bounded collect_list, NULL past the cap",
      exprs => CappedList(
        exprs.head, FnArgs.litInt("capped_list", "cap", exprs(1)))))
    ext.injectFunction(fn("shingle_hashes",
      "shingle_hashes(tokens, n, mod) - distinct 60-bit md5 hashes of n-token grams",
      exprs => ShingleHashes(exprs.head,
        FnArgs.litInt("shingle_hashes", "n", exprs(1)),
        FnArgs.litLong("shingle_hashes", "mod", exprs(2)))))
    ext.injectFunction(fn("simhash60",
      "simhash60(tokens) - fused distinct-tokens -> hash60 -> 60-bit majority-vote fingerprint",
      graft.functions.TextHashExpressions.simhash60Builder))
    ext.injectFunction(fn("minhash16",
      "minhash16(shingleHashes) - all 16 MinHash permutation minima in one pass",
      exprs => graft.functions.MinHash16(exprs.head)))
    ext.injectFunction(fn("bigram_counts",
      "bigram_counts(tokens) - per-doc distinct-bigram counts as array<struct<w1,w2,n>>",
      exprs => graft.functions.BigramCounts(exprs.head)))
    ext.injectFunction(fn("token_entropy",
      "token_entropy(tokens) - per-doc unigram entropy in exact milli-bits",
      exprs => graft.functions.TokenEntropy(exprs.head)))
    ext.injectFunction(fn("cdc_chunk_hashes",
      "cdc_chunk_hashes(tokens, window, modulus) - distinct 60-bit hashes of " +
        "content-defined chunks (rolling-gram boundaries)",
      exprs => graft.functions.CdcChunkHashes(exprs.head,
        FnArgs.litInt("cdc_chunk_hashes", "window", exprs(1)),
        FnArgs.litLong("cdc_chunk_hashes", "modulus", exprs(2)))))
    ext.injectFunction(fn("heavy_hitters",
      "heavy_hitters(capacity, key) - bounded Misra-Gries frequent-items summary",
      exprs => graft.functions.HeavyHitters(
        FnArgs.litInt("heavy_hitters", "capacity", exprs.head), exprs(1))))
    ext.injectFunction(fn("heavy_hitters_merge",
      "heavy_hitters_merge(capacity, delta, items) - fold persisted " +
        "Misra-Gries summaries (same merge algebra as heavy_hitters)",
      exprs => graft.functions.HeavyHittersMerge(
        FnArgs.litInt("heavy_hitters_merge", "capacity", exprs.head),
        exprs(1), exprs(2))))
    ext.injectFunction(fn("morton2",
      "morton2(x, y) - 62-bit Z-order key interleaving two scaled non-negative longs",
      exprs => graft.functions.MortonCode(exprs.head, exprs(1))))
    ext.injectFunction(fn("dot_f",
      "dot_f(a, b) - codegen left-to-right double dot product",
      exprs => DotProduct(exprs.head, exprs(1))))
    ext.injectFunction(fn("quant_code_sum",
      "quant_code_sum(vec) - summed int8 scalar-quantization codes of a float vector",
      exprs => graft.functions.QuantCodeSum(exprs.head)))
    ext.injectFunction(fn("pq_encode",
      "pq_encode(v, codebook, m, k) - per-subspace nearest-centroid PQ codes",
      exprs => graft.functions.PqEncode(exprs(0), exprs(1), exprs(2), exprs(3))))
    ext.injectFunction(fn("pq_lut",
      "pq_lut(q, codebook, m, k) - per-query ADC lookup table (m*k dots)",
      exprs => graft.functions.PqLut(exprs(0), exprs(1), exprs(2), exprs(3))))
    ext.injectFunction(fn("pq_dists",
      "pq_dists(v, codebook, m, k) - squared L2 distances to every centroid",
      exprs => graft.functions.PqDists(exprs(0), exprs(1), exprs(2), exprs(3))))
    ext.injectFunction(fn("pq_adc",
      "pq_adc(codes, lut, k) - asymmetric-distance approximate dot product",
      exprs => graft.functions.PqAdc(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction(fn("latest_by",
      "latest_by(payload, ord) - payload of the greatest ord (hash-aggregable argmax)",
      exprs => graft.functions.LatestBy(exprs.head, exprs(1))))
    ext.injectFunction(fn("cms_sketch",
      "cms_sketch(width, depth, key) - mergeable Count-Min frequency sketch grid",
      exprs => graft.functions.CmsSketch(
        FnArgs.litInt("cms_sketch", "width", exprs.head),
        FnArgs.litInt("cms_sketch", "depth", exprs(1)), exprs(2))))
    ext.injectFunction(fn("cms_est",
      "cms_est(sketch, key, width, depth) - Count-Min point frequency estimate",
      exprs => graft.functions.CmsEstimate(exprs.head, exprs(1),
        FnArgs.litInt("cms_est", "width", exprs(2)),
        FnArgs.litInt("cms_est", "depth", exprs(3)))))
  }
}

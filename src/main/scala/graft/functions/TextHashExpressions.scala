package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM-native implementation of the shingle→hash60→mod→distinct chain.
  *
  * The declarative spelling — `array_distinct(transform(shingles,
  * x => conv(substring(md5(x),1,15),16,10) % P))` — runs on Catalyst's
  * interpreted higher-order-function path (HOFs are excluded from
  * whole-stage codegen), allocating per-element expression evaluations
  * and intermediate hex strings. This helper computes the identical
  * values in one tight static call: md5 digest bytes → first 15 hex
  * chars == (first 8 bytes big-endian) >>> 4 → mod P → insertion-order
  * distinct. Bit-identical to the HOF chain and the DuckDB oracle
  * fragment `('0x' || substr(md5(x),1,15))::BIGINT % P` (proven by the
  * unchanged oracle hash-matches of q21/q29/q37).
  */
object TextHashUtil {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** 60-bit md5-prefix hash of UTF-8 bytes (== hash60Sql / hash60). */
  def hash60(s: UTF8String): Long = {
    val d = md5.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (digest(i) & 0xffL); i += 1 }
    acc >>> 4
  }

  /** tokens → 60-bit majority-vote SimHash over the DISTINCT tokens:
    * bit b of the result is set when more than half the distinct-token
    * hash60 values have bit b set. One static call fuses what the
    * declarative spelling ran as two interpreted HOF passes
    * (`transform(array_distinct(toks), hash60)` + the 60-step
    * `aggregate` majority fold) — bit-identical to DuckDB's
    * `list_transform(list_distinct(...))` + majority `list_sum`
    * (q22's oracle hash-match is the proof).
    */
  def simhash60(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val seen = new java.util.HashSet[UTF8String]()
    val cnt = new Array[Int](60)
    var total = 0
    var seenNull = false
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i)) {
        // a null token hashes to null: counted in the denominator,
        // contributes no bits (matches the HOF/list_* null semantics)
        if (!seenNull) { seenNull = true; total += 1 }
      } else {
        val t = tokens.getUTF8String(i)
        if (seen.add(t)) {
          total += 1
          val h = hash60(t)
          var b = 0
          while (b < 60) { cnt(b) += ((h >>> b) & 1L).toInt; b += 1 }
        }
      }
      i += 1
    }
    var acc = 0L
    var b = 0
    while (b < 60) { if (2 * cnt(b) > total) acc |= (1L << b); b += 1 }
    acc
  }

  private val MinHashA: Array[Long] = TextHashing.A.toArray
  private val MinHashB: Array[Long] = TextHashing.B.toArray

  /** All 16 permutation minima in one pass: out(j) = min over h of
    * (h·A(j) + B(j)) mod P. Products stay far under Long.MaxValue
    * (h < 2³¹, max A = 269). Empty input → 16 nulls, exactly like
    * `array_min(transform(empty, ...))`.
    */
  def minhash16(hashes: ArrayData): ArrayData = {
    val n = hashes.numElements()
    val perms = MinHashA.length
    if (n == 0)
      return new GenericArrayData(Array.fill[Any](perms)(null))
    val out = Array.fill(perms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < perms) {
        val v = (h * MinHashA(j) + MinHashB(j)) % TextHashing.P
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.map(x => x: Any))
  }

  /** tokens → distinct (hash60(n-gram) % mod), insertion order. */
  def shingleHashes(tokens: ArrayData, n: Int, mod: Long): ArrayData = {
    val cnt = tokens.numElements() - n + 1
    if (cnt <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < cnt) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens.getUTF8String(i + j).toString)
        j += 1
      }
      seen.add(hash60(UTF8String.fromString(sb.toString)) % mod)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next().longValue(); k += 1 }
    new GenericArrayData(out)
  }
}

/** `shingle_hashes(tokens)` as a codegen-friendly expression: the
  * generated code makes one static call, so the surrounding projection
  * stays inside its WholeStageCodegen span.
  */
case class ShingleHashes(child: Expression, n: Int, mod: Long)
    extends UnaryExpression {

  require(n >= 1 && mod > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) => TypeCheckSuccess
      case other =>
        TypeCheckFailure(s"shingle_hashes: needs ARRAY<STRING>, got ${other.sql}")
    }
  }

  override def nullSafeEval(input: Any): Any =
    TextHashUtil.shingleHashes(input.asInstanceOf[ArrayData], n, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashUtil.shingleHashes($c, $n, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `simhash60(tokens)` as a codegen-friendly expression — the fused
  * distinct→hash60→majority pipeline of [[TextHashUtil.simhash60]] in
  * one static call, keeping the surrounding projection inside its
  * WholeStageCodegen span (HOFs are excluded from codegen; this was
  * the catalog's last interpreted hot text path).
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) => TypeCheckSuccess
      case other =>
        TypeCheckFailure(s"simhash60: needs ARRAY<STRING>, got ${other.sql}")
    }
  }

  override def nullSafeEval(input: Any): Any =
    TextHashUtil.simhash60(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.simhash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `minhash16(shingleHashes)` — all 16 universal-hash permutation
  * minima in ONE pass over the shingle array, as a codegen'd static
  * call. Replaces 16 interpreted `array_min(transform(...))` chains
  * (each allocating an intermediate array per row — the q22 lesson,
  * applied to the q21/q53/q59 MinHash front end). Same math, same
  * output: out(j) = min over h of (h·A(j) + B(j)) mod P; an empty
  * input yields 16 nulls exactly like array_min over an empty
  * transform.
  */
case class MinHash16(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      // containsNull must be FALSE: the one-pass kernel reads slots via
      // getLong, which would silently treat a null element as hash 0 —
      // diverging from array_min(transform(...)) semantics (null
      // elements ignored). shingle_hashes emits containsNull=false;
      // any other producer must array_compact first.
      case ArrayType(LongType, false) => TypeCheckSuccess
      case ArrayType(LongType, true) =>
        TypeCheckFailure("minhash16: needs ARRAY<BIGINT> WITHOUT null " +
          "elements (containsNull=false) — a null slot would silently " +
          "hash as 0; array_compact the input first")
      case other =>
        TypeCheckFailure(s"minhash16: needs ARRAY<BIGINT>, got ${other.sql}")
    }
  }

  override def nullSafeEval(input: Any): Any =
    TextHashUtil.minhash16(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.minhash16($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextHashExpressions {

  /** ONE builder for both registration paths (temp-function registry
    * here and GraftExtensions injection): extra args must fail loudly,
    * not be silently dropped, and the two paths must not drift.
    */
  private[graft] val simhash60Builder
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression = { exprs =>
    require(exprs.size == 1,
      s"simhash60 takes exactly 1 argument, got ${exprs.size}")
    SimHash60(exprs.head)
  }

  /** Idempotently registers `shingle_hashes(tokens, n, mod)` and
    * `simhash60(tokens)` — call via `call_function`/`expr` (the
    * registry path sidesteps Spark 4's Column-from-Expression churn,
    * as with dot_f).
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_hashes",
      exprs => ShingleHashes(exprs.head,
        FnArgs.litInt("shingle_hashes", "n", exprs(1)),
        FnArgs.litLong("shingle_hashes", "mod", exprs(2))),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash60", simhash60Builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash16", exprs => MinHash16(exprs.head), "built-in")
  }
}

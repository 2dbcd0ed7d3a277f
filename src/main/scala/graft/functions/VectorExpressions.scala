package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the hot vector-math path.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`)
  * allocates intermediate arrays per row pair — fine per-document, fatal
  * in an n² pair join. This expression is a tight loop over the unsafe
  * array data with full whole-stage codegen, ~10× faster in the q23
  * pair scan, and accumulates LEFT-TO-RIGHT in double — bit-identical
  * to both the HOF fold and DuckDB's list_dot_product, so oracle
  * hash-equality is preserved.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must already be ArrayType(DoubleType) — the registry wrapper
  // and call sites cast explicitly (AbstractDataType/ExpectsInputTypes
  // are private[sql] in Spark 4, so no declarative input contract here).
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double acc = 0.0;
         |for (int i = 0; i < n; i++) {
         |  acc += $a.getDouble(i) * $b.getDouble(i);
         |}
         |${ev.value} = acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Idempotently registers `dot_f(a, b)` on the session so plans can
    * use it via expr("dot_f(...)") — the registry path sidesteps the
    * Column-from-Expression constructor churn in Spark 4.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_f", exprs => DotProduct(exprs.head, exprs(1)), "built-in")
}

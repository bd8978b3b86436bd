package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen'd dot product over double arrays.
  *
  * The `functions.aggregate`/`zip_with` formulation is semantically
  * identical but a `CodegenFallback` (higher-order functions evaluate
  * their lambda interpreted, per element) — on the ANN queries that is
  * the difference between a scan-bound stage and a 25-35 s one.
  * Whole-stage codegen emits the loop below inline.
  *
  * Semantics: sequential left-to-right multiply-accumulate in double —
  * bit-identical to the HOF version and to DuckDB's `list_sum` fold,
  * so the exact-equality oracle still holds. Null-safe at the array
  * level; element nulls are not expected (embedding columns).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Contract: both children evaluate to array<double> (callers cast;
  // `AbstractDataType`/ImplicitCastInputTypes are private[sql], so the
  // declarative form is not available to an external expression).
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(
      DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))
}

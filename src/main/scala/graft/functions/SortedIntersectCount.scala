package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen'd intersection COUNT of two SORTED
  * `array<struct<long, long>>` columns by linear merge — the verify
  * kernel of the prefix-filtered set-similarity join
  * ([[graft.operators.Dedup.setSimJoin]]).
  *
  * Why not `size(array_intersect(...))`: for non-primitive element
  * types Spark's ArrayIntersect falls back to pairwise `ordering.equiv`
  * scans — O(|A|·|B|) interpreted comparisons per row, measured 13 s
  * for the sf0.1 candidate set vs scan-bound with this merge. The
  * arrays here are per-document shingle-key sets (16-byte keys as two
  * longs), pre-sorted by `sort_array` (struct order = field order =
  * (s1, s2) lexicographic — the same order this merge walks), so the
  * count is one O(|A|+|B|) pass inside whole-stage codegen.
  *
  * Contract: both inputs sorted ascending by (s1, s2), no duplicate
  * elements within one array (shingle sets are deduped per doc);
  * element structs are non-null. Null-safe at the array level. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (n1, n2) = (x.numElements(), y.numElements())
    var i = 0
    var j = 0
    var cnt = 0L
    while (i < n1 && j < n2) {
      val rx = x.getStruct(i, 2)
      val ry = y.getStruct(j, 2)
      val c1 = java.lang.Long.compare(rx.getLong(0), ry.getLong(0))
      val c = if (c1 != 0) c1 else java.lang.Long.compare(rx.getLong(1), ry.getLong(1))
      if (c < 0) i += 1
      else if (c > 0) j += 1
      else { cnt += 1; i += 1; j += 1 }
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n1 = ctx.freshName("n1")
      val n2 = ctx.freshName("n2")
      val cnt = ctx.freshName("cnt")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val c = ctx.freshName("c")
      s"""
         |int $n1 = $a.numElements();
         |int $n2 = $b.numElements();
         |int $i = 0; int $j = 0; long $cnt = 0L;
         |while ($i < $n1 && $j < $n2) {
         |  InternalRow $rx = $a.getStruct($i, 2);
         |  InternalRow $ry = $b.getStruct($j, 2);
         |  int $c = java.lang.Long.compare($rx.getLong(0), $ry.getLong(0));
         |  if ($c == 0) $c = java.lang.Long.compare($rx.getLong(1), $ry.getLong(1));
         |  if ($c < 0) { $i++; } else if ($c > 0) { $j++; }
         |  else { $cnt++; $i++; $j++; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(
      SortedIntersectCount(GraftBridge.expression(a), GraftBridge.expression(b)))
}

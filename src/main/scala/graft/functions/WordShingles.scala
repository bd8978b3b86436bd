package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a string, as one compiled pass.
  *
  * Replaces the `transform(sequence(...), i → concat_ws(slice(...)))` +
  * `array_distinct` chain, whose higher-order functions evaluate
  * interpreted per shingle and allocate an intermediate array per step —
  * measured 6.4 s of the 11-14 s dedup queries at sf0.1 just to
  * *produce* shingles. Here: split once, build each shingle into a
  * reused builder, dedupe in a hash set, emit a single array.
  *
  * Semantics match the declarative version exactly (split on single
  * space keeping empty tokens; first-occurrence order; empty array when
  * the text has fewer than n tokens), so the DuckDB oracle
  * (`list_distinct([array_to_string(toks[i:i+2],' ') ...])`) agrees.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def apply(c: Column, n: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(c), n))

  /** Static entry point shared by eval and generated code. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    // -1: keep trailing empty tokens, matching split(text, ' ') and
    // DuckDB string_split semantics
    val toks = s.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]((toks.length - n + 1) * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Frequency-weighted SimHash fingerprint of a token stream, computed
  * per document in one compiled pass.
  *
  * Declarative formulation (kept as the oracle's definition): explode
  * tokens × md5 × 60 per-bit conditional sums × groupBy(doc_id) — a
  * 425k-row explode and a 25M-cell aggregation at sf0.1, plus the
  * shuffle. This expression folds the whole thing into a narrow map:
  * for each token, take bit j of md5(token) (j < bits, hex-nibble
  * order), accumulate ±1 per bit, emit Σ bit_j>0 ? 2^j : 0. Identical
  * output, no shuffle, scan-speed.
  */
case class SimHash64(child: Expression, bits: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def apply(c: Column, bits: Int = 60): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(c), bits))

  private val hexVal: Array[Int] = {
    val a = Array.fill(128)(-1)
    "0123456789abcdef".zipWithIndex.foreach { case (ch, i) => a(ch) = i }
    a
  }

  /** Static entry point shared by eval and generated code. Bit j is
    * taken as ((nibble(j/4) >> (j%4)) & 1) of the lowercase-hex md5 —
    * the same derivation the SQL oracle spells out with strpos/substr. */
  def compute(s: UTF8String, bits: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = new Array[Int](bits)
    val toks = s.toString.split(" ", -1)
    var t = 0
    while (t < toks.length) {
      md.reset()
      val digest = md.digest(toks(t).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var j = 0
      while (j < bits) {
        // hex nibble j/4 of the digest string = high nibble of byte j/8
        // when (j/4) even, low nibble when odd
        val byte = digest(j / 8) & 0xff
        val nibble = if ((j / 4) % 2 == 0) byte >> 4 else byte & 0xf
        if (((nibble >> (j % 4)) & 1) == 1) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      t += 1
    }
    var acc = 0L
    var j = 0
    while (j < bits) {
      if (counts(j) > 0) acc |= 1L << j
      j += 1
    }
    acc
  }
}

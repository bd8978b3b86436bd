package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator: per group, keep the k best
  * (score desc, id asc) pairs in an O(k) buffer.
  *
  * The window formulation (`row_number() OVER (PARTITION BY q ORDER BY
  * score DESC)`) shuffles and sorts EVERY candidate row; this
  * aggregator reduces map-side, so the exchange carries at most
  * groups×k entries and nothing is ever globally sorted — the
  * difference between O(C log C) on the full candidate set and O(C·k)
  * streaming passes. Deterministic and order-insensitive: the result
  * is the same top-k set whatever the partitioning, with the same
  * (score desc, id asc) tie-breaking as the window version.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {

  private def better(a: (Long, Double), b: (Long, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  override def zero: Seq[(Long, Double)] = Vector.empty

  override def reduce(buf: Seq[(Long, Double)], in: (Long, Double)): Seq[(Long, Double)] =
    if (buf.size < k) buf :+ in
    else {
      // replace the current worst if the new entry beats it (O(k))
      val worst = buf.reduceLeft((x, y) => if (better(x, y)) y else x)
      if (better(in, worst)) buf.updated(buf.indexOf(worst), in) else buf
    }

  override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] =
    (a ++ b).sortWith(better).take(k)

  override def finish(buf: Seq[(Long, Double)]): Seq[(Long, Double)] =
    buf.sortWith(better)

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] = bufferEncoder
}

/** SQL-registrable form of [[TopKAggregator]]: a registered UDAF has a
  * fixed construction, so the capacity `k` rides as a per-row third
  * argument instead (callers pass a literal; the buffer adopts the
  * first k it sees and [[graft.functions.Registry]] registers this as
  * `graft_topk(id, score, k)`). Semantics identical to the
  * DataFrame-side aggregator — the spec pins SQL output == DataFrame
  * output. */
class TopKSqlAggregator
    extends Aggregator[(Long, Double, Int), (Int, Seq[(Long, Double)]), Seq[(Long, Double)]] {
  private def inner(k: Int) = new TopKAggregator(math.max(1, k))
  override def zero: (Int, Seq[(Long, Double)]) = (0, Vector.empty)
  override def reduce(buf: (Int, Seq[(Long, Double)]),
                      in: (Long, Double, Int)): (Int, Seq[(Long, Double)]) = {
    val k = if (buf._1 > 0) buf._1 else in._3
    (k, inner(k).reduce(buf._2, (in._1, in._2)))
  }
  override def merge(a: (Int, Seq[(Long, Double)]),
                     b: (Int, Seq[(Long, Double)])): (Int, Seq[(Long, Double)]) = {
    val k = math.max(a._1, b._1)
    (k, inner(k).merge(a._2, b._2))
  }
  override def finish(buf: (Int, Seq[(Long, Double)])): Seq[(Long, Double)] =
    inner(buf._1).finish(buf._2)
  override def bufferEncoder: Encoder[(Int, Seq[(Long, Double)])] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Int, Seq[(Long, Double)])]()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
}

object TopKAggregator {
  import org.apache.spark.sql.functions.udaf
  import org.apache.spark.sql.expressions.UserDefinedFunction

  def topK(k: Int): UserDefinedFunction = {
    implicit val enc: Encoder[(Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
    udaf(new TopKAggregator(k))
  }

  /** The k-as-argument SQL form (see [[TopKSqlAggregator]]). */
  def topKSql: UserDefinedFunction = {
    implicit val enc: Encoder[(Long, Double, Int)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaInt)
    udaf(new TopKSqlAggregator)
  }
}

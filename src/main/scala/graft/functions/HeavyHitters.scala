package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters summary (Misra & Gries 1982; mergeability
  * per Agarwal et al., "Mergeable Summaries", PODS'12): a capacity-`k`
  * frequency sketch over a string stream.
  *
  * Guarantees (for stream length N): every reported estimate satisfies
  * `true − N/(k+1) ≤ est ≤ true`, and every item with true frequency
  * > N/(k+1) IS in the summary — so the sketch never invents a heavy
  * hitter and never misses a sufficiently heavy one. The one-row gate
  * query checks exactly these bounds against exact counts
  * (`operators.Sketches.heavyHittersGate`).
  *
  * Why a sketch: the exact top-terms pass ([[graft.operators.TextOps
  * .vocabulary]]) shuffles one integer cell per DISTINCT term — fine
  * until the term universe itself is huge (open-vocabulary n-grams,
  * URLs). The MG summary bounds state at O(k) per partition and the
  * exchange at groups×k rows whatever the universe size, the same
  * argument as HLL vs COUNT(DISTINCT).
  *
  * Merge-order determinism: counters are exact integers; merge is
  * commutative up to the final (count desc, term asc) ranking, and the
  * subtraction step removes the same mass whatever the partition
  * order. The reported ESTIMATES can differ by partitioning (sketch
  * semantics, like HLL registers) — which is why the driver-visible
  * contract is the guarantee gate, not a hash compare.
  */
class HeavyHitters(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], term: String): Map[String, Long] =
    buf.get(term) match {
      case Some(c) => buf.updated(term, c + 1)
      case None if buf.size < k => buf.updated(term, 1L)
      case None => // decrement-all: drops ≤1 unit of every counter
        buf.collect { case (t, c) if c > 1 => (t, c - 1) }
    }

  /** Mergeable-summaries merge: add counters, then subtract the
    * (k+1)-th largest count from everything and keep the positive
    * remainder — the union summary keeps the MG error bound. */
  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
      sum.collect { case (t, c) if c > cut => (t, c - cut) }
    }
  }

  override def finish(buf: Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (t, c) => (-c, t) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}

/** SQL-registrable form of [[HeavyHitters]]: capacity `k` rides as a
  * per-row second argument (a registered UDAF is construction-fixed),
  * adopted by the buffer from the first row — `graft_heavy_hitters
  * (term, k)` via [[graft.functions.Registry]]. Semantics identical to
  * the DataFrame-side aggregator. */
class HeavyHittersSqlAggregator
    extends Aggregator[(String, Int), (Int, Map[String, Long]), Seq[(String, Long)]] {
  private def inner(k: Int) = new HeavyHitters(math.max(1, k))
  override def zero: (Int, Map[String, Long]) = (0, Map.empty)
  override def reduce(buf: (Int, Map[String, Long]),
                      in: (String, Int)): (Int, Map[String, Long]) = {
    val k = if (buf._1 > 0) buf._1 else in._2
    (k, inner(k).reduce(buf._2, in._1))
  }
  override def merge(a: (Int, Map[String, Long]),
                     b: (Int, Map[String, Long])): (Int, Map[String, Long]) = {
    val k = math.max(a._1, b._1)
    (k, inner(k).merge(a._2, b._2))
  }
  override def finish(buf: (Int, Map[String, Long])): Seq[(String, Long)] =
    inner(buf._1).finish(buf._2)
  override def bufferEncoder: Encoder[(Int, Map[String, Long])] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Int, Map[String, Long])]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}

object HeavyHitters {
  import org.apache.spark.sql.functions.udaf
  import org.apache.spark.sql.expressions.UserDefinedFunction

  def summary(k: Int): UserDefinedFunction = {
    implicit val enc: Encoder[String] = Encoders.STRING
    udaf(new HeavyHitters(k))
  }

  /** The k-as-argument SQL form (see [[HeavyHittersSqlAggregator]]). */
  def summarySql: UserDefinedFunction = {
    implicit val enc: Encoder[(String, Int)] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaInt)
    udaf(new HeavyHittersSqlAggregator)
  }
}

package graft.functions

import graft.operators.Sketches.QuantileSketch
import graft.operators.Sketches.QuantileSketch.Sketch
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Grouped form of [[graft.operators.Sketches.QuantileSketch]]: a typed
  * `Aggregator` so the mergeable compactor runs under `groupBy` — the
  * per-group percentile surface at 100 TB, where the exact
  * `percentile` aggregate would ship every group's full value
  * histogram to its reducer. Output per group: (n, err_bound,
  * estimates aligned with the constructor's probe list) — the error
  * accounting rides along so callers (and the gate query) can check
  * the |rank − q·n| ≤ err_bound theorem per group.
  *
  * Buffer is the sketch's own levels structure (Seq-typed for the
  * encoder); reduce inserts one value through the shared compaction
  * code, merge is the sketch merge — partial aggregation and the
  * exchange therefore carry O(k·log(n/k)) doubles per group, never the
  * values. */
class QuantileSketchAgg(k: Int, probes: Seq[Double])
    extends Aggregator[Double, (Seq[Seq[Double]], Long, Long),
      (Long, Long, Seq[Double])] {

  private def toSketch(b: (Seq[Seq[Double]], Long, Long)): Sketch =
    Sketch(k, b._1.map(_.toVector).toVector, b._2, b._3)
  private def fromBuf(s: Sketch): (Seq[Seq[Double]], Long, Long) =
    (s.levels, s.count, s.errBound)

  override def zero: (Seq[Seq[Double]], Long, Long) =
    (Seq(Seq.empty[Double]), 0L, 0L)

  /** Per-row reduce PREPENDS to the level-0 head only — the full
    * levels→Vector conversion and compaction run once per 2k inserts,
    * not per row (typed-aggregator buffers live as objects inside
    * ObjectHashAggregate, so this prepend is the entire hot-path cost).
    * Prepend, not append: after the buffer round-trips through the
    * ExpressionEncoder (partial→final, or a spill) the Seq
    * deserializes array-backed, where `:+` copies the whole level-0
    * buffer per row — O(k) per insert, O(k²) per compaction cycle.
    * [[levelZero]] coerces a foreign runtime type to List once, so the
    * steady state is O(1) `::` whatever the encoder produced; level-0
    * order is immaterial (compaction sorts before promoting). */
  private def levelZero(h: Seq[Double]): Seq[Double] = h match {
    case l: List[Double @unchecked] => l
    case v: Vector[Double @unchecked] => v
    case other => other.toList
  }

  override def reduce(buf: (Seq[Seq[Double]], Long, Long),
                      v: Double): (Seq[Seq[Double]], Long, Long) = {
    val head = v +: levelZero(buf._1.head)
    // lengthCompare short-circuits at 2k nodes — List.length walks the
    // whole buffer per row, which re-smuggles the O(k) cost the
    // prepend removed
    if (head.lengthCompare(2 * k) < 0) (head +: buf._1.tail, buf._2 + 1, buf._3)
    else fromBuf(QuantileSketch.compacted(Sketch(k,
      (head +: buf._1.tail).map(_.toVector).toVector, buf._2 + 1, buf._3)))
  }

  override def merge(a: (Seq[Seq[Double]], Long, Long),
                     b: (Seq[Seq[Double]], Long, Long)): (Seq[Seq[Double]], Long, Long) =
    fromBuf(QuantileSketch.merge(toSketch(a), toSketch(b)))

  override def finish(buf: (Seq[Seq[Double]], Long, Long)): (Long, Long, Seq[Double]) = {
    val s = toSketch(buf)
    (s.count, s.errBound,
      if (s.count == 0) probes.map(_ => Double.NaN)
      else probes.map(q => QuantileSketch.query(s, q)))
  }

  override def bufferEncoder: Encoder[(Seq[Seq[Double]], Long, Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Seq[Seq[Double]], Long, Long)]()
  override def outputEncoder: Encoder[(Long, Long, Seq[Double])] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long, Seq[Double])]()
}

object QuantileSketchAgg {
  /** `groupBy(...).agg(QuantileSketchAgg.sketch(256, Seq(0.5))(col))` →
    * struct(n, err_bound, estimates). */
  def sketch(k: Int, probes: Seq[Double])(value: Column): Column =
    org.apache.spark.sql.functions.udaf(
      new QuantileSketchAgg(k, probes), Encoders.scalaDouble).apply(value)

  /** SQL-registrable form: `graft_quantile(value, q, k)` — (q, k) ride
    * as trailing per-row arguments adopted by the buffer from the
    * first row (a registered UDAF is construction-fixed; same pattern
    * as `graft_topk`/`graft_heavy_hitters`). Returns the estimate;
    * bound checking stays with the DataFrame-side gates. */
  def quantileSql: org.apache.spark.sql.expressions.UserDefinedFunction = {
    implicit val enc: Encoder[(Double, Double, Int)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble, Encoders.scalaInt)
    org.apache.spark.sql.functions.udaf(new QuantileSketchSqlAggregator)
  }
}

/** See [[QuantileSketchAgg.quantileSql]]. Buffer carries the adopted
  * (q, k) beside the sketch levels; reduce is the same deferred-
  * compaction amortized-O(1) head prepend as the DataFrame-side
  * aggregator (see [[QuantileSketchAgg.reduce]] for why prepend). */
class QuantileSketchSqlAggregator
    extends Aggregator[(Double, Double, Int),
      (Double, Int, Seq[Seq[Double]], Long, Long), Double] {

  private def toSketch(k: Int,
                       b: (Double, Int, Seq[Seq[Double]], Long, Long)): Sketch =
    Sketch(math.max(1, k), b._3.map(_.toVector).toVector, b._4, b._5)

  private def levelZero(h: Seq[Double]): Seq[Double] = h match {
    case l: List[Double @unchecked] => l
    case v: Vector[Double @unchecked] => v
    case other => other.toList
  }

  override def zero: (Double, Int, Seq[Seq[Double]], Long, Long) =
    (-1.0, 0, Seq(Seq.empty[Double]), 0L, 0L)

  override def reduce(buf: (Double, Int, Seq[Seq[Double]], Long, Long),
                      in: (Double, Double, Int)): (Double, Int, Seq[Seq[Double]], Long, Long) = {
    val q = if (buf._2 > 0) buf._1 else in._2
    val k = math.max(1, if (buf._2 > 0) buf._2 else in._3)
    val head = in._1 +: levelZero(buf._3.head)
    if (head.lengthCompare(2 * k) < 0) (q, k, head +: buf._3.tail, buf._4 + 1, buf._5)
    else {
      val s = QuantileSketch.compacted(Sketch(k,
        (head +: buf._3.tail).map(_.toVector).toVector, buf._4 + 1, buf._5))
      (q, k, s.levels, s.count, s.errBound)
    }
  }

  override def merge(a: (Double, Int, Seq[Seq[Double]], Long, Long),
                     b: (Double, Int, Seq[Seq[Double]], Long, Long)): (Double, Int, Seq[Seq[Double]], Long, Long) = {
    val q = if (a._2 > 0) a._1 else b._1
    val k = math.max(1, math.max(a._2, b._2))
    val s = QuantileSketch.merge(toSketch(k, a), toSketch(k, b))
    (q, k, s.levels, s.count, s.errBound)
  }

  override def finish(buf: (Double, Int, Seq[Seq[Double]], Long, Long)): Double = {
    val s = toSketch(buf._2, buf)
    if (s.count == 0) Double.NaN else QuantileSketch.query(s, buf._1)
  }

  override def bufferEncoder: Encoder[(Double, Int, Seq[Seq[Double]], Long, Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Int, Seq[Seq[Double]], Long, Long)]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

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

  /** Per-row reduce appends to the level-0 head only — the full
    * levels→Vector conversion and compaction run once per 2k inserts,
    * not per row (typed-aggregator buffers live as objects inside
    * ObjectHashAggregate, so this append is the entire hot-path
    * cost). */
  override def reduce(buf: (Seq[Seq[Double]], Long, Long),
                      v: Double): (Seq[Seq[Double]], Long, Long) = {
    val head = buf._1.head :+ v
    if (head.length < 2 * k) (head +: buf._1.tail, buf._2 + 1, buf._3)
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
}

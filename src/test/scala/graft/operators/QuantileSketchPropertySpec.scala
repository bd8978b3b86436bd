package graft.operators

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean
import graft.operators.Sketches.QuantileSketch._

/** ScalaCheck properties for the deterministic quantile compactor — the
  * laws the theorem gates rely on, checked over arbitrary data:
  *
  *  - the self-accounted rank bound: for any data, capacity and probe,
  *    the estimate's rank interval [#{v < est}, #{v ≤ est}] intersects
  *    q·n ± (errBound + 1) — duplicates deliberately generated so
  *    tied-value runs are exercised, not avoided;
  *  - exact counting: `count` equals the input length under any build;
  *  - split/merge: merging independently-built halves preserves exact
  *    counts, adds error bounds, and still satisfies the rank bound —
  *    the mergeability law that makes per-partition building sound.
  */
object QuantileSketchPropertySpec extends Properties("QuantileSketch") {

  // coarse value grid (×1/7 keeps them non-integral) → plenty of ties
  private val values: Gen[List[Double]] =
    Gen.listOf(Gen.chooseNum(-60, 60).map(_.toDouble / 7.0))

  private def bounds(vs: List[Double], est: Double, q: Double,
                     n: Long, err: Long): Boolean = {
    val target = q * n
    vs.count(_ < est) <= target + err + 1 && vs.count(_ <= est) >= target - err - 1
  }

  property("rank-interval bound holds for any data, capacity and probe") =
    Prop.forAll(values, Gen.choose(4, 64), Gen.choose(1, 99)) { (vs, k, qi) =>
      vs.isEmpty || {
        val q = qi / 100.0
        val s = insertAll(empty(k), vs.iterator)
        s.count == vs.length &&
          bounds(vs, query(s, q), q, s.count, s.errBound)
      }
    }

  property("split + merge: exact counts, additive bounds, rank law intact") =
    Prop.forAll(values, values, Gen.choose(4, 32)) { (a, b, k) =>
      (a.nonEmpty || b.nonEmpty) ==> {
        val sa = insertAll(empty(k), a.iterator)
        val sb = insertAll(empty(k), b.iterator)
        val m = merge(sa, sb)
        val all = a ++ b
        m.count == all.length &&
          m.errBound >= sa.errBound + sb.errBound &&
          bounds(all, query(m, 0.5), 0.5, m.count, m.errBound)
      }
    }

  property("merge is order-insensitive in its guarantees") =
    Prop.forAll(values, values, values, Gen.choose(4, 16)) { (a, b, c, k) =>
      (a.nonEmpty || b.nonEmpty || c.nonEmpty) ==> {
        val parts = List(a, b, c).map(vs => insertAll(empty(k), vs.iterator))
        val l = parts.reduceLeft(merge)
        val r = parts.reduceRight(merge)
        val all = a ++ b ++ c
        l.count == all.length && r.count == all.length &&
          bounds(all, query(l, 0.3), 0.3, l.count, l.errBound) &&
          bounds(all, query(r, 0.3), 0.3, r.count, r.errBound)
      }
    }
}

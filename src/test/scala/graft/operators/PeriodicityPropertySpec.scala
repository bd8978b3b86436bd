package graft.operators

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck laws for the KMP smallest-period kernel, cross-checked
  * against the O(n²) slice-comparison definition the DuckDB oracle
  * uses (smallest p such that w[0..n-p-1] == w[p..n-1]). */
object PeriodicityPropertySpec extends Properties("smallestPeriod") {

  // tiny alphabet → plenty of borders and genuine periods
  private val tokens: Gen[Array[String]] =
    Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c")).map(_.toArray)

  private def bruteForce(w: Array[String]): Int =
    (1 to w.length).find { p =>
      (0 until w.length - p).forall(i => w(i) == w(i + p))
    }.get

  property("KMP period equals the brute-force slice definition") =
    Prop.forAll(tokens) { w =>
      TextOps.smallestPeriod(w) == bruteForce(w)
    }

  property("a sequence repeated k times has the base period") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.oneOf("x", "y")), Gen.choose(2, 5)) {
      (base, k) =>
        val w = Array.fill(k)(base).flatten.toArray
        // the repeat's period divides the base length and reproduces w
        val p = TextOps.smallestPeriod(w)
        p <= base.length && (0 until w.length - p).forall(i => w(i) == w(i + p))
    }

  property("all-distinct tokens have period n") =
    Prop.forAll(Gen.choose(1, 30)) { n =>
      val w = Array.tabulate(n)(i => s"t$i")
      TextOps.smallestPeriod(w) == n
    }
}

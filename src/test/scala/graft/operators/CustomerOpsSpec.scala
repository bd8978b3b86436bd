package graft.operators

import graft.SparkSpec

/** Customer/supplier lifecycle operators: the two-phase Spearman ranks
  * must equal the single-task window reference exactly, and the ppm
  * identity must match a hand computation. */
class CustomerOpsSpec extends SparkSpec {
  import spark.implicits._

  private def li(rows: (String, Long, Int, Long, Double)*) =
    rows.toDF("l_returnflag", "l_orderkey", "l_linenumber",
      "l_quantity", "l_extendedprice")

  test("two-phase Spearman equals the window reference; hand case exact") {
    // perfectly concordant group A (rho = 1e6) and a discordant pair
    // in group B
    val df = li(
      ("A", 1L, 1, 1L, 10.0), ("A", 1L, 2, 2L, 20.0), ("A", 2L, 1, 3L, 30.0),
      ("B", 3L, 1, 1L, 20.0), ("B", 3L, 2, 2L, 10.0))
    val got = CustomerOps.spearmanQuantityPrice(df)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    // group B: ranks (1,2) vs (2,1) → Σd² = 2, n = 2 →
    // 1 − 6·2/(2·3) = −1 → −1,000,000 ppm
    assert(got == Seq(("A", 3L, 1000000L), ("B", 2L, -1000000L)), got)
    val ref = CustomerOps.spearmanQuantityPriceWindow(df)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == ref, "two-phase ranks must equal the window reference")
  }

  test("two-phase Spearman equals the window reference on a larger shuffled input") {
    val rnd = new scala.util.Random(42)
    val rows = (1L to 2000L).map { i =>
      ("F" + (i % 3), i, (i % 7).toInt + 1,
        (rnd.nextInt(50) + 1).toLong, rnd.nextInt(10000) / 100.0 + 1.0)
    }
    val df = li(rows: _*).repartition(8)
    val a = CustomerOps.spearmanQuantityPrice(df)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val b = CustomerOps.spearmanQuantityPriceWindow(df)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }
}

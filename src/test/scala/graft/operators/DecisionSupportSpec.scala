package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Decision-support star joins + co-purchase graph census: exact
  * equality with in-memory integer references on seeded random data,
  * hand-computed triangle/degree values, threshold behavior. */
class DecisionSupportSpec extends SparkSpec {
  import spark.implicits._

  // --- co-purchase graph helpers -----------------------------------

  /** One order per undirected edge → co-purchase graph == edge list. */
  private def liFromEdges(edges: Seq[(Long, Long)]): DataFrame =
    edges.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((i.toLong, a), (i.toLong, b))
    }.toDF("l_orderkey", "l_suppkey")

  test("triangle census: K4 minus an edge has 2 triangles, clustering 0.75") {
    val li = liFromEdges(Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L))
    val r = GraphOps.triangleCensus(li, minOrders = 1L).collect()(0)
    assert(r.getAs[Long]("n_nodes") == 4L)
    assert(r.getAs[Long]("n_edges") == 5L)
    assert(r.getAs[Long]("n_wedges") == 8L) // C(3,2)+C(3,2)+C(2,2)+C(2,2)
    assert(r.getAs[Long]("n_triangles") == 2L)
    assert(r.getAs[Double]("clustering") == 0.75)
  }

  test("triangle census matches brute-force enumeration on random graphs") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(60)((rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (a min b, a max b) }.distinct
      val es = edges.toSet
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val expected = (for {
        a <- nodes; b <- nodes if a < b && es((a, b))
        c <- nodes if b < c && es((b, c)) && es((a, c))
      } yield 1).size.toLong
      val r = GraphOps.triangleCensus(liFromEdges(edges), minOrders = 1L)
        .collect()(0)
      assert(r.getAs[Long]("n_triangles") == expected, s"seed $seed")
      assert(r.getAs[Long]("n_edges") == edges.size.toLong)
    }
  }

  test("co-purchase threshold: pairs below minOrders support drop") {
    // suppliers (1,2) co-occur in 3 orders, (1,3) in only 1
    val li = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 2L),
      (4L, 1L), (4L, 3L)).toDF("l_orderkey", "l_suppkey")
    val edges = GraphOps.copurchaseEdges(li, minOrders = 2L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(edges == Seq((1L, 2L, 3L)))
  }

  test("degree histogram: hand-computed on the wheel graph") {
    // center 0 joined to 1,2,3 plus rim 1-2, 2-3, 3-1: all degree 3... rim
    // nodes have deg 3 (center + two rim neighbors), center deg 3.
    val li = liFromEdges(Seq(0L -> 1L, 0L -> 2L, 0L -> 3L,
      1L -> 2L, 2L -> 3L, 1L -> 3L))
    val h = GraphOps.degreeHistogram(li, minOrders = 1L)
      .as[(Long, Long)].collect().toMap
    assert(h == Map(3L -> 4L))
  }

  /** In-memory mirror of the sync-LPA recurrence. */
  private def refLpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val bi = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val adj = bi.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    var lab = bi.map(_._1).distinct.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      lab = adj.map { case (node, nbrs) =>
        val counts = nbrs.groupBy(lab).view.mapValues(_.size).toMap
        node -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lab
  }

  test("label propagation: disconnected cliques each converge to their min label") {
    val edges = Seq(1L -> 2L, 1L -> 3L, 2L -> 3L,
      10L -> 11L, 10L -> 12L, 11L -> 12L)
    val got = GraphOps.labelPropagation(edges.toDF("a", "b"), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == refLpa(edges, 3))
    assert(Set(1L, 2L, 3L).map(got) == Set(1L))
    assert(Set(10L, 11L, 12L).map(got) == Set(10L))
    // bridged variant: sync LPA floods the smaller label across the
    // bridge — pin that the engine tracks the reference there too
    val bridged = edges :+ (3L -> 10L)
    val gotB = GraphOps.labelPropagation(bridged.toDF("a", "b"), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(gotB == refLpa(bridged, 3))
  }

  test("label propagation matches the in-memory reference on random graphs") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(50)((rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (a min b, a max b) }.distinct
      val got = GraphOps.labelPropagation(edges.toDF("a", "b"), iters = 3)
        .as[(Long, Long)].collect().toMap
      assert(got == refLpa(edges, 3), s"seed $seed")
    }
  }

  /** In-memory mirror of the weighted-PageRank integer recurrence. */
  private def refWRank(edges: Seq[(Long, Long, Long)], iters: Int,
                       base: Long = 1000000L): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val wOut = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var mass = nodes.map(_ -> base).toMap
    for (_ <- 1 to iters) {
      val inc = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _, w) => mass(s) * w / wOut(s) }.sum
      }
      mass = nodes.map(n => n -> (15L * base / 100L +
        85L * inc.getOrElse(n, 0L) / 100L)).toMap
    }
    mass
  }

  test("weightedPageRank matches the in-memory reference; uniform weights == pageRank") {
    for (seed <- 1 to 2) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(60)((rnd.nextInt(12).toLong, rnd.nextInt(12).toLong,
        (rnd.nextInt(5) + 1).toLong))
        .filter { case (a, b, _) => a != b }
        .groupBy(e => (e._1, e._2)).map(_._2.head).toSeq
      val got = GraphOps.weightedPageRank(edges.toDF("src", "dst", "w"), 3)
        .as[(Long, Long)].collect().toMap
      assert(got == refWRank(edges, 3), s"seed $seed")
      // all-equal weights reduce to the unweighted recurrence
      val flat = edges.map { case (a, b, _) => (a, b, 1L) }
      val gotFlat = GraphOps.weightedPageRank(flat.toDF("src", "dst", "w"), 3)
        .as[(Long, Long)].collect().toMap
      val unw = GraphOps.pageRank(
        flat.map { case (a, b, _) => (a, b) }.toDF("src", "dst"), 3)
        .as[(Long, Long)].collect().toMap
      assert(gotFlat == unw, s"seed $seed uniform-weight equivalence")
    }
  }

  // --- star joins: in-memory exact-integer references ---------------

  private def cents(d: Double): Long = math.round(d * 100)

  private case class Fixture(
      region: DataFrame, nation: DataFrame, customer: DataFrame,
      supplier: DataFrame, orders: DataFrame, lineitem: DataFrame,
      li: Seq[(Long, Long, Long, Double, Double, Double, String)],
      ord: Seq[(Long, Long, String, String)],
      custNat: Map[Long, Long], custSeg: Map[Long, String],
      supNat: Map[Long, Long], natName: Map[Long, String],
      natRegion: Map[Long, Long], partRetail: Map[Long, Double])

  private def fixture(seed: Int): Fixture = {
    val rnd = new scala.util.Random(seed)
    val region = Seq((0L, "ASIA"), (1L, "EUROPE")).toDF("r_regionkey", "r_name")
    val natRegion = (0L to 4L).map(n => n -> (n % 2)).toMap
    val natName = (0L to 4L).map(n => n -> s"N_$n").toMap
    val nation = natRegion.toSeq.map { case (n, r) => (n, natName(n), r) }
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val custNat = (1L to 8L).map(c => c -> rnd.nextInt(5).toLong).toMap
    val custSeg = (1L to 8L).map(c =>
      c -> (if (rnd.nextBoolean()) "BUILDING" else "AUTO")).toMap
    val customer = custNat.toSeq.map { case (c, n) => (c, n, custSeg(c)) }
      .toDF("c_custkey", "c_nationkey", "c_mktsegment")
    val supNat = (1L to 6L).map(s => s -> rnd.nextInt(5).toLong).toMap
    val supplier = supNat.toSeq.toDF("s_suppkey", "s_nationkey")
    val partRetail = (1L to 5L).map(p =>
      p -> (rnd.nextInt(10000) / 100.0)).toMap
    val part = partRetail.toSeq.toDF("p_partkey", "p_retailprice")
    val dates = Seq("1995-06-01", "1996-03-01", "1996-09-01", "1997-02-01")
    val ord = (1L to 30L).map(o => (o, (rnd.nextInt(8) + 1).toLong,
      dates(rnd.nextInt(dates.size)), "P_" + rnd.nextInt(3)))
    val orders = ord.toDF("o_orderkey", "o_custkey", "d", "o_orderpriority")
      .selectExpr("o_orderkey", "o_custkey",
        "CAST(d AS TIMESTAMP_NTZ) AS o_orderdate", "o_orderpriority")
    val li = (1L to 90L).map { i =>
      val ship = dates(rnd.nextInt(dates.size))
      (i, (rnd.nextInt(30) + 1).toLong, (rnd.nextInt(6) + 1).toLong,
        rnd.nextInt(20000) / 100.0, rnd.nextInt(10) / 100.0,
        (rnd.nextInt(50) + 1).toDouble, ship)
    }.map { case (i, ok, sk, ext, disc, qty, ship) =>
      (i, ok, sk, ext, disc, qty, ship)
    }
    val lineitem = li.toDF("i", "l_orderkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity", "ship")
      .selectExpr("l_orderkey", "l_suppkey",
        "CAST(1 + (i % 5) AS BIGINT) AS l_partkey",
        "l_extendedprice", "l_discount", "l_quantity",
        "CAST(ship AS TIMESTAMP_NTZ) AS l_shipdate")
    Fixture(region, nation, customer, supplier, orders, lineitem,
      li, ord, custNat, custSeg, supNat, natName, natRegion, partRetail)
  }

  test("regionalRevenue matches the in-memory exact-integer reference") {
    for (seed <- 1 to 2) {
      val f = fixture(seed)
      val ordDate = f.ord.map(o => o._1 -> o._3).toMap
      val ordCust = f.ord.map(o => o._1 -> o._2).toMap
      val exp = f.li
        .filter { case (_, ok, sk, _, _, _, _) =>
          val d = ordDate(ok)
          d >= "1996-01-01" && d < "1997-01-01" &&
            f.custNat(ordCust(ok)) == f.supNat(sk) &&
            f.natRegion(f.custNat(ordCust(ok))) == 0L // ASIA
        }
        .groupBy { case (_, ok, _, _, _, _, _) =>
          f.natName(f.custNat(ordCust(ok))) }
        .map { case (n, rows) =>
          val rev = rows.map { case (_, _, _, ext, disc, _, _) =>
            cents(ext) * (100L - cents(disc)) }.sum
          (n, rev.toDouble / 10000.0, rows.size.toLong)
        }.toSet
      val got = DecisionSupport.regionalRevenue(f.region, f.nation,
          f.customer, f.supplier, f.orders, f.lineitem)
        .as[(String, Double, Long)].collect().toSet
      assert(got == exp, s"seed $seed")
    }
  }

  test("shippingPriority: top-k by exact revenue, deterministic tie-break") {
    val f = fixture(7)
    val cutoff = "1996-06-15"
    val ordOk = f.ord.filter(o => o._3 < cutoff &&
      f.custSeg(o._2) == "BUILDING").map(o => o._1 -> o).toMap
    val exp = f.li
      .filter { case (_, ok, _, _, _, _, ship) =>
        ship > cutoff && ordOk.contains(ok) }
      .groupBy(_._2)
      .map { case (ok, rows) =>
        val rev = rows.map { case (_, _, _, ext, disc, _, _) =>
          cents(ext) * (100L - cents(disc)) }.sum
        (ok, rev) }
      .toSeq.sortBy { case (ok, rev) => (-rev, ok) }.take(3)
      .map { case (ok, rev) => (ok, rev.toDouble / 10000.0) }
    val got = DecisionSupport.shippingPriority(f.customer, f.orders,
        f.lineitem, cutoff = cutoff, k = 3)
      .selectExpr("o_orderkey", "revenue")
      .as[(Long, Double)].collect().toSeq
    assert(got == exp)
  }

  test("fulfillmentLatency: hand-computed day delays and percentiles") {
    val orders = Seq((1L, "1-URGENT", "1996-01-01"), (2L, "1-URGENT", "1996-02-01"))
      .toDF("o_orderkey", "o_orderpriority", "d")
      .selectExpr("o_orderkey", "o_orderpriority",
        "CAST(d AS TIMESTAMP_NTZ) AS o_orderdate")
    // delays: 1, 3, 10 days (and a half-day rides down to the floor)
    val li = Seq((1L, "1996-01-02 12:00:00"), (1L, "1996-01-04"),
      (2L, "1996-02-11")).toDF("l_orderkey", "s")
      .selectExpr("l_orderkey", "CAST(s AS TIMESTAMP_NTZ) AS l_shipdate")
    val r = DecisionSupport.fulfillmentLatency(orders, li).collect()(0)
    assert(r.getAs[Long]("n_lines") == 3L)
    assert(r.getAs[Long]("min_days") == 1L)
    assert(r.getAs[Double]("p50_days") == 3.0)
    // p90 over [1,3,10]: rank 0.9*2 = 1.8 -> (1-0.8)*3 + 0.8*10 = 8.6
    // (the (1-g)*lo + g*hi form both engines interpolate with)
    assert(r.getAs[Double]("p90_days") == 0.2 * 3.0 + 0.8 * 10.0)
    assert(r.getAs[Long]("max_days") == 10L)
  }

  test("supplierHhi: equal shares give 1/n, single source gives 1") {
    val li = Seq(
      (1L, 1L, 5.0), (1L, 2L, 5.0), (1L, 3L, 5.0), (1L, 3L, 0.0), // equal thirds
      (2L, 9L, 7.0))                                              // single source
      .toDF("l_partkey", "l_suppkey", "l_quantity")
    val got = DecisionSupport.supplierHhi(li).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    assert(got(1L)._1 == 3L)
    assert(math.abs(got(1L)._2 - 1.0 / 3.0) < 1e-15)
    assert(got(2L) == ((1L, 1.0)))
  }

  test("discountElasticity: perfect anti-correlation and constant NULL") {
    val part = Seq((1L, "B1"), (2L, "B2")).toDF("p_partkey", "p_brand")
    // B1: qty falls exactly as discount rises -> r = -1 (chain-exact);
    // B2: constant discount -> NULL
    val li = Seq(
      (1L, 0.00, 10.0), (1L, 0.05, 5.0), (1L, 0.10, 0.0),
      (2L, 0.05, 3.0), (2L, 0.05, 7.0))
      .toDF("l_partkey", "l_discount", "l_quantity")
    val out = DecisionSupport.discountElasticity(part, li).collect()
      .map(r => r.getString(0) -> r).toMap
    val b1 = out("B1")
    // mirror the exact chain: x = 0,5,10; y = 1000,500,0 (cents)
    val (xs, ys) = (Seq(0L, 5L, 10L), Seq(1000L, 500L, 0L))
    val (n, sx, sy) = (3L, xs.sum, ys.sum)
    val (sxy, sxx, syy) = (xs.zip(ys).map { case (a, b) => a * b }.sum,
      xs.map(a => a * a).sum, ys.map(a => a * a).sum)
    val exp = (n * sxy - sx * sy).toDouble /
      (math.sqrt((n * sxx - sx * sx).toDouble) *
        math.sqrt((n * syy - sy * sy).toDouble))
    assert(b1.getAs[Double]("discount_qty_corr") == exp)
    assert(math.abs(exp + 1.0) < 1e-12)
    assert(out("B2").isNullAt(out("B2").fieldIndex("discount_qty_corr")))
  }

  test("returnRates: hand ppm floors per nation") {
    val sup = Seq((1L, 0L), (2L, 1L)).toDF("s_suppkey", "s_nationkey")
    val nat = Seq((0L, "N0"), (1L, "N1")).toDF("n_nationkey", "n_name")
    val li = Seq(
      (1L, "R", 1.00), (1L, "N", 2.00), (1L, "A", 1.00), // N0: 1/3 returned
      (2L, "N", 5.00))                                   // N1: none
      .toDF("l_suppkey", "l_returnflag", "l_extendedprice")
      .withColumn("l_discount", org.apache.spark.sql.functions.lit(0.0))
    val out = DecisionSupport.returnRates(sup, nat, li).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("N0") == ((3L, 1L, 333333L, 250000L)))
    assert(out("N1") == ((1L, 0L, 0L, 0L)))
  }

  test("nationMargin matches the in-memory exact-integer reference") {
    val f = fixture(11)
    val ordYear = f.ord.map(o => o._1 -> o._3.take(4).toLong).toMap
    val exp = f.li
      .filter { case (_, ok, _, _, _, _, _) => ordYear.contains(ok) }
      .groupBy { case (i, ok, sk, _, _, _, _) =>
        (f.natName(f.supNat(sk)), ordYear(ok)) }
      .map { case ((n, y), rows) =>
        val m = rows.map { case (i, _, _, ext, disc, qty, _) =>
          val retail = cents(f.partRetail(1L + (i % 5)))
          cents(ext) * (100L - cents(disc)) - retail * cents(qty) }.sum
        (n, y, m.toDouble / 10000.0, rows.size.toLong)
      }.toSet
    val part = f.partRetail.toSeq.toDF("p_partkey", "p_retailprice")
    val got = DecisionSupport.nationMargin(part, f.supplier, f.nation,
        f.orders, f.lineitem)
      .as[(String, Long, Double, Long)].collect().toSet
    assert(got == exp)
  }

  test("revenue bridge: the waterfall identity holds bit-for-bit") {
    def ship(m: Int) = java.sql.Timestamp.valueOf(f"2024-$m%02d-15 00:00:00")
    // part 1: month 1 (p=100c, q=10) -> month 2 (p=120c, q=8):
    // price = 20*10 = 200; volume = 100*(-2) = -200; joint = 20*(-2) = -40
    // delta = 120*8 - 100*10 = -40 = 200 - 200 - 40 ✓
    val li = Seq(
      (1L, 10.00, 10.0, ship(1)), (1L, 9.60, 8.0, ship(2)),
      // part 2 only in month 2 -> not in the common basket
      (2L, 5.00, 5.0, ship(2)))
      .toDF("l_partkey", "l_extendedprice", "l_quantity", "l_shipdate")
    val got = DecisionSupport.revenueBridge(li)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val m2 = 2024L * 12 + 2
    assert(got == Seq((m2, 1L, 200L, -200L, -40L, -40L)), s"got $got")
    val r = got.head
    assert(r._3 + r._4 + r._5 == r._6, "price+volume+joint == delta")
  }

  test("minCostSupplier: per-part minimum unit cents, ties kept, dups collapsed") {
    // part 1: supp 10 at 500c/u (two identical lines -> one row),
    //         supp 11 at 500c/u (tie kept), supp 12 at 600c/u (dropped)
    // part 2: supp 11 alone; floor(7.505*100)=750 div 2 = 375
    val li = Seq(
      (1L, 10L, 10.00, 2.0), (1L, 10L, 10.00, 2.0),
      (1L, 11L, 25.00, 5.0), (1L, 12L, 6.00, 1.0),
      (2L, 11L, 7.505, 2.0)
    ).toDF("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    val got = DecisionSupport.minCostSupplier(li)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 10L, 500L), (1L, 11L, 500L), (2L, 11L, 375L)))
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PageRank: exact equality with an in-memory integer reference on
  * random graphs, stationarity on symmetric cycles, hand-computed
  * star values, teleport floor for dangling-only nodes. */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  /** In-memory mirror of the operator's exact integer recurrence. */
  private def refRank(edges: Seq[(Long, Long)], iters: Int,
                      base: Long = 1000000L): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var mass = nodes.map(_ -> base).toMap
    for (_ <- 1 to iters) {
      val inc = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => mass(s) / deg(s) }.sum
      }
      mass = nodes.map(n => n -> (15L * base / 100L +
        85L * inc.getOrElse(n, 0L) / 100L)).toMap
    }
    mass
  }

  private def run(edges: Seq[(Long, Long)], iters: Int) =
    GraphOps.pageRank(edges.toDF("src", "dst"), iters)
      .as[(Long, Long)].collect().toMap

  test("random directed graphs match the in-memory integer reference") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(120)(
        (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
        .filter { case (a, b) => a != b }.distinct
      assert(run(edges, 3) == refRank(edges, 3))
    }
  }

  test("symmetric cycle is stationary at base mass") {
    val cyc = Seq[(Long, Long)](1L -> 2L, 2L -> 3L, 3L -> 1L)
    assert(run(cyc, 4).values.toSet == Set(1000000L))
  }

  test("star: hand-computed one-round values") {
    // center 0 <-> leaves 1,2,3 (bidirectional)
    val edges = (1L to 3L).flatMap(l => Seq(0L -> l, l -> 0L))
    val r = run(edges, 1)
    assert(r(0L) == 150000L + 85L * 3000000L / 100L)      // 2,700,000
    assert(r(1L) == 150000L + 85L * (1000000L / 3L) / 100L) // 433,333
  }

  test("node with no in-edges keeps only teleport mass") {
    val r = run(Seq(7L -> 8L), 2)
    assert(r(7L) == 150000L)
  }

  test("purchase graph is bidirectional and namespaced") {
    val orders = Seq((1L, 10L), (2L, 11L)).toDF("o_orderkey", "o_custkey")
    val li = Seq((1L, 500L), (2L, 500L)).toDF("l_orderkey", "l_suppkey")
    val e = GraphOps.purchaseGraph(orders, li)
      .as[(Long, Long)].collect().toSet
    assert(e == Set((101L, 5002L), (111L, 5002L), (5002L, 101L), (5002L, 111L)))
  }

  test("copartComponents: part families from pair support, threshold respected") {
    // parts 1-2 co-occur in 3 orders (edge), 2-3 in 3 orders (edge ->
    // {1,2,3} one family via transitivity), 4-5 in 3 orders (second
    // family), 1-4 only once (below minOrders=3 -> no bridge)
    val li = (
      Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L), (12L, 1L), (12L, 2L)) ++
      Seq((13L, 2L), (13L, 3L), (14L, 2L), (14L, 3L), (15L, 2L), (15L, 3L)) ++
      Seq((20L, 4L), (20L, 5L), (21L, 4L), (21L, 5L), (22L, 4L), (22L, 5L)) ++
      Seq((30L, 1L), (30L, 4L))
    ).toDF("l_orderkey", "l_partkey")
    val out = GraphOps.copartComponents(li, minOrders = 3L)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L))
  }

  test("hits: hand star — the shared authority dominates, hubs rank by reach") {
    import org.apache.spark.sql.functions.col
    // customers 1,2 both buy from supplier 10; customer 2 also from 11.
    // a1(10) gets both hubs -> max; a1(11) only hub 2.
    val edges = Seq((1L, 10L), (2L, 10L), (2L, 11L)).toDF("src", "dst")
    val out = GraphOps.hits(edges, iters = 1)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // h1 raw: h(1)=a0(10)=1e6, h(2)=a0(10)+a0(11)=2e6 -> norm: 500000, 1e6
    assert(out(1L) == ((1L, 500000L, 0L)))
    assert(out(2L) == ((2L, 1000000L, 0L)))
    // a1 raw: a(10)=h(1)+h(2)=1.5e6, a(11)=h(2)=1e6 -> norm: 1e6, 666666
    assert(out(10L) == ((10L, 0L, 1000000L)))
    assert(out(11L) == ((11L, 0L, 666666L)))
  }

  test("personalized pagerank: mass stays seed-local; seed keeps teleport") {
    import org.apache.spark.sql.functions.col
    // two components: 1<->2 (seeded at 1) and 3<->4 (unseeded)
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L)).toDF("src", "dst")
    val out = GraphOps.personalizedPageRank(edges, Seq(1L).toDF("node"),
        iters = 2).as[(Long, Long)].collect().toMap
    // the unseeded component never earns mass
    assert(!out.contains(3L) && !out.contains(4L))
    // hand-unroll: r0 = (1e6, 0); r1: inc(2)=1e6, inc(1)=0 ->
    //   m1 = 150000, m2 = 850000; r2: inc(1)=850000, inc(2)=150000 ->
    //   m1 = 150000 + 722500 = 872500, m2 = 127500
    assert(out == Map(1L -> 872500L, 2L -> 127500L), s"got $out")
  }

  test("bfsHops: hand path graph — first-reach levels, bound respected") {
    // 1→2→3→4→5→6 chain plus shortcut 1→4: hop(4)=1 via the shortcut,
    // never 3 via the chain; maxHops=2 leaves 6 (shortest hop 3) out
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (1L, 4L)).toDF("src", "dst")
    val out = GraphOps.bfsHops(edges, Seq(1L).toDF("node"), maxHops = 2)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L, 5L -> 2L))
  }

  test("bfsHops: random graphs match an in-memory BFS reference") {
    val rnd = new scala.util.Random(77)
    for (trial <- 1 to 3) {
      val n = 12 + trial * 4
      val edges = Seq.fill(n * 2)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      val seeds = Seq.fill(2)(rnd.nextInt(n).toLong).distinct
      val maxHops = 4
      // reference: level-synchronous BFS over an adjacency map
      val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var dist = seeds.map(_ -> 0L).toMap
      var frontier = seeds.toSet
      for (d <- 1 to maxHops) {
        val next = frontier.flatMap(adj.getOrElse(_, Nil))
          .filterNot(dist.contains)
        dist = dist ++ next.map(_ -> d.toLong)
        frontier = next
      }
      val got = GraphOps.bfsHops(edges.toDF("src", "dst"),
          seeds.toDF("node"), maxHops)
        .as[(Long, Long)].collect().toMap
      assert(got == dist, s"trial $trial: $got vs $dist")
    }
  }

  test("bfsHops: multi-source min distance; exhausted frontier is a no-op") {
    // sources {1, 5} on the same chain: node 3 is hop 2 from 1 AND
    // hop 2 is not offered from 5 (no back edges) — distances are the
    // min over sources; depth 4 > eccentricity exercises empty rounds
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("src", "dst")
    val out = GraphOps.bfsHops(edges,
        Seq(1L, 5L).toDF("node"), maxHops = 4)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 6L -> 1L, 3L -> 2L))
  }
}

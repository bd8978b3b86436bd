package graft.operators

import graft.SparkSpec

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("funnel: order enforced, window cutoff honored, depth counted") {
    // u1 completes all 3 in order; u2's click PRECEDES its view (must
    // not count) and its purchase follows the view (skipping a stage
    // never counts); u3's click lands past the 24h window; u4 never
    // views (absent from the report).
    val ev = Seq(
      (1L, 1L, ts(100L), "view"), (1L, 2L, ts(200L), "click"), (1L, 3L, ts(300L), "purchase"),
      (2L, 4L, ts(50L), "click"), (2L, 5L, ts(100L), "view"), (2L, 6L, ts(200L), "purchase"),
      (3L, 7L, ts(0L), "view"), (3L, 8L, ts(90000L), "click"),
      (4L, 9L, ts(10L), "purchase"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Analytics.funnel(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(4), r.isNullAt(2), r.isNullAt(3)))).toMap
    assert(out(1L) == ((3L, false, false)))
    assert(out(2L) == ((1L, true, true)), "click-before-view must not advance")
    assert(out(3L) == ((1L, true, true)), "25h click is outside the window")
    assert(!out.contains(4L), "users without stage 1 are absent")
  }

  test("funnel: tied stage timestamps resolve by min; same-instant does not advance") {
    // view and click at the SAME microsecond: click is not strictly
    // after view -> depth 1. A later click advances.
    val ev = Seq(
      (1L, 1L, ts(100L), "view"), (1L, 2L, ts(100L), "click"),
      (2L, 3L, ts(100L), "view"), (2L, 4L, ts(101L), "click"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Analytics.funnel(ev, Seq("view", "click")).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(1L) == 1L && out(2L) == 2L)
  }

  test("retentionCohorts: cohort by first week, distinct users per offset") {
    val day = 86400L
    // u1 first on day 0 (cohort week 0), active again day 8 (offset 1)
    // twice (distinct-counted once); u2 first on day 7 (cohort week 1).
    val ev = Seq(
      (1L, 1L, ts(0L)), (1L, 2L, ts(8L * day)), (1L, 3L, ts(8L * day + 100L)),
      (2L, 4L, ts(7L * day)))
      .toDF("user_id", "event_id", "ts")
    val out = Analytics.retentionCohorts(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // ts(0) = epoch -> day 0 -> cohort week 0; day 7 -> cohort week 1
    assert(out((0L, 0L)) == 1L && out((0L, 1L)) == 1L)
    assert(out((1L, 0L)) == 1L)
    assert(out.size == 3)
  }

  test("scd2: consecutive repeats compress, intervals chain, current row open") {
    val ev = Seq(
      (1L, 1L, ts(10L), "scheduled"), (1L, 2L, ts(20L), "scheduled"),
      (1L, 3L, ts(30L), "live"), (1L, 4L, ts(40L), "finished"),
      (2L, 5L, ts(10L), "live"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Analytics.scd2(ev).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getTimestamp(2).getTime, Option(r.getTimestamp(3)).map(_.getTime),
          r.getBoolean(4)))).toMap
    // repeat at ts 20 compressed away; intervals chain with no gaps
    assert(out((1L, "scheduled")) == ((10000L, Some(30000L), false)))
    assert(out((1L, "live")) == ((30000L, Some(40000L), false)))
    assert(out((1L, "finished")) == ((40000L, None, true)))
    assert(out((2L, "live")) == ((10000L, None, true)))
    assert(out.size == 4)
  }

  test("scd2: re-entering a state opens a NEW interval (history, not latest)") {
    val ev = Seq(
      (1L, 1L, ts(10L), "a"), (1L, 2L, ts(20L), "b"), (1L, 3L, ts(30L), "a"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val rows = Analytics.scd2(ev).collect()
    assert(rows.length == 3, "a -> b -> a is three intervals")
    assert(rows.count(_.getBoolean(4)) == 1, "exactly one current row per key")
  }

  test("eventPaths: lag over (ts, event_id) counts consecutive transitions only") {
    val ev = Seq(
      (1L, 1L, ts(10L), "view"), (1L, 2L, ts(20L), "click"), (1L, 3L, ts(30L), "view"),
      (2L, 4L, ts(10L), "view"), (2L, 5L, ts(20L), "click"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Analytics.eventPaths(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out(("view", "click")) == ((2L, 2L)))
    assert(out(("click", "view")) == ((1L, 1L)))
    assert(out.size == 2, "cross-user pairs must not appear")
  }

  test("ntileBuckets: equal depths, ordered disjoint bounds, tie determinism") {
    val orders = (1L to 40L).map(k => (k, "O", (k % 4).toDouble))  // heavy ties
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
    val out = Analytics.ntileBuckets(orders, n = 4).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .sortBy(_._1)
    assert(out.map(_._2._1).toSeq == Seq(10L, 10L, 10L, 10L), "equal depths")
    // bucket value ranges never decrease across buckets
    val bounds = out.map(_._2)
    bounds.sliding(2).foreach { case Array((_, _, hi), (_, lo, _)) =>
      assert(lo >= hi || lo >= bounds.head._2, s"overlapping buckets: $bounds")
    }
    // deterministic under repartition (ties broken by order key)
    val again = Analytics.ntileBuckets(orders.repartition(7), n = 4).collect()
      .map(_.toSeq).sortBy(_.toString).toSeq
    assert(again == Analytics.ntileBuckets(orders, n = 4).collect()
      .map(_.toSeq).sortBy(_.toString).toSeq)
  }

  test("funnelLatency: delays measured stage1->stage2, non-converters absent") {
    val ev = Seq(
      (1L, 1L, ts(0L), "view"), (1L, 2L, ts(60L), "click"),            // 60s, depth 2
      (2L, 3L, ts(0L), "view"), (2L, 4L, ts(120L), "click"),
      (2L, 5L, ts(180L), "purchase"),                                  // 120s, depth 3
      (3L, 6L, ts(0L), "view"))                                        // never converts
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Analytics.funnelLatency(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(4)))).toMap
    assert(out(2L) == ((1L, 60000000.0, 60000000L)))
    assert(out(3L) == ((1L, 120000000.0, 120000000L)))
    assert(out.size == 2, "depth-1 users carry no conversion delay")
  }

  test("countAnomalies: planted spike flags, steady traffic and short baselines do not") {
    val hour = 3600L
    // type "a": 30 hours of 10 events, then one hour of 100 (spike),
    // then 10 again. Steady hours must NOT flag (noisy-free baseline:
    // zero variance and zero deviation -> strict > fails); the first
    // hours (baseline < 8) must not flag either.
    val rows = ((0 until 30).flatMap(h => (0 until 10).map(i =>
        (h.toLong * 10 + i, ts(h * hour + i), "a"))) ++
      (0 until 100).map(i => (1000L + i, ts(30 * hour + i), "a")) ++
      (0 until 10).map(i => (2000L + i, ts(31 * hour + i), "a")))
      .map { case (id, t, ty) => (1L, id, t, ty) }
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Analytics.countAnomalies(rows).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(30L) == ((100L, 24L, true)), s"spike must flag: ${out.get(30L)}")
    assert(!out(29L)._3 && !out(15L)._3, "steady hours must not flag")
    assert(!out(0L)._3 && !out(5L)._3, "short-baseline hours must not flag")
    // the hour AFTER the spike: baseline now contains the spike ->
    // variance is huge -> returning to 10 must not flag
    assert(!out(31L)._3, "post-spike normal hour must not flag")
  }

  test("periodOverPeriod: lag skips absent weeks within the group, first week null") {
    val day = 86400L
    // type a: weeks 0 and 2 (week 1 absent -> week 2's prev is week 0's
    // total, not a gap-filled zero); type b: single week.
    val ev = Seq(
      (1L, 1L, ts(0L), 1.00, "a"), (2L, 2L, ts(day), 2.00, "a"),
      (3L, 3L, ts(15L * day), 4.00, "a"),
      (4L, 4L, ts(0L), 9.00, "b"))
      .toDF("user_id", "event_id", "ts", "value", "event_type")
    val out = Analytics.periodOverPeriod(ev).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    assert(out(("a", 0L)) == ((300L, None)))
    assert(out(("a", 2L)) == ((400L, Some(300L))))
    assert(out(("b", 0L)) == ((900L, None)))
    assert(out.size == 3)
  }

  test("twap: duration weighting beats tick counting; null ticks excluded") {
    // u1 holds 1.00 for 9s then 10.00 for 1s: tick mean 4.00 cents=400,
    // TWAP = (100*9 + 1000*1)/10 = 190 cents. The null-valued tick in
    // the middle is not an observation. u2 has one valued event -> no
    // interval -> absent.
    val ev = Seq[(Long, Long, java.sql.Timestamp, Option[Double])](
      (1L, 1L, ts(0L), Some(1.00)), (1L, 2L, ts(5L), None),
      (1L, 3L, ts(9L), Some(10.00)), (1L, 4L, ts(10L), Some(2.00)),
      (2L, 5L, ts(0L), Some(7.00)))
      .toDF("user_id", "event_id", "ts", "value")
    val out = Analytics.twap(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((3L, 10000000L, 190L)), s"got ${out.get(1L)}")
    assert(!out.contains(2L), "a single observation has no holding period")
  }

  test("resampleDaily: gaps filled forward, per-day latest wins, leading nulls stay null") {
    val day = 86400L
    // u1: day 0 two events (latest value 2.00 wins), day 1 no events
    // (filled 200), day 2 a NULL-value event (fill keeps 200).
    val ev = Seq(
      (1L, 1L, ts(10L), Some(1.00)), (1L, 2L, ts(20L), Some(2.00)),
      (1L, 3L, ts(2L * day), None),
      // u2: first event has NULL value -> filled stays NULL that day
      (2L, 4L, ts(0L), None), (2L, 5L, ts(day), Some(5.00)))
      .toDF("user_id", "event_id", "ts", "value")
    val out = Analytics.resampleDaily(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(out((1L, 0L)) == ((2L, Some(200L))))
    assert(out((1L, 1L)) == ((0L, Some(200L))), "gap day forward-fills")
    assert(out((1L, 2L)) == ((1L, Some(200L))), "null event does not overwrite the fill")
    assert(out((2L, 0L)) == ((1L, None)), "no value yet -> NULL")
    assert(out((2L, 1L)) == ((1L, Some(500L))))
    assert(out.size == 5)
  }

  test("funnelReport: stage counts and step conversion ppm") {
    // 4 viewers, 2 click within the window, 1 purchases
    val ev = Seq(
      (1L, 1L, ts(0L), "view"), (1L, 2L, ts(10L), "click"), (1L, 3L, ts(20L), "purchase"),
      (2L, 4L, ts(0L), "view"), (2L, 5L, ts(10L), "click"),
      (3L, 6L, ts(0L), "view"),
      (4L, 7L, ts(0L), "view"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Analytics.funnelReport(ev)
      .as[(Long, String, Long, Option[Long])].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, "view", 4L, Some(1000000L)),
      (2L, "click", 2L, Some(500000L)),
      (3L, "purchase", 1L, Some(500000L))), s"got $out")
  }

  test("retentionRates: cells normalized to cohort size in ppm") {
    val wk = 7L * 86400L
    // cohort week 0 has 2 users; one returns at offset 1 → 500000 ppm
    val ev = Seq(
      (1L, 1L, ts(0L)), (2L, 2L, ts(0L)), (1L, 3L, ts(wk)))
      .toDF("user_id", "event_id", "ts")
    val out = Analytics.retentionRates(ev)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._2).toSeq
    assert(out == Seq((0L, 0L, 2L, 2L, 1000000L), (0L, 1L, 1L, 2L, 500000L)),
      s"got $out")
  }

  test("newVsReturning: weekly actives split by first-seen week") {
    val wk = 7L * 86400L
    val ev = Seq(
      (1L, 1L, ts(0L)), (2L, 2L, ts(0L)),            // week 0: 2 new
      (1L, 3L, ts(wk)), (3L, 4L, ts(wk)),            // week 1: 1 ret + 1 new
      (1L, 5L, ts(wk + 10L)))                        // same week dedupes
      .toDF("user_id", "event_id", "ts")
    val out = Analytics.newVsReturning(ev)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((0L, 2L, 0L), (1L, 1L, 1L)), s"got $out")
  }

  test("reachCurve: first-seen weeks, cumulative total") {
    val wk = 7L * 86400L
    val ev = Seq(
      (1L, 1L, ts(0L)), (1L, 2L, ts(2L * wk)),  // u1 first in week 0
      (2L, 3L, ts(wk)), (3L, 4L, ts(wk)),        // u2,u3 first in week 1
      (4L, 5L, ts(2L * wk)))                     // u4 first in week 2
      .toDF("user_id", "event_id", "ts")
    val out = Analytics.reachCurve(ev)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((0L, 1L, 1L), (1L, 2L, 3L), (2L, 1L, 4L)), s"got $out")
  }

  test("benford: first significant digit of exact cents, ppm shares") {
    val orders = Seq(1.00, 19.99, 2.50, 0.95).toDF("o_totalprice")
    // cents: 100, 1999, 250, 95 → digits 1, 1, 2, 9
    val out = Analytics.benford(orders)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(("1", 2L, 500000L, 301030L),
      ("2", 1L, 250000L, 176091L), ("9", 1L, 250000L, 45757L)), s"got $out")
  }

  test("audienceOverlap: jaccard ppm, zero-overlap pairs absent, duplicates collapse") {
    val ev = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), (3L, "a"), // dup membership collapses
      (2L, "b"), (3L, "b"),
      (4L, "c"))
      .map { case (u, t) => (u, 1L, ts(0L), t) }
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Analytics.audienceOverlap(ev)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    // (a,b): shared {2,3}=2, union 3 → 666666 ppm; (a,c)/(b,c) share none
    assert(out == Seq(("a", "b", 2L, 3L, 2L, 666666L)), s"got $out")
  }

  test("touchAttribution: first/last endpoints over the total order") {
    val ev = Seq(
      (1L, 1L, ts(0L), "ad"), (1L, 2L, ts(50L), "view"), (1L, 3L, ts(90L), "buy"),
      (2L, 4L, ts(10L), "organic"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Analytics.touchAttribution(ev)
      .as[(String, String, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(("ad", "buy", 1L), ("organic", "organic", 1L)), s"got $out")
  }

  test("topMovers: largest |WoW delta| wins, ties to the smaller type") {
    val wk = 7L * 86400L
    val ev = Seq(
      // x: 1.00 → 6.00 (Δ +500); y: 9.00 → 1.00 (Δ −800) → y wins week 1
      (1L, 1L, ts(0L), "x", 1.00), (1L, 2L, ts(wk), "x", 6.00),
      (2L, 3L, ts(0L), "y", 9.00), (2L, 4L, ts(wk), "y", 1.00),
      // z ties x's |Δ| exactly (+500): still y's week; in week 2 only
      // w and z move, same |Δ| → lexicographically smaller 'w' wins
      (3L, 5L, ts(wk), "z", 1.00), (3L, 6L, ts(2L * wk), "z", 6.00),
      (4L, 7L, ts(wk), "w", 6.00), (4L, 8L, ts(2L * wk), "w", 1.00))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val out = Analytics.topMovers(ev)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, "y", -800L), (2L, "w", -500L)), s"got $out")
  }

  test("basketPairs: canonical pairs, support floor, hand-computed lift") {
    // orders: {1,2} ×3, {1,3} ×1 — pair (1,2) has support 3,
    // (1,3) falls under minSupport; duplicate line items collapse.
    val li = Seq(
      (10L, 1L), (10L, 2L), (10L, 2L),
      (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 2L),
      (13L, 1L), (13L, 3L))
      .toDF("l_orderkey", "l_partkey")
    val out = Analytics.basketPairs(li, minSupport = 3L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // lift = ((3·10⁶ div 4)·4) div 3 = 750000·4 div 3 = 1000000
    assert(out == Seq((1L, 2L, 3L, 4L, 3L, 1000000L)), s"got $out")
  }

  test("rfm: quintile scores over total orders, composed segment code") {
    // customer i places i orders of $i on day i → every dimension
    // ranks customers 1..5 identically, so segment = i·111
    val day = 86400L
    val orders = (1L to 5L).flatMap(i => (1L to i).map(_ =>
      (i, i.toDouble, ts(i * day))))
      .toDF("o_custkey", "o_totalprice", "o_orderdate")
    val out = Analytics.rfm(orders)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    out.zipWithIndex.foreach { case (r, idx) =>
      val i = idx + 1L
      assert(r == ((i, 5L - i, i, i * i * 100L, i, i, i, i * 111L)), s"cust $i: $r")
    }
  }

  test("cohortRevenue: cents per (cohort week, offset) cell") {
    val wk = 7L * 86400L
    val orders = Seq(
      (1L, 1.00, ts(0L)), (1L, 2.00, ts(wk)),   // c1 cohort week 0
      (2L, 3.00, ts(wk)))                        // c2 cohort week 1
      .toDF("o_custkey", "o_totalprice", "o_orderdate")
    val out = Analytics.cohortRevenue(orders)
      .as[(Long, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq((0L, 0L, 1L, 1L, 100L), (0L, 1L, 1L, 1L, 200L),
      (1L, 0L, 1L, 1L, 300L)), s"got $out")
  }

  test("punchcard: epoch-arithmetic weekday/hour cells") {
    // epoch 0 is Thursday 00:00 → (0+3)%7 = 3; four days later is
    // Monday → 0; 90000s = 1d + 1h → hour 1.
    val ev = Seq(
      (1L, 1L, ts(0L)), (2L, 2L, ts(4L * 86400L)),
      (3L, 3L, ts(90000L)), (1L, 4L, ts(30L)))
      .toDF("user_id", "event_id", "ts")
    val out = Analytics.punchcard(ev)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq((0L, 0L, 1L, 1L), (3L, 0L, 2L, 1L), (4L, 1L, 1L, 1L)),
      s"got $out")
  }

  test("revenueConcentration: deterministic deciles, exact ppm shares") {
    // 10 customers spending 1..10 dollars: one per decile, total 55.00
    val orders = (1L to 10L).map(i => (i, i.toDouble))
      .toDF("o_custkey", "o_totalprice")
    val out = Analytics.revenueConcentration(orders)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out.map(_._2).forall(_ == 1L), "one customer per decile")
    assert(out.map(_._3) == (1L to 10L).map(_ * 100L), "cents ascend with decile")
    assert(out.last._4 == 1000L * 1000000L / 5500L, "top share = 1000·10⁶ div 5500")
    assert(out.map(_._4).sum <= 1000000L, "floor shares never exceed unity")
  }

  test("sessionDepthHistogram: depth counts and exact cents mass") {
    // u1: events at 0 and 100 (one session, depth 2, 3.00 total);
    // u2: one event (depth 1, 1.25); u1's event at 10000 starts a NEW
    // session (gap > 30min) of depth 1.
    val ev = Seq(
      (1L, 1L, ts(0L), 1.75), (1L, 2L, ts(100L), 1.25),
      (2L, 3L, ts(0L), 1.25),
      (1L, 4L, ts(10000L), 2.00))
      .toDF("user_id", "event_id", "ts", "value")
    val out = Analytics.sessionDepthHistogram(ev)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 2L, 325L), (2L, 1L, 300L)), s"got $out")
  }

  test("peakConcurrency: interval sweep peak, first achiever, session census") {
    // u1 session [0,1000]; u2 [500,1500]; u3 [1000,1000]; u4 splits on
    // the >30min gap into [0,0] and [10000,10000]. Peak 3 first at
    // t=1000 (u1 end-inclusive, u2 mid-span, u3 point session).
    val ev = Seq(
      (1L, 1L, ts(0L)), (1L, 2L, ts(1000L)),
      (2L, 3L, ts(500L)), (2L, 4L, ts(1500L)),
      (3L, 5L, ts(1000L)),
      (4L, 6L, ts(0L)), (4L, 7L, ts(10000L)))
      .map { case (u, e, t) => (u, e, t, 1.00) }
      .toDF("user_id", "event_id", "ts", "value")
    val out = Analytics.peakConcurrency(ev)
      .as[(Long, Long, Option[Long])].collect().toSeq
    assert(out == Seq((5L, 3L, Some(1000L * 1000000L))), s"got $out")
    // input partitioning must not change the sweep result
    val re = Analytics.peakConcurrency(ev.repartition(7))
      .as[(Long, Long, Option[Long])].collect().toSeq
    assert(re == out)
  }

  test("peakConcurrency: inclusive ends — a session starting at another's end overlaps") {
    // u1 [0,100], u2 [100,200]: at t=100 both are active (+1 orders
    // before −1 at the tied instant), so the peak is 2, not 1.
    val ev = Seq(
      (1L, 1L, ts(0L)), (1L, 2L, ts(100L)),
      (2L, 3L, ts(100L)), (2L, 4L, ts(200L)))
      .map { case (u, e, t) => (u, e, t, 1.00) }
      .toDF("user_id", "event_id", "ts", "value")
    val out = Analytics.peakConcurrency(ev)
      .as[(Long, Long, Option[Long])].collect().toSeq
    assert(out == Seq((2L, 2L, Some(100L * 1000000L))), s"got $out")
  }

  test("abTest: counts match a hand assignment; z composes the same double chain") {
    // 8 users, conversion bar = 2 purchases
    val ev = (1L to 8L).flatMap { u =>
      val purchases = if (u % 3 == 0L) 2L else 1L
      (1L to purchases).map(i => (u, u * 10 + i, ts(u * 100 + i), "purchase", Some(1.0)))
    }.toDF("user_id", "event_id", "ts", "event_type", "value")
    val r = Analytics.abTest(ev, minCount = 2L).collect()(0)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val armOf = (1L to 8L).map { u =>
      u -> (if (md5hex(u.toString) <
        "80000000000000000000000000000000") "A" else "B")
    }.toMap
    val conv = (1L to 8L).filter(_ % 3 == 0L).toSet
    val na = armOf.count(_._2 == "A").toLong
    val ca = armOf.count { case (u, a) => a == "A" && conv(u) }.toLong
    val nb = 8L - na
    val cb = conv.size.toLong - ca
    assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("conv_a") == ca)
    assert(r.getAs[Long]("n_b") == nb && r.getAs[Long]("conv_b") == cb)
    val (pa, pb) = (ca.toDouble / na, cb.toDouble / nb)
    val p = (ca + cb).toDouble / (na + nb)
    val z = (pa - pb) / math.sqrt((p * (1.0 - p)) * ((1.0 / na) + (1.0 / nb)))
    assert(r.getAs[Double]("z_score") == z)
  }

  test("abTest: degenerate pooled rate reports NULL z, never a 0/0") {
    val ev = (1L to 4L).map(u => (u, u, ts(u), "purchase", Some(1.0)))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    // bar of 1 -> every user converts -> pooled p = 1
    val all = Analytics.abTest(ev, minCount = 1L).collect()(0)
    assert(all.isNullAt(all.fieldIndex("z_score")))
    // bar of 9 -> nobody converts -> pooled p = 0
    val none = Analytics.abTest(ev, minCount = 9L).collect()(0)
    assert(none.isNullAt(none.fieldIndex("z_score")))
  }

  test("decaySpark: recursive CTE reproduces the in-memory floor recurrence") {
    // two types, 3 weeks each, exact dyadic cents
    val ev = Seq(
      (1L, 1L, ts(0L * 604800 + 10), "view", Some(10.00)),
      (2L, 2L, ts(1L * 604800 + 10), "view", Some(4.00)),
      (3L, 3L, ts(2L * 604800 + 10), "view", Some(1.00)),
      (4L, 4L, ts(0L * 604800 + 10), "click", Some(7.00)))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    ev.createOrReplaceTempView("events")
    val got = Analytics.decaySpark(spark)
      .select("event_type", "week", "decayed_cents")
      .as[(String, Long, Long)].collect().toSet
    // view: s0=1000; s1=(9*1000)/10+400=1300; s2=(9*1300)/10+100=1270
    assert(got == Set(("view", 0L, 1000L), ("view", 1L, 1300L),
      ("view", 2L, 1270L), ("click", 0L, 700L)))
  }

  test("chiSquare: hand 2x2 table in exact ppm; independent table reads 0") {
    def fixture(counts: Seq[(String, String, Int)]) = {
      val custs = counts.zipWithIndex.map { case ((seg, _, _), i) =>
        (i.toLong + 1L, seg) }
      val orders = counts.zipWithIndex.flatMap { case ((_, st, k), i) =>
        (1 to k).map(j => (i.toLong * 100 + j, i.toLong + 1L, st)) }
      (orders.toDF("o_orderkey", "o_custkey", "o_orderstatus"),
        custs.toDF("c_custkey", "c_mktsegment"))
    }
    // cells: (A,O)=10 (A,F)=20 (B,O)=30 (B,F)=40 -> N=100
    val (o1, c1) = fixture(Seq(("A", "O", 10), ("A", "F", 20),
      ("B", "O", 30), ("B", "F", 40)))
    val r = Analytics.chiSquare(o1, c1).collect()(0)
    assert(r.getAs[Long]("n_orders") == 100L && r.getAs[Long]("dof") == 1L)
    // per cell: num = (o*N - r*c)^2, den = N*r*c; terms in floor-ppm
    val cells = Seq((10L, 30L, 40L), (20L, 30L, 60L),
      (30L, 70L, 40L), (40L, 70L, 60L))
    val expPpm = cells.map { case (o, rr, cc) =>
      val num = (o * 100L - rr * cc) * (o * 100L - rr * cc)
      val den = 100L * rr * cc
      (num / den) * 1000000L + ((num % den) * 1000000L) / den
    }.sum
    assert(r.getAs[Long]("chi2_ppm") == expPpm)
    // perfectly independent table: every term exactly 0
    val (o2, c2) = fixture(Seq(("A", "O", 10), ("A", "F", 10),
      ("B", "O", 20), ("B", "F", 20)))
    assert(Analytics.chiSquare(o2, c2).collect()(0)
      .getAs[Long]("chi2_ppm") == 0L)
  }

  test("orderPercentiles: hand percent_rank/cume_dist with a tie") {
    val o = Seq((1L, "O", 1.00), (2L, "O", 2.00), (3L, "O", 2.00),
      (4L, "O", 5.00), (9L, "F", 7.00))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
    val got = EventOps.orderPercentiles(o).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(3), r.getDouble(4)))).toMap
    // O group (n=4): ranks 1,2,2,4 -> pct (r-1)/3; cume k/4 with ties
    assert(got(1L) == ((0.0, 0.25)))
    assert(got(2L) == ((1.0 / 3, 0.75)) && got(3L) == ((1.0 / 3, 0.75)))
    assert(got(4L) == ((1.0, 1.0)))
    assert(got(9L) == ((0.0, 1.0)), "singleton group")
  }

  test("orderGaps: hand day gaps; single-order customers absent") {
    val o = Seq((1L, 5L, "1996-01-01"), (2L, 5L, "1996-01-03"),
      (3L, 5L, "1996-01-10"), (4L, 8L, "1996-06-01"))
      .toDF("o_orderkey", "o_custkey", "d")
      .selectExpr("o_orderkey", "o_custkey",
        "CAST(d AS TIMESTAMP_NTZ) AS o_orderdate")
    val got = EventOps.orderGaps(o).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(got(5L) == ((2L, 2L, 4.5, 7L)), "gaps 2 and 7 -> median 4.5")
    assert(!got.contains(8L), "one order, no gap")
  }

  test("lorenzCurve: hand deciles, monotone shares ending at exactly 1e6 ppm") {
    val orders = (1L to 4L).map(i => (i, i, i * 1.00))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    // cents 100,200,300,400 (total 1000) into 2 buckets: {100,200},{300,400}
    val out = Analytics.lorenzCurve(orders, buckets = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 300000L), (2L, 4L, 1000000L)))
  }

  test("giniRevenue: equal spend reads 0, total concentration reads (n-1)/n") {
    def orders(cents: Seq[Long]) = cents.zipWithIndex.map { case (c, i) =>
      (i.toLong + 1L, i.toLong + 1L, c / 100.0) }
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val eq = Analytics.giniRevenue(orders(Seq(500L, 500L, 500L, 500L)))
      .collect()(0)
    assert(eq.getAs[Double]("gini") == 0.0)
    val conc = Analytics.giniRevenue(orders(Seq(0L, 0L, 0L, 1000L)))
      .collect()(0)
    // all mass at the top: G = 2*4*1000/(4*1000) - 5/4 = 0.75
    assert(conc.getAs[Double]("gini") == 0.75)
    val one = Analytics.giniRevenue(orders(Seq(700L))).collect()(0)
    assert(one.isNullAt(one.fieldIndex("gini")), "n<2 undefined")
  }

  test("dailyTrend: exact line y=2x+300 recovers slope, intercept, r2=1") {
    // one type, days 0..4 with cents following the line exactly:
    // value dollars chosen so ROUND(value*100) = 300 + 200*x
    val ev = (0 to 4).map { d =>
      (1L, d.toLong + 1L, ts(d.toLong * 86400L + 5L), "view",
        Some((300 + 200 * d) / 100.0))
    }.toDF("user_id", "event_id", "ts", "event_type", "value")
    val r = Analytics.dailyTrend(ev).collect()(0)
    assert(r.getAs[String]("event_type") == "view")
    assert(r.getAs[Long]("n") == 5L)
    assert(r.getAs[Double]("slope") == 200.0)
    assert(r.getAs[Double]("intercept") == 300.0)
    assert(r.getAs[Double]("r2") == 1.0)
  }

  test("dailyTrend: single-day and constant-y series degrade to NULLs") {
    val ev = Seq(
      (1L, 1L, ts(5L), "view", Some(1.0)),     // one day only
      (1L, 2L, ts(5L), "click", Some(2.0)),    // constant y across days
      (1L, 3L, ts(86405L), "click", Some(2.0)))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val rows = Analytics.dailyTrend(ev).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val v = rows("view")
    assert(v.isNullAt(v.fieldIndex("slope")) && v.isNullAt(v.fieldIndex("r2")))
    val c = rows("click")
    assert(c.getAs[Double]("slope") == 0.0, "flat line has slope 0")
    assert(c.isNullAt(c.fieldIndex("r2")), "constant y has undefined r2")
  }

  test("cusumDaily: level shift peaks at the changepoint; flat series reads zero") {
    import java.sql.Timestamp
    // two days at 5.00 then two at 1.00: x = [500,500,100,100] cents,
    // n=4, s=1200; cusum_scaled = 4*cx - idx*1200 = [800,1600,800,0]
    // -> the peak flags day 2, the true shift boundary
    def o(day: Int, price: Double) =
      (day.toLong, Timestamp.valueOf(f"1995-01-0$day 10:00:00"), price)
    val orders = Seq(o(1, 5.0), o(2, 5.0), o(3, 1.0), o(4, 1.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val out = Analytics.cusumDaily(orders)
      .as[(java.sql.Date, Long, Long, Boolean)].collect().sortBy(_._1.getTime)
    assert(out.map(_._3).toSeq == Seq(800L, 1600L, 800L, 0L))
    assert(out.map(_._4).toSeq == Seq(false, true, false, false))
    // flat series: every centered sum is exactly zero, all peak-flagged
    val flat = Seq(o(1, 2.0), o(2, 2.0), o(3, 2.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val f = Analytics.cusumDaily(flat)
      .as[(java.sql.Date, Long, Long, Boolean)].collect()
    assert(f.forall(r => r._3 == 0L && r._4))
  }
}

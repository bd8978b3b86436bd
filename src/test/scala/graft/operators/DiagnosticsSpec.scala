package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** Specs for the ops-diagnostics reports: watermark-delay lateness
  * profile and join-key skew profile. */
class DiagnosticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  test("latenessProfile: running-max lateness is per-key and bucketed by bit width") {
    // user 1 arrival (by event_id): ts 1000, 5000, 2000, 5000
    //   lateness: 0, 0, 3000, 0  -> bits: 1,1,12,1
    // user 2: ts 100, 50 -> lateness 0, 50 -> bits 1, 6
    val events = Seq(
      (1L, 1L, ts(1000)), (2L, 1L, ts(5000)), (3L, 1L, ts(2000)),
      (4L, 1L, ts(5000)), (5L, 2L, ts(100)), (6L, 2L, ts(50)))
      .toDF("event_id", "user_id", "ts")
    val out = EventOps.latenessProfile(events).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((4L, 0L, 0L)))        // four on-time events
    assert(out(6L) == ((1L, 50L, 50L)))      // 50 ms -> 6 bits
    assert(out(12L) == ((1L, 3000L, 3000L))) // 3000 ms -> 12 bits
    assert(out.keySet == Set(1L, 6L, 12L))
  }

  test("keySkewProfile: a hot key lands alone in the top bucket") {
    val rows = (1 to 100).map(i => (i.toLong, 999L)) ++   // hot key: 100 rows
      (1 to 6).map(i => (100L + i, i.toLong))             // six singletons
    val df = rows.toDF("event_id", "user_id")
    val out = EventOps.keySkewProfile(df, "user_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((6L, 6L, 1L)))        // count 1 -> 1 bit
    assert(out(7L) == ((1L, 100L, 100L)))    // count 100 -> 7 bits
    assert(out.keySet == Set(1L, 7L))
  }

  test("columnProfile: nulls counted, distincts exclude nulls, kinds slot correctly") {
    val df = Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "b", 2.5), (2L, "a", 2.5), (3L, null, 7.0), (null, "a", null))
      .toDF("id", "tag", "v")
    val out = Stats.columnProfile(df, Seq(
        "id" -> Stats.NumCol, "tag" -> Stats.StrCol, "v" -> Stats.NumCol))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("id", "tag", "v"))
    val id = out("id")
    assert(id.getLong(1) == 4L && id.getLong(2) == 1L && id.getLong(3) == 3L)
    assert(id.getDouble(4) == 1.0 && id.getDouble(5) == 3.0)
    assert(id.isNullAt(6) && id.isNullAt(8), "non-kind slots stay null")
    val tag = out("tag")
    assert(tag.getLong(2) == 1L && tag.getLong(3) == 2L)
    assert(tag.getString(6) == "a" && tag.getString(7) == "b")
    assert(tag.isNullAt(4) && tag.isNullAt(5))
    val v = out("v")
    assert(v.getLong(2) == 1L && v.getLong(3) == 2L, "distinct excludes nulls")
    assert(v.getDouble(4) == 2.5 && v.getDouble(5) == 7.0)
  }

  test("rollingWindow: peers share the frame, gaps shrink it, cents exact") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // user 1: events at t=0 (two peers), t=1800, t=5400 (t=0 pair aged out)
    val df = Seq(
      (1L, 10L, ts(0L), 1.00), (1L, 11L, ts(0L), 2.00),
      (1L, 12L, ts(1800L), 4.00), (1L, 13L, ts(5400L), 8.00),
      (2L, 20L, ts(0L), 0.50))
      .toDF("user_id", "event_id", "ts", "value")
    val out = EventOps.rollingWindow(df).collect()
      .map(r => r.getLong(1) -> ((r.getDouble(3), r.getLong(4)))).toMap
    // peers at the same instant see each other (RANGE, not ROWS)
    assert(out(10L) == ((3.0, 2L)) && out(11L) == ((3.0, 2L)))
    assert(out(12L) == ((7.0, 3L)))
    // t=5400: frame [1800, 5400] keeps only events 12 and 13
    assert(out(13L) == ((12.0, 2L)))
    assert(out(20L) == ((0.5, 1L)), "users never see each other")
  }

  test("columnProfile: single scan — one leaf relation in the plan") {
    val df = (0L until 100L).map(i => (i, s"s${i % 10}")).toDF("a", "b")
    val prof = Stats.columnProfile(df, Seq("a" -> Stats.NumCol, "b" -> Stats.StrCol))
    // the profile must not re-scan per column: exactly one leaf node
    val leaves = prof.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.length == 1, s"expected single-scan profile, got ${leaves.length} leaves")
    assert(prof.count() == 2L)
  }
}

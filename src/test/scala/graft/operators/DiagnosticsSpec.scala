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
}

package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of: latest version at-or-before; unmatched rows drop; ties inclusive") {
    val events = Seq(
      (1L, ts("2026-01-01 10:00:00"), "e-early"),   // before any version → drops
      (1L, ts("2026-01-01 12:00:00"), "e-mid"),     // == v1 ts → matches v1 (inclusive)
      (1L, ts("2026-01-01 15:00:00"), "e-late"),    // after v2 → matches v2
      (2L, ts("2026-01-01 12:00:00"), "other-key")) // no versions for key 2 → drops
      .toDF("user_id", "ts", "tag")
    val versions = Seq(
      (1L, ts("2026-01-01 12:00:00"), 100L, "v1"),
      (1L, ts("2026-01-01 14:00:00"), 200L, "v2"))
      .toDF("user_id", "vts", "ver_id", "name")
    val out = AsOf.join(events, versions, "user_id", "ts", "vts", "ver_id")
      .select("tag", "name").as[(String, String)].collect().toMap
    assert(out == Map("e-mid" -> "v1", "e-late" -> "v2"))
  }

  test("as-of: duplicate version timestamps resolve to the newest tie-break") {
    val events = Seq((1L, ts("2026-01-01 13:00:00"), "e")).toDF("user_id", "ts", "tag")
    val versions = Seq(
      (1L, ts("2026-01-01 12:00:00"), 100L, "old-dup"),
      (1L, ts("2026-01-01 12:00:00"), 200L, "new-dup"))
      .toDF("user_id", "vts", "ver_id", "name")
    val out = AsOf.join(events, versions, "user_id", "ts", "vts", "ver_id")
      .select("name").as[String].collect()
    assert(out.toSeq == Seq("new-dup"))
  }

  test("forward as-of: nearest following version, equal ts included, trailing drops") {
    val events = Seq(
      (1L, ts("2026-01-01 10:00:00"), "e-early"),   // before v1 → matches v1
      (1L, ts("2026-01-01 12:00:00"), "e-eq"),      // == v1 ts → matches v1 (>= incl.)
      (1L, ts("2026-01-01 13:00:00"), "e-mid"),     // between v1 and v2 → matches v2
      (1L, ts("2026-01-01 15:00:00"), "e-late"),    // after all versions → drops
      (2L, ts("2026-01-01 12:00:00"), "other-key")) // no versions for key 2 → drops
      .toDF("user_id", "ts", "tag")
    val versions = Seq(
      (1L, ts("2026-01-01 12:00:00"), 100L, "v1"),
      (1L, ts("2026-01-01 14:00:00"), 200L, "v2"))
      .toDF("user_id", "vts", "ver_id", "name")
    val out = AsOf.joinForward(events, versions, "user_id", "ts", "vts", "ver_id")
      .select("tag", "name").as[(String, String)].collect().toMap
    assert(out == Map("e-early" -> "v1", "e-eq" -> "v1", "e-mid" -> "v2"))
  }

  test("nearest as-of: closest either side, exact tie backward, keyless drops") {
    val events = Seq(
      (1L, ts("2026-01-01 10:00:00"), "e-before"),  // only v1 ahead → forward
      (1L, ts("2026-01-01 12:00:00"), "e-eq"),      // == v1 → backward, lag 0
      (1L, ts("2026-01-01 13:00:00"), "e-tie"),     // 1h to v1, 1h to v2 → backward
      (1L, ts("2026-01-01 13:30:00"), "e-near-v2"), // 30min to v2 → forward
      (1L, ts("2026-01-01 15:00:00"), "e-after"),   // only v2 behind → backward
      (2L, ts("2026-01-01 12:00:00"), "other-key")) // no versions → drops
      .toDF("user_id", "ts", "tag")
    val versions = Seq(
      (1L, ts("2026-01-01 12:00:00"), 100L, "v1"),
      (1L, ts("2026-01-01 14:00:00"), 200L, "v2"))
      .toDF("user_id", "vts", "ver_id", "name")
    val out = AsOf.joinNearest(events, versions, "user_id", "ts", "vts", "ver_id")
      .select("tag", "name", "matched_dir", "lag_us")
      .as[(String, String, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("e-before") == (("e-before", "v1", "forward", 7200000000L)))
    assert(out("e-eq") == (("e-eq", "v1", "backward", 0L)))
    assert(out("e-tie") == (("e-tie", "v1", "backward", -3600000000L)))
    assert(out("e-near-v2") == (("e-near-v2", "v2", "forward", 1800000000L)))
    assert(out("e-after") == (("e-after", "v2", "backward", -3600000000L)))
    assert(!out.contains("other-key"))
  }
}

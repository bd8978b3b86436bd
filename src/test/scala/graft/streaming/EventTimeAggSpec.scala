package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Watermark semantics: in-order and tolerably-late rows count; rows
  * later than the watermark delay are dropped once their window closed. */
class EventTimeAggSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling append-mode agg finalizes windows at the watermark and drops late rows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val out = EventTimeAgg.tumbling(
      mem.toDF().toDF("ts", "event_type", "value"), delay = "5 seconds")
    val q = out.writeStream.format("memory").queryName("wm_agg")
      .outputMode("append").start()
    try {
      mem.addData(
        (ts("2026-01-01 00:00:10"), "click", 1.0),
        (ts("2026-01-01 00:00:40"), "click", 2.0))
      q.processAllAvailable()
      // advance watermark past 00:01:00 + 5s → first window finalizes
      mem.addData((ts("2026-01-01 00:01:30"), "click", 4.0))
      q.processAllAvailable()
      // this row belongs to the already-finalized first window → dropped
      mem.addData((ts("2026-01-01 00:00:50"), "click", 100.0))
      q.processAllAvailable()
      // close the second window too
      mem.addData((ts("2026-01-01 00:03:00"), "click", 8.0))
      q.processAllAvailable()

      val rows = spark.table("wm_agg")
        .select("window_start", "n", "total_value")
        .as[(Timestamp, Long, Double)].collect().toSet
      assert(rows.contains((ts("2026-01-01 00:00:00"), 2L, 3.0)),
        s"first window must hold only the pre-watermark rows, got $rows")
      assert(rows.contains((ts("2026-01-01 00:01:00"), 1L, 4.0)))
      assert(!rows.exists(_._3 == 103.0), "late row leaked into a closed window")
    } finally q.stop()
  }

  test("session windows merge gap-adjacent events and close at the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val out = EventTimeAgg.sessionized(
      mem.toDF().toDF("ts", "user_id", "value"), gap = "30 seconds")
    val q = out.writeStream.format("memory").queryName("sess_agg")
      .outputMode("append").start()
    try {
      // user 1: two events 10s apart → one session; user 2: solo event
      mem.addData(
        (ts("2026-01-01 00:00:00"), 1L, 1.0),
        (ts("2026-01-01 00:00:10"), 1L, 2.0),
        (ts("2026-01-01 00:00:05"), 2L, 5.0))
      q.processAllAvailable()
      // silence > gap, then a new burst for user 1 → prior sessions close
      mem.addData((ts("2026-01-01 00:02:00"), 1L, 8.0))
      q.processAllAvailable()
      mem.addData((ts("2026-01-01 00:05:00"), 9L, 0.0)) // push watermark → close all
      q.processAllAvailable()

      val rows = spark.table("sess_agg")
        .select("user_id", "session_start", "session_end", "n_events", "total_value")
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
      assert(rows.contains((1L, ts("2026-01-01 00:00:00"), ts("2026-01-01 00:00:40"), 2L, 3.0)),
        s"user 1's first burst must merge into one session ending gap after last event, got $rows")
      assert(rows.contains((1L, ts("2026-01-01 00:02:00"), ts("2026-01-01 00:02:30"), 1L, 8.0)),
        s"user 1's second burst must be a separate session, got $rows")
      assert(rows.contains((2L, ts("2026-01-01 00:00:05"), ts("2026-01-01 00:00:35"), 1L, 5.0)))
    } finally q.stop()
  }

  test("streaming dedup: duplicate keys within the watermark emit once") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val out = EventTimeAgg.deduplicate(
      mem.toDF().toDF("event_id", "ts", "payload"), Seq("event_id"))
    val q = out.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, ts("2026-01-01 00:00:01"), "first"),
        (1L, ts("2026-01-01 00:00:02"), "dup"),
        (2L, ts("2026-01-01 00:00:03"), "other"))
      q.processAllAvailable()
      mem.addData((1L, ts("2026-01-01 00:00:04"), "dup-again"))
      q.processAllAvailable()
      val rows = spark.table("dedup_stream")
        .select("event_id", "payload").as[(Long, String)].collect()
      assert(rows.count(_._1 == 1L) == 1, s"duplicate leaked: ${rows.toSeq}")
      assert(rows.exists(_._1 == 2L))
    } finally q.stop()
  }
}

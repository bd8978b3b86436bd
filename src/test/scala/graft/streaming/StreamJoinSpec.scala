package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Stream–stream interval join semantics: matches inside the window,
  * nothing outside it, append emission once both watermarks pass. */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("interval join matches within the window and not outside it") {
    implicit val sqlCtx = spark.sqlContext
    val signups = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val out = StreamJoin.intervalJoin(
      signups.toDF().toDF("user_id", "signup_ts"),
      clicks.toDF().toDF("user_id", "click_ts", "click_id"),
      key = "user_id", leftTs = "signup_ts", rightTs = "click_ts",
      window = "10 minutes")
    val q = out.writeStream.format("memory").queryName("sj")
      .outputMode("append").start()
    try {
      signups.addData((1L, ts("2026-01-01 00:00:00")), (2L, ts("2026-01-01 00:00:00")))
      clicks.addData(
        (1L, ts("2026-01-01 00:05:00"), "in_window"),      // +5 min → match
        (1L, ts("2026-01-01 00:20:00"), "after_window"),   // +20 min → no match
        (2L, ts("2025-12-31 23:55:00"), "before_signup"),  // −5 min → no match
        (3L, ts("2026-01-01 00:01:00"), "no_signup"))      // key never signed up
      q.processAllAvailable()
      // advance both watermarks far past every candidate pair
      signups.addData((99L, ts("2026-01-01 02:00:00")))
      clicks.addData((99L, ts("2026-01-01 02:00:00"), "wm"))
      q.processAllAvailable()

      val rows = spark.table("sj").select("user_id", "click_id")
        .as[(Long, String)].collect().toSet
      assert(rows == Set((1L, "in_window"), (99L, "wm")),
        s"expected only the in-window pairs, got $rows")
    } finally q.stop()
  }
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream–stream interval join on APPEND streams — the
  * native Structured Streaming join the engine's changelog MV cannot
  * use (updating inputs, see SURVEY §2.4) but the reference's
  * append-only event stream (`kinesis_events`, flink-gen.sh:94-110)
  * composes naturally: correlate each left event with right events in
  * a bounded event-time window after it (impression→click,
  * signup→activity — the funnel join).
  *
  * Why the time bound is load-bearing at 100 TB/day: the watermarks
  * plus the two-sided range condition let Spark expire join state for
  * both inputs — rows older than (watermark − window) can never match
  * again and are dropped from the state store, so state tracks the
  * window, not the stream. An unbounded stream-stream equi-join would
  * accrete forever.
  */
object StreamJoin {

  /** Inner interval join: rows (l, r) with equal `key` and
    * `r.rightTs ∈ [l.leftTs, l.leftTs + window]`. Column names must be
    * disjoint apart from `key` (the right key is coalesced away).
    * Append output: each matched pair emits exactly once, when both
    * watermarks pass it. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   window: String = "10 minutes",
                   leftDelay: String = "5 seconds",
                   rightDelay: String = "5 seconds"): DataFrame = {
    val l = left.withWatermark(leftTs, leftDelay)
    val r = right.withWatermark(rightTs, rightDelay)
      .withColumnRenamed(key, s"__r_$key")
    l.join(r,
        col(key) === col(s"__r_$key") &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"interval $window"))
      .drop(s"__r_$key")
  }
}

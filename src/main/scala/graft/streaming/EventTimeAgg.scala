package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked event-time aggregation — the reference's watermark
  * machinery (`WATERMARK FOR purchased_at AS purchased_at - INTERVAL
  * '3' SECOND`, tickets-cdc.sql:30,50; 5 s for movies/users/events).
  *
  * The reference's own aggregate is unwindowed (SURVEY §2.6), so state
  * never expires there; this operator is the windowed form the
  * watermark exists for — with the watermark bounding state: windows
  * older than (max event time − delay) are finalized and dropped, which
  * is what makes an event-time aggregation run forever at 100 TB/day
  * instead of accreting state.
  */
object EventTimeAgg {

  /** Tumbling-window count/sum per event type with bounded
    * out-of-orderness. Append mode emits each window once, when the
    * watermark passes its end (the reference's early-fire variant is
    * the same query in update mode — CdcPipeline's per-trigger MV). */
  def tumbling(events: DataFrame, tsCol: String = "ts",
               delay: String = "5 seconds",
               window_ : String = "1 minute"): DataFrame =
    events
      .withWatermark(tsCol, delay)                       // tickets-cdc.sql:30 analog
      .groupBy(window(col(tsCol), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("total_value"))

  /** Event-time session windows: activity bursts per key separated by
    * ≥`gap` of silence, the streaming form of the batch sessionization
    * query (`EventOps.sessionize` / `q_sessionize`). Spark's native
    * `session_window` keeps one merging window per (key, open session)
    * in the state store and the watermark closes sessions whose gap has
    * conclusively elapsed — state is bounded by ACTIVE sessions only,
    * which is what lets per-user sessionization run indefinitely at
    * 100 TB/day (a batch window-over-sort would need the whole history).
    * Append mode emits each session exactly once, when it closes. */
  def sessionized(events: DataFrame, gap: String = "30 seconds",
                  tsCol: String = "ts", keyCol: String = "user_id",
                  delay: String = "5 seconds"): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))

  /** Streaming exact dedup on an append stream — the Paimon
    * `'merge-engine'='deduplicate'` sink for at-least-once inputs
    * (reference `flink-gen.sh:118-142`): first occurrence per key wins;
    * the watermark bounds dedup state so it drains instead of accreting
    * (duplicates later than the delay are out of contract). For
    * changelog (updating) inputs use `Upsert.materializeStream` —
    * latest-wins, unbounded keys — instead. */
  def deduplicate(events: DataFrame, keys: Seq[String],
                  tsCol: String = "ts", delay: String = "5 seconds"): DataFrame =
    events.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keys)
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch surface for interactive-scale analytics: HyperLogLog++
  * distinct counts and quantile sketches — the algorithms a 100 TB
  * dashboard query runs instead of exact aggregation (one pass, fixed
  * memory, mergeable across partitions; both are Spark built-ins and
  * deterministic for a given dataset).
  *
  * Correctness surface follows the ANN-recall-gate pattern: a sketch's
  * raw output has no cross-engine oracle (HLL registers are
  * implementation-defined), so the driver-checkable view is a one-row
  * accuracy verdict against the exact aggregate computed in the same
  * query.
  */
object Sketches {

  /** Per-hour approximate distinct users next to the exact count —
    * the sketch-backed variant of
    * [[EventOps.distinctAgg]]'s COUNT(DISTINCT). */
  def approxDistinctByHour(events: DataFrame, rsd: Double = 0.02): DataFrame =
    events.groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))

  /** One-row sketch-accuracy gate: HLL++ distinct count and
    * approx_percentile p50/p99 must land within `relErr` of their exact
    * counterparts. */
  def accuracyGate(events: DataFrame, relErr: Double = 0.05): DataFrame =
    events.agg(
        approx_count_distinct(col("user_id"), 0.02).as("__ad"),
        countDistinct(col("user_id")).as("__ed"),
        expr("approx_percentile(value, 0.5, 1000)").as("__a50"),
        expr("percentile(value, 0.5)").as("__e50"),
        expr("approx_percentile(value, 0.99, 1000)").as("__a99"),
        expr("percentile(value, 0.99)").as("__e99"))
      .select(
        (abs(col("__ad") - col("__ed")).cast("double")
          <= lit(relErr) * col("__ed")).as("distinct_ok"),
        (abs(col("__a50") - col("__e50"))
          <= lit(relErr) * abs(col("__e50"))).as("p50_ok"),
        (abs(col("__a99") - col("__e99"))
          <= lit(relErr) * abs(col("__e99"))).as("p99_ok"))
}

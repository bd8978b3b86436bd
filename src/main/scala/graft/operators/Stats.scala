package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Moment-based statistical aggregates (variance, stddev, correlation)
  * with cross-engine-exact results — the data-profiling surface a
  * curation pipeline runs over numeric columns.
  *
  * Spark's own `var_samp`/`corr` accumulate doubles in partition order,
  * so their last ulp depends on the partitioning (and never matches
  * another engine). Here every moment (Σx, Σx², Σxy) is an EXACT
  * decimal sum — per-row casts to DECIMAL(12,2), products exact in
  * decimal, order-independent integer-style aggregation — and only the
  * final closed-form expression runs in double, as one fixed
  * left-to-right chain of correctly-rounded IEEE ops (×, −, ÷, √) that
  * both engines evaluate identically. Same determinism rule as the
  * rest of the engine (TextOps header): exact integers/decimals in,
  * one rounded chain out.
  *
  * Scale shape: a single partial+final hash aggregate — six decimal
  * cells per group move through the exchange, nothing else.
  */
object Stats {

  /** Per-group dispersion + correlation profile of two money/quantity
    * columns: n, means, sample variance/stddev of `xCol`, and
    * Pearson r between `xCol` and `yCol`. Groups with n ≤ 1 yield
    * NULL variance (0/0 guarded on both engines identically). */
  def profile(df: DataFrame, groupCol: String, xCol: String,
              yCol: String): DataFrame = {
    val x = col(xCol).cast(DecimalType(12, 2))
    val y = col(yCol).cast(DecimalType(12, 2))
    val g = df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast("double").as("sx"),
        sum(y).cast("double").as("sy"),
        sum(x * x).cast("double").as("sxx"),
        sum(y * y).cast("double").as("syy"),
        sum(x * y).cast("double").as("sxy"))
    val n = col("n").cast("double")
    val varX = (n * col("sxx") - col("sx") * col("sx")) / (n * (n - 1.0))
    val covTerm = n * col("sxy") - col("sx") * col("sy")
    // guard on the RADICANDS, not the roots: a zero-variance group can
    // round its radicand to a tiny negative double, whose sqrt is NaN —
    // and NaN passes a `=!= 0.0` test, leaking NaN into corr_xy (and
    // leaving the oracle match hostage to DuckDB producing the same
    // NaN). Positive radicands make both sqrt calls well-defined.
    val radX = n * col("sxx") - col("sx") * col("sx")
    val radY = n * col("syy") - col("sy") * col("sy")
    g.select(
      col(groupCol), col("n"),
      (col("sx") / n).as("mean_x"),
      (col("sy") / n).as("mean_y"),
      when(col("n") > 1, varX).as("var_x"),
      when(col("n") > 1, sqrt(varX)).as("std_x"),
      when(col("n") > 1 && radX > 0.0 && radY > 0.0,
        covTerm / sqrt(radX) / sqrt(radY)).as("corr_xy"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: each left row matches the single right row
  * with the greatest `rightTs <= leftTs` for the same key — the
  * standard event↔versioned-dimension enrichment (a CDC changelog like
  * the reference's naturally yields such versioned dimensions).
  *
  * Spark has no ASOF JOIN; per the engine's preference order this is
  * option (a), composed from built-ins: union both sides tagged, one
  * shuffle+sort by (key, ts, side), and a running last-observed-right
  * window carries each right version forward to the left rows it
  * covers. Cost: a single exchange of |L|+|R| rows and a partition
  * sort — the same lower bound a dedicated sort-merge as-of exec pays;
  * a custom SparkPlan would save only the tag/carry column overhead,
  * not a shuffle, which is why the composed form is kept.
  *
  * Inner semantics (unmatched left rows drop, like DuckDB's
  * `ASOF JOIN`). Right rows are deduplicated to one version per
  * (key, ts) — newest by `rightTieBreak` — so the match is total and
  * engine-independent.
  */
object AsOf {

  def join(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String, rightTieBreak: String): DataFrame = {
    val rightCols = right.columns.filterNot(_ == key).toSeq
    // one version per (key, ts): newest tie-break wins
    val r1 = graft.cdc.Upsert.latestByKey(
      right, Seq(key, rightTs), Seq(rightTieBreak))
    val taggedRight = r1.select(
      col(key).as("__k"), col(rightTs).as("__ts"), lit(0).as("__side"),
      struct(rightCols.map(col): _*).as("__r"))
    val leftCols = left.columns.toSeq
    val taggedLeft = left.select(
      col(key).as("__k"), col(leftTs).cast("timestamp").as("__ts"), lit(1).as("__side"),
      struct(leftCols.map(col): _*).as("__l"))
    // right row sorts before a left row at equal ts → `<=` semantics
    val w = Window.partitionBy("__k")
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = taggedLeft.select(col("__k"), col("__ts"), col("__side"),
        col("__l"), lit(null).cast(taggedRight.schema("__r").dataType).as("__r"))
      .unionByName(taggedRight.select(col("__k"), col("__ts"), col("__side"),
        lit(null).cast(taggedLeft.schema("__l").dataType).as("__l"), col("__r")))
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1 && col("__match").isNotNull)
      .select(col("__k").as(key) +:
        leftCols.filterNot(_ == key).map(c => col(s"__l.$c").as(c)) ++:
        rightCols.map(c => col(s"__match.$c").as(c)): _*)
  }

  /** NEAREST as-of (pandas `merge_asof(direction='nearest')`): each
    * left row matches the right row minimizing |rightTs − leftTs| for
    * the same key; exact ties between the last-earlier and first-later
    * version resolve BACKWARD (the smaller right ts — the
    * deterministic, engine-independent rule). Adds `matched_dir`
    * ('backward'/'forward') and the signed `lag_us` so the consumer
    * can audit the direction mix.
    *
    * Same composed shape as [[join]] — ONE tagged union, ONE exchange
    * + partition sort — with BOTH carries computed over the same sort
    * (a backward `last` and a forward `first` frame ride one
    * WindowExec): the nearest join costs exactly what the backward one
    * does. Same-ts right rows sort before the left row, so they land
    * in the backward carry at distance 0 and the tie rule picks them. */
  def joinNearest(left: DataFrame, right: DataFrame, key: String,
                  leftTs: String, rightTs: String,
                  rightTieBreak: String): DataFrame = {
    val rightCols = right.columns.filterNot(_ == key).toSeq
    val r1 = graft.cdc.Upsert.latestByKey(
      right, Seq(key, rightTs), Seq(rightTieBreak))
    val taggedRight = r1.select(
      col(key).as("__k"), col(rightTs).cast("timestamp").as("__ts"),
      lit(0).as("__side"), struct(rightCols.map(col): _*).as("__r"))
    val leftCols = left.columns.toSeq
    val taggedLeft = left.select(
      col(key).as("__k"), col(leftTs).cast("timestamp").as("__ts"),
      lit(1).as("__side"), struct(leftCols.map(col): _*).as("__l"))
    val ord = Window.partitionBy("__k").orderBy(col("__ts"), col("__side"))
    val wBack = ord.rowsBetween(Window.unboundedPreceding, 0)
    val wFwd = ord.rowsBetween(0, Window.unboundedFollowing)
    val carried = taggedLeft.select(col("__k"), col("__ts"), col("__side"),
        col("__l"), lit(null).cast(taggedRight.schema("__r").dataType).as("__r"))
      .unionByName(taggedRight.select(col("__k"), col("__ts"), col("__side"),
        lit(null).cast(taggedLeft.schema("__l").dataType).as("__l"), col("__r")))
      .withColumn("__back", last(col("__r"), ignoreNulls = true).over(wBack))
      .withColumn("__fwd", first(col("__r"), ignoreNulls = true).over(wFwd))
    val backDist =
      expr(s"unix_micros(__ts) - unix_micros(CAST(__back.$rightTs AS TIMESTAMP))")
    val fwdDist =
      expr(s"unix_micros(CAST(__fwd.$rightTs AS TIMESTAMP)) - unix_micros(__ts)")
    val useBack = col("__back").isNotNull &&
      (col("__fwd").isNull || backDist <= fwdDist)
    carried.filter(col("__side") === 1 &&
        (col("__back").isNotNull || col("__fwd").isNotNull))
      .withColumn("__m", when(useBack, col("__back")).otherwise(col("__fwd")))
      .withColumn("matched_dir",
        when(useBack, lit("backward")).otherwise(lit("forward")))
      .withColumn("lag_us",
        expr(s"unix_micros(CAST(__m.$rightTs AS TIMESTAMP)) - unix_micros(__ts)"))
      .select(col("__k").as(key) +:
        leftCols.filterNot(_ == key).map(c => col(s"__l.$c").as(c)) ++:
        rightCols.map(c => col(s"__m.$c").as(c)) ++:
        Seq(col("matched_dir"), col("lag_us")): _*)
  }

  /** FORWARD as-of: each left row matches the single right row with the
    * smallest `rightTs >= leftTs` for the same key — the "next
    * scheduled/upcoming" enrichment mirroring [[join]]'s last-observed
    * one. Same composed shape (one tagged union, one exchange + sort),
    * with the window looking forward (`first` over
    * `[current, unbounded following)`) and the LEFT row sorting before
    * an equal-timestamp right row so `>=` includes ties. */
  def joinForward(left: DataFrame, right: DataFrame, key: String,
                  leftTs: String, rightTs: String, rightTieBreak: String): DataFrame = {
    val rightCols = right.columns.filterNot(_ == key).toSeq
    val r1 = graft.cdc.Upsert.latestByKey(
      right, Seq(key, rightTs), Seq(rightTieBreak))
    val taggedRight = r1.select(
      col(key).as("__k"), col(rightTs).as("__ts"), lit(1).as("__side"),
      struct(rightCols.map(col): _*).as("__r"))
    val leftCols = left.columns.toSeq
    val taggedLeft = left.select(
      col(key).as("__k"), col(leftTs).cast("timestamp").as("__ts"), lit(0).as("__side"),
      struct(leftCols.map(col): _*).as("__l"))
    // left row sorts before a right row at equal ts → `>=` semantics
    val w = Window.partitionBy("__k")
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(0, Window.unboundedFollowing)
    val carried = taggedLeft.select(col("__k"), col("__ts"), col("__side"),
        col("__l"), lit(null).cast(taggedRight.schema("__r").dataType).as("__r"))
      .unionByName(taggedRight.select(col("__k"), col("__ts"), col("__side"),
        lit(null).cast(taggedLeft.schema("__l").dataType).as("__l"), col("__r")))
      .withColumn("__match", first(col("__r"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 0 && col("__match").isNotNull)
      .select(col("__k").as(key) +:
        leftCols.filterNot(_ == key).map(c => col(s"__l.$c").as(c)) ++:
        rightCols.map(c => col(s"__match.$c").as(c)): _*)
  }
}

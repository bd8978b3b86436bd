package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Kinds [[columnProfile]] understands: numeric (min/max as DOUBLE),
    * string (min/max under binary collation), timestamp (min/max as
    * TIMESTAMP). Exact distinct counts — at lake scale swap
    * `approx_count_distinct`/the HLL gate in; the profile shape is
    * unchanged. */
  sealed trait ColKind
  case object NumCol extends ColKind
  case object StrCol extends ColKind
  case object TsCol extends ColKind

  /** Schema/data profile of a table: one row per profiled column with
    * `(col_name, n_rows, n_nulls, n_distinct, min_num, max_num,
    * min_str, max_str, min_ts, max_ts)` — the ingest-time report every
    * pipeline runs before trusting a new feed (null bursts, cardinality
    * cliffs, out-of-range values).
    *
    * Scale shape: ONE aggregate pass over the table (the multi-distinct
    * aggregates plan as Spark's Expand — k row-copies through one
    * partial+final agg, still a single scan), producing a single row;
    * the per-column long format explodes from that row driver-free.
    * Min/max/count are exact and engine-independent; no double
    * arithmetic happens (values are only compared, never combined). */
  def columnProfile(df: DataFrame, cols: Seq[(String, ColKind)]): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    // Spread the input across the session's parallelism before the
    // Expand: the k-way distinct multiplies every input partition by
    // (k+1), and a single-row-group parquet file otherwise runs the
    // whole expanded aggregate on ONE task (measured 3.1 s -> sub-1 s
    // at sf0.1). At real scale the scan already has many partitions
    // and this round-robin exchange moves each row once — noise next
    // to the Expand it parallelizes.
    val spread = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    val aggs = cols.flatMap { case (c, kind) =>
      Seq(count(col(c)).as(s"__cnt_$c"),
        countDistinct(col(c)).as(s"__nd_$c")) ++ (kind match {
        case NumCol => Seq(min(col(c)).cast("double").as(s"__min_$c"),
          max(col(c)).cast("double").as(s"__max_$c"))
        case StrCol => Seq(min(col(c)).cast("string").as(s"__min_$c"),
          max(col(c)).cast("string").as(s"__max_$c"))
        case TsCol => Seq(min(col(c)).cast("timestamp").as(s"__min_$c"),
          max(col(c)).cast("timestamp").as(s"__max_$c"))
      })
    }
    val row = spread.agg(count(lit(1)).as("__n"), aggs: _*)
    val nullNum = lit(null).cast("double")
    val nullStr = lit(null).cast("string")
    val nullTs = lit(null).cast("timestamp")
    val entries = cols.map { case (c, kind) =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        (if (kind == NumCol) col(s"__min_$c") else nullNum).as("min_num"),
        (if (kind == NumCol) col(s"__max_$c") else nullNum).as("max_num"),
        (if (kind == StrCol) col(s"__min_$c") else nullStr).as("min_str"),
        (if (kind == StrCol) col(s"__max_$c") else nullStr).as("max_str"),
        (if (kind == TsCol) col(s"__min_$c") else nullTs).as("min_ts"),
        (if (kind == TsCol) col(s"__max_$c") else nullTs).as("max_ts"))
    }
    row.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }

  /** Equi-WIDTH histogram of a money column — the distribution view
    * next to [[graft.operators.Analytics.ntileBuckets]]'s equi-depth
    * one: `nb` fixed-width value buckets between the global min and
    * max, each reporting its exact-cents population bounds and count.
    *
    * The bucket index is a pure integer floor division —
    * `(cents − min) · nb div (max − min + 1)` — so the assignment is
    * identical on any engine (no IEEE width arithmetic, no
    * `width_bucket` edge-semantics differences), always lands in
    * `[0, nb)`, and the top value never needs a clamp. The `+1` widens
    * the span so `cents = max` maps to `nb − 1` exactly.
    *
    * Scale shape: one (min, max) aggregate (driver-scalar, broadcast
    * back through a 1-row cross join), then one narrow scan + one
    * ≤ nb-row hash aggregate — the same two-pass shape as the IQR
    * fences. Empty input yields an empty histogram. */
  def histogram(orders: DataFrame, nb: Int = 20): DataFrame =
    centsHistogram(orders, "o_totalprice", nb)

  /** [[histogram]] generalized to any money column (the events
    * `value` stream gets the same distribution view as order
    * totals). */
  def centsHistogram(df: DataFrame, moneyCol: String, nb: Int = 20): DataFrame = {
    require(nb > 0, "histogram needs at least one bucket")
    val cents = expr(s"CAST(ROUND($moneyCol * 100) AS BIGINT)")
    val bounds = df.agg(min(cents).as("__lo"), max(cents).as("__hi"))
      .filter(col("__lo").isNotNull)
    // NULL money values carry no distribution information — drop them
    // (a tick without an observation, the TWAP rule)
    df.select(cents.as("__c")).filter(col("__c").isNotNull)
      .crossJoin(broadcast(bounds))
      .groupBy(expr(s"(__c - __lo) * $nb div (__hi - __lo + 1)").as("bucket"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("__c")).as("lo_cents"),
        max(col("__c")).as("hi_cents"),
        sum(col("__c")).as("sum_cents"))
  }

  /** Day-aligned lag-k autocorrelation of the per-type daily revenue
    * series: Pearson r between (yₜ, yₜ₊ₖ) from EXACT integer moments
    * (the [[Analytics.dailyTrend]] discipline — n, Σ, ΣΣ all BIGINT,
    * then one fixed +,−,×,÷,√ double chain both engines round
    * identically). Alignment is an equi-join on (type, day+k), so
    * calendar GAPS pair nothing — a row-lag window would silently
    * correlate across holes. Lags with <3 pairs or a constant side
    * report NULL. High lag-7 vs lag-1 flags weekly seasonality. */
  def autocorr(events: DataFrame, lags: Seq[Int] = Seq(1, 7)): DataFrame = {
    val day = expr("unix_micros(ts) div 86400000000L")
    val cents = expr("CAST(ROUND(value * 100) AS BIGINT)")
    val daily = events.filter(col("value").isNotNull)
      .select(col("event_type"), day.as("day"), cents.as("c"))
      .groupBy("event_type", "day").agg(sum(col("c")).as("y"))
    val lagDf = lags.foldLeft(Option.empty[DataFrame]) { (acc, k) =>
      val pairs = daily.as("l")
        .join(daily.as("r"),
          col("l.event_type") === col("r.event_type") &&
            col("l.day") + lit(k.toLong) === col("r.day"))
        .select(col("l.event_type").as("event_type"), lit(k.toLong).as("lag"),
          col("l.y").as("x"), col("r.y").as("yl"))
      Some(acc.fold(pairs)(_.unionByName(pairs)))
    }.get
    lagDf.groupBy("event_type", "lag")
      .agg(count(lit(1)).as("n_pairs"), sum(col("x")).as("sx"),
        sum(col("yl")).as("sy"), sum(expr("x * yl")).as("sxy"),
        sum(expr("x * x")).as("sxx"), sum(expr("yl * yl")).as("syy"))
      .select(col("event_type"), col("lag"), col("n_pairs"),
        expr("""CASE WHEN n_pairs < 3
               OR n_pairs * sxx - sx * sx = 0
               OR n_pairs * syy - sy * sy = 0 THEN NULL ELSE
               CAST(n_pairs * sxy - sx * sy AS DOUBLE) /
               (sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)) *
                sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE))) END""")
          .as("acf"))
      .orderBy("event_type", "lag")
  }

  /** Two-sample Kolmogorov–Smirnov drift statistic between the first
    * and second half of the event stream (split at the integer
    * midpoint day): D = max over the value axis of |F₁ − F₂|, carried
    * EXACTLY as max |cum₁·n₂ − cum₂·n₁| over integer cumulative
    * counts — the ECDFs never materialize as doubles, so the argmax
    * and the numerator are engine-identical; one final division
    * presents D. The cumulative counts ride [[Ids.prefixSums]] (range
    * exchange + bounded per-partition scan — never a single-reducer
    * window over the value axis, which is data-sized). Ties in the
    * max break toward the smallest value via the max-struct idiom.
    * This is the distribution-drift monitor for a money/metric column
    * — the numeric twin of the hashed-bigram [[TextOps.corpusDrift]]. */
  def ksDrift(events: DataFrame): DataFrame = {
    val day = expr("unix_micros(ts) div 86400000000L")
    val cents = expr("CAST(ROUND(value * 100) AS BIGINT)")
    val base = events.filter(col("value").isNotNull)
      .select(day.as("day"), cents.as("c"))
    val bounds = base.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val sided = base.crossJoin(broadcast(bounds))
      .select(col("c"),
        when(col("day") < expr("(lo + hi + 1) div 2"), 1L)
          .otherwise(0L).as("s1"),
        when(col("day") < expr("(lo + hi + 1) div 2"), 0L)
          .otherwise(1L).as("s2"))
    val perVal = sided.groupBy("c")
      .agg(sum(col("s1")).as("n1"), sum(col("s2")).as("n2"))
    val cum = Ids.prefixSums(perVal, Seq(col("c")), Seq("n1", "n2"))
    val tot = perVal.agg(sum(col("n1")).as("t1"), sum(col("n2")).as("t2"))
    cum.crossJoin(broadcast(tot))
      .select(col("t1"), col("t2"),
        expr("abs(cum_n1 * t2 - cum_n2 * t1)").as("dnum"), col("c"))
      .groupBy(col("t1"), col("t2"))
      .agg(max(struct(col("dnum"), (-col("c")).as("negc"))).as("m"))
      .select(col("t1").as("n1"), col("t2").as("n2"),
        col("m.dnum").as("d_num"), (-col("m.negc")).as("at_cents"),
        expr("""CAST(m.dnum AS DOUBLE) /
               (CAST(t1 AS DOUBLE) * CAST(t2 AS DOUBLE))""").as("ks"))
  }

  /** Per-event-type KS drift — [[ksDrift]] run independently for every
    * type over the same half split, riding [[Ids.prefixSumsGrouped]]
    * so no type's value axis ever funnels through one task. The
    * per-metric drift dashboard: one row per type with its own D,
    * argmax value, and sample sizes. */
  def ksDriftByType(events: DataFrame): DataFrame = {
    val day = expr("unix_micros(ts) div 86400000000L")
    val cents = expr("CAST(ROUND(value * 100) AS BIGINT)")
    val base = events.filter(col("value").isNotNull)
      .select(col("event_type"), day.as("day"), cents.as("c"))
    val bounds = base.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val sided = base.crossJoin(broadcast(bounds))
      .select(col("event_type"), col("c"),
        when(col("day") < expr("(lo + hi + 1) div 2"), 1L)
          .otherwise(0L).as("s1"),
        when(col("day") < expr("(lo + hi + 1) div 2"), 0L)
          .otherwise(1L).as("s2"))
    val perVal = sided.groupBy("event_type", "c")
      .agg(sum(col("s1")).as("n1"), sum(col("s2")).as("n2"))
    val cum = Ids.prefixSumsGrouped(perVal, Seq("event_type"),
      Seq(col("c")), Seq("n1", "n2"))
    val tot = perVal.groupBy("event_type")
      .agg(sum(col("n1")).as("t1"), sum(col("n2")).as("t2"))
    cum.join(broadcast(tot), "event_type")
      .select(col("event_type"), col("t1"), col("t2"),
        expr("abs(cum_n1 * t2 - cum_n2 * t1)").as("dnum"), col("c"))
      .groupBy(col("event_type"), col("t1"), col("t2"))
      .agg(max(struct(col("dnum"), (-col("c")).as("negc"))).as("m"))
      .select(col("event_type"), col("t1").as("n1"), col("t2").as("n2"),
        col("m.dnum").as("d_num"), (-col("m.negc")).as("at_cents"),
        expr("""CASE WHEN t1 = 0 OR t2 = 0 THEN NULL ELSE
               CAST(m.dnum AS DOUBLE) /
               (CAST(t1 AS DOUBLE) * CAST(t2 AS DOUBLE)) END""").as("ks"))
      .orderBy("event_type")
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) between the same stream
    * halves [[ksDrift]] splits — the nonparametric location test next
    * to [[graft.operators.Analytics.abTest]]'s proportion z. Midranks
    * stay EXACT by doubling: for a value with `c` occurrences after
    * cumulative count `C`, doubled-midrank = 2C + c + 1, so the
    * rank-sum R₁ and U₁ = R₁ − n₁(n₁+1)/2 are exact integers (doubled
    * throughout, halved only in the final double chain). The normal
    * approximation applies the standard tie correction
    * σ² = n₁n₂/12·[(N+1) − Σ(t³−t)/(N(N−1))] from exact integer tie
    * moments — the whole statistic composes in one fixed
    * +,−,×,÷,√ chain. Cumulative counts ride [[Ids.prefixSums]]. */
  def mannWhitney(events: DataFrame): DataFrame = {
    val day = expr("unix_micros(ts) div 86400000000L")
    val cents = expr("CAST(ROUND(value * 100) AS BIGINT)")
    val base = events.filter(col("value").isNotNull)
      .select(day.as("day"), cents.as("c"))
    val bounds = base.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val sided = base.crossJoin(broadcast(bounds))
      .select(col("c"),
        when(col("day") < expr("(lo + hi + 1) div 2"), 1L)
          .otherwise(0L).as("s1"),
        when(col("day") < expr("(lo + hi + 1) div 2"), 0L)
          .otherwise(1L).as("s2"))
    val perVal = sided.groupBy("c")
      .agg(sum(col("s1")).as("n1"), sum(col("s2")).as("n2"))
      .withColumn("t", col("n1") + col("n2"))
    val cum = Ids.prefixSums(perVal, Seq(col("c")), Seq("t"))
    // doubled midrank of value v: 2*(cum_t - t) + t + 1
    cum.select(col("n1"), col("n2"), col("t"),
        expr("2L * (cum_t - t) + t + 1L").as("mr2"))
      .agg(sum(col("n1")).as("na"), sum(col("n2")).as("nb"),
        sum(expr("n1 * mr2")).as("r1_2"),
        sum(expr("t * t * t - t")).as("ties"))
      .select(col("na").as("n1"), col("nb").as("n2"),
        // U1 doubled: R1_2 − n1(n1+1)
        (col("r1_2") - col("na") * (col("na") + 1L)).as("u1_2"),
        col("ties"),
        expr("""CASE WHEN na = 0 OR nb = 0
               OR (na + nb) < 2
               OR CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) *
                  ((CAST(na + nb + 1 AS DOUBLE)) -
                   (CAST(ties AS DOUBLE) /
                    (CAST(na + nb AS DOUBLE) * CAST(na + nb - 1 AS DOUBLE)))) = 0.0
               THEN NULL ELSE
               ((CAST(r1_2 - na * (na + 1) AS DOUBLE) / 2.0) -
                ((CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) / 2.0)) /
               sqrt((CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0) *
                 ((CAST(na + nb + 1 AS DOUBLE)) -
                  (CAST(ties AS DOUBLE) /
                   (CAST(na + nb AS DOUBLE) * CAST(na + nb - 1 AS DOUBLE)))))
               END""").as("z_score"))
  }

  /** Robust location/dispersion per group: exact-interpolated median
    * and MAD (median absolute deviation from it). The deviation
    * |cents − median| is one exactly-rounded double subtraction per
    * row; both engines then sort and interpolate the same doubles, so
    * the MAD hash-matches like any percentile. The robust pair
    * survives the heavy tails that make mean/stddev fences useless
    * (the Tukey-fence flags ride quartiles for the same reason). */
  def mad(df: DataFrame, groupCol: String, moneyCol: String): DataFrame = {
    val cents = expr(s"CAST(ROUND($moneyCol * 100) AS BIGINT)")
    val base = df.select(col(groupCol), cents.as("__c"))
      .filter(col("__c").isNotNull)
    val med = base.groupBy(groupCol)
      .agg(expr("percentile(__c, 0.5)").as("__med"))
    base.join(broadcast(med), groupCol)
      .select(col(groupCol), col("__c"), col("__med"),
        abs(col("__c").cast("double") - col("__med")).as("__dev"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        min(col("__med")).as("median_cents"), // constant within group
        expr("percentile(__dev, 0.5)").as("mad_cents"))
      .orderBy(groupCol)
  }

  /** Trimmed (truncated) mean per order status — the outlier-robust
    * center: drop the lowest and highest `trimPpm` fraction of ROWS
    * (rank-based, never value-based, so everything stays exact
    * integers: trim count `t = (n·trimPpm) div 10⁶` on each side, keep
    * ranks in `(t, n−t]`). The kept-sum and count are integer; the mean
    * is ONE correctly-rounded division — bit-identical cross-engine,
    * unlike a value-clamped winsorized mean whose interpolated clip
    * bounds would put IEEE sums of non-integers in the aggregate.
    *
    * Scale shape: ranks come from [[Ids.prefixSumsGrouped]] (range
    * exchange + per-(partition, group) slices — bounded reducer state
    * even when one status spans many partitions; the partitioned-window
    * form would sort a third of the corpus on one task). */
  /** Day-of-week seasonal profile — the robust (median-based) seasonal
    * component of an STL-style decomposition: per ISO weekday, the
    * MEDIAN of the daily revenue cells and its ratio to the overall
    * median. Medians interpolate over exact integer cents (the
    * [[mad]] discipline: hash-identical cross-engine), and the ratio
    * is one exactly-rounded division of those two values.
    *
    * Scale shape: one shuffle to O(calendar) daily cells, then all
    * work is over ≤7-row/day-count groups. */
  def seasonalDow(orders: DataFrame): DataFrame = {
    val daily = orders
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).as("cents"))
      .withColumn("dow", expr("CAST(weekday(day) AS BIGINT) + 1L"))
    val overall = daily.agg(
      expr("percentile(cents, 0.5)").as("__om"))
    daily.groupBy("dow")
      .agg(count(lit(1)).cast("bigint").as("n_days"),
        expr("percentile(cents, 0.5)").as("median_cents"))
      .crossJoin(broadcast(overall))
      .select(col("dow"), col("n_days"), col("median_cents"),
        expr("median_cents / __om").as("seasonal_ratio"))
      .orderBy("dow")
  }

  /** Lead–lag cross-correlation between two event types' daily series:
    * Pearson of (x(day), y(day + lag)) for each lag in ±`maxLag` — the
    * "does x lead y" discovery scan. Exact integer moments per lag
    * (the [[DecisionSupport.discountElasticity]] discipline), one
    * sqrt/division chain at the end. The lag table is a tiny literal
    * cross join; the day-offset match is an equi-join, no window.
    *
    * Only days where BOTH series exist at the offset score — the
    * honest pairwise-complete convention, stated here because it makes
    * each lag's n differ. */
  def crossCorrelation(events: DataFrame, typeX: String = "view",
                       typeY: String = "purchase",
                       maxLag: Int = 7): DataFrame = {
    val daily = events.filter(col("value").isNotNull)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000L").as("day"))
      .agg(sum(expr("CAST(ROUND(value * 100) AS BIGINT)")).as("cents"))
    val x = daily.filter(col("event_type") === typeX)
      .select(col("day"), col("cents").as("x"))
    val y = daily.filter(col("event_type") === typeY)
      .select(col("day").as("__dy"), col("cents").as("y"))
    val lags = x.sparkSession.range(-maxLag.toLong, maxLag + 1L)
      .select(col("id").as("lag"))
    x.crossJoin(broadcast(lags))
      .join(y, col("__dy") === col("day") + col("lag"))
      .groupBy("lag")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
      .select(col("lag"), col("n"),
        expr("""CASE WHEN n < 2
               OR CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx = 0
               OR CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy = 0
               THEN NULL
               ELSE CAST(CAST(n AS DECIMAL(38,0)) * sxy
                     - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE) /
                 (sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sxx
                     - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)) *
                  sqrt(CAST(CAST(n AS DECIMAL(38,0)) * syy
                     - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE))) END""")
          .as("corr"))
      .orderBy("lag")
  }

  /** Per-group OLS regression of the daily revenue on time — slope,
    * intercept, and R² from the five EXACT integer moments (n, Σx, Σy,
    * Σxy, Σx², Σy²), the closed form every trend dashboard runs. The
    * cross/square moments ACCUMULATE through DECIMAL(38,0) — Σxy with
    * x = epoch-day ≈ 2×10⁴ times daily cents exceeds Long over long
    * ranges at large revenues, as does n·Σy² — and the moment
    * COMBINATIONS (n·Σxy − ΣxΣy etc.) stay in DECIMAL(38,0), so no
    * intermediate wraps (HUGEINT on the oracle side). The final
    * slope/intercept/R² are short chains of
    * correctly-rounded double ops (the [[mannWhitney]] discipline), so
    * the result is bit-identical to the HUGEINT oracle.
    *
    * Scale shape: one shuffle to daily cells, map-side-combining
    * moment sums, O(groups) output. */
  def olsDaily(events: DataFrame): DataFrame = {
    val daily = events.filter(col("value").isNotNull)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000L").as("x"))
      .agg(sum(expr("CAST(ROUND(value * 100) AS BIGINT)")).as("y"))
    daily.groupBy("event_type")
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
      .select(col("event_type"), col("n"),
        expr("""CAST(CAST(n AS DECIMAL(38,0)) * sxy
                - CAST(sx AS DECIMAL(38,0)) * sy AS DECIMAL(38,0))""")
          .as("__num"),
        expr("""CAST(CAST(n AS DECIMAL(38,0)) * sxx
                - CAST(sx AS DECIMAL(38,0)) * sx AS DECIMAL(38,0))""")
          .as("__denx"),
        expr("""CAST(CAST(n AS DECIMAL(38,0)) * syy
                - CAST(sy AS DECIMAL(38,0)) * sy AS DECIMAL(38,0))""")
          .as("__deny"),
        col("sx"), col("sy"))
      .select(col("event_type"), col("n"),
        expr("""CASE WHEN n < 2 OR __denx = 0 THEN NULL
                ELSE CAST(__num AS DOUBLE) / CAST(__denx AS DOUBLE) END""")
          .as("slope_cents_per_day"),
        expr("""CASE WHEN n < 2 OR __denx = 0 THEN NULL
                ELSE (CAST(sy AS DOUBLE)
                  - (CAST(__num AS DOUBLE) / CAST(__denx AS DOUBLE))
                    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) END""")
          .as("intercept_cents"),
        expr("""CASE WHEN n < 2 OR __denx = 0 OR __deny = 0 THEN NULL
                ELSE CAST(__num * __num AS DOUBLE)
                  / CAST(__denx * __deny AS DOUBLE) END""").as("r2"))
      .orderBy("event_type")
  }

  /** Seasonal-naive forecast backtest — the baseline every forecasting
    * pipeline must beat, measured honestly: forecast(day) =
    * actual(day − 7) per event type, scored over the days where both
    * exist. Errors are exact integer cents; MAE and bias are ONE
    * division each at the end. The join is a day-offset equi-join on
    * the aggregated daily cells — no window, no sort, O(calendar)
    * rows.
    *
    * This is the backtest harness shape: swap the lag-7 CTE for any
    * candidate forecast and the scoring tail is unchanged. */
  def forecastBacktest(events: DataFrame): DataFrame = {
    val daily = events.filter(col("value").isNotNull)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000L").as("day"))
      .agg(sum(expr("CAST(ROUND(value * 100) AS BIGINT)")).as("cents"))
    val actual = daily.select(col("event_type"), col("day"),
      col("cents").as("actual_cents"))
    val forecast = daily.select(col("event_type"),
      (col("day") + 7L).as("day"), col("cents").as("forecast_cents"))
    actual.join(forecast, Seq("event_type", "day"))
      .groupBy("event_type")
      .agg(count(lit(1)).cast("bigint").as("n_days"),
        sum(expr("abs(actual_cents - forecast_cents)")).as("sum_abs_err_cents"),
        sum(expr("actual_cents - forecast_cents")).as("sum_err_cents"))
      .withColumn("mae_cents",
        expr("CAST(sum_abs_err_cents AS DOUBLE) / CAST(n_days AS DOUBLE)"))
      .withColumn("bias_cents",
        expr("CAST(sum_err_cents AS DOUBLE) / CAST(n_days AS DOUBLE)"))
      .orderBy("event_type")
  }

  /** Seasonally-adjusted outlier days — [[seasonalDow]] composed with
    * the robust-deviation rule: a day flags when its revenue deviates
    * from ITS WEEKDAY's median by more than `k`× the MAD of all such
    * deviations (dow-adjustment removes the weekly cycle the plain
    * outlier scan would false-positive on). Medians/MAD interpolate
    * over exact integers; the comparison chain is the documented
    * exactly-rounded ops only.
    *
    * Scale shape: daily cells once; the 7-row median table broadcasts;
    * MAD is one bounded global aggregate over O(calendar) rows. */
  def seasonalOutliers(orders: DataFrame, k: Double = 3.0): DataFrame = {
    val daily = orders
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).as("cents"))
      .withColumn("dow", expr("CAST(weekday(day) AS BIGINT) + 1L"))
    val med = daily.groupBy("dow")
      .agg(expr("percentile(cents, 0.5)").as("__dm"))
    val dev = daily.join(broadcast(med), "dow")
      .withColumn("deviation_cents", expr("CAST(cents AS DOUBLE) - __dm"))
    val mad = dev.agg(
      expr("percentile(abs(deviation_cents), 0.5)").as("__mad"))
    dev.crossJoin(broadcast(mad))
      .filter(expr(s"abs(deviation_cents) > $k * __mad"))
      .select(col("day"), col("dow"), col("cents"), col("deviation_cents"))
      .orderBy("day")
  }

  /** Leakage-free (out-of-fold) target encoding — the ML
    * feature-engineering staple: replace a categorical column with the
    * target mean computed on the OTHER folds, so the encoding of a row
    * never sees its own target (the standard defense against
    * target-leakage overfitting). Folds are deterministic
    * `pmod(event_id, k)` — id arithmetic, identical on any engine —
    * and the out-of-fold mean is ONE exactly-rounded division of exact
    * integer cents: `(Σ_type − Σ_fold) / (n_type − n_fold)`.
    * Single-fold categories (denominator 0) encode as NULL — the
    * honest "no out-of-fold evidence" answer.
    *
    * Emitted at (category, fold) granularity — the encoding TABLE a
    * pipeline broadcast-joins onto its rows; O(categories·k) rows, so
    * the join side stays broadcastable at any corpus size. */
  def targetEncode(events: DataFrame, folds: Int = 5): DataFrame = {
    val base = events.filter(col("value").isNotNull)
      .select(col("event_type"),
        expr(s"pmod(event_id, ${folds}L)").as("fold"),
        expr("CAST(ROUND(value * 100) AS BIGINT)").as("__c"))
    val perFold = base.groupBy("event_type", "fold")
      .agg(count(lit(1)).cast("bigint").as("n_fold"),
        sum("__c").as("sum_fold_cents"))
    val perType = base.groupBy("event_type")
      .agg(count(lit(1)).cast("bigint").as("__n_t"),
        sum("__c").as("__s_t"))
    perFold.join(broadcast(perType), "event_type")
      .select(col("event_type"), col("fold"), col("n_fold"),
        col("sum_fold_cents"),
        expr("""CASE WHEN __n_t - n_fold = 0 THEN NULL
                ELSE CAST(__s_t - sum_fold_cents AS DOUBLE) /
                     CAST(__n_t - n_fold AS DOUBLE) END""")
          .as("oof_mean_cents"))
      .orderBy("event_type", "fold")
  }

  /** Mann–Kendall trend statistic per order priority over the WEEKLY
    * revenue series: S = Σ_{i<j} sgn(y_j − y_i), with the concordant /
    * discordant splits — the nonparametric "is this series trending"
    * test (Mann 1945, Kendall 1975), exact integers end to end.
    *
    * Scale shape: the pairwise form runs AFTER aggregation to
    * (group, week) — the self-join is O(weeks²) per group (weeks stay
    * weeks at 100 TB; the raw table never self-joins). */
  def mannKendall(orders: DataFrame): DataFrame = {
    val weekly = orders.groupBy(col("o_orderpriority"),
        expr("unix_seconds(CAST(o_orderdate AS TIMESTAMP)) div 604800")
          .as("week"))
      .agg(sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).as("y"))
    val a = weekly.select(col("o_orderpriority"), col("week").as("w1"),
      col("y").as("y1"))
    val b = weekly.select(col("o_orderpriority"), col("week").as("w2"),
      col("y").as("y2"))
    val pairs = a.join(b, Seq("o_orderpriority"))
      .filter(col("w2") > col("w1"))
    pairs.groupBy("o_orderpriority")
      .agg(sum(expr("CAST(sign(y2 - y1) AS BIGINT)")).as("s_stat"),
        sum(expr("CASE WHEN y2 > y1 THEN 1L ELSE 0L END")).as("n_concordant"),
        sum(expr("CASE WHEN y2 < y1 THEN 1L ELSE 0L END")).as("n_discordant"))
      .join(weekly.groupBy("o_orderpriority")
        .agg(count(lit(1)).cast("bigint").as("n_weeks")), "o_orderpriority")
      .select(col("o_orderpriority"), col("n_weeks"), col("s_stat"),
        col("n_concordant"), col("n_discordant"))
      .orderBy("o_orderpriority")
  }

  /** Theil–Sen robust trend slope per order priority: the LOW MEDIAN
    * of all pairwise weekly-revenue slopes (y_j−y_i)/(w_j−w_i), i<j.
    * The slope is ONE exactly-rounded double division of exact integer
    * cents by exact integer weeks (the pair's dy/dx is also returned
    * raw), and the median is selected by rank over (slope, dy, dx, w1,
    * w2) — a deterministic total order, so the chosen pair is
    * engine-independent even among equal slopes.
    *
    * Same scale shape as [[mannKendall]]: pairs exist only over the
    * aggregated weekly series, O(weeks²) per group. */
  def theilSen(orders: DataFrame): DataFrame = {
    val weekly = orders.groupBy(col("o_orderpriority"),
        expr("unix_seconds(CAST(o_orderdate AS TIMESTAMP)) div 604800")
          .as("week"))
      .agg(sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).as("y"))
    val a = weekly.select(col("o_orderpriority"), col("week").as("w1"),
      col("y").as("y1"))
    val b = weekly.select(col("o_orderpriority"), col("week").as("w2"),
      col("y").as("y2"))
    val slopes = a.join(b, Seq("o_orderpriority"))
      .filter(col("w2") > col("w1"))
      .select(col("o_orderpriority"), col("w1"), col("w2"),
        (col("y2") - col("y1")).as("dy"), (col("w2") - col("w1")).as("dx"),
        expr("CAST(y2 - y1 AS DOUBLE) / CAST(w2 - w1 AS DOUBLE)")
          .as("slope_cents_per_week"))
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("slope_cents_per_week"), col("dy"), col("dx"),
        col("w1"), col("w2"))
    slopes
      .withColumn("__rk", row_number().over(w).cast("bigint"))
      .withColumn("__m",
        count(lit(1)).over(Window.partitionBy("o_orderpriority"))
          .cast("bigint"))
      .filter(col("__rk") === expr("(__m + 1L) div 2L"))
      .select(col("o_orderpriority"), col("__m").as("n_pairs"),
        col("slope_cents_per_week"), col("dy"), col("dx"))
      .orderBy("o_orderpriority")
  }

  /** Wald–Wolfowitz runs test over the daily revenue direction — the
    * randomness check that completes the nonparametric family next to
    * [[mannKendall]]: classify each day (after the first) as up/down vs
    * the previous day (zero-change days count as down — a documented,
    * deterministic convention), count the maximal same-sign RUNS, and
    * report exact integers only (n_up, n_down, n_runs; the normal
    * approximation's mean 1 + 2·n₁·n₂/n is left to the reader — a
    * float z-score would put engine-divergent arithmetic in the gate).
    *
    * Scale shape: one shuffle to daily cells; ranks come from the
    * two-phase [[Ids.prefixSums]] (never a single-reducer window over
    * the calendar), and adjacency is a self-join on rank — O(days)
    * rows end to end. */
  def runsTest(orders: DataFrame): DataFrame = {
    val daily = orders
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).as("x"))
      .withColumn("__one", lit(1L))
    val ranked = Ids.prefixSums(daily, Seq(col("day")), Seq("__one"))
      .select(col("day"), col("x"), col("cum___one").as("rk"))
    val steps = ranked.as("c").join(ranked.as("p"),
        col("c.rk") === col("p.rk") + 1L)
      .select(col("c.rk").as("rk"),
        when(col("c.x") > col("p.x"), 1L).otherwise(0L).as("up"))
    val flips = steps.as("c").join(steps.as("p"),
        col("c.rk") === col("p.rk") + 1L)
      .select(when(col("c.up") =!= col("p.up"), 1L).otherwise(0L).as("flip"))
    val counts = steps.agg(
      coalesce(sum(col("up")), lit(0L)).as("n_up"),
      coalesce(sum(lit(1L) - col("up")), lit(0L)).as("n_down"))
    val runs = flips.agg(coalesce(sum(col("flip")), lit(0L)).as("__flips"))
    counts.crossJoin(runs)
      .select(col("n_up"), col("n_down"),
        when(col("n_up") + col("n_down") === 0L, 0L)
          .otherwise(col("__flips") + 1L).as("n_runs"))
  }

  /** Order-fulfillment life table (the no-censoring Kaplan–Meier, where
    * the estimator reduces to the exact empirical survival): duration =
    * days from order date to the LAST line shipment, bucketed by week.
    * Per bucket: orders at risk (duration ≥ bucket start), events
    * (duration inside the bucket), the discrete hazard and the
    * fraction surviving past the bucket — all exact integer counts and
    * floor-div ppm.
    *
    * Scale shape: one orders⋈lineitem shuffle to a per-order max, then
    * the table is O(buckets) rows — the cumulative window runs over
    * weeks, never data. */
  def survivalTable(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val perOrder = lineitem.groupBy("l_orderkey")
      .agg(max("l_shipdate").as("last_ship"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(expr("CAST(datediff(to_date(last_ship), to_date(o_orderdate)) AS BIGINT)")
        .as("days"))
    val buckets = perOrder
      .groupBy(expr("days div 7L").as("bucket_week"))
      .agg(count(lit(1)).cast("bigint").as("n_events"))
    // O(weeks) rows from here on — the single-order window is bounded
    val w = Window.orderBy("bucket_week")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    buckets
      .withColumn("__cum", sum("n_events").over(w))
      .withColumn("__tot",
        sum("n_events").over(Window.partitionBy(lit(1))).cast("bigint"))
      .select(col("bucket_week"), col("n_events"),
        (col("__tot") - col("__cum") + col("n_events")).as("n_risk"),
        expr("(n_events * 1000000L) div (__tot - __cum + n_events)")
          .as("hazard_ppm"),
        expr("((__tot - __cum) * 1000000L) div __tot").as("survival_ppm"))
      .orderBy("bucket_week")
  }

  /** Winsorized mean per order status — [[trimmedMean]]'s clamping
    * sibling: instead of DROPPING the extreme `t = (n·ppm) div 10⁶`
    * rows per side, REPLACE them with the boundary-rank values (rank
    * t+1 ascending, rank n−t descending). Because the clamp bounds are
    * rank-selected EXISTING values (never interpolated), the
    * winsorized sum `Σ middle + t·low + t·high` stays exact integer
    * cents, and the mean is one correctly-rounded division — the same
    * engine-portability discipline as the trim.
    *
    * Same scale shape as [[trimmedMean]]: grouped two-phase ranks, the
    * boundary rows are two O(groups) broadcastable relations. */
  def winsorizedMean(orders: DataFrame, trimPpm: Long = 100000L): DataFrame = {
    require(trimPpm >= 0L && trimPpm < 500000L,
      s"trimPpm must be in [0, 500000), got $trimPpm")
    val base = orders.select(col("o_orderstatus"), col("o_orderkey"),
        expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("__c"))
      .withColumn("__one", lit(1L))
    val ranked = Ids.prefixSumsGrouped(base, Seq("o_orderstatus"),
      Seq(col("__c"), col("o_orderkey")), Seq("__one"))
      .withColumnRenamed("cum___one", "__rk")
    val counts = base.groupBy("o_orderstatus")
      .agg(count(lit(1)).cast("bigint").as("__n"))
      .withColumn("__t", expr(s"(__n * ${trimPpm}L) div 1000000L"))
    val withN = ranked.join(broadcast(counts), "o_orderstatus")
    val low = withN.filter(col("__rk") === col("__t") + 1L)
      .select(col("o_orderstatus"), col("__c").as("__low"))
    val high = withN.filter(col("__rk") === col("__n") - col("__t"))
      .select(col("o_orderstatus"), col("__c").as("__high"))
    withN.filter(col("__rk") > col("__t") &&
        col("__rk") <= col("__n") - col("__t"))
      .groupBy("o_orderstatus")
      .agg(sum("__c").as("__mid"), first("__n").as("n"),
        first("__t").as("__t2"))
      .join(broadcast(low), "o_orderstatus")
      .join(broadcast(high), "o_orderstatus")
      .select(col("o_orderstatus"), col("n"),
        (col("__mid") + col("__t2") * (col("__low") + col("__high")))
          .as("sum_wins_cents"))
      .withColumn("winsorized_mean_cents",
        expr("CAST(sum_wins_cents AS DOUBLE) / CAST(n AS DOUBLE)"))
      .orderBy("o_orderstatus")
  }

  def trimmedMean(orders: DataFrame, trimPpm: Long = 100000L): DataFrame = {
    require(trimPpm >= 0L && trimPpm < 500000L,
      s"trimPpm must be in [0, 500000), got $trimPpm")
    val base = orders.select(col("o_orderstatus"), col("o_orderkey"),
        expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("__c"))
      .withColumn("__one", lit(1L))
    val ranked = Ids.prefixSumsGrouped(base, Seq("o_orderstatus"),
      Seq(col("__c"), col("o_orderkey")), Seq("__one"))
    val counts = base.groupBy("o_orderstatus")
      .agg(count(lit(1)).cast("bigint").as("__n"))
    ranked.join(broadcast(counts), "o_orderstatus")
      .withColumn("__t", expr(s"(__n * ${trimPpm}L) div 1000000L"))
      .filter(col("cum___one") > col("__t") &&
        col("cum___one") <= col("__n") - col("__t"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_kept"), sum("__c").as("sum_cents"))
      .withColumn("trimmed_mean_cents",
        expr("CAST(sum_cents AS DOUBLE) / CAST(n_kept AS DOUBLE)"))
  }

  /** Kendall's τ-b between weekly order volume and weekly revenue —
    * the rank-association twin of the Spearman entry, exact by
    * construction: the concordant/discordant/tied pair counts are
    * INTEGER aggregates over the O(weeks²) self-join of the bounded
    * weekly table (the date axis is calendar-bounded — a few hundred
    * weeks at ANY scale factor, so the pair table is bounded too; the
    * fact-sized work is one partial+final weekly aggregate), and τ-b
    * itself is one fixed chain of exactly-rounded double ops
    * ((C−D) / √((n₀−tx)·(n₀−ty))) both engines evaluate identically.
    * Never a row-level pair join: at 100 TB the row-pair form is
    * O(n²); the week-pair form is O(weeks²) = constant. */
  def kendallWeekly(orders: DataFrame): DataFrame = {
    val weekly = orders
      .groupBy(expr("CAST(date_trunc('week', o_orderdate) AS DATE)").as("wk"))
      .agg(count(lit(1)).cast("bigint").as("x"),
        sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).as("y"))
      .localCheckpoint() // bounded table; pair join reuses it twice
    val a = weekly.select(col("wk").as("w1"), col("x").as("x1"), col("y").as("y1"))
    val b = weekly.select(col("wk").as("w2"), col("x").as("x2"), col("y").as("y2"))
    val pairs = a.join(b, col("w1") < col("w2"))
      .select(
        (col("x2") - col("x1")).as("dx"),
        (col("y2") - col("y1")).as("dy"))
    // SIGN comparison, never the dx*dy product: weekly revenue deltas
    // reach ~5e15 cents at large scale factors and the BIGINT product
    // would silently wrap (Spark non-ANSI) / error (DuckDB)
    pairs.agg(
        count(lit(1)).cast("bigint").as("n0"),
        sum(expr("""CASE WHEN (dx > 0 AND dy > 0) OR (dx < 0 AND dy < 0)
                    THEN 1 ELSE 0 END"""))
          .cast("bigint").as("concordant"),
        sum(expr("""CASE WHEN (dx > 0 AND dy < 0) OR (dx < 0 AND dy > 0)
                    THEN 1 ELSE 0 END"""))
          .cast("bigint").as("discordant"),
        sum(expr("CASE WHEN dx = 0 THEN 1 ELSE 0 END"))
          .cast("bigint").as("tied_x"),
        sum(expr("CASE WHEN dy = 0 THEN 1 ELSE 0 END"))
          .cast("bigint").as("tied_y"))
      .withColumn("tau_b", expr(
        """CAST(concordant - discordant AS DOUBLE) /
          |sqrt(CAST(n0 - tied_x AS DOUBLE) * CAST(n0 - tied_y AS DOUBLE))"""
          .stripMargin))
  }
}

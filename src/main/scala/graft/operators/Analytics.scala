package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics operators over the `events` stream — the
  * funnel / cohort / resample family every event-analytics deployment
  * runs on exactly the reference's event-time surface (kinesis JSON
  * events, reference `flink-gen.sh:94-110`). All three follow the
  * engine's determinism discipline: timestamps compare at exact
  * microseconds, money rides integer cents, offsets are integer floor
  * divisions of epoch units — nothing accumulates in IEEE doubles.
  */
object Analytics {

  /** Ordered-funnel progression: for each user, the earliest strictly-
    * increasing chain of `stages` events with every later stage inside
    * `windowHours` of stage 1. One row per user who reached stage 1:
    * `(user_id, stage1_ts..stageK_ts, depth)`.
    *
    * Determinism: each stage timestamp is a `min` over an exact
    * microsecond predicate — no ordering ambiguity exists even with
    * tied timestamps (min of the tied set).
    *
    * Scale shape: k chained aggregates keyed on user_id — stage 1 is
    * one hash agg over the filtered scan, every later stage joins the
    * (≤ users) frontier back to its event slice; nothing but
    * (user, ts) pairs moves. The classic window-free funnel: no
    * per-user sort, no session assembly. */
  def funnel(events: DataFrame, stages: Seq[String] = Seq("view", "click", "purchase"),
             windowHours: Int = 24): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val ts = col("ts")
    val s1 = events.filter(col("event_type") === stages.head)
      .groupBy("user_id").agg(min(ts).as("stage1_ts"))
      .withColumn("__limit",
        col("stage1_ts") + expr(s"INTERVAL $windowHours HOURS"))
    val full = stages.zipWithIndex.drop(1).foldLeft(s1) {
      case (acc, (stage, i)) =>
        val prev = s"stage${i}_ts"
        val cur = s"stage${i + 1}_ts"
        val hits = events.filter(col("event_type") === stage)
          .select(col("user_id"), ts.as("__t"))
          .join(acc.select(col("user_id"), col(prev), col("__limit")), "user_id")
          .filter(col("__t") > col(prev) && col("__t") <= col("__limit"))
          .groupBy("user_id").agg(min(col("__t")).as(cur))
        acc.join(hits, Seq("user_id"), "left")
    }
    val depth = stages.indices.drop(1)
      .map(i => when(col(s"stage${i + 1}_ts").isNotNull, 1L).otherwise(0L))
      .foldLeft(lit(1L))(_ + _)
    full.drop("__limit").withColumn("depth", depth)
  }

  /** Weekly retention-cohort matrix: users cohort by the week of their
    * FIRST event; each later active week counts them once. One row per
    * (cohort_week, week_offset): `(cohort_week, week_offset, n_users)`
    * with weeks as integer epoch-week indexes (`epoch_day div 7`) —
    * pure integer floor divisions, identical in any engine, no
    * calendar/timezone functions anywhere.
    *
    * Scale shape: one agg for first-events (users rows), one id-keyed
    * join back, one distinct-by-construction agg on
    * (cohort, offset, user) then the count — events never carry more
    * than three longs through the exchanges. */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val day = expr("unix_micros(ts) div 86400000000L")
    val firsts = events
      .groupBy("user_id").agg(min(day).as("__first_day"))
      .select(col("user_id"), expr("__first_day div 7").as("cohort_week"),
        col("__first_day"))
    events.select(col("user_id"), day.as("__day"))
      .join(firsts, "user_id")
      .select(col("user_id"), col("cohort_week"),
        expr("(__day - __first_day) div 7").as("week_offset"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Daily resample with forward fill: one row per (user, day) from the
    * user's first to last active day, carrying the running latest
    * event value (integer cents; NULL until the user's first non-null
    * value). The gap-filled regular series every downstream
    * time-series consumer wants from an irregular event stream.
    *
    * Determinism: the per-day "latest" value is `max_by(cents,
    * (unix_micros, event_id))` — a total order, so ties cannot flip it;
    * the fill is `last(ignoreNulls)` over day order, unambiguous on the
    * daily grid. Days are integer epoch-day indexes.
    *
    * Scale shape: per-day compaction first (events → ≤ user·days rows),
    * then `sequence()` explodes only each user's own [first, last] day
    * span — grid rows ≤ users × span; the fill is one window over the
    * per-user day order (one exchange, bounded frames). */
  def resampleDaily(events: DataFrame): DataFrame = {
    val day = expr("unix_micros(ts) div 86400000000L")
    val cents = expr("CAST(ROUND(value * 100) AS BIGINT)")
    val daily = events
      .select(col("user_id"), day.as("day"), cents.as("__cents"),
        expr("unix_micros(ts)").as("__us"), col("event_id"))
      .groupBy("user_id", "day")
      .agg(expr("max_by(__cents, struct(__us, event_id))").as("__day_cents"),
        count(lit(1)).as("n_events"))
    val grid = daily.groupBy("user_id")
      .agg(min(col("day")).as("__lo"), max(col("day")).as("__hi"))
      .select(col("user_id"),
        explode(expr("sequence(__lo, __hi)")).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("__day_cents"), ignoreNulls = true).over(w)
          .as("filled_cents"))
  }

  /** SCD Type-2 history build from an event-sourced attribute stream —
    * the warehouse-dimension twin of [[graft.cdc.Upsert.latestByKey]]
    * (latest state) and the reference generator's status-transition
    * updates (`gen_data.py:171-200` scheduled→live→finished): per key,
    * validity intervals `[valid_from, valid_to)` for each DISTINCT run
    * of the attribute, consecutive repeats compressed away, the
    * current row carrying `valid_to = NULL` and `is_current = true`.
    *
    * Determinism: event order is the total (µs timestamp, event_id)
    * order, so runs, interval bounds, and the current flag cannot flip
    * under ties; the run compression is a lag-compare, the close a
    * lead — two window passes over one per-key sort.
    *
    * Scale shape: one exchange on the key + one per-partition sort
    * shared by both window functions; row width is (key, attr, ts). */
  def scd2(events: DataFrame, attr: String = "event_type"): DataFrame = {
    val order = Window.partitionBy(col("user_id"))
      .orderBy(expr("unix_micros(ts)"), col("event_id"))
    val runs = events
      .select(col("user_id"), col("event_id"), col("ts"), col(attr).as("__attr"))
      .withColumn("__prev", lag(col("__attr"), 1).over(order))
      .filter(col("__prev").isNull || col("__prev") =!= col("__attr"))
    val close = Window.partitionBy(col("user_id"))
      .orderBy(expr("unix_micros(ts)"), col("event_id"))
    runs
      .withColumn("valid_to", lead(col("ts"), 1).over(close))
      .select(col("user_id"), col("__attr").as(attr),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Equi-depth (NTILE) bucket report: decile buckets of order value
    * per status with per-bucket count and exact cents bounds — the
    * spread report equi-WIDTH histograms miss on skewed money columns
    * (one giant first bucket, empty tails). Ranks are NTILE over the
    * total (cents, order key) order — deterministic under ties — and
    * the bounds are min/max comparisons of exact integers.
    *
    * Scale shape: the per-group rank runs through
    * [[Ids.ntileRankGrouped]] — range exchange + per-slice
    * row_number + O(groups·partitions) driver offsets — so even a
    * group holding most of the corpus never sorts on one task (the
    * partitioned-window form would; equality is spec-pinned). Then a
    * hash aggregate to groups×n rows. The mergeable-sketch family
    * covers the approximate path. */
  def ntileBuckets(orders: DataFrame, n: Int = 10): DataFrame = {
    val cents = expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")
    Ids.ntileRankGrouped(
        orders.select(col("o_orderstatus"), col("o_orderkey"),
          cents.as("__cents")),
        Seq("o_orderstatus"), Seq(col("__cents"), col("o_orderkey")),
        n, "__b")
      .withColumn("bucket", col("__b").cast("bigint"))
      .groupBy("o_orderstatus", "bucket")
      .agg(count(lit(1)).as("n_orders"),
        min(col("__cents")).as("lo_cents"),
        max(col("__cents")).as("hi_cents"))
  }

  /** Funnel conversion-latency profile: for users who advanced past
    * stage 1, the stage-1→stage-2 delay distribution per reached depth
    * — the "how fast do converters convert" report the funnel counts
    * alone hide. Delays are exact integer microseconds; the quartiles
    * interpolate exactly like `q_quantiles` (both engines sort exactly
    * and interpolate in double from the same integer operands). */
  def funnelLatency(events: DataFrame,
                    stages: Seq[String] = Seq("view", "click", "purchase"),
                    windowHours: Int = 24): DataFrame =
    funnel(events, stages, windowHours)
      .filter(col("stage2_ts").isNotNull)
      .select(col("depth"),
        expr("unix_micros(stage2_ts) - unix_micros(stage1_ts)").as("__d"))
      .groupBy("depth")
      .agg(count(lit(1)).as("n_users"),
        expr("CAST(percentile(__d, 0.5) AS DOUBLE)").as("p50_us"),
        expr("CAST(percentile(__d, 0.9) AS DOUBLE)").as("p90_us"),
        max(col("__d")).as("max_us"))

  /** Volume-anomaly detection: flag hours whose event count deviates
    * k-sigma from the trailing 24-hour baseline (both spikes AND dips
    * — the test is two-sided), per event type — the ingest-monitoring
    * alarm (a crawler gone hot, a dropped feed). The
    * sigma test is the SQUARED Chebyshev form
    * `(n·x − Σ)² > k²·(n·Σx² − Σ²)` — algebraically `|x − mean| >
    * k·sigma` with both sides multiplied through by n², so the whole
    * test is integer arithmetic: no sqrt, no IEEE, engine-exact.
    * (Chebyshev guarantees ≤ 1/k² of any distribution flags — the
    * distribution-free bound that makes k=3 a sane default.) The
    * current hour is excluded from its own baseline; hours with a
    * baseline of fewer than `minBaseline` observations never flag.
    *
    * Long-safety: with per-group hourly counts ≤ ~10⁸ the largest term
    * `(n·x − Σ)²` stays ≤ (2n·max)² < 2⁶³ at n = 24; past that, widen
    * to DECIMAL — the test's shape is unchanged.
    *
    * Scale shape: one partial+final agg to (group, hour) rows, then
    * three window sums over the tiny hourly aggregate. */
  def countAnomalies(events: DataFrame, kSigma: Int = 3,
                     minBaseline: Int = 8): DataFrame =
    anomalyFlags(hourlyCounts(events), kSigma, minBaseline)

  /** The (group, hour) count table [[anomalyFlags]] consumes — split
    * out so the streaming monitor ([[graft.streaming.AnomalyMonitor]])
    * can maintain it incrementally (sum folds are associative, so any
    * batch split merges to the same table) and run the SAME flags
    * stage over its state snapshots. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 3600000000L").as("hour"))
      .agg(count(lit(1)).as("n_events"))

  /** The flags stage of [[countAnomalies]] over a prepared
    * (event_type, hour, n_events) table. */
  def anomalyFlags(hourly: DataFrame, kSigma: Int = 3,
                   minBaseline: Int = 8): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(-24, -1)
    hourly
      .withColumn("__n", count(col("n_events")).over(w))
      .withColumn("__s", sum(col("n_events")).over(w))
      .withColumn("__ss", sum(col("n_events") * col("n_events")).over(w))
      .select(col("event_type"), col("hour"), col("n_events"),
        col("__n").as("baseline_hours"),
        (col("__n") >= minBaseline &&
          (col("__n") * col("n_events") - col("__s")) *
            (col("__n") * col("n_events") - col("__s")) >
          lit(kSigma.toLong * kSigma) *
            (col("__n") * col("__ss") - col("__s") * col("__s")))
          .as("is_anomaly"))
  }

  /** Period-over-period report: weekly value totals per group with the
    * previous period's total and the exact delta — the WoW/MoM trend
    * view every revenue dashboard leads with. Periods are integer
    * epoch-week indexes ([[retentionCohorts]]' floor-division clock);
    * totals are integer cents, the delta a Long subtraction, and the
    * previous period comes from a lag over the per-group week order
    * (NULL on each group's first observed week — absent weeks are NOT
    * gap-filled; compose with [[resampleDaily]]'s grid pattern when a
    * dense axis is needed).
    *
    * Scale shape: one partial+final agg to (group, week) rows, then a
    * lag window over the tiny aggregate — groups×weeks rows total. */
  def periodOverPeriod(events: DataFrame, groupCol: String = "event_type"): DataFrame = {
    val weekly = events
      .groupBy(col(groupCol).as("grp"),
        expr("unix_micros(ts) div 86400000000L div 7").as("week"))
      .agg(sum(expr("CAST(ROUND(value * 100) AS BIGINT)")).as("cents"),
        count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("grp")).orderBy(col("week"))
    weekly
      .withColumn("prev_cents", lag(col("cents"), 1).over(w))
      .select(col("grp").as(groupCol), col("week"), col("n_events"),
        col("cents"), col("prev_cents"),
        (col("cents") - col("prev_cents")).as("delta_cents"))
  }

  /** Time-weighted average value (TWAP) per key — the irregular-stream
    * average where each observation holds until the next one (the step
    * function a last-value resample implies), weighting every value by
    * its holding duration instead of its tick count. One row per key
    * with ≥ 2 valued events: `(user_id, n_obs, span_us, twap_cents)`.
    *
    * Exactness: cents are integers, gaps are exact µs differences over
    * the (µs, event_id) total order, and the weighted sum is Long-safe
    * WHATEVER the event count — gaps telescope to the span, so
    * `Σ cents·gap ≤ max_cents · span` (≤ 10⁵·3·10¹² here, far inside
    * Long). The average is one non-negative integer floor division —
    * portable across engines like the centroid mean.
    *
    * NULL-valued events are excluded from the step function (they are
    * ticks without an observation). Scale shape: one exchange on the
    * key + one per-partition sort for the lead, one hash aggregate. */
  def twap(events: DataFrame): DataFrame = {
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("__us"), col("event_id"))
    events
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("__us"),
        expr("CAST(ROUND(value * 100) AS BIGINT)").as("__cents"))
      .withColumn("__gap", lead(col("__us"), 1).over(order) - col("__us"))
      .filter(col("__gap").isNotNull)
      .groupBy("user_id")
      .agg((count(lit(1)) + 1).as("n_obs"),
        sum(col("__gap")).as("span_us"),
        sum(col("__cents") * col("__gap")).as("__wsum"))
      .filter(col("span_us") > 0L)
      .select(col("user_id"), col("n_obs"), col("span_us"),
        expr("__wsum div span_us").as("twap_cents"))
  }

  /** Event-transition paths (the Sankey/Markov source view): counts of
    * consecutive `event_type` transitions per user timeline, ordered by
    * the total (µs, event_id) order. One row per (from_type, to_type)
    * with the transition count and distinct-user reach.
    *
    * Scale shape: one exchange on the key, one per-partition sort for
    * the lag, one hash aggregate on the (from, to) pair. */
  def eventPaths(events: DataFrame): DataFrame = {
    val order = Window.partitionBy(col("user_id"))
      .orderBy(expr("unix_micros(ts)"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("__prev", lag(col("event_type"), 1).over(order))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"),
        countDistinct(col("user_id")).as("n_users"))
  }

  /** Funnel conversion report — the stage-level summary over
    * [[funnel]]'s per-user rows: users reaching each stage, and the
    * step conversion from the previous stage in integer parts-per-
    * million. The report every funnel dashboard leads with; ≤stages
    * rows out of one aggregate over the funnel frontier.
    *
    * Scale shape: funnel's chained aggregates (users rows), one
    * conditional-count aggregate, a ≤stages-row explode. */
  def funnelReport(events: DataFrame,
                   stages: Seq[String] = Seq("view", "click", "purchase"),
                   windowHours: Int = 24): DataFrame = {
    val f = funnel(events, stages, windowHours)
    val counts = f.agg(
      stages.indices.map(i =>
        sum(when(col("depth") >= i + 1, 1L).otherwise(0L))
          .as(s"__c${i + 1}")).head,
      stages.indices.map(i =>
        sum(when(col("depth") >= i + 1, 1L).otherwise(0L))
          .as(s"__c${i + 1}")).tail: _*)
    val rows = stages.zipWithIndex.map { case (s, i) =>
      struct(lit(i + 1L).as("stage"), lit(s).as("event_type"),
        col(s"__c${i + 1}").as("n_users"),
        (if (i == 0) lit(1000000L)
         else expr(s"CASE WHEN __c$i > 0 THEN __c${i + 1} * 1000000L div __c$i END"))
          .as("conversion_ppm"))
    }
    counts.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Weekly activity intensity — the DAU/WAU-style stickiness number:
    * per epoch-week, distinct active users, distinct active
    * (user, day) pairs, and the intensity `active_days·10⁶ div
    * (7·actives)` — how much of the week the average active user
    * shows up, in integer ppm. Two distinct aggregates, ≤weeks rows
    * out. */
  def activityIntensity(events: DataFrame): DataFrame = {
    val day = expr("unix_micros(ts) div 86400000000L")
    events.select(col("user_id"), day.as("__day"),
        expr("unix_micros(ts) div 86400000000L div 7").as("week"))
      .distinct()
      .groupBy(col("week"))
      .agg(countDistinct(col("user_id")).as("active_users"),
        count(lit(1)).as("active_user_days"))
      .select(col("week"), col("active_users"), col("active_user_days"),
        expr("active_user_days * 1000000L div (7L * active_users)")
          .as("intensity_ppm"))
  }

  /** Order-aging bands — the receivables-aging classic: orders
    * bucketed by integer days since order vs the corpus' newest order
    * date, in the fixed 0–7 / 8–30 / 31–90 / 90+ bands, with count
    * and exact cents per (status, band). Band labels are ordered by a
    * numeric band id so the report sorts naturally. */
  def orderAging(orders: DataFrame): DataFrame = {
    val ref = orders.agg(max(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))"))
      .as("__ref_us"))
    orders
      .select(col("o_orderstatus"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("__us"),
        expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").as("__cents"))
      .crossJoin(broadcast(ref))
      .withColumn("__age", expr("(__ref_us - __us) div 86400000000L"))
      .withColumn("band_id",
        when(col("__age") <= 7L, 0L).when(col("__age") <= 30L, 1L)
          .when(col("__age") <= 90L, 2L).otherwise(3L))
      .groupBy(col("o_orderstatus"), col("band_id"))
      .agg(count(lit(1)).as("n_orders"), sum(col("__cents")).as("cents"))
      .withColumn("band",
        when(col("band_id") === 0L, "0-7d").when(col("band_id") === 1L, "8-30d")
          .when(col("band_id") === 2L, "31-90d").otherwise("90d+"))
  }

  /** Normalized retention-rate matrix — [[retentionCohorts]] divided
    * through by each cohort's size: the percentage-style view every
    * retention dashboard renders, in integer parts-per-million
    * (`n_users·10⁶ div cohort_size`). The size is the cohort's own
    * offset-0 cell (every user is active in their first week by
    * construction), attached by a broadcast-sized join on
    * cohort_week. */
  def retentionRates(events: DataFrame): DataFrame = {
    val cells = retentionCohorts(events)
    val sizes = cells.filter(col("week_offset") === 0L)
      .select(col("cohort_week"), col("n_users").as("cohort_size"))
    cells.join(broadcast(sizes), "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("n_users"),
        col("cohort_size"),
        expr("n_users * 1000000L div cohort_size").as("retention_ppm"))
  }

  /** New-vs-returning weekly split — the other growth-dashboard lead:
    * per epoch-week, distinct active users partitioned into first-ever
    * -week (new) and seen-before (returning). One first-seen aggregate
    * (users rows), one distinct (user, week) pass, one ≤weeks-row
    * aggregate. */
  def newVsReturning(events: DataFrame): DataFrame = {
    val week = expr("unix_micros(ts) div 86400000000L div 7")
    val firsts = events.groupBy(col("user_id"))
      .agg(min(week).as("__first_week"))
    events.select(col("user_id"), week.as("week")).distinct()
      .join(firsts, "user_id")
      .groupBy(col("week"))
      .agg(sum(when(col("week") === col("__first_week"), 1L).otherwise(0L))
        .as("new_users"),
        sum(when(col("week") =!= col("__first_week"), 1L).otherwise(0L))
          .as("returning_users"))
  }

  /** Cumulative reach curve — the growth dashboard: per epoch-week,
    * how many users were seen for the FIRST time, and the running
    * total reach. First-seen week is one user-keyed min; the cumsum
    * window runs over WEEKS (a handful of rows), never users.
    *
    * Scale shape: one aggregate to users rows, one ≤weeks-row
    * aggregate, one tiny window. */
  def reachCurve(events: DataFrame): DataFrame = {
    val week = expr("unix_micros(ts) div 86400000000L div 7")
    val firstSeen = events.groupBy(col("user_id"))
      .agg(min(week).as("week"))
      .groupBy(col("week")).agg(count(lit(1)).as("new_users"))
    firstSeen.withColumn("total_reach",
      sum(col("new_users")).over(
        Window.orderBy(col("week"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Benford first-digit audit — the classic fabricated-numbers
    * screen: the distribution of leading significant digits of order
    * values (in cents, so the digit is exact), with observed share in
    * integer parts-per-million next to Benford's expected share
    * (log₁₀(1+1/d), pre-computed ppm constants — no runtime
    * transcendentals). Heavy deviation flags synthetic or constrained
    * data; a 9-row result from one scan. */
  def benford(orders: DataFrame): DataFrame = {
    // ⌊10⁶·log10(1+1/d)⌋ for d = 1..9 — fixed constants of the law
    val expected = Map(1 -> 301030L, 2 -> 176091L, 3 -> 124939L,
      4 -> 96910L, 5 -> 79181L, 6 -> 66947L, 7 -> 57992L,
      8 -> 51153L, 9 -> 45757L)
    val expectedCol = expected.foldLeft(lit(null).cast("long")) {
      case (acc, (d, ppm)) => when(col("digit") === d.toString, ppm).otherwise(acc)
    }
    val digits = orders
      .select(expr("substring(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS STRING), 1, 1)")
        .as("digit"))
      .filter(col("digit") =!= "0")
      .groupBy(col("digit")).agg(count(lit(1)).as("n_orders"))
    val total = digits.agg(sum(col("n_orders")).as("__total"))
    digits.crossJoin(broadcast(total))
      .select(col("digit"), col("n_orders"),
        expr("n_orders * 1000000L div __total").as("observed_ppm"),
        expectedCol.as("benford_ppm"))
  }

  /** Audience-overlap matrix — Jaccard overlap between event-type
    * audiences (which segments share users), in integer parts-per-
    * million: `|A∩B|·10⁶ div |A∪B|` with the union by
    * inclusion–exclusion, so only exact integer set sizes ever meet
    * the division. Pairs canonicalize as `type_a < type_b`.
    *
    * Scale shape: distinct (type, user) once; the pair join fans out
    * per USER by their distinct type count (bounded by the type
    * domain, never the corpus); type audience sizes broadcast. */
  def audienceOverlap(events: DataFrame): DataFrame = {
    val membership = events.select(col("event_type"), col("user_id")).distinct()
    val sizes = membership.groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val inter = membership.as("a")
      .join(membership.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_shared"))
    inter
      .join(broadcast(sizes.select(col("event_type").as("type_a"),
        col("cnt").as("__ca"))), "type_a")
      .join(broadcast(sizes.select(col("event_type").as("type_b"),
        col("cnt").as("__cb"))), "type_b")
      .select(col("type_a"), col("type_b"), col("n_shared"),
        col("__ca").as("n_a"), col("__cb").as("n_b"),
        expr("n_shared * 1000000L div (__ca + __cb - n_shared)")
          .as("jaccard_ppm"))
  }

  /** First/last-touch attribution matrix — per user, the FIRST event
    * type ever seen (the acquisition channel) against the LAST (the
    * converting touch), counted over users: the marketing-attribution
    * crosstab. Both endpoints are min_by/max_by over the exact
    * (µs, event_id) total order — ties cannot flip them.
    *
    * Scale shape: one user-keyed aggregate (map-side combining
    * min_by/max_by — no window, no per-user sort), then a ≤|types|²
    * row aggregate. */
  def touchAttribution(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("__us"), col("event_id"))
      .groupBy(col("user_id"))
      .agg(
        expr("min_by(event_type, struct(__us, event_id))").as("first_touch"),
        expr("max_by(event_type, struct(__us, event_id))").as("last_touch"))
      .groupBy(col("first_touch"), col("last_touch"))
      .agg(count(lit(1)).as("n_users"))

  /** U-shaped (position-based) attribution — the weighted-credit model
    * between [[touchAttribution]]'s first/last extremes: per user with
    * a purchase, the touches STRICTLY BEFORE the first purchase split
    * 1e6 ppm of credit as 40/20/40 — first 400000, last 400000, the
    * middles sharing 200000 by floor-div with the remainder assigned
    * to the FIRST touch (deterministic; 1 touch → 1e6, 2 touches →
    * 500000 each). Credit aggregates by channel (event type).
    *
    * Scale shape: one user-keyed window over each user's own events
    * (partitioned — never global), then a ≤|types| aggregate. */
  def uShapedAttribution(events: DataFrame): DataFrame = {
    val e = events.select(col("user_id"), col("event_type"),
      expr("unix_micros(ts)").as("__us"), col("event_id"))
    val firstPurchase = e.filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(min(struct(col("__us"), col("event_id"))).as("__fp"))
    val touches = e.join(firstPurchase, "user_id")
      .filter(struct(col("__us"), col("event_id")) < col("__fp"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("__us"), col("event_id"))
    val ranked = touches
      .withColumn("__rk", row_number().over(w).cast("bigint"))
      .withColumn("__n",
        count(lit(1)).over(Window.partitionBy("user_id")).cast("bigint"))
    val credited = ranked.withColumn("credit_ppm", expr(
      """CASE
        |  WHEN __n = 1 THEN 1000000L
        |  WHEN __n = 2 THEN 500000L
        |  WHEN __rk = 1 THEN 400000L + (200000L - (200000L div (__n - 2L)) * (__n - 2L))
        |  WHEN __rk = __n THEN 400000L
        |  ELSE 200000L div (__n - 2L)
        |END""".stripMargin))
    credited.groupBy("event_type")
      .agg(sum("credit_ppm").as("total_credit_ppm"),
        count(lit(1)).cast("bigint").as("n_touches"))
      .orderBy("event_type")
  }

  /** Top weekly movers — [[periodOverPeriod]]'s dashboard tail: for
    * each week, the event type with the LARGEST absolute week-over-
    * week cents delta (ties to the smaller type string) — the "what
    * changed most" lead. Argmax as one max_by over the WoW rows, no
    * extra window. */
  def topMovers(events: DataFrame): DataFrame =
    periodOverPeriod(events)
      .filter(col("delta_cents").isNotNull)
      .groupBy(col("week"))
      // (|Δ| desc, type asc) argmax as a min_by over (−|Δ|, type)
      .agg(expr("min_by(struct(event_type, delta_cents), " +
        "struct(-abs(delta_cents), event_type))").as("x"))
      .select(col("week"), col("x.event_type").as("event_type"),
        col("x.delta_cents").as("delta_cents"))

  /** Market-basket pair affinity — pairwise frequent itemsets with
    * lift, the association-rule starter over order line items: parts
    * co-occurring in the same order, kept above `minSupport`, scored
    * by lift in integer parts-per-million. Lift is computed in the
    * Long-safe two-step floor form
    * `((pair·10⁶ div cnt_a) · n_orders) div cnt_b` — each step is an
    * exact integer op bounded by 10⁶·n_orders, so the formula (which
    * IS the definition here, both engines word-for-word) never
    * overflows at any corpus size, unlike the naive
    * `pair·n·10⁶/(cnt_a·cnt_b)`.
    *
    * Scale shape: baskets explode as an order-keyed self-join whose
    * fan-out is bounded by ORDER SIZE (pairs per order ≤ C(size,2) —
    * order size is bounded by the domain, never the corpus); item
    * counts broadcast; one pair-keyed aggregate. The `a < b`
    * canonical order halves the join and makes each pair unique. */
  def basketPairs(lineitem: DataFrame, minSupport: Long = 3L): DataFrame = {
    val items = lineitem.select(col("l_orderkey"), col("l_partkey")).distinct()
    val counts = items.groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
    val n = items.agg(countDistinct(col("l_orderkey")).as("__n"))
    val pairs = items.as("a")
      .join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
      .agg(count(lit(1)).as("pair_count"))
      .filter(col("pair_count") >= minSupport)
    pairs
      .join(broadcast(counts.select(col("l_partkey").as("part_a"),
        col("cnt").as("__ca"))), "part_a")
      .join(broadcast(counts.select(col("l_partkey").as("part_b"),
        col("cnt").as("__cb"))), "part_b")
      .crossJoin(broadcast(n))
      .select(col("part_a"), col("part_b"), col("pair_count"),
        col("__ca").as("count_a"), col("__cb").as("count_b"),
        expr("(pair_count * 1000000L div __ca) * __n div __cb").as("lift_ppm"))
  }

  /** Directional association rules — [[basketPairs]]' confidence view:
    * each surviving pair emits BOTH rules `a→b` and `b→a` with
    * confidence `pair·10⁶ div cnt(antecedent)` in integer ppm — the
    * "customers who bought X also bought Y" number, which unlike lift
    * is direction-sensitive. Same bounded-fanout machinery; one
    * union doubles the ≤pairs rows. */
  def basketRules(lineitem: DataFrame, minSupport: Long = 3L): DataFrame = {
    val pairs = basketPairs(lineitem, minSupport)
    val ab = pairs.select(col("part_a").as("antecedent"),
      col("part_b").as("consequent"), col("pair_count"),
      expr("pair_count * 1000000L div count_a").as("confidence_ppm"))
    val ba = pairs.select(col("part_b").as("antecedent"),
      col("part_a").as("consequent"), col("pair_count"),
      expr("pair_count * 1000000L div count_b").as("confidence_ppm"))
    ab.unionAll(ba)
  }

  /** RFM segmentation — the classic customer scoring: Recency (days
    * since last order, vs the corpus' newest order), Frequency (order
    * count), Monetary (exact cents), each quintile-scored 1–5 with 5
    * best, composed into the `RFM` segment code (`r·100 + f·10 + m`).
    * Every ordering is a total order (ties break on the customer key,
    * the q_ntile discipline) and recency is an integer floor division
    * of epoch micros — deterministic on any engine.
    *
    * Scale shape: one customer-keyed aggregate (customers rows), the
    * reference instant as a broadcast 1-row cross join, then three
    * quintile passes over CUSTOMERS through [[Ids.ntileRank]] — the
    * two-phase rank + bucket formula that reproduces `NTILE` exactly
    * with a range exchange as its only movement, so no stage ever
    * sorts the customer population on one task (the window form
    * would; `ntileRank`'s equality with it is spec-pinned). */
  def rfm(orders: DataFrame): DataFrame = {
    val perUser = orders.groupBy(col("o_custkey"))
      .agg(max(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))")).as("__last_us"),
        count(lit(1)).as("frequency"),
        sum(expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")).as("monetary_cents"))
    val ref = orders.agg(max(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))")).as("__ref_us"))
    val base = perUser.crossJoin(broadcast(ref))
      .withColumn("recency_days",
        expr("(__ref_us - __last_us) div 86400000000L"))
    val scored = Seq[(String, Seq[org.apache.spark.sql.Column])](
      "r_score" -> Seq(col("recency_days").desc, col("o_custkey")),
      "f_score" -> Seq(col("frequency"), col("o_custkey")),
      "m_score" -> Seq(col("monetary_cents"), col("o_custkey")))
      .foldLeft(base) { case (df, (score, keys)) =>
        Ids.ntileRank(df, keys, 5, score)
      }
    scored.select(col("o_custkey"), col("recency_days"),
      col("frequency"), col("monetary_cents"),
      col("r_score").cast("bigint").as("r_score"),
      col("f_score").cast("bigint").as("f_score"),
      col("m_score").cast("bigint").as("m_score"),
      (col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
        .cast("bigint").as("rfm_segment"))
  }

  /** Cohort-revenue (LTV) matrix — [[retentionCohorts]]'s money half:
    * customers cohort by the epoch-week of their FIRST order, and each
    * (cohort_week, week_offset) cell carries the exact cents those
    * customers spent that week — the revenue-retention curve cohort
    * LTV reads off. Same pure integer epoch-week arithmetic; one
    * customer-keyed aggregate, one id-keyed join back, one cell
    * aggregate. */
  def cohortRevenue(orders: DataFrame): DataFrame = {
    val week = expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000L div 7")
    val firsts = orders.groupBy(col("o_custkey"))
      .agg(min(week).as("cohort_week"))
    orders.select(col("o_custkey"), week.as("__week"),
        expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").as("__cents"))
      .join(firsts, "o_custkey")
      .groupBy(col("cohort_week"),
        (col("__week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"),
        sum(col("__cents")).as("revenue_cents"))
  }

  /** Punch-card activity grid — events by (weekday, hour-of-day), the
    * classic traffic-shape dashboard. Both axes are pure integer
    * epoch arithmetic — `weekday = (epoch_day + 3) mod 7` (epoch day
    * zero was a Thursday, so +3 makes 0 = Monday) and
    * `hour = epoch_hour mod 24`
    * — so no calendar/timezone function is ever consulted and any
    * engine lands every event in the same cell.
    *
    * Scale shape: one narrow projection + one ≤168-row hash
    * aggregate. */
  def punchcard(events: DataFrame): DataFrame =
    events
      .select(
        expr("(unix_micros(ts) div 86400000000L + 3) % 7").as("weekday"),
        expr("(unix_micros(ts) div 3600000000L) % 24").as("hour_of_day"),
        col("user_id"))
      .groupBy("weekday", "hour_of_day")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))

  /** Revenue-concentration deciles — the inequality report ("what
    * share of revenue do the top 10 % of customers carry"): per-user
    * exact-cents totals, NTILE(10) over the (cents, user) total order
    * (ties deterministic, the q_ntile discipline), and each decile's
    * share in integer parts-per-million (`cents·10⁶ div total`) — no
    * IEEE division until nothing depends on it.
    *
    * Scale shape: one user-keyed aggregate (users rows), the decile
    * via [[Ids.ntileRank]] (two-phase rank — no single-task sort of
    * the customer population; NTILE-exact by spec), a 10-row result;
    * the 1-row total attaches by broadcast cross join. */
  def revenueConcentration(orders: DataFrame): DataFrame = {
    val perUser = orders.groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")).as("__cents"))
    val ranked = Ids.ntileRank(perUser,
      Seq(col("__cents"), col("o_custkey")), 10, "decile")
    val total = perUser.agg(sum(col("__cents")).as("__total"))
    ranked.groupBy("decile")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("__cents")).as("revenue_cents"))
      .crossJoin(broadcast(total))
      .select(col("decile").cast("bigint").as("decile"),
        col("n_customers"), col("revenue_cents"),
        expr("revenue_cents * 1000000L div __total").as("share_ppm"))
  }

  /** Session-depth histogram — the engagement distribution view over
    * [[EventOps.sessionize]]'s intervals: how many sessions contain
    * exactly n events, with the exact integer-cents value mass each
    * depth carries. Reads next to [[peakConcurrency]] (how many at
    * once) as the "how deep" half of the session report.
    *
    * Scale shape: the sessionize exchange (one, keyed on user) feeds a
    * ≤ max-depth-row hash aggregate — nothing new moves. */
  def sessionDepthHistogram(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    EventOps.sessionize(events, gapMinutes)
      .groupBy(col("n_events"))
      .agg(count(lit(1)).as("n_sessions"),
        // session_value is exact DECIMAL(18,2): ×100 is integer cents
        sum(expr("CAST(session_value * 100 AS BIGINT)")).as("value_cents"))

  /** Peak concurrency — the capacity-planning number: the maximum
    * number of user sessions (from [[EventOps.sessionize]]'s
    * gaps-and-islands intervals) active at the same instant, with the
    * FIRST instant it is reached and the session total. A session is
    * active on its inclusive `[session_start, session_end]` span, so at
    * a tied boundary instant the starting session overlaps the ending
    * one (+1 rows order before −1 rows at equal time).
    *
    * The sweep — ±1 deltas at interval endpoints, running sum, global
    * max — is the textbook interval-overlap algorithm, but the naive
    * formulation is a GLOBAL ordered window (one reducer owns every
    * row). This one is the parallel max-prefix-sum instead: range-
    * exchange on the sweep order, one per-partition pass emitting
    * `(Σdelta, max local prefix, first instant achieving it)`, and an
    * O(partitions) driver combine — prefix associativity makes the
    * result independent of where the range boundaries fall, and the
    * first-achiever scan over partitions in range order reproduces the
    * sequential sweep's instant exactly. Nothing is ever globally
    * sorted on one task; at 1000 executors each partition sweeps its
    * time slice independently.
    *
    * Output (one row): `(n_sessions, peak_concurrency, peak_at_us)` —
    * the instant in exact epoch microseconds. */
  def peakConcurrency(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val sessions = EventOps.sessionize(events, gapMinutes)
    val deltas = sessions.select(
        expr("unix_micros(session_start)").as("t"), lit(1L).as("delta"),
        col("user_id"), col("session_id"))
      .unionAll(sessions.select(
        expr("unix_micros(session_end)").as("t"), lit(-1L).as("delta"),
        col("user_id"), col("session_id")))
    val nPart = spark.sessionState.conf.numShufflePartitions
    val ordCols = Seq(col("t"), col("delta").desc, col("user_id"), col("session_id"))
    val summaries = deltas
      .repartitionByRange(nPart, ordCols: _*)
      .sortWithinPartitions(ordCols: _*)
      .select(col("t"), col("delta"))
      .as[(Long, Long)]
      .rdd.mapPartitionsWithIndex { (pid, it) =>
        var run = 0L; var maxPrefix = Long.MinValue; var tAt = 0L
        var starts = 0L
        it.foreach { case (t, d) =>
          run += d
          if (d > 0) starts += 1
          if (run > maxPrefix) { maxPrefix = run; tAt = t }
        }
        Iterator.single((pid, run, maxPrefix, tAt, starts))
      }
      .collect().sortBy(_._1)
    val nSessions = summaries.map(_._5).sum
    var offset = 0L; var peak = 0L; var peakAt: Option[Long] = None
    summaries.foreach { case (_, total, maxPrefix, tAt, _) =>
      if (maxPrefix != Long.MinValue && offset + maxPrefix > peak) {
        peak = offset + maxPrefix; peakAt = Some(tAt)
      }
      offset += total
    }
    Seq((nSessions, peak, peakAt)).toDF(
      "n_sessions", "peak_concurrency", "peak_at_us")
  }

  /** A/B experiment readout: users hash-split into two arms by the
    * [[TextOps.splitAssign]] md5-threshold draw (deterministic,
    * content-free, reshuffle-proof — the assignment an experimentation
    * platform freezes), conversion = the user fired `convEvent` at
    * least `minCount` times (a repeat-purchaser bar — an any-occurrence
    * definition saturates on a dense stream where every user
    * eventually fires every type). Counts are exact integers; the
    * two-proportion pooled
    * z-score composes ONLY IEEE-exactly-rounded double ops (+,−,×,÷,
    * sqrt — the operations both engines must round identically per
    * IEEE-754, unlike ln/exp), with one fixed parenthesization, so
    * even the float statistic hash-matches cross-engine.
    *
    * Scale: one exchange on user_id for the per-user conversion flag,
    * then a 2-row aggregate. */
  def abTest(events: DataFrame, convEvent: String = "purchase",
             minCount: Long = 14L, frac: Double = 0.5): DataFrame = {
    val arm = when(md5(col("user_id").cast("string")) <
      TextOps.hexThreshold(frac), "A").otherwise("B")
    val perUser = events
      .select(col("user_id"), arm.as("arm"),
        when(col("event_type") === convEvent, 1L).otherwise(0L).as("cv"))
      .groupBy("user_id", "arm")
      .agg(when(sum(col("cv")) >= minCount, 1L).otherwise(0L).as("converted"))
    // one conditional aggregate — always exactly one row, even when a
    // tiny cohort lands entirely in one arm (an empty arm reads n=0
    // with NULL rate, never a vanished result)
    val arms = perUser.agg(
      sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === "A", col("converted")).otherwise(0L)).as("conv_a"),
      sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_b"),
      sum(when(col("arm") === "B", col("converted")).otherwise(0L)).as("conv_b"))
    // degenerate pooled rates (0 or 1) have zero standard error — the
    // statistic is undefined there; report NULL, never a 0/0 artifact
    arms.select(
      col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      expr("""CASE WHEN n_a = 0 THEN NULL
             ELSE CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) END""").as("rate_a"),
      expr("""CASE WHEN n_b = 0 THEN NULL
             ELSE CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) END""").as("rate_b"),
      expr("""CASE WHEN n_a = 0 OR n_b = 0
             OR conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b
             THEN NULL ELSE
             ((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)) -
             (CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))) /
             sqrt((((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)) *
             (1.0 - (CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)))) *
             ((1.0 / CAST(n_a AS DOUBLE)) + (1.0 / CAST(n_b AS DOUBLE)))))
             END""")
        .as("z_score"))
  }

  /** Three-step path mining — [[eventPaths]]' transition matrix
    * extended one hop: per-user consecutive event-type triples over
    * the (µs, event_id) total order, with transition counts and
    * distinct-user reach. The "what happens after A→B" table a
    * product-analytics flow view drills into. Same single exchange on
    * user_id; two lags over the per-user window. */
  def eventTrigrams(events: DataFrame, minCount: Long = 2L): DataFrame = {
    val order = Window.partitionBy(col("user_id"))
      .orderBy(expr("unix_micros(ts)"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("__p1", lag(col("event_type"), 1).over(order))
      .withColumn("__p2", lag(col("event_type"), 2).over(order))
      .filter(col("__p2").isNotNull)
      .groupBy(col("__p2").as("step1"), col("__p1").as("step2"),
        col("event_type").as("step3"))
      .agg(count(lit(1)).as("n_paths"),
        countDistinct(col("user_id")).as("n_users"))
      .filter(col("n_paths") >= minCount)
      .orderBy("step1", "step2", "step3")
  }

  /** Exponentially-decayed daily revenue via RECURSIVE CTE — the
    * linear recurrence sₜ = ⌊9·sₜ₋₁/10⌋ + centsₜ that neither a window
    * frame nor an associative aggregate can express (floor breaks
    * associativity — this is the op that motivates recursion in the
    * SQL surface, supported by Spark 4's WITH RECURSIVE and DuckDB
    * alike). ONE template generates both dialects (integer floor
    * division spells `div` on Spark, `//` on DuckDB; day extraction
    * `unix_micros` vs `epoch_us`), the [[graft.operators.GraphOps
    * .purchasePageRankSql]] one-generator discipline, so the engines
    * cannot drift. All integer arithmetic on non-negative cents;
    * recursion depth = active days per type (well under the 100-level
    * default limit); the step join advances every type in the same
    * round, so the recursive plan does work proportional to types, not
    * types × days. */
  /** The step-indexed weekly table the recursion walks. Weekly, not
    * daily: each recursion level costs a fixed scheduling round on
    * Spark (UnionLoop replans per level), so the step axis should be
    * as shallow as the semantics allow — ~5 weekly levels measure
    * ~1 s where 30 daily levels measured 6+ s for the same answer
    * shape. */
  def decayWeeklySql(sparkDialect: Boolean): String = {
    val weekExpr = if (sparkDialect)
      "unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000 div 7"
    else "epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 // 7"
    s"""SELECT event_type, week, cents,
       |  CAST(row_number() OVER (PARTITION BY event_type ORDER BY week) AS BIGINT) - 1 AS i
       |FROM (SELECT event_type, $weekExpr AS week,
       |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
       |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2)""".stripMargin
  }

  /** The recurrence itself, over a named daily relation. */
  def decayRecSql(sparkDialect: Boolean, dailyRef: String): String = {
    val idiv = if (sparkDialect) "div" else "//"
    // the BROADCAST hint keeps each recursion level shuffle-free on
    // Spark (the daily table is days×types rows); DuckDB ignores
    // unknown hints is NOT a thing — emit it only in the Spark dialect
    val hint = if (sparkDialect) "/*+ BROADCAST(d) */ " else ""
    s"""WITH RECURSIVE rec(event_type, i, week, s) AS (
       |  SELECT event_type, i, week, cents FROM $dailyRef WHERE i = 0
       |  UNION ALL
       |  SELECT $hint d.event_type, d.i, d.week, (9 * r.s) $idiv 10 + d.cents
       |  FROM rec r JOIN $dailyRef d
       |    ON d.event_type = r.event_type AND d.i = r.i + 1)
       |SELECT event_type, week, s AS decayed_cents FROM rec
       |ORDER BY event_type, week""".stripMargin
  }

  /** One-text oracle form (DuckDB materializes its CTEs, so the
    * weekly aggregate runs once there; Spark INLINES non-recursive
    * CTEs into every recursion level — 30 daily re-aggregations of
    * the event table measured 10.7 s — so [[decaySpark]] materializes
    * the step table first and recurses over the tiny checkpoint). */
  def decaySeriesSql(sparkDialect: Boolean): String =
    s"""WITH RECURSIVE d AS (
       |${decayWeeklySql(sparkDialect)}),
       |${decayRecSql(sparkDialect, "d").stripPrefix("WITH RECURSIVE ")}""".stripMargin

  /** Spark entry: materialize the step-indexed daily table once
    * (localCheckpoint — ~days×types rows), then run the shared
    * recurrence text over it. */
  def decaySpark(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    // one partition: the step table is weeks×types rows, and every
    // recursion level schedules a task per partition of it — 32 empty
    // tasks per level is pure scheduler latency
    spark.sql(decayWeeklySql(sparkDialect = true))
      .coalesce(1).localCheckpoint(true)
      .createOrReplaceTempView("__graft_decay_daily")
    spark.sql(decayRecSql(sparkDialect = true, "__graft_decay_daily"))
  }

  /** Chi-square test of independence over the segment × order-status
    * contingency table (orders ⋈ customer), with each cell's
    * (O−E)²/E contribution carried in EXACT integer parts-per-million:
    * term = ⌊(o·N − r·c)²·10⁶ / (N·r·c)⌋ with the square taken in
    * DECIMAL(38,0) (HUGEINT on the oracle side) because d² leaves
    * BIGINT at fact scale — a double Σ over cells would be
    * partition-order-dependent; an integer Σ is exact and
    * engine-identical (the [[basketRules]] integer-ppm discipline).
    * Cramér's V then composes from the ppm value through one fixed
    * ÷,√ double chain. */
  def chiSquare(orders: DataFrame, customer: DataFrame): DataFrame = {
    val cells = orders
      .join(broadcast(customer.select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderstatus"))
      .agg(count(lit(1)).as("o"))
    val rows = cells.groupBy("c_mktsegment").agg(sum(col("o")).as("r"))
    val colsT = cells.groupBy("o_orderstatus").agg(sum(col("o")).as("c"))
    val tot = cells.agg(sum(col("o")).as("n"),
      count(lit(1)).as("n_cells"),
      countDistinct(col("c_mktsegment")).as("nr"),
      countDistinct(col("o_orderstatus")).as("nc"))
    cells
      .join(broadcast(rows), "c_mktsegment")
      .join(broadcast(colsT), "o_orderstatus")
      .crossJoin(broadcast(tot))
      .select(col("nr"), col("nc"), col("n"),
        // d = o·N − r·c stays in BIGINT; its square does NOT at scale
        // (150k orders already push d² past 2⁶³), so the squaring and
        // the ppm scaling run in exact DECIMAL(38,0) — 8·10¹⁹·10⁶ has
        // 26 digits, nowhere near the 38-digit ceiling — and the floor
        // division returns to BIGINT (DuckDB mirrors via HUGEINT)
        expr("o * n - r * c").as("d"),
        expr("n * r * c").as("den"))
      .groupBy(col("nr"), col("nc"), col("n"))
      .agg(sum(expr(
        """CAST((CAST(d AS DECIMAL(38,0)) * CAST(d AS DECIMAL(38,0)) * 1000000)
          div CAST(den AS DECIMAL(38,0)) AS BIGINT)"""))
        .as("chi2_ppm"))
      .select(col("n").as("n_orders"),
        ((col("nr") - 1L) * (col("nc") - 1L)).as("dof"),
        col("chi2_ppm"),
        expr("""sqrt((CAST(chi2_ppm AS DOUBLE) / 1000000.0) /
               (CAST(n AS DOUBLE) *
                CAST(CASE WHEN nr - 1 < nc - 1 THEN nr - 1 ELSE nc - 1 END
                  AS DOUBLE)))""").as("cramers_v"))
  }

  /** Lorenz curve of per-customer revenue — the distribution
    * [[giniRevenue]] summarizes, as one row per revenue decile:
    * cumulative customers and cumulative revenue share (exact
    * DECIMAL-scaled floor ppm, the [[chiSquare]] wide-arithmetic
    * discipline so the scaling survives any corpus size). Deciles via
    * the two-phase NTILE; cumulative sums are a ≤buckets-row
    * triangular join. */
  def lorenzCurve(orders: DataFrame, buckets: Int = 10): DataFrame = {
    val perCust = orders.groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")).as("cents"))
    val ranked = graft.operators.Ids.ntileRank(perCust,
      Seq(col("cents"), col("o_custkey")), buckets, "decile")
    val per = ranked.groupBy("decile")
      .agg(count(lit(1)).as("nc"), sum(col("cents")).as("c"))
    val tot = per.agg(sum(col("nc")).as("nt"), sum(col("c")).as("ct"))
    per.as("x").join(per.as("y"), col("y.decile") <= col("x.decile"))
      .groupBy(col("x.decile").as("decile"))
      .agg(sum(col("y.nc")).as("cum_customers"), sum(col("y.c")).as("cum_cents"))
      .crossJoin(broadcast(tot))
      .select(col("decile").cast("bigint").as("decile"),
        col("cum_customers"),
        expr("""CASE WHEN ct = 0 THEN NULL ELSE
               CAST((CAST(cum_cents AS DECIMAL(38,0)) * 1000000)
                 div CAST(ct AS DECIMAL(38,0)) AS BIGINT) END""")
          .as("cum_revenue_ppm"))
      .orderBy("decile")
  }

  /** Exact Gini coefficient of per-customer revenue — the single-number
    * summary over [[revenueConcentration]]'s decile view: ascending
    * exact ranks from the two-phase range-exchange rank ([[Ids
    * .assignIds]] — never a single-task global sort), Σ(rank+1)·centsᵢ
    * as one exact BIGINT, then the standard
    * G = 2·Σi·y₍ᵢ₎ / (n·Σy) − (n+1)/n in a fixed double chain. */
  def giniRevenue(orders: DataFrame): DataFrame = {
    val perCust = orders
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")).as("cents"))
    val ranked = graft.operators.Ids.assignIds(perCust,
      Seq(col("cents"), col("o_custkey")), "__rank")
    ranked.agg(count(lit(1)).as("n"), sum(col("cents")).as("total"),
        sum(expr("(__rank + 1) * cents")).as("iy"))
      .select(col("n").as("n_customers"), col("total").as("total_cents"),
        expr("""CASE WHEN n < 2 OR total = 0 THEN NULL ELSE
               ((2.0 * CAST(iy AS DOUBLE)) /
                (CAST(n AS DOUBLE) * CAST(total AS DOUBLE))) -
               (CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE)) END""")
          .as("gini"))
  }

  /** Per-event-type OLS trend over the daily revenue series: slope /
    * intercept / R² from EXACT integer moments (n, Σx, Σy, Σxy, Σx²,
    * Σy² — x the day offset from each type's first active day, y the
    * day's integer cents), combined in one fixed all-(+,−,×,÷) double
    * chain — deterministic cross-engine for the same reason as
    * [[abTest]]'s z. Centering x at the per-type minimum keeps every
    * moment comfortably inside BIGINT (at a longer horizon or larger
    * corpus, center y the same way). Degenerate series (one day, or
    * constant x/y) yield NULL slope/R² rather than a 0/0 artifact. */
  def dailyTrend(events: DataFrame): DataFrame = {
    val day = expr("unix_micros(ts) div 86400000000L")
    val cents = expr("CAST(ROUND(value * 100) AS BIGINT)")
    val daily = events.filter(col("value").isNotNull)
      .select(col("event_type"), day.as("day"), cents.as("c"))
      .groupBy("event_type", "day").agg(sum(col("c")).as("y"))
    val mins = daily.groupBy("event_type").agg(min(col("day")).as("d0"))
    val m = daily.join(broadcast(mins), "event_type")
      .select(col("event_type"), (col("day") - col("d0")).as("x"), col("y"))
      .groupBy("event_type").agg(
        count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(expr("x * y")).as("sxy"),
        sum(expr("x * x")).as("sxx"), sum(expr("y * y")).as("syy"))
    m.select(col("event_type"), col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("den"),
        (col("n") * col("syy") - col("sy") * col("sy")).as("deny"),
        col("sx"), col("sy"))
      .select(col("event_type"), col("n"),
        expr("""CASE WHEN den = 0 THEN NULL
               ELSE CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END""")
          .as("slope"),
        expr("""CASE WHEN den = 0 THEN NULL
               ELSE (CAST(sy AS DOUBLE) -
                 ((CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) *
                  CAST(sx AS DOUBLE))) / CAST(n AS DOUBLE) END""")
          .as("intercept"),
        expr("""CASE WHEN den = 0 OR deny = 0 THEN NULL
               ELSE (CAST(num AS DOUBLE) * CAST(num AS DOUBLE)) /
                 (CAST(den AS DOUBLE) * CAST(deny AS DOUBLE)) END""")
          .as("r2"))
      .orderBy("event_type")
  }

  /** CUSUM changepoint profile of the daily revenue series (Page 1954
    * cumulative-sum chart): per day, the mean-centered cumulative sum
    * `S_t = Σ_{i≤t}(x_i − x̄)`, SCALED by n to stay in exact integers —
    * `cusum_scaled = n·Σ_{i≤t} x_i − t·Σ x_i = n²·S_t/… ` (same argmax,
    * zero IEEE ops). The day where |the positive drift| peaks
    * (`is_peak`) is the classic level-shift changepoint estimate.
    *
    * Exactness: x_i are integer cents; the prefix sums run through the
    * two-phase [[Ids.prefixSums]] (no single-reducer window); the two
    * corpus scalars attach by broadcast. Bounds: |cusum_scaled| ≤
    * n·Σx — at 10⁵ days × 10¹⁵ total cents this needs DECIMAL(38,0),
    * here (≤4×10³ days, ≤10¹² cents) Long headroom is ~10⁴×. */
  def cusumDaily(orders: DataFrame): DataFrame = {
    val daily = orders
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).as("revenue_cents"))
      .withColumn("__one", lit(1L))
    val cum = Ids.prefixSums(daily, Seq(col("day")),
      Seq("revenue_cents", "__one"))
    val tot = daily.agg(count(lit(1)).cast("bigint").as("__n"),
      sum("revenue_cents").as("__s"))
    val scored = cum.crossJoin(broadcast(tot))
      .select(col("day"), col("revenue_cents"),
        (col("__n") * col("cum_revenue_cents") -
          col("cum___one") * col("__s")).as("cusum_scaled"))
    val peak = scored.agg(max("cusum_scaled").as("__peak"))
    scored.crossJoin(broadcast(peak))
      .select(col("day"), col("revenue_cents"), col("cusum_scaled"),
        (col("cusum_scaled") === col("__peak")).as("is_peak"))
  }
}

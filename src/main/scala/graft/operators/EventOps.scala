package graft.operators

import graft.cdc.Upsert
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Event-stream operators over the `events` table — the batch-queryable
  * faces of the reference's streaming surface (kinesis JSON source
  * `flink-gen.sh:94-110`, watermarked event-time, latest-by-key dedup
  * sink `flink-gen.sh:118-142`).
  */
object EventOps {

  /** Latest event per user — the Fluss-PK-table batch view
    * (reference `tickets-cdc.sql:23-37`): one hash-agg shuffle on the
    * key via max_by, no per-partition sort. */
  def latestByUser(events: DataFrame): DataFrame =
    Upsert.latestByKey(events, Seq("user_id"), Seq("ts", "event_id"))

  /** Changelog join: materialized latest state joined onto a dimension
    * (reference `revenue-analytics.sql:62-63`, tickets_staging ⋈
    * movies_staging). Dimension broadcasts; the state side keeps its
    * agg partitioning. */
  def latestJoinCustomer(events: DataFrame, customer: DataFrame): DataFrame =
    latestByUser(events)
      .join(broadcast(customer), col("user_id") === col("c_custkey"))
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        col("value"), col("c_name").as("user_name"),
        col("c_mktsegment").as("segment"))

  /** Tumbling event-time window aggregate — batch analog of
    * `df.withWatermark(...).groupBy(window(...))`; the reference's agg
    * is unwindowed (`revenue-analytics.sql:46-65`) but windowing is the
    * canonical event-time op its watermark machinery exists for. Money
    * summed as exact decimals (engine-independent). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events.groupBy(
        date_trunc("hour", col("ts")).as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(12, 2))).cast(DecimalType(18, 2)).as("total_value"))

  /** JSON decode of the payload column — the Kinesis source's
    * `'format'='json'` against a declared schema (`flink-gen.sh:109`). */
  def decodeProps(events: DataFrame): DataFrame =
    events.select(col("event_id"),
      get_json_object(col("props"), "$.k").cast(LongType).as("k"))

  /** Deterministic pseudo-random sample — the generator's `ORDER BY
    * RANDOM() LIMIT n` (reference gen_data.py:131,176) made reproducible:
    * order by md5(key) (uniform, engine-portable) with the key as
    * tie-break. A global top-n: Spark's TakeOrderedAndProject keeps it
    * one pass + driver-side n merge, no full sort materialization. */
  def sampleOrders(orders: DataFrame, n: Int): DataFrame =
    orders.orderBy(md5(col("o_orderkey").cast("string")), col("o_orderkey"))
      .limit(n)

  /** Deterministic STRATIFIED sample: the md5-order top-n of
    * [[sampleOrders]] taken per group — equal representation per
    * stratum regardless of stratum skew (the training-data "balance by
    * source/language" primitive). Window-ranked; the shuffle carries
    * only the group key + md5 rank inputs. */
  def sampleOrdersStratified(orders: DataFrame, perGroup: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderstatus")
      .orderBy(md5(col("o_orderkey").cast("string")), col("o_orderkey"))
    orders.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perGroup).drop("__rn")
  }

  /** Top-k aggregate (sort+limit over a grouped sum): biggest customers
    * by exact decimal revenue. */
  def topCustomers(orders: DataFrame, customer: DataFrame, k: Int): DataFrame =
    orders.groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast(DecimalType(12, 2)))
        .cast(DecimalType(18, 2)).as("revenue"),
        count(lit(1)).as("n_orders"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey").as("custkey"), col("c_name").as("name"),
        col("revenue"), col("n_orders"))
      .orderBy(col("revenue").desc, col("custkey"))
      .limit(k)

  /** Semi/anti joins — free on Spark (SURVEY §2.4), surfaced for
    * completeness: customers with / without open orders. */
  def customersWithOpenOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(orders.filter(col("o_orderstatus") === "O"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))

  def customersWithoutOpenOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(orders.filter(col("o_orderstatus") === "O"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  /** Full outer join: one segment's customers against per-customer
    * open-order counts — rows survive from BOTH unmatched sides
    * (customers with no open orders, open-order customers outside the
    * segment), the join mode the semi/anti pair doesn't cover. The
    * aggregate runs BEFORE the join, so the outer join matches one row
    * per key (never fan-out) and the null-producing side is small. */
  def segmentOrderCoverage(customer: DataFrame, orders: DataFrame,
                           segment: String = "BUILDING"): DataFrame = {
    val l = customer.filter(col("c_mktsegment") === segment)
      .select(col("c_custkey"), col("c_name"))
    val r = orders.filter(col("o_orderstatus") === "O")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_open"))
    l.join(r, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_name"), col("n_open"))
  }

  /** Top-k rows per group via the bounded-heap aggregator
    * ([[graft.functions.TopKAggregator]] — the ANN ranking primitive on
    * relational data): top `k` orders per status by (price desc, key
    * asc). The window formulation (the oracle's QUALIFY row_number)
    * sorts every row per group; this exchanges ≤ groups×k entries with
    * map-side partial reduction — the difference at 100 TB between a
    * per-group sort and a streaming pass. */
  def topOrdersPerStatus(orders: DataFrame, k: Int = 3): DataFrame =
    orders
      .select(col("o_orderstatus"), col("o_orderkey"),
        col("o_totalprice").cast("double").as("price"))
      .groupBy("o_orderstatus")
      .agg(graft.functions.TopKAggregator.topK(k)(
        col("o_orderkey"), col("price")).as("top"))
      .select(col("o_orderstatus"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("o_orderstatus"), (col("pos") + 1).cast("bigint").as("rank"),
        col("e._1").as("o_orderkey"), col("e._2").as("price"))

  /** IQR outlier flags — the Tukey-fence data-cleaning pass: per-group
    * exact quartiles (both engines sort-and-interpolate identically,
    * as in the quantiles query), fences at p25/p75 ± 1.5·IQR, one
    * boolean per row. Two passes over the group: a quartile aggregate
    * (driver-small result, broadcast back) and the narrow flag scan —
    * no window, no per-row sort. */
  def outlierFlags(orders: DataFrame): DataFrame = {
    val q = orders.groupBy("o_orderstatus")
      .agg(expr("percentile(o_totalprice, 0.25)").as("p25"),
        expr("percentile(o_totalprice, 0.75)").as("p75"))
      .select(col("o_orderstatus"),
        (col("p25") - (col("p75") - col("p25")) * 1.5).as("lo"),
        (col("p75") + (col("p75") - col("p25")) * 1.5).as("hi"))
    orders.select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast("double").as("price"))
      .join(broadcast(q), "o_orderstatus")
      .select(col("o_orderkey"), col("o_orderstatus"), col("price"),
        (col("price") < col("lo") || col("price") > col("hi")).as("is_outlier"))
  }

  /** Per-user distinct event-type sets — the list-aggregation surface
    * (ARRAY_AGG/collect_set) made deterministic: collect_set order is
    * partition-dependent, so the sort is what lets an array-valued
    * aggregate agree across engines and partitionings (emitted joined
    * as a string — a scalar cell for any hasher). One shuffle on
    * user_id, set cells only. */
  def eventTypeSets(events: DataFrame): DataFrame =
    events.groupBy("user_id")
      .agg(concat_ws(",", sort_array(collect_set(col("event_type")))).as("types"),
        count(lit(1)).as("n_events"))

  /** Sessionization: gaps-and-islands over event time per user — a
    * session breaks after `gapMinutes` of inactivity. Composed from
    * lag + a running sum of boundary flags (bit-identical to the SQL
    * oracle's formulation); one shuffle on user_id. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val flagged = events.withColumn("__prev", lag(col("ts"), 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("__prev")) > gapMinutes * 60L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("__new_session"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        sum(col("value").cast(DecimalType(12, 2))).cast(DecimalType(18, 2)).as("session_value"))
  }

  /** Distinct aggregates (COUNT(DISTINCT ...)): distinct users and
    * event types per hour. */
  def distinctAgg(events: DataFrame): DataFrame =
    events.groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("event_type")).as("n_types"),
        count(lit(1)).as("n_events"))

  /** Scalar-expression surface of the reference in one operator:
    * CASE WHEN on a status enum (`revenue-analytics.sql:53-58`),
    * COALESCE null-default (`gen_data.py:33`), equality predicates and
    * timestamp extraction. */
  def enriched(events: DataFrame): DataFrame =
    events.select(
      col("event_id"), col("user_id"), col("event_type"),
      when(col("event_type") === "purchase", col("value"))
        .otherwise(lit(0.0)).as("purchase_value"),
      coalesce(col("value"), lit(0.0)).as("value_or_zero"),
      (col("event_type") === "error").cast("int").as("is_error"),
      hour(col("ts")).as("event_hour"))

  /** Out-of-orderness profile — the report that SIZES a watermark
    * delay before wiring a streaming job: per key (`user_id`),
    * arrival order = `event_id` (the changelog's insert sequence);
    * each event's lateness is the running-max event time seen so far
    * on its key minus its own event time, histogrammed by bit-width
    * buckets (bucket = number of binary digits of lateness_ms, an
    * integer-exact stand-in for ⌈log₂⌉ both engines compute as
    * `length(bin(x))`). Reading the result: the largest populated
    * bucket bounds the watermark delay that would have captured every
    * event; the counts show the tail mass a tighter delay drops.
    *
    * Scale shape: ONE sort-based window partitioned by key (the same
    * per-key ordering any keyed-state streaming operator already
    * implies — no global sort), then a ≤64-row hash aggregate.
    * Millisecond truncation on both engines per the cross-engine
    * timestamp rule. */
  def latenessProfile(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("__ms"))
      .withColumn("__late", max(col("__ms")).over(w) - col("__ms"))
      .groupBy(length(bin(col("__late"))).cast("bigint").as("lateness_bits"))
      .agg(count(lit(1)).as("n_events"),
        min(col("__late")).as("min_lateness_ms"),
        max(col("__late")).as("max_lateness_ms"))
  }

  /** Join-key skew profile — the report that decides SALTING before a
    * big join ships: per-key row counts histogrammed by bit-width
    * buckets (bucket = binary digits of the key's count), with each
    * bucket's key tally, row mass, and heaviest key count. A top
    * bucket holding a few keys with a large share of the rows is the
    * AQE-unreachable skew [[graft.operators.Skew]] salts.
    *
    * Scale shape: one count aggregate keyed on the join key (the same
    * shuffle the join itself would do), then a ≤64-row aggregate over
    * one row per key. */
  def keySkewProfile(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("__c"))
      .groupBy(length(bin(col("__c"))).cast("bigint").as("count_bits"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("__c")).as("n_rows"),
        max(col("__c")).as("max_key_count"))

  /** Per-user inter-arrival gap profile — the report that SIZES the
    * sessionization gap and complements [[latenessProfile]]'s
    * watermark sizing: consecutive-event time deltas per user over
    * the (µs, event_id) total order, summarized as exact integer
    * min/max and the interpolated median (both engines interpolate
    * identically on exact integer operands, the `q_quantiles`
    * precedent). Reading it: a session gap above most users' p50 and
    * below their max splits real visits, not think-time.
    *
    * Scale shape: one exchange on the key + per-partition sort for
    * the lag (the ordering any keyed timeline op already implies),
    * then one hash aggregate per user. */
  def interArrival(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("__us"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("__us"))
      .withColumn("__gap", col("__us") - lag(col("__us"), 1).over(order))
      .filter(col("__gap").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"),
        min(col("__gap")).as("min_gap_us"),
        max(col("__gap")).as("max_gap_us"),
        expr("percentile(__gap, 0.5)").as("p50_gap_us"))
  }

  /** Relative-standing scores per order within its status: SQL
    * `percent_rank` (rank−1)/(n−1) and `cume_dist` — both divisions
    * of exact integers, so the doubles agree cross-engine; ties break
    * nowhere (rank semantics are value-determined). Completes the
    * ranking-window breadth next to NTILE/row_number/rank. */
  def orderPercentiles(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("cents"))
    orders.select(col("o_orderkey"), col("o_orderstatus"),
        expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").as("cents"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume_dist", cume_dist().over(w))
  }

  /** Per-customer order-cadence profile: gaps between consecutive
    * orders in whole days over the (date, orderkey) total order —
    * exact integer min/max and the bit-agreeing interpolated median
    * (the [[interArrival]] shape on the purchase timeline; sizes
    * reorder-reminder campaigns). Single-order customers are absent
    * (no gap exists). */
  def orderGaps(orders: DataFrame): DataFrame =
    orders
      .select(col("o_custkey"), col("o_orderkey"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("__us"))
      .withColumn("__gap",
        expr("__us - lag(__us, 1) OVER (PARTITION BY o_custkey ORDER BY __us, o_orderkey)"))
      .withColumn("__gap", expr("__gap div 86400000000L"))
      .filter(col("__gap").isNotNull)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_gaps"),
        min(col("__gap")).as("min_gap_days"),
        expr("percentile(__gap, 0.5)").as("p50_gap_days"),
        max(col("__gap")).as("max_gap_days"))

  /** Per-key rolling time-window aggregate — a RANGE frame over event
    * time (`RANGE BETWEEN <window> PRECEDING AND CURRENT ROW`), the
    * trailing-window analytics shape the row-frame running totals of
    * `q_window_funcs` cannot express (peers at the same instant share
    * one frame; gaps shrink it). Spend is summed in integer cents over
    * exact epoch-microsecond ordering, so the frame boundary and the
    * sum are both engine-exact; one rounded division presents dollars.
    *
    * Scale shape: the standard distributed window — one exchange on
    * the partition key, per-partition sort, and a sliding frame whose
    * state is bounded by the window span (never the partition); at
    * 1000 executors each key's timeline stays on one task and nothing
    * else moves. */
  def rollingWindow(events: DataFrame, windowSeconds: Long = 3600L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("__us"))
      .rangeBetween(-windowSeconds * 1000000L, 0L)
    events
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_micros(col("ts")).as("__us"),
        expr("CAST(ROUND(value * 100) AS BIGINT)").as("__cents"))
      .select(col("user_id"), col("event_id"), col("ts"),
        (sum(col("__cents")).over(w).cast("double") / 100.0)
          .as("rolling_value_1h"),
        count(lit(1)).over(w).cast("bigint").as("rolling_events_1h"))
  }
}

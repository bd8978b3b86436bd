package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classic decision-support star joins over the full TPC-H-ish
  * dimensional model — the multi-way-join shapes the reference's
  * revenue MV (`revenue-analytics.sql:55-66`, facts ⋈ two dimensions)
  * implies but never widens past two tables. These are the plans that
  * matter at 100 TB: one shuffle join between the two fact tables
  * (lineitem ⋈ orders on the orderkey they are both naturally keyed
  * by), every dimension broadcast (customer/supplier/part are
  * O(SF·150k) rows — MB-scale against a TB-scale fact), filters pushed
  * into the parquet scans before any join, and all money arithmetic in
  * exact integer cents (the [[Revenue]] idiom) so sums are
  * partition-order-insensitive and hash-match the oracle bit-for-bit.
  */
object DecisionSupport {

  private def extCents = expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)")
  private def discCents = expr("CAST(ROUND(l_discount * 100) AS BIGINT)")

  /** Regional same-nation revenue (the TPC-H Q5 shape): for one
    * region and one order-date year, revenue from lineitems whose
    * supplier and ordering customer sit in the SAME nation — the
    * 6-way star join (region → nation → {customer, supplier} →
    * orders → lineitem). Revenue is Σ ext_cents·(100 − disc_cents)
    * in 10⁻⁴ currency units, presented as one exact-integer→double
    * division.
    *
    * Plan: orders' date filter prunes at its scan; customer, supplier,
    * nation, region all broadcast (the same-nation predicate rides the
    * two broadcast joins as an ordinary equi-column comparison); the
    * only exchange is lineitem ⋈ orders on orderkey, followed by the
    * partial+final agg on the 25-key nation grouping. */
  def regionalRevenue(region: DataFrame, nation: DataFrame,
                      customer: DataFrame, supplier: DataFrame,
                      orders: DataFrame, lineitem: DataFrame,
                      regionName: String = "ASIA",
                      yearStart: String = "1996-01-01",
                      yearEnd: String = "1997-01-01"): DataFrame = {
    val natInRegion = nation
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = customer
      .join(broadcast(natInRegion), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
    // testdata date columns are parquet TIMESTAMP(isAdjustedToUTC=false)
    // → Spark reads TIMESTAMP_NTZ; comparing against an NTZ literal
    // keeps the predicate native (and parquet-pushable) instead of
    // forcing a cast onto every row of the scan.
    val ord = orders
      .filter(col("o_orderdate").cast("timestamp_ntz") >=
          lit(yearStart).cast("timestamp_ntz") &&
        col("o_orderdate").cast("timestamp_ntz") <
          lit(yearEnd).cast("timestamp_ntz"))
      .select(col("o_orderkey"), col("o_custkey"))
    lineitem
      .select(col("l_orderkey"), col("l_suppkey"),
        (extCents * (lit(100L) - discCents)).as("rev_e4"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("rev_e4")).as("rev_sum"), count(lit(1)).as("n_items"))
      .select(col("n_name"),
        (col("rev_sum").cast("double") / lit(10000.0)).as("revenue"),
        col("n_items"))
      .orderBy(col("n_name"))
  }

  /** Shipping priority (the TPC-H Q3 shape): the k unshipped orders —
    * ordered before the cutoff, shipped after it — with the highest
    * outstanding revenue, for one market segment. The tie-break
    * happens on the EXACT integer revenue before the presentation
    * cast, so the top-k frontier is deterministic on both engines.
    *
    * Plan: both date filters push into the fact scans; the segment
    * filter prunes customer before its broadcast; lineitem ⋈ orders
    * is the one exchange; top-k is a TakeOrdered (never a global
    * sort). */
  def shippingPriority(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame,
                       segment: String = "BUILDING",
                       cutoff: String = "1998-01-01",
                       k: Int = 10): DataFrame = {
    val cust = customer.filter(col("c_mktsegment") === segment)
      .select(col("c_custkey"))
    val ord = orders
      .filter(col("o_orderdate").cast("timestamp_ntz") <
        lit(cutoff).cast("timestamp_ntz"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    lineitem
      .filter(col("l_shipdate").cast("timestamp_ntz") >
        lit(cutoff).cast("timestamp_ntz"))
      .select(col("l_orderkey"),
        (extCents * (lit(100L) - discCents)).as("rev_e4"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(col("rev_e4")).as("rev_sum"))
      .orderBy(col("rev_sum").desc, col("o_orderkey"))
      .limit(k)
      .select(col("o_orderkey"),
        (col("rev_sum").cast("double") / lit(10000.0)).as("revenue"),
        col("o_orderdate"), col("o_orderpriority"))
  }

  /** Brand gross margin by supplier nation × order year (the TPC-H Q9
    * shape, with `p_retailprice` standing in for the missing
    * partsupp.ps_supplycost): margin = Σ [ext_cents·(100 − disc_cents)
    * − retail_cents·qty_cents] in 10⁻⁴ units — discounted revenue
    * minus list-price cost of goods, every operand an exact integer.
    *
    * Plan: part and supplier⋈nation broadcast onto the lineitem scan
    * BEFORE the orderkey shuffle (the margin expression only needs
    * part columns, so the broadcast join attaches them map-side);
    * lineitem ⋈ orders on orderkey is again the single exchange;
    * the (25 nations × years) grouping is tiny. */
  def nationMargin(part: DataFrame, supplier: DataFrame, nation: DataFrame,
                   orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val retailCents = expr("CAST(ROUND(p_retailprice * 100) AS BIGINT)")
    val qtyCents = expr("CAST(ROUND(l_quantity * 100) AS BIGINT)")
    val supNat = supplier
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    lineitem
      .join(broadcast(part.select(col("p_partkey"),
        retailCents.as("retail_cents"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(supNat), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("n_name"),
        (extCents * (lit(100L) - discCents) -
          col("retail_cents") * qtyCents).as("margin_e4"))
      .join(orders.select(col("o_orderkey"),
        year(col("o_orderdate")).cast("bigint").as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(sum(col("margin_e4")).as("margin_sum"),
        count(lit(1)).as("n_items"))
      .select(col("n_name"), col("o_year"),
        (col("margin_sum").cast("double") / lit(10000.0)).as("margin"),
        col("n_items"))
      .orderBy(col("n_name"), col("o_year"))
  }

  /** Fulfillment-latency distribution: order→ship delay in whole days
    * (exact integer floor of the µs difference) summarized per order
    * priority — count / min / p50 / p90 / max. `percentile` over
    * integer inputs sorts exactly and interpolates in double, so both
    * engines agree to the last bit (the q_quantiles precedent).
    *
    * Plan: one orderkey shuffle join, one 5-key aggregate; the
    * percentile state is the per-group sorted delay list — bounded by
    * group size, which at 100 TB argues for the sketch tier
    * ([[Sketches]]) when priorities are few but groups are billions
    * of rows; at report granularity this exact form is the oracle. */
  def fulfillmentLatency(orders: DataFrame, lineitem: DataFrame): DataFrame =
    lineitem
      .select(col("l_orderkey"), expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))").as("__ship_us"))
      .join(orders.select(col("o_orderkey"), col("o_orderpriority"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("__ord_us")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        expr("(__ship_us - __ord_us) div 86400000000L").as("__delay"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        min(col("__delay")).as("min_days"),
        expr("percentile(__delay, 0.5)").as("p50_days"),
        expr("percentile(__delay, 0.9)").as("p90_days"),
        max(col("__delay")).as("max_days"))
      .orderBy("o_orderpriority")

  /** Discount→volume response per brand: Pearson r between line-item
    * discount and quantity from EXACT integer cent-moments (the
    * [[Stats.autocorr]] discipline — n, Σ, ΣΣ in BIGINT, one fixed
    * +,−,×,÷,√ double chain). A strongly negative or near-zero r per
    * brand answers "does discounting actually move volume here?" —
    * the merchandising twin of the trend/seasonality reports. Brands
    * attach via one broadcast of the part dimension; constant columns
    * report NULL. */
  def discountElasticity(part: DataFrame, lineitem: DataFrame): DataFrame = {
    val discC = expr("CAST(ROUND(l_discount * 100) AS BIGINT)")
    val qtyC = expr("CAST(ROUND(l_quantity * 100) AS BIGINT)")
    lineitem
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), discC.as("x"), qtyC.as("y"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(expr("x * y")).as("sxy"),
        sum(expr("x * x")).as("sxx"), sum(expr("y * y")).as("syy"))
      .select(col("p_brand"), col("n"),
        expr("""CASE WHEN n < 2
               OR n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
               ELSE CAST(n * sxy - sx * sy AS DOUBLE) /
                 (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
                  sqrt(CAST(n * syy - sy * sy AS DOUBLE))) END""")
          .as("discount_qty_corr"))
      .orderBy("p_brand")
  }

  /** Return-rate report by supplier nation: lines and revenue flagged
    * `R` as exact counts/cents, rates in integer parts-per-million
    * (floor — the engine's rate idiom). The quality-of-supply view the
    * returnflag column exists for. */
  def returnRates(supplier: DataFrame, nation: DataFrame,
                  lineitem: DataFrame): DataFrame = {
    val supNat = supplier
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    lineitem
      .select(col("l_suppkey"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("ret"),
        extCents.as("cents"))
      .join(broadcast(supNat), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("ret")).as("n_returned"),
        sum(col("cents")).as("total_cents"),
        sum(expr("ret * cents")).as("returned_cents"))
      .select(col("n_name"), col("n_lines"), col("n_returned"),
        expr("(n_returned * 1000000L) div n_lines").as("return_ppm"),
        expr("""CASE WHEN total_cents = 0 THEN NULL
               ELSE (returned_cents * 1000000L) div total_cents END""")
          .as("returned_value_ppm"))
      .orderBy("n_name")
  }

  /** Supplier concentration per part — the Herfindahl–Hirschman index
    * over quantity shares: HHI = Σqᵢ² / (Σqᵢ)² with qᵢ the exact
    * integer centi-units each supplier ships of the part. 1/HHI is the
    * effective supplier count; HHI→1 flags single-sourced parts. Two
    * chained aggregations (part×supplier, then part), one final
    * division of exact integers. */
  def supplierHhi(lineitem: DataFrame): DataFrame = {
    val qtyCents = expr("CAST(ROUND(l_quantity * 100) AS BIGINT)")
    lineitem
      .select(col("l_partkey"), col("l_suppkey"), qtyCents.as("q"))
      .groupBy("l_partkey", "l_suppkey").agg(sum(col("q")).as("qs"))
      .groupBy("l_partkey")
      .agg(count(lit(1)).as("n_suppliers"),
        sum(expr("qs * qs")).as("sq2"), sum(col("qs")).as("sq"))
      .select(col("l_partkey"), col("n_suppliers"),
        expr("""CAST(sq2 AS DOUBLE) /
               (CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))""").as("hhi"))
      .orderBy("l_partkey")
  }

  /** Laspeyres price index by ship month — the fixed-basket inflation
    * measure: `P_t = Σ p_t(i)·q_0(i) / Σ p_0(i)·q_0(i)` over the parts
    * present in BOTH month t and the base (earliest) month, with
    * base-month quantities as the fixed weights. Unit prices are exact
    * integer cents (`floor(ext·100) div qty` — MIN per part-month, a
    * deterministic representative), quantities exact integers, so both
    * sums are integers and the index is one floor-div ppm.
    *
    * Scale shape: one shuffle to (part, month) cells; the base-month
    * slice re-joins by part (broadcastable: one month's parts); output
    * O(months). */
  def priceIndex(lineitem: DataFrame): DataFrame = {
    val cells = lineitem.select(
        col("l_partkey"),
        expr("year(l_shipdate) * 12 + month(l_shipdate)").cast("long")
          .as("m"),
        expr("""CAST(floor(l_extendedprice * 100) AS BIGINT)
                div CAST(l_quantity AS BIGINT)""").as("unit"),
        expr("CAST(l_quantity AS BIGINT)").as("qty"))
      .groupBy("l_partkey", "m")
      .agg(min("unit").as("p"), sum("qty").as("q"))
    val base = cells.agg(min("m").as("m0"))
    val baseCells = cells.join(broadcast(base), cells("m") === col("m0"))
      .select(col("l_partkey"), col("p").as("p0"), col("q").as("q0"))
    cells.join(baseCells, "l_partkey")
      .groupBy("m")
      .agg(count(lit(1)).cast("bigint").as("n_parts"),
        sum(expr("p * q0")).as("__num"), sum(expr("p0 * q0")).as("__den"))
      .select(col("m").as("ship_month"), col("n_parts"),
        expr("(__num * 1000000L) div __den").as("index_ppm"))
      .orderBy("ship_month")
  }

  /** The full index triple per ship month — Laspeyres (base-month
    * weights), Paasche (current-month weights), and Fisher (their
    * geometric mean, the superlative index): both component ratios are
    * integer-sum floor-div ppm like [[priceIndex]], and Fisher is ONE
    * exactly-rounded `sqrt` of their exact integer product — the whole
    * triple stays engine-portable. */
  def fisherIndex(lineitem: DataFrame): DataFrame = {
    val cells = lineitem.select(
        col("l_partkey"),
        expr("year(l_shipdate) * 12 + month(l_shipdate)").cast("long")
          .as("m"),
        expr("""CAST(floor(l_extendedprice * 100) AS BIGINT)
                div CAST(l_quantity AS BIGINT)""").as("unit"),
        expr("CAST(l_quantity AS BIGINT)").as("qty"))
      .groupBy("l_partkey", "m")
      .agg(min("unit").as("p"), sum("qty").as("q"))
    val base = cells.agg(min("m").as("m0"))
    val baseCells = cells.join(broadcast(base), cells("m") === col("m0"))
      .select(col("l_partkey"), col("p").as("p0"), col("q").as("q0"))
    cells.join(baseCells, "l_partkey")
      .groupBy("m")
      .agg(count(lit(1)).cast("bigint").as("n_parts"),
        sum(expr("p * q0")).as("__ln"), sum(expr("p0 * q0")).as("__ld"),
        sum(expr("p * q")).as("__pn"), sum(expr("p0 * q")).as("__pd"))
      .select(col("m").as("ship_month"), col("n_parts"),
        expr("(__ln * 1000000L) div __ld").as("laspeyres_ppm"),
        expr("(__pn * 1000000L) div __pd").as("paasche_ppm"),
        expr("""sqrt(CAST(((__ln * 1000000L) div __ld)
                * ((__pn * 1000000L) div __pd) AS DOUBLE))""")
          .as("fisher_ppm"))
      .orderBy("ship_month")
  }

  /** Month-over-month revenue bridge — the FP&A waterfall: for the
    * parts present in BOTH adjacent months, the revenue delta
    * decomposes EXACTLY as `Δ(p·q) = Δp·q₋ + p₋·Δq + Δp·Δq` (price
    * effect at old volumes, volume effect at old prices, joint term).
    * All four columns are exact integer cents — the identity
    * `price+volume+joint = Δ common-basket revenue` holds bit-for-bit
    * (spec-pinned), which a float pipeline cannot promise.
    *
    * Same (part, month) cells as [[priceIndex]]; adjacency is a
    * month+1 equi-join, no window. */
  def revenueBridge(lineitem: DataFrame): DataFrame = {
    val cells = lineitem.select(
        col("l_partkey"),
        expr("year(l_shipdate) * 12 + month(l_shipdate)").cast("long")
          .as("m"),
        expr("""CAST(floor(l_extendedprice * 100) AS BIGINT)
                div CAST(l_quantity AS BIGINT)""").as("unit"),
        expr("CAST(l_quantity AS BIGINT)").as("qty"))
      .groupBy("l_partkey", "m")
      .agg(min("unit").as("p"), sum("qty").as("q"))
    val prev = cells.select(col("l_partkey"), (col("m") + 1L).as("m"),
      col("p").as("p0"), col("q").as("q0"))
    cells.join(prev, Seq("l_partkey", "m"))
      .groupBy("m")
      .agg(count(lit(1)).cast("bigint").as("n_parts"),
        sum(expr("(p - p0) * q0")).as("price_effect_cents"),
        sum(expr("p0 * (q - q0)")).as("volume_effect_cents"),
        sum(expr("(p - p0) * (q - q0)")).as("joint_effect_cents"),
        sum(expr("p * q - p0 * q0")).as("delta_revenue_cents"))
      .select(col("m").as("ship_month"), col("n_parts"),
        col("price_effect_cents"), col("volume_effect_cents"),
        col("joint_effect_cents"), col("delta_revenue_cents"))
      .orderBy("ship_month")
  }

  /** Minimum-cost supplier per part — the TPC-H Q2 shape (reference
    * semantics: the correlated scalar-subquery "supplier with the
    * minimum cost for this part") over the tables the fixture ships:
    * unit cost proxied as exact integer cents-per-unit from lineitem,
    * `floor(extendedprice·100) div quantity`. Returns every (part,
    * supplier) pair achieving the per-part minimum (ties kept — the
    * deterministic answer set).
    *
    * Spark-first decorrelation: the correlated `= (SELECT min(...)
    * WHERE same part)` becomes a groupBy-min + equi-join back — the
    * exact rewrite Catalyst's `RewriteCorrelatedScalarSubquery` would
    * produce, declared directly so the plan is a plain agg + join AQE
    * can broadcast (the min side is |parts| rows, two columns). At
    * 100 TB both sides shuffle on `l_partkey` once; no per-row
    * subquery ever exists. */
  def minCostSupplier(lineitem: DataFrame): DataFrame = {
    val unit = lineitem.select(col("l_partkey"), col("l_suppkey"),
      expr("""CAST(floor(l_extendedprice * 100) AS BIGINT)
              div CAST(l_quantity AS BIGINT)""").as("unit_cents"))
    val mins = unit.groupBy("l_partkey")
      .agg(min("unit_cents").as("min_unit_cents"))
    unit.join(mins, Seq("l_partkey"))
      .filter(col("unit_cents") === col("min_unit_cents"))
      .select(col("l_partkey"), col("l_suppkey"), col("min_unit_cents"))
      .distinct()
      .orderBy("l_partkey", "l_suppkey")
  }

  /** Weekly open-order BACKLOG time series: orders open at week w =
    * (orders placed in weeks ≤ w) − (orders fully shipped in weeks
    * ≤ w, close = the order's LAST lineitem ship date). The fact-sized
    * work is two partial+final aggregates (one per fact table); the
    * cumulative difference then runs over the calendar-BOUNDED weekly
    * table (a few hundred rows at any scale factor), where a window
    * is the honest plan. The ops/capacity report every fulfillment
    * team tracks. */
  def weeklyBacklog(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val opened = orders
      .groupBy(expr("CAST(date_trunc('week', o_orderdate) AS DATE)").as("wk"))
      .agg(count(lit(1)).cast("bigint").as("n_opened"))
    val closed = lineitem
      .groupBy("l_orderkey")
      .agg(max("l_shipdate").as("closed_on"))
      .groupBy(expr("CAST(date_trunc('week', closed_on) AS DATE)").as("wk"))
      .agg(count(lit(1)).cast("bigint").as("n_closed"))
    val wkly = opened.join(closed, Seq("wk"), "full_outer")
      .select(col("wk"),
        coalesce(col("n_opened"), lit(0L)).as("n_opened"),
        coalesce(col("n_closed"), lit(0L)).as("n_closed"))
    val w = Window.orderBy("wk")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wkly
      .withColumn("backlog",
        (sum("n_opened").over(w) - sum("n_closed").over(w)).cast("bigint"))
      .orderBy("wk")
  }

  /** Longest strictly-increasing DAILY-revenue streaks — the
    * gaps-and-islands census (streak id = day rank − rank within the
    * increasing run) over the calendar-bounded daily table: the
    * fact-sized work is one partial+final daily aggregate; every
    * window after that runs over O(days) rows. Reports each streak
    * length ≥ `minLen` with how many streaks reached it. */
  def revenueStreaks(orders: DataFrame, minLen: Int = 3): DataFrame = {
    val daily = orders
      .groupBy(col("o_orderdate").as("d"))
      .agg(sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).as("cents"))
    val byDay = Window.orderBy("d")
    val flagged = daily
      .withColumn("up",
        when(col("cents") > lag("cents", 1).over(byDay), 1).otherwise(0))
      .withColumn("rn", row_number().over(byDay))
      // island id: constant within a run of up=1 rows (the anchor
      // non-increasing day starts each island)
      .withColumn("island",
        col("rn") - sum("up").over(
          byDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.filter(col("up") === 1)
      .groupBy("island")
      // streak length counts the anchor day too: a run of k `up` days
      // is k+1 strictly-increasing daily revenues
      .agg((count(lit(1)) + 1L).cast("bigint").as("streak_days"))
      .filter(col("streak_days") >= minLen)
      .groupBy("streak_days")
      .agg(count(lit(1)).cast("bigint").as("n_streaks"))
      .orderBy("streak_days")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Customer/supplier lifecycle analytics over the order history — the
  * retention and share-shift reports run over the tiered lake tables
  * (reference `deploy:318-358`). Integer-exact throughout (cents /
  * ppm / bps / day gaps), with rank products widened through
  * DECIMAL(38,0) so nothing wraps at 100 TB. */
object CustomerOps {

  /** Spearman rank correlation between line quantity and extended
    * price per return flag, with the statistically standard AVERAGE
    * ranks for ties — ties are a fact of both columns (quantity has a
    * 50-value domain), and average ranks are the only assignment
    * that is well-defined independent of row order, so both engines
    * agree bit-for-bit. Ranks are DOUBLED to stay integer
    * (R = 2·below + cnt + 1 = 2 × the average rank), which turns
    * ρ = 1 − 6·Σd_avg²/(n·(n²−1)) into the exact integer form
    * 1 − 3·Σd²/(2·n·(n²−1)) on DECIMAL(38,0) — reported in ppm.
    *
    * Scale shape: ranking happens on the VALUE-LEVEL count table
    * (O(distinct values) rows), cumulated by the two-phase grouped
    * prefix sum ([[Ids.prefixSumsGrouped]] — never a window
    * partitioned on the 3-value flag, which would sort a flag's whole
    * slice on one task), then joined back by (flag, value) — two
    * equi-joins on bounded dims. Window-form equality is spec-pinned
    * (`CustomerOpsSpec`). */
  def spearmanQuantityPrice(lineitem: DataFrame): DataFrame =
    spearmanFrom(lineitem, useWindow = false)

  /** Reference form of [[spearmanQuantityPrice]]: the value-level
    * cumulative counts via a window partitioned on the flag
    * (single-task per flag — never the wired scale path); exists for
    * the equality spec and small inputs. */
  private[operators] def spearmanQuantityPriceWindow(
      lineitem: DataFrame): DataFrame =
    spearmanFrom(lineitem, useWindow = true)

  private def spearmanFrom(lineitem: DataFrame,
                           useWindow: Boolean): DataFrame = {
    val base = lineitem.select(col("l_returnflag"),
      expr("CAST(l_quantity AS BIGINT)").as("qty"),
      expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").as("cents"))
    // doubled average rank per distinct value:
    // R(v) = 2·(rows below v) + cnt(v) + 1
    def ranks(valueCol: String, rankCol: String): DataFrame = {
      val cnts = base.groupBy(col("l_returnflag"), col(valueCol))
        .agg(count(lit(1)).as("_c"))
      val cum =
        if (useWindow) {
          val w = Window.partitionBy("l_returnflag").orderBy(col(valueCol))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          cnts.withColumn("cum__c", sum(col("_c")).over(w))
        } else Ids.prefixSumsGrouped(cnts, Seq("l_returnflag"),
          Seq(col(valueCol)), Seq("_c"))
      cum.select(col("l_returnflag").as(s"_f_$rankCol"),
        col(valueCol).as(s"_v_$rankCol"),
        expr("2 * (cum__c - _c) + _c + 1").as(rankCol))
    }
    base
      .join(ranks("qty", "r_qty"),
        col("l_returnflag") === col("_f_r_qty") && col("qty") === col("_v_r_qty"))
      .join(ranks("cents", "r_price"),
        col("l_returnflag") === col("_f_r_price") &&
          col("cents") === col("_v_r_price"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(expr("""CAST(r_qty - r_price AS DECIMAL(38,0))
                 * (r_qty - r_price)""")).as("sd2"))
      .select(col("l_returnflag"), col("n").cast("bigint").as("n_lines"),
        expr("""CAST(1000000 - (CAST(3 AS DECIMAL(38,0)) * sd2 * 1000000)
               div (CAST(2 AS DECIMAL(38,0)) * n
                    * (CAST(n AS DECIMAL(38,0)) * n - 1)) AS BIGINT)""")
          .as("spearman_ppm"))
      .orderBy("l_returnflag")
  }

  /** Churn-risk census per market segment: customers whose LAST order
    * predates the dataset's max order date by more than `days` vs the
    * still-active rest — exact day arithmetic against a broadcast
    * scalar anchor. */
  def churnRisk(orders: DataFrame, customer: DataFrame,
                days: Int = 90): DataFrame = {
    val last = orders.groupBy("o_custkey")
      .agg(max(expr("CAST(o_orderdate AS DATE)")).as("last_order"))
    val anchor = orders.agg(
      max(expr("CAST(o_orderdate AS DATE)")).as("__max_date"))
    last.crossJoin(broadcast(anchor))
      .join(customer.select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        sum(expr(s"CASE WHEN datediff(__max_date, last_order) > $days " +
          "THEN 1 ELSE 0 END")).cast("bigint").as("n_at_risk"),
        sum(expr(s"CASE WHEN datediff(__max_date, last_order) <= $days " +
          "THEN 1 ELSE 0 END")).cast("bigint").as("n_active"))
      .orderBy("c_mktsegment")
  }

  /** Reorder-gap histogram: days between a customer's consecutive
    * orders (lag over the (date, orderkey) total order), bucketed by
    * 30-day month — the purchase-cadence distribution behind
    * replenishment forecasting. Exact counts. */
  def reorderGaps(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(expr("CAST(o_orderdate AS DATE)"), col("o_orderkey"))
    orders
      .withColumn("prev",
        lag(expr("CAST(o_orderdate AS DATE)"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(expr("datediff(CAST(o_orderdate AS DATE), prev)").as("gap_days"))
      .select(expr("CASE WHEN gap_days < 0 THEN -1 ELSE gap_days div 30 END")
        .cast("bigint").as("gap_month"))
      .groupBy("gap_month")
      .agg(count(lit(1)).cast("bigint").as("n_gaps"))
      .orderBy("gap_month")
  }

  /** Slow movers: parts with NO sale in the trailing `days` of the
    * data window — distinct-part and lifetime-revenue census (one
    * row). The anchor is a broadcast scalar; the freshness test is a
    * per-part max, never a self-join. */
  def slowMovers(lineitem: DataFrame, days: Int = 90): DataFrame = {
    val anchor = lineitem.agg(
      max(expr("CAST(l_shipdate AS DATE)")).as("__max_date"))
    lineitem.groupBy("l_partkey")
      .agg(max(expr("CAST(l_shipdate AS DATE)")).as("last_ship"),
        sum(expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")).as("cents"))
      .crossJoin(broadcast(anchor))
      .agg(
        sum(expr(s"CASE WHEN datediff(__max_date, last_ship) > $days " +
          "THEN 1 ELSE 0 END")).cast("bigint").as("n_slow_parts"),
        sum(expr(s"CASE WHEN datediff(__max_date, last_ship) > $days " +
          "THEN cents ELSE 0 END")).cast("bigint").as("slow_revenue_cents"),
        count(lit(1)).cast("bigint").as("n_parts"))
  }

  /** Supplier revenue share shift: each supplier's exact ppm share of
    * first-half revenue vs second-half (the midpoint splits the
    * dataset's date range), shift = the signed difference — the
    * share-of-wallet drift report. Broadcast scalar anchors; one
    * groupBy over lineitem. */
  def supplierShareShift(lineitem: DataFrame): DataFrame = {
    val anchor = lineitem.agg(
      expr("""CAST(min(CAST(l_shipdate AS DATE)) AS DATE)""").as("__lo"),
      expr("""CAST(max(CAST(l_shipdate AS DATE)) AS DATE)""").as("__hi"))
    val tagged = lineitem.crossJoin(broadcast(anchor))
      .select(col("l_suppkey"),
        expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").as("cents"),
        expr("""CASE WHEN datediff(CAST(l_shipdate AS DATE), __lo) * 2
                <= datediff(__hi, __lo) THEN 1 ELSE 2 END""").as("half"))
    val per = tagged.groupBy("l_suppkey")
      .agg(sum(expr("CASE WHEN half = 1 THEN cents ELSE 0 END")).as("c1"),
        sum(expr("CASE WHEN half = 2 THEN cents ELSE 0 END")).as("c2"))
    val totals = tagged.agg(
      sum(expr("CASE WHEN half = 1 THEN cents ELSE 0 END")).as("__t1"),
      sum(expr("CASE WHEN half = 2 THEN cents ELSE 0 END")).as("__t2"))
    per.crossJoin(broadcast(totals))
      .select(col("l_suppkey").cast("bigint").as("l_suppkey"),
        expr("""CAST(CAST(c1 AS DECIMAL(38,0)) * 1000000
               div CAST(__t1 AS DECIMAL(38,0)) AS BIGINT)""").as("share1_ppm"),
        expr("""CAST(CAST(c2 AS DECIMAL(38,0)) * 1000000
               div CAST(__t2 AS DECIMAL(38,0)) AS BIGINT)""").as("share2_ppm"))
      .withColumn("shift_ppm",
        expr("share2_ppm - share1_ppm").cast("bigint"))
      .orderBy("l_suppkey")
  }

  /** Discount-dispersion histogram: per part, the spread between its
    * max and min discount in exact basis points; parts bucketed by
    * that spread — the pricing-consistency audit. */
  def discountDispersion(lineitem: DataFrame): DataFrame = {
    lineitem.groupBy("l_partkey")
      .agg(min(expr("CAST(ROUND(l_discount * 10000) AS BIGINT)")).as("min_bps"),
        max(expr("CAST(ROUND(l_discount * 10000) AS BIGINT)")).as("max_bps"))
      .select(expr("max_bps - min_bps").as("spread_bps"))
      .groupBy("spread_bps")
      .agg(count(lit(1)).cast("bigint").as("n_parts"))
      .orderBy("spread_bps")
  }

  /** Order-size histogram: orders per line count — the basket-size
    * distribution. */
  def orderSizeHistogram(lineitem: DataFrame): DataFrame = {
    lineitem.groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_lines"))
      .groupBy("n_lines")
      .agg(count(lit(1)).cast("bigint").as("n_orders"))
      .select(col("n_lines").cast("bigint").as("n_lines"), col("n_orders"))
      .orderBy("n_lines")
  }

  /** Repeat-purchase rate per segment: one-time vs repeat customers
    * and the exact repeat ppm. */
  def repeatRate(orders: DataFrame, customer: DataFrame): DataFrame = {
    orders.groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
      .join(customer.select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        sum(expr("CASE WHEN n_orders = 1 THEN 1 ELSE 0 END"))
          .cast("bigint").as("n_one_time"),
        sum(expr("CASE WHEN n_orders > 1 THEN 1 ELSE 0 END"))
          .cast("bigint").as("n_repeat"))
      .withColumn("repeat_ppm", expr(
        "(n_repeat * 1000000L) div (n_one_time + n_repeat)").cast("bigint"))
      .orderBy("c_mktsegment")
  }

  /** Near-duplicate invoice detection — pairs of SAME-CUSTOMER orders
    * whose totals differ by ≤ `centsTol` and whose dates are ≤
    * `dayTol` apart (the double-billing / double-entry audit every
    * billing system runs). Blocked self-join: equality on the
    * customer key FIRST (a customer's order count is bounded —
    * never the all-pairs O(n²)), then the two tolerance bands inside
    * the block; `k1 < k2` de-mirrors. Reported as a per-priority
    * census of suspect pairs. */
  def invoiceNearMatches(orders: DataFrame, centsTol: Long = 50000L,
                         dayTol: Int = 30): DataFrame = {
    val base = orders.select(col("o_custkey"), col("o_orderkey"),
      col("o_orderdate"),
      expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"),
      col("o_orderpriority"))
    val left = base.columns.foldLeft(base)((d, c) => d.withColumnRenamed(c, s"l_$c"))
    val right = base.columns.foldLeft(base)((d, c) => d.withColumnRenamed(c, s"r_$c"))
    left.join(right,
        col("l_o_custkey") === col("r_o_custkey") &&
          col("l_o_orderkey") < col("r_o_orderkey") &&
          abs(col("l_cents") - col("r_cents")) <= lit(centsTol) &&
          abs(datediff(col("l_o_orderdate"), col("r_o_orderdate"))) <= lit(dayTol))
      .groupBy(col("l_o_orderpriority").as("o_orderpriority"))
      .agg(count(lit(1)).cast("bigint").as("n_pairs"),
        countDistinct(col("l_o_custkey")).cast("bigint").as("n_customers"),
        sum(abs(col("l_cents") - col("r_cents"))).cast("bigint")
          .as("sum_cents_gap"))
      .orderBy("o_orderpriority")
  }

  /** Revenue-decile migration matrix between two halves of the
    * history: each customer's H1 and H2 revenue deciles (1 = top) and
    * how many customers moved from decile i to j — the
    * upsell/churn-drift report. Deciles via [[Ids.ntileRank]] (the
    * two-phase exact NTILE — at 10⁹ customers the window form sorts
    * them on one task); customers active in BOTH halves only. */
  def decileMigration(orders: DataFrame,
                      splitDate: String = "1995-07-01"): DataFrame = {
    def half(filtered: DataFrame, out: String): DataFrame =
      Ids.ntileRank(
        filtered.groupBy("o_custkey")
          .agg(sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
            .as("cents")),
        Seq(col("cents").desc, col("o_custkey")), 10, out)
        .select(col("o_custkey"), col(out))
    val h1 = half(orders.filter(col("o_orderdate") < lit(splitDate)), "d1")
    val h2 = half(orders.filter(col("o_orderdate") >= lit(splitDate)), "d2")
    h1.join(h2, "o_custkey")
      .select(col("o_custkey"),
        col("d1").cast("bigint").as("d1"), col("d2").cast("bigint").as("d2"))
      .groupBy("d1", "d2")
      .agg(count(lit(1)).cast("bigint").as("n_customers"))
      .orderBy("d1", "d2")
  }

  /** Histogram of per-customer MEDIAN reorder gaps (days between
    * consecutive orders): the gap windows partition on the customer
    * key (bounded per-customer order counts — never a global sort),
    * the median is the exact interpolated percentile of integer day
    * gaps (so it is k or k+0.5 exactly — doubled to stay integer),
    * and the output is the bounded histogram of doubled medians. */
  def medianReorderGapHistogram(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val gaps = orders
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      .withColumn("gap",
        datediff(col("o_orderdate"), lag("o_orderdate", 1).over(w)))
      .filter(col("gap").isNotNull)
    gaps.groupBy("o_custkey")
      // EXACT percentile (not approx): (a+b)/2 of integer gaps is an
      // exactly-representable double, ×2 restores the integer
      .agg((expr("percentile(gap, 0.5)") * 2)
        .cast("bigint").as("median_gap_x2"))
      .groupBy("median_gap_x2")
      .agg(count(lit(1)).cast("bigint").as("n_customers"))
      .orderBy("median_gap_x2")
  }
}

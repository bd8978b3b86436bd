package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market/behavior analytics over the order and event streams — the
  * downstream reports a reference user would run over the tiered lake
  * tables (`deploy:318-358` makes them batch-queryable for exactly
  * this). All integer-exact (counts / ppm / cents), with the only
  * self-join keyed per order (bounded fan-out), never all-pairs
  * global. */
object MarketOps {

  /** Market-basket pair lift: for part pairs co-occurring in an order,
    * support and lift — lift_ppm = 10⁶ · P(ab) / (P(a)·P(b)) in exact
    * integer arithmetic over DECIMAL(38,0). The pair join is keyed on
    * the ORDER (bounded items per order → bounded fan-out), the
    * classic a-priori first sweep. Top pairs by support, ties on the
    * keys. */
  def basketPairLift(lineitem: DataFrame, minSupport: Int = 3,
                     topK: Int = 20): DataFrame = {
    val items = lineitem.select("l_orderkey", "l_partkey").distinct()
    val counts = items.groupBy("l_partkey").agg(count(lit(1)).as("n_part"))
    val nOrders = items.select("l_orderkey").distinct()
      .agg(count(lit(1)).as("__orders"))
    val a = items.toDF("okey", "p1")
    val b = items.toDF("okey2", "p2")
    val pairs = a.join(b, col("okey") === col("okey2") && col("p1") < col("p2"))
      .groupBy("p1", "p2").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    pairs
      .join(counts.toDF("pk1", "n_a"), col("p1") === col("pk1"))
      .join(counts.toDF("pk2", "n_b"), col("p2") === col("pk2"))
      .crossJoin(broadcast(nOrders))
      .select(col("p1").cast("bigint").as("p1"),
        col("p2").cast("bigint").as("p2"),
        col("n_ab").cast("bigint").as("n_ab"),
        expr("""CAST(CAST(n_ab AS DECIMAL(38,0)) * __orders * 1000000
               div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)""")
          .as("lift_ppm"))
      .orderBy(col("n_ab").desc, col("p1"), col("p2"))
      .limit(topK)
  }

  /** First-order Markov transition census of the event stream: per
    * user, events in (ts, event_id) order; count each event_type →
    * next-event_type transition and its ppm share of the from-state's
    * outgoing edges. One window pass + one groupBy — the session-flow
    * model behind "what do users do after X?". */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = events
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val fromTotals = trans.groupBy("from_type").agg(sum("n").as("__from_n"))
    trans.join(fromTotals, "from_type")
      .select(col("from_type"), col("to_type"), col("n").cast("bigint").as("n"),
        expr("(n * 1000000L) div __from_n").cast("bigint").as("share_ppm"))
      .orderBy("from_type", "to_type")
  }

  /** New-vs-returning weekly census: per epoch week, how many distinct
    * customers ordered for the FIRST time vs returned. Weeks are exact
    * integer epoch-day÷7 (both engines floor on non-negatives), the
    * cohort anchor is a per-customer min — the acquisition dashboard's
    * backbone. */
  def newVsReturning(orders: DataFrame): DataFrame = {
    val weekly = orders
      .select(col("o_custkey"),
        expr("unix_date(CAST(o_orderdate AS DATE)) div 7").as("week"))
      .distinct()
    val first = weekly.groupBy("o_custkey").agg(min("week").as("first_week"))
    weekly.join(first, "o_custkey")
      .groupBy("week")
      .agg(sum(expr("CASE WHEN week = first_week THEN 1 ELSE 0 END"))
          .cast("bigint").as("n_new"),
        sum(expr("CASE WHEN week > first_week THEN 1 ELSE 0 END"))
          .cast("bigint").as("n_returning"))
      .orderBy("week")
  }

  /** Order→ship lag histogram: days from order date to each line's
    * ship date, bucketed by week — the fulfillment-SLA census. The lag
    * join is the orderkey equi-join; buckets clamp negatives into one
    * guard bucket so `div` truncation equals the oracle's floor. */
  def shipLagHistogram(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    lineitem.select(col("l_orderkey"), col("l_shipdate"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(expr(
        "datediff(CAST(l_shipdate AS DATE), CAST(o_orderdate AS DATE))")
        .as("lag_days"))
      .select(expr("CASE WHEN lag_days < 0 THEN -1 ELSE lag_days div 7 END")
        .as("lag_week"))
      .groupBy("lag_week")
      .agg(count(lit(1)).cast("bigint").as("n_lines"))
      .orderBy("lag_week")
  }

  /** Same-day duplicate-order screen: (customer, order date) groups
    * holding more than one order — the double-billing / replay audit.
    * Reports per order-status group and row counts, exact. */
  def duplicateOrders(orders: DataFrame): DataFrame = {
    val dups = orders
      .groupBy("o_custkey", "o_orderdate")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
    dups.agg(count(lit(1)).cast("bigint").as("n_dup_groups"),
      coalesce(sum(col("n")), lit(0L)).cast("bigint").as("n_dup_orders"),
      coalesce(max(col("n")), lit(0L)).cast("bigint").as("max_group_size"))
  }

  /** Gini impurity of the order-priority distribution WITHIN each
    * status — the split-quality measure a decision-tree/stratification
    * step uses (1 − Σp²), exact in ppm: per-cell counts are integers,
    * Σcnt² widens through DECIMAL(38,0), and the ppm division is
    * integer floor — no transcendental entropy, so both engines agree
    * bit-for-bit. Scale shape: one partial+final aggregate to the
    * bounded (status × priority) cell table, everything after is
    * O(cells). */
  def giniImpurity(orders: DataFrame): DataFrame = {
    val cells = orders.groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).cast("bigint").as("cnt"))
    cells.groupBy("o_orderstatus")
      .agg(sum("cnt").cast("bigint").as("n"),
        count(lit(1)).cast("bigint").as("n_classes"),
        sum(expr("CAST(cnt AS DECIMAL(38,0)) * CAST(cnt AS DECIMAL(38,0))"))
          .as("__sq"))
      .withColumn("impurity_ppm", expr(
        """CAST(1000000 - (__sq * 1000000) div
          |(CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)))
          |AS BIGINT)""".stripMargin))
      .select(col("o_orderstatus"), col("n"), col("n_classes"),
        col("impurity_ppm"))
      .orderBy("o_orderstatus")
  }

  /** Modal order priority per status (the grouped MODE, with the
    * deterministic larger-string tie-break): counts to the bounded
    * cell table, then one max-struct per group — never a sort of fact
    * rows. */
  def modalPriority(orders: DataFrame): DataFrame = {
    orders.groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).cast("bigint").as("cnt"))
      .groupBy("o_orderstatus")
      .agg(max(struct(col("cnt"), col("o_orderpriority"))).as("__m"))
      .select(col("o_orderstatus"),
        col("__m.o_orderpriority").as("modal_priority"),
        col("__m.cnt").as("n_orders"))
      .orderBy("o_orderstatus")
  }
}

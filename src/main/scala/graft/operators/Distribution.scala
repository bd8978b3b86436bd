package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-shape analytics over fact tables (reference: the
  * `movie_revenue_realtime` MV feeds exactly this kind of downstream
  * report, `flink-cdc/sql/revenue-analytics.sql:46-65`). Exact-integer
  * cents/ppm with DECIMAL(38,0) wide intermediates (HUGEINT on the
  * oracle side). Gini/Lorenz/Benford live in [[Analytics]]; this holds
  * the classification members. */
object Distribution {

  /** ABC inventory classification of parts by revenue: parts sorted by
    * revenue descending (ties on the key), class A = the head of the
    * curve up to 80 % cumulative share, B to 95 %, C the tail — the
    * stocking-policy census, reported per class. Shares are exact ppm
    * on DECIMAL(38,0).
    *
    * Scale shape: one groupBy to per-part revenue (map-side combined),
    * then the cumulative share rides [[Ids.prefixSums]] — range
    * exchange on (cents desc, partkey) + per-partition running windows
    * + O(partitions) driver offsets. The parts table is
    * scale-factor-proportional, so a global unpartitioned window here
    * would funnel every per-part row through one task. */
  def abcClassification(lineitem: DataFrame): DataFrame = {
    val per = lineitem
      .groupBy("l_partkey")
      .agg(sum(expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")).as("cents"))
    val total = per.agg(sum(col("cents")).as("__total"))
    Ids.prefixSums(per, Seq(col("cents").desc, col("l_partkey")), Seq("cents"))
      .crossJoin(broadcast(total))
      .withColumn("cum_ppm",
        expr("""CAST(CAST(cum_cents AS DECIMAL(38,0)) * 1000000
               div CAST(__total AS DECIMAL(38,0)) AS BIGINT)"""))
      .withColumn("abc_class",
        expr("""CASE WHEN cum_ppm <= 800000 THEN 'A'
                WHEN cum_ppm <= 950000 THEN 'B' ELSE 'C' END"""))
      .groupBy("abc_class")
      .agg(count(lit(1)).cast("bigint").as("n_parts"),
        sum(col("cents")).cast("bigint").as("revenue_cents"))
      .orderBy("abc_class")
  }

  /** ABC classification of SUPPLIERS within each nation — the grouped
    * twin of [[abcClassification]]: per-(nation, supplier) revenue,
    * cumulative share WITHIN the nation via
    * [[Ids.prefixSumsGrouped]] (range exchange on (nation, cents desc,
    * suppkey), per-slice running sums, O(nations·partitions) driver
    * offsets — a per-nation window would funnel each nation's whole
    * supplier roster through one task), class thresholds at 80/95 %
    * ppm, reported per (nation, class). */
  def abcByNation(lineitem: DataFrame, supplier: DataFrame,
                  nation: DataFrame): DataFrame = {
    val per = lineitem
      .groupBy("l_suppkey")
      .agg(sum(expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")).as("cents"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("l_suppkey"), col("cents"))
    val totals = per.groupBy("n_name")
      .agg(sum(col("cents")).as("__total"))
    Ids.prefixSumsGrouped(per, Seq("n_name"),
        Seq(col("cents").desc, col("l_suppkey")), Seq("cents"))
      .join(broadcast(totals), Seq("n_name"))
      .withColumn("cum_ppm",
        expr("""CAST(CAST(cum_cents AS DECIMAL(38,0)) * 1000000
               div CAST(__total AS DECIMAL(38,0)) AS BIGINT)"""))
      .withColumn("abc_class",
        expr("""CASE WHEN cum_ppm <= 800000 THEN 'A'
                WHEN cum_ppm <= 950000 THEN 'B' ELSE 'C' END"""))
      .groupBy("n_name", "abc_class")
      .agg(count(lit(1)).cast("bigint").as("n_suppliers"),
        sum(col("cents")).cast("bigint").as("revenue_cents"))
      .orderBy("n_name", "abc_class")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
    * one global window over O(parts) rows, one broadcast scalar. */
  def abcClassification(lineitem: DataFrame): DataFrame = {
    val per = lineitem
      .groupBy("l_partkey")
      .agg(sum(expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")).as("cents"))
    val w = Window.orderBy(col("cents").desc, col("l_partkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = per.agg(sum(col("cents")).as("__total"))
    per.withColumn("cum_cents", sum(col("cents")).over(w))
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
}

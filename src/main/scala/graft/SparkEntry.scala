package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Revenue
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_revenue_mv")(spark, "/root/testdata/sf0.001")

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Reference flagship: movie_revenue_realtime MV analog
    // (revenue-analytics.sql:46-65) on lineitem⋈part.
    "q_revenue_mv" -> ((s, dir) =>
      Revenue.movieRevenue(
        Revenue.ticketsFromLineitem(t(s, dir, "lineitem")),
        Revenue.moviesFromPart(t(s, dir, "part")),
        Revenue.testdataStatuses)
      .orderBy("movie_id"))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_revenue_mv" ->
      """SELECT l_partkey AS movie_id, p_name AS movie_title,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(15,2)) AS total_revenue,
        |  COUNT(*) AS ticket_count,
        |  CAST(CAST((2 * CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) * 100 AS BIGINT) + COUNT(*)) // (2 * COUNT(*)) AS DECIMAL(12,0)) * CAST(0.01 AS DECIMAL(3,2)) AS DECIMAL(10,2)) AS avg_ticket_price,
        |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS scheduled_tickets,
        |  CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS live_tickets,
        |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS finished_tickets,
        |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END) AS DECIMAL(15,2)) AS scheduled_revenue,
        |  CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END) AS DECIMAL(15,2)) AS live_revenue,
        |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END) AS DECIMAL(15,2)) AS finished_revenue,
        |  CAST(NULL AS TIMESTAMP) AS start_date,
        |  p_size AS duration_minutes,
        |  MAX(l_shipdate) AS last_ticket_purchased
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate IS NOT NULL
        |GROUP BY l_partkey, p_name, p_size
        |ORDER BY movie_id""".stripMargin
  )
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{EventOps, Projections, Revenue}
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
      .orderBy("movie_id")),

    // CDC projections (tickets-cdc.sql:69-77 etc.): projection+rename,
    // column pruning reaches the scan.
    "q_proj_tickets" -> ((s, dir) =>
      sorted(Projections.tickets(t(s, dir, "lineitem")))),
    "q_proj_movies" -> ((s, dir) =>
      sorted(Projections.movies(t(s, dir, "part")))),
    "q_proj_users" -> ((s, dir) =>
      sorted(Projections.users(t(s, dir, "customer")))),

    // Fluss-PK-table stand-in: latest-by-key upsert materialization.
    "q_upsert_latest" -> ((s, dir) =>
      sorted(EventOps.latestByUser(t(s, dir, "events")))),
    // Changelog join: latest state ⋈ broadcast dimension.
    "q_changelog_join" -> ((s, dir) =>
      sorted(EventOps.latestJoinCustomer(
        t(s, dir, "events"), t(s, dir, "customer")))),
    // Event-time tumbling window aggregate.
    "q_window_agg" -> ((s, dir) =>
      sorted(EventOps.tumblingCounts(t(s, dir, "events")))),
    // Kinesis-style JSON payload decode (flink-gen.sh:109).
    "q_json_decode" -> ((s, dir) =>
      sorted(EventOps.decodeProps(t(s, dir, "events")))),
    // Scalar expression surface: CASE WHEN / COALESCE / predicates.
    "q_scalar_exprs" -> ((s, dir) =>
      sorted(EventOps.enriched(t(s, dir, "events"))))
  )

  /** Deterministic output order: sort by every column (ties included)
    * so Spark and oracle row orders are comparable however the driver
    * hashes. Verify-path cost only. */
  private def sorted(df: DataFrame): DataFrame =
    df.orderBy(df.columns.map(org.apache.spark.sql.functions.col).toSeq: _*)

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
        |ORDER BY movie_id""".stripMargin,

    "q_proj_tickets" ->
      """SELECT l_orderkey AS ticket_id, l_partkey AS movie_id, l_suppkey AS user_id,
        |  CAST(l_extendedprice AS DECIMAL(10,2)) AS cost, l_returnflag AS status,
        |  l_shipdate AS purchased_at
        |FROM lineitem ORDER BY ALL NULLS FIRST""".stripMargin,

    "q_proj_movies" ->
      """SELECT p_partkey AS movie_id, p_name AS title, p_type AS description,
        |  p_size AS duration_minutes
        |FROM part ORDER BY ALL NULLS FIRST""".stripMargin,

    "q_proj_users" ->
      """SELECT c_custkey AS user_id, c_name AS username,
        |  c_name || '@example.com' AS email, c_mktsegment AS full_name
        |FROM customer ORDER BY ALL NULLS FIRST""".stripMargin,

    "q_upsert_latest" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |      FROM events) WHERE rn = 1
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q_changelog_join" ->
      """WITH latest AS (
        |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |          ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |        FROM events) WHERE rn = 1)
        |SELECT l.user_id, l.event_id, l.ts, l.event_type, l.value,
        |  c.c_name AS user_name, c.c_mktsegment AS segment
        |FROM latest l JOIN customer c ON l.user_id = c.c_custkey
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q_window_agg" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY ALL NULLS FIRST""".stripMargin,

    "q_json_decode" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY ALL NULLS FIRST""".stripMargin,

    "q_scalar_exprs" ->
      """SELECT event_id, user_id, event_type,
        |  CASE WHEN event_type = 'purchase' THEN value ELSE CAST(0 AS DOUBLE) END AS purchase_value,
        |  COALESCE(value, CAST(0 AS DOUBLE)) AS value_or_zero,
        |  CAST(event_type = 'error' AS INTEGER) AS is_error,
        |  CAST(EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS INTEGER) AS event_hour
        |FROM events ORDER BY ALL NULLS FIRST""".stripMargin
  )
}

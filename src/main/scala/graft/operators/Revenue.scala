package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The reference's flagship computation: the continuously-maintained
  * `movie_revenue_realtime` materialized view
  * (reference `flink-cdc/sql/revenue-analytics.sql:22-65`) — a PK–FK
  * inner join of the tickets fact stream onto the movies dimension,
  * followed by a grouped aggregate with per-status conditional sums.
  *
  * Declared fully in DataFrame ops so Catalyst picks the physical plan:
  * the dimension side broadcasts (no shuffle of the fact table for the
  * join), and the aggregate runs partial→final (the reference requests
  * the same via `'table.optimizer.agg-phase-strategy'='TWO_PHASE'`,
  * `revenue-analytics.sql:9`). At 100 TB the only required shuffle is the
  * final agg exchange on the group key, which AQE sizes at runtime.
  */
object Revenue {

  /** Statuses of the reference's ticket CHECK constraint
    * (`postgres-source/init-scripts/01-init.sql:46`). The testdata analog
    * binds these to `l_returnflag ∈ {A,N,R}`. */
  final case class StatusDomain(scheduled: String, live: String, finished: String)
  val osbStatuses: StatusDomain = StatusDomain("scheduled", "live", "finished")

  /** Exact decimal money arithmetic: the reference computes over
    * `DECIMAL(10,2)` costs into `DECIMAL(15,2)` sums
    * (`revenue-analytics.sql:26-34`); decimal sums are exact and
    * order-insensitive, which also makes results reproducible across
    * engines and partitionings — a correctness property, not a style one. */
  private val Money = DecimalType(15, 2)

  /** Build the MV from OSB-shaped inputs.
    *
    * tickets: (ticket_id, movie_id, user_id, cost: Decimal, status, purchased_at)
    * movies:  (movie_id, title, start_date, duration_minutes, ...)
    *
    * Mirrors `revenue-analytics.sql:46-65` column-for-column.
    */
  def movieRevenue(tickets: DataFrame, movies: DataFrame,
                   statuses: StatusDomain = osbStatuses): DataFrame = {
    // Per-row arithmetic in integer cents, DECIMAL(15,2) restored once
    // per GROUP at the boundary: a sum over DECIMAL(12,2) carries a
    // precision-22 buffer, past Spark's compact-long fast path (18
    // digits), so every row's += allocates through java BigDecimal —
    // and the r5 bench probe showed that allocation+string decimal hot
    // loops are also JIT-deopt-unstable (2s ↔ 43s on identical plans).
    // A DECIMAL(12,2) cost is exactly a ≤14-digit cent count, so long
    // sums are value-identical and pure codegen'd integer math; the
    // group count (~#movies) bounds the decimal conversions.
    // ×100 via a DECIMAL(3,0) literal: an int literal would promote to
    // DECIMAL(23,2) (per-row BigDecimal); (12,2)×(3,0)=(16,2) stays
    // compact-long, and the long cast of an integral scale-2 value is exact.
    val cents = (col("cost") * lit(100).cast(DecimalType(3, 0))).cast("long")
    def ifStatus(s: String, v: Column): Column =
      sum(when(col("status") === s, v).otherwise(lit(0L)))
    def money(c: Column): Column =
      (c.cast(DecimalType(18, 0)) * lit(java.math.BigDecimal.valueOf(1, 2))
        .cast(DecimalType(3, 2))).cast(Money)

    tickets
      .filter(col("purchased_at").isNotNull)           // revenue-analytics.sql:64
      .join(broadcast(movies), Seq("movie_id"))        // :62-63 (PK–FK inner)
      .groupBy(col("movie_id"), col("title").as("movie_title"),
               col("start_date"), col("duration_minutes"))  // :65
      .agg(
        sum(cents).as("__cents"),                                    // :50
        count(lit(1)).as("ticket_count"),                            // :51
        ifStatus(statuses.scheduled, lit(1L)).as("scheduled_tickets"),  // :53
        ifStatus(statuses.live, lit(1L)).as("live_tickets"),            // :54
        ifStatus(statuses.finished, lit(1L)).as("finished_tickets"),    // :55
        money(ifStatus(statuses.scheduled, cents)).as("scheduled_revenue"), // :56
        money(ifStatus(statuses.live, cents)).as("live_revenue"),           // :57
        money(ifStatus(statuses.finished, cents)).as("finished_revenue"),   // :58
        max(col("purchased_at")).as("last_ticket_purchased"))        // :61
      .withColumn("total_revenue", money(col("__cents")))
      // avg_ticket_price (:52) in exact integer-cents arithmetic
      // (round-half-up): floating division rounds differently across
      // engines/summation orders; `(2c+n) div 2n` of exact cents does not.
      .withColumn("avg_ticket_price", expr(
        """cast(cast((2 * __cents + ticket_count)
          |  div (2 * ticket_count) as decimal(12,0)) * cast(0.01 as decimal(3,2))
          |  as decimal(10,2))""".stripMargin))
      .select("movie_id", "movie_title", "total_revenue", "ticket_count",
        "avg_ticket_price", "scheduled_tickets", "live_tickets",
        "finished_tickets", "scheduled_revenue", "live_revenue",
        "finished_revenue", "start_date", "duration_minutes",
        "last_ticket_purchased")
  }

  /** Testdata binding (FIXTURES.md §B): lineitem plays tickets
    * (l_extendedprice→cost, l_returnflag→status, l_shipdate→purchased_at),
    * part plays movies. */
  def ticketsFromLineitem(lineitem: DataFrame): DataFrame = lineitem.select(
    col("l_orderkey").as("ticket_id"),
    col("l_partkey").as("movie_id"),
    col("l_suppkey").as("user_id"),
    col("l_extendedprice").cast(DecimalType(12, 2)).as("cost"),
    col("l_returnflag").as("status"),
    col("l_shipdate").as("purchased_at"))

  def moviesFromPart(part: DataFrame): DataFrame = part.select(
    col("p_partkey").as("movie_id"),
    col("p_name").as("title"),
    // part has no timestamp; a fixed epoch keeps the MV schema complete.
    lit(null).cast("timestamp").as("start_date"),
    col("p_size").as("duration_minutes"))

  val testdataStatuses: StatusDomain = StatusDomain("A", "N", "R")
}

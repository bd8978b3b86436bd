package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The reference's CDC projection queries — the `INSERT INTO
  * <staging> SELECT <cols> FROM <cdc-source>` select-lists
  * (reference `flink-cdc/sql/tickets-cdc.sql:68-77`,
  * `movies-cdc.sql:59-68`, `users-cdc.sql:57-65`): pure column
  * projection + rename, the simplest operator class. Narrow (no
  * shuffle); with Parquet input, column pruning reaches the scan.
  *
  * Testdata bindings per FIXTURES.md §B: tickets→lineitem,
  * movies→part, users→customer.
  */
object Projections {

  /** tickets-cdc.sql:69-77 analog: project fact columns, typed cost. */
  def tickets(lineitem: DataFrame): DataFrame = lineitem.select(
    col("l_orderkey").as("ticket_id"),
    col("l_partkey").as("movie_id"),
    col("l_suppkey").as("user_id"),
    col("l_extendedprice").cast(DecimalType(10, 2)).as("cost"),
    col("l_returnflag").as("status"),
    col("l_shipdate").as("purchased_at"))

  /** movies-cdc.sql:59-68 analog. */
  def movies(part: DataFrame): DataFrame = part.select(
    col("p_partkey").as("movie_id"),
    col("p_name").as("title"),
    col("p_type").as("description"),
    col("p_size").as("duration_minutes"))

  /** users-cdc.sql:57-65 analog. */
  def users(customer: DataFrame): DataFrame = customer.select(
    col("c_custkey").as("user_id"),
    col("c_name").as("username"),
    concat(col("c_name"), lit("@example.com")).as("email"),
    col("c_mktsegment").as("full_name"))
}

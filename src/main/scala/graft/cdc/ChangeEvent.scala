package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Debezium-style changelog envelope.
  *
  * The reference's CDC sources emit exactly this shape from Postgres
  * logical decoding (reference `flink-cdc/sql/tickets-cdc.sql:43-64`,
  * `'connector'='postgres-cdc'` with REPLICA IDENTITY FULL at
  * `postgres-source/init-scripts/01-init.sql:57-59`): +I snapshot rows
  * followed by insert/update/delete change events.
  *
  * Generic representation: `op ∈ {c,u,d}`, `ts_ms` (commit order),
  * `before`/`after` structs of the table's row type. `before` is null
  * for creates, `after` null for deletes.
  */
object ChangeEvent {
  val OpCreate = "c"
  val OpUpdate = "u"
  val OpDelete = "d"

  /** Envelope schema for a given row schema. */
  def schema(row: StructType): StructType = StructType(Seq(
    StructField("op", StringType, nullable = false),
    StructField("ts_ms", LongType, nullable = false),
    StructField("before", row, nullable = true),
    StructField("after", row, nullable = true)))

  /** Wrap a plain row DataFrame as a snapshot (+I) changelog — the CDC
    * source's initial incremental-snapshot phase
    * (`tickets-cdc.sql:63` `'scan.incremental.snapshot.enabled'`). */
  def snapshot(rows: DataFrame, tsMs: Long = 0L): DataFrame = {
    val row = struct(rows.columns.map(col).toSeq: _*)
    rows.select(
      lit(OpCreate).as("op"),
      lit(tsMs).as("ts_ms"),
      lit(null).cast(rows.schema).as("before"),
      row.as("after"))
  }
}

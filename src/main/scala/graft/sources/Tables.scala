package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table resolution over a scale-factor directory of Parquet files.
  *
  * Stand-in for the reference's catalog layer (`CREATE CATALOG
  * fluss_catalog` / `USE osb_staging`, reference
  * `flink-cdc/sql/tickets-cdc.sql:11-18`): names resolve to columnar lake
  * storage, reads are pruned/pushed-down by the Parquet datasource.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$table.parquet")
    // events.ts is TIMESTAMP(NANOS) parquet; Spark reads it as epoch-ns
    // long (legacy.parquet.nanosAsLong) — truncate to µs TimestampType,
    // bit-identical to DuckDB's CAST(ts_ns AS TIMESTAMP).
    if (table == "events")
      df.withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
    else df
  }

  /** Register every table of a scale dir as a temp view so `spark.sql`
    * queries resolve the same names the DuckDB oracle sees. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { t =>
      load(spark, sfDir, t).createOrReplaceTempView(t)
    }
}

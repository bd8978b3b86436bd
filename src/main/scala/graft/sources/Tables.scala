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
    // events.ts has shipped in two physical layouts across testdata
    // generations: TIMESTAMP(NANOS) (Spark reads epoch-ns long via
    // legacy.parquet.nanosAsLong — truncate to µs) and TIMESTAMP(MICROS)
    // without UTC adjustment (Spark reads TIMESTAMP_NTZ). Normalize both
    // to session-TZ TimestampType (UTC per build.sbt), bit-identical to
    // DuckDB's TIMESTAMP read of the same file.
    if (table == "events") {
      import org.apache.spark.sql.functions.{col, expr}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      df.schema("ts").dataType match {
        case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df
      }
    } else df
  }

  /** Register every table of a scale dir as a temp view so `spark.sql`
    * queries resolve the same names the DuckDB oracle sees. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { t =>
      load(spark, sfDir, t).createOrReplaceTempView(t)
    }
}

package graft.catalog

import graft.sources.Tables
import org.apache.spark.sql.SparkSession

/** Catalog / namespace surface — the reference's `CREATE CATALOG
  * fluss_catalog` / `CREATE DATABASE IF NOT EXISTS osb_staging` /
  * `USE` DDL (reference `flink-cdc/sql/tickets-cdc.sql:11-18`;
  * Paimon catalog in the generated `init-catalogs.sql`).
  *
  * Spark-first shape: one session catalog with databases; lake tables
  * register as EXTERNAL parquet tables (metadata only — no data copy),
  * so both `spark.sql("SELECT ... FROM osb.lineitem")` and
  * `spark.table("osb.lineitem")` resolve them, with the parquet
  * datasource's pruning/pushdown intact.
  */
object Catalog {

  def createDatabase(spark: SparkSession, db: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")

  /** Register every table of a scale dir as an external table of `db`
    * (CREATE TABLE ... WITH (...) analog, connector options →
    * datasource + location). */
  def registerLakeTables(spark: SparkSession, db: String, sfDir: String): Unit = {
    createDatabase(spark, db)
    Tables.names.foreach { t =>
      spark.sql(
        s"CREATE TABLE IF NOT EXISTS `$db`.`$t` USING parquet LOCATION '$sfDir/$t.parquet'")
    }
  }

  /** `USE <db>` (tickets-cdc.sql:18). */
  def use(spark: SparkSession, db: String): Unit =
    spark.sql(s"USE `$db`")

  def drop(spark: SparkSession, db: String): Unit =
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
}

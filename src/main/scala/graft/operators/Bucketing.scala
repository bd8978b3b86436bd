package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed table layout + co-located joins — the lake-tier analog of
  * the reference's hash-bucketed PK tables (`'bucket.num'='4'`,
  * reference `flink-cdc/sql/tickets-cdc.sql:34`): rows hash-distribute
  * into a fixed number of buckets BY KEY at write time, so every later
  * join or aggregation on that key reads already-co-located data and
  * the per-query shuffle disappears.
  *
  * This is THE 100 TB fact⋈fact join strategy: a broadcast join needs a
  * small side and salting still pays the big side's exchange, but two
  * tables bucketed on the join key sort-merge-join with ZERO exchange —
  * at a 1000-executor scale the bucketed layout turns every repeated
  * join on the distribution key from a full-network shuffle into a
  * local merge ([[BucketingSpec]] pins the no-exchange plan and the
  * plain-join row equality; the driver entry `q_bucketed_join` runs the
  * write + join end-to-end against the unbucketed SQL oracle).
  *
  * Written through the session catalog's native parquet bucketing
  * (Spark's Hive-compatible hash, `sortBy` within buckets so merge
  * joins also skip the per-partition sort when each bucket holds one
  * file). Cluster note: `spark.sql.sources.bucketing.enabled` is on by
  * default; bucket counts on both sides must match (Spark joins
  * bucket i with bucket i). */
object Bucketing {

  /** Write `df` as a bucketed, within-bucket-sorted external parquet
    * table at `path`, (re)registered as `table` in the session catalog.
    * Existing registration and files are replaced — re-layout is
    * idempotent. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    df.write.format("parquet").option("path", path).mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Inner equi-join of two bucketed tables on `leftKey = rightKey`.
    * With matching bucket counts both scans report their bucketing to
    * the planner and the sort-merge join runs exchange-free; the result
    * is the plain join's exact multiset either way (bucketing is a
    * layout, not a semantic). */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }

  /** End-to-end driver entry body: lay `facts` and `dims` out bucketed
    * by the join key, join co-located, and aggregate — revenue per
    * market segment over orders⋈customer. Sums run in exact decimal
    * (order-insensitive), presented as double. */
  def segmentRevenueBucketed(facts: DataFrame, dims: DataFrame,
                             workDir: String, buckets: Int = 8): DataFrame = {
    val spark = facts.sparkSession
    writeBucketed(facts, "graft_bkt_orders", s"$workDir/orders",
      "o_custkey", buckets)
    writeBucketed(dims, "graft_bkt_customer", s"$workDir/customer",
      "c_custkey", buckets)
    bucketedJoin(spark, "graft_bkt_orders", "graft_bkt_customer",
        "o_custkey", "c_custkey")
      .groupBy(col("c_mktsegment").as("mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("c_custkey")).as("n_customers"),
        sum(col("o_totalprice").cast(
          org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("revenue"))
  }
}

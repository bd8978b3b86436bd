package graft.catalog

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Storage-partitioned join (Iceberg's SPJ, SPARK-37375): two lake
  * tables bucketed the same way equi-join on the bucket key with ZERO
  * shuffle exchange — the scan reports
  * `KeyGroupedPartitioning(bucket(n, col))` resolved through the
  * catalog's V2 `bucket` function, and each `_gbucket` directory plans
  * as one keyed partition group. */
class StoragePartitionedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def unwrap(p: org.apache.spark.sql.execution.SparkPlan) = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      a.executedPlan
    case x => x
  }

  test("same-bucketed tables join with zero shuffle; rows exact") {
    val lake = Files.createTempDirectory("graft-lake-spj")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkspj", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkspj.path", lake.toString)
    val oldBucketing = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val oldThresh = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.sql(
        """CREATE TABLE lkspj.m.a (id BIGINT, x BIGINT)
          |PARTITIONED BY (bucket(8, id))""".stripMargin)
      spark.sql(
        """CREATE TABLE lkspj.m.b (id BIGINT, y BIGINT)
          |PARTITIONED BY (bucket(8, id))""".stripMargin)
      (1L to 200L).map(i => (i, i * 2L)).toDF("id", "x")
        .write.mode("append").insertInto("lkspj.m.a")
      (1L to 200L).filter(_ % 2L == 0L).map(i => (i, i * 3L)).toDF("id", "y")
        .write.mode("append").insertInto("lkspj.m.b")
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q = spark.sql(
        """SELECT a.id, a.x, b.y FROM lkspj.m.a a
          |JOIN lkspj.m.b b ON a.id = b.id""".stripMargin)
      val rows = q.as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(rows == (2L to 200L by 2L).map(i => (i, i * 2L, i * 3L)),
        s"join rows wrong: ${rows.take(5)}...")
      val shuffles = unwrap(q.queryExecution.executedPlan).collect {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"expected a storage-partitioned join with ZERO shuffles:\n" +
          s"${q.queryExecution.executedPlan}")
      // the conf OFF degrades gracefully: same rows, shuffles allowed
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val q2 = spark.sql(
        """SELECT a.id, a.x, b.y FROM lkspj.m.a a
          |JOIN lkspj.m.b b ON a.id = b.id""".stripMargin)
      assert(q2.count() == 100L)
    } finally {
      oldBucketing.fold(spark.conf.unset("spark.sql.sources.v2.bucketing.enabled"))(
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", _))
      oldThresh.fold(spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
      spark.conf.unset("spark.sql.catalog.lkspj")
      spark.conf.unset("spark.sql.catalog.lkspj.path")
    }
  }

  test("keyed scan: an empty bucket table reads empty, then fills") {
    val lake = Files.createTempDirectory("graft-lake-spj3")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkspj3", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkspj3.path", lake.toString)
    try {
      spark.sql(
        """CREATE TABLE lkspj3.m.e (id BIGINT, v STRING)
          |PARTITIONED BY (bucket(4, id))""".stripMargin)
      // zero keyed partitions must still plan and read as empty
      assert(spark.table("lkspj3.m.e").count() == 0L)
      assert(spark.table("lkspj3.m.e").where("id = 3").count() == 0L)
      Seq((3L, "x")).toDF("id", "v").write.mode("append")
        .insertInto("lkspj3.m.e")
      assert(spark.table("lkspj3.m.e").count() == 1L)
    } finally {
      spark.conf.unset("spark.sql.catalog.lkspj3")
      spark.conf.unset("spark.sql.catalog.lkspj3.path")
    }
  }

  test("keyed scan: aggregation over the bucket key avoids the shuffle too") {
    val lake = Files.createTempDirectory("graft-lake-spj2")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkspj2", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkspj2.path", lake.toString)
    val oldBucketing = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    try {
      spark.sql(
        """CREATE TABLE lkspj2.m.t (id BIGINT, v BIGINT)
          |PARTITIONED BY (bucket(4, id))""".stripMargin)
      (1L to 100L).map(i => (i % 10L, i)).toDF("id", "v")
        .write.mode("append").insertInto("lkspj2.m.t")
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      val q = spark.sql(
        "SELECT id, CAST(sum(v) AS BIGINT) AS s FROM lkspj2.m.t GROUP BY id")
      val expected = (1L to 100L).groupBy(_ % 10L)
        .map { case (k, vs) => (k, vs.sum) }.toSeq.sortBy(_._1)
      assert(q.as[(Long, Long)].collect().sortBy(_._1).toSeq == expected)
      val shuffles = unwrap(q.queryExecution.executedPlan).collect {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"group-by on the bucket key should ride the keyed partitioning:\n" +
          s"${q.queryExecution.executedPlan}")
      // the V2 bucket function is SQL-addressable and computes the
      // writer's id: pmod(hash(v), n) == catalog bucket(n, v)
      val ids = spark.sql(
        """SELECT lkspj2.bucket(4, CAST(17 AS BIGINT)) AS b,
          |       pmod(hash(CAST(17 AS BIGINT)), 4) AS w""".stripMargin)
        .head()
      assert(ids.getInt(0) == ids.getInt(1),
        s"catalog bucket() must match the writer hash, got $ids")
    } finally {
      oldBucketing.fold(spark.conf.unset("spark.sql.sources.v2.bucketing.enabled"))(
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", _))
      spark.conf.unset("spark.sql.catalog.lkspj2")
      spark.conf.unset("spark.sql.catalog.lkspj2.path")
    }
  }
}

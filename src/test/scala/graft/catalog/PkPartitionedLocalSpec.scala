package graft.catalog

import graft.SparkSpec
import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions.col

/** Bucket-local PK resolution over PARTITIONED layouts (r16 — the
  * production CDC shape `PARTITIONED BY (day, bucket(n, k))`):
  *
  *  - identity+bucket PK tables resolve exchange-free too (one
  *    key-grouped partition per leaf dir; identity values ride as
  *    per-leaf constants — they live in dir names, not files);
  *  - key conjuncts over IDENTITY columns keep the fast path AND
  *    prune whole leaf dirs (a `day=` steady-state read at 100 TB
  *    reads one day's buckets, no exchange, no pushdown loss);
  *  - conjuncts on STORED key columns keep the pruned+pushed plan;
  *  - identity-ONLY PK tables qualify as well (each key's versions
  *    co-locate in its identity dir). */
class PkPartitionedLocalSpec extends SparkSpec {
  import spark.implicits._

  private def withLake(tag: String)(body: (String, Path) => Unit): Unit = {
    val lake = Files.createTempDirectory(s"graft-pkpl-$tag")
    Files.createDirectories(lake.resolve("m"))
    val cat = s"pkpl$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftLakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", lake.toString)
    try body(cat, lake)
    finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.path")
    }
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("identity+bucket PK tables resolve exchange-free; day filters prune leaves and keep the fast path; stored-key filters keep the pushed plan") {
    withLake("a") { (cat, _) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (k BIGINT NOT NULL, v STRING,
           |  day STRING NOT NULL)
           |PARTITIONED BY (day, bucket(2, k))
           |TBLPROPERTIES ('versioned'='true', 'primary-key'='day,k')"""
          .stripMargin)
      def ins(rows: (Long, String, String)*): Unit =
        rows.toSeq.toDF("k", "v", "day").write.mode("append")
          .insertInto(s"$cat.m.t")
      ins((1L, "a1", "d1"), (2L, "b1", "d1"), (1L, "c1", "d2"))  // seq 1
      ins((1L, "a2", "d1"), (3L, "d1x", "d2"))                  // seq 2
      spark.catalog.clearCache()
      val full = spark.table(s"$cat.m.t")
      val p = planOf(full)
      assert(p.contains("pk-bucket-resolve") && !p.contains("Exchange"), p)
      assert(full.as[(Long, String, String)].collect().sortBy(r =>
        (r._3, r._1)).toSeq == Seq((1L, "a2", "d1"), (2L, "b1", "d1"),
        (1L, "c1", "d2"), (3L, "d1x", "d2")))
      // the steady-state read: day filter — fast path kept, leaves
      // PRUNED to the day's dirs
      spark.catalog.clearCache()
      val day = spark.table(s"$cat.m.t").where(col("day") === "d1")
      val pd = planOf(day)
      assert(pd.contains("pk-bucket-resolve") && !pd.contains("Exchange"),
        pd)
      val leaves = "pk-bucket-resolve:(\\d+) leaves".r
        .findFirstMatchIn(pd).get.group(1).toInt
      val leavesFull = "pk-bucket-resolve:(\\d+) leaves".r
        .findFirstMatchIn(p).get.group(1).toInt
      assert(leaves < leavesFull,
        s"day filter must prune leaf dirs ($leaves vs $leavesFull)")
      assert(day.as[(Long, String, String)].collect().sortBy(_._1).toSeq ==
        Seq((1L, "a2", "d1"), (2L, "b1", "d1")))
      // stored-key conjunct: the pruned+pushed plan, not the swap
      spark.catalog.clearCache()
      val pt = spark.table(s"$cat.m.t").where(col("k") === 1L)
      assert(!planOf(pt).contains("pk-bucket-resolve"), planOf(pt))
      assert(pt.as[(Long, String, String)].collect().sortBy(_._3).toSeq ==
        Seq((1L, "a2", "d1"), (1L, "c1", "d2")))
    }
  }

  test("equality deletes on partitioned PK tables ride the vector; blind (day,k) deletes and revives resolve per leaf") {
    withLake("b") { (cat, _) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (k BIGINT NOT NULL, v STRING,
           |  day STRING NOT NULL)
           |PARTITIONED BY (day, bucket(2, k))
           |TBLPROPERTIES ('versioned'='true', 'primary-key'='day,k')"""
          .stripMargin)
      def ins(rows: (Long, String, String)*): Unit =
        rows.toSeq.toDF("k", "v", "day").write.mode("append")
          .insertInto(s"$cat.m.t")
      ins((1L, "a", "d1"), (2L, "b", "d1"), (1L, "x", "d2"))
      // blind full-PK delete of (d1, 1); (d2, 1) must survive
      spark.sql(s"DELETE FROM $cat.m.t WHERE day = 'd1' AND k = 1")
      spark.catalog.clearCache()
      val full = spark.table(s"$cat.m.t")
      val p = planOf(full)
      assert(p.contains("pk-bucket-resolve") && !p.contains("Exchange") &&
        !p.contains("Join"), p)
      assert(full.as[(Long, String, String)].collect().sortBy(_._3).toSeq ==
        Seq((2L, "b", "d1"), (1L, "x", "d2")))
      ins((1L, "revived", "d1"))
      spark.catalog.clearCache()
      assert(spark.table(s"$cat.m.t").where(col("day") === "d1")
        .as[(Long, String, String)].collect().sortBy(_._1).toSeq ==
        Seq((1L, "revived", "d1"), (2L, "b", "d1")))
    }
  }

  test("identity-ONLY PK tables qualify: each key's versions co-locate in its identity dir") {
    withLake("c") { (cat, _) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (k BIGINT NOT NULL, v STRING,
           |  day STRING NOT NULL)
           |PARTITIONED BY (day)
           |TBLPROPERTIES ('versioned'='true', 'primary-key'='day,k')"""
          .stripMargin)
      def ins(rows: (Long, String, String)*): Unit =
        rows.toSeq.toDF("k", "v", "day").write.mode("append")
          .insertInto(s"$cat.m.t")
      ins((1L, "a1", "d1"), (1L, "z1", "d2"))
      ins((1L, "a2", "d1"))
      spark.catalog.clearCache()
      val full = spark.table(s"$cat.m.t")
      val p = planOf(full)
      assert(p.contains("pk-bucket-resolve") && !p.contains("Exchange"), p)
      assert(full.as[(Long, String, String)].collect().sortBy(_._3).toSeq ==
        Seq((1L, "a2", "d1"), (1L, "z1", "d2")))
    }
  }
}

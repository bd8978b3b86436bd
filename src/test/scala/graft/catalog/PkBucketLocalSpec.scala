package graft.catalog

import graft.SparkSpec
import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions.col

/** Bucket-local (exchange-free) PK resolution ([[PkBucketResolve]]) —
  * the Paimon per-bucket merge read. The laws:
  *
  *  - a dirty FULL-TABLE read plans NO shuffle Exchange between the
  *    scan and the dedup aggregate (one key-grouped partition per
  *    bucket); non-key predicates stay above and keep it exchange-free;
  *  - pending equality deletes ride a scan-local broadcast filter (no
  *    join operator) and results match the fallback join plan exactly
  *    — including intra-commit duplicate-key tie-breaks, which must
  *    agree byte-for-byte with the V1 coordinate read's (file, pos);
  *  - key-only predicates keep the audited pruned+pushed plan;
  *  - structural misses (vector ceiling, kill switch) fall back to the
  *    shuffled plan with identical rows;
  *  - a downstream bucket-key aggregate reuses the key-grouped
  *    partitioning (still no exchange). */
class PkBucketLocalSpec extends SparkSpec {
  import spark.implicits._

  private def withLake(tag: String)(body: (String, Path) => Unit): Unit = {
    val lake = Files.createTempDirectory(s"graft-pkb-$tag")
    Files.createDirectories(lake.resolve("m"))
    val cat = s"pkb$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftLakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", lake.toString)
    try body(cat, lake)
    finally {
      spark.conf.unset(PkBucketResolve.EnabledConf)
      spark.conf.unset(MorDeletes.VectorMaxConf)
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.path")
    }
  }

  private def mkTable(cat: String): Unit =
    spark.sql(
      s"""CREATE TABLE $cat.m.t (k BIGINT NOT NULL, v STRING, amt BIGINT)
         |PARTITIONED BY (bucket(4, k))
         |TBLPROPERTIES ('versioned'='true', 'primary-key'='k')""".stripMargin)

  private def seed(cat: String): Unit = {
    (0L until 200L).map(i => (i, s"v1-$i", i)).toDF("k", "v", "amt")
      .write.mode("append").insertInto(s"$cat.m.t")              // seq 1
    (0L until 100L).map(i => (i * 2, s"v2-${i * 2}", i)).toDF("k", "v", "amt")
      .write.mode("append").insertInto(s"$cat.m.t")              // seq 2
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // finalize any adaptive plan
    df.queryExecution.executedPlan.toString
  }

  private def rows(cat: String): Seq[(Long, String, Long)] = {
    spark.catalog.clearCache()
    spark.table(s"$cat.m.t").as[(Long, String, Long)]
      .collect().sortBy(_._1).toSeq
  }

  test("dirty full-table read: no Exchange before the dedup aggregate; non-key filters stay exchange-free") {
    withLake("a") { (cat, _) =>
      mkTable(cat); seed(cat)
      spark.catalog.clearCache()
      val full = spark.table(s"$cat.m.t")
      val p = planOf(full)
      assert(p.contains("pk-bucket-resolve"), p)
      assert(!p.contains("Exchange"), s"shuffle in the bucket-local plan:\n$p")
      assert(full.count() == 200L)
      val got = rows(cat)
      assert(got.size == 200 &&
        got(4) == (4L, "v2-4", 2L) && got(5) == (5L, "v1-5", 5L))
      // non-key predicate: applies ABOVE the dedup, still exchange-free
      spark.catalog.clearCache()
      val nk = spark.table(s"$cat.m.t").where(col("v").startsWith("v2-"))
      val pnk = planOf(nk)
      assert(pnk.contains("pk-bucket-resolve") && !pnk.contains("Exchange"),
        pnk)
      assert(nk.count() == 100L)
    }
  }

  test("key-only predicates keep the pruned+pushed plan (no bucket-local swap)") {
    withLake("b") { (cat, _) =>
      mkTable(cat); seed(cat)
      spark.catalog.clearCache()
      val pt = spark.table(s"$cat.m.t").where(col("k") === 4L)
      val p = planOf(pt)
      assert(!p.contains("pk-bucket-resolve"), p)
      assert(p.contains("PushedFilters") || p.contains("pushed"), p)
      assert(pt.as[(Long, String, Long)].collect().toSeq ==
        Seq((4L, "v2-4", 2L)))
    }
  }

  test("equality deletes ride the scan-local vector: no join, no exchange, fallback-identical rows incl. revives") {
    withLake("c") { (cat, _) =>
      mkTable(cat); seed(cat)
      spark.sql(s"DELETE FROM $cat.m.t WHERE k = 4")             // seq 3
      spark.sql(s"DELETE FROM $cat.m.t WHERE k = 5")             // seq 4
      Seq((4L, "revived", 99L)).toDF("k", "v", "amt")
        .write.mode("append").insertInto(s"$cat.m.t")            // seq 5
      spark.catalog.clearCache()
      val full = spark.table(s"$cat.m.t")
      val p = planOf(full)
      assert(p.contains("pk-bucket-resolve") && !p.contains("Exchange"), p)
      assert(!p.contains("Join"), s"eq deletes must not plan a join:\n$p")
      val fast = rows(cat)
      assert(fast.size == 199)
      assert(fast.find(_._1 == 4L).contains((4L, "revived", 99L)))
      assert(!fast.exists(_._1 == 5L))
      // byte-identical to the fallback (shuffled anti-join) plan
      spark.conf.set(PkBucketResolve.EnabledConf, "false")
      val slowP = planOf(spark.table(s"$cat.m.t"))
      assert(!slowP.contains("pk-bucket-resolve") &&
        slowP.contains("Exchange"), slowP)
      assert(rows(cat) == fast)
      spark.conf.unset(PkBucketResolve.EnabledConf)
    }
  }

  test("intra-commit duplicate keys tie-break identically on both paths (the (file, pos) ladder)") {
    withLake("d") { (cat, _) =>
      mkTable(cat)
      // one commit, many duplicate versions per key across writer tasks
      (0L until 300L).map(i => (i % 25, s"dup-$i", i))
        .toDF("k", "v", "amt").repartition(8)
        .write.mode("append").insertInto(s"$cat.m.t")
      spark.catalog.clearCache()
      val fast = rows(cat)
      assert(fast.size == 25)
      spark.conf.set(PkBucketResolve.EnabledConf, "false")
      assert(rows(cat) == fast, "tie-break diverged between paths")
      spark.conf.unset(PkBucketResolve.EnabledConf)
    }
  }

  test("vector ceiling: over-ceiling eq churn falls back to the join plan with identical rows") {
    withLake("e") { (cat, _) =>
      mkTable(cat); seed(cat)
      spark.sql(s"DELETE FROM $cat.m.t WHERE k = 4")
      spark.sql(s"DELETE FROM $cat.m.t WHERE k = 5")
      spark.sql(s"DELETE FROM $cat.m.t WHERE k = 6")
      spark.catalog.clearCache()
      val fast = rows(cat)
      spark.conf.set(MorDeletes.VectorMaxConf, "2")
      spark.catalog.clearCache()
      val p = planOf(spark.table(s"$cat.m.t"))
      assert(!p.contains("pk-bucket-resolve"), p)
      assert(rows(cat) == fast)
      spark.conf.unset(MorDeletes.VectorMaxConf)
    }
  }

  test("a dirty PK read storage-partition-joins a same-bucketed clean table with ZERO exchanges (the reference's steady-state MV-join topology)") {
    withLake("g") { (cat, _) =>
      mkTable(cat); seed(cat)
      spark.sql(
        s"""CREATE TABLE $cat.m.dim (k BIGINT NOT NULL, label STRING)
           |PARTITIONED BY (bucket(4, k))
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      (0L until 200L).map(i => (i, s"L$i")).toDF("k", "label")
        .write.mode("append").insertInto(s"$cat.m.dim")
      val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        spark.catalog.clearCache()
        val j = spark.table(s"$cat.m.t")
          .join(spark.table(s"$cat.m.dim"), "k")
        val p = planOf(j)
        assert(p.contains("pk-bucket-resolve") && !p.contains("Exchange"),
          s"the resolved fact side must keep its key grouping " +
            s"through the dedup aggregate into the join:\n$p")
        assert(j.count() == 200L)
        assert(j.where(col("k") === 4L).select("v", "label")
          .as[(String, String)].collect().toSeq == Seq(("v2-4", "L4")))
      } finally
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    }
  }

  test("pushed point lookups apply pruned eq churn as the broadcast vector — no join operator (r16)") {
    withLake("h") { (cat, _) =>
      mkTable(cat); seed(cat)
      spark.sql(s"DELETE FROM $cat.m.t WHERE k = 4")
      Seq((4L, "revived", 9L)).toDF("k", "v", "amt")
        .write.mode("append").insertInto(s"$cat.m.t")
      spark.sql(s"DELETE FROM $cat.m.t WHERE k = 6")
      spark.catalog.clearCache()
      val pt = spark.table(s"$cat.m.t").where(col("k").isin(4L, 6L, 7L))
      val p = planOf(pt)
      // the pushed path (not the bucket-local swap), with the eq
      // churn as a scan-local filter instead of a LeftAnti join
      assert(!p.contains("pk-bucket-resolve"), p)
      assert(!p.contains("Join"), s"eq churn must ride the vector:\n$p")
      assert(pt.as[(Long, String, Long)].collect().sortBy(_._1).toSeq ==
        Seq((4L, "revived", 9L), (7L, "v1-7", 7L)))
      // over the ceiling the pushed path keeps the anti-join
      spark.conf.set(MorDeletes.VectorMaxConf, "1")
      spark.catalog.clearCache()
      val pt2 = spark.table(s"$cat.m.t").where(col("k").isin(4L, 6L, 7L))
      assert(planOf(pt2).contains("Join"))
      assert(pt2.as[(Long, String, Long)].collect().sortBy(_._1).toSeq ==
        Seq((4L, "revived", 9L), (7L, "v1-7", 7L)))
      spark.conf.unset(MorDeletes.VectorMaxConf)
    }
  }

  test("time travel resolves through the bucket-local read; downstream key aggregates stay exchange-free") {
    withLake("f") { (cat, _) =>
      mkTable(cat); seed(cat)
      spark.catalog.clearCache()
      val v1 = spark.sql(s"SELECT k, v FROM $cat.m.t VERSION AS OF 1")
      assert(planOf(v1).contains("pk-bucket-resolve"))
      assert(v1.where(col("k") === 4L).as[(Long, String)].collect().toSeq
        == Seq((4L, "v1-4")))
      // resolved output keeps the key grouping: a key aggregate above
      // the dedup adds NO exchange either
      spark.catalog.clearCache()
      val agg = spark.sql(
        s"SELECT k, count(*) c FROM $cat.m.t GROUP BY k")
      val p = planOf(agg)
      assert(p.contains("pk-bucket-resolve") && !p.contains("Exchange"), p)
      assert(agg.count() == 200L)
    }
  }
}

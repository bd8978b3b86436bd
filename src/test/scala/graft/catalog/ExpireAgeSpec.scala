package graft.catalog

import graft.SparkSpec
import java.nio.file.{Files, Path}

/** AGE-based snapshot retention (`CALL system.expire_age(tbl,
  * older_than_ms, keep_last)` — Iceberg's `expire_snapshots(
  * older_than, retain_last)`): drop data snapshots committed more
  * than `older_than_ms` ago, always retaining the `keep_last` newest
  * data commits and every pinned snapshot; same OCC commit + precise
  * GC as the count form. */
class ExpireAgeSpec extends SparkSpec {
  import spark.implicits._

  private def withLake(tag: String)(body: (String, Path) => Unit): Unit = {
    val lake = Files.createTempDirectory(s"graft-age-$tag")
    Files.createDirectories(lake.resolve("m"))
    val cat = s"age$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftLakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", lake.toString)
    try body(cat, lake)
    finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.path")
    }
  }

  private def mk(cat: String): Unit = {
    spark.sql(
      s"""CREATE TABLE $cat.m.t (n BIGINT, region STRING)
         |PARTITIONED BY (region)
         |TBLPROPERTIES ('versioned'='true')""".stripMargin)
    for (i <- 1 to 3)
      Seq((i.toLong, "EU")).toDF("n", "region")
        .write.mode("append").insertInto(s"$cat.m.t") // s-1..s-3
  }

  test("everything younger than the cutoff is a no-op; keep_last floors an aggressive cutoff; pins survive") {
    withLake("a") { (cat, lake) =>
      mk(cat)
      val dir = lake.resolve("m/t.parquet")
      assert(Snapshots.versions(dir) == Seq(0L, 1L, 2L, 3L))

      // distant-past cutoff: every commit is young enough — no-op
      assert(spark.sql(
        s"CALL $cat.system.expire_age('m.t', ${365L * 24 * 3600 * 1000}, 1)")
        .as[Long].head() == 0L)
      assert(Snapshots.versions(dir) == Seq(0L, 1L, 2L, 3L))

      spark.sql(s"CALL $cat.system.tag('m.t', 'keepme', 1)")
      // future cutoff (negative age): everything is "old" — keep_last=1
      // floors the drop at the newest data commit (s-3), the pin saves
      // s-1, s-0/s-2 go
      val dropped = spark.sql(
        s"CALL $cat.system.expire_age('m.t', -60000, 1)")
        .as[Long].head()
      assert(dropped == 2L, s"expected s-0 and s-2 dropped, got $dropped")
      val left = Snapshots.versions(dir)
      assert(left.contains(1L) && left.contains(3L) && !left.contains(2L) &&
        !left.contains(0L), left)
      assert(spark.sql(s"SELECT count(*) FROM $cat.m.t VERSION AS OF 'keepme'")
        .as[Long].head() == 1L)
      assert(spark.table(s"$cat.m.t").count() == 3L)
    }
  }

  test("the age boundary drops old data commits and keeps young ones") {
    withLake("b") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (n BIGINT, region STRING)
           |PARTITIONED BY (region)
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      Seq((1L, "EU")).toDF("n", "region")
        .write.mode("append").insertInto(s"$cat.m.t") // s-1 (old)
      Thread.sleep(1500)
      Seq((2L, "EU")).toDF("n", "region")
        .write.mode("append").insertInto(s"$cat.m.t") // s-2 (young)
      val dir = lake.resolve("m/t.parquet")
      // cutoff between the two commits (generous margins): s-0/s-1
      // age out, s-2 is young — keep_last=1 adds nothing extra
      val dropped = spark.sql(
        s"CALL $cat.system.expire_age('m.t', 700, 1)").as[Long].head()
      assert(dropped == 2L, s"expected s-0 and s-1 dropped, got $dropped")
      assert(Snapshots.versions(dir).filterNot(v =>
        Snapshots.readMeta(dir, v).exists(_.operation == "expire")) == Seq(2L))
      assert(spark.table(s"$cat.m.t").count() == 2L)
      // flat tables reject loudly
      spark.sql(s"CREATE TABLE $cat.m.flat (k BIGINT)")
      (1L to 3L).toDF("k").write.mode("append").insertInto(s"$cat.m.flat")
      intercept[Exception](spark.sql(
        s"CALL $cat.system.expire_age('m.flat', 0, 1)").collect())
    }
  }
}

package graft.catalog

import graft.SparkSpec
import java.nio.file.{Files, Path}

/** BRANCH-scoped retention (`CALL system.expire_branch` →
  * [[Snapshots.commitExpireBranch]]): long-lived audit branches keep
  * bounded manifest history without touching main. The laws:
  *
  *  - keep the `keep` newest branch DATA commits plus `b-0` (the fork
  *    marker `fast_forward`/`branchFork` resolve against) — never less;
  *  - the branch head's content is untouched (reads + `VERSION AS OF
  *    '<branch>'` identical before/after);
  *  - dropped branch manifests delete; files referenced by NO retained
  *    manifest (main or any branch) GC — fork-shared content survives;
  *  - `fast_forward` still publishes after the expire;
  *  - nothing to drop → no commit at all. */
class BranchRetentionSpec extends SparkSpec {
  import spark.implicits._

  private def withLake(tag: String)(body: (String, Path) => Unit): Unit = {
    val lake = Files.createTempDirectory(s"graft-bre-$tag")
    Files.createDirectories(lake.resolve("m"))
    val cat = s"bre$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftLakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", lake.toString)
    try body(cat, lake)
    finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.path")
      spark.conf.unset("graft.write.branch")
    }
  }

  private def stageDeletes(cat: String): Unit = {
    spark.sql(s"CALL $cat.system.branch('m.t', 'audit')")
    spark.conf.set("graft.write.branch", "audit")
    try {
      spark.sql(s"DELETE FROM $cat.m.t WHERE n < 3")        // b-1
      spark.sql(s"DELETE FROM $cat.m.t WHERE n % 5 = 0")    // b-2
      spark.sql(s"DELETE FROM $cat.m.t WHERE n > 90")       // b-3
    } finally spark.conf.unset("graft.write.branch")
    spark.catalog.clearCache()
  }

  private def mk(cat: String): Unit = {
    spark.sql(
      s"""CREATE TABLE $cat.m.t (n BIGINT, region STRING)
         |PARTITIONED BY (region)
         |TBLPROPERTIES ('versioned'='true')""".stripMargin)
    (1L to 100L).map(i => (i, if (i % 2 == 0) "EU" else "US"))
      .toDF("n", "region").write.mode("append").insertInto(s"$cat.m.t")
  }

  test("expire_branch keeps b-0 + the newest commits, GCs branch-only files, leaves main and the branch head intact") {
    withLake("a") { (cat, lake) =>
      mk(cat)
      val dir = lake.resolve("m/t.parquet")
      stageDeletes(cat)
      val headBefore = spark.sql(
        s"SELECT n FROM $cat.m.t VERSION AS OF 'audit'")
        .as[Long].collect().sorted.toSeq
      val mainBefore = spark.table(s"$cat.m.t").as[(Long, String)]
        .collect().sortBy(_._1).toSeq
      // a file only the to-be-dropped middle commits reference
      val b1Files = Snapshots.readBranch(dir, "audit", 1L).get.files.toSet
      val keepFiles = (Snapshots.readBranch(dir, "audit", 0L).get.files ++
        Snapshots.readBranch(dir, "audit", 3L).get.files ++
        Snapshots.latest(dir).get.files).toSet
      val doomed = (b1Files -- keepFiles).toSeq
      assert(doomed.nonEmpty, "the middle commit staged files of its own")
      doomed.foreach(f => assert(Files.exists(dir.resolve(f))))

      val dropped = spark.sql(
        s"CALL $cat.system.expire_branch('m.t', 'audit', 1)")
        .as[Long].head()
      assert(dropped == 2L, "b-1 and b-2 drop; b-0 and b-3 retained")
      // branch log: fork marker + head + the expire record
      val vs = Snapshots.branchVersions(dir, "audit")
      assert(vs == Seq(0L, 3L, 4L), vs)
      // content intact on BOTH refs; dropped-only files GC'd
      spark.catalog.clearCache()
      assert(spark.sql(s"SELECT n FROM $cat.m.t VERSION AS OF 'audit'")
        .as[Long].collect().sorted.toSeq == headBefore)
      assert(spark.table(s"$cat.m.t").as[(Long, String)]
        .collect().sortBy(_._1).toSeq == mainBefore)
      doomed.foreach(f => assert(!Files.exists(dir.resolve(f)),
        s"$f should have been GC'd"))
      // fork-shared content survives (main still reads it)
      Snapshots.latest(dir).get.files.foreach(f =>
        assert(Files.exists(dir.resolve(f))))

      // the publish path survives the expire (b-0 content check intact)
      spark.sql(s"CALL $cat.system.fast_forward('m.t', 'audit')")
      spark.catalog.clearCache()
      assert(spark.table(s"$cat.m.t").select("n")
        .as[Long].collect().sorted.toSeq == headBefore)
    }
  }

  test("nothing to drop is a commit-free no-op; guards: keep >= 1, branch must exist") {
    withLake("b") { (cat, lake) =>
      mk(cat)
      val dir = lake.resolve("m/t.parquet")
      stageDeletes(cat)
      spark.sql(s"CALL $cat.system.expire_branch('m.t', 'audit', 1)")
      val vsBefore = Snapshots.branchVersions(dir, "audit")
      assert(spark.sql(s"CALL $cat.system.expire_branch('m.t', 'audit', 5)")
        .as[Long].head() == 0L)
      assert(Snapshots.branchVersions(dir, "audit") == vsBefore,
        "no-op expire publishes nothing")
      intercept[Exception](spark.sql(
        s"CALL $cat.system.expire_branch('m.t', 'audit', 0)"))
      val e = intercept[Exception](spark.sql(
        s"CALL $cat.system.expire_branch('m.t', 'nope', 1)"))
      assert(e.getMessage.contains("no branch"), e.getMessage)
    }
  }
}

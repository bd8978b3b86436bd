package graft.catalog

import graft.SparkSpec
import java.nio.file.{Files, Path}

/** `CALL system.cherry_pick` ([[Snapshots.cherryPick]]) — selective
  * WAP publish. The laws:
  *
  *  - picking ONE staged branch commit applies exactly its delta to
  *    main (the branch's other staged commits stay unpublished);
  *  - a picked MoR-delete commit carries its coordinate files and
  *    main reads apply them;
  *  - picking works after main advanced past the fork (appends);
  *  -  a pick whose removed files died on main conflicts;
  *  - re-picking the same commit is idempotent on the file list;
  *  - b-0 (the fork marker) is not pickable. */
class CherryPickSpec extends SparkSpec {
  import spark.implicits._

  private def withLake(tag: String)(body: (String, Path) => Unit): Unit = {
    val lake = Files.createTempDirectory(s"graft-cp-$tag")
    Files.createDirectories(lake.resolve("m"))
    val cat = s"cp$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftLakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", lake.toString)
    try body(cat, lake)
    finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.path")
      spark.conf.unset(MorDeletes.ModeConf)
      spark.conf.unset("graft.write.branch")
    }
  }

  private def mk(cat: String): Unit = {
    spark.sql(
      s"""CREATE TABLE $cat.m.t (n BIGINT, v STRING, region STRING)
         |PARTITIONED BY (region)
         |TBLPROPERTIES ('versioned'='true')""".stripMargin)
    Seq((1L, "a", "EU"), (2L, "b", "EU"), (3L, "c", "US"),
      (4L, "d", "US"), (5L, "e", "US"))
      .toDF("n", "v", "region").write.mode("append")
      .insertInto(s"$cat.m.t")
  }

  private def ns(cat: String): Seq[Long] =
    spark.table(s"$cat.m.t").select("n").as[Long].collect().sorted.toSeq

  test("pick one staged MoR-delete commit: exactly its delta publishes; the rest stays staged") {
    withLake("a") { (cat, lake) =>
      mk(cat)
      val dir = lake.resolve("m/t.parquet")
      spark.sql(s"CALL $cat.system.branch('m.t', 'staging')")
      spark.conf.set("graft.write.branch", "staging")
      spark.conf.set(MorDeletes.ModeConf, MorDeletes.MergeOnRead)
      try {
        spark.sql(s"DELETE FROM $cat.m.t WHERE n = 2") // b-1
        spark.sql(s"DELETE FROM $cat.m.t WHERE n = 4") // b-2
      } finally {
        spark.conf.unset(MorDeletes.ModeConf)
        spark.conf.unset("graft.write.branch")
      }
      spark.catalog.clearCache()
      assert(ns(cat) == Seq(1L, 2L, 3L, 4L, 5L), "main untouched while staged")

      val v = spark.sql(s"CALL $cat.system.cherry_pick('m.t', 'staging', 1)")
        .as[Long].head()
      spark.catalog.clearCache()
      assert(v == 2L)
      assert(Snapshots.latest(dir).get.operation == "cherry_pick")
      // exactly b-1's delete published; b-2 stays staged
      assert(ns(cat) == Seq(1L, 3L, 4L, 5L))
      assert(spark.sql(s"SELECT n FROM $cat.m.t VERSION AS OF 'staging'")
        .as[Long].collect().sorted.toSeq == Seq(1L, 3L, 5L))
      // re-pick: idempotent on the file list (no duplicate entries)
      val files1 = Snapshots.latest(dir).get.files.sorted
      spark.sql(s"CALL $cat.system.cherry_pick('m.t', 'staging', 1)")
      assert(Snapshots.latest(dir).get.files.sorted == files1)
      spark.catalog.clearCache()
      assert(ns(cat) == Seq(1L, 3L, 4L, 5L))
    }
  }

  test("picking an append works after main advanced; removed-files-dead conflicts; b-0 rejected") {
    withLake("b") { (cat, lake) =>
      mk(cat)
      val dir = lake.resolve("m/t.parquet")
      spark.sql(s"CALL $cat.system.branch('m.t', 'staging')")
      spark.conf.set("graft.write.branch", "staging")
      try {
        Seq((9L, "z", "EU")).toDF("n", "v", "region")
          .write.mode("append").insertInto(s"$cat.m.t") // b-1 append
        spark.sql(s"DELETE FROM $cat.m.t WHERE region = 'US'") // b-2 CoW
      } finally spark.conf.unset("graft.write.branch")
      spark.catalog.clearCache()
      // main advances past the fork (fast_forward would now refuse)
      Seq((7L, "y", "US")).toDF("n", "v", "region")
        .write.mode("append").insertInto(s"$cat.m.t")
      intercept[Exception](
        spark.sql(s"CALL $cat.system.fast_forward('m.t', 'staging')"))
      // the staged APPEND still cherry-picks cleanly
      spark.sql(s"CALL $cat.system.cherry_pick('m.t', 'staging', 1)")
      spark.catalog.clearCache()
      assert(ns(cat) == Seq(1L, 2L, 3L, 4L, 5L, 7L, 9L))
      // b-2 (a CoW rewrite of the US partition) replaced files that
      // are still live → it applies too; but after a main compact
      // rewrites them, picking conflicts instead of resurrecting
      spark.sql(s"CALL $cat.system.compact('m.t', 1)")
      intercept[CommitConflictException](
        Snapshots.cherryPick(dir, "staging", 2L))
      intercept[IllegalArgumentException](
        Snapshots.cherryPick(dir, "staging", 0L))
    }
  }
}

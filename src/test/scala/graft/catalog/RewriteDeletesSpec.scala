package graft.catalog

import graft.SparkSpec
import java.nio.file.{Files, Path}

/** `CALL system.rewrite_position_delete_files` — MINOR delete
  * compaction. The laws:
  *
  *  - K successive MoR deletes leave K coordinate files per touched
  *    partition; the rewrite merges each partition's files into ONE,
  *    deduped and (file, pos)-sorted;
  *  - CONTENT-NEUTRAL: the live rows before and after are identical,
  *    data files untouched;
  *  - already-minimal layouts (≤1 file per partition) are a no-op
  *    (no commit);
  *  - pre-rewrite dirty snapshots stay readable (time travel);
  *  - a concurrent commit that dropped an input delete file
  *    conflicts. */
class RewriteDeletesSpec extends SparkSpec {
  import spark.implicits._

  private def withLake(tag: String)(body: (String, Path) => Unit): Unit = {
    val lake = Files.createTempDirectory(s"graft-rwdel-$tag")
    Files.createDirectories(lake.resolve("m"))
    val cat = s"rwdel$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftLakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", lake.toString)
    spark.conf.set(MorDeletes.ModeConf, MorDeletes.MergeOnRead)
    try body(cat, lake)
    finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.path")
      spark.conf.unset(MorDeletes.ModeConf)
    }
  }

  test("merges per-partition delete files into one, content-neutral, sorted and deduped") {
    withLake("a") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (n BIGINT, v STRING, region STRING)
           |PARTITIONED BY (region)
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      (1L to 40L).map(i => (i, s"v$i", if (i % 2 == 0) "EU" else "US"))
        .toDF("n", "v", "region").write.mode("append")
        .insertInto(s"$cat.m.t") // s-1
      val dir = lake.resolve("m/t.parquet")
      // three MoR deletes spanning both partitions → ≥3 files per dir
      spark.sql(s"DELETE FROM $cat.m.t WHERE n <= 4")
      spark.sql(s"DELETE FROM $cat.m.t WHERE n BETWEEN 9 AND 12")
      spark.sql(s"DELETE FROM $cat.m.t WHERE n % 10 = 7")
      val before = Snapshots.deleteFiles(Snapshots.latest(dir).get.files)
      assert(before.size >= 5, before) // ≥2 per partition (EU 2, US 3)
      val dirtyV = Snapshots.latest(dir).get.version
      val rowsBefore = spark.table(s"$cat.m.t")
        .as[(Long, String, String)].collect().sortBy(_._1).toSeq

      val rep = spark.sql(
        s"CALL $cat.system.rewrite_position_delete_files('m.t')")
        .as[(Long, Long, Long)].head()
      assert(rep._1 == before.size.toLong && rep._2 == 2L, rep)

      val s2 = Snapshots.latest(dir).get
      val after = Snapshots.deleteFiles(s2.files)
      assert(after.size == 2, after)
      assert(s2.operation == "rewrite-deletes")
      // one file per target partition, properly scoped
      assert(after.flatMap(MorDeletes.targetDirOf).map(_.toString).sorted
        == Seq("region=EU", "region=US"))
      // content-neutral: identical live rows, data files untouched
      assert(spark.table(s"$cat.m.t").as[(Long, String, String)]
        .collect().sortBy(_._1).toSeq == rowsBefore)
      assert(Snapshots.dataFiles(s2.files).toSet ==
        Snapshots.dataFiles(Snapshots.read(dir, dirtyV).get.files).toSet)
      // coordinates deduped + sorted within each new file
      after.foreach { f =>
        val coords = spark.read.schema(MorDeletes.DeleteSchema)
          .parquet(dir.resolve(f).toString)
          .as[(String, Long)].collect().toSeq
        assert(coords == coords.distinct, "deduped")
        assert(coords == coords.sorted, "sorted by (file, pos)")
      }
      // the K-file dirty snapshot still time-travels
      assert(spark.sql(s"SELECT count(*) FROM $cat.m.t VERSION AS OF $dirtyV")
        .as[Long].head() == rowsBefore.size.toLong)
      // idempotent: a second call is a no-op (no commit)
      val rep2 = spark.sql(
        s"CALL $cat.system.rewrite_position_delete_files('m.t')")
        .as[(Long, Long, Long)].head()
      assert(rep2 == ((0L, 0L, s2.version)), rep2)
      assert(Snapshots.latest(dir).get.version == s2.version)
    }
  }

  test("a concurrent drop of an input delete file conflicts the rewrite") {
    withLake("b") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (n BIGINT, region STRING)
           |PARTITIONED BY (region)
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      Seq((1L, "EU"), (2L, "EU"), (3L, "EU")).toDF("n", "region")
        .write.mode("append").insertInto(s"$cat.m.t")
      val dir = lake.resolve("m/t.parquet")
      spark.sql(s"DELETE FROM $cat.m.t WHERE n = 1")
      spark.sql(s"DELETE FROM $cat.m.t WHERE n = 2")
      val dels = Snapshots.deleteFiles(Snapshots.latest(dir).get.files)
      assert(dels.size == 2)
      // the validator the rewrite commits under: a compact that
      // already materialized one input must conflict the merge
      intercept[CommitConflictException](
        Snapshots.validateFilesLive(
          "rewrite_position_delete_files", dels)(
          Snapshots.latest(dir).get.files.filterNot(_ == dels.head)))
    }
  }
}

package graft.catalog

import graft.SparkSpec
import java.nio.file.{Files, Path}

/** Merge-on-read DML × SCHEMA/SPEC EVOLUTION — the composition
  * surface where silent wrong results like to hide: the delta write's
  * files speak PHYSICAL names under RENAME evolution, its read must
  * union per-SPEC-SHAPE after ADD PARTITION FIELD, and widened
  * columns must round-trip through the delete+insert split. */
class MorDmlEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def withLake(tag: String)(body: (String, Path) => Unit): Unit = {
    val lake = Files.createTempDirectory(s"graft-morev-$tag")
    Files.createDirectories(lake.resolve("m"))
    val cat = s"morev$tag"
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

  test("MoR UPDATE/MERGE on a RENAME-evolved table: logical names in, physical files out") {
    withLake("a") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (n BIGINT, label STRING, region STRING)
           |PARTITIONED BY (region)
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      Seq((1L, "a", "EU"), (2L, "b", "EU"), (3L, "c", "US"))
        .toDF("n", "label", "region").write.mode("append")
        .insertInto(s"$cat.m.t")
      spark.sql(s"ALTER TABLE $cat.m.t RENAME COLUMN label TO tag")
      val dir = lake.resolve("m/t.parquet")
      val dataBefore = Snapshots.dataFiles(Snapshots.latest(dir).get.files)

      // UPDATE through the LOGICAL (renamed) name on the dirty path
      spark.sql(s"UPDATE $cat.m.t SET tag = concat(tag, '+') WHERE n <= 2")
      assert(spark.table(s"$cat.m.t").as[(Long, String, String)]
        .collect().sortBy(_._1).toSeq ==
        Seq((1L, "a+", "EU"), (2L, "b+", "EU"), (3L, "c", "US")))
      val s2 = Snapshots.latest(dir).get
      assert(dataBefore.toSet.subsetOf(Snapshots.dataFiles(s2.files).toSet))
      assert(Snapshots.deleteFiles(s2.files).nonEmpty)
      // the appended rewrite files carry the PHYSICAL column name
      // (files are immutable under renames — new files match old)
      val newFiles = Snapshots.dataFiles(s2.files).diff(dataBefore)
      val footerCols = spark.read
        .parquet(newFiles.map(f => dir.resolve(f).toString): _*)
        .columns.toSet
      assert(footerCols.contains("label") && !footerCols.contains("tag"),
        footerCols)

      // MERGE with the renamed column in source, condition, and SET
      Seq((3L, "C!", "US"), (9L, "z", "EU"))
        .toDF("n", "tag", "region").createOrReplaceTempView("ev_src")
      spark.sql(
        s"""MERGE INTO $cat.m.t t USING ev_src s ON t.n = s.n
           |WHEN MATCHED THEN UPDATE SET tag = s.tag
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(spark.table(s"$cat.m.t").as[(Long, String, String)]
        .collect().sortBy(_._1).toSeq ==
        Seq((1L, "a+", "EU"), (2L, "b+", "EU"), (3L, "C!", "US"),
          (9L, "z", "EU")))
      // compact materializes and the renamed reads stay correct
      spark.sql(s"CALL $cat.system.compact('m.t', 1)")
      assert(spark.sql(s"SELECT tag FROM $cat.m.t WHERE n = 3")
        .as[String].head() == "C!")
    }
  }

  test("MoR UPDATE across MIXED partition-spec shapes (ADD PARTITION FIELD): rows restage under the CURRENT spec") {
    withLake("b") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (n BIGINT, v STRING, day STRING,
           |  region STRING)
           |PARTITIONED BY (region)
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      Seq((1L, "a", "d1", "EU"), (2L, "b", "d1", "EU"),
        (3L, "c", "d2", "US"))
        .toDF("n", "v", "day", "region").write.mode("append")
        .insertInto(s"$cat.m.t") // old shape: region=…
      spark.sql(s"CALL $cat.system.add_partition_field('m.t', 'day')")
      Seq((4L, "d", "d2", "US")).toDF("n", "v", "day", "region")
        .write.mode("append").insertInto(s"$cat.m.t") // new shape
      val dir = lake.resolve("m/t.parquet")

      // the delta UPDATE matches rows in BOTH shapes; rewrites land
      // under the CURRENT (region/day) spec, coordinates stay correct
      spark.sql(s"UPDATE $cat.m.t SET v = upper(v) WHERE n IN (1, 4)")
      assert(spark.table(s"$cat.m.t").as[(Long, String, String, String)]
        .collect().sortBy(_._1).toSeq ==
        Seq((1L, "A", "d1", "EU"), (2L, "b", "d1", "EU"),
          (3L, "c", "d2", "US"), (4L, "D", "d2", "US")))
      val s = Snapshots.latest(dir).get
      val fresh = Snapshots.dataFiles(s.files).filter(f =>
        f.contains("day="))
      assert(fresh.exists(_.startsWith("region=EU/day=d1/")), fresh)
      // dirty time travel across shapes
      assert(spark.sql(s"SELECT v FROM $cat.m.t VERSION AS OF 2 WHERE n = 1")
        .as[String].head() == "a")
      // partition-pruned read on the dirty mixed-shape table
      assert(spark.sql(
        s"SELECT count(*) FROM $cat.m.t WHERE region = 'US'")
        .as[Long].head() == 2L)
    }
  }

  test("MoR UPDATE on a WIDENED column (int files + bigint schema) round-trips exactly") {
    withLake("c") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (n BIGINT, qty INT, region STRING)
           |PARTITIONED BY (region)
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      Seq((1L, 10, "EU"), (2L, 20, "EU"), (3L, 30, "US"))
        .toDF("n", "qty", "region").write.mode("append")
        .insertInto(s"$cat.m.t") // int32-era files
      spark.sql(s"ALTER TABLE $cat.m.t ALTER COLUMN qty TYPE BIGINT")
      // the delta read up-converts the int32 files; the rewrite lands
      // int64 values only BIGINT can hold
      spark.sql(s"UPDATE $cat.m.t SET qty = qty + 10000000000 WHERE n = 2")
      assert(spark.table(s"$cat.m.t").select("n", "qty")
        .as[(Long, Long)].collect().sortBy(_._1).toSeq ==
        Seq((1L, 10L), (2L, 10000000020L), (3L, 30L)))
      // both file generations + coordinates survive a compact
      spark.sql(s"CALL $cat.system.compact('m.t', 1)")
      assert(spark.table(s"$cat.m.t").select("n", "qty")
        .as[(Long, Long)].collect().sortBy(_._1).toSeq ==
        Seq((1L, 10L), (2L, 10000000020L), (3L, 30L)))
    }
  }
}

package graft.catalog

import graft.SparkSpec
import java.nio.file.{Files, Path}

/** RENAME / DROP COLUMN evolution on PARTITIONED lake tables: the
  * `_graft_mapping.json` logical→physical indirection composed with
  * the hive layout — immutable files keep their physical names, scans
  * and DML translate at the V2 boundary, partition-spec-referenced
  * columns stay un-renameable (directory names / bucket assignment
  * depend on them). */
class PartitionedEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def withLake(tag: String)(body: (String, Path) => Unit): Unit = {
    val lake = Files.createTempDirectory(s"graft-lake-$tag")
    Files.createDirectories(lake.resolve("m"))
    val cat = s"lk$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftLakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", lake.toString)
    try body(cat, lake)
    finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.path")
    }
  }

  test("rename a data column: scans translate old files, filters push, DML and pruning work, inserts stay physical") {
    withLake("pev1") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (n BIGINT, label STRING, region STRING)
           |PARTITIONED BY (region)""".stripMargin)
      Seq((1L, "a", "EU"), (2L, "b", "US")).toDF("n", "label", "region")
        .write.mode("append").insertInto(s"$cat.m.t")
      spark.sql(s"ALTER TABLE $cat.m.t RENAME COLUMN label TO tag")
      // pre-rename files stream their values under the NEW name —
      // never silent NULLs
      assert(spark.table(s"$cat.m.t").columns.toSeq == Seq("n", "tag", "region"))
      assert(spark.table(s"$cat.m.t").as[(Long, String, String)]
        .collect().sortBy(_._1).toSeq ==
        Seq((1L, "a", "EU"), (2L, "b", "US")))
      // filters on the renamed column push + evaluate correctly
      assert(spark.table(s"$cat.m.t").where("tag = 'b'")
        .select("n").as[Long].collect().toSeq == Seq(2L))
      // partition pruning is untouched by the rename
      val plan = spark.table(s"$cat.m.t").where("region = 'EU'")
        .queryExecution.executedPlan.toString
      assert(plan.contains("region=EU") || plan.contains("PartitionFilters"),
        s"pruning must survive evolution:\n$plan")
      // post-rename inserts land files with the PHYSICAL name, so the
      // directory stays homogeneous
      Seq((3L, "c", "EU")).toDF("n", "tag", "region")
        .write.mode("append").insertInto(s"$cat.m.t")
      assert(spark.table(s"$cat.m.t").as[(Long, String, String)]
        .collect().sortBy(_._1).toSeq ==
        Seq((1L, "a", "EU"), (2L, "b", "US"), (3L, "c", "EU")))
      val euFiles = {
        val s = Files.list(lake.resolve("m/t.parquet/region=EU"))
        try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator())
          .asScala.filter(_.getFileName.toString.endsWith(".parquet")).toSeq
        finally s.close()
      }
      euFiles.foreach { f =>
        assert(spark.read.parquet(f.toString).columns.contains("label") &&
          !spark.read.parquet(f.toString).columns.contains("tag"),
          s"files must keep speaking the physical name: $f")
      }
      // DELETE with a renamed-column condition translates
      spark.sql(s"DELETE FROM $cat.m.t WHERE tag = 'a'")
      assert(spark.table(s"$cat.m.t").as[(Long, String, String)]
        .collect().sortBy(_._1).toSeq ==
        Seq((2L, "b", "US"), (3L, "c", "EU")))
      // UPDATE through the row-level rewrite translates too
      spark.sql(s"UPDATE $cat.m.t SET tag = 'z' WHERE n = 2")
      assert(spark.table(s"$cat.m.t").where("tag = 'z'")
        .select("n").as[Long].collect().toSeq == Seq(2L))
    }
  }

  test("drop a data column, re-add the name: fresh physical slot, dropped data never resurfaces") {
    withLake("pev2") { (cat, _) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (n BIGINT, note STRING, g STRING)
           |PARTITIONED BY (g)""".stripMargin)
      Seq((1L, "secret", "x")).toDF("n", "note", "g")
        .write.mode("append").insertInto(s"$cat.m.t")
      spark.sql(s"ALTER TABLE $cat.m.t DROP COLUMN note")
      assert(spark.table(s"$cat.m.t").columns.toSeq == Seq("n", "g"))
      spark.sql(s"ALTER TABLE $cat.m.t ADD COLUMN note STRING")
      // the re-added column must NOT resurrect the dropped data; it
      // appends at the END (r16 — past the identity partition column,
      // the order schema-evolving INSERT merges need)
      assert(spark.table(s"$cat.m.t").columns.toSeq == Seq("n", "g", "note"))
      assert(spark.table(s"$cat.m.t").select("note").as[Option[String]]
        .collect().toSeq == Seq(None),
        "dropped column data must never resurface under a re-added name")
    }
  }

  test("ADD PARTITION FIELD: old-spec files stay readable in place, new writes nest, pruning works per shape, compact migrates") {
    withLake("pev4") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (n BIGINT, day STRING, region STRING)
           |PARTITIONED BY (region)
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      Seq((1L, "d1", "EU"), (2L, "d2", "EU"), (3L, "d1", "US"))
        .toDF("n", "day", "region")
        .write.mode("append").insertInto(s"$cat.m.t")            // spec A
      val specRow = spark.sql(
        s"CALL $cat.system.add_partition_field('m.t', 'day')")
        .as[String].head()
      assert(specRow == "region,day")
      // new writes nest region=/day=
      Seq((4L, "d1", "EU")).toDF("n", "day", "region")
        .write.mode("append").insertInto(s"$cat.m.t")            // spec B
      val dir = lake.resolve("m/t.parquet")
      assert(Files.isDirectory(dir.resolve("region=EU/day=d1")),
        "post-evolution writes must nest under the new field")
      // MIXED read: old files serve `day` from their bytes, new ones
      // from the directory — the union is seamless
      assert(spark.table(s"$cat.m.t").as[(Long, String, String)]
        .collect().sortBy(_._1).toSeq ==
        Seq((1L, "d1", "EU"), (2L, "d2", "EU"),
          (3L, "d1", "US"), (4L, "d1", "EU")))
      // filters answer correctly across both shapes (old files can't
      // dir-prune on day — conservative — but must still row-filter)
      assert(spark.table(s"$cat.m.t").where("day = 'd1'")
        .select("n").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 4L))
      assert(spark.table(s"$cat.m.t").where("region = 'US'")
        .select("n").as[Long].collect().toSeq == Seq(3L))
      // time travel still reads the pre-evolution snapshot
      assert(spark.sql(s"SELECT * FROM $cat.m.t VERSION AS OF 1").count() == 3L)
      // the manifest snapshot reader unions per shape too (the change
      // feed's read path): the mixed snapshot reads whole
      assert(graft.catalog.ManifestSnapshotReads(
          spark, lake.resolve("m/t.parquet").toString)
        .read(2L).get.count() == 4L,
        "the snapshot reader must union mixed shapes")
      // CALL analyze stats the LIVE files across shapes (a root read
      // would throw CONFLICTING_PARTITION_COLUMN_NAMES)
      assert(spark.sql(s"CALL $cat.system.analyze('m.t', 'n')")
        .as[Long].head() >= 2L)
      // row-level UPDATE works across MIXED shapes directly (r12): the
      // group scan unions per shape, the write restages under the
      // CURRENT spec — and the change is visible
      spark.sql(s"UPDATE $cat.m.t SET day = 'dx' WHERE n = 1")
      assert(spark.table(s"$cat.m.t").where("day = 'dx'")
        .select("n").as[Long].collect().toSeq == Seq(1L))
      spark.sql(s"UPDATE $cat.m.t SET day = 'd1' WHERE n = 1") // restore
      // DELETE works across shapes (restages its candidates under the
      // CURRENT spec — an unprunable condition migrates everything)
      spark.sql(s"DELETE FROM $cat.m.t WHERE n = 2")
      assert(spark.table(s"$cat.m.t").select("n").as[Long]
        .collect().sorted.toSeq == Seq(1L, 3L, 4L))
      // compact normalizes to the current layout (here the DELETE
      // already migrated; compact folds the small files)...
      spark.sql(s"CALL $cat.system.compact('m.t', 1)")
      val shapes = Snapshots.latest(dir).get.files
        .map(Snapshots.shapeOf).distinct
      assert(shapes == Seq(Seq("region", "day")),
        s"compact must normalize to the current spec, got $shapes")
      assert(spark.table(s"$cat.m.t").as[(Long, String, String)]
        .collect().sortBy(_._1).toSeq ==
        Seq((1L, "d1", "EU"), (3L, "d1", "US"), (4L, "d1", "EU")))
      // ...and day now prunes at the LISTING
      val plan = spark.table(s"$cat.m.t").where("day = 'd2'")
        .queryExecution.executedPlan.toString
      assert(spark.table(s"$cat.m.t").where("day = 'd1'").count() == 3L)
      assert(plan.contains("InMemoryFileIndex(0 paths)") ||
        !plan.contains("day=d1"),
        s"post-compact day predicate must prune directories:\n$plan")
    }
  }

  test("rename composes with manifest snapshots: time travel and the bucketed layout read under the new name") {
    withLake("pev3") { (cat, _) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (k BIGINT, v STRING)
           |PARTITIONED BY (bucket(4, k))
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      (1L to 8L).map(i => (i, s"a$i")).toDF("k", "v")
        .write.mode("append").insertInto(s"$cat.m.t")          // s-1
      spark.sql(s"ALTER TABLE $cat.m.t RENAME COLUMN v TO label")
      spark.sql(s"DELETE FROM $cat.m.t WHERE k <= 4")          // s-2
      assert(spark.table(s"$cat.m.t").columns.toSeq == Seq("k", "label"))
      assert(spark.table(s"$cat.m.t").count() == 4L)
      // pre-rename snapshot reads under the NEW logical name with its
      // data intact (the Iceberg field-id behavior)
      val v1 = spark.sql(s"SELECT * FROM $cat.m.t VERSION AS OF 1")
      assert(v1.columns.toSeq == Seq("k", "label"))
      assert(v1.where("label = 'a2'").count() == 1L)
      // the bucket point lookup still prunes + answers post-rename
      assert(spark.table(s"$cat.m.t").where("k = 7")
        .select("label").as[String].collect().toSeq == Seq("a7"))
      // bucket source column stays un-renameable
      val e = intercept[Exception](
        spark.sql(s"ALTER TABLE $cat.m.t RENAME COLUMN k TO id"))
      assert(e.getMessage.contains("partition spec"), e.getMessage)
      // and a RENAME-EVOLVED column cannot become a partition field:
      // its directory name would be the logical name while the index
      // schema speaks the physical one
      val e2 = intercept[Exception](
        spark.sql(s"CALL $cat.system.add_partition_field('m.t', 'label')"))
      assert(e2.getMessage.contains("rename-evolved"), e2.getMessage)
    }
  }

  test("rejected CREATE leaves no half-created table behind") {
    withLake("pev5") { (cat, lake) =>
      intercept[Exception](spark.sql(
        s"CREATE TABLE $cat.m.f (n BIGINT) TBLPROPERTIES ('versioned'='true')"))
      assert(!Files.exists(lake.resolve("m/f.parquet")),
        "a rejected CREATE must not leave a table directory")
      // the corrected DDL succeeds — no TableAlreadyExists from debris
      spark.sql(s"CREATE TABLE $cat.m.f (n BIGINT)")
      assert(spark.table(s"$cat.m.f").count() == 0L)
    }
  }
}

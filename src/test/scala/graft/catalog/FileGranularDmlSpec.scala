package graft.catalog

import graft.SparkSpec
import java.nio.file.{Files, Path}

/** File-granular row-level DML: with the `_graft_stats.json` min/max
  * sidecar present, a selective UPDATE/DELETE rewrites ONLY the files
  * whose ranges can match the condition — every other file carries
  * over untouched (same name, same mtime, byte-identical). This is
  * the Iceberg copy-on-write cost model: at 100 TB a one-key UPDATE
  * touches the 1–2 files covering the key, not the table. */
class FileGranularDmlSpec extends SparkSpec {
  import spark.implicits._

  /** name → (size, mtime) of the table's current data files. */
  private def fileMeta(dir: Path): Map[String, (Long, java.nio.file.attribute.FileTime)] = {
    val s = Files.list(dir)
    try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator()).asScala
      .filter { p =>
        val n = p.getFileName.toString
        Files.isRegularFile(p) && !n.startsWith("_") && !n.startsWith(".")
      }
      .map(p => p.getFileName.toString ->
        ((Files.size(p), Files.getLastModifiedTime(p))))
      .toMap
    finally s.close()
  }

  test("selective UPDATE rewrites only files whose ranges can match") {
    val lake = Files.createTempDirectory("graft-lake-fgu")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkfgu", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkfgu.path", lake.toString)
    try {
      spark.sql("CREATE TABLE lkfgu.m.t (k BIGINT, v STRING)")
      (1L to 400L).map(i => (i, s"v$i")).toDF("k", "v")
        .repartitionByRange(4, $"k")
        .write.mode("append").insertInto("lkfgu.m.t")
      spark.sql("CALL lkfgu.system.analyze('m.t', 'k')")
      val dir = lake.resolve("m/t.parquet")
      val before = fileMeta(dir)
      assert(before.size == 4)

      spark.sql("UPDATE lkfgu.m.t SET v = 'updated' WHERE k = 5")

      val after = fileMeta(dir)
      // exactly the 3 files whose k-range excludes 5 carry over:
      // same name, same size, same mtime (hard-linked, never re-read)
      val carried = before.keySet.intersect(after.keySet)
      assert(carried.size == 3,
        s"expected 3 of 4 files untouched, carried=$carried")
      carried.foreach { n =>
        assert(after(n) == before(n), s"carried file $n was modified")
      }
      assert((after.keySet -- before.keySet).nonEmpty,
        "the candidate file must be rewritten under a new name")
      // semantics intact
      assert(spark.table("lkfgu.m.t").where("k = 5")
        .select("v").as[String].collect().toSeq == Seq("updated"))
      assert(spark.table("lkfgu.m.t").count() == 400L)
      assert(spark.table("lkfgu.m.t").where("v = 'updated'").count() == 1L)
      // carried files' stats entries stay valid: pruning still works
      val plan = spark.table("lkfgu.m.t").where("k = 399")
        .queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryFileIndex"),
        "post-DML scans still plan over the file listing")
    } finally {
      spark.conf.unset("spark.sql.catalog.lkfgu")
      spark.conf.unset("spark.sql.catalog.lkfgu.path")
    }
  }

  test("selective DELETE carries non-matching files; impossible DELETE is a no-op") {
    val lake = Files.createTempDirectory("graft-lake-fgd")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkfgd", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkfgd.path", lake.toString)
    try {
      spark.sql("CREATE TABLE lkfgd.m.t (k BIGINT, v STRING)")
      (1L to 400L).map(i => (i, s"v$i")).toDF("k", "v")
        .repartitionByRange(4, $"k")
        .write.mode("append").insertInto("lkfgd.m.t")
      spark.sql("CALL lkfgd.system.analyze('m.t', 'k')")
      val dir = lake.resolve("m/t.parquet")
      val before = fileMeta(dir)

      spark.sql("DELETE FROM lkfgd.m.t WHERE k = 5")
      val after = fileMeta(dir)
      val carried = before.keySet.intersect(after.keySet)
      assert(carried.size == 3,
        s"expected 3 of 4 files untouched, carried=$carried")
      carried.foreach(n => assert(after(n) == before(n)))
      assert(spark.table("lkfgd.m.t").count() == 399L)
      assert(spark.table("lkfgd.m.t").where("k = 5").count() == 0L)

      // a DELETE no file can match is an exact no-op: zero I/O,
      // every file identical (name, size, mtime)
      val snap = fileMeta(dir)
      spark.sql("DELETE FROM lkfgd.m.t WHERE k = 99999")
      assert(fileMeta(dir) == snap, "impossible DELETE must touch nothing")
      assert(spark.table("lkfgd.m.t").count() == 399L)

      // NULL-condition semantics survive the pruned path: rows where
      // the condition is NULL are kept
      spark.sql("CREATE TABLE lkfgd.m.n (k BIGINT, v STRING)")
      Seq((Some(1L), "a"), (None, "b"), (Some(2L), "c"))
        .map { case (k, v) => (k.map(Long.box).orNull, v) }
        .toDF("k", "v").write.mode("append").insertInto("lkfgd.m.n")
      spark.sql("CALL lkfgd.system.analyze('m.n', 'k')")
      spark.sql("DELETE FROM lkfgd.m.n WHERE k = 1")
      assert(spark.table("lkfgd.m.n").select("v").as[String]
        .collect().sorted.toSeq == Seq("b", "c"),
        "NULL-key row must survive the delete")
    } finally {
      spark.conf.unset("spark.sql.catalog.lkfgd")
      spark.conf.unset("spark.sql.catalog.lkfgd.path")
    }
  }

  test("selective DELETE on a versioned table: new snapshot shares untouched files") {
    val lake = Files.createTempDirectory("graft-lake-fgv")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkfgv", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkfgv.path", lake.toString)
    try {
      val store = new graft.streaming.StateStore(
        spark, lake.resolve("m/t.parquet").toString)
      store.write((1L to 400L).map(i => (i, s"v$i")).toDF("k", "v")
        .repartitionByRange(4, $"k"), 0L)
      spark.sql("CALL lkfgv.system.analyze('m.t', 'k')")
      val v0 = lake.resolve("m/t.parquet/v=0")
      val before = fileMeta(v0)
      assert(before.size == 4)

      spark.sql("DELETE FROM lkfgv.m.t WHERE k = 5")

      val v1 = lake.resolve("m/t.parquet/v=1")
      assert(Files.isDirectory(v1), "DELETE commits snapshot v=1")
      val after = fileMeta(v1)
      // 3 of the 4 files are shared with v=0 byte-for-byte
      val shared = before.keySet.intersect(after.keySet)
      assert(shared.size == 3, s"expected 3 shared files, got $shared")
      shared.foreach(n => assert(after(n) == before(n)))
      // history intact, current correct
      assert(spark.table("lkfgv.m.t").count() == 399L)
      assert(spark.sql("SELECT count(*) FROM lkfgv.m.t VERSION AS OF 0")
        .head().getLong(0) == 400L)
      assert(fileMeta(v0) == before, "v=0 files must be untouched")
    } finally {
      spark.conf.unset("spark.sql.catalog.lkfgv")
      spark.conf.unset("spark.sql.catalog.lkfgv.path")
    }
  }

  test("MERGE INTO after analyze: whole-table fallback stays correct") {
    // MERGE's group scan typically receives no statically-prunable
    // condition (source keys are runtime data) — the split returns
    // None and the pre-r10 whole-table group runs; semantics must be
    // identical with the sidecar present
    val lake = Files.createTempDirectory("graft-lake-fgm")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkfgm", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkfgm.path", lake.toString)
    try {
      spark.sql("CREATE TABLE lkfgm.m.t (k BIGINT, v STRING)")
      (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v")
        .repartitionByRange(4, $"k")
        .write.mode("append").insertInto("lkfgm.m.t")
      spark.sql("CALL lkfgm.system.analyze('m.t', 'k')")
      Seq((5L, "merged"), (999L, "new")).toDF("k", "v")
        .createOrReplaceTempView("src_fgm")
      spark.sql(
        """MERGE INTO lkfgm.m.t t USING src_fgm s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET t.v = s.v
          |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
      assert(spark.table("lkfgm.m.t").count() == 101L)
      assert(spark.table("lkfgm.m.t").where("k = 5")
        .select("v").as[String].head() == "merged")
      assert(spark.table("lkfgm.m.t").where("k = 999")
        .select("v").as[String].head() == "new")
    } finally {
      spark.conf.unset("spark.sql.catalog.lkfgm")
      spark.conf.unset("spark.sql.catalog.lkfgm.path")
    }
  }
}

package graft.catalog

import graft.SparkSpec
import java.nio.file.{Files, Path}

/** Per-file Bloom equality skipping: `CALL system.bloom_index` writes
  * the `_graft_bloom.json` sidecar, and point lookups on
  * high-cardinality UNclustered columns — where every file's min/max
  * spans the whole domain and [[FileStats]] prunes nothing — then
  * read a strict file subset, with rows identical to the unpruned
  * answer. No false negatives ever (pruning never drops a match);
  * staleness stays conservative (unlisted files survive). */
class BloomIndexSpec extends SparkSpec {
  import spark.implicits._

  /** Number of FILE paths the scan lists, or -1 for an unpruned scan
    * (which lists the table DIRECTORY as its single root path). */
  private def scannedFiles(q: org.apache.spark.sql.DataFrame): Int = {
    val s = q.queryExecution.executedPlan.toString
    "InMemoryFileIndex\\((\\d+) paths\\)\\[([^\\]]*)".r.findFirstMatchIn(s) match {
      case Some(m) =>
        val n = m.group(1).toInt
        if (n == 0 || m.group(2).contains(".parquet/part-")) n else -1
      case None => -1
    }
  }

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

  test("bloom prunes equality lookups min/max cannot; answers identical") {
    val lake = Files.createTempDirectory("graft-lake-bloom")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkbl", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkbl.path", lake.toString)
    try {
      // HASH-scattered high-cardinality ids: every file spans ~the
      // whole lexical range, so min/max ranges are useless for `=`
      spark.sql("CREATE TABLE lkbl.m.t (id STRING, v BIGINT)")
      (0L until 400L).map(i => (f"id-$i%06d", i)).toDF("id", "v")
        .repartition(4, $"id")
        .write.mode("append").insertInto("lkbl.m.t")
      spark.sql("CALL lkbl.system.analyze('m.t', 'id')")
      val probe = "id-000123"
      val full = spark.table("lkbl.m.t").where(s"id = '$probe'")
        .as[(String, Long)].collect().toSeq
      assert(full.size == 1)
      assert(scannedFiles(spark.table("lkbl.m.t").where(s"id = '$probe'")) == -1,
        "interleaved min/max must NOT prune a mid-range key")

      assert(spark.sql("CALL lkbl.system.bloom_index('m.t', 'id', 131072, 5)")
        .head().getLong(0) == 4L)
      val pruned = spark.table("lkbl.m.t").where(s"id = '$probe'")
      val n = scannedFiles(pruned)
      assert(n >= 1 && n < 4, s"expected a strict subset of 4 files, got $n")
      assert(pruned.as[(String, Long)].collect().toSeq == full,
        "pruning must never drop the matching row")

      // an absent key empties the listing (FPP at this geometry is
      // ~1e-12 per file); the answer is exactly empty either way
      val nowhere = spark.table("lkbl.m.t").where("id = 'id-999999'")
      assert(scannedFiles(nowhere) == 0)
      assert(nowhere.count() == 0L)
      // IN: all-absent empties; mixed keeps only files that may match
      assert(scannedFiles(spark.table("lkbl.m.t")
        .where("id IN ('id-999999', 'id-888888')")) == 0)
      val mixed = spark.table("lkbl.m.t")
        .where(s"id IN ('$probe', 'id-999999')")
      assert(scannedFiles(mixed) < 4)
      assert(mixed.count() == 1L)

      // staleness: a file appended after the build always survives
      Seq(("id-999999", 9999L)).toDF("id", "v").write.mode("append")
        .insertInto("lkbl.m.t")
      assert(spark.table("lkbl.m.t").where("id = 'id-999999'").count() == 1L,
        "unlisted files are never pruned")
    } finally {
      spark.conf.unset("spark.sql.catalog.lkbl")
      spark.conf.unset("spark.sql.catalog.lkbl.path")
    }
  }

  test("selective DELETE through bloom: non-matching files carried untouched, index refreshed") {
    val lake = Files.createTempDirectory("graft-lake-bloomd")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkbd", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkbd.path", lake.toString)
    try {
      spark.sql("CREATE TABLE lkbd.m.t (id STRING, v BIGINT)")
      (0L until 400L).map(i => (f"id-$i%06d", i)).toDF("id", "v")
        .repartition(4, $"id")
        .write.mode("append").insertInto("lkbd.m.t")
      spark.sql("CALL lkbd.system.bloom_index('m.t', 'id', 131072, 5)")
      val dir = lake.resolve("m/t.parquet")
      val before = fileMeta(dir)
      assert(before.size == 4)

      spark.sql("DELETE FROM lkbd.m.t WHERE id = 'id-000123'")
      val after = fileMeta(dir)
      val carried = before.keySet.intersect(after.keySet)
      assert(carried.size == 3,
        s"expected 3 of 4 files untouched, carried=$carried")
      carried.foreach(n => assert(after(n) == before(n), s"$n modified"))
      assert(spark.table("lkbd.m.t").count() == 399L)
      assert(spark.table("lkbd.m.t").where("id = 'id-000123'").count() == 0L)

      // the rewritten file got FRESH bitsets: the next selective
      // DELETE still carries 3 files (a stale index would force the
      // rewritten file to always be a candidate — still correct, but
      // this pins that pruning keeps working across DML)
      val snap = fileMeta(dir)
      spark.sql("DELETE FROM lkbd.m.t WHERE id = 'id-000200'")
      val after2 = fileMeta(dir)
      val carried2 = snap.keySet.intersect(after2.keySet)
      assert(carried2.size == 3,
        s"post-refresh DELETE must still carry 3 files, carried=$carried2")
      assert(spark.table("lkbd.m.t").count() == 398L)

      // impossible DELETE: every bitset proves absence — exact no-op
      val snap2 = fileMeta(dir)
      spark.sql("DELETE FROM lkbd.m.t WHERE id = 'id-999999'")
      assert(fileMeta(dir) == snap2, "provably-absent DELETE must touch nothing")
    } finally {
      spark.conf.unset("spark.sql.catalog.lkbd")
      spark.conf.unset("spark.sql.catalog.lkbd.path")
    }
  }

  test("integral widening: INT literals probe BIGINT-hashed bits; composes with min/max") {
    val lake = Files.createTempDirectory("graft-lake-bloomi")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkbi", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkbi.path", lake.toString)
    try {
      // k hash-scattered (bloom's column), r range-clustered (stats')
      spark.sql("CREATE TABLE lkbi.m.t (k BIGINT, r BIGINT)")
      (0L until 400L).map(i => ((i * 7919L) % 1000L, i)).toDF("k", "r")
        .repartitionByRange(4, $"r")
        .write.mode("append").insertInto("lkbi.m.t")
      spark.sql("CALL lkbi.system.analyze('m.t', 'r')")
      spark.sql("CALL lkbi.system.bloom_index('m.t', 'k', 131072, 5)")
      // the k=7919%1000=919 key lives in exactly one r-range file
      val q = spark.table("lkbi.m.t").where("k = 919")
      assert(scannedFiles(q) >= 1 && scannedFiles(q) < 4,
        "bloom must prune on the hash-scattered integral key")
      assert(q.select("r").as[Long].collect().toSeq == Seq(1L))
      // both sidecars compose: a conjunction pruned by EITHER drops
      // files neither alone would (r-range excludes 3, bloom the rest)
      val both = spark.table("lkbi.m.t").where("k = 919 AND r > 200")
      assert(scannedFiles(both) == 0, "stats and bloom must compose")
      assert(both.count() == 0L)
      // unsupported column types are rejected upfront
      spark.sql("CREATE TABLE lkbi.m.d (x DOUBLE, k BIGINT)")
      spark.sql("INSERT INTO lkbi.m.d VALUES (1.5, 1)")
      val e = intercept[Exception](
        spark.sql("CALL lkbi.system.bloom_index('m.d', 'x', 1024, 3)").collect())
      assert(e.getMessage.contains("unsupported column type"))
    } finally {
      spark.conf.unset("spark.sql.catalog.lkbi")
      spark.conf.unset("spark.sql.catalog.lkbi.path")
    }
  }
}

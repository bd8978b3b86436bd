package graft.catalog

import graft.SparkSpec
import java.nio.file.{Files, Path}

/** Partition-granular row-level DML on partitioned lake tables: the
  * rewrite group is the PARTITION. A condition pinning an identity
  * partition (or a bucket key) rewrites only the matching `col=value`
  * subtree — every other partition directory's files stay untouched
  * (same names, same mtimes) — and rows whose partition values change
  * migrate to their new homes. Unprunable conditions fall back to the
  * whole-table group with identical semantics. */
class PartitionedDmlSpec extends SparkSpec {
  import spark.implicits._

  /** relative-path → (size, mtime) of every data file under dir. */
  private def fileMeta(dir: Path): Map[String, (Long, java.nio.file.attribute.FileTime)] = {
    if (!Files.isDirectory(dir)) return Map.empty
    val s = Files.walk(dir)
    try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator()).asScala
      .filter { p =>
        val n = p.getFileName.toString
        Files.isRegularFile(p) && !n.startsWith("_") && !n.startsWith(".")
      }
      .map(p => dir.relativize(p).toString ->
        ((Files.size(p), Files.getLastModifiedTime(p))))
      .toMap
    finally s.close()
  }

  test("UPDATE pinned to one identity partition rewrites only that subtree") {
    val lake = Files.createTempDirectory("graft-lake-pdml")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkpd", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkpd.path", lake.toString)
    try {
      spark.sql(
        """CREATE TABLE lkpd.m.t (k BIGINT, v STRING, region STRING)
          |PARTITIONED BY (region)""".stripMargin)
      (1L to 300L).map(i => (i, s"v$i", s"r${i % 3}")).toDF("k", "v", "region")
        .write.mode("append").insertInto("lkpd.m.t")
      val dir = lake.resolve("m/t.parquet")
      val before = fileMeta(dir)
      assert(before.keys.map(_.split('/').head).toSet ==
        Set("region=r0", "region=r1", "region=r2"))

      spark.sql("UPDATE lkpd.m.t SET v = 'updated' WHERE region = 'r1' AND k = 7")

      val after = fileMeta(dir)
      val untouched = before.filter { case (rel, _) => !rel.startsWith("region=r1") }
      untouched.foreach { case (rel, meta) =>
        assert(after.get(rel).contains(meta),
          s"non-matching partition file $rel was touched")
      }
      assert(after.keys.exists(_.startsWith("region=r1")),
        "the candidate partition must be rewritten")
      assert(spark.table("lkpd.m.t").where("k = 7").select("v")
        .as[String].head() == "updated")
      assert(spark.table("lkpd.m.t").count() == 300L)
      assert(spark.table("lkpd.m.t").where("v = 'updated'").count() == 1L)
    } finally {
      spark.conf.unset("spark.sql.catalog.lkpd")
      spark.conf.unset("spark.sql.catalog.lkpd.path")
    }
  }

  test("UPDATE migrating rows across partitions; unprunable UPDATE falls back whole-table") {
    val lake = Files.createTempDirectory("graft-lake-pdmm")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkpm", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkpm.path", lake.toString)
    try {
      spark.sql(
        """CREATE TABLE lkpm.m.t (k BIGINT, v STRING, region STRING)
          |PARTITIONED BY (region)""".stripMargin)
      (1L to 90L).map(i => (i, s"v$i", s"r${i % 3}")).toDF("k", "v", "region")
        .write.mode("append").insertInto("lkpm.m.t")
      val dir = lake.resolve("m/t.parquet")
      val before = fileMeta(dir)

      // move every r2 row into r9: r2's subtree empties, r9 appears,
      // r0/r1 untouched
      spark.sql("UPDATE lkpm.m.t SET region = 'r9' WHERE region = 'r2'")
      val after = fileMeta(dir)
      before.filterNot(_._1.startsWith("region=r2")).foreach { case (rel, meta) =>
        assert(after.get(rel).contains(meta), s"$rel was touched")
      }
      assert(!after.keys.exists(_.startsWith("region=r2")),
        "the emptied partition directory must be gone")
      assert(spark.table("lkpm.m.t").where("region = 'r9'").count() == 30L)
      assert(spark.table("lkpm.m.t").count() == 90L)

      // an unprunable condition (non-partition column) stays correct
      // through the whole-table group
      spark.sql("UPDATE lkpm.m.t SET v = 'x' WHERE k % 10 = 0")
      assert(spark.table("lkpm.m.t").where("v = 'x'").count() == 9L)
      assert(spark.table("lkpm.m.t").count() == 90L)
    } finally {
      spark.conf.unset("spark.sql.catalog.lkpm")
      spark.conf.unset("spark.sql.catalog.lkpm.path")
    }
  }

  test("DELETE pinned to a partition touches one subtree; impossible DELETE is a no-op") {
    val lake = Files.createTempDirectory("graft-lake-pdd")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkpe", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkpe.path", lake.toString)
    try {
      spark.sql(
        """CREATE TABLE lkpe.m.t (k BIGINT, v STRING, region STRING)
          |PARTITIONED BY (region)""".stripMargin)
      (1L to 300L).map(i => (i, s"v$i", s"r${i % 3}")).toDF("k", "v", "region")
        .write.mode("append").insertInto("lkpe.m.t")
      val dir = lake.resolve("m/t.parquet")
      val before = fileMeta(dir)

      spark.sql("DELETE FROM lkpe.m.t WHERE region = 'r0' AND k = 3")
      val after = fileMeta(dir)
      before.filterNot(_._1.startsWith("region=r0")).foreach { case (rel, meta) =>
        assert(after.get(rel).contains(meta), s"$rel was touched")
      }
      assert(spark.table("lkpe.m.t").count() == 299L)
      assert(spark.table("lkpe.m.t").where("k = 3").count() == 0L)

      // a DELETE no partition can match: exact no-op, nothing moves
      val snap = fileMeta(dir)
      spark.sql("DELETE FROM lkpe.m.t WHERE region = 'nope'")
      assert(fileMeta(dir) == snap, "impossible DELETE must touch nothing")
      assert(spark.table("lkpe.m.t").count() == 299L)
    } finally {
      spark.conf.unset("spark.sql.catalog.lkpe")
      spark.conf.unset("spark.sql.catalog.lkpe.path")
    }
  }

  test("bucket-key DML prunes to the one _gbucket subtree; MERGE stays correct") {
    val lake = Files.createTempDirectory("graft-lake-pdb")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkpb", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkpb.path", lake.toString)
    try {
      spark.sql(
        """CREATE TABLE lkpb.m.t (k BIGINT, v STRING)
          |PARTITIONED BY (bucket(4, k))""".stripMargin)
      (1L to 200L).map(i => (i, s"v$i")).toDF("k", "v")
        .write.mode("append").insertInto("lkpb.m.t")
      val dir = lake.resolve("m/t.parquet")
      val before = fileMeta(dir)
      assert(before.keys.map(_.split('/').head).toSet.size == 4)

      spark.sql("UPDATE lkpb.m.t SET v = 'updated' WHERE k = 17")
      val after = fileMeta(dir)
      // exactly one bucket subtree rewritten: hidden-partition pruning
      val touchedBuckets = before.keySet.filterNot(rel =>
        after.get(rel) == before.get(rel)).map(_.split('/').head) ++
        (after.keySet -- before.keySet).map(_.split('/').head)
      assert(touchedBuckets.size == 1,
        s"expected one bucket subtree touched, got $touchedBuckets")
      assert(spark.table("lkpb.m.t").where("k = 17").select("v")
        .as[String].head() == "updated")
      assert(spark.table("lkpb.m.t").count() == 200L)

      // MERGE (runtime source keys — unprunable) through the
      // whole-table group, semantics intact
      Seq((17L, "merged"), (999L, "new")).toDF("k", "v")
        .createOrReplaceTempView("src_pdb")
      spark.sql(
        """MERGE INTO lkpb.m.t t USING src_pdb s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET t.v = s.v
          |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
      assert(spark.table("lkpb.m.t").count() == 201L)
      assert(spark.table("lkpb.m.t").where("k = 17").select("v")
        .as[String].head() == "merged")
      assert(spark.table("lkpb.m.t").where("k = 999").select("v")
        .as[String].head() == "new")
    } finally {
      spark.conf.unset("spark.sql.catalog.lkpb")
      spark.conf.unset("spark.sql.catalog.lkpb.path")
    }
  }

  test("hidden-partition READ pruning: bucket-key lookup lists only matching subtrees") {
    val lake = Files.createTempDirectory("graft-lake-pbr")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkpr", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkpr.path", lake.toString)
    try {
      spark.sql(
        """CREATE TABLE lkpr.m.t (k BIGINT, v STRING)
          |PARTITIONED BY (bucket(4, k))""".stripMargin)
      (1L to 200L).map(i => (i, s"v$i")).toDF("k", "v")
        .write.mode("append").insertInto("lkpr.m.t")

      // (rootCount, firstListedPath): a pruned scan lists N
      // `_gbucket=` subtree roots; an unpruned one lists the table
      // root as its single path (the listing blob truncates, so only
      // the count and the first path are reliable)
      def listing(q: org.apache.spark.sql.DataFrame): (Int, String) =
        "InMemoryFileIndex\\((\\d+) paths\\)\\[([^,\\]]*)".r
          .findFirstMatchIn(q.queryExecution.executedPlan.toString)
          .map(m => (m.group(1).toInt, m.group(2))).getOrElse((-1, ""))

      // the full scan plans every bucket subtree (the keyed SPJ scan
      // lists per-bucket roots — 4 paths, not the single table root)
      val (n0, p0) = listing(spark.table("lkpr.m.t"))
      assert(n0 == 4 && p0.contains("_gbucket="),
        s"keyed full scan lists all 4 bucket subtrees, got ($n0, $p0)")
      // a key equality lists exactly its bucket subtree, answer exact
      val q = spark.table("lkpr.m.t").where("k = 17")
      val (n1, p1) = listing(q)
      assert(n1 == 1 && p1.contains("_gbucket="),
        s"one key must list its one bucket subtree, got ($n1, $p1)")
      assert(q.select("v").as[String].collect().toSeq == Seq("v17"))
      // IN keys across buckets: subtree listing when the keys leave
      // some bucket untouched, root fallback when they cover all 4 —
      // exact rows either way
      val inBuckets = Seq(17L, 18L, 19L).map(k =>
        spark.sql(s"SELECT pmod(hash(CAST($k AS BIGINT)), 4)")
          .head().getInt(0)).distinct
      val qin = spark.table("lkpr.m.t").where("k IN (17, 18, 19)")
      if (inBuckets.size < 4) {
        val (nin, pin) = listing(qin)
        assert(nin == inBuckets.size && pin.contains("_gbucket="),
          s"expected ${inBuckets.size} bucket subtrees, got ($nin, $pin)")
      }
      assert(qin.select("v").as[String].collect().sorted.toSeq ==
        Seq("v17", "v18", "v19"))
      // non-key predicates cannot prune: all 4 subtrees stay listed
      val qv = spark.table("lkpr.m.t").where("v = 'v17'")
      assert(listing(qv)._1 == 4,
        s"no bucket pruning without a key predicate, got ${listing(qv)}")
      assert(qv.select("k").as[Long].collect().toSeq == Seq(17L))
    } finally {
      spark.conf.unset("spark.sql.catalog.lkpr")
      spark.conf.unset("spark.sql.catalog.lkpr.path")
    }
  }
}

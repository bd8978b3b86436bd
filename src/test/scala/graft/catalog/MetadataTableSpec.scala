package graft.catalog

import graft.SparkSpec
import java.nio.file.Files

/** Metadata tables: `SELECT * FROM cat.db.t.history` / `.files` —
  * driver-local inspection reports over the snapshot layout and the
  * current file listing, zero data files opened, always reflecting
  * the directory state at query time. */
class MetadataTableSpec extends SparkSpec {
  import spark.implicits._

  test("history and files over versioned and plain tables") {
    val lake = Files.createTempDirectory("graft-lake-meta")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkmt", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkmt.path", lake.toString)
    try {
      // versioned: 3 snapshot commits
      val store = new graft.streaming.StateStore(
        spark, lake.resolve("m/vt.parquet").toString)
      store.write(Seq((1L, "a")).toDF("k", "v"), 0L)
      store.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), 1L)
      store.write(Seq((2L, "b")).toDF("k", "v"), 2L)
      val hist = spark.sql("SELECT * FROM lkmt.m.vt.history")
        .as[(Option[Long], Option[Long], Long, Long)].collect().toSeq
      assert(hist.map(_._1) == Seq(Some(0L), Some(1L), Some(2L)))
      assert(hist.forall(r => r._3 >= 1L && r._4 > 0L),
        "every snapshot reports files and bytes")
      // the .snapshots METADATA table (r12): flat stores report
      // version/commit/parent, null operation
      val snapsMeta = spark.sql(
        "SELECT version, parent, operation FROM lkmt.m.vt.snapshots")
        .as[(Long, Option[Long], Option[String])].collect().toSeq
      assert(snapsMeta.map(_._1) == Seq(0L, 1L, 2L))
      assert(snapsMeta(1)._2.contains(0L) && snapsMeta(2)._2.contains(1L),
        s"flat-store parents must surface: $snapsMeta")
      assert(snapsMeta.forall(_._3.isEmpty))
      // commit stamps agree with the snapshots procedure
      val proc = spark.sql("CALL lkmt.system.snapshots('m.vt')")
        .select("version", "commit_ms").as[(Long, Long)].collect().toMap
      hist.foreach(r => assert(r._2 == proc.get(r._1.get)))

      // files: the CURRENT (latest snapshot) data files, rows NULL
      // before analyze, populated after — still zero data reads
      val files0 = spark.sql("SELECT * FROM lkmt.m.vt.files")
        .as[(String, Long, Option[Long], String, Option[Long])]
        .collect().toSeq
      assert(files0.nonEmpty && files0.forall(_._3.isEmpty))
      assert(files0.forall(_._4 == "data"))
      // flat (v=<n>) stores have no manifest commit sequence
      assert(files0.forall(_._5.isEmpty))
      spark.sql("CALL lkmt.system.analyze('m.vt', 'k')")
      val files1 = spark.sql("SELECT * FROM lkmt.m.vt.files")
        .as[(String, Long, Option[Long], String, Option[Long])]
        .collect().toSeq
      assert(files1.map(_._3).flatten.sum == 1L,
        "post-analyze row counts come from the sidecar (v=2 holds 1 row)")

      // plain table: single pseudo-row history (no commit axis),
      // files reflect the listing
      spark.sql("CREATE TABLE lkmt.m.pt (k BIGINT)")
      (1L to 10L).toDF("k").repartition(2)
        .write.mode("append").insertInto("lkmt.m.pt")
      val ph = spark.sql("SELECT * FROM lkmt.m.pt.history")
        .as[(Option[Long], Option[Long], Long, Long)].collect().toSeq
      assert(ph.size == 1 && ph.head._1.isEmpty && ph.head._3 == 2L)
      assert(spark.sql("SELECT * FROM lkmt.m.pt.files").count() == 2L)

      // a DML commit shows up immediately (state read at scan time)
      spark.sql("DELETE FROM lkmt.m.vt WHERE k = 2")
      assert(spark.sql("SELECT max(version) FROM lkmt.m.vt.history")
        .head().getLong(0) == 3L)

      // unknown metadata name / missing base table fail loudly
      intercept[Exception](spark.sql("SELECT * FROM lkmt.m.vt.nope").collect())
      intercept[Exception](spark.sql("SELECT * FROM lkmt.m.nosuch.files").collect())
    } finally {
      spark.conf.unset("spark.sql.catalog.lkmt")
      spark.conf.unset("spark.sql.catalog.lkmt.path")
    }
  }

  test("partitions over partitioned and plain tables; files are partition-relative") {
    val lake = Files.createTempDirectory("graft-lake-meta2")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkmp", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkmp.path", lake.toString)
    try {
      spark.sql(
        """CREATE TABLE lkmp.m.pt (k BIGINT, v STRING, region STRING)
          |PARTITIONED BY (region)""".stripMargin)
      Seq((1L, "a", "EU"), (2L, "b", "EU"), (3L, "c", "US"))
        .toDF("k", "v", "region")
        .write.mode("append").insertInto("lkmp.m.pt")
      val parts = spark.sql("SELECT * FROM lkmp.m.pt.partitions")
        .as[(Option[String], Long, Long, Option[Long])].collect().toSeq
      assert(parts.map(_._1) == Seq(Some("region=EU"), Some("region=US")),
        s"sorted leaf partitions, got $parts")
      assert(parts.forall(p => p._2 >= 1L && p._3 > 0L))
      // rows NULL before analyze (no data read), exact after
      assert(parts.forall(_._4.isEmpty))
      spark.sql("CALL lkmp.system.analyze('m.pt', 'k')")
      val parts1 = spark.sql("SELECT * FROM lkmp.m.pt.partitions")
        .as[(Option[String], Long, Long, Option[Long])].collect().toSeq
      assert(parts1.map(_._4) == Seq(Some(2L), Some(1L)),
        s"post-analyze per-partition row counts, got $parts1")
      // .files paths carry the partition directory
      val files = spark.sql("SELECT file FROM lkmp.m.pt.files")
        .as[String].collect().toSeq
      assert(files.nonEmpty && files.forall(_.matches("region=(EU|US)/.*")),
        s"expected partition-relative paths, got $files")
      // a dynamic overwrite is visible immediately
      Seq((9L, "z", "APAC")).toDF("k", "v", "region")
        .write.mode("append").insertInto("lkmp.m.pt")
      assert(spark.sql("SELECT * FROM lkmp.m.pt.partitions").count() == 3L)

      // plain table: one NULL-partition row describing current contents
      spark.sql("CREATE TABLE lkmp.m.flat (k BIGINT)")
      (1L to 6L).toDF("k").repartition(2)
        .write.mode("append").insertInto("lkmp.m.flat")
      val flat = spark.sql("SELECT * FROM lkmp.m.flat.partitions")
        .as[(Option[String], Long, Long, Option[Long])].collect().toSeq
      assert(flat.size == 1 && flat.head._1.isEmpty && flat.head._2 == 2L)
    } finally {
      spark.conf.unset("spark.sql.catalog.lkmp")
      spark.conf.unset("spark.sql.catalog.lkmp.path")
    }
  }

  test("tags metadata table: one row per tag with the commit stamp") {
    import spark.implicits._
    val lake = java.nio.file.Files.createTempDirectory("graft-lake-mtags")
    java.nio.file.Files.createDirectories(lake.resolve("state"))
    spark.conf.set("spark.sql.catalog.lkmtg", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkmtg.path", lake.toString)
    try {
      val store = new graft.streaming.StateStore(
        spark, lake.resolve("state/t.parquet").toString)
      store.write(Seq((1L, 1L)).toDF("id", "v"), 0L)
      store.write(Seq((1L, 2L)).toDF("id", "v"), 1L)
      // empty before any tag
      assert(spark.sql("SELECT * FROM lkmtg.state.t.tags").count() == 0L)
      spark.sql("CALL lkmtg.system.tag('state.t', 'stable', 0)").collect()
      spark.sql("CALL lkmtg.system.tag('state.t', 'candidate', 1)").collect()
      val rows = spark.sql("SELECT name, version, commit_ms FROM lkmtg.state.t.tags")
        .as[(String, Long, Option[Long])].collect().toSeq
      assert(rows.map(r => r._1 -> r._2) ==
        Seq("candidate" -> 1L, "stable" -> 0L))
      assert(rows.forall(_._3.exists(_ > 0L)), "commit stamps present")
      // the stamp matches the history row's for the same version
      val hist = spark.sql("SELECT version, commit_ms FROM lkmtg.state.t.history")
        .as[(Option[Long], Option[Long])].collect()
        .flatMap { case (v, ms) => v.map(_ -> ms) }.toMap
      assert(rows.forall(r => hist(r._2) == r._3))
    } finally {
      spark.conf.unset("spark.sql.catalog.lkmtg")
      spark.conf.unset("spark.sql.catalog.lkmtg.path")
    }
  }
}

package graft.catalog

import graft.SparkSpec
import java.nio.file.{Files, Path}

/** Manifest-snapshot versioning on PARTITIONED lake tables
  * (`TBLPROPERTIES ('versioned'='true')`): every commit writes a
  * `_graft_snapshots/s-<n>.json` manifest, the current read resolves
  * the latest manifest's file list, `VERSION/TIMESTAMP AS OF` reads an
  * older one, and replaced files stay on disk for older snapshots —
  * the Iceberg model, where a snapshot is a FILE LIST, not a
  * directory. */
class VersionedPartitionedSpec extends SparkSpec {
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

  private def rows(cat: String): Seq[(Long, String)] =
    spark.table(s"$cat.m.t").as[(Long, String)].collect().sortBy(_._1).toSeq

  test("commits write manifests; current read = latest; VERSION AS OF reads history; replaced files survive for old snapshots") {
    withLake("vp1") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (n BIGINT, region STRING)
           |PARTITIONED BY (region)
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      val dir = lake.resolve("m/t.parquet")
      // s-0 is the empty initial snapshot
      assert(Snapshots.versions(dir) == Seq(0L))
      assert(spark.table(s"$cat.m.t").count() == 0L)

      // v1: append
      Seq((1L, "EU"), (2L, "US")).toDF("n", "region")
        .write.mode("append").insertInto(s"$cat.m.t")
      assert(Snapshots.versions(dir) == Seq(0L, 1L))
      assert(rows(cat) == Seq((1L, "EU"), (2L, "US")))

      // v2: dynamic overwrite of EU only
      val prevMode = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "STATIC")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "DYNAMIC")
      try spark.sql(s"INSERT OVERWRITE $cat.m.t VALUES (10, 'EU')")
      finally spark.conf.set(
        "spark.sql.sources.partitionOverwriteMode", prevMode)
      assert(rows(cat) == Seq((2L, "US"), (10L, "EU")))

      // time travel: every version still reads its own content
      def at(v: Any): Seq[(Long, String)] =
        spark.sql(s"SELECT * FROM $cat.m.t VERSION AS OF $v")
          .as[(Long, String)].collect().sortBy(_._1).toSeq
      assert(at(0) == Seq.empty)
      assert(at(1) == Seq((1L, "EU"), (2L, "US")),
        "the overwritten EU file must still be readable at v1")
      assert(at(2) == Seq((2L, "US"), (10L, "EU")))

      // v3: DELETE — old snapshot content unaffected
      spark.sql(s"DELETE FROM $cat.m.t WHERE n = 2")
      assert(rows(cat) == Seq((10L, "EU")))
      assert(at(2) == Seq((2L, "US"), (10L, "EU")))

      // v4: UPDATE (row-level rewrite through the manifest)
      spark.sql(s"UPDATE $cat.m.t SET n = 11 WHERE region = 'EU'")
      assert(rows(cat) == Seq((11L, "EU")))
      assert(at(3) == Seq((10L, "EU")))
      assert(Snapshots.versions(dir) == Seq(0L, 1L, 2L, 3L, 4L))

      // partition pruning still plans on the snapshot scan: exactly
      // ONE live file (the EU partition's) reaches the file index
      val plan = spark.table(s"$cat.m.t").where("region = 'EU'")
        .queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryFileIndex(1 paths)") &&
        plan.contains("region=EU"),
        s"expected a one-file manifest-pruned scan, got:\n$plan")

      // historical views are read-only (Spark's parser already rejects
      // DML-with-time-travel SQL; the connector guard is the backstop)
      val plugin = new GraftLakeCatalog
      plugin.initialize(cat, new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("path", lake.toString)))
      val hist = plugin.loadTable(
        org.apache.spark.sql.connector.catalog.Identifier.of(Array("m"), "t"), "1")
      assert(hist.capabilities().size() == 1 &&
        hist.capabilities().contains(
          org.apache.spark.sql.connector.catalog.TableCapability.BATCH_READ),
        "a time-travel snapshot view must be read-only")
      val e = intercept[UnsupportedOperationException](
        hist.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsDeleteV2]
          .deleteWhere(Array.empty))
      assert(e.getMessage.contains("read-only"), e.getMessage)
    }
  }

  test("TIMESTAMP AS OF resolves through manifest commit stamps; truncate commits an empty snapshot") {
    withLake("vp2") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (n BIGINT, region STRING)
           |PARTITIONED BY (region)
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      val dir = lake.resolve("m/t.parquet")
      Seq((1L, "EU")).toDF("n", "region")
        .write.mode("append").insertInto(s"$cat.m.t")
      // nudge the manifest stamps apart so the boundary is testable
      val s1 = Snapshots.read(dir, 1L).get
      Thread.sleep(5)
      Seq((2L, "US")).toDF("n", "region")
        .write.mode("append").insertInto(s"$cat.m.t")
      val s2 = Snapshots.read(dir, 2L).get
      assert(s2.commitMs >= s1.commitMs)
      val t1 = java.time.Instant.ofEpochMilli(s1.commitMs).toString
      val got = spark.sql(
        s"SELECT * FROM $cat.m.t TIMESTAMP AS OF '$t1'")
        .as[(Long, String)].collect().toSeq
      assert(got == Seq((1L, "EU")),
        s"TIMESTAMP AS OF '$t1' must read s-1, got $got")

      // TRUNCATE = an empty snapshot; history intact
      spark.sql(s"TRUNCATE TABLE $cat.m.t")
      assert(spark.table(s"$cat.m.t").count() == 0L)
      assert(spark.sql(s"SELECT * FROM $cat.m.t VERSION AS OF 2")
        .count() == 2L)
      // and the table still accepts writes after truncate
      Seq((9L, "SA")).toDF("n", "region")
        .write.mode("append").insertInto(s"$cat.m.t")
      assert(rows(cat) == Seq((9L, "SA")))
    }
  }

  test("bucketed versioned table: SPJ keyed scan reads the snapshot's files; point lookup prunes buckets") {
    withLake("vp3") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (k BIGINT, v STRING)
           |PARTITIONED BY (bucket(4, k))
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      (1L to 40L).map(i => (i, s"a$i")).toDF("k", "v")
        .write.mode("append").insertInto(s"$cat.m.t")
      // overwrite everything: the old files stay for v1
      spark.sql(s"INSERT OVERWRITE $cat.m.t " +
        "SELECT id AS k, concat('b', id) AS v FROM range(1, 11)")
      assert(spark.table(s"$cat.m.t").count() == 10L,
        "current read must see only the latest snapshot's files")
      assert(spark.sql(s"SELECT * FROM $cat.m.t VERSION AS OF 1")
        .count() == 40L)
      // the point lookup still answers from the current snapshot
      assert(spark.table(s"$cat.m.t").where("k = 7")
        .select("v").as[String].collect().toSeq == Seq("b7"))
    }
  }

  private def dataFiles(dir: Path): Seq[String] = {
    val s = Files.walk(dir)
    try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator()).asScala
      .filter { p =>
        val n = p.getFileName.toString
        Files.isRegularFile(p) && !n.startsWith("_") && !n.startsWith(".") &&
          !p.startsWith(dir.resolve(Snapshots.DirName)) &&
          !p.startsWith(dir.resolve(Tags.DirName)) // per-tag files (r12)
      }.map(p => dir.relativize(p).toString).toSeq.sorted
    finally s.close()
  }

  test("lifecycle procedures on manifest tables: snapshots, tag + VERSION AS OF name, rollback, expire GCs unreferenced files") {
    withLake("vp5") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (n BIGINT, region STRING)
           |PARTITIONED BY (region)
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      val dir = lake.resolve("m/t.parquet")
      Seq((1L, "EU")).toDF("n", "region")
        .write.mode("append").insertInto(s"$cat.m.t")          // s-1
      spark.sql(s"INSERT OVERWRITE $cat.m.t VALUES (2, 'EU')") // s-2 (truncate-mode)
      Seq((3L, "US")).toDF("n", "region")
        .write.mode("append").insertInto(s"$cat.m.t")          // s-3

      // snapshots report: one row per manifest, real commit stamps
      val snaps = spark.sql(s"CALL $cat.system.snapshots('m.t')")
        .select("version", "commit_ms").as[(Long, Long)].collect().toSeq
      assert(snaps.map(_._1) == Seq(0L, 1L, 2L, 3L))
      assert(snaps.forall(_._2 > 0L))
      // r12 audit columns: operation + parent chain + file summary
      val audit = spark.sql(s"CALL $cat.system.snapshots('m.t')")
        .select("version", "operation", "parent", "total_files")
        .as[(Long, String, Option[Long], Long)].collect().toSeq
      assert(audit.head == ((0L, "create", None, 0L)))
      assert(audit(1)._2 == "append" && audit(1)._3.contains(0L))

      // tag s-1, address it by name. r13: a tag on a manifest table IS
      // an OCC commit (s-4, op 'tag') carrying the ref state in the
      // chain — expire's pin read is linearized with it
      spark.sql(s"CALL $cat.system.tag('m.t', 'before_overwrite', 1)")
      assert(Snapshots.latest(dir).get.operation == "tag" &&
        Snapshots.latest(dir).get.pins == Map("before_overwrite" -> 1L))
      assert(spark.sql(s"SELECT * FROM $cat.m.t VERSION AS OF 'before_overwrite'")
        .as[(Long, String)].collect().toSeq == Seq((1L, "EU")))

      // rollback to s-2: non-destructive (a NEW manifest s-5)
      val nv = spark.sql(s"CALL $cat.system.rollback('m.t', 2)")
        .as[Long].head()
      assert(nv == 5L)
      assert(rows(cat) == Seq((2L, "EU")))
      assert(spark.sql(s"SELECT * FROM $cat.m.t VERSION AS OF 3")
        .count() == 2L, "rolled-back-over snapshots stay readable")

      // expire to the newest 1 + the tagged pin: s-1 (tagged) and s-5
      // survive; the v1-only and v3-only files are GC'd from disk.
      // r13: expiry IS a commit — it publishes an `expire` snapshot
      // (s-6, same live files as s-5) recording the dropped versions
      // BEFORE any deletion, so racing rollbacks/commits re-validate
      // against it instead of publishing over GC'd files
      val before = dataFiles(dir)
      spark.sql(s"CALL $cat.system.expire_snapshots('m.t', 1)")
      assert(Snapshots.versions(dir) == Seq(1L, 5L, 6L),
        "expire keeps the newest keep=1 plus tagged snapshots, and " +
          "publishes its own audit commit")
      val exp = Snapshots.readMeta(dir, 6L).get
      assert(exp.operation == "expire" && exp.dropped == Seq(0L, 2L, 3L, 4L),
        s"the expire commit must record its drops, got $exp")
      val after = dataFiles(dir)
      val live = Snapshots.referencedFiles(dir)
      assert(after.toSet == live,
        s"disk must hold exactly the referenced files; " +
          s"had $before, now $after, live $live")
      assert(before.size > after.size, "expire must GC unreferenced files")
      // the survivors still read correctly
      assert(rows(cat) == Seq((2L, "EU")))
      assert(spark.sql(s"SELECT * FROM $cat.m.t VERSION AS OF 'before_overwrite'")
        .as[(Long, String)].collect().toSeq == Seq((1L, "EU")))
      // expired versions are gone
      val e = intercept[Exception](
        spark.sql(s"SELECT * FROM $cat.m.t VERSION AS OF 3").collect())
      assert(e.getMessage.contains("expired"), e.getMessage)
    }
  }

  test("compact on a manifest table commits a new snapshot; history intact") {
    withLake("vp6") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (n BIGINT, region STRING)
           |PARTITIONED BY (region)
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      val dir = lake.resolve("m/t.parquet")
      // several small appends → several files per partition
      (1 to 4).foreach(i =>
        Seq((i.toLong, "EU"), (i + 10L, "US")).toDF("n", "region")
          .write.mode("append").insertInto(s"$cat.m.t"))
      val filesBefore = Snapshots.latest(dir).get.files
      assert(filesBefore.size == 8)
      val nv = spark.sql(s"CALL $cat.system.compact('m.t', 1)").as[Long].head()
      assert(nv == 5L)
      val filesAfter = Snapshots.latest(dir).get.files
      assert(filesAfter.size == 2, s"one file per partition, got $filesAfter")
      assert(spark.table(s"$cat.m.t").count() == 8L)
      // pre-compaction snapshot still reads its own files
      assert(spark.sql(s"SELECT * FROM $cat.m.t VERSION AS OF 4").count() == 8L)
      // layout preserved
      assert(filesAfter.forall(f => f.startsWith("region=")))
    }
  }

  test("within-partition file skipping: analyze'd min/max stats compose with partition pruning on the hive layout") {
    withLake("vp7") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (k BIGINT, region STRING)
           |PARTITIONED BY (region)""".stripMargin)
      // three appends per partition → three files with DISJOINT k
      // ranges inside each region directory
      Seq(1L to 10L, 100L to 110L, 1000L to 1010L).foreach { r =>
        r.map(k => (k, "EU")).toDF("k", "region")
          .write.mode("append").insertInto(s"$cat.m.t")
        r.map(k => (k + 5, "US")).toDF("k", "region")
          .write.mode("append").insertInto(s"$cat.m.t")
      }
      spark.sql(s"CALL $cat.system.analyze('m.t', 'k')")
      // region prunes to EU (3 files), then k = 105 skips to ONE file
      val q = spark.table(s"$cat.m.t")
        .where("region = 'EU' AND k = 105")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryFileIndex(1 paths)") &&
        plan.contains("region=EU"),
        s"expected partition pruning + file skipping to leave 1 file:\n$plan")
      assert(q.count() == 1L)
      // the same composition holds on a MANIFEST-versioned table
      spark.sql(
        s"""CREATE TABLE $cat.m.v (k BIGINT, region STRING)
           |PARTITIONED BY (region)
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      Seq(1L to 10L, 100L to 110L).foreach { r =>
        r.map(k => (k, "EU")).toDF("k", "region")
          .write.mode("append").insertInto(s"$cat.m.v")
      }
      spark.sql(s"CALL $cat.system.analyze('m.v', 'k')")
      val qv = spark.table(s"$cat.m.v").where("k = 105")
      val planv = qv.queryExecution.executedPlan.toString
      assert(planv.contains("InMemoryFileIndex(1 paths)"),
        s"snapshot scan must skip the out-of-range file:\n$planv")
      assert(qv.count() == 1L)
    }
  }

  test("metadata tables + metadata-only aggregates on the partitioned layouts") {
    withLake("vp8") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (k BIGINT, region STRING)
           |PARTITIONED BY (region)
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      Seq((1L, "EU"), (2L, "US")).toDF("k", "region")
        .write.mode("append").insertInto(s"$cat.m.t")
      Seq((3L, "EU")).toDF("k", "region")
        .write.mode("append").insertInto(s"$cat.m.t")
      spark.sql(s"INSERT OVERWRITE $cat.m.t VALUES (9, 'EU')") // s-3

      // .history: one row per manifest with file counts
      val hist = spark.table(s"$cat.m.t.history")
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(hist.map(_._1) == Seq(0L, 1L, 2L, 3L))
      assert(hist.map(_._3) == Seq(0L, 2L, 3L, 1L),
        s"per-snapshot file counts, got $hist")

      // .files: exactly the LATEST manifest's files — never the dead
      // files still on disk for older snapshots
      val files = spark.table(s"$cat.m.t.files")
        .select("file").as[String].collect().toSeq
      assert(files.size == 1 && files.head.startsWith("region=EU/"),
        s"current files must be the latest manifest's, got $files")

      // .partitions groups the latest manifest by directory
      val parts = spark.table(s"$cat.m.t.partitions")
        .select("partition", "n_files").as[(String, Long)].collect().toSeq
      assert(parts == Seq(("region=EU", 1L)), s"got $parts")

      // .tags resolves commit stamps through the manifest log
      spark.sql(s"CALL $cat.system.tag('m.t', 'stable', 2)")
      val tags = spark.table(s"$cat.m.t.tags")
        .as[(String, Long, Option[Long])].collect().toSeq
      assert(tags.map(t => (t._1, t._2)) == Seq(("stable", 2L)))
      assert(tags.head._3.exists(_ > 0L), "manifest commit stamp expected")

      // metadata-only aggregates: after CALL analyze, count/min/max
      // answer from the sidecar with ZERO data files opened
      spark.sql(s"CALL $cat.system.analyze('m.t', 'k')")
      val agg = spark.sql(
        s"SELECT count(*) AS n, min(k) AS mn, max(k) AS mx FROM $cat.m.t")
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("stats-agg") || plan.contains("LocalTableScan"),
        s"expected the sidecar-served local scan:\n$plan")
      assert(agg.as[(Long, Long, Long)].head() == ((1L, 9L, 9L)))

      // and on a PLAIN partitioned table too
      spark.sql(
        s"""CREATE TABLE $cat.m.p (k BIGINT, region STRING)
           |PARTITIONED BY (region)""".stripMargin)
      Seq((5L, "EU"), (7L, "US")).toDF("k", "region")
        .write.mode("append").insertInto(s"$cat.m.p")
      spark.sql(s"CALL $cat.system.analyze('m.p', 'k')")
      val aggP = spark.sql(
        s"SELECT count(*) AS n, min(k) AS mn, max(k) AS mx FROM $cat.m.p")
      assert(aggP.queryExecution.executedPlan.toString.contains("stats-agg") ||
        aggP.queryExecution.executedPlan.toString.contains("LocalTableScan"))
      assert(aggP.as[(Long, Long, Long)].head() == ((2L, 5L, 7L)))
      // a stale sidecar (new un-analyzed file) bails to a REAL scan —
      // correctness over cleverness
      Seq((100L, "EU")).toDF("k", "region")
        .write.mode("append").insertInto(s"$cat.m.p")
      assert(spark.sql(s"SELECT max(k) AS mx FROM $cat.m.p")
        .as[Long].head() == 100L)
    }
  }

  test("partition-preserving zorder on a manifest table: new snapshot, layout intact, tighter skipping after analyze") {
    withLake("vp9") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (k BIGINT, d BIGINT, region STRING)
           |PARTITIONED BY (region)
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      val dir = lake.resolve("m/t.parquet")
      // three appends with INTERLEAVED k ranges → every file spans the
      // whole domain, so min/max stats can't skip anything
      (0 until 3).foreach { i =>
        (0L until 30L).filter(_ % 3 == i).map(k => (k, k % 7, "EU"))
          .toDF("k", "d", "region")
          .write.mode("append").insertInto(s"$cat.m.t")
      }
      spark.sql(s"CALL $cat.system.analyze('m.t', 'k')")
      val before = spark.table(s"$cat.m.t").where("k = 5")
        .queryExecution.executedPlan.toString
      assert(before.contains("InMemoryFileIndex(3 paths)"),
        s"interleaved files must not skip:\n$before")
      // zorder re-clusters within the partition as a NEW snapshot
      // (s-5: create=0, appends=1..3, the r12 commit-atomic analyze=4)
      val nv = spark.sql(s"CALL $cat.system.zorder('m.t', 'k', 'd', 3)")
        .as[Long].head()
      assert(nv == 5L)
      spark.sql(s"CALL $cat.system.analyze('m.t', 'k')")
      assert(spark.table(s"$cat.m.t").as[(Long, Long, String)]
        .collect().sortBy(_._1).map(_._1).toSeq == (0L until 30L))
      val after = spark.table(s"$cat.m.t").where("k = 5")
        .queryExecution.executedPlan.toString
      assert(after.contains("InMemoryFileIndex(1 paths)"),
        s"clustered files must skip to one:\n$after")
      // layout preserved, pre-zorder snapshot intact
      assert(Snapshots.latest(dir).get.files.forall(_.startsWith("region=")))
      assert(spark.sql(s"SELECT * FROM $cat.m.t VERSION AS OF 3").count() == 30L)
      // plain partitioned tables keep the explicit rejection
      spark.sql(
        s"""CREATE TABLE $cat.m.p (k BIGINT, d BIGINT, g STRING)
           |PARTITIONED BY (g)""".stripMargin)
      val e = intercept[Exception](
        spark.sql(s"CALL $cat.system.zorder('m.p', 'k', 'd', 2)"))
      assert(e.getMessage.contains("versioned"), e.getMessage)
    }
  }

  test("guard rails: plain partitioned tables reject time travel; flat tables reject the property") {
    withLake("vp4") { (cat, _) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.plain (n BIGINT, g STRING)
           |PARTITIONED BY (g)""".stripMargin)
      Seq((1L, "x")).toDF("n", "g").write.mode("append")
        .insertInto(s"$cat.m.plain")
      val e1 = intercept[Exception](
        spark.sql(s"SELECT * FROM $cat.m.plain VERSION AS OF 0").collect())
      assert(e1.getMessage.contains("versioned"), e1.getMessage)
      val e2 = intercept[Exception](spark.sql(
        s"CREATE TABLE $cat.m.flat (n BIGINT) TBLPROPERTIES ('versioned'='true')"))
      assert(e2.getMessage.contains("PARTITIONED"), e2.getMessage)
    }
  }
}

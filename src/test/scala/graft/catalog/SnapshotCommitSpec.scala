package graft.catalog

import graft.SparkSpec
import java.nio.file.{Files, Path}

/** r12 manifest-log semantics: optimistic multi-writer commits (atomic
  * create-if-absent + retry-against-refreshed-latest), read-set
  * conflict detection, operation/summary audit fields, commit-atomic
  * per-snapshot file stats, `CALL migrate` (plain → manifest in
  * place), and `CALL drop_partition_field` (spec coarsening). */
class SnapshotCommitSpec extends SparkSpec {
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

  test("concurrent committers all land: N racing appends merge, every version chains to its parent, no commit is lost") {
    val dir = Files.createTempDirectory("graft-snap-race")
    Files.createDirectories(dir.resolve(Snapshots.DirName))
    val n = 12
    // every thread appends its own file through the optimistic loop;
    // the hard-link create-if-absent makes exactly one winner per
    // version number and the losers re-derive against the refreshed
    // latest — the lost-update the pre-r12 REPLACE_EXISTING move
    // allowed cannot happen
    val threads = (0 until n).map { i =>
      new Thread(() => {
        Snapshots.commit(dir, "append", cur => cur :+ f"p=1/f$i%02d.parquet")
        ()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val latest = Snapshots.latest(dir).get
    assert(latest.files.sorted ==
      (0 until n).map(i => f"p=1/f$i%02d.parquet"),
      s"every racing append must survive, got ${latest.files.sorted}")
    assert(Snapshots.versions(dir) == (0L until n.toLong),
      "versions must be contiguous — one winner per number")
    // parent chain: each snapshot anchored to its true predecessor
    (1L until n.toLong).foreach { v =>
      assert(Snapshots.read(dir, v).get.parent.contains(v - 1L))
    }
    assert(Snapshots.read(dir, 0L).get.parent.isEmpty)
  }

  test("read-set validation: a commit whose rewrite inputs were concurrently removed conflicts instead of resurrecting rows") {
    val dir = Files.createTempDirectory("graft-snap-conflict")
    Files.createDirectories(dir.resolve(Snapshots.DirName))
    Snapshots.commit(dir, "append", _ => Seq("p=1/f1.parquet", "p=1/f2.parquet"))
    // a concurrent committer rewrites f1 away...
    Snapshots.commit(dir, "delete", cur => cur.filterNot(_ == "p=1/f1.parquet"))
    // ...so a copy-on-write commit that READ f1 must refuse to land
    val e = intercept[CommitConflictException] {
      Snapshots.commit(dir, "rewrite",
        cur => cur.filterNot(_ == "p=1/f1.parquet") :+ "p=1/f1b.parquet",
        Snapshots.validateFilesLive("UPDATE", Seq("p=1/f1.parquet")))
    }
    assert(e.getMessage.contains("concurrent commit removed"))
    // appends against the same base merge fine
    val v = Snapshots.commit(dir, "append", cur => cur :+ "p=1/f3.parquet",
      Snapshots.validateFilesLive("append", Seq.empty))
    assert(Snapshots.read(dir, v).get.files.contains("p=1/f3.parquet"))
  }

  test("END-TO-END concurrent DML: racing SQL appends and a cross-partition DELETE all land; no rows lost, no rows resurrected") {
    withLake("sc5") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (n BIGINT, region STRING)
           |PARTITIONED BY (region)
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      Seq((1L, "EU"), (2L, "EU"), (3L, "US"), (4L, "US"))
        .toDF("n", "region")
        .write.mode("append").insertInto(s"$cat.m.t")
      // race: three appends to three regions + one DELETE on EU —
      // every operation drives the REAL write path (scan, stage,
      // publish, optimistic manifest commit); the OCC loop must merge
      // them all without losing a commit. Failures surface via the
      // collected throwables.
      val errors =
        new java.util.concurrent.ConcurrentLinkedQueue[(String, Throwable)]()
      val ops: Seq[(String, () => Unit)] = Seq(
        "append-EU" -> (() => Seq((10L, "EU")).toDF("n", "region")
          .write.mode("append").insertInto(s"$cat.m.t")),
        "append-US" -> (() => Seq((11L, "US")).toDF("n", "region")
          .write.mode("append").insertInto(s"$cat.m.t")),
        "append-APAC" -> (() => Seq((12L, "APAC")).toDF("n", "region")
          .write.mode("append").insertInto(s"$cat.m.t")),
        "delete" -> (() => { spark.sql(s"DELETE FROM $cat.m.t WHERE n = 3"); () }))
      val threads = ops.map { case (name, op) => new Thread(() =>
        try op() catch { case t: Throwable => errors.add(name -> t); () }) }
      threads.foreach(_.start()); threads.foreach(_.join())
      // ONLY the DELETE may conflict (its read set can change under a
      // race); an append has no read set and must ALWAYS merge —
      // attribution matters, or a lost append masquerades as an
      // acceptable delete-conflict
      errors.forEach { case (name, t) =>
        assert(name == "delete" &&
          t.getMessage != null && t.getMessage.contains("re-run"),
          s"unexpected concurrent-DML failure from $name: $t")
      }
      val got = spark.table(s"$cat.m.t").select("n").as[Long]
        .collect().sorted.toSeq
      val deleted = errors.isEmpty // the delete landed iff no conflict
      val expect = (Seq(1L, 2L, 4L, 10L, 11L, 12L) ++
        (if (deleted) Seq.empty else Seq(3L))).sorted
      assert(got == expect, s"final rows wrong: got $got, expect $expect")
      // the manifest log is a contiguous chain (no clobbered version)
      val dir = lake.resolve("m/t.parquet")
      val vs = Snapshots.versions(dir)
      assert(vs == (0L until vs.size.toLong),
        s"versions must be contiguous, got $vs")
      (1L until vs.size.toLong).foreach(v =>
        assert(Snapshots.read(dir, v).get.parent.contains(v - 1L)))
    }
  }

  test("tags are per-file atomic: racing creates all land, a same-name race has one winner, drop + legacy sidecar still work") {
    val dir = Files.createTempDirectory("graft-tags-race")
    // racing DIFFERENT-name creates: all must survive (the legacy
    // single-JSON read-modify-write could lose some)
    val n = 8
    val threads = (0 until n).map(i =>
      new Thread(() => { Tags.create(dir, s"rel-$i", i.toLong); () }))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(Tags.read(dir) == (0 until n).map(i => s"rel-$i" -> i.toLong).toMap)
    // same-name race: exactly one winner
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val racers = (0 until 4).map(i =>
      new Thread(() => {
        if (Tags.create(dir, "stable", 100L + i)) { wins.incrementAndGet(); () }
      }))
    racers.foreach(_.start()); racers.foreach(_.join())
    assert(wins.get() == 1, s"same-name tag race must have ONE winner, got ${wins.get()}")
    // drop frees the name for re-create
    assert(Tags.drop(dir, "stable").isDefined)
    assert(Tags.create(dir, "stable", 7L) && Tags.read(dir)("stable") == 7L)
    // legacy single-file sidecar: still read, still droppable, and a
    // legacy name cannot be re-created while present
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    root.putObject("tags").put("old-tag", 3L)
    Files.writeString(dir.resolve(Tags.Sidecar), om.writeValueAsString(root))
    assert(Tags.read(dir)("old-tag") == 3L)
    assert(!Tags.create(dir, "old-tag", 9L))
    assert(Tags.drop(dir, "old-tag").contains(3L))
    assert(!Tags.read(dir).contains("old-tag"))
  }

  test("manifests record operation + files-added/removed summary for every table commit") {
    withLake("sc1") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (n BIGINT, region STRING)
           |PARTITIONED BY (region)
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      val dir = lake.resolve("m/t.parquet")
      Seq((1L, "EU"), (2L, "US")).toDF("n", "region")
        .write.mode("append").insertInto(s"$cat.m.t")
      spark.sql(s"DELETE FROM $cat.m.t WHERE n = 1")
      val ops = Snapshots.versions(dir)
        .flatMap(Snapshots.read(dir, _)).map(_.operation)
      assert(ops.head == "create" && ops.contains("append") &&
        ops.last == "delete", s"got $ops")
      val app = Snapshots.versions(dir).flatMap(Snapshots.read(dir, _))
        .find(_.operation == "append").get
      assert(app.summary("added-data-files") >= 1L &&
        app.summary("removed-data-files") == 0L &&
        app.summary("total-data-files") == app.files.size.toLong)
      val del = Snapshots.latest(dir).get
      assert(del.summary("removed-data-files") >= 1L)
      // the .snapshots METADATA table mirrors the audit surface
      val meta = spark.sql(
        s"SELECT operation, total_files FROM $cat.m.t.snapshots ORDER BY version")
        .as[(String, Long)].collect().toSeq
      assert(meta.head == (("create", 0L)) && meta.last._1 == "delete",
        s"metadata table must mirror the manifest audit: $meta")
    }
  }

  test("commit-atomic per-snapshot stats: analyze embeds stats in a manifest, DML maintains them, VERSION AS OF serves metadata-only aggregates and file-skips") {
    withLake("sc2") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (k BIGINT, region STRING)
           |PARTITIONED BY (region)
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      val dir = lake.resolve("m/t.parquet")
      // two appends with DISJOINT k ranges (each lands its own file)
      (1L to 10L).map(k => (k, "EU")).toDF("k", "region")
        .write.mode("append").insertInto(s"$cat.m.t")           // s-1
      (100L to 110L).map(k => (k, "EU")).toDF("k", "region")
        .write.mode("append").insertInto(s"$cat.m.t")           // s-2
      spark.sql(s"CALL $cat.system.analyze('m.t', 'k')")        // s-3
      val analyzed = Snapshots.latest(dir).get
      assert(analyzed.operation == "analyze" && analyzed.stats.nonEmpty,
        "analyze must commit a stats-bearing snapshot")
      // post-analyze DML keeps per-snapshot stats live: the append's
      // commit computes fresh stats for ITS files only
      (1000L to 1010L).map(k => (k, "EU")).toDF("k", "region")
        .write.mode("append").insertInto(s"$cat.m.t")           // s-4
      val afterAppend = Snapshots.latest(dir).get
      assert(afterAppend.stats.size > analyzed.stats.size,
        "an append after analyze must carry fresh stats for its files")
      // CURRENT metadata-only aggregate stays exact across the DML
      val agg = spark.sql(
        s"SELECT count(*) AS n, min(k) AS mn, max(k) AS mx FROM $cat.m.t")
      assert(agg.queryExecution.executedPlan.toString.contains("stats-agg") ||
        agg.queryExecution.executedPlan.toString.contains("LocalTableScan"),
        s"current agg must serve from stats:\n${agg.queryExecution.executedPlan}")
      assert(agg.as[(Long, Long, Long)].head() == ((32L, 1L, 1010L)))
      // VERSION AS OF aggregates serve from THAT snapshot's stats
      val hist = spark.sql(
        s"SELECT count(*) AS n, max(k) AS mx FROM $cat.m.t VERSION AS OF 3")
      assert(hist.queryExecution.executedPlan.toString.contains("stats-agg") ||
        hist.queryExecution.executedPlan.toString.contains("LocalTableScan"),
        s"history agg must serve from manifest stats:\n${hist.queryExecution.executedPlan}")
      assert(hist.as[(Long, Long)].head() == ((21L, 110L)))
      // VERSION AS OF scans file-skip on the manifest's ranges: k=5
      // can only live in the first file
      val plan = spark.sql(
          s"SELECT * FROM $cat.m.t VERSION AS OF 3 WHERE k = 5")
        .queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryFileIndex(1 paths)"),
        s"time-travel scan must skip files on manifest stats:\n$plan")
      // and a rollback carries the target snapshot's stats forward
      spark.sql(s"CALL $cat.system.rollback('m.t', 3)")
      assert(Snapshots.latest(dir).get.stats.nonEmpty)
      val rb = spark.sql(
        s"SELECT count(*) AS n, max(k) AS mx FROM $cat.m.t")
      assert(rb.as[(Long, Long)].head() == ((21L, 110L)))
    }
  }

  test("manifest stats feed the optimizer: exact rowCount for the covered files, reduced under partition pruning") {
    withLake("sc6") { (cat, _) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (k BIGINT, region STRING)
           |PARTITIONED BY (region)
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      (1L to 20L).map(k => (k, "EU")).toDF("k", "region")
        .write.mode("append").insertInto(s"$cat.m.t")
      (21L to 25L).map(k => (k, "US")).toDF("k", "region")
        .write.mode("append").insertInto(s"$cat.m.t")
      spark.sql(s"CALL $cat.system.analyze('m.t', 'k')")
      def rowCount(df: org.apache.spark.sql.DataFrame): Option[BigInt] =
        df.queryExecution.optimizedPlan.collectFirst {
          case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
            r.computeStats().rowCount
        }.flatten
      // whole-table scan: the TRUE cardinality, not a bytes estimate
      assert(rowCount(spark.table(s"$cat.m.t")).contains(BigInt(25)),
        s"expected exact rowCount 25, got ${rowCount(spark.table(s"$cat.m.t"))}")
      // partition-pruned scan: the stats must describe the COVERED
      // files (a whole-snapshot count paired with pruned bytes feeds
      // the optimizer absurd per-row sizes)
      val pruned = spark.table(s"$cat.m.t").where("region = 'US'")
      assert(rowCount(pruned).contains(BigInt(5)),
        s"pruned scan must report the covered partition's rows, got ${rowCount(pruned)}")
    }
  }

  test("CALL migrate upgrades a plain partitioned table in place: files untouched, history starts at the migration snapshot") {
    withLake("sc3") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (n BIGINT, region STRING)
           |PARTITIONED BY (region)""".stripMargin)
      Seq((1L, "EU"), (2L, "US")).toDF("n", "region")
        .write.mode("append").insertInto(s"$cat.m.t")
      Seq((3L, "EU")).toDF("n", "region")
        .write.mode("append").insertInto(s"$cat.m.t")
      val dir = lake.resolve("m/t.parquet")
      assert(!Snapshots.isVersioned(dir))
      val before = spark.table(s"$cat.m.t").as[(Long, String)]
        .collect().sortBy(_._1).toSeq
      val (v, nf) = spark.sql(s"CALL $cat.system.migrate('m.t')")
        .as[(Long, Long)].head()
      assert(v == 0L && nf >= 2L)
      assert(Snapshots.isVersioned(dir))
      assert(Snapshots.latest(dir).get.operation == "migrate")
      // same rows, same files (nothing moved or rewritten)
      assert(spark.table(s"$cat.m.t").as[(Long, String)]
        .collect().sortBy(_._1).toSeq == before)
      // versioned semantics from here: a DELETE commits s-1, and the
      // migration snapshot still time-travels to the pre-delete rows
      spark.sql(s"DELETE FROM $cat.m.t WHERE n = 1")
      assert(spark.table(s"$cat.m.t").select("n").as[Long]
        .collect().sorted.toSeq == Seq(2L, 3L))
      assert(spark.sql(s"SELECT * FROM $cat.m.t VERSION AS OF 0")
        .count() == 3L)
      // guards: re-migrating and migrating a flat store both refuse
      val e = intercept[Exception](
        spark.sql(s"CALL $cat.system.migrate('m.t')"))
      assert(e.getMessage.contains("already"))
    }
  }

  test("CALL drop_partition_field coarsens the spec: new writes stop nesting, old files read in place, compact normalizes") {
    withLake("sc4") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (n BIGINT, region STRING, day STRING)
           |PARTITIONED BY (region, day)
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      val dir = lake.resolve("m/t.parquet")
      Seq((1L, "EU", "d1"), (2L, "EU", "d2"), (3L, "US", "d1"))
        .toDF("n", "region", "day")
        .write.mode("append").insertInto(s"$cat.m.t")
      assert(Files.isDirectory(dir.resolve("region=EU/day=d1")))
      val specRow = spark.sql(
        s"CALL $cat.system.drop_partition_field('m.t', 'day')")
        .as[String].head()
      assert(specRow == "region")
      // new writes land directly under region= (day moves into bytes)
      Seq((4L, "EU", "d3")).toDF("n", "region", "day")
        .write.mode("append").insertInto(s"$cat.m.t")
      val newFiles = Snapshots.latest(dir).get.files
        .filterNot(f => f.contains("day="))
      assert(newFiles.nonEmpty, "post-drop writes must not nest day=")
      // mixed read: old files restore day from their directories, new
      // ones from bytes
      assert(spark.table(s"$cat.m.t").as[(Long, String, String)]
        .collect().sortBy(_._1).toSeq ==
        Seq((1L, "EU", "d1"), (2L, "EU", "d2"),
          (3L, "US", "d1"), (4L, "EU", "d3")))
      assert(spark.table(s"$cat.m.t").where("day = 'd1'")
        .select("n").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
      // compact migrates everything to the coarsened layout
      spark.sql(s"CALL $cat.system.compact('m.t', 1)")
      val shapes = Snapshots.latest(dir).get.files
        .map(Snapshots.shapeOf).distinct
      assert(shapes == Seq(Seq("region")),
        s"compact must normalize to the coarsened spec, got $shapes")
      assert(spark.table(s"$cat.m.t").count() == 4L)
      // replace = drop + add in one metadata op: region → day re-keys
      // the layout level; mixed shapes still read exactly
      val rspec = spark.sql(
        s"CALL $cat.system.replace_partition_field('m.t', 'region', 'day')")
        .as[String].head()
      assert(rspec == "day")
      Seq((5L, "EU", "d9")).toDF("n", "region", "day")
        .write.mode("append").insertInto(s"$cat.m.t")
      assert(Files.isDirectory(dir.resolve("day=d9")),
        "post-replace writes must nest under the new field")
      assert(spark.table(s"$cat.m.t").where("region = 'EU'").count() == 4L)
      spark.sql(
        s"CALL $cat.system.replace_partition_field('m.t', 'day', 'region')")
      // guards: last identity field and bucket fields stay undropable
      val e1 = intercept[Exception](
        spark.sql(s"CALL $cat.system.drop_partition_field('m.t', 'region')"))
      assert(e1.getMessage.contains("last partition field"))
      spark.sql(
        s"""CREATE TABLE $cat.m.b (k BIGINT, v STRING)
           |PARTITIONED BY (bucket(4, k))
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      val e2 = intercept[Exception](
        spark.sql(s"CALL $cat.system.drop_partition_field('m.b', 'k')"))
      assert(e2.getMessage.contains("bucket"))
    }
  }
}

package graft.catalog

import graft.SparkSpec
import java.nio.file.{Files, Path}

/** MERGE-ON-READ row-level deletes ([[MorDeletes]]): with
  * `graft.write.mode='merge-on-read'`, DELETE FROM on a manifest table
  * commits POSITION DELETE FILES (`_graft_deletes/delete-*.parquet`,
  * `(table-relative file path, row index)` coordinates) instead of rewriting data
  * files; reads anti-join them away through the [[MorScanRewrite]]
  * optimizer rule; `CALL compact` materializes them and restores the
  * plain fast path. The laws:
  *
  *  - a MoR delete removes rows WITHOUT touching data files (the
  *    manifest's data-file list is unchanged, byte-identical files);
  *  - time travel to the pre-delete snapshot sees the full content;
  *    AS OF the dirty snapshot applies its deletes;
  *  - appends after the delete are untouched by it (new files have
  *    new names — coordinates cannot address them);
  *  - MoR deletes compose, and a copy-on-write DELETE on a dirty
  *    table applies the pending deletes before rewriting;
  *  - aggregates over a dirty table are row-correct (metadata-only
  *    serving is gated off until compaction);
  *  - UPDATE/MERGE are loudly gated while deletes are pending;
  *  - compact materializes: same rows, zero delete files, metadata
  *    aggregates serve again. */
class MorDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def withLake(tag: String)(body: (String, Path) => Unit): Unit = {
    val lake = Files.createTempDirectory(s"graft-mor-$tag")
    Files.createDirectories(lake.resolve("m"))
    val cat = s"mor$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftLakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", lake.toString)
    try body(cat, lake)
    finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.path")
      spark.conf.unset(MorDeletes.ModeConf)
    }
  }

  private def morOn(): Unit =
    spark.conf.set(MorDeletes.ModeConf, MorDeletes.MergeOnRead)
  private def morOff(): Unit = spark.conf.unset(MorDeletes.ModeConf)

  private def mkTable(cat: String): Unit = {
    spark.sql(
      s"""CREATE TABLE $cat.m.t (n BIGINT, v STRING, region STRING)
         |PARTITIONED BY (region)
         |TBLPROPERTIES ('versioned'='true')""".stripMargin)
    Seq((1L, "a", "EU"), (2L, "b", "EU"), (3L, "c", "US"),
      (4L, "d", "US"), (5L, "e", "US"))
      .toDF("n", "v", "region").write.mode("append")
      .insertInto(s"$cat.m.t") // s-1
  }

  private def rows(cat: String): Seq[(Long, String, String)] =
    spark.table(s"$cat.m.t").as[(Long, String, String)]
      .collect().sortBy(_._1).toSeq

  test("MoR DELETE commits delete files, not data rewrites; reads apply them; time travel serves both sides") {
    withLake("a") { (cat, lake) =>
      mkTable(cat)
      val dir = lake.resolve("m/t.parquet")
      val dataBefore = Snapshots.dataFiles(Snapshots.latest(dir).get.files)
      val bytesBefore = dataBefore.map(f => Files.size(dir.resolve(f))).sorted

      morOn()
      spark.sql(s"DELETE FROM $cat.m.t WHERE n IN (2, 4)") // s-2
      morOff()

      val s2 = Snapshots.latest(dir).get
      assert(s2.version == 2L && s2.operation == "delete")
      // the DATA file list is unchanged — byte-identical files
      assert(Snapshots.dataFiles(s2.files).sorted == dataBefore.sorted)
      assert(Snapshots.dataFiles(s2.files)
        .map(f => Files.size(dir.resolve(f))).sorted == bytesBefore)
      val dels = Snapshots.deleteFiles(s2.files)
      assert(dels.nonEmpty &&
        dels.forall(_.startsWith(Snapshots.DeleteDirName + "/")))
      // audit surfaces: .files marks them 'delete'; the snapshot
      // summary counts them separately from data files
      assert(spark.sql(s"SELECT count(*) FROM $cat.m.t.files " +
        "WHERE kind = 'delete'").as[Long].head() == dels.size.toLong)
      assert(s2.summary.get("added-delete-files")
        .contains(dels.size.toLong) &&
        s2.summary.get("added-data-files").contains(0L))

      // current read: deleted rows gone
      assert(rows(cat) == Seq((1L, "a", "EU"), (3L, "c", "US"),
        (5L, "e", "US")))
      // predicate + projection on the dirty table
      assert(spark.sql(s"SELECT v FROM $cat.m.t WHERE region = 'US'")
        .as[String].collect().sorted.toSeq == Seq("c", "e"))
      // aggregates are row-correct (no metadata shortcut over-counts)
      assert(spark.sql(s"SELECT count(*) FROM $cat.m.t")
        .as[Long].head() == 3L)
      assert(spark.sql(
        s"SELECT region, count(*) AS n FROM $cat.m.t GROUP BY region")
        .as[(String, Long)].collect().sortBy(_._1).toSeq ==
        Seq(("EU", 1L), ("US", 2L)))

      // time travel: pre-delete snapshot is intact; AS OF the dirty
      // snapshot applies its deletes
      assert(spark.sql(s"SELECT count(*) FROM $cat.m.t VERSION AS OF 1")
        .as[Long].head() == 5L)
      assert(spark.sql(s"SELECT n FROM $cat.m.t VERSION AS OF 2")
        .as[Long].collect().sorted.toSeq == Seq(1L, 3L, 5L))
    }
  }

  test("appends after a MoR delete are untouched; MoR deletes compose; no-match DELETE commits nothing") {
    withLake("b") { (cat, lake) =>
      mkTable(cat)
      val dir = lake.resolve("m/t.parquet")
      morOn()
      spark.sql(s"DELETE FROM $cat.m.t WHERE n = 1") // s-2
      // append AFTER the delete — new files, coordinates cannot
      // address them even though the rows collide on every column
      Seq((1L, "a", "EU")).toDF("n", "v", "region")
        .write.mode("append").insertInto(s"$cat.m.t") // s-3
      assert(rows(cat).map(_._1) == Seq(1L, 2L, 3L, 4L, 5L))

      spark.sql(s"DELETE FROM $cat.m.t WHERE n <= 2") // s-4: composes
      assert(rows(cat).map(_._1) == Seq(3L, 4L, 5L))
      assert(Snapshots.deleteFiles(Snapshots.latest(dir).get.files).size >= 2)

      val vBefore = Snapshots.latest(dir).get.version
      spark.sql(s"DELETE FROM $cat.m.t WHERE n = 999") // no match
      assert(Snapshots.latest(dir).get.version == vBefore,
        "a DELETE matching nothing must not commit")
      morOff()
    }
  }

  test("copy-on-write DELETE on a dirty table applies pending deletes; UPDATE/MERGE gate until compact") {
    withLake("c") { (cat, lake) =>
      mkTable(cat)
      val dir = lake.resolve("m/t.parquet")
      morOn()
      spark.sql(s"DELETE FROM $cat.m.t WHERE n = 3") // MoR: s-2
      morOff()
      // CoW delete with a pending MoR delete: the rewrite must NOT
      // resurrect n=3 (US partition rewrites; its pending delete
      // entry becomes inert)
      spark.sql(s"DELETE FROM $cat.m.t WHERE n = 5") // CoW: s-3
      assert(rows(cat).map(_._1) == Seq(1L, 2L, 4L))
      // the delete file remains (entries for carried files could
      // still be live in general) but n=3 stays deleted
      assert(spark.sql(s"SELECT count(*) FROM $cat.m.t WHERE region='US'")
        .as[Long].head() == 1L)

      morOn()
      spark.sql(s"DELETE FROM $cat.m.t WHERE n = 1") // MoR again: s-4
      morOff()
      val gate = intercept[UnsupportedOperationException](
        spark.sql(s"UPDATE $cat.m.t SET v = 'x' WHERE n = 2"))
      assert(gate.getMessage.contains("merge-on-read") &&
        gate.getMessage.contains("compact"))
      assert(Snapshots.deleteFiles(Snapshots.latest(dir).get.files).nonEmpty)

      // compact materializes: same rows, zero delete files, and
      // row-level ops work again
      spark.sql(s"CALL $cat.system.compact('m.t', 1)")
      assert(Snapshots.deleteFiles(Snapshots.latest(dir).get.files).isEmpty)
      assert(rows(cat).map(_._1) == Seq(2L, 4L))
      spark.sql(s"UPDATE $cat.m.t SET v = 'x' WHERE n = 2")
      assert(rows(cat) == Seq((2L, "x", "EU"), (4L, "d", "US")))
      // the dirty snapshot is STILL readable with its deletes applied
      assert(spark.sql(s"SELECT n FROM $cat.m.t VERSION AS OF 4")
        .as[Long].collect().sorted.toSeq == Seq(2L, 4L))
    }
  }

  test("metadata-only aggregates gate while dirty and serve again after compact") {
    withLake("d") { (cat, lake) =>
      mkTable(cat)
      spark.sql(s"CALL $cat.system.analyze('m.t', 'n,v')")
      def planOf(sql: String): String =
        spark.sql(sql).queryExecution.executedPlan.toString
      val q = s"SELECT count(*) AS c, min(n) AS mn, max(n) AS mx FROM $cat.m.t"
      // a metadata-served aggregate plans as a LocalTableScan (zero
      // data files opened; VersionedPartitionedSpec pins the details)
      assert(planOf(q).contains("LocalTableScan"),
        "clean analyzed table: metadata-only LocalScan")
      morOn()
      spark.sql(s"DELETE FROM $cat.m.t WHERE n = 2")
      morOff()
      assert(!planOf(q).contains("LocalTableScan"),
        "dirty table: the metadata shortcut would over-count")
      assert(spark.sql(q).as[(Long, Long, Long)].head() == ((4L, 1L, 5L)))
      spark.sql(s"CALL $cat.system.compact('m.t', 1)")
      // compact carries no stats for files it creates unless analyzed
      spark.sql(s"CALL $cat.system.analyze('m.t', 'n,v')")
      assert(planOf(q).contains("LocalTableScan"))
      assert(spark.sql(q).as[(Long, Long, Long)].head() == ((4L, 1L, 5L)))
    }
  }

  test("the change feed emits a MoR delete as retractions (live rows per version)") {
    withLake("e") { (cat, lake) =>
      mkTable(cat)
      val dir = lake.resolve("m/t.parquet")
      morOn()
      spark.sql(s"DELETE FROM $cat.m.t WHERE region = 'EU'") // s-2
      morOff()
      val reads = new ManifestSnapshotReads(spark, dir)
      assert(reads.read(1L).get.count() == 5L)
      assert(reads.read(2L).get.select("n")
        .as[Long].collect().sorted.toSeq == Seq(3L, 4L, 5L))
      // the diff the feed derives: v2 removes exactly n=1,2
      val feed = graft.streaming.ChangeFeed.diff(
        reads.read(1L).get, reads.read(2L).get, Seq("n"))
      val dels = feed.filter("op = 'd'").select("before.n")
        .as[Long].collect().sorted.toSeq
      assert(dels == Seq(1L, 2L))
      assert(feed.filter("op != 'd'").isEmpty)
    }
  }

  test("plan pin: the dirty read applies deletes READER-LEVEL (a scan-local vector filter, zero join); past the ceiling it degrades to the broadcast ANTI-join") {
    withLake("g") { (cat, _) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (n BIGINT, v STRING, region STRING)
           |PARTITIONED BY (region)
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      (1L to 2000L).map(i =>
          (i, s"v$i", if (i % 2 == 0) "EU" else "US"))
        .toDF("n", "v", "region").write.mode("append")
        .insertInto(s"$cat.m.t")
      morOn()
      spark.sql(s"DELETE FROM $cat.m.t WHERE n >= 100 AND n <= 199")
      morOff()
      def planOf(df: org.apache.spark.sql.DataFrame): String =
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val sql = s"SELECT v FROM $cat.m.t WHERE region = 'EU' AND n > 100"

      // DEFAULT: deletion-vector form — the plan carries NO join at
      // all; the positional filter runs inside the scan's codegen
      // stage, so one churn-heavy partition can never shuffle the
      // fact side
      val qv = spark.sql(sql)
      val pv = planOf(qv)
      assert(!pv.contains("Join"), pv)
      // the static partition predicate prunes the data-side LISTING
      assert(pv.contains("PartitionFilters: [isnotnull(region"), pv)
      // the data predicate reaches the parquet reader
      assert(pv.contains("PushedFilters: [IsNotNull(n), GreaterThan(n,100)]"),
        pv)
      // column pruning: only the asked-for columns + the row coordinate
      assert(pv.contains(
        "ReadSchema: struct<n:bigint,v:string,_tmp_metadata_row_index:bigint>"),
        pv)
      // the vector filter stays inside the scan's whole-stage-codegen
      // span (no interpreted island in the hot path)
      assert(pv.contains("Filter [codegen id : 1]"), pv)
      // 950 even n in (100, 2000]; 49 of them deleted in [102, 198]
      assert(qv.count() == 901L)

      // PAST THE CEILING (forced with 0): the broadcast anti-join
      // fallback, same answer
      spark.conf.set(MorDeletes.VectorMaxConf, "0")
      try {
        val qj = spark.sql(sql)
        val pj = planOf(qj)
        assert(pj.contains("BroadcastHashJoin LeftAnti BuildRight"), pj)
        assert(pj.contains("PushedFilters: [IsNotNull(n), GreaterThan(n,100)]"),
          pj)
        assert(qj.count() == 901L)
      } finally spark.conf.unset(MorDeletes.VectorMaxConf)
    }
  }

  test("MoR deletes stage on a WAP branch and publish via fast_forward; expire GCs dropped delete files") {
    withLake("h") { (cat, lake) =>
      mkTable(cat)
      val dir = lake.resolve("m/t.parquet")
      spark.sql(s"CALL $cat.system.branch('m.t', 'staging')")
      spark.conf.set("graft.write.branch", "staging")
      morOn()
      try spark.sql(s"DELETE FROM $cat.m.t WHERE region = 'EU'")
      finally { morOff(); spark.conf.unset("graft.write.branch") }
      spark.catalog.clearCache()
      // main never saw the staged delete; the branch applies it
      assert(rows(cat).size == 5)
      assert(Snapshots.deleteFiles(Snapshots.latest(dir).get.files).isEmpty)
      assert(spark.sql(s"SELECT n FROM $cat.m.t VERSION AS OF 'staging'")
        .as[Long].collect().sorted.toSeq == Seq(3L, 4L, 5L))
      // publish: ONE atomic main commit carrying the delete files
      spark.sql(s"CALL $cat.system.fast_forward('m.t', 'staging')")
      spark.catalog.clearCache()
      assert(rows(cat).map(_._1) == Seq(3L, 4L, 5L))
      assert(Snapshots.deleteFiles(Snapshots.latest(dir).get.files).nonEmpty)

      // compact materializes, expire drops the dirty history, and the
      // GC reclaims the delete files from DISK (path-generic refs)
      val delRel = Snapshots.deleteFiles(Snapshots.latest(dir).get.files)
      spark.sql(s"CALL $cat.system.drop_branch('m.t', 'staging')")
      spark.sql(s"CALL $cat.system.compact('m.t', 1)")
      spark.sql(s"CALL $cat.system.expire_snapshots('m.t', 1)")
      assert(delRel.forall(f => Files.notExists(dir.resolve(f))),
        s"expire must GC unreferenced delete files: $delRel")
      assert(rows(cat).map(_._1) == Seq(3L, 4L, 5L))
    }
  }

  test("delete files are partition-scoped and the read prunes them with the data side") {
    withLake("j") { (cat, lake) =>
      mkTable(cat)
      val dir = lake.resolve("m/t.parquet")
      morOn()
      // one DELETE spanning both partitions → one delete file PER
      // target partition directory
      spark.sql(s"DELETE FROM $cat.m.t WHERE n = 1 OR n = 3")
      morOff()
      val dels = Snapshots.deleteFiles(Snapshots.latest(dir).get.files)
      assert(dels.size == 2, dels)
      val targets = dels.flatMap(MorDeletes.targetDirOf).map(_.toString)
      assert(targets.sorted == Seq("region=EU", "region=US"), targets)

      // a one-partition query reads ONE partition's coordinates: the
      // delete-side scan lists only the US-scoped file (pinned on the
      // anti-join form, where the delete side is a visible scan; the
      // vector path prunes through the same pruneDeleteFiles call)
      spark.conf.set(MorDeletes.VectorMaxConf, "0")
      try {
        val q = spark.sql(s"SELECT n FROM $cat.m.t WHERE region = 'US'")
        val plan = q.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        assert(plan.contains("region%3DUS"), plan)   // hive-escaped tdir
        assert(!plan.contains("region%3DEU"), plan)
        assert(q.as[Long].collect().sorted.toSeq == Seq(4L, 5L))
      } finally spark.conf.unset(MorDeletes.VectorMaxConf)
      // the (default) vector path answers identically
      assert(spark.sql(s"SELECT n FROM $cat.m.t WHERE region = 'US'")
        .as[Long].collect().sorted.toSeq == Seq(4L, 5L))
      // and the EU side still applies ITS delete
      assert(spark.sql(s"SELECT n FROM $cat.m.t WHERE region = 'EU'")
        .as[Long].collect().sorted.toSeq == Seq(2L))
      assert(rows(cat).map(_._1) == Seq(2L, 4L, 5L))
    }
  }

  test("a CoW DELETE covering every row of a dirty table leaves a readable empty table (inert delete files drop)") {
    withLake("k") { (cat, lake) =>
      mkTable(cat)
      val dir = lake.resolve("m/t.parquet")
      morOn()
      spark.sql(s"DELETE FROM $cat.m.t WHERE n = 2") // pending deletes
      morOff()
      spark.sql(s"DELETE FROM $cat.m.t WHERE n >= 0") // CoW, matches ALL
      // the manifest must not be delete-files-only: the replaced
      // partitions' scoped delete files dropped with their targets
      val s = Snapshots.latest(dir).get
      assert(Snapshots.deleteFiles(s.files).isEmpty, s.files)
      assert(spark.table(s"$cat.m.t").count() == 0L)
      assert(spark.sql(s"SELECT count(*) FROM $cat.m.t").as[Long].head() == 0L)
      // the table stays fully usable: append, compact, feed
      Seq((9L, "z", "EU")).toDF("n", "v", "region")
        .write.mode("append").insertInto(s"$cat.m.t")
      assert(rows(cat) == Seq((9L, "z", "EU")))
      spark.sql(s"CALL $cat.system.compact('m.t', 1)")
      assert(rows(cat) == Seq((9L, "z", "EU")))
      val reads = new ManifestSnapshotReads(spark, dir)
      assert(reads.read(s.version).get.count() == 0L)
    }
  }

  test("dynamic partition overwrite drops the delete files scoped to the replaced partitions") {
    withLake("m") { (cat, lake) =>
      mkTable(cat)
      val dir = lake.resolve("m/t.parquet")
      morOn()
      spark.sql(s"DELETE FROM $cat.m.t WHERE n = 3") // scoped to US
      spark.sql(s"DELETE FROM $cat.m.t WHERE n = 1") // scoped to EU
      morOff()
      assert(Snapshots.deleteFiles(Snapshots.latest(dir).get.files).size == 2)
      val prevMode = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "STATIC")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "DYNAMIC")
      try spark.sql(s"INSERT OVERWRITE $cat.m.t VALUES (10, 'x', 'US')")
      finally spark.conf.set(
        "spark.sql.sources.partitionOverwriteMode", prevMode)
      // the US-scoped delete file died with the partition it targeted;
      // the EU-scoped one survives AND still applies
      val dels = Snapshots.deleteFiles(Snapshots.latest(dir).get.files)
      assert(dels.size == 1 &&
        dels.flatMap(MorDeletes.targetDirOf).map(_.toString) == Seq("region=EU"),
        dels)
      assert(rows(cat) == Seq((2L, "b", "EU"), (10L, "x", "US")))
    }
  }

  test("MoR deletes on a BUCKET table: coordinates scope to _gbucket dirs and point lookups prune them") {
    withLake("n") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.bt (k BIGINT, v STRING)
           |PARTITIONED BY (bucket(4, k))
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      (1L to 400L).map(i => (i, s"v$i")).toDF("k", "v")
        .write.mode("append").insertInto(s"$cat.m.bt")
      val dir = lake.resolve("m/bt.parquet")
      morOn()
      spark.sql(s"DELETE FROM $cat.m.bt WHERE k <= 8")
      morOff()
      val dels = Snapshots.deleteFiles(Snapshots.latest(dir).get.files)
      assert(dels.nonEmpty)
      val targets = dels.flatMap(MorDeletes.targetDirOf).map(_.toString)
      assert(targets.nonEmpty &&
        targets.forall(_.startsWith(PartitionSpec.BucketDir + "=")), targets)
      // point lookup: the pushed k-equality prunes the delete side to
      // the key's own bucket (or none) — and answers correctly
      assert(spark.sql(s"SELECT v FROM $cat.m.bt WHERE k = 5")
        .as[String].collect().isEmpty) // deleted
      assert(spark.sql(s"SELECT v FROM $cat.m.bt WHERE k = 50")
        .as[String].head() == "v50")
      assert(spark.table(s"$cat.m.bt").count() == 392L)
      // compact restores the zero-shuffle SPJ-capable layout
      spark.sql(s"CALL $cat.system.compact('m.bt', 1)")
      assert(Snapshots.deleteFiles(Snapshots.latest(dir).get.files).isEmpty)
      assert(spark.table(s"$cat.m.bt").count() == 392L)
    }
  }

  test("vacuum collects orphan delete files (crashed MoR commit) but spares referenced ones") {
    withLake("i") { (cat, lake) =>
      mkTable(cat)
      val dir = lake.resolve("m/t.parquet")
      morOn()
      spark.sql(s"DELETE FROM $cat.m.t WHERE n = 2") // live delete file
      morOff()
      val live = Snapshots.deleteFiles(Snapshots.latest(dir).get.files)
      assert(live.nonEmpty)
      // a crashed MoR DELETE: files published, manifest never
      // committed — in the REAL layout (partition-scoped subdir) and
      // at the root (legacy/unscoped)
      val orphanScoped = dir.resolve(Snapshots.DeleteDirName)
        .resolve(MorDeletes.TargetDirCol + "=region%3DEU")
        .resolve("delete-orphaned-0.parquet")
      Files.createDirectories(orphanScoped.getParent)
      Files.write(orphanScoped, Array[Byte](1, 2, 3))
      val orphanRoot = dir.resolve(Snapshots.DeleteDirName)
        .resolve("delete-orphaned-1.parquet")
      Files.write(orphanRoot, Array[Byte](1, 2, 3))
      spark.sql(s"CALL $cat.system.vacuum('m.t', 0)")
      assert(Files.notExists(orphanScoped) && Files.notExists(orphanRoot),
        "unreferenced delete files collected from both layouts")
      assert(live.forall(f => Files.exists(dir.resolve(f))),
        "manifest-referenced delete files survive vacuum")
      assert(rows(cat).map(_._1) == Seq(1L, 3L, 4L, 5L))
    }
  }

  test("delete commits record their files' row counts; vector sizing is metadata-only") {
    withLake("r") { (cat, lake) =>
      mkTable(cat)
      val dir = lake.resolve("m/t.parquet")
      morOn()
      spark.sql(s"DELETE FROM $cat.m.t WHERE n IN (2, 4)")
      morOff()
      val s = Snapshots.latest(dir).get
      val dels = Snapshots.deleteFiles(s.files)
      val st = Snapshots.statsOf(dir, s)
      val counted = dels.map(f => st.get(Snapshots.basename(f)).flatMap(_.rows))
      assert(counted.forall(_.isDefined), counted)
      assert(counted.flatten.sum == 2L)
      // the .files audit surface reports delete-file rows too
      assert(spark.sql(
        s"SELECT sum(rows) FROM $cat.m.t.files WHERE kind = 'delete'")
        .as[Long].head() == 2L)
      // a 1-coordinate ceiling: manifest metadata alone routes the
      // read to the anti-join fallback (no vector probe job needed)
      spark.conf.set(MorDeletes.VectorMaxConf, "1")
      try {
        val q = spark.sql(s"SELECT n FROM $cat.m.t")
        val plan = q.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        assert(plan.contains("LeftAnti"), plan)
        assert(q.as[Long].collect().sorted.toSeq == Seq(1L, 3L, 5L))
      } finally spark.conf.unset(MorDeletes.VectorMaxConf)
    }
  }

  test("dirty scans inside SUBQUERY expressions rewrite too (guard traverses subquery plans)") {
    withLake("q") { (cat, _) =>
      mkTable(cat)
      morOn()
      spark.sql(s"DELETE FROM $cat.m.t WHERE n = 5")
      morOff()
      // the dirty scan appears ONLY inside a scalar subquery — the
      // rule's guard must traverse subquery plans, or this valid
      // query dies in MorGuardedScan until compaction
      assert(spark.sql("SELECT count(*) AS c FROM range(10) WHERE id < " +
        s"(SELECT avg(n) FROM $cat.m.t)").as[Long].head() == 3L,
        "avg over live rows {1,2,3,4} = 2.5 → ids 0,1,2")
      // Filter over a dirty scan whose CONDITION carries a subquery
      // (itself over the dirty table): both rewrite, neither pushes
      // the subquery beneath the anti-join
      assert(spark.sql(s"SELECT n FROM $cat.m.t WHERE n > " +
        s"(SELECT min(n) FROM $cat.m.t)")
        .as[Long].collect().sorted.toSeq == Seq(2L, 3L, 4L))
    }
  }

  test("partition-pruned MoR delete reads only candidate partitions' coordinates") {
    withLake("f") { (cat, lake) =>
      mkTable(cat)
      val dir = lake.resolve("m/t.parquet")
      morOn()
      spark.sql(s"DELETE FROM $cat.m.t WHERE region = 'EU' AND n = 2")
      morOff()
      // the delete file holds ONE coordinate, into an EU file
      val dels = Snapshots.deleteFiles(Snapshots.latest(dir).get.files)
      val coords = spark.read.schema(MorDeletes.DeleteSchema)
        .parquet(dels.map(f => dir.resolve(f).toString): _*)
        .as[(String, Long)].collect().toSeq
      assert(coords.size == 1)
      // coordinates key on the TABLE-RELATIVE path (the Iceberg key:
      // immune to identically-named files in sibling partition dirs)
      val euFiles = Snapshots.dataFiles(Snapshots.latest(dir).get.files)
        .filter(_.startsWith("region=EU")).toSet
      assert(euFiles.contains(coords.head._1), coords)
      assert(rows(cat).map(_._1) == Seq(1L, 3L, 4L, 5L))
    }
  }

  test("legacy BASENAME coordinates migrate at read time via the delete file's partition scope; scopeless legacy files refuse loudly") {
    withLake("lg") { (cat, lake) =>
      import scala.jdk.CollectionConverters._
      mkTable(cat)
      val dir = lake.resolve("m/t.parquet")
      val dataF = Snapshots.dataFiles(Snapshots.latest(dir).get.files)
      val euRel = dataF.find(_.startsWith("region=EU/")).get
      val euBase = Snapshots.basename(euRel)
      // which row is pos 0 of that file? (the legacy coordinate's target)
      val victim = spark.read
        .schema(Snapshots.physicalReadSchema(dir))
        .parquet(dir.resolve(euRel).toString)
        .select(org.apache.spark.sql.functions.col("n"),
          org.apache.spark.sql.functions.col("_metadata.row_index").as("p"))
        .where("p = 0").select("n").as[Long].head()
      // craft a PRE-r14 delete file: BASENAME-keyed coordinates (the
      // old key format), under the _gmor_tdir= scope layout the writer
      // has always used
      def craft(keyVal: String, sub: Option[String], name: String): String = {
        val tmp = Files.createTempDirectory("graft-legacy")
        Seq((keyVal, 0L)).toDF("file", "pos").coalesce(1)
          .write.mode("overwrite").parquet(tmp.toString)
        val st = Files.list(tmp)
        val part =
          try st.iterator().asScala
            .find(_.getFileName.toString.endsWith(".parquet")).get
          finally st.close()
        val destDir = sub.fold(dir.resolve(Snapshots.DeleteDirName))(d =>
          dir.resolve(Snapshots.DeleteDirName).resolve(d))
        Files.createDirectories(destDir)
        Files.move(part, destDir.resolve(name))
        sub.fold(s"${Snapshots.DeleteDirName}/$name")(d =>
          s"${Snapshots.DeleteDirName}/$d/$name")
      }
      val scopedSeg = org.apache.spark.sql.catalyst.catalog
        .ExternalCatalogUtils
        .getPartitionPathString(MorDeletes.TargetDirCol, "region=EU")
      val rel = craft(euBase, Some(scopedSeg), "delete-legacy-0.parquet")
      Snapshots.commit(dir, "delete", cur => cur :+ rel)
      spark.catalog.clearCache()
      // the read re-derives the rel-path key from the file's own scope:
      // the victim row is deleted, nothing silently resurrects
      assert(rows(cat).map(_._1) ==
        Seq(1L, 2L, 3L, 4L, 5L).filterNot(_ == victim))
      // an UNSCOPED legacy file on a table whose data files all live
      // under partition dirs is unmappable — loud refusal, never a
      // silent resurrection
      val rel2 = craft(euBase, None, "delete-legacy-1.parquet")
      Snapshots.commit(dir, "delete", cur => cur :+ rel2)
      spark.catalog.clearCache()
      val e = intercept[Throwable](rows(cat))
      def messages(t: Throwable): String =
        if (t == null) "" else t.toString + " | " + messages(t.getCause)
      assert(messages(e).contains("legacy"), messages(e))
    }
  }

  test("a vector ceiling at/above Int.MaxValue degrades to the anti-join (never a truncated vector)") {
    withLake("ic") { (cat, _) =>
      mkTable(cat)
      morOn()
      spark.sql(s"DELETE FROM $cat.m.t WHERE n IN (2, 4)")
      morOff()
      spark.conf.set(MorDeletes.VectorMaxConf, Int.MaxValue.toString)
      try {
        val q = spark.table(s"$cat.m.t")
        val plan = q.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        assert(plan.contains("Join"), plan)
        assert(q.as[(Long, String, String)].collect().map(_._1).sorted
          .toSeq == Seq(1L, 3L, 5L))
      } finally spark.conf.unset(MorDeletes.VectorMaxConf)
    }
  }
}

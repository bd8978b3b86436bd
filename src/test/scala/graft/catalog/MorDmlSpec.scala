package graft.catalog

import graft.SparkSpec
import java.nio.file.{Files, Path}

/** MERGE-ON-READ UPDATE / MERGE / non-pushable DELETE
  * ([[MorDeltaOperation]] — Spark's delta-based row-level plan over
  * the engine's position-delete coordinates). The laws:
  *
  *  - an UPDATE under `graft.write.mode='merge-on-read'` commits ONE
  *    snapshot holding (position-delete files for the matched rows) +
  *    (appended files with the rewritten rows) — pre-existing data
  *    files byte-identical, never rewritten;
  *  - partition-value-changing updates migrate rows to their new
  *    `col=value` directories;
  *  - MERGE INTO composes matched UPDATE / matched DELETE / NOT
  *    MATCHED INSERT in the same one-commit shape;
  *  - pending deletes apply to the row-level read: updating a table
  *    that already carries delete files neither resurrects deleted
  *    rows nor needs a compact first (the r13 gate is lifted);
  *  - non-pushable DELETEs (subquery conditions) take the delta path
  *    instead of gating;
  *  - time travel serves every intermediate version; compact
  *    materializes and restores the plain fast path;
  *  - the row-coordinate metadata columns (`_gmor_file`, `_gmor_pos`)
  *    are selectable on ordinary reads. */
class MorDmlSpec extends SparkSpec {
  import spark.implicits._

  private def withLake(tag: String)(body: (String, Path) => Unit): Unit = {
    val lake = Files.createTempDirectory(s"graft-mordml-$tag")
    Files.createDirectories(lake.resolve("m"))
    val cat = s"mordml$tag"
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

  test("MoR UPDATE: one commit of position-deletes + appended rows; data files untouched") {
    withLake("a") { (cat, lake) =>
      mkTable(cat)
      val dir = lake.resolve("m/t.parquet")
      val dataBefore = Snapshots.dataFiles(Snapshots.latest(dir).get.files)
      val bytesBefore = dataBefore.map(f => Files.size(dir.resolve(f))).sorted

      spark.sql(s"UPDATE $cat.m.t SET v = concat(v, '!') WHERE n IN (2, 4)")

      val s2 = Snapshots.latest(dir).get
      assert(s2.version == 2L && s2.operation == "update")
      // ONE commit: the original data files all carried, byte-identical
      val dataAfter = Snapshots.dataFiles(s2.files)
      assert(dataBefore.toSet.subsetOf(dataAfter.toSet))
      assert(dataBefore.map(f => Files.size(dir.resolve(f))).sorted
        == bytesBefore)
      // plus delete files for the matched rows and appended rewrites
      val dels = Snapshots.deleteFiles(s2.files)
      assert(dels.nonEmpty, s2.files)
      assert(dataAfter.size > dataBefore.size)
      assert(rows(cat) == Seq((1L, "a", "EU"), (2L, "b!", "EU"),
        (3L, "c", "US"), (4L, "d!", "US"), (5L, "e", "US")))
      // time travel: the pre-update snapshot is intact
      assert(spark.sql(s"SELECT v FROM $cat.m.t VERSION AS OF 1 WHERE n = 2")
        .as[String].head() == "b")
      // coordinates landed partition-scoped (EU and US targets)
      val targets = dels.flatMap(MorDeletes.targetDirOf).map(_.toString)
      assert(targets.toSet == Set("region=EU", "region=US"), targets)
    }
  }

  test("partition-value-changing UPDATE migrates rows to their new directory") {
    withLake("b") { (cat, lake) =>
      mkTable(cat)
      val dir = lake.resolve("m/t.parquet")
      spark.sql(s"UPDATE $cat.m.t SET region = 'EU' WHERE n = 5")
      assert(rows(cat) == Seq((1L, "a", "EU"), (2L, "b", "EU"),
        (3L, "c", "US"), (4L, "d", "US"), (5L, "e", "EU")))
      val s2 = Snapshots.latest(dir).get
      // the rewritten row landed under its NEW partition dir
      val newFiles = Snapshots.dataFiles(s2.files)
        .diff(Snapshots.dataFiles(Snapshots.read(dir, 1L).get.files))
      assert(newFiles.nonEmpty && newFiles.forall(_.startsWith("region=EU")),
        newFiles)
      assert(spark.sql(
        s"SELECT count(*) FROM $cat.m.t WHERE region = 'EU'")
        .as[Long].head() == 3L)
    }
  }

  test("MERGE INTO: matched update + matched delete + not-matched insert in one commit") {
    withLake("c") { (cat, lake) =>
      mkTable(cat)
      val dir = lake.resolve("m/t.parquet")
      Seq((2L, "B", "EU"), (4L, "D", "US"), (9L, "z", "EU"))
        .toDF("n", "v", "region").createOrReplaceTempView("src")
      spark.sql(
        s"""MERGE INTO $cat.m.t t USING src s ON t.n = s.n
           |WHEN MATCHED AND s.n = 4 THEN DELETE
           |WHEN MATCHED THEN UPDATE SET v = s.v
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val s2 = Snapshots.latest(dir).get
      assert(s2.version == 2L && s2.operation == "merge")
      assert(Snapshots.deleteFiles(s2.files).nonEmpty)
      assert(rows(cat) == Seq((1L, "a", "EU"), (2L, "B", "EU"),
        (3L, "c", "US"), (5L, "e", "US"), (9L, "z", "EU")))
      // and the pre-merge snapshot still reads clean
      assert(spark.sql(s"SELECT count(*) FROM $cat.m.t VERSION AS OF 1")
        .as[Long].head() == 5L)
    }
  }

  test("UPDATE on a delete-carrying table applies pending deletes (gate lifted, no resurrection)") {
    withLake("d") { (cat, lake) =>
      mkTable(cat)
      val dir = lake.resolve("m/t.parquet")
      spark.sql(s"DELETE FROM $cat.m.t WHERE n = 3") // MoR delete: s-2
      assert(Snapshots.deleteFiles(Snapshots.latest(dir).get.files).nonEmpty)
      // the r13 gate would have thrown here; the delta path must
      // update the LIVE rows only — n=3 is deleted and stays deleted
      spark.sql(s"UPDATE $cat.m.t SET v = 'u' WHERE region = 'US'")
      assert(rows(cat) == Seq((1L, "a", "EU"), (2L, "b", "EU"),
        (4L, "u", "US"), (5L, "u", "US")))
      // compact materializes everything and the table reads the same
      spark.sql(s"CALL $cat.system.compact('m.t', 1)")
      assert(Snapshots.deleteFiles(Snapshots.latest(dir).get.files).isEmpty)
      assert(rows(cat) == Seq((1L, "a", "EU"), (2L, "b", "EU"),
        (4L, "u", "US"), (5L, "u", "US")))
    }
  }

  test("non-pushable DELETE (subquery condition) takes the delta path under merge-on-read") {
    withLake("e") { (cat, lake) =>
      mkTable(cat)
      val dir = lake.resolve("m/t.parquet")
      spark.sql(s"DELETE FROM $cat.m.t WHERE n > " +
        s"(SELECT avg(n) FROM $cat.m.t)") // avg=3 → deletes 4,5
      assert(rows(cat).map(_._1) == Seq(1L, 2L, 3L))
      val s2 = Snapshots.latest(dir).get
      // data files were NOT rewritten: the delete is coordinates-only
      assert(Snapshots.deleteFiles(s2.files).nonEmpty)
      assert(Snapshots.dataFiles(s2.files).toSet ==
        Snapshots.dataFiles(Snapshots.read(dir, 1L).get.files).toSet)
    }
  }

  test("row-coordinate metadata columns are selectable on ordinary reads") {
    withLake("f") { (cat, lake) =>
      mkTable(cat)
      val coords = spark.sql(
        s"SELECT _gmor_file, _gmor_pos, n FROM $cat.m.t WHERE region = 'EU'")
        .as[(String, Long, Long)].collect().sortBy(_._3).toSeq
      assert(coords.map(_._3) == Seq(1L, 2L))
      assert(coords.forall(_._1.startsWith("region=EU/")), coords)
      assert(coords.map(_._2).toSet == Set(0L, 1L))
      // the coordinates a delta DML would key by agree with the
      // manifest's file list
      val dataFiles = Snapshots.dataFiles(
        Snapshots.latest(lake.resolve("m/t.parquet")).get.files).toSet
      assert(coords.forall(c => dataFiles(c._1)), coords)
    }
  }

  test("UPDATE matching nothing commits nothing") {
    withLake("h") { (cat, lake) =>
      mkTable(cat)
      val dir = lake.resolve("m/t.parquet")
      spark.sql(s"UPDATE $cat.m.t SET v = 'x' WHERE n = 999")
      assert(Snapshots.latest(dir).get.version == 1L,
        "no-match UPDATE must not commit")
      assert(rows(cat).map(_._2) == Seq("a", "b", "c", "d", "e"))
    }
  }

  test("MoR UPDATE on a BUCKET table keeps the hidden layout; compact restores SPJ") {
    withLake("i") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.bt (k BIGINT, v STRING)
           |PARTITIONED BY (bucket(4, k))
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v")
        .write.mode("append").insertInto(s"$cat.m.bt")
      val dir = lake.resolve("m/bt.parquet")
      spark.sql(s"UPDATE $cat.m.bt SET v = 'upd' WHERE k <= 10")
      assert(spark.sql(s"SELECT count(*) FROM $cat.m.bt WHERE v = 'upd'")
        .as[Long].head() == 10L)
      assert(spark.table(s"$cat.m.bt").count() == 100L)
      // the rewritten rows landed under _gbucket dirs (hidden layout
      // preserved — the writer re-derives the bucket id)
      val newFiles = Snapshots.dataFiles(Snapshots.latest(dir).get.files)
        .diff(Snapshots.dataFiles(Snapshots.read(dir, 1L).get.files))
      assert(newFiles.nonEmpty && newFiles.forall(
        _.startsWith(PartitionSpec.BucketDir + "=")), newFiles)
      // point lookup stays correct against coordinates + new files
      assert(spark.sql(s"SELECT v FROM $cat.m.bt WHERE k = 5")
        .as[String].head() == "upd")
      assert(spark.sql(s"SELECT v FROM $cat.m.bt WHERE k = 50")
        .as[String].head() == "v50")
      spark.sql(s"CALL $cat.system.compact('m.bt', 1)")
      assert(Snapshots.deleteFiles(Snapshots.latest(dir).get.files).isEmpty)
      assert(spark.table(s"$cat.m.bt").count() == 100L)
    }
  }

  test("MoR UPDATE stages on a WAP branch; fast_forward publishes delete files + rewrites atomically") {
    withLake("j") { (cat, lake) =>
      mkTable(cat)
      val dir = lake.resolve("m/t.parquet")
      spark.sql(s"CALL $cat.system.branch('m.t', 'staging')")
      spark.conf.set("graft.write.branch", "staging")
      try spark.sql(s"UPDATE $cat.m.t SET v = 'staged' WHERE n = 1")
      finally spark.conf.unset("graft.write.branch")
      spark.catalog.clearCache()
      // main never saw the staged update
      assert(rows(cat).map(_._2) == Seq("a", "b", "c", "d", "e"))
      assert(Snapshots.deleteFiles(Snapshots.latest(dir).get.files).isEmpty)
      assert(spark.sql(
        s"SELECT v FROM $cat.m.t VERSION AS OF 'staging' WHERE n = 1")
        .as[String].head() == "staged")
      spark.sql(s"CALL $cat.system.fast_forward('m.t', 'staging')")
      spark.catalog.clearCache()
      assert(rows(cat).find(_._1 == 1L).map(_._2).contains("staged"))
      assert(Snapshots.deleteFiles(Snapshots.latest(dir).get.files).nonEmpty)
    }
  }

  test("a concurrent rewrite of a coordinate-addressed file conflicts the UPDATE (never resurrects)") {
    withLake("k") { (cat, lake) =>
      mkTable(cat)
      val dir = lake.resolve("m/t.parquet")
      val base = Snapshots.latest(dir).get
      // simulate: the UPDATE planned against s-1, then a compact
      // rewrote the table underneath before the UPDATE's commit —
      // replay the exact validator the commit runs
      spark.sql(s"CALL $cat.system.compact('m.t', 1)")
      val cur = Snapshots.latest(dir).get.files
      val referenced = Snapshots.dataFiles(base.files).take(1)
      intercept[CommitConflictException](
        Snapshots.validateRewrite("UPDATE", referenced, base.files)(cur))
      // and a delete file committed since the base conflicts too
      val cur2 = cur :+ s"${Snapshots.DeleteDirName}/delete-x-0.parquet"
      intercept[CommitConflictException](
        Snapshots.validateRewrite("UPDATE",
          Snapshots.dataFiles(cur), cur)(cur2))
    }
  }

  test("coordinates stay filesystem-true for partition values with URI-special characters") {
    withLake("l") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.sp (n BIGINT, v STRING, pri STRING)
           |PARTITIONED BY (pri)
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      Seq((1L, "a", "4-NOT SPECIFIED"), (2L, "b", "4-NOT SPECIFIED"),
        (3L, "c", "1-URGENT"))
        .toDF("n", "v", "pri").write.mode("append").insertInto(s"$cat.m.sp")
      val dir = lake.resolve("m/sp.parquet")
      // _metadata.file_path percent-encodes the space; the coordinate
      // key must decode back to the manifest's filesystem-relative
      // path or deletes/updates against such partitions break
      spark.sql(s"DELETE FROM $cat.m.sp WHERE n = 1")
      spark.sql(s"UPDATE $cat.m.sp SET v = 'x' WHERE n = 2")
      assert(spark.table(s"$cat.m.sp").as[(Long, String, String)]
        .collect().sortBy(_._1).toSeq ==
        Seq((2L, "x", "4-NOT SPECIFIED"), (3L, "c", "1-URGENT")))
      val dataFiles = Snapshots.dataFiles(Snapshots.latest(dir).get.files).toSet
      val dels = Snapshots.deleteFiles(Snapshots.latest(dir).get.files)
      val coords = spark.read.schema(MorDeletes.DeleteSchema)
        .parquet(dels.map(f => dir.resolve(f).toString): _*)
        .as[(String, Long)].collect().toSeq
      assert(coords.nonEmpty &&
        coords.forall(c => c._1.startsWith("pri=4-NOT SPECIFIED/")), coords)
      // every coordinate addresses a manifest-listed file verbatim
      val allData = (1L to Snapshots.latest(dir).get.version)
        .flatMap(v => Snapshots.read(dir, v).map(s =>
          Snapshots.dataFiles(s.files))).flatten.toSet
      assert(coords.forall(c => allData(c._1)), coords)
      assert(dataFiles.nonEmpty)
    }
  }

  test("racing MoR UPDATEs: both land, or the loser conflicts LOUDLY and a retry lands — never silent loss") {
    withLake("m") { (cat, lake) =>
      mkTable(cat)
      val dir = lake.resolve("m/t.parquet")
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val gate = new java.util.concurrent.CountDownLatch(1)
      def upd(r: String, mark: String): Thread = new Thread(() => {
        gate.await()
        try spark.sql(
          s"UPDATE $cat.m.t SET v = '$mark' WHERE region = '$r'")
        catch { case t: Throwable => errs.add(t); () }
      })
      val ts = Seq(upd("EU", "eu!"), upd("US", "us!"))
      ts.foreach(_.start()); gate.countDown(); ts.foreach(_.join())
      // snapshot isolation: a concurrent delete-file commit conflicts
      // the later writer — allowed outcomes are BOTH landed (the race
      // never materialized) or exactly one loud conflict; a retry of
      // the failed side must land. What is NEVER allowed: silent loss.
      assert(errs.size() <= 1, errs)
      if (!errs.isEmpty) {
        val msg = errs.peek().getMessage
        assert(msg != null && (msg.contains("concurrent") ||
          msg.contains("conflict") || msg.contains("delete file")), msg)
        // retry whichever predicate did not stick
        val cur = rows(cat).map(t => t._1 -> t._2).toMap
        if (cur(1L) != "eu!")
          spark.sql(s"UPDATE $cat.m.t SET v = 'eu!' WHERE region = 'EU'")
        if (cur(3L) != "us!")
          spark.sql(s"UPDATE $cat.m.t SET v = 'us!' WHERE region = 'US'")
      }
      assert(rows(cat) == Seq((1L, "eu!", "EU"), (2L, "eu!", "EU"),
        (3L, "us!", "US"), (4L, "us!", "US"), (5L, "us!", "US")))
      // no duplicate manifest entries / no row loss across the race
      val files = Snapshots.latest(dir).get.files
      assert(files.distinct.size == files.size)
    }
  }

  test("streaming MERGE sink under merge-on-read: position-delta commits per batch, content identical") {
    withLake("n") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.pk (id BIGINT, v STRING, grp STRING)
           |PARTITIONED BY (grp)
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      Seq((1L, "a", "g1"), (2L, "b", "g1"), (3L, "c", "g2"))
        .toDF("id", "v", "grp").write.mode("append")
        .insertInto(s"$cat.m.pk")
      val dir = lake.resolve("m/pk.parquet")
      val dataBefore = Snapshots.dataFiles(Snapshots.latest(dir).get.files)
      // one changelog micro-batch: update id=2, delete id=3, insert 4
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val mem = MemoryStream[(String, Long, String, String)]
      val changelog = mem.toDF().toDF("op", "ts_ms", "before", "after")
        .selectExpr("op", "ts_ms", "before", "after")
      val schema = spark.table(s"$cat.m.pk").schema
      val ckpt = Files.createTempDirectory("graft-mor-sink").toString
      mem.addData(
        ("u", 10L, """{"id":2}""", """{"id":2,"v":"B","grp":"g1"}"""),
        ("d", 11L, """{"id":3,"v":"c","grp":"g2"}""", null),
        ("c", 12L, null, """{"id":4,"v":"d","grp":"g2"}"""))
      val q = graft.streaming.SqlMergeSink.start(spark, changelog, schema,
        Seq("id"), s"$cat.m.pk", ckpt,
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination()
      spark.catalog.clearCache()
      assert(spark.table(s"$cat.m.pk").as[(Long, String, String)]
        .collect().sortBy(_._1).toSeq ==
        Seq((1L, "a", "g1"), (2L, "B", "g1"), (4L, "d", "g2")))
      // the batch's MERGE landed as a position delta: the original
      // data files are all still manifest members, deletes ride
      // coordinate files
      val s2 = Snapshots.latest(dir).get
      assert(dataBefore.toSet.subsetOf(
        Snapshots.dataFiles(s2.files).toSet), s2.files)
      assert(Snapshots.deleteFiles(s2.files).nonEmpty, s2.files)
    }
  }

  test("MERGE cardinality violation (one target row, two source matches) fails loudly") {
    withLake("g") { (cat, _) =>
      mkTable(cat)
      Seq((2L, "x", "EU"), (2L, "y", "EU"))
        .toDF("n", "v", "region").createOrReplaceTempView("dupsrc")
      val e = intercept[Exception](spark.sql(
        s"""MERGE INTO $cat.m.t t USING dupsrc s ON t.n = s.n
           |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin))
      assert(e.getMessage.toLowerCase.contains("merge") ||
        e.getMessage.toLowerCase.contains("cardinality"), e.getMessage)
      // and nothing committed
      assert(rows(cat).map(_._2) == Seq("a", "b", "c", "d", "e"))
    }
  }
}

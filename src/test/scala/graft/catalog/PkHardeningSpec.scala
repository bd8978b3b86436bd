package graft.catalog

import graft.SparkSpec
import java.nio.file.{Files, Path}

/** PRIMARY-KEY table hardening: concurrency, WAP staging, GC, and the
  * streaming-upsert composition.
  *
  *  - a delete-carrying MERGE racing a concurrent blind append either
  *    CONFLICTS LOUDLY or both land in some serial order — never a
  *    silent lost update;
  *  - PK writes stage on a WAP branch (appends AND equality deletes),
  *    main stays isolated until fast_forward;
  *  - compact + expire garbage-collect equality-delete files exactly
  *    when no retained manifest references them; vacuum collects
  *    orphaned (never-committed) ones;
  *  - `db.t.files` labels equality deletes and stamps their birth seq;
  *  - a streamed append (foreachBatch upsert ingest) into a PK table
  *    resolves latest-per-key like any other blind append. */
class PkHardeningSpec extends SparkSpec {
  import spark.implicits._

  private def withLake(tag: String)(body: (String, Path) => Unit): Unit = {
    val lake = Files.createTempDirectory(s"graft-pkh-$tag")
    Files.createDirectories(lake.resolve("m"))
    val cat = s"pkh$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftLakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", lake.toString)
    try body(cat, lake)
    finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.path")
      spark.conf.unset("graft.write.branch")
    }
  }

  private def mkTable(cat: String): Unit =
    spark.sql(
      s"""CREATE TABLE $cat.m.t (k BIGINT NOT NULL, v STRING, amt BIGINT)
         |PARTITIONED BY (bucket(4, k))
         |TBLPROPERTIES ('versioned'='true', 'primary-key'='k')""".stripMargin)

  private def rows(cat: String): Seq[(Long, String, Long)] =
    spark.table(s"$cat.m.t").as[(Long, String, Long)]
      .collect().sortBy(_._1).toSeq

  test("a delete-carrying MERGE racing a blind append conflicts loudly or both land — never a silent lost update") {
    withLake("r") { (cat, _) =>
      mkTable(cat)
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
        .toDF("k", "v", "amt").write.mode("append").insertInto(s"$cat.m.t")
      Seq((2L, 0L)).toDF("mk", "x").createOrReplaceTempView("pkh_src")
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      try {
        val merge = scala.concurrent.Future {
          spark.sql(
            s"""MERGE INTO $cat.m.t t USING pkh_src s ON t.k = s.mk
               |WHEN MATCHED THEN DELETE""".stripMargin)
        }
        val append = scala.concurrent.Future {
          Seq((99L, "new", 99L)).toDF("k", "v", "amt")
            .write.mode("append").insertInto(s"$cat.m.t")
        }
        scala.concurrent.Await.ready(append,
          scala.concurrent.duration.Duration(120, "s"))
        val mergeOutcome = scala.concurrent.Await.ready(merge,
          scala.concurrent.duration.Duration(120, "s")).value.get
        spark.catalog.clearCache()
        val got = rows(cat)
        mergeOutcome match {
          case scala.util.Success(_) =>
            // both landed (merge validated against a base that already
            // included — or never saw a change to — the append)
            assert(got == Seq((1L, "a", 10L), (3L, "c", 30L),
              (99L, "new", 99L)), got)
          case scala.util.Failure(e) =>
            def chain(t: Throwable): Seq[Throwable] =
              if (t == null) Seq.empty else t +: chain(t.getCause)
            assert(chain(e).exists(c =>
              c.isInstanceOf[CommitConflictException] ||
                Option(c.getMessage).exists(_.contains("concurrent"))),
              s"not a loud conflict: $e")
            assert(got == Seq((1L, "a", 10L), (2L, "b", 20L),
              (3L, "c", 30L), (99L, "new", 99L)),
              s"conflicted merge must leave the table un-merged: $got")
        }
      } finally pool.shutdown()
    }
  }

  test("PK writes stage on a WAP branch (appends AND equality deletes); fast_forward publishes the resolved state") {
    withLake("w") { (cat, lake) =>
      mkTable(cat)
      val dir = lake.resolve("m/t.parquet")
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "v", "amt")
        .write.mode("append").insertInto(s"$cat.m.t")
      spark.sql(s"CALL $cat.system.branch('m.t', 'staging')")
      spark.conf.set("graft.write.branch", "staging")
      try {
        Seq((1L, "a2", 11L)).toDF("k", "v", "amt")
          .write.mode("append").insertInto(s"$cat.m.t") // staged upsert
        spark.sql(s"DELETE FROM $cat.m.t WHERE k = 2")  // staged eq-delete
      } finally spark.conf.unset("graft.write.branch")
      spark.catalog.clearCache()
      // main never saw the staged writes
      assert(rows(cat) == Seq((1L, "a", 10L), (2L, "b", 20L)))
      assert(PkTables.eqDeleteFiles(Snapshots.latest(dir).get.files).isEmpty)
      // the staged branch read resolves the upsert AND the delete
      assert(spark.sql(
        s"SELECT k, v, amt FROM $cat.m.t VERSION AS OF 'staging'")
        .as[(Long, String, Long)].collect().sortBy(_._1).toSeq ==
        Seq((1L, "a2", 11L)))
      spark.sql(s"CALL $cat.system.fast_forward('m.t', 'staging')")
      spark.catalog.clearCache()
      assert(rows(cat) == Seq((1L, "a2", 11L)))
    }
  }

  test("compact + expire GC equality-delete files; .files labels them with their birth seq; vacuum collects orphans") {
    withLake("g") { (cat, lake) =>
      mkTable(cat)
      val dir = lake.resolve("m/t.parquet")
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "v", "amt")
        .write.mode("append").insertInto(s"$cat.m.t") // seq 1
      spark.sql(s"DELETE FROM $cat.m.t WHERE k = 1")  // seq 2 (eq file)
      val eqRel = PkTables.eqDeleteFiles(Snapshots.latest(dir).get.files).head
      // metadata table: the eq file is a labeled snapshot member with
      // its birth sequence
      val fr = spark.table(s"$cat.m.t.files")
        .select("file", "kind", "committed_seq")
        .as[(String, String, Option[Long])].collect()
        .find(_._1 == eqRel).get
      assert(fr._2 == "eqdelete" && fr._3.contains(2L), fr)
      // compact materializes; the eq file stays on disk for time
      // travel until expire drops the manifests that reference it
      spark.sql(s"CALL $cat.system.compact('m.t', 1)")
      assert(Files.exists(dir.resolve(eqRel)))
      spark.sql(s"CALL $cat.system.expire_snapshots('m.t', 1)")
      assert(!Files.exists(dir.resolve(eqRel)),
        "expire GCs the unreferenced equality-delete file")
      assert(rows(cat) == Seq((2L, "b", 20L)))
      // vacuum: an orphaned (never-committed) eq file dies too
      val stray = dir.resolve(PkTables.EqDeleteDirName)
        .resolve("eqdelete-orphan.parquet")
      Files.createDirectories(stray.getParent)
      Files.writeString(stray, "not really parquet")
      spark.sql(s"CALL $cat.system.vacuum('m.t', 0)")
      assert(!Files.exists(stray), "vacuum collects orphaned eq files")
      assert(rows(cat) == Seq((2L, "b", 20L)))
    }
  }

  test("a streamed foreachBatch upsert ingest into a PK table resolves latest-per-key") {
    withLake("s") { (cat, _) =>
      mkTable(cat)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext =
        spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
      val mem = MemoryStream[(Long, String, Long)]
      val q = mem.toDF().toDF("k", "v", "amt")
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          // the PK-table CDC sink IS a blind append — no merge job
          batch.write.mode("append").insertInto(s"$cat.m.t")
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      mem.addData((1L, "a", 1L), (2L, "b", 2L))
      q.processAllAvailable(); q.stop()
      val q2 = mem.toDF().toDF("k", "v", "amt")
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.write.mode("append").insertInto(s"$cat.m.t")
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      mem.addData((1L, "a2", 11L), (3L, "c", 3L))
      q2.processAllAvailable(); q2.stop()
      assert(rows(cat) == Seq((1L, "a2", 11L), (2L, "b", 2L),
        (3L, "c", 3L)))
    }
  }

  test("the graft-changefeed STREAMING source over a PK table emits the resolved per-version changelog") {
    withLake("st") { (cat, lake) =>
      mkTable(cat)
      val dir = lake.resolve("m/t.parquet")
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "v", "amt")
        .write.mode("append").insertInto(s"$cat.m.t")  // v1
      Seq((1L, "a2", 11L)).toDF("k", "v", "amt")
        .write.mode("append").insertInto(s"$cat.m.t")  // v2 (shadows 1)
      spark.sql(s"DELETE FROM $cat.m.t WHERE k = 2")   // v3 (eq delete)
      val out = spark.readStream
        .format("org.apache.spark.sql.graft.ChangeFeedSourceProvider")
        .option("path", dir.toString).option("keys", "k")
        .load()
        .selectExpr("op", "version", "before.k AS bk", "after.k AS ak",
          "after.v AS av")
      val q = out.writeStream.format("memory").queryName("pk_feed")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.processAllAvailable(); q.stop()
      val got = spark.table("pk_feed")
        .as[(String, Long, Option[Long], Option[Long], Option[String])]
        .collect().sortBy(r => (r._2, r._4.orElse(r._3))).toSeq
      assert(got == Seq(
        ("c", 1L, None, Some(1L), Some("a")),
        ("c", 1L, None, Some(2L), Some("b")),
        ("u", 2L, Some(1L), Some(1L), Some("a2")),
        ("d", 3L, Some(2L), None, None)), got)
    }
  }

  test("rewrite_eqdelete_files merges key files per bucket keeping per-key MAX thresholds — revives preserved, content-neutral, idempotent") {
    withLake("eqc") { (cat, lake) =>
      mkTable(cat)
      val dir = lake.resolve("m/t.parquet")
      (1L to 20L).map(i => (i, s"v$i", i * 10L)).toDF("k", "v", "amt")
        .write.mode("append").insertInto(s"$cat.m.t")   // seq 1
      spark.sql(s"DELETE FROM $cat.m.t WHERE k % 2 = 0") // seq 2
      Seq((4L, "revived", 444L)).toDF("k", "v", "amt")
        .write.mode("append").insertInto(s"$cat.m.t")   // seq 3 revive
      spark.sql(s"DELETE FROM $cat.m.t WHERE k % 3 = 0") // seq 4
      val pre = rows(cat)
      assert(pre.exists(_ == ((4L, "revived", 444L))), pre)
      val eqBefore = PkTables.eqDeleteFiles(Snapshots.latest(dir).get.files)
      assert(eqBefore.groupBy(MorDeletes.targetDirOf)
        .exists(_._2.size >= 2), "some bucket holds >= 2 eq files")
      val out = spark.sql(
        s"CALL $cat.system.rewrite_eqdelete_files('m.t')")
        .as[(Long, Long, Long)].head()
      assert(out._1 >= 2L && out._2 >= 1L && out._2 < out._1, out)
      spark.catalog.clearCache()
      // content-neutral — including the revive (the merged threshold
      // for key 4 is its ORIGINAL delete sequence, not the merged
      // file's birth sequence, which would wrongly kill the revive)
      assert(rows(cat) == pre)
      val eqAfter = PkTables.eqDeleteFiles(Snapshots.latest(dir).get.files)
      assert(eqAfter.groupBy(MorDeletes.targetDirOf)
        .forall(_._2.size == 1), eqAfter)
      // idempotent: one file per bucket left, nothing to merge
      assert(spark.sql(
        s"CALL $cat.system.rewrite_eqdelete_files('m.t')")
        .as[(Long, Long, Long)].head()._1 == 0L)
      // a later key-aware compact still materializes everything
      spark.sql(s"CALL $cat.system.compact('m.t', 1)")
      spark.catalog.clearCache()
      assert(rows(cat) == pre)
      assert(PkTables.eqDeleteFiles(
        Snapshots.latest(dir).get.files).isEmpty)
      // non-PK tables reject loudly
      spark.sql(
        s"""CREATE TABLE $cat.m.plain2 (k BIGINT, v STRING)
           |PARTITIONED BY (bucket(2, k))
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      val e = intercept[Exception](spark.sql(
        s"CALL $cat.system.rewrite_eqdelete_files('m.plain2')"))
      assert(e.getMessage.contains("PRIMARY-KEY"), e.getMessage)
    }
  }

  test("readPkTableChanges emits the RESOLVED keyed diff (c/u/d) between two snapshots; identical keys drop") {
    withLake("c") { (cat, _) =>
      mkTable(cat)
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
        .toDF("k", "v", "amt").write.mode("append").insertInto(s"$cat.m.t") // v1
      Seq((2L, "b2", 21L)).toDF("k", "v", "amt")
        .write.mode("append").insertInto(s"$cat.m.t")                       // v2
      spark.sql(s"DELETE FROM $cat.m.t WHERE k = 3")                        // v3
      Seq((4L, "d", 40L)).toDF("k", "v", "amt")
        .write.mode("append").insertInto(s"$cat.m.t")                       // v4
      val ch = Catalog.readPkTableChanges(spark, s"$cat.m.t", 1L, 4L)
        .selectExpr("op", "before.k AS bk", "before.v AS bv",
          "after.k AS ak", "after.v AS av")
        .as[(String, Option[Long], Option[String], Option[Long], Option[String])]
        .collect().sortBy(r => (r._1, r._2.orElse(r._4))).toSeq
      assert(ch == Seq(
        ("c", None, None, Some(4L), Some("d")),
        ("d", Some(3L), Some("c"), None, None),
        ("u", Some(2L), Some("b"), Some(2L), Some("b2"))), ch)
      // same version: empty; untouched key 1 never appears
      assert(Catalog.readPkTableChanges(spark, s"$cat.m.t", 4L, 4L)
        .count() == 0L)
      // non-PK tables route to the file-level feed
      spark.sql(
        s"""CREATE TABLE $cat.m.plain (k BIGINT, v STRING)
           |PARTITIONED BY (bucket(2, k))
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      val e = intercept[IllegalArgumentException](
        Catalog.readPkTableChanges(spark, s"$cat.m.plain", 0L, 0L))
      assert(e.getMessage.contains("not a PRIMARY-KEY"), e.getMessage)
    }
  }
}

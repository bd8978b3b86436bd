package graft.catalog

import graft.SparkSpec
import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions.col

/** r13 writable branches (Iceberg refs) + write-audit-publish:
  * `CALL branch` forks the snapshot chain by segment reference,
  * `SET 'graft.write.branch'` routes the session's writes and current
  * reads to the branch, `VERSION AS OF '<branch>'` audits it without
  * the conf, `CALL fast_forward` publishes atomically through the OCC
  * commit (conflicting main commits detected), and main-side expire
  * GC treats branch-staged files as live. */
class BranchWapSpec extends SparkSpec {
  import spark.implicits._

  private def withLake(tag: String)(body: (String, Path) => Unit): Unit = {
    val lake = Files.createTempDirectory(s"graft-lake-$tag")
    Files.createDirectories(lake.resolve("m"))
    val cat = s"lk$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftLakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", lake.toString)
    try body(cat, lake)
    finally {
      spark.conf.unset(Snapshots.BranchConf)
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.path")
    }
  }

  private def rows(cat: String): Seq[Long] = {
    spark.catalog.clearCache()
    spark.table(s"$cat.m.t").select("n").as[Long].collect().sorted.toSeq
  }

  test("WAP loop: stage on a branch (writes+reads), audit via VERSION AS OF, fast-forward publishes; branch writes never touch main") {
    withLake("wap1") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (n BIGINT, region STRING)
           |PARTITIONED BY (region)
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      val dir = lake.resolve("m/t.parquet")
      Seq((1L, "EU")).toDF("n", "region")
        .write.mode("append").insertInto(s"$cat.m.t")            // s-1
      val fork = spark.sql(s"CALL $cat.system.branch('m.t', 'audit')")
        .as[Long].head()
      assert(fork == 1L)

      // STAGE: the session conf routes writes AND current reads
      spark.conf.set(Snapshots.BranchConf, "audit")
      Seq((2L, "EU"), (3L, "US")).toDF("n", "region")
        .write.mode("append").insertInto(s"$cat.m.t")            // b-1
      spark.sql(s"DELETE FROM $cat.m.t WHERE n = 3")             // b-2
      assert(rows(cat) == Seq(1L, 2L), "WAP session reads the branch")
      // main untouched (conf off)
      spark.conf.unset(Snapshots.BranchConf)
      assert(rows(cat) == Seq(1L), "main must not see staged writes")
      assert(Snapshots.versions(dir) == Seq(0L, 1L),
        "no main commit may land while staging")

      // AUDIT without the conf: the branch is addressable by name
      assert(spark.sql(s"SELECT n FROM $cat.m.t VERSION AS OF 'audit'")
        .as[Long].collect().sorted.toSeq == Seq(1L, 2L))
      val report = spark.sql(s"CALL $cat.system.branches('m.t')")
        .as[(String, Long, Long)].collect().toSeq
      assert(report == Seq(("audit", 2L, 1L)), s"got $report")

      // PUBLISH: fast-forward lands the branch head as one main commit
      val nv = spark.sql(s"CALL $cat.system.fast_forward('m.t', 'audit')")
        .as[Long].head()
      assert(nv == 2L)
      assert(rows(cat) == Seq(1L, 2L), "published content is the audit'd content")
      val head = Snapshots.readMeta(dir, 2L).get
      assert(head.operation == "fast_forward")
      // the publish reuses the branch's segments — zero re-serialization
      assert(head.segments.nonEmpty &&
        head.segments == Snapshots.latestBranch(dir, "audit").get.segments)
      // the .refs metadata table lists tags AND branches together
      // (a tag on a manifest table is itself an OCC commit — r13)
      spark.sql(s"CALL $cat.system.tag('m.t', 'raw', 1)")
      val refs = spark.sql(
          s"""SELECT name, type, version, forked_from_version
             |FROM $cat.m.t.refs""".stripMargin)
        .as[(String, String, Option[Long], Option[Long])].collect().toSet
      assert(refs == Set(
        ("audit", "branch", Some(2L), Some(1L)),
        ("raw", "tag", Some(1L), None)), s"got $refs")
      spark.sql(s"CALL $cat.system.drop_branch('m.t', 'audit')")
      assert(Snapshots.branches(dir).isEmpty)
    }
  }

  test("fast-forward tolerates ref-only main commits, conflicts on data advancement; a conf naming a missing branch fails writes loudly") {
    withLake("wap2") { (cat, _) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (n BIGINT, region STRING)
           |PARTITIONED BY (region)
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      Seq((1L, "EU")).toDF("n", "region")
        .write.mode("append").insertInto(s"$cat.m.t")             // s-1
      spark.sql(s"CALL $cat.system.branch('m.t', 'stage')")
      spark.conf.set(Snapshots.BranchConf, "stage")
      Seq((2L, "EU")).toDF("n", "region")
        .write.mode("append").insertInto(s"$cat.m.t")
      spark.conf.unset(Snapshots.BranchConf)
      // a REF-ONLY main commit (tag) lands while the branch is staged:
      // the fast-forward check is CONTENT-based, so the publish still
      // succeeds — a tag must never strand every staged branch
      spark.sql(s"CALL $cat.system.tag('m.t', 'pre_publish', 1)")  // s-2
      val nv = spark.sql(s"CALL $cat.system.fast_forward('m.t', 'stage')")
        .as[Long].head()
      assert(nv == 3L, "ff over a ref-only commit must publish")
      assert(rows(cat) == Seq(1L, 2L))
      spark.sql(s"CALL $cat.system.drop_branch('m.t', 'stage')")

      // a DATA main commit while staged: conflict
      spark.sql(s"CALL $cat.system.branch('m.t', 'stage2')")
      spark.conf.set(Snapshots.BranchConf, "stage2")
      Seq((3L, "EU")).toDF("n", "region")
        .write.mode("append").insertInto(s"$cat.m.t")
      spark.conf.unset(Snapshots.BranchConf)
      Seq((9L, "US")).toDF("n", "region")
        .write.mode("append").insertInto(s"$cat.m.t")
      val e = intercept[Exception](
        spark.sql(s"CALL $cat.system.fast_forward('m.t', 'stage2')"))
      assert(e.getMessage.contains("advanced"), e.getMessage)
      // main keeps its own content; the stale branch drops cleanly
      assert(rows(cat) == Seq(1L, 2L, 9L))
      spark.sql(s"CALL $cat.system.drop_branch('m.t', 'stage2')")

      // a WAP conf naming a branch this table lacks: writes fail loudly
      // (a staging write silently landing on main is the one failure a
      // WAP pipeline cannot have); reads fall back to main
      spark.conf.set(Snapshots.BranchConf, "nope")
      assert(rows(cat) == Seq(1L, 2L, 9L), "reads fall back to main")
      val we = intercept[Exception](
        Seq((7L, "EU")).toDF("n", "region")
          .write.mode("append").insertInto(s"$cat.m.t"))
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(we).exists(_.contains("no such branch")),
        s"got ${msgs(we)}")
      spark.conf.unset(Snapshots.BranchConf)
      assert(rows(cat) == Seq(1L, 2L, 9L))
    }
  }

  test("racing branch writes all land through the branch's own OCC loop; main untouched") {
    withLake("wap4") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (n BIGINT, region STRING)
           |PARTITIONED BY (region)
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      val dir = lake.resolve("m/t.parquet")
      Seq((1L, "EU")).toDF("n", "region")
        .write.mode("append").insertInto(s"$cat.m.t")
      spark.sql(s"CALL $cat.system.branch('m.t', 'race')")
      spark.conf.set(Snapshots.BranchConf, "race")
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (10 to 13).map(i => new Thread(() =>
        try Seq((i.toLong, "EU")).toDF("n", "region")
          .write.mode("append").insertInto(s"$cat.m.t")
        catch { case t: Throwable => errors.add(t); () }))
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(errors.isEmpty, s"branch appends must all merge: $errors")
      assert(rows(cat) == Seq(1L, 10L, 11L, 12L, 13L))
      val bvs = Snapshots.branchVersions(dir, "race")
      assert(bvs == (0L to 4L), s"branch versions contiguous, got $bvs")
      spark.conf.unset(Snapshots.BranchConf)
      assert(rows(cat) == Seq(1L), "main untouched by the race")
      assert(Snapshots.versions(dir) == Seq(0L, 1L))
    }
  }

  test("change feed FROM a branch: batch tableChanges and the streaming source tail the staged commits") {
    withLake("wap5") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (n BIGINT, region STRING)
           |PARTITIONED BY (region)
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      Seq((1L, "EU")).toDF("n", "region")
        .write.mode("append").insertInto(s"$cat.m.t")             // s-1
      spark.sql(s"CALL $cat.system.branch('m.t', 'aud')")         // b-0
      spark.conf.set(Snapshots.BranchConf, "aud")
      Seq((2L, "EU")).toDF("n", "region")
        .write.mode("append").insertInto(s"$cat.m.t")             // b-1
      spark.sql(s"DELETE FROM $cat.m.t WHERE n = 1")              // b-2
      spark.conf.unset(Snapshots.BranchConf)
      // BATCH: the staged changes since the fork, exactly
      val feed = Catalog.readTableChanges(spark, s"$cat.m.t",
          Seq("n"), 0L, 2L, branch = Some("aud"))
        .select(col("op"), col("version"),
          col("before.n").as("bn"), col("after.n").as("an"))
        .as[(String, Long, Option[Long], Option[Long])].collect().toSet
      assert(feed == Set(("c", 1L, None, Some(2L)),
        ("d", 2L, Some(1L), None)), s"got $feed")
      // STREAM: the branch tail emits fork content as initial load,
      // then the staged commits
      val out = java.nio.file.Files.createTempDirectory("wap5-out").toString
      val q = Catalog.readStreamTable(spark, s"$cat.m.t", Seq("n"),
          branch = Some("aud"))
        .select(col("op"), col("version"),
          col("before.n").as("bn"), col("after.n").as("an"))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("wap5-ck").toString)
        .start()
      q.processAllAvailable(); q.stop()
      val streamed = spark.read.parquet(out)
        .as[(String, Long, Option[Long], Option[Long])].collect().toSet
      assert(streamed == Set(
        ("c", 0L, None, Some(1L)),   // fork content = initial load
        ("c", 1L, None, Some(2L)),
        ("d", 2L, Some(1L), None)), s"got $streamed")
      // main's feed is untouched by the staging
      val mainFeed = Catalog.readTableChanges(spark, s"$cat.m.t",
        Seq("n"), 0L, 1L)
      assert(mainFeed.where("op = 'd'").isEmpty)
    }
  }

  test("expire on main never GCs branch-staged files; dropped branches become vacuum's age-guarded orphans") {
    withLake("wap3") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (n BIGINT, region STRING)
           |PARTITIONED BY (region)
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      val dir = lake.resolve("m/t.parquet")
      (1 to 3).foreach(i =>
        Seq((i.toLong, "EU")).toDF("n", "region")
          .write.mode("append").insertInto(s"$cat.m.t"))        // s-1..3
      spark.sql(s"CALL $cat.system.branch('m.t', 'keep')")
      spark.conf.set(Snapshots.BranchConf, "keep")
      Seq((100L, "US")).toDF("n", "region")
        .write.mode("append").insertInto(s"$cat.m.t")           // b-1
      spark.conf.unset(Snapshots.BranchConf)
      spark.sql(s"CALL $cat.system.expire_snapshots('m.t', 1)")
      spark.catalog.clearCache()
      // every branch-referenced file survived the GC
      val branchRows = spark.sql(
          s"SELECT n FROM $cat.m.t VERSION AS OF 'keep'")
        .as[Long].collect().sorted.toSeq
      assert(branchRows == Seq(1L, 2L, 3L, 100L),
        "expire must treat branch-staged files as live")
      // vacuum's orphan scan also counts branch refs as live
      spark.sql(s"CALL $cat.system.vacuum('m.t', 0)").collect()
      assert(spark.sql(s"SELECT n FROM $cat.m.t VERSION AS OF 'keep'")
        .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 100L),
        "vacuum must not eat live branch files")
      // dropping the branch orphans its file; age-guarded vacuum eats it
      spark.sql(s"CALL $cat.system.drop_branch('m.t', 'keep')")
      val (nRemoved, _) = spark.sql(
          s"CALL $cat.system.vacuum('m.t', 0)")
        .as[(Long, Long)].head()
      assert(nRemoved >= 1L,
        "vacuum must collect the dropped branch's orphaned files")
      assert(rows(cat) == Seq(1L, 2L, 3L))
    }
  }
}

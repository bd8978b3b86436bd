package graft.catalog

import graft.SparkSpec
import java.nio.file.{Files, Path}

/** The per-table MONOTONIC COMMIT SEQUENCE (r14 — Iceberg's
  * data-sequence-number expressed in the segment model; the ordering
  * primitive equality deletes and PK-table merge-on-read will need).
  * The laws:
  *
  *  - a commit that ADDS files burns the next number and stamps
  *    exactly its new files; ref/audit commits (tag) never burn one;
  *  - survivors keep their BIRTH seq across unrelated commits (by
  *    segment reference) and across segment folding;
  *  - a compact's restaged files are stamped with the compacting
  *    commit's number (their rows are the newest);
  *  - branch chains extend the fork's sequence; fast_forward adopts
  *    the branch's numbers (collision-free by the content check);
  *  - cherry_pick stamps picked files with MAIN's next number;
  *  - `migrate` adopts plain files at sequence 1;
  *  - `db.t.files` exposes `committed_seq` (NULL for pre-seq files);
  *  - expire/time-travel never disturb retained snapshots' seqs. */
class CommitSeqSpec extends SparkSpec {
  import spark.implicits._

  private def withLake(tag: String)(body: (String, Path) => Unit): Unit = {
    val lake = Files.createTempDirectory(s"graft-seq-$tag")
    Files.createDirectories(lake.resolve("m"))
    val cat = s"seq$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftLakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", lake.toString)
    try body(cat, lake)
    finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.path")
      spark.conf.unset(MorDeletes.ModeConf)
      spark.conf.unset("graft.write.branch")
    }
  }

  private def mk(cat: String): Unit = {
    spark.sql(
      s"""CREATE TABLE $cat.m.t (n BIGINT, region STRING)
         |PARTITIONED BY (region)
         |TBLPROPERTIES ('versioned'='true')""".stripMargin)
    Seq((1L, "EU"), (2L, "US")).toDF("n", "region")
      .write.mode("append").insertInto(s"$cat.m.t") // seq 1
  }

  test("adds burn numbers, survivors keep theirs, ref commits don't count, compact restamps") {
    withLake("a") { (cat, lake) =>
      mk(cat)
      val dir = lake.resolve("m/t.parquet")
      val s1 = Snapshots.latest(dir).get
      assert(s1.lastSeq == 1L)
      assert(s1.files.nonEmpty &&
        s1.files.forall(f => s1.seqs.get(Snapshots.basename(f)).contains(1L)))

      Seq((3L, "EU")).toDF("n", "region")
        .write.mode("append").insertInto(s"$cat.m.t") // seq 2
      val s2 = Snapshots.latest(dir).get
      assert(s2.lastSeq == 2L)
      val gen1 = s1.files.toSet
      s2.files.foreach { f =>
        val expect = if (gen1(f)) 1L else 2L
        assert(s2.seqs.get(Snapshots.basename(f)).contains(expect), f)
      }

      // a ref commit (tag) burns NO number and carries every stamp
      spark.sql(s"CALL $cat.system.tag('m.t', 'audit', ${s2.version})")
      val s3 = Snapshots.latest(dir).get
      assert(s3.lastSeq == 2L && s3.seqs == s2.seqs)

      // many commits later, the first generation STILL answers 1
      (4L to 8L).foreach(i => Seq((i, "US")).toDF("n", "region")
        .write.mode("append").insertInto(s"$cat.m.t"))
      val s8 = Snapshots.latest(dir).get
      assert(s8.lastSeq == 7L)
      assert(gen1.forall(f =>
        s8.seqs.get(Snapshots.basename(f)).contains(1L)))

      // compact: restaged files carry the compacting commit's number
      spark.sql(s"CALL $cat.system.compact('m.t', 1)")
      val sc = Snapshots.latest(dir).get
      assert(sc.lastSeq == 8L)
      assert(Snapshots.dataFiles(sc.files).forall(f =>
        sc.seqs.get(Snapshots.basename(f)).contains(8L)))
      // retained history is undisturbed
      assert(Snapshots.read(dir, s2.version).get.seqs == s2.seqs)

      // the audit surface
      assert(spark.sql(s"SELECT min(committed_seq), max(committed_seq) " +
        s"FROM $cat.m.t.files").as[(Long, Long)].head() == ((8L, 8L)))
    }
  }

  test("branch chains extend the fork's sequence; fast_forward adopts; cherry_pick stamps main's next") {
    withLake("b") { (cat, lake) =>
      mk(cat)
      val dir = lake.resolve("m/t.parquet")
      spark.sql(s"CALL $cat.system.branch('m.t', 'wip')")
      spark.conf.set("graft.write.branch", "wip")
      try Seq((9L, "EU")).toDF("n", "region")
        .write.mode("append").insertInto(s"$cat.m.t") // branch: seq 2
      finally spark.conf.unset("graft.write.branch")
      val bh = Snapshots.latestBranch(dir, "wip").get
      assert(bh.lastSeq == 2L)
      val newOnBranch = bh.files.toSet -- Snapshots.latest(dir).get.files
      assert(newOnBranch.forall(f =>
        bh.seqs.get(Snapshots.basename(f)).contains(2L)))

      // fast_forward: main adopts the branch numbering verbatim
      spark.sql(s"CALL $cat.system.fast_forward('m.t', 'wip')")
      val m = Snapshots.latest(dir).get
      assert(m.lastSeq == 2L && m.seqs == bh.seqs)

      // a second branch, cherry-picked after main advanced: the
      // picked files get MAIN's next number (not the branch's)
      spark.sql(s"CALL $cat.system.branch('m.t', 'wip2')")
      spark.conf.set("graft.write.branch", "wip2")
      try Seq((10L, "US")).toDF("n", "region")
        .write.mode("append").insertInto(s"$cat.m.t") // branch2: seq 3
      finally spark.conf.unset("graft.write.branch")
      Seq((11L, "EU")).toDF("n", "region")
        .write.mode("append").insertInto(s"$cat.m.t") // main: seq 3
      spark.sql(s"CALL $cat.system.cherry_pick('m.t', 'wip2', 1)")
      spark.catalog.clearCache()
      val m2 = Snapshots.latest(dir).get
      assert(m2.lastSeq == 4L)
      val picked = m2.files.filterNot(
        Snapshots.read(dir, m2.version - 1).get.files.toSet)
      assert(picked.nonEmpty && picked.forall(f =>
        m2.seqs.get(Snapshots.basename(f)).contains(4L)), picked)
      assert(spark.table(s"$cat.m.t").count() == 5L)
    }
  }

  test("migrate adopts plain files at sequence 1; MoR delete files are stamped too") {
    withLake("c") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.p (n BIGINT, region STRING)
           |PARTITIONED BY (region)""".stripMargin) // PLAIN
      Seq((1L, "EU"), (2L, "US")).toDF("n", "region")
        .write.mode("append").insertInto(s"$cat.m.p")
      spark.sql(s"CALL $cat.system.migrate('m.p')")
      val dir = lake.resolve("m/p.parquet")
      val s0 = Snapshots.latest(dir).get
      assert(s0.lastSeq == 1L)
      assert(s0.files.forall(f =>
        s0.seqs.get(Snapshots.basename(f)).contains(1L)))

      spark.conf.set(MorDeletes.ModeConf, MorDeletes.MergeOnRead)
      try spark.sql(s"DELETE FROM $cat.m.p WHERE n = 1")
      finally spark.conf.unset(MorDeletes.ModeConf)
      val s1 = Snapshots.latest(dir).get
      assert(s1.lastSeq == 2L)
      assert(Snapshots.deleteFiles(s1.files).forall(f =>
        s1.seqs.get(Snapshots.basename(f)).contains(2L)))
      // sanity: the dirty read still answers
      assert(spark.table(s"$cat.m.p").count() == 1L)
    }
  }
}

package graft.catalog

import graft.SparkSpec
import java.nio.file.{Files, Path}

/** r13 metadata layer: hierarchical manifests (the Iceberg
  * manifest-list structure — an `s-<n>.json` LIST of immutable,
  * content-addressed stats-carrying SEGMENTS), so commit metadata is
  * O(delta) instead of O(live files); and maintenance as commits —
  * `expire_snapshots` publishes an `expire` snapshot through the OCC
  * loop before deleting anything, closing the r12 rollback-vs-expire
  * window. */
class ManifestSegmentSpec extends SparkSpec {
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

  private def snapDir(dir: Path): Path = dir.resolve(Snapshots.DirName)

  private def metaFiles(dir: Path): Map[String, Long] = {
    val s = Files.list(snapDir(dir))
    try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator()).asScala
      .filter(p => Files.isRegularFile(p))
      .map(p => p.getFileName.toString -> Files.size(p)).toMap
    finally s.close()
  }

  test("commit metadata is O(delta): an append to a large table writes one delta segment and a list that names no data file") {
    val dir = Files.createTempDirectory("graft-seg-delta")
    Files.createDirectories(snapDir(dir))
    // a "large" table: 500 live files committed across a few commits
    (0 until 5).foreach { b =>
      Snapshots.commit(dir, "append",
        cur => cur ++ (0 until 100).map(i => f"p=1/big-$b%02d-$i%03d.parquet"))
    }
    val before = metaFiles(dir)
    val prevLive = Snapshots.latest(dir).get.files
    assert(prevLive.size == 500)

    // ONE small append
    Snapshots.commit(dir, "append", cur => cur :+ "p=1/tiny.parquet")

    val after = metaFiles(dir)
    val newNames = (after.keySet -- before.keySet).toSeq.sorted
    val newSegs = newNames.filter(_.startsWith("m-"))
    val newList = newNames.filter(_.startsWith("s-"))
    assert(newList.size == 1 && newSegs.size <= 1,
      s"an append writes ONE list and at most one delta segment, got $newNames")
    // the delta property itself: neither the new list nor the new
    // segment mentions any pre-existing data file — carried files
    // travel by segment REFERENCE, so the bytes written are
    // proportional to the change, not the table
    val written = newNames.map(n =>
      Files.readString(snapDir(dir).resolve(n))).mkString
    assert(written.contains("tiny.parquet"))
    assert(!prevLive.exists(written.contains),
      "commit metadata must not re-serialize carried files")
    val newBytes = newNames.map(after).sum
    val fullSerialization = prevLive.mkString.length
    assert(newBytes < fullSerialization / 4,
      s"delta metadata ($newBytes B) must be far below a full " +
        s"live-list serialization (~$fullSerialization B)")
    // reconstruction is exact
    assert(Snapshots.latest(dir).get.files.toSet ==
      (prevLive :+ "p=1/tiny.parquet").toSet)
  }

  test("segment count stays bounded across many commits; reads reconstruct every version exactly") {
    val dir = Files.createTempDirectory("graft-seg-bound")
    Files.createDirectories(snapDir(dir))
    val expected = scala.collection.mutable.ArrayBuffer.empty[Set[String]]
    (0 until 40).foreach { i =>
      Snapshots.commit(dir, "append", cur => cur :+ f"p=1/f-$i%03d.parquet")
      expected += Snapshots.latest(dir).get.files.toSet
    }
    // 40 append commits, yet the latest manifest references a BOUNDED
    // number of segments (smallest ones fold into each commit's delta)
    val refs = Snapshots.readMeta(dir,
      Snapshots.versions(dir).last).get.segments
    assert(refs.nonEmpty && refs.size <= 16,
      s"segment list must stay bounded, got ${refs.size}")
    // every retained version still reads its exact historical content
    // (no init snapshot here: version 0 IS the first commit)
    Snapshots.versions(dir).zipWithIndex.foreach { case (v, i) =>
      assert(Snapshots.read(dir, v).get.files.toSet == expected(i),
        s"version $v must reconstruct exactly")
    }
  }

  test("a delete rewrites only the touched segments; untouched segments carry by reference") {
    val dir = Files.createTempDirectory("graft-seg-carry")
    Files.createDirectories(snapDir(dir))
    Snapshots.commit(dir, "append",
      cur => cur ++ (0 until 50).map(i => f"p=1/a-$i%02d.parquet"))
    Snapshots.commit(dir, "append",
      cur => cur ++ (0 until 50).map(i => f"p=2/b-$i%02d.parquet"))
    val prevRefs = Snapshots.readMeta(dir, 1L).get.segments
    assert(prevRefs.size == 2)
    // delete one file of the p=2 segment
    Snapshots.commit(dir, "delete", cur => cur.filterNot(_ == "p=2/b-00.parquet"))
    val refs = Snapshots.readMeta(dir, 2L).get.segments
    // the p=1 segment is carried verbatim; p=2 restaged as the delta
    assert(refs.intersect(prevRefs).size == 1,
      s"untouched segment must carry by reference: prev $prevRefs, now $refs")
    assert(Snapshots.read(dir, 2L).get.files.size == 99)
  }

  test("RACE: rollback vs expire — rollback either restores with all files live or conflicts; no manifest over GC'd files") {
    // many interleavings, one invariant: after both operations settle,
    // EVERY retained manifest's files exist on disk. The expire's
    // commit records its drops before deleting, and rollback
    // re-validates (manifest present + not scheduled for drop + files
    // on disk) inside its OCC loop on every retry.
    (0 until 6).foreach { round =>
      val dir = Files.createTempDirectory(s"graft-rb-exp-$round")
      Files.createDirectories(snapDir(dir))
      // real data files so GC has something to delete
      (0 until 4).foreach { i =>
        val leaf = dir.resolve("p=1")
        Files.createDirectories(leaf)
        Files.writeString(leaf.resolve(s"f$i.parquet"), s"bytes-$i")
        Snapshots.commit(dir, "append", _ => Seq(s"p=1/f$i.parquet"))
      }
      // rollback target: v1 (its file f1 is referenced by NO later
      // snapshot, so an expire(keep=1) GCs it)
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val rb = new Thread(() =>
        try {
          // the target read itself races the expire's manifest
          // deletion — absent = the same conflict the in-loop check
          // raises (LakeProcedures reports it as "no snapshot")
          val s = Snapshots.read(dir, 1L).getOrElse(
            throw new CommitConflictException(
              "rollback: target expired before the read — re-run"))
          Snapshots.commit(dir, "rollback", _ => s.files,
            validate = _ => {
              if (Snapshots.readMeta(dir, 1L).isEmpty)
                throw new CommitConflictException("rollback: expired — re-run")
              if (Snapshots.droppedByRetainedExpire(dir, 1L))
                throw new CommitConflictException(
                  "rollback: scheduled for removal — re-run")
              val missing = s.files.filterNot(f => Files.exists(dir.resolve(f)))
              if (missing.nonEmpty)
                throw new CommitConflictException("rollback: GC'd — re-run")
            })
          ()
        } catch { case t: Throwable => errors.add(t); () })
      val ex = new Thread(() =>
        try { Snapshots.commitExpire(dir, 1, () => Set.empty); () }
        catch { case t: Throwable => errors.add(t); () })
      if (round % 2 == 0) { rb.start(); ex.start() } else { ex.start(); rb.start() }
      rb.join(); ex.join()
      errors.forEach(t =>
        assert(t.isInstanceOf[CommitConflictException],
          s"only commit conflicts are acceptable, got $t"))
      // THE invariant: every retained manifest reads, and every file
      // it references exists on disk
      Snapshots.versions(dir).foreach { v =>
        val s = Snapshots.read(dir, v).get
        val missing = s.files.filterNot(f => Files.exists(dir.resolve(f)))
        assert(missing.isEmpty,
          s"round $round: retained s-$v references GC'd files $missing")
      }
    }
  }

  test("CALL migrate flips atomically: the snapshot dir appears complete or not at all; losers of a migrate race conflict") {
    withLake("seg1") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (n BIGINT, region STRING)
           |PARTITIONED BY (region)""".stripMargin)
      Seq((1L, "EU"), (2L, "US")).toDF("n", "region")
        .write.mode("append").insertInto(s"$cat.m.t")
      val dir = lake.resolve("m/t.parquet")
      // racing migrates: exactly one wins, the loser conflicts
      val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, Long]]()
      val files = PartitionedWrite.filesUnderDirs(dir,
        PartitionedWrite.leafPartitionDirs(dir)).map(_.toString)
      val threads = (0 until 4).map(_ => new Thread(() =>
        try { results.add(Right(Snapshots.migrateInit(dir, files))); () }
        catch { case t: Throwable => results.add(Left(t)); () }))
      threads.foreach(_.start()); threads.foreach(_.join())
      val (losers, winners) = results.toArray.toSeq
        .map(_.asInstanceOf[Either[Throwable, Long]])
        .partition(_.isLeft)
      assert(winners.size == 1, s"exactly one migrate wins, got $results")
      losers.foreach(l => assert(
        l.swap.toOption.get.isInstanceOf[CommitConflictException]))
      // the flipped table is complete: manifest + data readable
      assert(Snapshots.isVersioned(dir))
      assert(Snapshots.latest(dir).get.files.toSet == files.toSet)
      assert(spark.table(s"$cat.m.t").count() == 2L)
      // no temp dir leaked
      val leftovers = {
        val s = Files.list(dir)
        try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator())
          .asScala.map(_.getFileName.toString)
          .filter(_.startsWith(Snapshots.DirName + ".__tmp")).toSeq
        finally s.close()
      }
      assert(leftovers.isEmpty, s"migrate temp dirs leaked: $leftovers")
    }
  }

  test("tagging an expired snapshot fails loudly and leaves no ref behind") {
    withLake("seg2") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (n BIGINT, region STRING)
           |PARTITIONED BY (region)
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      val dir = lake.resolve("m/t.parquet")
      (1 to 3).foreach(i =>
        Seq((i.toLong, "EU")).toDF("n", "region")
          .write.mode("append").insertInto(s"$cat.m.t"))
      spark.sql(s"CALL $cat.system.expire_snapshots('m.t', 1)")
      val e = intercept[Exception](
        spark.sql(s"CALL $cat.system.tag('m.t', 'late', 1)"))
      assert(e.getMessage.contains("no snapshot") ||
        e.getMessage.contains("expire"), e.getMessage)
      assert(!Snapshots.effectivePins(dir).contains("late"))
    }
  }

  test("ref-only commits never consume the expire keep budget: keep counts DATA history") {
    val dir = Files.createTempDirectory("graft-keep-budget")
    Files.createDirectories(snapDir(dir))
    (0 until 4).foreach { i =>
      val leaf = dir.resolve("p=1")
      Files.createDirectories(leaf)
      Files.writeString(leaf.resolve(s"f$i.parquet"), s"bytes-$i")
      Snapshots.commit(dir, "append", _ => Seq(s"p=1/f$i.parquet"))
    } // data s-0..s-3
    Snapshots.commitTag(dir, "a", 3L)  // ref s-4
    Snapshots.commitTag(dir, "b", 3L)  // ref s-5
    // keep=2 must retain the 2 newest DATA snapshots (s-2, s-3) — a
    // naive takeRight(2) would count the two tag commits instead and
    // silently eat the user's time-travel window
    val dropped = Snapshots.commitExpire(dir, 2, () => Set.empty)
    assert(dropped == Seq(0L, 1L), s"got $dropped")
    assert(Snapshots.read(dir, 2L).isDefined &&
      Snapshots.read(dir, 3L).isDefined,
      "the keep-th newest data snapshots must survive ref commits")
    assert(Snapshots.versions(dir) == Seq(2L, 3L, 4L, 5L, 6L))
    assert(Snapshots.effectivePins(dir) == Map("a" -> 3L, "b" -> 3L))
  }

  test("RACE: tag vs expire — tags are chain commits, so a successful tag's snapshot is ALWAYS retained; losers conflict") {
    (0 until 6).foreach { round =>
      val dir = Files.createTempDirectory(s"graft-tag-exp-$round")
      Files.createDirectories(snapDir(dir))
      (0 until 4).foreach { i =>
        val leaf = dir.resolve("p=1")
        Files.createDirectories(leaf)
        Files.writeString(leaf.resolve(s"f$i.parquet"), s"bytes-$i")
        Snapshots.commit(dir, "append", _ => Seq(s"p=1/f$i.parquet"))
      }
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      @volatile var tagOk = false
      val tg = new Thread(() =>
        try { Snapshots.commitTag(dir, "pin", 1L); tagOk = true }
        catch { case t: Throwable => errors.add(t); () })
      val ex = new Thread(() =>
        try { Snapshots.commitExpire(dir, 1, () => Set.empty); () }
        catch { case t: Throwable => errors.add(t); () })
      if (round % 2 == 0) { tg.start(); ex.start() } else { ex.start(); tg.start() }
      tg.join(); ex.join()
      errors.forEach(t =>
        assert(t.isInstanceOf[CommitConflictException] ||
          (t.isInstanceOf[IllegalArgumentException] &&
            t.getMessage.contains("no snapshot")),
          s"round $round: only conflicts/expired are acceptable, got $t"))
      // THE invariant: a tag that REPORTED success pins a snapshot
      // whose manifest is still on disk and whose files are live —
      // the chain linearizes the pin read with the expire commit, so
      // no interleaving can GC a successfully tagged snapshot
      if (tagOk) {
        assert(Snapshots.effectivePins(dir).get("pin").contains(1L))
        val s = Snapshots.read(dir, 1L)
        assert(s.isDefined,
          s"round $round: tagged snapshot s-1 was expired after a " +
            "successful tag")
        val missing = s.get.files.filterNot(f => Files.exists(dir.resolve(f)))
        assert(missing.isEmpty,
          s"round $round: tagged snapshot lost files $missing")
      } else {
        assert(Snapshots.effectivePins(dir).isEmpty,
          s"round $round: a failed tag left a ref behind")
      }
    }
  }
}

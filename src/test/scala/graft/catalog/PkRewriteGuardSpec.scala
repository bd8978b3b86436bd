package graft.catalog

import graft.SparkSpec
import java.nio.file.{Files, Path}

/** r16 hardening of the PK-table rewrite/marker machinery:
  *
  *  - PK-aware `zorder` carries the same fresh-equality-delete commit
  *    guard as `compact` — a concurrent blind DELETE (which commits
  *    ONLY an eq-delete file, so it passes the rewrite/no-new-data
  *    checks) must never be neutered by the rewrite's re-stamped
  *    birth sequences;
  *  - `rewrite_eqdelete_files` records merged-file partition scopes
  *    with hive path escaping, byte-identical to the delete writers —
  *    key values containing '/', '%', '=' must keep pruning correct
  *    (a mis-escaped scope prunes away and the deleted key
  *    resurrects on point lookups);
  *  - the key-aware-compact marker is keyed by the compacted FILE SET
  *    (content hash), never by bare commit sequence: branch logs
  *    allocate sequences independently, so a main compact's sequence
  *    can collide with an unrelated branch commit carrying intra-batch
  *    duplicate keys — the marker must not bless it. */
class PkRewriteGuardSpec extends SparkSpec {
  import spark.implicits._

  private def withLake(tag: String)(body: (String, Path) => Unit): Unit = {
    val lake = Files.createTempDirectory(s"graft-pkg-$tag")
    Files.createDirectories(lake.resolve("m"))
    val cat = s"pkg$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftLakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", lake.toString)
    try body(cat, lake)
    finally {
      spark.conf.unset(Snapshots.BranchConf)
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.path")
    }
  }

  test("PK zorder racing a blind DELETE: the delete survives (conflict or serial order) — never silently neutered") {
    withLake("z") { (cat, _) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (k BIGINT NOT NULL, x BIGINT, y BIGINT)
           |PARTITIONED BY (bucket(4, k))
           |TBLPROPERTIES ('versioned'='true', 'primary-key'='k')""".stripMargin)
      (0L until 400L).map(i => (i, i % 37, i % 53)).toDF("k", "x", "y")
        .write.mode("append").insertInto(s"$cat.m.t")
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      try {
        val z = scala.concurrent.Future {
          spark.sql(s"CALL $cat.system.zorder('m.t', 'x', 'y', 4)").collect()
        }
        // fire the blind delete while the rewrite is (likely) between
        // its snapshot read and its commit — post-guard EVERY
        // interleaving keeps the delete; pre-guard the bad one
        // resurrected key 2
        Thread.sleep(150)
        val d = scala.concurrent.Future {
          spark.sql(s"DELETE FROM $cat.m.t WHERE k = 2")
        }
        scala.concurrent.Await.ready(d,
          scala.concurrent.duration.Duration(120, "s"))
        val zOutcome = scala.concurrent.Await.ready(z,
          scala.concurrent.duration.Duration(120, "s")).value.get
        spark.catalog.clearCache()
        val ks = spark.table(s"$cat.m.t").select("k").as[Long].collect()
        assert(!ks.contains(2L),
          s"deleted key resurrected (zorder ${zOutcome.fold(
            e => s"failed: $e", _ => "succeeded")})")
        assert(ks.length == 399)
        zOutcome match {
          case scala.util.Failure(e) =>
            def chain(t: Throwable): Seq[Throwable] =
              if (t == null) Seq.empty else t +: chain(t.getCause)
            assert(chain(e).exists(c =>
              c.isInstanceOf[CommitConflictException] ||
                Option(c.getMessage).exists(_.contains("concurrent"))),
              s"not a loud conflict: $e")
          case scala.util.Success(_) => ()
        }
      } finally pool.shutdown()
    }
  }

  test("rewrite_eqdelete_files hive-escapes identity scopes: '/' '%' '=' key values prune correctly after the merge") {
    withLake("e") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (v BIGINT, k STRING NOT NULL)
           |PARTITIONED BY (k)
           |TBLPROPERTIES ('versioned'='true', 'primary-key'='k')""".stripMargin)
      val dir = lake.resolve("m/t.parquet")
      val keys = Seq("a/b", "x%20y", "p=q", "plain")
      keys.map(k => (1L, k)).toDF("v", "k")
        .write.mode("append").insertInto(s"$cat.m.t")            // seq 1
      // two delete generations for each nasty key (≥2 eq files per
      // target dir triggers the merge), with a revive in between —
      // the per-key MAX threshold keeps "a/b" dead, "p=q" revived
      spark.sql(s"DELETE FROM $cat.m.t WHERE k = 'a/b'")         // seq 2
      spark.sql(s"DELETE FROM $cat.m.t WHERE k = 'p=q'")         // seq 3
      Seq((2L, "a/b")).toDF("v", "k")
        .write.mode("append").insertInto(s"$cat.m.t")            // seq 4
      spark.sql(s"DELETE FROM $cat.m.t WHERE k = 'a/b'")         // seq 5
      Seq((3L, "p=q")).toDF("v", "k")
        .write.mode("append").insertInto(s"$cat.m.t")            // seq 6
      def all(): Seq[(Long, String)] = {
        spark.catalog.clearCache()
        spark.table(s"$cat.m.t").as[(Long, String)]
          .collect().sortBy(_._2).toSeq
      }
      def point(k: String): Seq[(Long, String)] = {
        spark.catalog.clearCache()
        spark.table(s"$cat.m.t").where(org.apache.spark.sql.functions
          .col("k") === k).as[(Long, String)].collect().toSeq
      }
      val before = all()
      assert(before == Seq((3L, "p=q"), (1L, "plain"), (1L, "x%20y")))
      val (rewritten, fresh, _) =
        spark.sql(s"CALL $cat.system.rewrite_eqdelete_files('m.t')")
          .as[(Long, Long, Long)].head()
      assert(rewritten >= 2L && fresh >= 1L && fresh < rewritten,
        s"($rewritten, $fresh)")
      // content-neutral on the full read AND on pruned point lookups
      // (the pruned read is where a mis-escaped scope resurrects keys)
      assert(all() == before)
      assert(point("a/b").isEmpty, "merged-scope eq file pruned away")
      assert(point("p=q") == Seq((3L, "p=q")))
      assert(point("x%20y") == Seq((1L, "x%20y")))
      // the merged file's recorded scope round-trips through the
      // same decoder the writers' files use
      val eqFiles = PkTables.eqDeleteFiles(Snapshots.latest(dir).get.files)
      val scopes = eqFiles.flatMap(MorDeletes.targetDirOf).map(_.toString)
      assert(scopes.contains("k=a%2Fb"), s"scopes: $scopes")
    }
  }

  test("marker is fileset-keyed: a branch commit whose sequence collides with a main compact still dedups") {
    withLake("m") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (k BIGINT NOT NULL, v STRING)
           |PARTITIONED BY (bucket(4, k))
           |TBLPROPERTIES ('versioned'='true', 'primary-key'='k')""".stripMargin)
      val dir = lake.resolve("m/t.parquet")
      Seq((1L, "a")).toDF("k", "v")
        .write.mode("append").insertInto(s"$cat.m.t")            // main seq 1
      spark.sql(s"CALL $cat.system.branch('m.t', 'side')")
      Seq((2L, "b")).toDF("k", "v")
        .write.mode("append").insertInto(s"$cat.m.t")            // main seq 2
      spark.sql(s"CALL $cat.system.compact('m.t', 1)")           // main seq 3 + marker
      assert(PkTables.resolvedClean(dir, Snapshots.latest(dir).get),
        "main head IS provably clean after its own compact")
      // branch: two overwrites — the second (branch seq 3, colliding
      // with main's compact seq) carries intra-batch duplicate keys
      spark.conf.set(Snapshots.BranchConf, "side")
      Seq((9L, "x")).toDF("k", "v").write.mode("overwrite")
        .insertInto(s"$cat.m.t")                                 // branch seq 2
      Seq((7L, "old"), (7L, "new")).toDF("k", "v").write.mode("overwrite")
        .insertInto(s"$cat.m.t")                                 // branch seq 3
      spark.catalog.clearCache()
      val got = spark.table(s"$cat.m.t").as[(Long, String)]
        .collect().sortBy(_._1).toSeq
      spark.conf.unset(Snapshots.BranchConf)
      // a seq-keyed marker blessed this snapshot (seq 3 ∈ {3}) and
      // served BOTH versions of key 7; the fileset-keyed marker never
      // matches a snapshot the rewrite didn't produce
      assert(got == Seq((7L, "new")), s"got $got")
    }
  }
}

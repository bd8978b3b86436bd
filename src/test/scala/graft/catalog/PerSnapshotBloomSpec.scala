package graft.catalog

import graft.SparkSpec
import java.nio.file.{Files, Path}

/** r13 per-snapshot Bloom skipping: `CALL bloom_index` on a
  * manifest-versioned table publishes a `bloom` snapshot folding the
  * per-file bitsets into the commit-atomic stats, every later commit
  * maintains bitsets for ITS added files ([[Snapshots.freshStatsFor]]),
  * and scans — current AND `VERSION AS OF` — Bloom-skip from the
  * manifest of the snapshot they read, sidecar not required. */
class PerSnapshotBloomSpec extends SparkSpec {
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

  /** File paths the snapshot scan lists (explicit-file listings). */
  private def scannedFiles(q: org.apache.spark.sql.DataFrame): Int = {
    val s = q.queryExecution.executedPlan.toString
    "InMemoryFileIndex\\((\\d+) paths\\)".r.findFirstMatchIn(s)
      .map(_.group(1).toInt).getOrElse(-1)
  }

  test("bloom_index commits per-snapshot bitsets; DML maintains them; time travel and sidecar-free scans keep pruning") {
    withLake("psb") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (id BIGINT, region STRING)
           |PARTITIONED BY (region)
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      val dir = lake.resolve("m/t.parquet")
      (1L to 50L).map(id => (id, "EU")).toDF("id", "region")
        .write.mode("append").insertInto(s"$cat.m.t")      // s-1
      (1000L to 1050L).map(id => (id, "EU")).toDF("id", "region")
        .write.mode("append").insertInto(s"$cat.m.t")      // s-2
      spark.sql(s"CALL $cat.system.bloom_index('m.t', 'id', 8192, 5)") // s-3
      val s3 = Snapshots.latest(dir).get
      assert(s3.operation == "bloom" &&
        s3.stats.valuesIterator.forall(_.blooms.contains("id")),
        "bloom_index must commit a bitset-carrying snapshot")

      // CURRENT point lookup opens exactly the one file that can match
      val cur = spark.sql(s"SELECT * FROM $cat.m.t WHERE id = 5")
      assert(scannedFiles(cur) == 1,
        s"bloom must prune to one file:\n${cur.queryExecution.executedPlan}")
      assert(cur.count() == 1L)

      // post-index DML: the append's commit computes fresh bitsets for
      // its own files — no re-CALL needed
      (5000L to 5050L).map(id => (id, "EU")).toDF("id", "region")
        .write.mode("append").insertInto(s"$cat.m.t")      // s-4
      val s4 = Snapshots.latest(dir).get
      val newNames = s4.files.toSet -- s3.files.toSet
      assert(newNames.nonEmpty && newNames.forall(f =>
        s4.stats.get(Snapshots.basename(f)).exists(_.blooms.contains("id"))),
        "an append after bloom_index must carry fresh bitsets for its files")
      val post = spark.sql(s"SELECT * FROM $cat.m.t WHERE id = 5005")
      assert(scannedFiles(post) == 1 && post.count() == 1L,
        s"maintained bitsets must keep pruning:\n${post.queryExecution.executedPlan}")

      // VERSION AS OF serves THAT snapshot's bitsets
      val tt = spark.sql(s"SELECT * FROM $cat.m.t VERSION AS OF 3 WHERE id = 5")
      assert(scannedFiles(tt) == 1 && tt.count() == 1L,
        s"time-travel scan must bloom-skip:\n${tt.queryExecution.executedPlan}")

      // the manifest is the source of truth: delete the sidecar, prune on
      val sidecar = dir.resolve(BloomIndex.Sidecar)
      assert(Files.deleteIfExists(sidecar))
      spark.catalog.clearCache()
      val noSide = spark.sql(s"SELECT * FROM $cat.m.t WHERE id = 5")
      assert(scannedFiles(noSide) == 1 && noSide.count() == 1L,
        "per-snapshot bitsets must prune without the sidecar")

      // correctness backstop: pruned answers equal full-scan answers
      val all = spark.table(s"$cat.m.t").collect().length
      assert(all == 152)
    }
  }

  test("analyze after bloom_index keeps the bitsets (and vice versa): ranges and blooms compose in one stats block") {
    withLake("psb2") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (id BIGINT, r BIGINT, region STRING)
           |PARTITIONED BY (region)
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      val dir = lake.resolve("m/t.parquet")
      (1L to 40L).map(i => (i * 37L % 1000L, i, "EU")).toDF("id", "r", "region")
        .write.mode("append").insertInto(s"$cat.m.t")
      (41L to 80L).map(i => (i * 37L % 1000L + 10000L, i + 100L, "EU"))
        .toDF("id", "r", "region")
        .write.mode("append").insertInto(s"$cat.m.t")
      spark.sql(s"CALL $cat.system.bloom_index('m.t', 'id', 8192, 5)")
      spark.sql(s"CALL $cat.system.analyze('m.t', 'r')")
      val s = Snapshots.latest(dir).get
      assert(s.operation == "analyze")
      assert(s.stats.valuesIterator.forall(fs =>
        fs.blooms.contains("id") && fs.cols.contains("r")),
        "analyze must carry the bloom bitsets through its re-commit")
      // both prune: bloom on id, ranges on r
      assert(scannedFiles(
        spark.sql(s"SELECT * FROM $cat.m.t WHERE id = 37")) == 1)
      assert(scannedFiles(
        spark.sql(s"SELECT * FROM $cat.m.t WHERE r = 150")) == 1)
    }
  }
}

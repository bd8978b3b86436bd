package graft.catalog

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** Regression: rewrites staged through Spark's NATIVE writer (compact,
  * zorder, copy-on-write DELETE) publish with table-UNIQUE basenames.
  * The native writer names files per TASK (`part-00000-<uuid>.c000…`),
  * so one task writing several partition directories repeats the same
  * basename in each — and the stats/Bloom/skipping maps key by
  * basename, so the entries collided: a metadata-only COUNT
  * double-counted one file, and file skipping consulted the wrong
  * file's range (able to prune rows that match — silent wrong
  * results). [[PartitionedWrite.mergeIntoReturning]] now renames every
  * staged file to a fresh unique basename. */
class StagedRewriteUniqueNamesSpec extends SparkSpec {
  import spark.implicits._

  test("compact output basenames are unique across partitions; stats and skipping stay per-file") {
    val lake = Files.createTempDirectory("graft-uniq")
    Files.createDirectories(lake.resolve("m"))
    val cat = "uniqn"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftLakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", lake.toString)
    spark.sql(
      s"""CREATE TABLE $cat.m.t (n BIGINT, v STRING, region STRING)
         |PARTITIONED BY (region)
         |TBLPROPERTIES ('versioned'='true')""".stripMargin)
    Seq((1L, "a", "EU"), (2L, "b", "EU"), (3L, "c", "US"),
      (4L, "d", "US"), (5L, "e", "US"))
      .toDF("n", "v", "region").write.mode("append").insertInto(s"$cat.m.t")
    spark.sql(s"CALL $cat.system.analyze('m.t', 'n,v')")
    // target_files=1 forces ONE task to write BOTH partition dirs —
    // exactly the shape that repeated the native writer's basename
    spark.sql(s"CALL $cat.system.compact('m.t', 1)")
    val dir = lake.resolve("m/t.parquet")
    val files = Snapshots.latest(dir).get.files
    val bases = files.map(f => Paths.get(f).getFileName.toString)
    assert(files.size == 2, s"one file per partition, got $files")
    assert(bases.distinct.size == bases.size,
      s"basenames must be table-unique, got $bases")
    // stats after re-analyze: one entry PER FILE, counts sum to the
    // true row count, and the metadata-only aggregate serves exactly it
    spark.sql(s"CALL $cat.system.analyze('m.t', 'n,v')")
    val stats = Snapshots.latest(dir).get.stats
    assert(stats.size == 2 && stats.values.flatMap(_.rows).sum == 5L)
    val agg = spark.sql(
      s"SELECT count(*) AS c, min(n) AS mn, max(n) AS mx FROM $cat.m.t")
    assert(agg.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    assert(agg.as[(Long, Long, Long)].head() == ((5L, 1L, 5L)))
    // file skipping with per-file stats: an EU-only predicate must
    // still see EU's rows (the collided map used to serve US's range)
    assert(spark.sql(s"SELECT count(*) FROM $cat.m.t WHERE n <= 2")
      .as[Long].head() == 2L)
    spark.conf.unset(s"spark.sql.catalog.$cat")
    spark.conf.unset(s"spark.sql.catalog.$cat.path")
  }
}

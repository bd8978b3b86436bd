package graft.catalog

import graft.SparkSpec
import java.nio.file.Files

/** `CALL cat.system.vacuum('db.t', older_than_ms)` — orphaned-staging
  * cleanup (Iceberg's remove_orphan_files): crash debris is exactly
  * the unpublished `.__rewrite[-uuid]` / `.__old` sibling dirs and
  * `_*.tmp` sidecar temps; data files are referenced wholesale by
  * their directory and must never be touched. */
class VacuumSpec extends SparkSpec {
  import spark.implicits._

  test("vacuum removes stale staging debris only, honoring the age guard") {
    val lake = Files.createTempDirectory("graft-lake-vac")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkvac", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkvac.path", lake.toString)
    try {
      spark.sql("CREATE TABLE lkvac.m.t (k BIGINT, v STRING)")
      Seq((1L, "a"), (2L, "b")).toDF("k", "v")
        .write.mode("append").insertInto("lkvac.m.t")
      val dir = lake.resolve("m/t.parquet")
      // plant crash debris: an unpublished rewrite staging dir, a
      // mid-swap .__old dir, and a torn sidecar temp
      val rw = dir.resolveSibling("t.parquet.__rewrite-deadbeef")
      Files.createDirectories(rw)
      Files.writeString(rw.resolve("part-0.parquet"), "x" * 100)
      val old = dir.resolveSibling("t.parquet.__old")
      Files.createDirectories(old)
      Files.writeString(old.resolve("part-1.parquet"), "y" * 50)
      Files.writeString(dir.resolve("_graft_stats.json.tmp"), "{}")

      // fresh debris survives a 1h age guard (a live writer's staging)
      val guarded = spark.sql(
          "CALL lkvac.system.vacuum('m.t', 3600000)")
        .as[(Long, Long)].head()
      assert(guarded == ((0L, 0L)), s"age guard must keep fresh debris: $guarded")
      assert(Files.exists(rw) && Files.exists(old))

      // age 0: everything goes, bytes accounted, data intact
      val swept = spark.sql("CALL lkvac.system.vacuum('m.t', 0)")
        .as[(Long, Long)].head()
      assert(swept._1 == 3L, s"expected 3 debris entries removed: $swept")
      assert(swept._2 >= 152L, s"bytes_freed must count recursive sizes: $swept")
      assert(!Files.exists(rw) && !Files.exists(old) &&
        !Files.exists(dir.resolve("_graft_stats.json.tmp")))
      assert(spark.table("lkvac.m.t").count() == 2L,
        "vacuum must never touch data files")

      // idempotent on a clean table
      val again = spark.sql("CALL lkvac.system.vacuum('m.t', 0)")
        .as[(Long, Long)].head()
      assert(again == ((0L, 0L)))
    } finally {
      spark.conf.unset("spark.sql.catalog.lkvac")
      spark.conf.unset("spark.sql.catalog.lkvac.path")
    }
  }

  test("vacuum on a manifest table GCs published-but-uncommitted orphan data files; live files untouched") {
    val lake = Files.createTempDirectory("graft-lake-vac2")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkvc2", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkvc2.path", lake.toString)
    try {
      spark.sql(
        """CREATE TABLE lkvc2.m.t (k BIGINT, region STRING)
          |PARTITIONED BY (region)
          |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      Seq((1L, "EU"), (2L, "US")).toDF("k", "region")
        .write.mode("append").insertInto("lkvc2.m.t")
      val dir = lake.resolve("m/t.parquet")
      // simulate the crash window: a data file published into a
      // partition dir whose snapshot commit never landed — referenced
      // by NO manifest, invisible to every read
      val orphan = dir.resolve("region=EU/part-00000-9-orphan-1.parquet")
      Files.write(orphan, Array[Byte](1, 2, 3))
      assert(spark.table("lkvc2.m.t").count() == 2L,
        "the orphan must be invisible to reads")
      val (n, freed) = spark.sql("CALL lkvc2.system.vacuum('m.t', 0)")
        .as[(Long, Long)].head()
      assert(n >= 1L && freed >= 3L, s"orphan must be GC'd: ($n, $freed)")
      assert(!Files.exists(orphan))
      // live (manifest-referenced) files are untouched, reads intact
      assert(spark.table("lkvc2.m.t").as[(Long, String)]
        .collect().sortBy(_._1).toSeq == Seq((1L, "EU"), (2L, "US")))
      assert(spark.sql("SELECT * FROM lkvc2.m.t VERSION AS OF 1").count() == 2L)
    } finally {
      spark.conf.unset("spark.sql.catalog.lkvc2")
      spark.conf.unset("spark.sql.catalog.lkvc2.path")
    }
  }
}

package graft.catalog

import graft.SparkSpec
import java.nio.file.Files

/** File-level min/max data skipping: `CALL system.analyze` writes the
  * per-file range sidecar, and a filtered scan then reads FEWER files
  * than the full listing — with rows identical to the unpruned
  * answer. Staleness law: files written after the analyze always
  * survive (conservative, never wrong). */
class FileStatsSpec extends SparkSpec {
  import spark.implicits._

  /** Number of FILE paths the scan lists, or -1 for an unpruned scan
    * (which lists the table DIRECTORY as its single root path). */
  private def scannedFiles(q: org.apache.spark.sql.DataFrame): Int = {
    val s = q.queryExecution.executedPlan.toString
    "InMemoryFileIndex\\((\\d+) paths\\)\\[([^\\]]*)".r.findFirstMatchIn(s) match {
      case Some(m) =>
        val n = m.group(1).toInt
        if (n == 0 || m.group(2).contains(".parquet/part-")) n else -1
      case None => -1
    }
  }

  test("analyze + filtered scan: provably-excluded files skipped, answers identical") {
    val lake = Files.createTempDirectory("graft-lake-skip")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lks", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lks.path", lake.toString)
    try {
      // cluster on k: 4 files with disjoint k-ranges (range exchange)
      spark.sql("CREATE TABLE lks.m.t (k BIGINT, v STRING)")
      (1L to 400L).map(i => (i, s"v$i")).toDF("k", "v")
        .repartitionByRange(4, $"k")
        .write.mode("append").insertInto("lks.m.t")
      val full = spark.table("lks.m.t").where("k = 7").as[(Long, String)]
        .collect().toSeq
      assert(scannedFiles(spark.table("lks.m.t").where("k = 7")) == -1,
        "no sidecar yet: no pruning")
      // analyze, then the same query should touch a strict file subset
      assert(spark.sql("CALL lks.system.analyze('m.t', 'k')")
        .head().getLong(0) >= 4L)
      val pruned = spark.table("lks.m.t").where("k = 7")
      val n = scannedFiles(pruned)
      assert(n >= 1 && n < 4, s"expected a strict subset of 4 files, got $n")
      assert(pruned.as[(Long, String)].collect().toSeq == full)
      // range predicate prunes too; IN with all-out-of-range values
      // empties the listing but still answers correctly
      assert(scannedFiles(spark.table("lks.m.t").where("k > 390")) < 4)
      val nowhere = spark.table("lks.m.t").where("k IN (9999, 8888)")
      assert(scannedFiles(nowhere) == 0)
      assert(nowhere.count() == 0L)
      // string-column stats prune as well
      spark.sql("CALL lks.system.analyze('m.t', 'k,v')")
      assert(scannedFiles(spark.table("lks.m.t").where("v = 'v7'")) < 4)
      // staleness: new files after analyze always survive
      Seq((9999L, "late")).toDF("k", "v").write.mode("append")
        .insertInto("lks.m.t")
      val late = spark.table("lks.m.t").where("k = 9999")
      assert(late.count() == 1L, "unlisted files are never pruned")
      // unprovable predicates fall back to the full listing
      assert(scannedFiles(spark.table("lks.m.t").where("k % 2 = 0")) == -1)
    } finally {
      spark.conf.unset("spark.sql.catalog.lks")
      spark.conf.unset("spark.sql.catalog.lks.path")
    }
  }

  test("z-order layout + analyze: BOTH dimensions prune files") {
    import org.apache.spark.sql.functions.col
    val lake = Files.createTempDirectory("graft-lake-skipz")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkz", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkz.path", lake.toString)
    try {
      // a 64×64 (x, y) grid clustered in Morton order into 8 files:
      // every file covers a LOCAL 2D tile, so min/max are tight on
      // both dimensions — the property an x-sort lacks for y
      spark.sql("CREATE TABLE lkz.m.grid (x INT, y INT)")
      val grid = spark.range(64L * 64L)
        .selectExpr("CAST(id % 64 AS INT) AS x", "CAST(id div 64 AS INT) AS y")
      graft.operators.Layout.zorderLayout(grid, col("x"), col("y"), 8)
        .write.mode("append").insertInto("lkz.m.grid")
      spark.sql("CALL lkz.system.analyze('m.grid', 'x,y')")
      val qx = spark.table("lkz.m.grid").where("x = 3")
      val qy = spark.table("lkz.m.grid").where("y = 3")
      assert(scannedFiles(qx) < 8 && scannedFiles(qx) >= 1, "x prunes")
      assert(scannedFiles(qy) < 8 && scannedFiles(qy) >= 1,
        "the SECOND dimension prunes too — the z-order payoff")
      assert(qx.count() == 64L && qy.count() == 64L, "answers exact")
    } finally {
      spark.conf.unset("spark.sql.catalog.lkz")
      spark.conf.unset("spark.sql.catalog.lkz.path")
    }
  }

  test("CALL zorder + analyze: the user-facing rewrite prunes both dimensions") {
    val lake = Files.createTempDirectory("graft-lake-callz")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkcz", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkcz.path", lake.toString)
    try {
      // land the grid UNCLUSTERED (hash-scattered), then let the
      // procedure rebuild the layout in place
      spark.sql("CREATE TABLE lkcz.m.grid (x INT, y INT)")
      spark.range(64L * 64L)
        .selectExpr("CAST(id % 64 AS INT) AS x", "CAST(id div 64 AS INT) AS y")
        .repartition(8)
        .write.mode("append").insertInto("lkcz.m.grid")
      assert(spark.sql("CALL lkcz.system.zorder('m.grid', 'x', 'y', 8)")
        .head().isNullAt(0), "plain-table rewrite reports no snapshot")
      spark.sql("CALL lkcz.system.analyze('m.grid', 'x,y')")
      val qx = spark.table("lkcz.m.grid").where("x = 3")
      val qy = spark.table("lkcz.m.grid").where("y = 3")
      assert(scannedFiles(qx) < 8 && scannedFiles(qx) >= 1, "x prunes")
      assert(scannedFiles(qy) < 8 && scannedFiles(qy) >= 1, "y prunes")
      assert(qx.count() == 64L && qy.count() == 64L &&
        spark.table("lkcz.m.grid").count() == 64L * 64L, "rows intact")
      // bad column fails loudly
      intercept[Exception](spark.sql(
        "CALL lkcz.system.zorder('m.grid', 'nope', 'y', 8)").collect())
    } finally {
      spark.conf.unset("spark.sql.catalog.lkcz")
      spark.conf.unset("spark.sql.catalog.lkcz.path")
    }
  }

  test("skipping composes with RENAME COLUMN: logical predicate, physical stats") {
    val lake = Files.createTempDirectory("graft-lake-skipr")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lksr", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lksr.path", lake.toString)
    try {
      spark.sql("CREATE TABLE lksr.m.t (k BIGINT, v STRING)")
      (1L to 200L).map(i => (i, s"v$i")).toDF("k", "v")
        .repartitionByRange(4, $"k")
        .write.mode("append").insertInto("lksr.m.t")
      spark.sql("CALL lksr.system.analyze('m.t', 'k')")
      spark.sql("ALTER TABLE lksr.m.t RENAME COLUMN k TO id")
      val q = spark.table("lksr.m.t").where("id = 5")
      assert(scannedFiles(q) < 4 && scannedFiles(q) >= 1,
        "renamed predicate must still reach the physical stats")
      assert(q.select("id").as[Long].collect().toSeq == Seq(5L))
    } finally {
      spark.conf.unset("spark.sql.catalog.lksr")
      spark.conf.unset("spark.sql.catalog.lksr.path")
    }
  }

  test("DATE/TIMESTAMP stats: prune via the catalyst numeric encoding, never drop matches") {
    val lake = Files.createTempDirectory("graft-lake-skipd")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkdt", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkdt.path", lake.toString)
    try {
      spark.sql("CREATE TABLE lkdt.m.t (d DATE, ts TIMESTAMP, v BIGINT)")
      val base = java.time.LocalDate.of(1996, 1, 1)
      val t0 = java.time.LocalDateTime.of(1996, 1, 1, 0, 0)
      (0 until 400).map { i =>
        (java.sql.Date.valueOf(base.plusDays(i.toLong)),
          java.sql.Timestamp.valueOf(t0.plusHours(i.toLong)), i.toLong)
      }.toDF("d", "ts", "v")
        .repartitionByRange(4, $"d")
        .write.mode("append").insertInto("lkdt.m.t")
      val wantLt = spark.table("lkdt.m.t").where("d < DATE'1996-02-01'")
        .select("v").as[Long].collect().sorted.toSeq
      assert(wantLt.nonEmpty)
      spark.sql("CALL lkdt.system.analyze('m.t', 'd,ts')")
      // strict date range: the r9 bug treated the incomparable
      // Int-vs-string cmp as 0 and pruned EVERY file here
      val q = spark.table("lkdt.m.t").where("d < DATE'1996-02-01'")
      val n = scannedFiles(q)
      assert(n >= 1 && n < 4, s"expected a strict subset of 4 files, got $n")
      assert(q.select("v").as[Long].collect().sorted.toSeq == wantLt,
        "pruning must never drop matching rows")
      // date equality and timestamp range prune too, answers intact
      val qe = spark.table("lkdt.m.t").where("d = DATE'1996-06-15'")
      assert(scannedFiles(qe) >= 0 && scannedFiles(qe) < 4)
      assert(qe.count() == 1L)
      val qt = spark.table("lkdt.m.t")
        .where("ts >= TIMESTAMP'1996-01-14 00:00:00'")
      assert(scannedFiles(qt) < 4)
      assert(qt.count() ==
        spark.read.parquet(lake.resolve("m/t.parquet").toString)
          .where("ts >= TIMESTAMP'1996-01-14 00:00:00'").count())
      // unsupported column types are rejected upfront, not mis-pruned
      spark.sql("CREATE TABLE lkdt.m.arr (a ARRAY<INT>, k BIGINT)")
      spark.sql("INSERT INTO lkdt.m.arr VALUES (array(1,2), 1)")
      val e = intercept[Exception](
        spark.sql("CALL lkdt.system.analyze('m.arr', 'a')"))
      assert(e.getMessage.contains("unsupported column type"))
    } finally {
      spark.conf.unset("spark.sql.catalog.lkdt")
      spark.conf.unset("spark.sql.catalog.lkdt.path")
    }
  }
}

package graft.catalog

import graft.SparkSpec
import java.nio.file.Files

/** Metadata-only aggregates: after `CALL system.analyze`, a global
  * `count(*) / count(c) / min(c) / max(c)` is answered from the stats
  * sidecar through V2 complete aggregate pushdown — the plan carries a
  * LocalScan and opens ZERO data files. Exactness guards: any WHERE,
  * GROUP BY, unlisted file, or unservable function falls back to a
  * real scan with identical answers. */
class StatsAggregateSpec extends SparkSpec {
  import spark.implicits._

  // Spark lowers the pushed LocalScan to a LocalTableScan over the
  // served aggregate columns — no file source node anywhere
  private def isMetadataOnly(q: org.apache.spark.sql.DataFrame): Boolean = {
    val plan = q.queryExecution.executedPlan.toString
    plan.contains("LocalTableScan") && !plan.toLowerCase.contains("parquet")
  }

  test("count/min/max served from the sidecar: LocalScan plan, exact answers") {
    val lake = Files.createTempDirectory("graft-lake-magg")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkma", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkma.path", lake.toString)
    try {
      spark.sql("CREATE TABLE lkma.m.t (k BIGINT, s STRING, v DOUBLE)")
      val rows = (1L to 400L).map(i =>
        (i, f"s$i%04d", if (i % 5 == 0) null else java.lang.Double.valueOf(i * 0.5)))
      rows.toDF("k", "s", "v").repartitionByRange(4, $"k")
        .write.mode("append").insertInto("lkma.m.t")
      spark.sql("CALL lkma.system.analyze('m.t', 'k,s,v')")

      val q = spark.sql(
        """SELECT count(*) AS n, count(v) AS nv, min(k) AS mnk,
          |  max(k) AS mxk, min(s) AS mns, max(s) AS mxs,
          |  min(v) AS mnv, max(v) AS mxv FROM lkma.m.t""".stripMargin)
      assert(isMetadataOnly(q),
        s"expected a stats-agg LocalScan plan, got\n${q.queryExecution.executedPlan}")
      val r = q.head()
      assert(r.getLong(0) == 400L && r.getLong(1) == 320L)
      assert(r.getLong(2) == 1L && r.getLong(3) == 400L)
      assert(r.getString(4) == "s0001" && r.getString(5) == "s0400")
      // v is NULL at multiples of 5 (incl. i=400) → max is 399·0.5
      assert(r.getDouble(6) == 0.5 && r.getDouble(7) == 199.5)

      // WHERE / GROUP BY / DISTINCT / SUM: never served — real scan,
      // same answers as the raw parquet
      val raw = spark.read.parquet(lake.resolve("m/t.parquet").toString)
      val where = spark.sql("SELECT count(*) FROM lkma.m.t WHERE k > 100")
      assert(!isMetadataOnly(where))
      assert(where.head().getLong(0) == raw.where("k > 100").count())
      val grouped = spark.sql(
        "SELECT k % 2 AS g, count(*) FROM lkma.m.t GROUP BY 1")
      assert(!isMetadataOnly(grouped))
      assert(grouped.count() == 2L)
      assert(!isMetadataOnly(
        spark.sql("SELECT count(DISTINCT k) FROM lkma.m.t")))
      assert(!isMetadataOnly(spark.sql("SELECT sum(k) FROM lkma.m.t")))

      // staleness: a file landed after analyze bails the pushdown —
      // the fresh rows are counted through a real scan
      Seq((9999L, "zzzz", java.lang.Double.valueOf(1.0))).toDF("k", "s", "v")
        .write.mode("append").insertInto("lkma.m.t")
      val stale = spark.sql("SELECT count(*) AS n, max(k) AS mx FROM lkma.m.t")
      assert(!isMetadataOnly(stale), "unlisted file must bail the pushdown")
      assert(stale.head().getLong(0) == 401L && stale.head().getLong(1) == 9999L)
      // re-analyze restores the metadata path over the new listing
      spark.sql("CALL lkma.system.analyze('m.t', 'k,s,v')")
      val fresh = spark.sql("SELECT count(*) AS n, max(k) AS mx FROM lkma.m.t")
      assert(isMetadataOnly(fresh))
      assert(fresh.head().getLong(0) == 401L && fresh.head().getLong(1) == 9999L)
    } finally {
      spark.conf.unset("spark.sql.catalog.lkma")
      spark.conf.unset("spark.sql.catalog.lkma.path")
    }
  }

  test("all-NULL column, rename translation, selective-DML refresh keep serving") {
    val lake = Files.createTempDirectory("graft-lake-magg2")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkmb", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkmb.path", lake.toString)
    try {
      spark.sql("CREATE TABLE lkmb.m.t (k BIGINT, e STRING)")
      (1L to 200L).map(i => (i, null: String)).toDF("k", "e")
        .repartitionByRange(4, $"k")
        .write.mode("append").insertInto("lkmb.m.t")
      spark.sql("CALL lkmb.system.analyze('m.t', 'k,e')")
      // SQL semantics over an all-NULL column: count 0, min/max NULL
      val q = spark.sql(
        "SELECT count(e) AS n, min(e) AS mn, max(e) AS mx FROM lkmb.m.t")
      assert(isMetadataOnly(q))
      val r = q.head()
      assert(r.getLong(0) == 0L && r.isNullAt(1) && r.isNullAt(2))

      // rename: the logical name reaches the physical sidecar entries
      spark.sql("ALTER TABLE lkmb.m.t RENAME COLUMN k TO id")
      val qr = spark.sql("SELECT min(id) AS mn, max(id) AS mx FROM lkmb.m.t")
      assert(isMetadataOnly(qr),
        s"renamed column must still serve, got\n${qr.queryExecution.executedPlan}")
      assert(qr.head().getLong(0) == 1L && qr.head().getLong(1) == 200L)

      // file-granular DELETE refreshes the sidecar: the rewritten
      // file's fresh stats keep the metadata path alive and exact
      spark.sql("DELETE FROM lkmb.m.t WHERE id = 7")
      val qd = spark.sql("SELECT count(*) AS n, min(id) AS mn FROM lkmb.m.t")
      assert(isMetadataOnly(qd),
        "post-DML sidecar refresh must keep serving aggregates")
      assert(qd.head().getLong(0) == 199L && qd.head().getLong(1) == 1L)
    } finally {
      spark.conf.unset("spark.sql.catalog.lkmb")
      spark.conf.unset("spark.sql.catalog.lkmb.path")
    }
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan evidence for the r18 MV-refresh optimizations: runs a small
  * join-MV lifecycle (fact-only, dim-only, both-sides refreshes) and a
  * single-source min/max MV retraction refresh with a
  * QueryExecutionListener attached, dumping EVERY Spark action's
  * physical plan the refreshes execute, in order. Run at the pre-round
  * commit for `mv_refresh_before.txt` (GRAFT_PLANS_SUFFIX=before) and
  * at HEAD for `..._after.txt` — the diff carries the claims: the
  * steady-set checkpoint execution disappears (state-tag fused join),
  * the extremal recompute's source scan gains a pushed IN filter, and
  * the extremal delta DAG stops executing twice. Diagnostic only. */
object MvPlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(
      sys.env.getOrElse("GRAFT_PLANS_DIR", "plans/r18"))
    val suffix = sys.env.getOrElse("GRAFT_PLANS_SUFFIX", "after")
    java.nio.file.Files.createDirectories(outDir)
    val spark = GraftSession.tuned(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val buf = new scala.collection.mutable.ArrayBuffer[String]()
    @volatile var capture = false
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        if (capture) buf.synchronized {
          buf += s"=== action ${buf.size + 1}: $funcName " +
            s"(${durationNs / 1000000} ms) ===\n" +
            qe.explainString(ExplainMode.fromString("formatted"))
        }
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    def section(title: String)(body: => Unit): Unit = {
      buf.synchronized { buf += s"########## $title ##########" }
      capture = true
      try body finally {
        // QueryExecutionListener callbacks ride the listener bus —
        // give it a beat to drain before flipping capture off
        Thread.sleep(500)
        capture = false
      }
    }

    val lake = java.nio.file.Files.createTempDirectory("graft-mvplan")
    java.nio.file.Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.mpd",
      classOf[graft.catalog.GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.mpd.path", lake.toString)

    // ---- join MV (the q_join_mv shape in miniature) ----
    spark.sql(
      """CREATE TABLE mpd.m.tickets (
        |  k BIGINT NOT NULL, status STRING, cents BIGINT, pm STRING)
        |PARTITIONED BY (bucket(4, k))
        |TBLPROPERTIES ('versioned'='true', 'primary-key'='k')"""
        .stripMargin)
    spark.sql(
      """CREATE TABLE mpd.m.movies (pm STRING NOT NULL, label STRING)
        |PARTITIONED BY (bucket(2, pm))
        |TBLPROPERTIES ('versioned'='true', 'primary-key'='pm')"""
        .stripMargin)
    spark.range(0, 200).selectExpr("id AS k", "'O' AS status",
        "id * 7 AS cents", "concat('p', id % 5) AS pm")
      .write.mode("append").insertInto("mpd.m.tickets")
    spark.range(0, 5).selectExpr("concat('p', id) AS pm",
        "concat('L', id) AS label")
      .write.mode("append").insertInto("mpd.m.movies")
    graft.catalog.MaterializedView.createJoin(spark, "mpd.m.jmv",
      "mpd.m.tickets", "mpd.m.movies", factKeys = Seq("k"),
      joinCols = Seq("pm"), groupBy = Seq("pm", "label"),
      aggs = Seq("cents" -> "sum", "cents" -> "count", "cents" -> "min"),
      buckets = 2)
    // fact-only refresh
    spark.range(0, 200).filter($"id" % 3 === 0)
      .selectExpr("id AS k", "'U' AS status", "id * 7 + 100 AS cents",
        "concat('p', id % 5) AS pm")
      .write.mode("append").insertInto("mpd.m.tickets")
    section("join MV refresh: FACT-ONLY delta") {
      graft.catalog.MaterializedView.refresh(spark, "mpd.m.jmv")
    }
    // dim-only refresh (relabel → steady fact rows move groups)
    spark.sql("UPDATE mpd.m.movies SET label = 'HOT' WHERE pm = 'p1'")
    section("join MV refresh: DIM-ONLY delta (steady-set leg)") {
      graft.catalog.MaterializedView.refresh(spark, "mpd.m.jmv")
    }
    // both sides in one range
    spark.sql("DELETE FROM mpd.m.tickets WHERE k % 7 = 0")
    spark.sql("DELETE FROM mpd.m.movies WHERE pm = 'p4'")
    section("join MV refresh: BOTH-SIDES delta") {
      graft.catalog.MaterializedView.refresh(spark, "mpd.m.jmv")
    }

    // ---- single-source min/max MV: retraction recompute ----
    spark.sql(
      """CREATE TABLE mpd.m.src (k BIGINT, grp STRING, x BIGINT)
        |PARTITIONED BY (bucket(4, k))
        |TBLPROPERTIES ('versioned'='true')""".stripMargin)
    spark.range(0, 400).selectExpr("id AS k",
        "concat('g', id % 8) AS grp", "id AS x")
      .write.mode("append").insertInto("mpd.m.src")
    graft.catalog.MaterializedView.create(spark, "mpd.m.mm",
      "mpd.m.src", Seq("k"), Seq("grp"),
      Seq("x" -> "sum", "x" -> "min", "x" -> "max"))
    spark.conf.set("graft.write.mode", "merge-on-read")
    try spark.sql("DELETE FROM mpd.m.src WHERE x >= 396") // retracts 4 groups' maxima
    finally spark.conf.unset("graft.write.mode")
    section("min/max MV refresh: RETRACTION recompute (4 of 8 groups)") {
      graft.catalog.MaterializedView.refresh(spark, "mpd.m.mm")
    }
    // insert-only extremal refresh: the recompute leg must not plan at all
    spark.range(400, 410).selectExpr("id AS k", "concat('g', id % 8) AS grp",
        "id AS x")
      .write.mode("append").insertInto("mpd.m.src")
    section("min/max MV refresh: INSERT-ONLY (no recompute leg)") {
      graft.catalog.MaterializedView.refresh(spark, "mpd.m.mm")
    }

    // ---- identity-partitioned source: the IN prune becomes a literal
    // FILE-LIST shrink (PartitionFilters prune grp=... directories) ----
    spark.sql(
      """CREATE TABLE mpd.m.srcp (k BIGINT, x BIGINT, grp STRING)
        |PARTITIONED BY (grp)
        |TBLPROPERTIES ('versioned'='true')""".stripMargin)
    spark.range(0, 400).selectExpr("id AS k", "id AS x",
        "concat('g', id % 8) AS grp")
      .write.mode("append").insertInto("mpd.m.srcp")
    graft.catalog.MaterializedView.create(spark, "mpd.m.mmp",
      "mpd.m.srcp", Seq("k"), Seq("grp"),
      Seq("x" -> "min", "x" -> "max"))
    spark.conf.set("graft.write.mode", "merge-on-read")
    try spark.sql("DELETE FROM mpd.m.srcp WHERE k IN (399, 398)") // retracts g7, g6 maxima
    finally spark.conf.unset("graft.write.mode")
    section("min/max MV refresh, IDENTITY-partitioned source: " +
        "RETRACTION recompute prunes to the 2 retracted groups' dirs") {
      graft.catalog.MaterializedView.refresh(spark, "mpd.m.mmp")
    }

    val target = outDir.resolve(s"mv_refresh_$suffix.txt")
    java.nio.file.Files.writeString(target, buf.mkString("\n\n"))
    println(s"[mvplan] wrote $target (${buf.size} entries)")
    spark.stop()
  }
}

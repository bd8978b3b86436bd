package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan evidence for the r17 one-pass PK version diff: builds a small
  * PK table (two commits), then dumps `.explain("formatted")` of the
  * TWO-SNAPSHOT diff (`ChangeFeed.between`) and of the ONE-PASS form
  * (`ManifestSnapshotReads.fastDiff`) side by side — the Exchange
  * count is the claim being checked. Diagnostic only. */
object FeedPlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(
      sys.env.getOrElse("GRAFT_PLANS_DIR", "plans/r17"))
    java.nio.file.Files.createDirectories(outDir)
    val spark = GraftSession.tuned(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val lake = java.nio.file.Files.createTempDirectory("graft-feedplan")
    java.nio.file.Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.fpd",
      classOf[graft.catalog.GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.fpd.path", lake.toString)
    spark.sql(
      """CREATE TABLE fpd.m.t (k BIGINT NOT NULL, v STRING, x BIGINT)
        |PARTITIONED BY (bucket(4, k))
        |TBLPROPERTIES ('versioned'='true', 'primary-key'='k')"""
        .stripMargin)
    Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "v", "x").write.mode("append").insertInto("fpd.m.t")
    Seq((2L, "b2", 21L), (4L, "d", 40L)).toDF("k", "v", "x")
      .write.mode("append").insertInto("fpd.m.t")
    val store = graft.catalog.ManifestSnapshotReads(
      spark, lake.resolve("m/t.parquet").toString)
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val txt = df.queryExecution.explainString(
        ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(outDir.resolve(name), txt)
      println(s"[feedplan] wrote $name")
    }
    dump("pk_version_feed_before.txt",
      graft.streaming.ChangeFeed.between(store, 1L, 2L, Seq("k")))
    dump("pk_version_feed_after.txt",
      store.fastDiff(1L, 2L, Seq("k")).getOrElse(
        sys.error("fast diff did not apply on the additive commit")))
    // r18 change 7: the bulk-load feed over the EMPTY CREATE version
    // (v0 → v1). Before = the one-pass diff the old versionFeed routed
    // purely-additive commits to (key shuffle + two-image aggregate);
    // after = the initial-load shortcut (the resolved read as inserts,
    // no diff machinery beyond the resolution's own exchange).
    dump("pk_initial_feed_before.txt",
      store.fastDiff(0L, 1L, Seq("k")).getOrElse(
        sys.error("fast diff did not apply on the bulk commit")))
    dump("pk_initial_feed_after.txt",
      graft.streaming.ChangeFeed.versionFeed(store, 1L, Seq("k"),
        store.rowSchema, persisted = false))
    // the non-PK merge-on-read twin: append + MoR DELETE lifecycle
    spark.sql(
      """CREATE TABLE fpd.m.p (k BIGINT, v STRING, x BIGINT)
        |PARTITIONED BY (bucket(4, k))
        |TBLPROPERTIES ('versioned'='true')""".stripMargin)
    Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "v", "x").write.mode("append").insertInto("fpd.m.p")
    spark.conf.set("graft.write.mode", "merge-on-read")
    try spark.sql("DELETE FROM fpd.m.p WHERE v = 'c'")
    finally spark.conf.unset("graft.write.mode")
    val pstore = graft.catalog.ManifestSnapshotReads(
      spark, lake.resolve("m/p.parquet").toString)
    dump("mor_version_feed_before.txt",
      graft.streaming.ChangeFeed.between(pstore, 1L, 2L, Seq("k")))
    dump("mor_version_feed_after.txt",
      pstore.fastDiff(1L, 2L, Seq("k")).getOrElse(
        sys.error("MoR fast diff did not apply on the additive commit")))
    spark.stop()
  }
}

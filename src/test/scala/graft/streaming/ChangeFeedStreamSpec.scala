package graft.streaming

import graft.SparkSpec
import graft.catalog.Catalog
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, to_json}

/** Change-feed-as-stream for VERSIONED lake tables: snapshot commits
  * arrive as micro-batches of their per-version change feeds; the
  * streamed rows equal the batch-derived feed regardless of trigger
  * slicing, and checkpoint replay is exactly-once. */
class ChangeFeedStreamSpec extends SparkSpec {
  import spark.implicits._

  /** Comparable rendering: (op, version, before-json, after-json). */
  private def feedKeys(df: DataFrame): Set[(String, Long, String, String)] =
    df.select(col("op"), col("version"),
        to_json(col("before")).as("b"), to_json(col("after")).as("a"))
      .as[(String, Long, String, String)].collect().toSet

  test("multi-commit stream equals the batch change feed; live commits arrive; replay is exactly-once") {
    val lake = Files.createTempDirectory("graft-lake-cfs")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkcfs", classOf[graft.catalog.GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkcfs.path", lake.toString)
    val store = new StateStore(spark, lake.resolve("m/t.parquet").toString)
    try {
      // three committed snapshots: insert-only, update+insert, delete
      store.write(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), 0L)
      store.write(Seq((1L, "a2"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v"), 1L)
      store.write(Seq((1L, "a2"), (3L, "c"), (4L, "d")).toDF("k", "v"), 2L)

      // the batch-derived expectation: v0 whole as inserts, then diffs
      val snap0 = store.read(0L).get.select(
        org.apache.spark.sql.functions.lit("c").as("op"),
        org.apache.spark.sql.functions.lit(0L).as("version"),
        org.apache.spark.sql.functions.lit(null)
          .cast(store.read(0L).get.schema).as("before"),
        org.apache.spark.sql.functions.struct(col("k"), col("v")).as("after"))
      val expect01 = feedKeys(snap0) ++
        feedKeys(ChangeFeed.between(store, 0L, 1L, Seq("k"))
          .select(col("op"), org.apache.spark.sql.functions.lit(1L).as("version"),
            col("before"), col("after"))) ++
        feedKeys(ChangeFeed.between(store, 1L, 2L, Seq("k"))
          .select(col("op"), org.apache.spark.sql.functions.lit(2L).as("version"),
            col("before"), col("after")))

      val ckpt = Files.createTempDirectory("cfs-ck").toString
      val out = Files.createTempDirectory("cfs-out").toString
      // file sink: its commit log gives the stream recoverable
      // exactly-once output (memory sink cannot recover a checkpoint)
      def startStream() = Catalog.readStreamTable(spark, "lkcfs.m.t", Seq("k"))
        .select(col("op"), col("version"),
          to_json(col("before")).as("b"), to_json(col("after")).as("a"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt).start()
      def sunk(): Seq[(String, Long, String, String)] =
        spark.read.parquet(out)
          .as[(String, Long, String, String)].collect().toSeq
      val q1 = startStream()
      q1.processAllAvailable()
      assert(sunk().toSet == expect01 && sunk().size == expect01.size,
        "streamed feed must equal the batch-derived per-version feed")

      // a live commit arrives as its own version feed
      store.write(Seq((3L, "c9"), (4L, "d")).toDF("k", "v"), 3L)
      q1.processAllAvailable()
      val expect3 = feedKeys(ChangeFeed.between(store, 2L, 3L, Seq("k"))
        .select(col("op"), org.apache.spark.sql.functions.lit(3L).as("version"),
          col("before"), col("after")))
      assert(sunk().toSet == expect01 ++ expect3 &&
        sunk().size == expect01.size + expect3.size)
      q1.stop()

      // exactly-once under replay: a commit lands while the stream is
      // down; restarting from the SAME checkpoint emits ONLY the new
      // version's feed (offsets replay from the log, nothing re-emits)
      store.write(Seq((4L, "d2")).toDF("k", "v"), 4L)
      val q2 = startStream()
      q2.processAllAvailable()
      val expect4 = feedKeys(ChangeFeed.between(store, 3L, 4L, Seq("k"))
        .select(col("op"), org.apache.spark.sql.functions.lit(4L).as("version"),
          col("before"), col("after")))
      val all = expect01 ++ expect3 ++ expect4
      assert(sunk().toSet == all && sunk().size == all.size,
        "replay must emit exactly the versions after the checkpoint, " +
          "once each — no re-emission, no loss")
      q2.stop()

      // guard rails: versioned tables need keys; plain tables reject
      // the keyed form
      val e = intercept[IllegalArgumentException](
        Catalog.readStreamTable(spark, "lkcfs.m.t"))
      assert(e.getMessage.contains("change"), e.getMessage)
    } finally {
      spark.conf.unset("spark.sql.catalog.lkcfs")
      spark.conf.unset("spark.sql.catalog.lkcfs.path")
    }
  }

  test("manifest-versioned PARTITIONED table streams as a change feed: inserts, per-commit diffs, live commits; flat tail rejected") {
    val lake = Files.createTempDirectory("graft-lake-cfmp")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkcfm", classOf[graft.catalog.GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkcfm.path", lake.toString)
    try {
      import org.apache.spark.sql.functions.lit
      spark.sql(
        """CREATE TABLE lkcfm.m.t (k BIGINT, v STRING, region STRING)
          |PARTITIONED BY (region)
          |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      // s-1: two inserts; s-2: an EU overwrite (update + delete vs s-1)
      Seq((1L, "a", "EU"), (2L, "b", "US")).toDF("k", "v", "region")
        .write.mode("append").insertInto("lkcfm.m.t")
      spark.sql("DELETE FROM lkcfm.m.t WHERE k = 2")

      val ckpt = Files.createTempDirectory("cfm-ck").toString
      val out = Files.createTempDirectory("cfm-out").toString
      val q = Catalog.readStreamTable(spark, "lkcfm.m.t", Seq("k"))
        .select(col("op"), col("version"),
          to_json(col("before")).as("b"), to_json(col("after")).as("a"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt).start()
      q.processAllAvailable()
      def sunk(): Set[(String, Long, String, String)] =
        spark.read.parquet(out)
          .as[(String, Long, String, String)].collect().toSet
      // expectation from the manifest reader: s-0 empty, s-1 inserts,
      // s-2 the delete diff
      val reads = graft.catalog.ManifestSnapshotReads(
        spark, lake.resolve("m/t.parquet").toString)
      val row = reads.read(1L).get.schema
      val expect =
        feedKeys(reads.read(1L).get.select(lit("c").as("op"),
          lit(1L).as("version"), lit(null).cast(row).as("before"),
          org.apache.spark.sql.functions.struct(
            row.fieldNames.map(col).toSeq: _*).as("after"))) ++
        feedKeys(ChangeFeed.between(reads, 1L, 2L, Seq("k"))
          .select(col("op"), lit(2L).as("version"), col("before"), col("after")))
      assert(sunk() == expect,
        s"streamed feed must equal the manifest-derived feed; got ${sunk()}")
      // a live commit arrives as its own version feed, partition
      // values included
      Seq((3L, "c", "APAC")).toDF("k", "v", "region")
        .write.mode("append").insertInto("lkcfm.m.t")
      q.processAllAvailable()
      val expect3 = feedKeys(ChangeFeed.between(reads, 2L, 3L, Seq("k"))
        .select(col("op"), lit(3L).as("version"), col("before"), col("after")))
      assert(sunk() == expect ++ expect3)
      assert(expect3.exists(_._4.contains("APAC")),
        "identity partition values must ride the feed rows")
      q.stop()
      // the flat file tail rejects the manifest layout with a pointer
      val e = intercept[IllegalArgumentException](
        Catalog.readStreamTable(spark, "lkcfm.m.t"))
      assert(e.getMessage.contains("change feed"), e.getMessage)
    } finally {
      spark.conf.unset("spark.sql.catalog.lkcfm")
      spark.conf.unset("spark.sql.catalog.lkcfm.path")
    }
  }

  test("SPEC-EVOLVED manifest tables stream: versions before and after add_partition_field union positionally without misbinding") {
    // the r12 regression guard for the unconditional logical-order
    // projection in ManifestSnapshotReads: Spark places partition
    // columns LAST, so after add_partition_field promotes a
    // non-trailing data column, post-evolution snapshots would read
    // (…, promotedCol-last) while pre-evolution ones keep logical
    // order — and the change-feed source unions version feeds
    // POSITIONALLY
    val lake = Files.createTempDirectory("graft-lake-cfev")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkcfev", classOf[graft.catalog.GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkcfev.path", lake.toString)
    try {
      spark.sql(
        """CREATE TABLE lkcfev.m.t (k BIGINT, day STRING, region STRING)
          |PARTITIONED BY (region)
          |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      // s-1 under the old spec: `day` is a MIDDLE data column
      Seq((1L, "d1", "EU"), (2L, "d2", "US")).toDF("k", "day", "region")
        .write.mode("append").insertInto("lkcfev.m.t")
      spark.sql("CALL lkcfev.system.add_partition_field('m.t', 'day')")
      // s-2 under the new spec: `day` now rides the directory (LAST in
      // the physical read order)
      Seq((3L, "d1", "EU")).toDF("k", "day", "region")
        .write.mode("append").insertInto("lkcfev.m.t")

      val out = Files.createTempDirectory("cfev-out").toString
      val q = Catalog.readStreamTable(spark, "lkcfev.m.t", Seq("k"))
        .select(col("op"), col("version"),
          to_json(col("before")).as("b"), to_json(col("after")).as("a"))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation",
          Files.createTempDirectory("cfev-ck").toString)
        .start()
      q.processAllAvailable(); q.stop()
      val got = spark.read.parquet(out)
        .as[(String, Long, String, String)].collect().toSet
      // every row's after-struct must bind day/region to the RIGHT
      // fields in both the pre- and post-evolution versions
      assert(got.exists { case (op, v, _, a) =>
        op == "c" && v == 1L && a.contains("\"day\":\"d2\"") &&
          a.contains("\"region\":\"US\"") })
      assert(got.exists { case (op, v, _, a) =>
        op == "c" && v == 2L && a.contains("\"k\":3") &&
          a.contains("\"day\":\"d1\"") && a.contains("\"region\":\"EU\"") },
        s"post-evolution feed rows must bind promoted columns correctly, got $got")
    } finally {
      spark.conf.unset("spark.sql.catalog.lkcfev")
      spark.conf.unset("spark.sql.catalog.lkcfev.path")
    }
  }

  test("a tag-pinned retention HOLE fails loudly: a version whose recorded parent was expired never diffs against the wrong predecessor") {
    val lake = Files.createTempDirectory("graft-lake-cfhole")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkcfh", classOf[graft.catalog.GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkcfh.path", lake.toString)
    try {
      spark.sql(
        """CREATE TABLE lkcfh.m.t (k BIGINT, v STRING, g STRING)
          |PARTITIONED BY (g)
          |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      (1 to 3).foreach(i =>
        Seq((i.toLong, s"v$i", "x")).toDF("k", "v", "g")
          .write.mode("append").insertInto("lkcfh.m.t")) // s-1..s-3
      // pin s-0, expire to keep=1: retained [0, 3] with a HOLE (1, 2)
      spark.sql("CALL lkcfh.system.tag('m.t', 'genesis', 0)")
      spark.sql("CALL lkcfh.system.expire_snapshots('m.t', 1)")
      // r13: tag and expiry are themselves commits (s-4 = tag ref
      // state, s-5 = expire audit), and keep counts DATA history — so
      // keep=1 retains data s-3, the trailing ref commits, and the
      // pinned s-0, dropping the middle (the hole)
      assert(graft.catalog.ManifestSnapshotReads(
          spark, lake.resolve("m/t.parquet").toString)
        .versions == Seq(0L, 3L, 4L, 5L))
      // a fresh stream must FAIL on v=3 (its recorded parent s-2 is
      // gone) instead of silently diffing against s-0
      val q = Catalog.readStreamTable(spark, "lkcfh.m.t", Seq("k"))
        .writeStream.format("parquet")
        .option("path", Files.createTempDirectory("cfh-out").toString)
        .option("checkpointLocation",
          Files.createTempDirectory("cfh-ck").toString)
        .start()
      val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(30000)
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(err).exists(_.contains("committed against")),
        s"expected the retention-hole error, got: ${messages(err)}")
      q.stop()

      // ROUTINE trimming (no pinned hole) must keep streaming: drop
      // the tag, expire to the newest 1 — the earliest survivor's
      // parent is gone but NOTHING older is retained, so it emits as
      // the CDC initial load, not an error
      spark.sql("CALL lkcfh.system.drop_tag('m.t', 'genesis')")
      spark.sql("CALL lkcfh.system.expire_snapshots('m.t', 1)")
      val out2 = Files.createTempDirectory("cfh-out2").toString
      val q2 = Catalog.readStreamTable(spark, "lkcfh.m.t", Seq("k"))
        .writeStream.format("parquet")
        .option("path", out2)
        .option("checkpointLocation",
          Files.createTempDirectory("cfh-ck2").toString)
        .start()
      q2.processAllAvailable()
      val rows = spark.read.parquet(out2)
        .select("op").as[String].collect().toSeq
      assert(rows == Seq("c", "c", "c"),
        s"the earliest survivor must emit whole as inserts, got $rows")
      q2.stop()
    } finally {
      spark.conf.unset("spark.sql.catalog.lkcfh")
      spark.conf.unset("spark.sql.catalog.lkcfh.path")
    }
  }

  test("replay is bounded by snapshot retention: expiring past the checkpointed offset fails loudly, not silently divergent") {
    val lake = Files.createTempDirectory("graft-lake-cfexp")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkcfx", classOf[graft.catalog.GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkcfx.path", lake.toString)
    val tableDir = lake.resolve("m/t.parquet")
    val store = new StateStore(spark, tableDir.toString)
    def deleteRecursive(p: java.nio.file.Path): Unit = {
      val s = Files.walk(p)
      try scala.jdk.CollectionConverters.IteratorHasAsScala(
          s.sorted(java.util.Comparator.reverseOrder()).iterator()).asScala
        .foreach(Files.delete)
      finally s.close()
    }
    try {
      store.write(Seq((1L, "a")).toDF("k", "v"), 0L)
      store.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), 1L)
      val ckpt = Files.createTempDirectory("cfx-ck").toString
      val out = Files.createTempDirectory("cfx-out").toString
      def startStream() = Catalog.readStreamTable(spark, "lkcfx.m.t", Seq("k"))
        .select(col("op"), col("version"),
          to_json(col("before")).as("b"), to_json(col("after")).as("a"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt).start()
      val q1 = startStream()
      q1.processAllAvailable()
      q1.stop() // checkpointed offset: v=1
      // expire_snapshots drops v=0 and v=1; a new commit lands
      deleteRecursive(tableDir.resolve("v=0"))
      deleteRecursive(tableDir.resolve("v=1"))
      store.write(Seq((1L, "a9"), (2L, "b")).toDF("k", "v"), 2L)
      // restarting from the checkpoint needs v=2's diff against v=1 —
      // gone. The source must FAIL (the earliest survivor would
      // otherwise replay as whole-table inserts: silent divergence).
      val q2 = startStream()
      val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
        q2.awaitTermination(30000)
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(err).exists(m =>
          m.contains("expire_snapshots") || m.contains("earliest retained")),
        s"expected the retention-bound replay error, got: ${messages(err)}")
      q2.stop()
    } finally {
      spark.conf.unset("spark.sql.catalog.lkcfx")
      spark.conf.unset("spark.sql.catalog.lkcfx.path")
    }
  }
}

package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, to_json}

/** r12 change-feed hardening: flat `v=<n>` stores record commit
  * PARENTS (so a tag-pinned retention hole fails loudly on BOTH
  * layouts, not just manifest logs), and `maxVersionsPerTrigger`
  * paces catch-up into bounded micro-batches without changing the
  * feed's content. */
class ChangeFeedPacingSpec extends SparkSpec {
  import spark.implicits._

  private def feedKeys(df: DataFrame): Set[(String, Long, String, String)] =
    df.select(col("op"), col("version"),
        to_json(col("before")).as("b"), to_json(col("after")).as("a"))
      .as[(String, Long, String, String)].collect().toSet

  test("flat stores record parents; a tag-pinned retention hole fails loudly; routine trimming keeps streaming") {
    val dir = Files.createTempDirectory("graft-flat-parent").toString
    val store = new StateStore(spark, dir)
    (0L to 3L).foreach(v =>
      store.write(Seq((1L, s"a$v")).toDF("k", "v"), v))
    // parents recorded at write time; replay (re-write of v2) keeps
    // the ORIGINAL anchor instead of re-deriving from the listing
    assert(store.parentOf(0L).isEmpty)
    assert((1L to 3L).forall(v => store.parentOf(v).contains(v - 1L)))
    store.write(Seq((1L, "a2")).toDF("k", "v"), 2L) // idempotent replay
    assert(store.parentOf(2L).contains(1L))

    // HOLE: keep latest + a pinned v0, drop v1..v2 — v3's recorded
    // parent is gone while an OLDER snapshot survives; diffing against
    // the listing predecessor (v0) would re-derive a different
    // changeset, so the feed must refuse
    store.expire(keep = 1, pinned = Set(0L))
    assert(store.versions == Seq(0L, 3L))
    val out = Files.createTempDirectory("cfp-out").toString
    val q = spark.readStream.format("org.apache.spark.sql.graft.ChangeFeedSourceProvider")
      .option("path", dir).option("keys", "k").load()
      .select(col("op"), col("version"),
        to_json(col("before")).as("b"), to_json(col("after")).as("a"))
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation",
        Files.createTempDirectory("cfp-ck").toString)
      .start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    q.stop()
    assert(e.getCause != null &&
      String.valueOf(e.getCause.getMessage).contains("expire_snapshots"),
      s"hole must fail loudly, got: ${e.getCause}")

    // ROUTINE trimming (no pins): the earliest survivor replays as the
    // initial load — a fresh stream keeps working
    val dir2 = Files.createTempDirectory("graft-flat-trim").toString
    val store2 = new StateStore(spark, dir2)
    (0L to 3L).foreach(v =>
      store2.write(Seq((1L, s"a$v")).toDF("k", "v"), v))
    store2.expire(keep = 2)
    assert(store2.versions == Seq(2L, 3L))
    val out2 = Files.createTempDirectory("cfp-out2").toString
    val q2 = spark.readStream.format("org.apache.spark.sql.graft.ChangeFeedSourceProvider")
      .option("path", dir2).option("keys", "k").load()
      .select(col("op"), col("version"),
        to_json(col("before")).as("b"), to_json(col("after")).as("a"))
      .writeStream.format("parquet")
      .option("path", out2)
      .option("checkpointLocation",
        Files.createTempDirectory("cfp-ck2").toString)
      .start()
    q2.processAllAvailable(); q2.stop()
    val got = spark.read.parquet(out2)
      .as[(String, Long, String, String)].collect().toSeq
    // v2 whole as inserts (initial load), then the v2→v3 diff
    assert(got.count(_._2 == 2L) == 1 && got.exists(_._2 == 3L),
      s"routine trim must stream initial-load + diff, got $got")
  }

  test("maxVersionsPerTrigger paces catch-up into bounded micro-batches with identical content") {
    val dir = Files.createTempDirectory("graft-flat-pace").toString
    val store = new StateStore(spark, dir)
    (0L to 5L).foreach(v =>
      store.write(Seq((1L, s"a$v"), (2L, "b")).toDF("k", "v"), v))

    def run(pace: Option[Int]): (Set[(String, Long, String, String)], Int) = {
      val out = Files.createTempDirectory("cfp-pace-out").toString
      val reader = spark.readStream.format("org.apache.spark.sql.graft.ChangeFeedSourceProvider")
        .option("path", dir).option("keys", "k")
      val q = pace.fold(reader)(p =>
          reader.option("maxVersionsPerTrigger", p.toString))
        .load()
        .select(col("op"), col("version"),
          to_json(col("before")).as("b"), to_json(col("after")).as("a"))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation",
          Files.createTempDirectory("cfp-pace-ck").toString)
        .start()
      q.processAllAvailable()
      val batches = q.recentProgress.count(_.numInputRows > 0)
      q.stop()
      (spark.read.parquet(out)
        .as[(String, Long, String, String)].collect().toSet, batches)
    }
    val (unpaced, unpacedBatches) = run(None)
    val (paced, pacedBatches) = run(Some(2))
    assert(paced == unpaced,
      "pacing must not change the feed's content")
    assert(pacedBatches >= 3,
      s"6 versions at 2/trigger need >= 3 non-empty batches, got $pacedBatches")
    assert(pacedBatches > unpacedBatches,
      s"paced run must slice finer than unpaced ($pacedBatches vs $unpacedBatches)")
  }

  test("a paced stream restarted from a cleanly committed checkpoint never re-delivers versions") {
    // the r12 advisory bug: on a CLEAN restart Spark replays no batch
    // before getOffset, so an in-memory pacing floor reset to
    // earliest-1, the source offered an offset BELOW the committed
    // one, and subsequent paced batches re-delivered already-emitted
    // versions. The floor now persists under the source's checkpoint
    // metadata dir, so the first post-restart offer resumes from it.
    val dir = Files.createTempDirectory("graft-pace-restart").toString
    val store = new StateStore(spark, dir)
    (0L to 4L).foreach(v =>
      store.write(Seq((1L, s"a$v"), (2L, "b")).toDF("k", "v"), v))

    val out = Files.createTempDirectory("cfp-restart-out").toString
    val ck = Files.createTempDirectory("cfp-restart-ck").toString
    def run(): Unit = {
      val q = spark.readStream
        .format("org.apache.spark.sql.graft.ChangeFeedSourceProvider")
        .option("path", dir).option("keys", "k")
        .option("maxVersionsPerTrigger", "2")
        .load()
        .select(col("op"), col("version"),
          to_json(col("before")).as("b"), to_json(col("after")).as("a"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .start()
      q.processAllAvailable(); q.stop()
    }
    run()
    val firstRows = spark.read.parquet(out)
      .as[(String, Long, String, String)].collect().toSeq
    assert(firstRows.map(_._2).distinct.sorted == (0L to 4L),
      s"first run must cover every version once, got $firstRows")

    // restart with NO new versions: zero new rows
    run()
    val afterIdle = spark.read.parquet(out)
      .as[(String, Long, String, String)].collect().toSeq
    assert(afterIdle.size == firstRows.size,
      s"clean idle restart re-delivered ${afterIdle.size - firstRows.size} rows")

    // commit more versions, restart: exactly the NEW versions arrive,
    // each exactly once
    (5L to 8L).foreach(v =>
      store.write(Seq((1L, s"a$v"), (2L, "b")).toDF("k", "v"), v))
    run()
    val finalRows = spark.read.parquet(out)
      .as[(String, Long, String, String)].collect().toSeq
    assert(finalRows.map(_._2).distinct.sorted == (0L to 8L),
      "restart must deliver the new versions")
    val dupes = finalRows.groupBy(identity).filter(_._2.size > 1)
    assert(dupes.isEmpty, s"restart re-delivered feed rows: ${dupes.keys}")
  }
}

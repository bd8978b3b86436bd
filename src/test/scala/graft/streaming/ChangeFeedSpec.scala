package graft.streaming

import graft.SparkSpec
import graft.cdc.Upsert
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Change-data-feed laws: classified ops, unchanged keys dropped, and
  * the round trip apply(v_from, feed) == v_to. */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private val v0 = Seq(
    (1L, "alice", 10),
    (2L, "bob", 20),
    (3L, "carol", 30))
  private val v1 = Seq(
    (1L, "alice", 10),     // unchanged
    (2L, "bob", 25),       // updated
    (4L, "dave", 40))      // inserted; carol deleted

  test("diff classifies inserts, updates, deletes; unchanged keys drop") {
    val feed = ChangeFeed.diff(
      v0.toDF("id", "name", "score"), v1.toDF("id", "name", "score"), Seq("id"))
    val byOp = feed.collect().groupBy(_.getString(0))
    assert(byOp("c").map(_.getStruct(2).getLong(0)).toSeq == Seq(4L))
    assert(byOp("d").map(_.getStruct(1).getLong(0)).toSeq == Seq(3L))
    assert(byOp("u").map(_.getStruct(2).getLong(0)).toSeq == Seq(2L))
    assert(byOp("u").head.getStruct(2).getInt(2) == 25)
    assert(feed.count() == 3, "unchanged key 1 must not appear")
  }

  test("round trip: applying the feed to the from-snapshot yields the to-snapshot") {
    val a = v0.toDF("id", "name", "score")
    val b = v1.toDF("id", "name", "score")
    val feed = ChangeFeed.diff(a, b, Seq("id")).withColumn("ts_ms", lit(1L))
    val rebuilt = Upsert.applyChangelog(Some(a), feed, Seq("id"))
    assert(rebuilt.collect().map(_.toSeq).toSet == b.collect().map(_.toSeq).toSet)
  }

  test("between: feed across committed StateStore versions") {
    val dir = Files.createTempDirectory("graft-cdf").toString
    val store = new StateStore(spark, dir)
    store.write(v0.toDF("id", "name", "score"), 0L)
    store.write(v1.toDF("id", "name", "score"), 1L)
    val feed = ChangeFeed.between(store, 0L, 1L, Seq("id"))
    assert(feed.collect().map(_.getString(0)).sorted.toSeq == Seq("c", "d", "u"))
    intercept[IllegalArgumentException] {
      ChangeFeed.between(store, 0L, 9L, Seq("id"))
    }
  }

  test("tableChanges(from, to): the batch range feed reconstructs the to-snapshot and matches per-version diffs") {
    val v2 = Seq((2L, "bob", 26), (4L, "dave", 40), (5L, "erin", 50))
    val dir = Files.createTempDirectory("graft-cdf-range").toString
    val store = new StateStore(spark, dir)
    store.write(v0.toDF("id", "name", "score"), 0L)
    store.write(v1.toDF("id", "name", "score"), 1L)
    store.write(v2.toDF("id", "name", "score"), 2L)
    val feed = ChangeFeed.tableChanges(store, 0L, 2L, Seq("id"))
    // per-version granularity: the range feed IS the concatenation of
    // the per-version diffs, version column attached
    assert(feed.select("version").as[Long].collect().toSet == Set(1L, 2L))
    // reconstruction law: apply the range feed (version as the replay
    // order) to the from-snapshot → the to-snapshot, exactly
    val rebuilt = Upsert.applyChangelog(
      Some(v0.toDF("id", "name", "score")),
      feed.select(col("op"), col("before"), col("after"),
        col("version").as("ts_ms")),
      Seq("id"))
    assert(rebuilt.collect().map(_.toSeq).toSet ==
      v2.toDF("id", "name", "score").collect().map(_.toSeq).toSet)
    // an empty range is an empty feed with the right schema
    val empty = ChangeFeed.tableChanges(store, 2L, 2L, Seq("id"))
    assert(empty.isEmpty && empty.columns.toSeq ==
      Seq("op", "version", "before", "after"))
    // a from BELOW the earliest retained version streams the initial
    // load (earliest survivor as inserts) — same as the stream
    val full = ChangeFeed.tableChanges(store, -1L, 2L, Seq("id"))
    assert(full.where("version = 0 AND op = 'c'").count() == 3L)
  }
}

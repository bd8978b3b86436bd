package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Exactly-once = checkpoint + idempotent versioned sink (SURVEY §7e):
  * kill the query, restart from the same checkpoint + state dirs, and
  * the MV neither loses nor double-applies changes. */
class RecoverySpec extends SparkSpec {
  import CdcPipeline._
  import spark.implicits._

  private val ticketSchema = StructType(Seq(
    StructField("ticket_id", LongType), StructField("movie_id", LongType),
    StructField("user_id", LongType), StructField("cost", DecimalType(10, 2)),
    StructField("status", StringType), StructField("purchased_at", TimestampType)))
  private val movieSchema = StructType(Seq(
    StructField("movie_id", LongType), StructField("title", StringType),
    StructField("start_date", TimestampType), StructField("duration_minutes", IntegerType)))
  private def specs = Seq(
    TableSpec("tickets", ticketSchema, Seq("ticket_id"), dist = Seq("movie_id")),
    TableSpec("movies", movieSchema, Seq("movie_id")))

  private def ticket(id: Long, cost: String, status: String) =
    s"""{"ticket_id":$id,"movie_id":1,"user_id":1,"cost":$cost,"status":"$status","purchased_at":"2026-01-01T00:00:00"}"""

  test("kill-and-restart: state and MV survive, no double counting") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-recovery").toString

    val mem1 = MemoryStream[CdcRecord]
    val h1 = CdcPipeline.start(spark, mem1.toDF(), specs,
      s"$dir/state", s"$dir/ckpt", Trigger.ProcessingTime(0))
    mem1.addData(
      CdcRecord("movies", "c", 1, null,
        """{"movie_id":1,"title":"Solo","start_date":"2026-02-01T00:00:00","duration_minutes":90}"""),
      CdcRecord("tickets", "c", 2, null, ticket(1, "10.00", "scheduled")),
      CdcRecord("tickets", "c", 2, null, ticket(2, "5.00", "scheduled")))
    h1.query.processAllAvailable()
    h1.query.stop() // kill

    // restart against the same checkpoint + state; new source instance
    val mem2 = MemoryStream[CdcRecord]
    val h2 = CdcPipeline.start(spark, mem2.toDF(), specs,
      s"$dir/state", s"$dir/ckpt2", Trigger.ProcessingTime(0))
    try {
      mem2.addData(
        CdcRecord("tickets", "u", 3, ticket(1, "10.00", "scheduled"),
          ticket(1, "10.00", "live")))
      h2.query.processAllAvailable()
      val mv = h2.mv().get.collect().head
      assert(BigDecimal(mv.getDecimal(mv.fieldIndex("total_revenue"))) == BigDecimal("15.00"))
      assert(mv.getLong(mv.fieldIndex("ticket_count")) == 2)     // not re-applied
      assert(mv.getLong(mv.fieldIndex("live_tickets")) == 1)
      assert(mv.getLong(mv.fieldIndex("scheduled_tickets")) == 1)
    } finally h2.query.stop()
  }

  test("replaying an already-committed batch version is a no-op overwrite") {
    val dir = Files.createTempDirectory("graft-idem").toString
    val store = new StateStore(spark, s"$dir/t")
    import spark.implicits._
    store.write(Seq((1L, "a")).toDF("k", "v"), version = 7)
    store.write(Seq((1L, "a")).toDF("k", "v"), version = 7) // failure replay
    assert(store.latestVersion.contains(7L))
    assert(store.read().get.count() == 1)
  }

  test("time travel: VERSION AS OF and TIMESTAMP AS OF over commit history") {
    val dir = Files.createTempDirectory("graft-tt").toString
    val store = new StateStore(spark, s"$dir/t")
    import spark.implicits._
    store.write(Seq((1L, "old")).toDF("k", "v"), version = 0)
    Thread.sleep(1100)                       // separate the commit mtimes
    val betweenCommits = System.currentTimeMillis()
    Thread.sleep(1100)
    store.write(Seq((1L, "new"), (2L, "row")).toDF("k", "v"), version = 1)

    assert(store.versions == Seq(0L, 1L))
    // by version: the historical snapshot is intact after the new commit
    assert(store.read(0L).get.as[(Long, String)].collect().toSeq == Seq((1L, "old")))
    assert(store.read(1L).get.count() == 2)
    assert(store.read(99L).isEmpty)
    // by timestamp: a point between the commits resolves to v0,
    // now resolves to v1, before history resolves to nothing
    assert(store.readAsOf(betweenCommits).get.as[(Long, String)]
      .collect().toSeq == Seq((1L, "old")))
    assert(store.readAsOf(System.currentTimeMillis()).get.count() == 2)
    assert(store.readAsOf(0L).isEmpty)
    // expire drops v0 from history; time travel reports it gone
    store.expire(keep = 1)
    assert(store.versions == Seq(1L))
    assert(store.read(0L).isEmpty)
  }

  test("compact rewrites the snapshot as one file in a new version") {
    val dir = Files.createTempDirectory("graft-compact").toString
    val store = new StateStore(spark, s"$dir/t")
    import spark.implicits._
    store.write((1L to 100L).map(i => (i, s"r$i")).toDF("k", "v")
      .repartition(16), version = 3)               // 16 small part files
    store.compact(targetFiles = 1)
    assert(store.latestVersion.contains(4L))
    assert(store.read().get.count() == 100)
    val parts = new java.io.File(s"$dir/t/v=4").list()
      .count(f => f.startsWith("part-"))
    assert(parts == 1, s"expected 1 compacted file, got $parts")
    // the pre-compaction snapshot is still time-travelable until expiry
    assert(store.read(3L).get.count() == 100)
  }

  test("purgeKeys: compliance delete pierces time travel, history shape intact") {
    val dir = Files.createTempDirectory("graft-purge").toString
    val store = new StateStore(spark, s"$dir/t")
    import spark.implicits._
    store.write(Seq((1L, "alice"), (2L, "bob"), (3L, "carol"))
      .toDF("user_id", "name"), version = 1)
    store.write(Seq((1L, "alice2"), (2L, "bob"), (4L, "dan"))
      .toDF("user_id", "name"), version = 2)
    val stampBefore = store.commitTimeMs(1L)
    val removed = store.purgeKeys("user_id", Seq(1L))
    assert(removed == 2L, "one row per version carried the subject")
    // the subject is unreadable at EVERY version — time travel included
    Seq(1L, 2L).foreach { v =>
      val names = store.read(v).get.select("user_id")
        .as[Long].collect().toSet
      assert(!names.contains(1L), s"v$v still exposes the purged key")
    }
    // other rows, version numbering and commit stamps are untouched
    assert(store.read(1L).get.count() == 2 && store.read(2L).get.count() == 2)
    assert(store.versions == Seq(1L, 2L))
    assert(store.commitTimeMs(1L) == stampBefore,
      "purge must not re-stamp history (readAsOf resolution would shift)")
    // idempotent: purging an absent key changes nothing
    assert(store.purgeKeys("user_id", Seq(1L)) == 0L)
  }
}

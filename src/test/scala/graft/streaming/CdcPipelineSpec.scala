package graft.streaming

import graft.SparkSpec
import graft.operators.Revenue
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import java.nio.file.Files

/** End-to-end streaming test (SURVEY §5.4): replay the gen_data.py
  * event mix — inserts plus scheduled→live→finished status UPDATEs
  * (gen_data.py:171-200) — through the full CDC→staging→MV pipeline and
  * assert the MV equals a batch recomputation over final state
  * (stream/batch equivalence). */
class CdcPipelineSpec extends SparkSpec {
  import CdcPipeline._
  import spark.implicits._

  private val ticketSchema = StructType(Seq(
    StructField("ticket_id", LongType), StructField("movie_id", LongType),
    StructField("user_id", LongType), StructField("cost", DecimalType(10, 2)),
    StructField("status", StringType), StructField("purchased_at", TimestampType)))
  private val movieSchema = StructType(Seq(
    StructField("movie_id", LongType), StructField("title", StringType),
    StructField("start_date", TimestampType), StructField("duration_minutes", IntegerType)))

  private def ticket(id: Long, movie: Long, cost: String, status: String) =
    s"""{"ticket_id":$id,"movie_id":$movie,"user_id":1,"cost":$cost,
       |"status":"$status","purchased_at":"2026-01-01T00:00:0$id"}""".stripMargin.replace("\n", "")
  private def movie(id: Long, title: String) =
    s"""{"movie_id":$id,"title":"$title","start_date":"2026-02-01T00:00:00","duration_minutes":120}"""

  test("changelog replay: staging upsert, MV retraction on status flip and movie rename") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-cdc").toString
    val mem = MemoryStream[CdcRecord]
    val tables = Seq(
      TableSpec("tickets", ticketSchema, Seq("ticket_id"), dist = Seq("movie_id")),
      TableSpec("movies", movieSchema, Seq("movie_id")),
      TableSpec("users", movieSchema /*unused*/ , Seq("movie_id")))
    val h = CdcPipeline.start(spark, mem.toDF(), tables.take(2),
      s"$dir/state", s"$dir/ckpt", Trigger.ProcessingTime(0))

    try {
      // trigger 1: snapshot inserts
      mem.addData(
        CdcRecord("movies", "c", 1, null, movie(10, "Alpha")),
        CdcRecord("movies", "c", 1, null, movie(20, "Beta")),
        CdcRecord("tickets", "c", 2, null, ticket(1, 10, "10.00", "scheduled")),
        CdcRecord("tickets", "c", 2, null, ticket(2, 10, "14.00", "scheduled")),
        CdcRecord("tickets", "c", 2, null, ticket(3, 20, "8.00", "live")))
      h.query.processAllAvailable()

      val mv1 = h.mv().get.as[MvRow].collect().map(r => r.movie_id -> r).toMap
      assert(mv1(10L).scheduled_tickets == 2 && mv1(10L).total_revenue == BigDecimal("24.00"))
      assert(mv1(20L).live_tickets == 1)

      // trigger 2: status transition + movie rename + a delete
      mem.addData(
        CdcRecord("tickets", "u", 3, ticket(1, 10, "10.00", "scheduled"),
          ticket(1, 10, "10.00", "live")),
        CdcRecord("movies", "u", 3, movie(10, "Alpha"), movie(10, "AlphaRenamed")),
        CdcRecord("tickets", "d", 4, ticket(3, 20, "8.00", "live"), null))
      h.query.processAllAvailable()

      val mv2 = h.mv().get.as[MvRow].collect().map(r => r.movie_id -> r).toMap
      // retraction: old scheduled bucket decremented, live incremented
      assert(mv2(10L).scheduled_tickets == 1 && mv2(10L).live_tickets == 1)
      assert(mv2(10L).total_revenue == BigDecimal("24.00"))
      assert(mv2(10L).movie_title == "AlphaRenamed")
      // deleted ticket removed its movie's only row from the inner join
      assert(!mv2.contains(20L))

      // stream/batch equivalence: MV == batch recompute over final state
      val batchMv = Revenue.movieRevenue(
        h.staging("tickets").get, h.staging("movies").get)
      val stream = h.mv().get.collect().map(_.toSeq).toSet
      val batch = batchMv.collect().map(_.toSeq).toSet
      assert(stream == batch)
    } finally h.query.stop()
  }

  test("fact re-assignment across dimension keys retracts old and credits new movie") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-cdc-move").toString
    val mem = MemoryStream[CdcRecord]
    val h = CdcPipeline.start(spark, mem.toDF(), Seq(
      TableSpec("tickets", ticketSchema, Seq("ticket_id"), dist = Seq("movie_id")),
      TableSpec("movies", movieSchema, Seq("movie_id"))),
      s"$dir/state", s"$dir/ckpt", Trigger.ProcessingTime(0), buckets = 8)
    try {
      mem.addData(
        CdcRecord("movies", "c", 1, null, movie(1, "A")),
        CdcRecord("movies", "c", 1, null, movie(2, "B")),
        CdcRecord("tickets", "c", 2, null, ticket(7, 1, "10.00", "scheduled")))
      h.query.processAllAvailable()
      // the ticket moves from movie 1 to movie 2 (cross-bucket move)
      mem.addData(CdcRecord("tickets", "u", 3,
        ticket(7, 1, "10.00", "scheduled"), ticket(7, 2, "10.00", "scheduled")))
      h.query.processAllAvailable()
      val mv = h.mv().get.as[MvRow].collect().map(r => r.movie_id -> r).toMap
      assert(!mv.contains(1L), s"old movie kept the moved ticket: $mv")
      assert(mv(2L).ticket_count == 1 && mv(2L).total_revenue == BigDecimal("10.00"))
      // staging holds exactly one row for the ticket, under the new movie
      val staged = h.staging("tickets").get.as[
        (Long, Long, Long, BigDecimal, String, java.sql.Timestamp)].collect()
      assert(staged.map(_._1).toSeq == Seq(7L) && staged.head._2 == 2L)
    } finally h.query.stop()
  }

  test("partial-update and aggregation merge engines at the staging sink") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-cdc-engines").toString
    val mem = MemoryStream[CdcRecord]
    val profileSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("email", StringType),
      StructField("phone", StringType)))
    val meterSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("spend_cents", LongType),
      StructField("n_events", LongType)))
    val h = CdcPipeline.start(spark, mem.toDF(), Seq(
      TableSpec("profiles", profileSchema, Seq("user_id"),
        engine = MergeEngine.PartialUpdate),
      TableSpec("meters", meterSchema, Seq("user_id"),
        engine = MergeEngine.Aggregation(
          Seq("spend_cents" -> "sum", "n_events" -> "count")))),
      s"$dir/state", s"$dir/ckpt", Trigger.ProcessingTime(0))
    def profile(u: Long, email: String, phone: String) = {
      def f(k: String, v: String) = if (v == null) s""""$k":null""" else s""""$k":"$v""""
      s"""{"user_id":$u,${f("email", email)},${f("phone", phone)}}"""
    }
    def meter(u: Long, cents: Long) =
      s"""{"user_id":$u,"spend_cents":$cents,"n_events":1}"""
    try {
      // trigger 1: sparse creates from two sources
      mem.addData(
        CdcRecord("profiles", "c", 1, null, profile(1, "a@x", null)),
        CdcRecord("profiles", "c", 1, null, profile(2, null, "555")),
        CdcRecord("meters", "c", 1, null, meter(1, 100)),
        CdcRecord("meters", "c", 1, null, meter(1, 250)))
      h.query.processAllAvailable()
      // trigger 2: sparse update must NOT null out the other column;
      // meters keep folding
      mem.addData(
        CdcRecord("profiles", "u", 2, profile(1, "a@x", null), profile(1, null, "777")),
        CdcRecord("meters", "c", 2, null, meter(1, 50)),
        CdcRecord("meters", "c", 2, null, meter(2, 10)))
      h.query.processAllAvailable()
      val profiles = h.staging("profiles").get
        .as[(Long, Option[String], Option[String])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      // email survived the sparse update; phone arrived from it
      assert(profiles(1L) == ((Some("a@x"), Some("777"))), profiles.toString)
      assert(profiles(2L) == ((None, Some("555"))), profiles.toString)
      val meters = h.staging("meters").get
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(meters == Map(1L -> ((400L, 3L)), 2L -> ((10L, 1L))), meters.toString)
    } finally h.query.stop()
  }
  test("aggregation engine does not double-count when a committed batch replays") {
    // the exactly-once crash window: the sink commit for batch 0
    // succeeded but the checkpoint commit record did not — foreachBatch
    // re-delivers batch 0 on restart. Deleting ckpt/commits/0 after a
    // clean stop reproduces that window deterministically.
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-cdc-replay").toString
    val meterSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("spend_cents", LongType),
      StructField("n_events", LongType)))
    val tables = Seq(TableSpec("meters", meterSchema, Seq("user_id"),
      engine = MergeEngine.Aggregation(
        Seq("spend_cents" -> "sum", "n_events" -> "count"))))
    def meter(u: Long, cents: Long) =
      s"""{"user_id":$u,"spend_cents":$cents,"n_events":1}"""
    val mem = MemoryStream[CdcRecord]
    val h1 = CdcPipeline.start(spark, mem.toDF(), tables,
      s"$dir/state", s"$dir/ckpt", Trigger.ProcessingTime(0))
    mem.addData(
      CdcRecord("meters", "c", 1, null, meter(1, 100)),
      CdcRecord("meters", "c", 1, null, meter(1, 250)))
    h1.query.processAllAvailable()
    h1.query.stop()
    assert(new java.io.File(s"$dir/ckpt/commits/0").delete(),
      "expected a batch-0 commit record to remove")
    new java.io.File(s"$dir/ckpt/commits/.0.crc").delete() // local-FS sidecar

    val h2 = CdcPipeline.start(spark, mem.toDF(), tables,
      s"$dir/state", s"$dir/ckpt", Trigger.ProcessingTime(0))
    try {
      h2.query.processAllAvailable()   // replays batch 0; ledger skips it
      val meters = h2.staging("meters").get
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(meters == Map(1L -> ((350L, 2L))), s"double-counted: $meters")
      // new data after the replay still applies
      mem.addData(CdcRecord("meters", "c", 2, null, meter(1, 50)))
      h2.query.processAllAvailable()
      val after = h2.staging("meters").get
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(after == Map(1L -> ((400L, 3L))), after.toString)
    } finally h2.query.stop()
  }

  test("retractable aggregation engine consumes the full c/u/d changelog") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-cdc-retract").toString
    val meterSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("spend_cents", LongType),
      StructField("n_events", LongType)))
    val mem = MemoryStream[CdcRecord]
    val h = CdcPipeline.start(spark, mem.toDF(), Seq(
      TableSpec("meters", meterSchema, Seq("user_id"),
        engine = MergeEngine.Aggregation(
          Seq("spend_cents" -> "sum", "n_events" -> "count"), retract = true))),
      s"$dir/state", s"$dir/ckpt", Trigger.ProcessingTime(0))
    def meter(u: Long, cents: Long) =
      s"""{"user_id":$u,"spend_cents":$cents,"n_events":1}"""
    try {
      mem.addData(
        CdcRecord("meters", "c", 1, null, meter(1, 100)),
        CdcRecord("meters", "c", 1, null, meter(1, 250)),
        CdcRecord("meters", "c", 1, null, meter(2, 10)))
      h.query.processAllAvailable()
      // an update revises a contribution; a delete retracts one
      mem.addData(
        CdcRecord("meters", "u", 2, meter(1, 250), meter(1, 500)),
        CdcRecord("meters", "d", 2, meter(2, 10), null))
      h.query.processAllAvailable()
      val meters = h.staging("meters").get
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(meters == Map(1L -> ((600L, 2L)), 2L -> ((0L, 0L))), meters.toString)
    } finally h.query.stop()
  }
}

case class MvRow(movie_id: Long, movie_title: String, total_revenue: BigDecimal,
                 ticket_count: Long, avg_ticket_price: BigDecimal,
                 scheduled_tickets: Long, live_tickets: Long, finished_tickets: Long,
                 scheduled_revenue: BigDecimal, live_revenue: BigDecimal,
                 finished_revenue: BigDecimal,
                 start_date: java.sql.Timestamp, duration_minutes: Int,
                 last_ticket_purchased: java.sql.Timestamp)

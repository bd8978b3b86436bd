package graft.sources

import graft.SparkSpec
import graft.streaming.CdcPipeline
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** File-landed changelog → snapshot + incremental stream → pipeline:
  * the full CDC source path (snapshot phase staged as +I records, then
  * change files picked up incrementally). */
class CdcSourceSpec extends SparkSpec {
  import spark.implicits._

  private val ticketSchema = StructType(Seq(
    StructField("ticket_id", LongType), StructField("movie_id", LongType),
    StructField("user_id", LongType), StructField("cost", DecimalType(10, 2)),
    StructField("status", StringType), StructField("purchased_at", TimestampType)))
  private val movieSchema = StructType(Seq(
    StructField("movie_id", LongType), StructField("title", StringType),
    StructField("start_date", TimestampType), StructField("duration_minutes", IntegerType)))

  test("fromWire decodes any payload-column transport into the wire schema") {
    // mock Kafka-shaped frame: binary value column carrying the JSON
    // change record — the same decode must serve kafka/kinesis/text
    val raw = Seq(
      """{"table":"tickets","op":"u","ts_ms":9,"seq":41,"before":null,"after":"{\"ticket_id\":1}"}""",
      """{"table":"movies","op":"c","ts_ms":3,"before":null,"after":"{\"movie_id\":7}"}""")
      .toDF("value").select($"value".cast("binary").as("value"))
    val wire = CdcSource.fromWire(raw)
    assert(wire.columns.toSeq ==
      Seq("table", "op", "ts_ms", "seq", "before", "after"))
    val rows = wire.orderBy("table").collect()
    assert(rows(0).getString(0) == "movies" && rows(0).isNullAt(3))
    assert(rows(1).getString(0) == "tickets" && rows(1).getLong(3) == 41L)
    // and the downstream envelope keeps the seq for tie-breaking
    val envCols = CdcSource.jsonEnvelope(wire, "tickets",
      StructType(Seq(StructField("ticket_id", LongType)))).columns.toSeq
    assert(envCols == Seq("op", "ts_ms", "seq", "before", "after"))
  }

  test("verbatim Debezium envelope decodes and drives the pipeline to correct state") {
    val dir = Files.createTempDirectory("graft-dbz").toString
    val changelog = s"$dir/changelog"
    Files.createDirectories(Paths.get(changelog))
    // verbatim Debezium-for-Postgres frames (schemas disabled), as the
    // reference's connector topic would carry them: snapshot read (r),
    // insert (c), and two same-millisecond updates where only the LSN
    // orders them — plus a transaction marker that must be dropped
    def src(table: String, lsn: Long) =
      s""""source":{"version":"2.5.0","connector":"postgresql","name":"pg","ts_ms":1706000000000,"db":"moviedb","schema":"public","table":"$table","lsn":$lsn,"txId":700}"""
    val frames = Seq(
      s"""{"payload":{"before":null,"after":{"movie_id":1,"title":"Solo","start_date":"2026-02-01T00:00:00","duration_minutes":90},${src("movies", 100)},"op":"r","ts_ms":1706000001000}}""",
      s"""{"payload":{"before":null,"after":{"ticket_id":1,"movie_id":1,"user_id":5,"cost":10.00,"status":"scheduled","purchased_at":"2026-01-01T00:00:00"},${src("tickets", 101)},"op":"c","ts_ms":1706000002000}}""",
      // same ts_ms, LSN decides: live(lsn=103) is newer than finished(lsn=102)... order shuffled on the wire
      s"""{"payload":{"before":null,"after":{"ticket_id":1,"movie_id":1,"user_id":5,"cost":10.00,"status":"live","purchased_at":"2026-01-01T00:00:00"},${src("tickets", 103)},"op":"u","ts_ms":1706000003000}}""",
      s"""{"payload":{"before":null,"after":{"ticket_id":1,"movie_id":1,"user_id":5,"cost":10.00,"status":"finished","purchased_at":"2026-01-01T00:00:00"},${src("tickets", 102)},"op":"u","ts_ms":1706000003000}}""",
      """{"payload":{"op":"m","ts_ms":1706000004000}}""")
    Files.writeString(Paths.get(s"$changelog/topic.txt"), frames.mkString("\n"))

    // batch-decode sanity: flat wire shape, lsn→seq, r→c, marker dropped
    val wire = CdcSource.fromDebezium(
      spark.read.text(changelog).withColumnRenamed("value", "value"))
    assert(wire.columns.toSeq == Seq("table", "op", "ts_ms", "seq", "before", "after"))
    val decoded = wire.orderBy("seq").collect()
    assert(decoded.length == 4, "transaction marker must be dropped")
    assert(decoded(0).getString(1) == "c", "snapshot read normalizes to insert")
    assert(decoded(0).getLong(3) == 100L)
    assert(decoded(2).getString(5).contains("\"status\":\"finished\""),
      s"after image must survive as raw JSON: ${decoded(2)}")

    // end-to-end: the streamed envelope lands correct staging + MV state
    val h = CdcPipeline.start(spark,
      CdcSource.fromDebezium(spark.readStream.text(changelog)),
      Seq(CdcPipeline.TableSpec("tickets", ticketSchema, Seq("ticket_id"), dist = Seq("movie_id")),
        CdcPipeline.TableSpec("movies", movieSchema, Seq("movie_id"))),
      s"$dir/state", s"$dir/ckpt", Trigger.AvailableNow())
    try {
      h.query.awaitTermination(120000)
      val t = h.staging("tickets").get.collect().head
      assert(t.getString(t.fieldIndex("status")) == "live",
        s"LSN must order same-millisecond updates: $t")
      val mv = h.mv().get.collect().head
      assert(mv.getLong(mv.fieldIndex("live_tickets")) == 1)
      assert(mv.getLong(mv.fieldIndex("finished_tickets")) == 0)
    } finally h.query.stop()
  }

  test("structured Debezium JSON dir: multi-trigger stream, MV equals batch recompute") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-dbzjson").toString
    val changelog = s"$dir/changelog"
    Files.createDirectories(Paths.get(changelog))
    def src(table: String, lsn: Long) =
      s""""source":{"version":"2.5.0","connector":"postgresql","name":"pg","ts_ms":1706000000000,"db":"moviedb","schema":"public","table":"$table","lsn":$lsn,"txId":700}"""
    def movie(id: Long, lsn: Long) =
      s"""{"payload":{"before":null,"after":{"movie_id":$id,"title":"m$id","start_date":"2026-02-01T00:00:00","duration_minutes":90},${src("movies", lsn)},"op":"r","ts_ms":1706000001000}}"""
    def ticket(id: Long, movieId: Long, status: String, op: String, lsn: Long) =
      s"""{"payload":{"before":null,"after":{"ticket_id":$id,"movie_id":$movieId,"user_id":${id % 7},"cost":12.50,"status":"$status","purchased_at":"2026-01-01T00:00:00"},${src("tickets", lsn)},"op":"$op","ts_ms":${1706000002000L + lsn}}}"""
    // three files = three micro-batches at maxFilesPerTrigger=1: the
    // snapshot, a burst of inserts, then cross-file status updates
    Files.writeString(Paths.get(s"$changelog/00-snapshot.json"),
      (Seq(movie(1, 10), movie(2, 11)) ++
        (1L to 6L).map(i => ticket(i, 1 + i % 2, "scheduled", "c", 20 + i))).mkString("\n"))
    Files.writeString(Paths.get(s"$changelog/01-burst.json"),
      (7L to 10L).map(i => ticket(i, 1 + i % 2, "scheduled", "c", 40 + i)).mkString("\n"))
    Files.writeString(Paths.get(s"$changelog/02-updates.json"),
      (Seq(1L, 3L, 8L).map(i => ticket(i, 1 + i % 2, "live", "u", 60 + i)) :+
        ticket(4, 1, "finished", "u", 70)).mkString("\n"))

    val h = CdcPipeline.start(spark,
      graft.sources.CdcSource.fromDebeziumJsonDir(spark, changelog, maxFilesPerTrigger = 1),
      Seq(CdcPipeline.TableSpec("tickets", ticketSchema, Seq("ticket_id"), dist = Seq("movie_id")),
        CdcPipeline.TableSpec("movies", movieSchema, Seq("movie_id"))),
      s"$dir/state", s"$dir/ckpt", Trigger.AvailableNow())
    try {
      h.query.awaitTermination(120000)
      assert(h.query.recentProgress.length >= 3,
        s"expected one micro-batch per file, got ${h.query.recentProgress.length}")

      // batch recompute from the SAME files: wire decode -> per-table
      // envelope -> empty-state changelog fold -> the same MV SQL. The
      // streamed MV (incremental bucket-local refresh across triggers)
      // must equal this single-shot derivation row-for-row.
      val wire = graft.sources.CdcSource.fromDebeziumStruct(
        spark.read.schema(graft.sources.CdcSource.debeziumSchema).json(changelog))
      val tickets = graft.cdc.Upsert.applyChangelog(None,
        graft.sources.CdcSource.jsonEnvelope(wire, "tickets", ticketSchema),
        Seq("ticket_id"))
      val movies = graft.cdc.Upsert.applyChangelog(None,
        graft.sources.CdcSource.jsonEnvelope(wire, "movies", movieSchema),
        Seq("movie_id"))
      val expected = graft.operators.Revenue
        .movieRevenue(tickets, movies, graft.operators.Revenue.osbStatuses)
      val mvCols = expected.columns.map(col).toSeq
      val got = h.mv().get.select(mvCols: _*)
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      val want = expected.collect().map(_.toSeq).sortBy(_.toString).toSeq
      assert(want.nonEmpty && got == want,
        s"streamed MV diverged from batch recompute:\n got=$got\nwant=$want")
    } finally h.query.stop()
  }

  test("poison records on the wire are dropped, never kill the pipeline") {
    val dir = Files.createTempDirectory("graft-poison").toString
    val changelog = s"$dir/changelog"
    Files.createDirectories(Paths.get(changelog))
    // a good record surrounded by garbage: malformed JSON, a frame with
    // no payload, an unknown op, and a record for an undeclared table
    val frames = Seq(
      """this is not json at all {{{""",
      """{"unexpected":"shape"}""",
      s"""{"payload":{"before":null,"after":{"ticket_id":1,"movie_id":1,"user_id":1,"cost":9.00,"status":"scheduled","purchased_at":"2026-01-01T00:00:00"},"source":{"table":"tickets","lsn":10,"ts_ms":1},"op":"c","ts_ms":1}}""",
      s"""{"payload":{"before":null,"after":{"x":1},"source":{"table":"tickets","lsn":11,"ts_ms":2},"op":"z","ts_ms":2}}""",
      s"""{"payload":{"before":null,"after":{"y":2},"source":{"table":"unknown_table","lsn":12,"ts_ms":3},"op":"c","ts_ms":3}}""")
    Files.writeString(Paths.get(s"$changelog/topic.txt"), frames.mkString("\n"))
    val h = CdcPipeline.start(spark,
      CdcSource.fromDebezium(spark.readStream.text(changelog)),
      Seq(CdcPipeline.TableSpec("tickets", ticketSchema, Seq("ticket_id"), dist = Seq("movie_id"))),
      s"$dir/state", s"$dir/ckpt", Trigger.AvailableNow())
    try {
      h.query.awaitTermination(120000)
      val t = h.staging("tickets").get.collect()
      assert(t.length == 1 && t.head.getLong(0) == 1L,
        s"exactly the one good record must land: ${t.toSeq}")
    } finally h.query.stop()
  }

  test("producer-stamped seq orders intra-millisecond file changelog records") {
    // ADVICE r3: seq is the producer's obligation on seq-less
    // transports — a file-landing producer writes its row counter, and
    // the upsert layer honors it over arrival/content order
    val dir = Files.createTempDirectory("graft-rowseq").toString
    val changelog = s"$dir/changelog"
    Files.createDirectories(Paths.get(changelog))
    def rec(status: String, seq: Long) =
      s"""{"table":"tickets","op":"u","ts_ms":7,"seq":$seq,"before":null,"after":"{\\"ticket_id\\":1,\\"movie_id\\":1,\\"user_id\\":1,\\"cost\\":10.00,\\"status\\":\\"$status\\",\\"purchased_at\\":\\"2026-01-01T00:00:00\\"}"}"""
    // same ts_ms; producer counter says "finished" came second — wire
    // order scrambled to prove seq (not line order or content) decides
    Files.writeString(Paths.get(s"$changelog/a.json"),
      rec("finished", 2) + "\n" + rec("live", 1))
    val h = CdcPipeline.start(spark,
      CdcSource.fromJsonDir(spark, changelog),
      Seq(CdcPipeline.TableSpec("tickets", ticketSchema, Seq("ticket_id"), dist = Seq("movie_id"))),
      s"$dir/state", s"$dir/ckpt", Trigger.AvailableNow())
    try {
      h.query.awaitTermination(120000)
      val t = h.staging("tickets").get.collect().head
      assert(t.getString(t.fieldIndex("status")) == "finished", t.toString)
    } finally h.query.stop()
  }

  test("snapshot + incremental file changelog drive the pipeline end-to-end") {
    val dir = Files.createTempDirectory("graft-cdcsrc").toString
    val changelog = s"$dir/changelog"

    // snapshot phase: current OLTP state staged as +I records
    CdcSource.stageSnapshot(Seq(
      (1L, "Solo", java.sql.Timestamp.valueOf("2026-02-01 00:00:00"), 90))
      .toDF("movie_id", "title", "start_date", "duration_minutes"), changelog, "movies")
    CdcSource.stageSnapshot(Seq(
      (1L, 1L, 1L, BigDecimal("10.00"), "scheduled",
        java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
      .toDF("ticket_id", "movie_id", "user_id", "cost", "status", "purchased_at"),
      changelog, "tickets")
    // incremental phase: a later status-flip change record lands as a file
    Files.writeString(Paths.get(s"$dir/changelog/incr.json"),
      """{"table":"tickets","op":"u","ts_ms":9,"before":null,"after":"{\"ticket_id\":1,\"movie_id\":1,\"user_id\":1,\"cost\":10.00,\"status\":\"live\",\"purchased_at\":\"2026-01-01T00:00:00\"}"}""")

    val h = CdcPipeline.start(spark,
      CdcSource.fromJsonDir(spark, changelog, maxFilesPerTrigger = 1),
      Seq(CdcPipeline.TableSpec("tickets", ticketSchema, Seq("ticket_id"), dist = Seq("movie_id")),
        CdcPipeline.TableSpec("movies", movieSchema, Seq("movie_id"))),
      s"$dir/state", s"$dir/ckpt", Trigger.AvailableNow())
    try {
      h.query.awaitTermination(120000)
      val mv = h.mv().get.collect().head
      assert(mv.getLong(mv.fieldIndex("live_tickets")) == 1)
      assert(mv.getLong(mv.fieldIndex("scheduled_tickets")) == 0)
      assert(h.staging("tickets").get.count() == 1)
    } finally h.query.stop()
  }
}

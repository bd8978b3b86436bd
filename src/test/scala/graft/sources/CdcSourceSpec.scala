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

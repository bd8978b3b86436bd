package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Schema-generality check: the generated pipeline's alternate
  * `cdc_tickets` table (reference `flink-gen.sh:58-90`) carries
  * BOOLEAN and `TIMESTAMP_LTZ` columns — the pipeline machinery is
  * schema-driven, so any row type upserts through it. Session TZ is
  * UTC (GraftSession), making TIMESTAMP vs LTZ distinctions moot
  * (SURVEY §7). */
class AltSchemaSpec extends SparkSpec {
  import CdcPipeline._

  private val altSchema = StructType(Seq(
    StructField("id", LongType), StructField("external_id", StringType),
    StructField("is_live", BooleanType),            // flink-gen.sh:75
    StructField("cashout_odds", DecimalType(10, 2)),
    StructField("created_at", TimestampType),       // LTZ under UTC session
    StructField("updated_at", TimestampType)))

  test("alternate schema (BOOLEAN + LTZ) upserts through the pipeline") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-alt").toString
    val mem = MemoryStream[CdcRecord]
    val h = CdcPipeline.start(spark, mem.toDF(),
      Seq(TableSpec("cdc_tickets", altSchema, Seq("id"))),
      s"$dir/state", s"$dir/ckpt", Trigger.ProcessingTime(0))
    def row(id: Long, live: Boolean, odds: String, ts: String) =
      s"""{"id":$id,"external_id":"x$id","is_live":$live,"cashout_odds":$odds,
         |"created_at":"2026-01-01T00:00:00Z","updated_at":"$ts"}""".stripMargin.replace("\n", "")
    try {
      mem.addData(
        CdcRecord("cdc_tickets", "c", 1, null, row(1, false, "1.50", "2026-01-01T01:00:00Z")),
        CdcRecord("cdc_tickets", "c", 1, null, row(2, true, "2.25", "2026-01-01T01:00:00Z")))
      h.query.processAllAvailable()
      mem.addData(
        CdcRecord("cdc_tickets", "u", 2, row(1, false, "1.50", "2026-01-01T01:00:00Z"),
          row(1, true, "3.10", "2026-01-01T02:00:00Z")))
      h.query.processAllAvailable()
      val state = h.staging("cdc_tickets").get
        .select("id", "is_live", "cashout_odds")
        .as[(Long, Boolean, BigDecimal)].collect().sortBy(_._1)
      assert(state.toSeq == Seq(
        (1L, true, BigDecimal("3.10")), (2L, true, BigDecimal("2.25"))))
    } finally h.query.stop()
  }
}

package graft.streaming

import graft.SparkSpec
import graft.catalog.GraftLakeCatalog
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import java.nio.file.Files

/** The CDC→lake integration loop: a Debezium-style changelog stream
  * maintained in a LAKE CATALOG table through one SQL `MERGE INTO`
  * text per micro-batch — insert, update, and delete events all
  * land, multi-event keys collapse to their latest version inside a
  * batch, and the final table equals the batch latest-per-key
  * recomputation (stream ≡ batch). */
class SqlMergeSinkSpec extends SparkSpec {
  import CdcPipeline.CdcRecord
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("status", StringType),
    StructField("amount", LongType)))

  private def rec(op: String, ts: Long, id: Long, status: String, amount: Long) = {
    val body = s"""{"id":$id,"status":"$status","amount":$amount}"""
    CdcRecord("t", op, ts,
      before = if (op == "d" || op == "u") body else null,
      after = if (op == "d") null else body)
  }

  test("streaming MERGE INTO catalog table: upserts, deletes, in-batch collapse, replay idempotence") {
    implicit val sqlCtx = spark.sqlContext
    val lake = Files.createTempDirectory("graft-lake-ms")
    Files.createDirectories(lake.resolve("live"))
    val ckpt = Files.createTempDirectory("graft-ms-ckpt").toString
    spark.conf.set("spark.sql.catalog.lakem", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lakem.path", lake.toString)
    try {
      spark.sql("CREATE TABLE lakem.live.accounts (id BIGINT, status STRING, amount BIGINT)")
      val mem = MemoryStream[CdcRecord]
      val q = SqlMergeSink.start(spark, mem.toDF(), schema, Seq("id"),
        "lakem.live.accounts", ckpt, Trigger.ProcessingTime("100 milliseconds"))

      // batch 1: two inserts plus an in-batch update of id=1 (must
      // collapse to the ts=3 version before the merge)
      mem.addData(rec("c", 1L, 1L, "new", 10L), rec("c", 2L, 2L, "new", 20L),
        rec("u", 3L, 1L, "live", 11L))
      q.processAllAvailable()
      def rows() = spark.table("lakem.live.accounts")
        .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
      assert(rows() == Seq((1L, "live", 11L), (2L, "new", 20L)))

      // batch 2: update id=2, delete id=1, insert id=3
      mem.addData(rec("u", 4L, 2L, "done", 21L), rec("d", 5L, 1L, "live", 11L),
        rec("c", 6L, 3L, "new", 30L))
      q.processAllAvailable()
      assert(rows() == Seq((2L, "done", 21L), (3L, "new", 30L)))
      q.stop()

      // replay idempotence: re-merging batch 2's frontier changes nothing
      // (crash between sink commit and checkpoint commit = same SQL again)
      Seq((2L, "u", "done", 21L), (1L, "d", "live", 11L), (3L, "c", "new", 30L))
        .toDF("id", "__op", "status", "amount").createOrReplaceTempView("replay")
      spark.sql(
        """MERGE INTO lakem.live.accounts t USING replay s ON t.id = s.id
          |WHEN MATCHED AND s.__op = 'd' THEN DELETE
          |WHEN MATCHED THEN UPDATE SET status = s.status, amount = s.amount
          |WHEN NOT MATCHED AND s.__op <> 'd' THEN
          |  INSERT (id, status, amount) VALUES (s.id, s.status, s.amount)""".stripMargin)
      assert(rows() == Seq((2L, "done", 21L), (3L, "new", 30L)), "replay is a no-op")
    } finally {
      spark.conf.unset("spark.sql.catalog.lakem")
      spark.conf.unset("spark.sql.catalog.lakem.path")
    }
  }
}

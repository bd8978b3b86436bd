package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.streaming.Trigger

/** Streaming CDC into the SPJ-able lake layout — the reference's
  * PK-table story end-to-end on the V2 catalog: a stream upserts into
  * a `bucket(n, key)`-partitioned lake table via foreachBatch MERGE
  * semantics (latest-per-key within each batch, delete-then-append by
  * key), and the RESULT is immediately storage-partition-joinable
  * with zero shuffle. */
class StreamToBucketedLakeSpec extends SparkSpec {
  import spark.implicits._

  case class Upd(id: Long, v: String, seq: Long)

  test("streamed upserts land bucketed; the result joins shuffle-free") {
    implicit val sqlCtx = spark.sqlContext
    val lake = Files.createTempDirectory("graft-lake-stream-spj")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lksb", classOf[graft.catalog.GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lksb.path", lake.toString)
    val oldBucketing = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val oldThresh = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.sql(
        """CREATE TABLE lksb.m.cur (id BIGINT, v STRING)
          |PARTITIONED BY (bucket(4, id))""".stripMargin)
      spark.sql(
        """CREATE TABLE lksb.m.dim (id BIGINT, w STRING)
          |PARTITIONED BY (bucket(4, id))""".stripMargin)
      (1L to 20L).map(i => (i, s"w$i")).toDF("id", "w")
        .write.mode("append").insertInto("lksb.m.dim")

      val mem = MemoryStream[Upd]
      val q = mem.toDF().writeStream
        .option("checkpointLocation",
          Files.createTempDirectory("graft-sb-ckpt").toString)
        .trigger(Trigger.ProcessingTime(0))
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          // latest-per-key within the batch, then key-scoped upsert:
          // DELETE the incoming keys (bucket-pruned), append new rows
          val latest = graft.cdc.Upsert.latestByKey(
            batch, Seq("id"), Seq("seq")).select("id", "v")
          val keys = latest.select("id").as[Long].collect().sorted
          if (keys.nonEmpty) {
            spark.sql(s"DELETE FROM lksb.m.cur WHERE id IN (${keys.mkString(",")})")
            latest.write.mode("append").insertInto("lksb.m.cur")
          }
        }.start()
      try {
        mem.addData(Upd(1L, "a1", 1L), Upd(2L, "b1", 1L), Upd(1L, "a2", 2L))
        q.processAllAvailable()
        mem.addData(Upd(2L, "b2", 3L), Upd(3L, "c1", 1L))
        q.processAllAvailable()
      } finally q.stop()

      // upsert semantics: latest version per key
      assert(spark.table("lksb.m.cur").as[(Long, String)]
        .collect().sortBy(_._1).toSeq ==
        Seq((1L, "a2"), (2L, "b2"), (3L, "c1")))
      // the streamed-into layout is immediately SPJ-able
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.sql(
        """SELECT c.id, c.v, d.w FROM lksb.m.cur c
          |JOIN lksb.m.dim d ON c.id = d.id""".stripMargin)
      assert(j.count() == 3L)
      val top = j.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      assert(top.collect { case s: ShuffleExchangeExec => s }.isEmpty,
        s"streamed bucket layout must storage-partition-join:\n$top")
    } finally {
      oldBucketing.fold(spark.conf.unset("spark.sql.sources.v2.bucketing.enabled"))(
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", _))
      oldThresh.fold(spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
      spark.conf.unset("spark.sql.catalog.lksb")
      spark.conf.unset("spark.sql.catalog.lksb.path")
    }
  }
}

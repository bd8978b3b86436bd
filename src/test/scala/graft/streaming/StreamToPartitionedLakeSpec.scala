package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Streaming CDC into the IDENTITY-partitioned lake layout — the
  * commonest production shape: upserts land in `day=` partitions, the
  * per-batch key-scoped DELETE prunes to the touched days' directories
  * (never listing the others), and the resulting layout answers date
  * predicates with listing-level partition pruning. The identity twin
  * of [[StreamToBucketedLakeSpec]]. */
class StreamToPartitionedLakeSpec extends SparkSpec {
  import spark.implicits._

  case class Upd(id: Long, v: String, seq: Long, day: java.sql.Date)

  test("streamed upserts land day-partitioned; DELETE and reads prune on the date") {
    implicit val sqlCtx = spark.sqlContext
    val lake = Files.createTempDirectory("graft-lake-stream-idp")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lksi", classOf[graft.catalog.GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lksi.path", lake.toString)
    try {
      spark.sql(
        """CREATE TABLE lksi.m.cur (id BIGINT, v STRING, day DATE)
          |PARTITIONED BY (day)""".stripMargin)
      val d1 = java.sql.Date.valueOf("2026-01-01")
      val d2 = java.sql.Date.valueOf("2026-01-02")

      val mem = MemoryStream[Upd]
      val q = mem.toDF().writeStream
        .option("checkpointLocation",
          Files.createTempDirectory("graft-si-ckpt").toString)
        .trigger(Trigger.ProcessingTime(0))
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          // latest-per-key within the batch, then the KEY-SCOPED upsert
          // of the date-partitioned world: DELETE the incoming keys
          // restricted to their days (both conjuncts push — the day
          // equality prunes partition DIRECTORIES, so untouched days
          // are never listed), then append
          val latest = graft.cdc.Upsert.latestByKey(
            batch, Seq("id"), Seq("seq")).select("id", "v", "day")
          val groups = latest.select("day", "id")
            .as[(java.sql.Date, Long)].collect().groupBy(_._1)
          groups.foreach { case (day, rows) =>
            spark.sql(
              s"DELETE FROM lksi.m.cur WHERE day = DATE'$day' " +
                s"AND id IN (${rows.map(_._2).sorted.mkString(",")})")
          }
          if (groups.nonEmpty) latest.write.mode("append").insertInto("lksi.m.cur")
        }.start()
      try {
        mem.addData(Upd(1L, "a1", 1L, d1), Upd(2L, "b1", 1L, d2),
          Upd(1L, "a2", 2L, d1))
        q.processAllAvailable()
        mem.addData(Upd(2L, "b2", 3L, d2), Upd(3L, "c1", 1L, d1))
        q.processAllAvailable()
      } finally q.stop()

      // upsert semantics: latest version per key, day values intact
      assert(spark.table("lksi.m.cur").as[(Long, String, java.sql.Date)]
        .collect().sortBy(_._1).toSeq ==
        Seq((1L, "a2", d1), (2L, "b2", d2), (3L, "c1", d1)))
      // hive layout: one dir per day
      val dirs = {
        val s = Files.list(lake.resolve("m/cur.parquet"))
        try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator())
          .asScala.filter(Files.isDirectory(_))
          .map(_.getFileName.toString).toSet
        finally s.close()
      }
      assert(dirs == Set("day=2026-01-01", "day=2026-01-02"), dirs)
      // the streamed layout answers a date predicate with
      // listing-level partition pruning
      val plan = spark.table("lksi.m.cur").where("day = DATE'2026-01-02'")
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("day"),
        s"expected the date predicate as a partition filter:\n$plan")
      assert(spark.table("lksi.m.cur").where("day = DATE'2026-01-02'")
        .select("id").as[Long].collect().toSeq == Seq(2L))
    } finally {
      spark.conf.unset("spark.sql.catalog.lksi")
      spark.conf.unset("spark.sql.catalog.lksi.path")
    }
  }
}

package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** Lake tiering: streaming state becomes batch-queryable snapshots with
  * bounded staleness (reference `'table.datalake.freshness'`). */
class TieringSpec extends SparkSpec {
  import spark.implicits._

  test("snapshot stream tiers micro-batches; readLake sees the latest snapshot") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-tier").toString
    val mem = MemoryStream[(Long, String)]
    val q = Tiering.snapshotStream(mem.toDF().toDF("id", "v"),
      s"$dir/lake", s"$dir/ckpt", freshness = "1 millisecond")
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      val snap1 = Tiering.readLake(spark, s"$dir/lake").get
        .as[(Long, String)].collect().toSet
      assert(snap1 == Set((1L, "a"), (2L, "b")))
      mem.addData((3L, "c"))
      q.processAllAvailable()
      val snap2 = Tiering.readLake(spark, s"$dir/lake").get
        .as[(Long, String)].collect().toSet
      assert(snap2 == Set((3L, "c")), "latest snapshot is the newest micro-batch")
    } finally q.stop()
  }
}

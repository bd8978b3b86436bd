package graft.catalog

import java.nio.file.Files

import graft.SparkSpec

/** Maintenance procedures over PARTITIONED lake tables: compaction
  * must preserve the hive layout (a naive whole-dir rewrite would
  * flatten `col=value` dirs and bake partition values into files). */
class PartitionedMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("compact on a partitioned table preserves layout and rows") {
    val lake = Files.createTempDirectory("graft-lake-pm")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkpmx", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkpmx.path", lake.toString)
    try {
      spark.sql(
        """CREATE TABLE lkpmx.m.t (k BIGINT, v STRING, region STRING)
          |PARTITIONED BY (region)""".stripMargin)
      // two appends -> two files per partition
      Seq((1L, "a", "EU"), (2L, "b", "US")).toDF("k", "v", "region")
        .write.mode("append").insertInto("lkpmx.m.t")
      Seq((3L, "c", "EU"), (4L, "d", "US")).toDF("k", "v", "region")
        .write.mode("append").insertInto("lkpmx.m.t")
      def filesIn(rel: String): Int = {
        val s = Files.list(lake.resolve(s"m/t.parquet/$rel"))
        try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator())
          .asScala.count(_.getFileName.toString.endsWith(".parquet"))
        finally s.close()
      }
      assert(filesIn("region=EU") == 2)
      spark.sql("CALL lkpmx.system.compact('m.t', 1)").collect()
      // layout intact, one file per partition, rows exact
      assert(Files.isDirectory(lake.resolve("m/t.parquet/region=EU")),
        "compaction must not flatten the partition layout")
      assert(filesIn("region=EU") == 1 && filesIn("region=US") == 1)
      assert(spark.table("lkpmx.m.t").as[(Long, String, String)]
        .collect().sortBy(_._1).toSeq ==
        Seq((1L, "a", "EU"), (2L, "b", "US"), (3L, "c", "EU"), (4L, "d", "US")))
      // pruning still engages after compaction
      assert(spark.table("lkpmx.m.t").where("region = 'EU'").count() == 2L)
    } finally {
      spark.conf.unset("spark.sql.catalog.lkpmx")
      spark.conf.unset("spark.sql.catalog.lkpmx.path")
    }
  }
}

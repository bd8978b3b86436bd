package graft.catalog

import java.nio.file.Files

import graft.SparkSpec

/** CREATE TABLE AS SELECT on the lake catalog — flat, partitioned,
  * and REPLACE forms: schema inferred from the query, rows landed
  * through the ordinary write paths, failure leaving no half table. */
class CtasSpec extends SparkSpec {
  import spark.implicits._

  test("CTAS: flat and PARTITIONED BY, round-trip + layout") {
    val lake = Files.createTempDirectory("graft-lake-ctas")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkcts", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkcts.path", lake.toString)
    try {
      Seq((1L, "a", "EU"), (2L, "b", "US"), (3L, "c", "EU"))
        .toDF("k", "v", "region").createOrReplaceTempView("src_ctas")
      // flat CTAS: schema from the query, rows present
      spark.sql("CREATE TABLE lkcts.m.flat AS SELECT k, v FROM src_ctas")
      assert(spark.table("lkcts.m.flat").as[(Long, String)]
        .collect().sortBy(_._1).toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
      // partitioned CTAS: hive layout + pruning survive the CTAS path
      spark.sql(
        """CREATE TABLE lkcts.m.part PARTITIONED BY (region)
          |AS SELECT k, v, region FROM src_ctas""".stripMargin)
      assert(Files.isDirectory(lake.resolve("m/part.parquet/region=EU")))
      assert(spark.table("lkcts.m.part").where("region = 'EU'").count() == 2L)
      // duplicate CTAS fails loudly; IF NOT EXISTS is a no-op
      intercept[Exception](spark.sql(
        "CREATE TABLE lkcts.m.flat AS SELECT k FROM src_ctas"))
      spark.sql(
        "CREATE TABLE IF NOT EXISTS lkcts.m.flat AS SELECT k FROM src_ctas")
      assert(spark.table("lkcts.m.flat").columns.toSeq == Seq("k", "v"),
        "IF NOT EXISTS must not replace the existing table")
      // RTAS: CREATE OR REPLACE swaps schema and content
      spark.sql(
        "CREATE OR REPLACE TABLE lkcts.m.flat AS SELECT region FROM src_ctas")
      assert(spark.table("lkcts.m.flat").columns.toSeq == Seq("region"))
      assert(spark.table("lkcts.m.flat").count() == 3L)
    } finally {
      spark.conf.unset("spark.sql.catalog.lkcts")
      spark.conf.unset("spark.sql.catalog.lkcts.path")
    }
  }
}

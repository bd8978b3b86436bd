package graft.catalog

import graft.SparkSpec

class CatalogSpec extends SparkSpec {

  test("database + external lake tables resolve through SQL and table()") {
    Catalog.registerLakeTables(spark, "osb", "/root/testdata/sf0.001")
    try {
      Catalog.use(spark, "osb")
      assert(spark.sql("SELECT count(*) AS n FROM lineitem").head().getLong(0) > 0)
      assert(spark.table("osb.events").columns.contains("event_type"))
      // external: registration copies no data, queries prune/push down
      val p = spark.sql("SELECT l_orderkey FROM osb.lineitem WHERE l_orderkey = 1")
        .queryExecution.executedPlan.toString
      assert(p.contains("PushedFilters") || p.contains("l_orderkey"))
    } finally {
      Catalog.use(spark, "default")
      Catalog.drop(spark, "osb")
    }
  }
}

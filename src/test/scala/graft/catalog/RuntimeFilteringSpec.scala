package graft.catalog

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.unsafe.types.UTF8String

/** Runtime (dynamic) partition pruning on the partitioned lake scan —
  * the V2 `SupportsRuntimeV2Filtering` hook: the scan advertises its
  * partition columns as filterable, and a materialized join-key set
  * re-prunes the directory listing before input partitions plan. */
class RuntimeFilteringSpec extends SparkSpec {
  import spark.implicits._

  test("filter(): an IN runtime predicate re-plans to the matching subtrees only") {
    val lake = Files.createTempDirectory("graft-lake-rf1")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkrf1", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkrf1.path", lake.toString)
    try {
      spark.sql(
        """CREATE TABLE lkrf1.m.f (k BIGINT, region STRING)
          |PARTITIONED BY (region)""".stripMargin)
      Seq((1L, "EU"), (2L, "US"), (3L, "APAC"), (4L, "EU"))
        .toDF("k", "region").write.mode("append").insertInto("lkrf1.m.f")
      // reach the raw V2 scan through the catalog table
      val cat = spark.sessionState.catalogManager.catalog("lkrf1")
        .asInstanceOf[GraftLakeCatalog]
      val tbl = cat.loadTable(
        org.apache.spark.sql.connector.catalog.Identifier.of(Array("m"), "f"))
      val scan = tbl.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
        .newScanBuilder(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          java.util.Map.of())).build()
      val rf = scan.asInstanceOf[SupportsRuntimeV2Filtering]
      assert(rf.filterAttributes().map(_.describe()).toSet == Set("region"))
      val before = scan.toBatch.planInputPartitions().length
      assert(before >= 3, s"expected >=3 input partitions, got $before")
      // the DPP-materialized key set arrives as IN(region, 'EU')
      rf.filter(Array(new Predicate("IN", Array(
        Expressions.column("region"),
        Expressions.literal(UTF8String.fromString("EU"))))))
      val after = scan.toBatch.planInputPartitions().length
      assert(after < before, s"runtime filter must prune: $before -> $after")
      // the filtered batch still reads exactly the matching rows
      assert(spark.table("lkrf1.m.f").where("region = 'EU'").count() == 2L)
    } finally {
      spark.conf.unset("spark.sql.catalog.lkrf1")
      spark.conf.unset("spark.sql.catalog.lkrf1.path")
    }
  }

  test("filter() on a SPEC-EVOLVED snapshot re-plans per shape: pruning works, no conflicting-partition error (r12)") {
    val lake = Files.createTempDirectory("graft-lake-rf3")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkrf3", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkrf3.path", lake.toString)
    try {
      spark.sql(
        """CREATE TABLE lkrf3.m.f (k BIGINT, day STRING, region STRING)
          |PARTITIONED BY (region)
          |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      Seq((1L, "d1", "EU"), (2L, "d1", "US"), (3L, "d2", "APAC"))
        .toDF("k", "day", "region").write.mode("append").insertInto("lkrf3.m.f")
      spark.sql("CALL lkrf3.system.add_partition_field('m.f', 'day')")
      Seq((4L, "d1", "EU"), (5L, "d2", "US")).toDF("k", "day", "region")
        .write.mode("append").insertInto("lkrf3.m.f")
      val cat = spark.sessionState.catalogManager.catalog("lkrf3")
        .asInstanceOf[GraftLakeCatalog]
      val tbl = cat.loadTable(
        org.apache.spark.sql.connector.catalog.Identifier.of(Array("m"), "f"))
      val scan = tbl.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
        .newScanBuilder(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          java.util.Map.of())).build()
      // the mixed-shape scan must still expose the DPP hook (pre-r12
      // it returned the bare ShapeUnionScan and lost it)
      val rf = scan.asInstanceOf[SupportsRuntimeV2Filtering]
      assert(rf.filterAttributes().map(_.describe()).toSet ==
        Set("region", "day"))
      val before = scan.toBatch.planInputPartitions().length
      assert(before >= 4, s"expected >=4 input partitions, got $before")
      rf.filter(Array(new Predicate("IN", Array(
        Expressions.column("region"),
        Expressions.literal(UTF8String.fromString("EU"))))))
      // the re-plan groups by shape — planning must neither throw
      // CONFLICTING_PARTITION_COLUMN_NAMES nor lose rows
      val after = scan.toBatch.planInputPartitions().length
      assert(after < before, s"runtime filter must prune: $before -> $after")
      assert(spark.table("lkrf3.m.f").where("region = 'EU'")
        .select("k").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
    } finally {
      spark.conf.unset("spark.sql.catalog.lkrf3")
      spark.conf.unset("spark.sql.catalog.lkrf3.path")
    }
  }

  test("star join: DPP plants a runtime filter on the fact scan; results exact") {
    val lake = Files.createTempDirectory("graft-lake-rf2")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkrf2", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkrf2.path", lake.toString)
    try {
      spark.sql(
        """CREATE TABLE lkrf2.m.fact (k BIGINT, amt BIGINT, region STRING)
          |PARTITIONED BY (region)""".stripMargin)
      (1L to 40L).map(i => (i, i * 10L, Seq("EU", "US", "APAC", "LATAM")((i % 4L).toInt)))
        .toDF("k", "amt", "region")
        .write.mode("append").insertInto("lkrf2.m.fact")
      // the dim must be a REAL source (a LocalRelation would constant-
      // fold its filter away and the DPP rule would see no selective
      // predicate on the filtering side)
      val dimPath = lake.resolve("dim_rf2.parquet").toString
      Seq(("EU", "europe"), ("US", "america"),
        ("APAC", "asia"), ("LATAM", "latam")).toDF("r", "rname")
        .write.parquet(dimPath)
      spark.read.parquet(dimPath).createOrReplaceTempView("dim_rf2")
      // selective dim filter + join on the partition column: the DPP
      // rule should plant a dynamic pruning runtime filter on the scan
      val q = spark.sql(
        """SELECT /*+ BROADCAST(d) */ f.region,
          |  CAST(sum(f.amt) AS BIGINT) AS s
          |FROM lkrf2.m.fact f JOIN dim_rf2 d ON f.region = d.r
          |WHERE d.rname = 'europe' GROUP BY 1""".stripMargin)
      val expected = (1L to 40L).filter(_ % 4L == 0L).map(_ * 10L).sum
      assert(q.as[(String, Long)].collect().toSeq == Seq(("EU", expected)))
      // descend into the adaptive plan: AdaptiveSparkPlanExec exposes
      // its current plan as a field, not a child, so collect() alone
      // never sees the scan
      val top = q.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val scans = top.collect {
        case b: BatchScanExec => b
      }
      assert(scans.exists(_.runtimeFilters.nonEmpty),
        s"expected a runtime filter on the fact scan:\n${q.queryExecution.executedPlan}")
    } finally {
      spark.conf.unset("spark.sql.catalog.lkrf2")
      spark.conf.unset("spark.sql.catalog.lkrf2.path")
    }
  }

  test("partitioned ADD COLUMN: old partitions read NULL, new writes carry it") {
    val lake = Files.createTempDirectory("graft-lake-rf4")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkrf4", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkrf4.path", lake.toString)
    try {
      spark.sql(
        """CREATE TABLE lkrf4.m.e (k BIGINT, region STRING)
          |PARTITIONED BY (region)""".stripMargin)
      Seq((1L, "EU"), (2L, "US")).toDF("k", "region")
        .write.mode("append").insertInto("lkrf4.m.e")
      spark.sql("ALTER TABLE lkrf4.m.e ADD COLUMN note STRING")
      // the added DATA column appends at the END (r16 — past the
      // partition column; schema-evolving INSERT merges need it)
      assert(spark.table("lkrf4.m.e").columns.toSeq == Seq("k", "region", "note"))
      // merge-on-read: pre-evolution partitions read the column as NULL
      assert(spark.table("lkrf4.m.e").as[(Long, String, Option[String])]
        .collect().sortBy(_._1).toSeq ==
        Seq((1L, "EU", None), (2L, "US", None)))
      Seq((3L, "EU", "x")).toDF("k", "region", "note")
        .write.mode("append").insertInto("lkrf4.m.e")
      assert(spark.table("lkrf4.m.e").where("note = 'x'")
        .as[(Long, String, Option[String])].collect().toSeq ==
        Seq((3L, "EU", Some("x"))))
      // partition pruning still works over the evolved schema
      assert(spark.table("lkrf4.m.e").where("region = 'EU'").count() == 2L)
      // rename/drop of PARTITION-SPEC columns stay rejected; data
      // columns evolve (full coverage in PartitionedEvolutionSpec)
      intercept[Exception](
        spark.sql("ALTER TABLE lkrf4.m.e RENAME COLUMN region TO zone"))
      intercept[Exception](
        spark.sql("ALTER TABLE lkrf4.m.e DROP COLUMN region"))
    } finally {
      spark.conf.unset("spark.sql.catalog.lkrf4")
      spark.conf.unset("spark.sql.catalog.lkrf4.path")
    }
  }

  test("bucket key: a runtime key set prunes hidden-bucket subtrees") {
    val lake = Files.createTempDirectory("graft-lake-rf3")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkrf3", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkrf3.path", lake.toString)
    try {
      spark.sql(
        """CREATE TABLE lkrf3.m.b (id BIGINT, v STRING)
          |PARTITIONED BY (bucket(8, id))""".stripMargin)
      (1L to 64L).map(i => (i, s"v$i")).toDF("id", "v")
        .write.mode("append").insertInto("lkrf3.m.b")
      val cat = spark.sessionState.catalogManager.catalog("lkrf3")
        .asInstanceOf[GraftLakeCatalog]
      val tbl = cat.loadTable(
        org.apache.spark.sql.connector.catalog.Identifier.of(Array("m"), "b"))
      val scan = tbl.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
        .newScanBuilder(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          java.util.Map.of())).build()
      val rf = scan.asInstanceOf[SupportsRuntimeV2Filtering]
      assert(rf.filterAttributes().map(_.describe()).toSet == Set("id"))
      val before = scan.toBatch.planInputPartitions().length
      rf.filter(Array(new Predicate("IN", Array(
        Expressions.column("id"),
        Expressions.literal(java.lang.Long.valueOf(7L))))))
      val after = scan.toBatch.planInputPartitions().length
      assert(after < before,
        s"bucket runtime filter must prune: $before -> $after")
    } finally {
      spark.conf.unset("spark.sql.catalog.lkrf3")
      spark.conf.unset("spark.sql.catalog.lkrf3.path")
    }
  }
}

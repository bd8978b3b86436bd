package graft.catalog

import graft.SparkSpec
import java.nio.file.{Files, Path}

/** Partitioned lake tables: `PARTITIONED BY (identity / bucket)` on
  * the V2 catalog — hive `col=value` directory layout, listing-level
  * partition pruning (plan-pinned), partition-wise INSERT OVERWRITE
  * (dynamic + static), hidden bucket partitioning, and
  * partition-preserving DELETE. */
class PartitionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def topDirs(p: Path): Set[String] = {
    val s = Files.list(p)
    try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator()).asScala
      .filter(Files.isDirectory(_)).map(_.getFileName.toString).toSet
    finally s.close()
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("identity partitions: layout, pruning plan pin, append, select") {
    val lake = Files.createTempDirectory("graft-lake-pt1")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkpt1", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkpt1.path", lake.toString)
    try {
      spark.sql(
        """CREATE TABLE lkpt1.m.t (k BIGINT, v STRING, region STRING)
          |PARTITIONED BY (region)""".stripMargin)
      val rows = Seq((1L, "a", "EU"), (2L, "b", "EU"),
        (3L, "c", "US"), (4L, "d", "APAC"))
      rows.toDF("k", "v", "region")
        .write.mode("append").insertInto("lkpt1.m.t")
      // hive layout: one dir per region, partition col NOT in files
      val dir = lake.resolve("m/t.parquet")
      assert(topDirs(dir) == Set("region=EU", "region=US", "region=APAC"))
      val euFile = {
        val s = Files.list(dir.resolve("region=EU"))
        try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator())
          .asScala.filter(_.getFileName.toString.endsWith(".parquet")).toSeq
        finally s.close()
      }
      assert(euFile.nonEmpty)
      assert(!spark.read.parquet(euFile.head.toString).columns.contains("region"),
        "partition column must not be written into the data files")
      // full read round-trips with partition values restored and typed
      assert(spark.table("lkpt1.m.t").as[(Long, String, String)]
        .collect().sortBy(_._1).toSeq == rows)
      // PRUNING: a partition predicate reaches the scan as a
      // PartitionFilter (listing-level — non-matching dirs never open)
      val q = spark.table("lkpt1.m.t").where("region = 'EU'")
      val plan = planOf(q)
      assert(plan.contains("PartitionFilters") && plan.contains("region"),
        s"expected a partition filter in the scan, got:\n$plan")
      assert(q.count() == 2L)
      // appends merge into existing partition dirs
      Seq((5L, "e", "EU")).toDF("k", "v", "region")
        .write.mode("append").insertInto("lkpt1.m.t")
      assert(spark.table("lkpt1.m.t").where("region = 'EU'").count() == 3L)
      assert(topDirs(dir) == Set("region=EU", "region=US", "region=APAC"))
      // partitioning is visible in metadata
      assert(spark.sql("DESCRIBE TABLE EXTENDED lkpt1.m.t").collect()
        .map(_.toString).mkString.contains("region"))
    } finally {
      spark.conf.unset("spark.sql.catalog.lkpt1")
      spark.conf.unset("spark.sql.catalog.lkpt1.path")
    }
  }

  test("multi-level identity + NULL partition values round-trip") {
    val lake = Files.createTempDirectory("graft-lake-pt2")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkpt2", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkpt2.path", lake.toString)
    try {
      spark.sql(
        """CREATE TABLE lkpt2.m.t (n BIGINT, d DATE, lang STRING)
          |PARTITIONED BY (d, lang)""".stripMargin)
      val rows = Seq(
        (1L, java.sql.Date.valueOf("2024-01-01"), "en"),
        (2L, java.sql.Date.valueOf("2024-01-01"), "fr"),
        (3L, java.sql.Date.valueOf("2024-01-02"), "en"),
        (4L, java.sql.Date.valueOf("2024-01-02"), null))
      rows.toDF("n", "d", "lang").write.mode("append").insertInto("lkpt2.m.t")
      val dir = lake.resolve("m/t.parquet")
      assert(topDirs(dir) == Set("d=2024-01-01", "d=2024-01-02"))
      assert(topDirs(dir.resolve("d=2024-01-02")) ==
        Set("lang=en", "lang=__HIVE_DEFAULT_PARTITION__"))
      val got = spark.table("lkpt2.m.t")
        .as[(Long, java.sql.Date, String)].collect().sortBy(_._1).toSeq
      assert(got == rows)
      // both levels prune
      val q = spark.table("lkpt2.m.t")
        .where("d = DATE'2024-01-02' AND lang = 'en'")
      assert(planOf(q).contains("PartitionFilters"))
      assert(q.select("n").as[Long].collect().toSeq == Seq(3L))
      // NULL partition is queryable
      assert(spark.table("lkpt2.m.t").where("lang IS NULL")
        .select("n").as[Long].collect().toSeq == Seq(4L))
    } finally {
      spark.conf.unset("spark.sql.catalog.lkpt2")
      spark.conf.unset("spark.sql.catalog.lkpt2.path")
    }
  }

  test("INSERT OVERWRITE: dynamic replaces touched partitions, static replaces named ones, bare truncates") {
    val lake = Files.createTempDirectory("graft-lake-pt3")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkpt3", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkpt3.path", lake.toString)
    val prevMode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    try {
      spark.sql(
        """CREATE TABLE lkpt3.m.t (n BIGINT, region STRING)
          |PARTITIONED BY (region)""".stripMargin)
      Seq((1L, "EU"), (2L, "US"), (3L, "APAC")).toDF("n", "region")
        .write.mode("append").insertInto("lkpt3.m.t")
      // DYNAMIC: only partitions receiving rows are replaced
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "DYNAMIC")
      spark.sql("INSERT OVERWRITE lkpt3.m.t VALUES (10, 'EU')")
      assert(spark.table("lkpt3.m.t").as[(Long, String)].collect().sorted.toSeq ==
        Seq((2L, "US"), (3L, "APAC"), (10L, "EU")),
        "dynamic overwrite must keep untouched partitions")
      // STATIC with a named partition: replace exactly that partition,
      // even when the new data differs
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "STATIC")
      spark.sql("INSERT OVERWRITE lkpt3.m.t PARTITION (region = 'US') VALUES (20), (21)")
      assert(spark.table("lkpt3.m.t").as[(Long, String)].collect().sorted.toSeq ==
        Seq((3L, "APAC"), (10L, "EU"), (20L, "US"), (21L, "US")))
      // bare INSERT OVERWRITE in static mode truncates everything
      spark.sql("INSERT OVERWRITE lkpt3.m.t VALUES (30, 'SA')")
      assert(spark.table("lkpt3.m.t").as[(Long, String)].collect().toSeq ==
        Seq((30L, "SA")))
      // TRUNCATE TABLE empties but keeps the table + partitioning
      spark.sql("TRUNCATE TABLE lkpt3.m.t")
      assert(spark.table("lkpt3.m.t").count() == 0L)
      Seq((40L, "EU")).toDF("n", "region").write.mode("append")
        .insertInto("lkpt3.m.t")
      assert(spark.table("lkpt3.m.t").as[(Long, String)].collect().toSeq ==
        Seq((40L, "EU")))
    } finally {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", prevMode)
      spark.conf.unset("spark.sql.catalog.lkpt3")
      spark.conf.unset("spark.sql.catalog.lkpt3.path")
    }
  }

  test("bucket(4, k): hidden _gbucket layout, sql-recomputable assignment, reads intact") {
    val lake = Files.createTempDirectory("graft-lake-pt4")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkpt4", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkpt4.path", lake.toString)
    try {
      spark.sql(
        """CREATE TABLE lkpt4.m.t (k BIGINT, v STRING)
          |PARTITIONED BY (bucket(4, k))""".stripMargin)
      (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v")
        .write.mode("append").insertInto("lkpt4.m.t")
      val dir = lake.resolve("m/t.parquet")
      val dirs = topDirs(dir)
      assert(dirs.nonEmpty && dirs.forall(_.startsWith("_gbucket=")),
        s"expected _gbucket=<n> dirs, got $dirs")
      // the bucket id is hidden: not in the schema, not in the rows
      assert(spark.table("lkpt4.m.t").columns.toSeq == Seq("k", "v"))
      assert(spark.table("lkpt4.m.t").count() == 100L)
      assert(spark.table("lkpt4.m.t").where("k = 42")
        .select("v").as[String].collect().toSeq == Seq("v42"))
      // assignment law: every row's directory equals pmod(hash(k), 4)
      // — the SQL-recomputable contract
      val byDir = dirs.toSeq.sorted.flatMap { d =>
        val b = d.stripPrefix("_gbucket=").toInt
        spark.read.parquet(dir.resolve(d).toString)
          .select("k").as[Long].collect().map(k => (k, b))
      }.toMap
      val expect = spark.sql(
        "SELECT id AS k, pmod(hash(id), 4) AS b FROM range(1, 101)")
        .as[(Long, Int)].collect().toMap
      assert(byDir == expect, "bucket assignment must be pmod(hash(k), n)")
      // DESCRIBE shows the transform
      assert(spark.sql("SHOW CREATE TABLE lkpt4.m.t").head().getString(0)
        .contains("bucket(4, k)"))
    } finally {
      spark.conf.unset("spark.sql.catalog.lkpt4")
      spark.conf.unset("spark.sql.catalog.lkpt4.path")
    }
  }

  test("DELETE FROM a partitioned table preserves the layout") {
    val lake = Files.createTempDirectory("graft-lake-pt5")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkpt5", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkpt5.path", lake.toString)
    try {
      spark.sql(
        """CREATE TABLE lkpt5.m.t (n BIGINT, region STRING)
          |PARTITIONED BY (region)""".stripMargin)
      Seq((1L, "EU"), (2L, "EU"), (3L, "US")).toDF("n", "region")
        .write.mode("append").insertInto("lkpt5.m.t")
      spark.sql("DELETE FROM lkpt5.m.t WHERE n = 1")
      assert(spark.table("lkpt5.m.t").as[(Long, String)].collect().sorted.toSeq ==
        Seq((2L, "EU"), (3L, "US")))
      val dir = lake.resolve("m/t.parquet")
      assert(topDirs(dir) == Set("region=EU", "region=US"),
        "DELETE must preserve the partition-directory layout")
      // partition pruning still plans after the rewrite
      assert(planOf(spark.table("lkpt5.m.t").where("region = 'US'"))
        .contains("PartitionFilters"))
    } finally {
      spark.conf.unset("spark.sql.catalog.lkpt5")
      spark.conf.unset("spark.sql.catalog.lkpt5.path")
    }
  }

  test("ADD COLUMN on an identity-partitioned table appends at the END (past the partition column); read + insert + DELETE still work") {
    val lake = Files.createTempDirectory("graft-lake-pt7")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkpt7", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkpt7.path", lake.toString)
    try {
      spark.sql(
        """CREATE TABLE lkpt7.m.t (n BIGINT, region STRING)
          |PARTITIONED BY (region)""".stripMargin)
      Seq((1L, "EU"), (2L, "US")).toDF("n", "region")
        .write.mode("append").insertInto("lkpt7.m.t")
      spark.sql("ALTER TABLE lkpt7.m.t ADD COLUMN note STRING")
      // r16: the new DATA column appends at the END, past the identity
      // partition column — the order Spark's schema-evolving MERGE
      // rebuild expects (reads bind by name; writes split by name)
      assert(spark.table("lkpt7.m.t").columns.toSeq == Seq("n", "region", "note"),
        "added column must append at the end")
      // pre-evolution rows read the new column as NULL (merge-on-read)
      assert(spark.table("lkpt7.m.t").where("note IS NULL").count() == 2L)
      // post-evolution inserts carry the new column
      Seq((3L, "EU", "x")).toDF("n", "region", "note")
        .write.mode("append").insertInto("lkpt7.m.t")
      assert(spark.table("lkpt7.m.t").as[(Long, String, String)]
        .collect().sortBy(_._1).toSeq ==
        Seq((1L, "EU", null), (2L, "US", null), (3L, "EU", "x")))
      // row-level DML still plans and runs on the evolved table
      spark.sql("DELETE FROM lkpt7.m.t WHERE n = 1")
      assert(spark.table("lkpt7.m.t").as[(Long, String, String)]
        .collect().sortBy(_._1).toSeq ==
        Seq((2L, "US", null), (3L, "EU", "x")))
      // pruning still plans after evolution
      assert(planOf(spark.table("lkpt7.m.t").where("region = 'EU'"))
        .contains("PartitionFilters"))
    } finally {
      spark.conf.unset("spark.sql.catalog.lkpt7")
      spark.conf.unset("spark.sql.catalog.lkpt7.path")
    }
  }

  test("task-attempt isolation: abort deletes the attempt's files; publish moves ONLY committed-message files; names are per-write unique") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    import org.apache.spark.unsafe.types.UTF8String

    def filesUnder(p: Path): Seq[Path] = {
      val s = Files.walk(p)
      try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator()).asScala
        .filter(Files.isRegularFile(_)).toSeq
      finally s.close()
    }
    val staging = Files.createTempDirectory("graft-pt-stage")
    val table = Files.createTempDirectory("graft-pt-table")
    val writeSchema = StructType(Seq(
      StructField("k", LongType), StructField("region", StringType)))
    val dataSchema = StructType(Seq(StructField("k", LongType)))
    val spec = Seq(PartitionSpec.Identity("region"))
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      spark.sessionState.newHadoopConf())
    val owf = new ParquetFileFormat().prepareWrite(
      spark, job, Map.empty[String, String], dataSchema)
    def factory(writeId: String) = new PartitionedWriterFactory(
      staging.toString, writeSchema, dataSchema, spec,
      spark.sessionState.conf.sessionLocalTimeZone,
      new org.apache.spark.util.SerializableConfiguration(job.getConfiguration),
      owf, writeId, dataSchema)
    def row(k: Long, r: String) =
      InternalRow(k, UTF8String.fromString(r))

    // attempt 1 writes, then ABORTS (task failure / lost speculative
    // race): its files disappear from the shared staging dir
    val w1 = factory("w1").createWriter(0, 7L)
    w1.write(row(1L, "EU"))
    w1.abort()
    assert(filesUnder(staging).isEmpty,
      "an aborted attempt must leave no files behind")

    // attempt 2 (the retry) commits; its message lists exactly its files
    val w2 = factory("w1").createWriter(0, 8L)
    w2.write(row(2L, "EU"))
    val msg = w2.commit().asInstanceOf[PartitionedCommit]
    assert(msg.files.size == 1 && msg.files.head.startsWith("region=EU/"))

    // a THIRD attempt that neither committed nor aborted (executor
    // died mid-write) leaves a stray file — publish must NOT move it
    Files.createDirectories(staging.resolve("region=US"))
    Files.write(staging.resolve("region=US/part-00000-9-w1-1.parquet"),
      Array[Byte](1, 2, 3))
    PartitionedWrite.publishStaged(staging, table, msg.files)
    val published = filesUnder(table).map(table.relativize(_).toString)
    assert(published == Seq(msg.files.head),
      s"publish must move exactly the committed files, got $published")
    assert(!Files.exists(staging),
      "staging (and the stray uncommitted file) must be gone after publish")

    // per-write UUID in the name: a second write with the SAME
    // partitionId/taskId (a fresh SparkContext restarting ids) cannot
    // collide at publish time
    Files.createDirectories(staging)
    val w3 = factory("w2").createWriter(0, 8L)
    w3.write(row(3L, "EU"))
    val msg2 = w3.commit().asInstanceOf[PartitionedCommit]
    assert(msg2.files.head != msg.files.head,
      "same (partitionId, taskId, fileSeq) in a new write must yield a new name")
    PartitionedWrite.publishStaged(staging, table, msg2.files)
    assert(filesUnder(table).size == 2)
  }

  test("guard rails: unsupported transforms, bad partition columns, no evolution") {
    val lake = Files.createTempDirectory("graft-lake-pt6")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lkpt6", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lkpt6.path", lake.toString)
    try {
      def fails(sql: String, frag: String): Unit = {
        val e = intercept[Exception](spark.sql(sql))
        assert(e.getMessage.contains(frag),
          s"expected '$frag' in: ${e.getMessage}")
      }
      fails("CREATE TABLE lkpt6.m.a (y BIGINT, x DOUBLE) PARTITIONED BY (x)",
        "supported: string, integral, date, boolean")
      fails("CREATE TABLE lkpt6.m.b (v STRING, y BIGINT) PARTITIONED BY (v)",
        "collides with the snapshot")
      fails("CREATE TABLE lkpt6.m.c (x STRING) PARTITIONED BY (x)",
        "at least one non-partition data column")
      fails("CREATE TABLE lkpt6.m.d (y BIGINT, x STRING) PARTITIONED BY (years(x))",
        "not supported")
      fails("CREATE TABLE lkpt6.m.f (g STRING, n BIGINT) PARTITIONED BY (g)",
        "must be the LAST columns")
      spark.sql(
        """CREATE TABLE lkpt6.m.e (n BIGINT, g STRING)
          |PARTITIONED BY (g)""".stripMargin)
      // partition-spec-referenced columns stay un-renameable (the
      // directory names depend on them); data columns evolve freely
      fails("ALTER TABLE lkpt6.m.e RENAME COLUMN g TO region",
        "partition spec")
      fails("ALTER TABLE lkpt6.m.e DROP COLUMN g",
        "partition spec")
      spark.sql("ALTER TABLE lkpt6.m.e RENAME COLUMN n TO m")
      assert(spark.table("lkpt6.m.e").columns.toSeq == Seq("m", "g"))
    } finally {
      spark.conf.unset("spark.sql.catalog.lkpt6")
      spark.conf.unset("spark.sql.catalog.lkpt6.path")
    }
  }
}

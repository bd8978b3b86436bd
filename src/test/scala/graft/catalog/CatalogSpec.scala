package graft.catalog

import graft.SparkSpec
import java.nio.file.{Files, Paths}

class CatalogSpec extends SparkSpec {

  test("V2 catalog plugin: multi-catalog namespacing over a parquet lake") {
    // lake layout: <root>/<namespace>/<table>.parquet
    val lake = Files.createTempDirectory("graft-lake")
    val ns = lake.resolve("staging")
    Files.createDirectories(ns)
    for (t <- Seq("lineitem", "part"))
      Files.copy(Paths.get(s"/root/testdata/sf0.001/$t.parquet"),
        ns.resolve(s"$t.parquet"))
    // CREATE CATALOG analog: configuration, resolved lazily per name
    spark.conf.set("spark.sql.catalog.lake", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lake.path", lake.toString)
    try {
      val shown = spark.sql("SHOW NAMESPACES IN lake").collect().map(_.getString(0))
      assert(shown.contains("staging"))
      assert(spark.sql("SELECT count(*) FROM lake.staging.lineitem").head().getLong(0) > 0)
      // cross-catalog join: V2 lake table ⋈ session-catalog temp view
      spark.read.parquet("/root/testdata/sf0.001/part.parquet")
        .createOrReplaceTempView("part_session")
      val joined = spark.sql(
        """SELECT count(*) FROM lake.staging.lineitem l
          |JOIN part_session p ON l.l_partkey = p.p_partkey""".stripMargin)
      assert(joined.head().getLong(0) > 0)
      // pushdown reaches the V2 parquet scan
      val plan = spark.sql(
        "SELECT l_orderkey FROM lake.staging.lineitem WHERE l_orderkey = 1")
        .queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,1)]"), plan)
      // namespace DDL is a filesystem move
      spark.sql("CREATE NAMESPACE lake.scratch")
      assert(Files.isDirectory(lake.resolve("scratch")))
      spark.sql("DROP NAMESPACE lake.scratch")
      assert(!Files.exists(lake.resolve("scratch")))
    } finally {
      spark.conf.unset("spark.sql.catalog.lake")
      spark.conf.unset("spark.sql.catalog.lake.path")
    }
  }

  test("V2 catalog writes: CTAS + INSERT INTO round-trip through the lake layout") {
    val lake = Files.createTempDirectory("graft-lake-w")
    Files.createDirectories(lake.resolve("mart"))
    spark.conf.set("spark.sql.catalog.lakew", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lakew.path", lake.toString)
    try {
      spark.read.parquet("/root/testdata/sf0.001/part.parquet")
        .createOrReplaceTempView("part_src")
      // CTAS: distributed parquet write into the lake layout
      spark.sql(
        """CREATE TABLE lakew.mart.big_parts AS
          |SELECT p_partkey, p_name, p_size FROM part_src WHERE p_size > 25""".stripMargin)
      val expected = spark.table("part_src").filter("p_size > 25").count()
      assert(expected > 0)
      assert(spark.table("lakew.mart.big_parts").count() == expected)
      assert(Files.isDirectory(lake.resolve("mart/big_parts.parquet")),
        "CTAS must land in the lake layout")
      // appends through the same V2 write path
      spark.sql(
        """INSERT INTO lakew.mart.big_parts
          |SELECT p_partkey, p_name, p_size FROM part_src WHERE p_size <= 25""".stripMargin)
      assert(spark.table("lakew.mart.big_parts").count() ==
        spark.table("part_src").count())
      // and the catalog surface sees + drops it
      assert(spark.sql("SHOW TABLES IN lakew.mart").collect()
        .map(_.getString(1)).contains("big_parts"))
      intercept[Exception] {                       // duplicate CREATE refused
        spark.sql("CREATE TABLE lakew.mart.big_parts (x INT)")
      }
      spark.sql("DROP TABLE lakew.mart.big_parts")
      assert(!Files.exists(lake.resolve("mart/big_parts.parquet")))
    } finally {
      spark.conf.unset("spark.sql.catalog.lakew")
      spark.conf.unset("spark.sql.catalog.lakew.path")
    }
  }

  test("ALTER TABLE ADD COLUMN: additive evolution, merge-on-read of old rows") {
    val lake = Files.createTempDirectory("graft-lake-evo")
    Files.createDirectories(lake.resolve("mart"))
    spark.conf.set("spark.sql.catalog.lakee", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lakee.path", lake.toString)
    try {
      spark.sql("CREATE TABLE lakee.mart.users (id BIGINT, name STRING)")
      spark.sql("INSERT INTO lakee.mart.users VALUES (1, 'ada'), (2, 'lin')")
      // evolve: new nullable column, data files untouched
      spark.sql("ALTER TABLE lakee.mart.users ADD COLUMN tier STRING")
      assert(spark.table("lakee.mart.users").columns.toSeq ==
        Seq("id", "name", "tier"))
      // insert WITH the new schema; old rows read the column as NULL
      spark.sql("INSERT INTO lakee.mart.users VALUES (3, 'bob', 'gold')")
      val rows = spark.table("lakee.mart.users")
        .collect().map(r => (r.getLong(0), r.getString(1),
          Option(r.getString(2)))).sortBy(_._1).toSeq
      assert(rows == Seq((1L, "ada", None), (2L, "lin", None),
        (3L, "bob", Some("gold"))))
      // type changes stay an explicit error (data files are immutable)
      val e = intercept[Exception] {
        spark.sql("ALTER TABLE lakee.mart.users ALTER COLUMN id TYPE STRING")
      }
      assert(e.getMessage.toLowerCase.contains("unsupported") ||
        e.getMessage.contains("ADD/RENAME/DROP"), e.getMessage)
      spark.sql("DROP TABLE lakee.mart.users")
    } finally {
      spark.conf.unset("spark.sql.catalog.lakee")
      spark.conf.unset("spark.sql.catalog.lakee.path")
    }
  }

  test("RENAME/DROP COLUMN: merge-on-read metadata evolution over immutable files") {
    val lake = Files.createTempDirectory("graft-lake-rn")
    Files.createDirectories(lake.resolve("mart"))
    spark.conf.set("spark.sql.catalog.laker", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.laker.path", lake.toString)
    try {
      spark.sql("CREATE TABLE laker.mart.docs (id BIGINT, body STRING, score BIGINT)")
      spark.sql("INSERT INTO laker.mart.docs VALUES (1, 'alpha', 10), (2, 'beta', 20)")

      // rename: pure metadata — pre-evolution files keep column `body`,
      // reads resolve it under the new name with data intact
      spark.sql("ALTER TABLE laker.mart.docs RENAME COLUMN body TO content")
      assert(spark.table("laker.mart.docs").columns.toSeq ==
        Seq("id", "content", "score"))
      val afterRename = spark.table("laker.mart.docs")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      assert(afterRename == Seq((1L, "alpha", 10L), (2L, "beta", 20L)))
      // filter + projection on the renamed column still push to the scan
      // (translated to the physical name at the V2 boundary)
      val q = spark.sql(
        "SELECT id FROM laker.mart.docs WHERE content = 'beta'")
      assert(q.collect().map(_.getLong(0)).toSeq == Seq(2L))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("body"), s"physical pushdown missing:\n$plan")

      // writes after the rename land PHYSICAL names — the file dialect
      // stays homogeneous, so old and new files read identically
      spark.sql("INSERT INTO laker.mart.docs VALUES (3, 'gamma', 30)")
      assert(spark.read.parquet(lake.resolve("mart/docs.parquet").toString)
        .columns.contains("body"), "post-rename write forked the file dialect")
      assert(spark.table("laker.mart.docs").count() == 3)
      assert(spark.sql(
        "SELECT content FROM laker.mart.docs WHERE id = 3").head().getString(0)
        == "gamma")

      // drop: the column disappears; files keep the bytes unread
      spark.sql("ALTER TABLE laker.mart.docs DROP COLUMN score")
      assert(spark.table("laker.mart.docs").columns.toSeq == Seq("id", "content"))
      // re-ADD of the dropped name must NOT resurrect dropped file data
      spark.sql("ALTER TABLE laker.mart.docs ADD COLUMN score BIGINT")
      val readded = spark.table("laker.mart.docs")
        .collect().map(r => (r.getLong(0), Option(r.get(2)))).sortBy(_._1).toSeq
      assert(readded == Seq((1L, None), (2L, None), (3L, None)),
        s"dropped data resurfaced: $readded")
      // and the fresh slot is writable
      spark.sql("INSERT INTO laker.mart.docs VALUES (4, 'delta', 40)")
      val r4 = spark.sql(
        "SELECT score FROM laker.mart.docs WHERE id = 4").head().getLong(0)
      assert(r4 == 40L)
      // Scala-path agreement: DataFrame API over the same catalog table
      import org.apache.spark.sql.functions.col
      assert(spark.table("laker.mart.docs").filter(col("content") === "delta")
        .select(col("id")).head().getLong(0) == 4L)
      spark.sql("DROP TABLE laker.mart.docs")
    } finally {
      spark.conf.unset("spark.sql.catalog.laker")
      spark.conf.unset("spark.sql.catalog.laker.path")
    }
  }

  test("ALTER COLUMN TYPE: widening evolution is metadata-only over immutable files") {
    val lake = Files.createTempDirectory("graft-lake-widen")
    Files.createDirectories(lake.resolve("mart"))
    spark.conf.set("spark.sql.catalog.lakew", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lakew.path", lake.toString)
    try {
      spark.sql(
        "CREATE TABLE lakew.mart.m (id INT, ratio FLOAT, price DECIMAL(5,2))")
      spark.sql(
        "INSERT INTO lakew.mart.m VALUES (1, CAST(0.5 AS FLOAT), 12.34), " +
          "(2, CAST(1.5 AS FLOAT), 99.99)")
      // widen all three: INT->BIGINT, FLOAT->DOUBLE, DECIMAL(5,2)->(12,2)
      spark.sql("ALTER TABLE lakew.mart.m ALTER COLUMN id TYPE BIGINT")
      spark.sql("ALTER TABLE lakew.mart.m ALTER COLUMN ratio TYPE DOUBLE")
      spark.sql("ALTER TABLE lakew.mart.m ALTER COLUMN price TYPE DECIMAL(12,2)")
      val t = spark.table("lakew.mart.m")
      assert(t.schema.map(f => f.dataType.simpleString).toSeq ==
        Seq("bigint", "double", "decimal(12,2)"), t.schema.treeString)
      // pre-evolution files (INT32/FLOAT/short-decimal parquet) read
      // under the widened types with values intact
      val pre = t.collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDecimal(2).toString))
        .sortBy(_._1).toSeq
      assert(pre == Seq((1L, 0.5, "12.34"), (2L, 1.5, "99.99")), pre.toString)
      // post-evolution writes land the widened physical type and need
      // the widened range; the mixed directory reads as one table
      spark.sql(
        "INSERT INTO lakew.mart.m VALUES (4294967296, 2.5, 1234567890.12)")
      val all = spark.sql(
        "SELECT sum(id) AS s, sum(price) AS p FROM lakew.mart.m").head()
      assert(all.getLong(0) == 4294967299L)
      assert(all.getDecimal(1).toString == "1234568002.45")
      // widening composes with RENAME: the physical slot keeps its
      // in-file name AND its in-file narrow type
      spark.sql("ALTER TABLE lakew.mart.m RENAME COLUMN ratio TO weight")
      spark.sql("ALTER TABLE lakew.mart.m ALTER COLUMN weight TYPE DOUBLE")
      import org.apache.spark.sql.functions.col
      assert(spark.table("lakew.mart.m").filter(col("weight") === 0.5)
        .select(col("id")).head().getLong(0) == 1L)
      // narrowing / rescaling / unrelated changes stay explicit errors
      // (narrowing dies in Spark's own analyzer upcast check; the
      // double->string case passes canUpCast and must hit the
      // catalog's widening gate)
      for (bad <- Seq("ALTER COLUMN id TYPE INT",
          "ALTER COLUMN price TYPE DECIMAL(12,4)",
          "ALTER COLUMN weight TYPE STRING")) {
        val e = intercept[Exception] {
          spark.sql(s"ALTER TABLE lakew.mart.m $bad") }
        val m = e.getMessage.toLowerCase
        assert(m.contains("unsupported") || m.contains("not supported"),
          s"$bad: ${e.getMessage}")
      }
      spark.sql("DROP TABLE lakew.mart.m")
    } finally {
      spark.conf.unset("spark.sql.catalog.lakew")
      spark.conf.unset("spark.sql.catalog.lakew.path")
    }
  }

  test("widened type applies to pre-evolution snapshots via time travel") {
    val lake = Files.createTempDirectory("graft-lake-wtt")
    Files.createDirectories(lake.resolve("state"))
    spark.conf.set("spark.sql.catalog.lakewv", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lakewv.path", lake.toString)
    try {
      import spark.implicits._
      val store = new graft.streaming.StateStore(
        spark, lake.resolve("state/counts.parquet").toString)
      store.write(Seq((1, 10), (2, 20)).toDF("id", "n"), version = 0)
      store.write(Seq((1, 15), (2, 20), (3, 5)).toDF("id", "n"), version = 1)
      spark.sql("ALTER TABLE lakewv.state.counts ALTER COLUMN n TYPE BIGINT")
      // latest AND the pre-evolution snapshot read the widened type;
      // SQL and Scala paths agree on both
      assert(spark.table("lakewv.state.counts").schema("n").dataType ==
        org.apache.spark.sql.types.LongType)
      val v0 = spark.sql(
        "SELECT id, n FROM lakewv.state.counts VERSION AS OF 0")
      assert(v0.schema("n").dataType == org.apache.spark.sql.types.LongType)
      assert(v0.as[(Int, Long)].collect().sorted.toSeq ==
        Seq((1, 10L), (2, 20L)))
      assert(spark.sql("SELECT sum(n) FROM lakewv.state.counts")
        .head().getLong(0) == 40L)
      assert(spark.table("lakewv.state.counts")
        .agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0) == 40L)
    } finally {
      spark.conf.unset("spark.sql.catalog.lakewv")
      spark.conf.unset("spark.sql.catalog.lakewv.path")
    }
  }

  test("RENAME COLUMN applies to pre-evolution snapshots via time travel") {
    val lake = Files.createTempDirectory("graft-lake-rnv")
    Files.createDirectories(lake.resolve("state"))
    spark.conf.set("spark.sql.catalog.lakev", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lakev.path", lake.toString)
    try {
      import spark.implicits._
      val store = new graft.streaming.StateStore(
        spark, lake.resolve("state/accounts.parquet").toString)
      store.write(Seq((1L, 100L), (2L, 200L)).toDF("id", "balance"), version = 0)
      store.write(Seq((1L, 150L), (2L, 200L), (3L, 5L)).toDF("id", "balance"), version = 1)
      spark.sql("ALTER TABLE lakev.state.accounts RENAME COLUMN balance TO amount")
      // latest AND the pre-evolution snapshot read under the NEW name
      assert(spark.table("lakev.state.accounts").columns.toSeq ==
        Seq("id", "amount"))
      val v0 = spark.sql(
        "SELECT id, amount FROM lakev.state.accounts VERSION AS OF 0")
        .as[(Long, Long)].collect().sorted.toSeq
      assert(v0 == Seq((1L, 100L), (2L, 200L)))
      val latest = spark.sql(
        "SELECT sum(amount) FROM lakev.state.accounts").head().getLong(0)
      assert(latest == 355L)
    } finally {
      spark.conf.unset("spark.sql.catalog.lakev")
      spark.conf.unset("spark.sql.catalog.lakev.path")
    }
  }

  test("SQL-text time travel: VERSION/TIMESTAMP AS OF match the StateStore API") {
    import org.apache.spark.sql.functions.col
    val lake = Files.createTempDirectory("graft-lake-tt")
    Files.createDirectories(lake.resolve("state"))
    spark.conf.set("spark.sql.catalog.laket", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.laket.path", lake.toString)
    try {
      import spark.implicits._
      // commit three snapshots through the Scala API the RecoverySpec pins
      val store = new graft.streaming.StateStore(
        spark, lake.resolve("state/accounts.parquet").toString)
      store.write(Seq((1L, 100L), (2L, 200L)).toDF("id", "balance"), version = 0)
      store.write(Seq((1L, 150L), (2L, 200L)).toDF("id", "balance"), version = 1)
      store.write(Seq((1L, 150L), (2L, 250L), (3L, 5L)).toDF("id", "balance"), version = 2)

      def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
        df.select(col("id"), col("balance")).as[(Long, Long)].collect().toSeq.sorted

      // default read = latest snapshot, never the union of versions
      assert(rows(spark.table("laket.state.accounts")) ==
        rows(store.read().get))
      assert(spark.table("laket.state.accounts").count() == 3)
      // VERSION AS OF through pure SQL text == StateStore.read(version)
      for (v <- 0L to 2L)
        assert(rows(spark.sql(
          s"SELECT * FROM laket.state.accounts VERSION AS OF $v")) ==
          rows(store.read(v).get), s"version $v")
      // TIMESTAMP AS OF: a timestamp at/after v0's commit but before a
      // far-future bound resolves by commit mtime, agreeing with readAsOf
      val t0 = store.commitTimeMs(0).get
      val sqlAt = spark.sql(
        s"SELECT * FROM laket.state.accounts TIMESTAMP AS OF " +
          s"timestamp_millis(${t0})")
      assert(rows(sqlAt) == rows(store.readAsOf(t0).get))
      // errors: missing version; pre-history timestamp; non-versioned table
      intercept[Exception](spark.sql(
        "SELECT * FROM laket.state.accounts VERSION AS OF 99").collect())
      intercept[Exception](spark.sql(
        s"SELECT * FROM laket.state.accounts TIMESTAMP AS OF timestamp_millis(${t0 - 3600000})").collect())
      Seq((1L, "x")).toDF("k", "v").write
        .parquet(lake.resolve("state/plain.parquet").toString)
      intercept[Exception](spark.sql(
        "SELECT * FROM laket.state.plain VERSION AS OF 0").collect())
    } finally {
      spark.conf.unset("spark.sql.catalog.laket")
      spark.conf.unset("spark.sql.catalog.laket.path")
    }
  }

  test("DELETE FROM / TRUNCATE: copy-on-write rewrite, null keeps, rename translation") {
    import spark.implicits._
    val lake = Files.createTempDirectory("graft-lake-del")
    Files.createDirectories(lake.resolve("mart"))
    spark.conf.set("spark.sql.catalog.laked", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.laked.path", lake.toString)
    try {
      spark.sql("CREATE TABLE laked.mart.t (k BIGINT, v STRING)")
      Seq((1L, Some("a")), (2L, Some("b")), (3L, null.asInstanceOf[Option[String]]),
        (4L, Some("b")), (5L, Some("c")))
        .toDF("k", "v").write.mode("append").insertInto("laked.mart.t")
      // plain comparison delete
      spark.sql("DELETE FROM laked.mart.t WHERE k <= 1")
      assert(spark.table("laked.mart.t").as[(Long, Option[String])]
        .collect().map(_._1).sorted.toSeq == Seq(2L, 3L, 4L, 5L))
      // SQL three-valued logic: v = 'b' is NULL for the null row → KEPT
      spark.sql("DELETE FROM laked.mart.t WHERE v = 'b'")
      assert(spark.table("laked.mart.t").as[(Long, Option[String])]
        .collect().map(_._1).sorted.toSeq == Seq(3L, 5L))
      // the declared-schema sidecar survives the rewrite swap
      assert(Files.exists(lake.resolve("mart/t.parquet/_graft_schema.json")))
      // rename evolution then delete by the NEW name: the condition
      // must translate to the physical column in the immutable files
      spark.sql("ALTER TABLE laked.mart.t RENAME COLUMN v TO label")
      spark.sql("DELETE FROM laked.mart.t WHERE label = 'c'")
      assert(spark.table("laked.mart.t").select("k").as[Long]
        .collect().toSeq == Seq(3L))
      // TRUNCATE rides the same path (SupportsDeleteV2 → TruncatableTable)
      spark.sql("TRUNCATE TABLE laked.mart.t")
      assert(spark.table("laked.mart.t").count() == 0L)
      assert(spark.table("laked.mart.t").columns.toSeq == Seq("k", "label"),
        "schema survives truncation")
    } finally {
      spark.conf.unset("spark.sql.catalog.laked")
      spark.conf.unset("spark.sql.catalog.laked.path")
    }
  }

  test("DELETE FROM a versioned table commits a snapshot; time travel pre-delete intact") {
    import spark.implicits._
    val lake = Files.createTempDirectory("graft-lake-delv")
    Files.createDirectories(lake.resolve("state"))
    spark.conf.set("spark.sql.catalog.lakedv", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lakedv.path", lake.toString)
    try {
      val store = new graft.streaming.StateStore(
        spark, lake.resolve("state/accts.parquet").toString)
      store.write(Seq((1L, 10L), (2L, 20L)).toDF("id", "bal"), 0L)
      store.write(Seq((1L, 11L), (2L, 20L), (3L, 30L)).toDF("id", "bal"), 1L)
      spark.sql("DELETE FROM lakedv.state.accts WHERE id = 2")
      // latest view: the delete landed as snapshot v=2
      assert(spark.table("lakedv.state.accts").select("id").as[Long]
        .collect().sorted.toSeq == Seq(1L, 3L))
      assert(store.versions == Seq(0L, 1L, 2L))
      // DELETE must NOT pierce history (purgeKeys is the op that does)
      assert(spark.sql(
        "SELECT id FROM lakedv.state.accts VERSION AS OF 1").as[Long]
        .collect().sorted.toSeq == Seq(1L, 2L, 3L))
    } finally {
      spark.conf.unset("spark.sql.catalog.lakedv")
      spark.conf.unset("spark.sql.catalog.lakedv.path")
    }
  }

  test("UPDATE and MERGE INTO: group-based copy-on-write rewrite through Spark's planner") {
    import spark.implicits._
    val lake = Files.createTempDirectory("graft-lake-rlo")
    Files.createDirectories(lake.resolve("mart"))
    spark.conf.set("spark.sql.catalog.lakeu", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lakeu.path", lake.toString)
    try {
      spark.sql("CREATE TABLE lakeu.mart.acct (id BIGINT, bal BIGINT, tag STRING)")
      Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "b"))
        .toDF("id", "bal", "tag").write.mode("append").insertInto("lakeu.mart.acct")
      // UPDATE: matched rows rewritten, others carried over untouched
      spark.sql("UPDATE lakeu.mart.acct SET bal = bal + 5 WHERE tag = 'b'")
      assert(spark.table("lakeu.mart.acct").as[(Long, Long, String)]
        .collect().sortBy(_._1).toSeq ==
        Seq((1L, 10L, "a"), (2L, 25L, "b"), (3L, 35L, "b")))
      // MERGE INTO: the reference's PK-upsert (tickets-cdc.sql:68-77
      // INSERT INTO <pk-table>) as pure SQL — update on match, insert
      // on miss, delete on a guarded match
      Seq((2L, 200L, "b2"), (4L, 40L, "d"), (3L, 0L, "gone"))
        .toDF("id", "bal", "tag").createOrReplaceTempView("acct_delta")
      spark.sql(
        """MERGE INTO lakeu.mart.acct t USING acct_delta s ON t.id = s.id
          |WHEN MATCHED AND s.tag = 'gone' THEN DELETE
          |WHEN MATCHED THEN UPDATE SET bal = s.bal, tag = s.tag
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(spark.table("lakeu.mart.acct").as[(Long, Long, String)]
        .collect().sortBy(_._1).toSeq ==
        Seq((1L, 10L, "a"), (2L, 200L, "b2"), (4L, 40L, "d")))
      // the declared-schema sidecar survives both rewrites
      assert(Files.exists(lake.resolve("mart/acct.parquet/_graft_schema.json")))
      // UPDATE through a RENAMED column: condition and assignment
      // resolve logically, files stay physical
      spark.sql("ALTER TABLE lakeu.mart.acct RENAME COLUMN bal TO balance")
      spark.sql("UPDATE lakeu.mart.acct SET balance = 0 WHERE id = 4")
      assert(spark.sql("SELECT balance FROM lakeu.mart.acct WHERE id = 4")
        .as[Long].head() == 0L)
    } finally {
      spark.conf.unset("spark.sql.catalog.lakeu")
      spark.conf.unset("spark.sql.catalog.lakeu.path")
    }
  }

  test("UPDATE on a versioned table commits a snapshot; history intact") {
    import spark.implicits._
    val lake = Files.createTempDirectory("graft-lake-rlov")
    Files.createDirectories(lake.resolve("state"))
    spark.conf.set("spark.sql.catalog.lakeuv", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lakeuv.path", lake.toString)
    try {
      val store = new graft.streaming.StateStore(
        spark, lake.resolve("state/bal.parquet").toString)
      store.write(Seq((1L, 10L), (2L, 20L)).toDF("id", "bal"), 0L)
      spark.sql("UPDATE lakeuv.state.bal SET bal = 99 WHERE id = 1")
      assert(store.versions == Seq(0L, 1L))
      assert(spark.table("lakeuv.state.bal").as[(Long, Long)]
        .collect().sortBy(_._1).toSeq == Seq((1L, 99L), (2L, 20L)))
      assert(spark.sql("SELECT bal FROM lakeuv.state.bal VERSION AS OF 0 WHERE id = 1")
        .as[Long].head() == 10L)
      // the new snapshot is manifest-stamped (TIMESTAMP AS OF keeps working)
      assert(store.commitTimeMs(1L).nonEmpty)
    } finally {
      spark.conf.unset("spark.sql.catalog.lakeuv")
      spark.conf.unset("spark.sql.catalog.lakeuv.path")
    }
  }

  test("CALL procedures: snapshots / compact / expire / purge_keys lake maintenance") {
    import spark.implicits._
    val lake = Files.createTempDirectory("graft-lake-proc")
    Files.createDirectories(lake.resolve("state"))
    spark.conf.set("spark.sql.catalog.lakep", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lakep.path", lake.toString)
    try {
      val store = new graft.streaming.StateStore(
        spark, lake.resolve("state/accts.parquet").toString)
      store.write(Seq((1L, 10L), (2L, 20L)).toDF("id", "bal"), 0L)
      store.write(Seq((1L, 11L), (2L, 20L), (3L, 30L)).toDF("id", "bal"), 1L)
      // history report: one row per snapshot, stamped
      val snaps = spark.sql("CALL lakep.system.snapshots('state.accts')")
        .select("version", "commit_ms").as[(Long, Long)].collect().sortBy(_._1)
      assert(snaps.map(_._1).toSeq == Seq(0L, 1L))
      assert(snaps.forall(_._2 > 0L), "commit stamps present")
      // compaction commits a NEW version (history intact)
      val compacted = spark.sql("CALL lakep.system.compact('state.accts', 1)")
        .as[Long].head()
      assert(compacted == 2L && store.versions == Seq(0L, 1L, 2L))
      // expire keeps the newest `keep`
      assert(spark.sql("CALL lakep.system.expire_snapshots('state.accts', 2)")
        .as[Long].head() == 2L)
      assert(store.versions == Seq(1L, 2L))
      // compliance purge pierces every retained snapshot
      val removed = spark.sql(
        "CALL lakep.system.purge_keys('state.accts', 'id', '2')").as[Long].head()
      assert(removed == 2L, s"one row per retained snapshot, got $removed")
      assert(spark.sql("SELECT id FROM lakep.state.accts VERSION AS OF 1")
        .as[Long].collect().sorted.toSeq == Seq(1L, 3L))
      // plain-table compaction: many part files rewrite to one via
      // the staged swap, rows and sidecar intact
      import spark.implicits._
      spark.sql("CREATE TABLE lakep.state.wide (k BIGINT)")
      (1L to 64L).toDF("k").repartition(8)
        .write.mode("append").insertInto("lakep.state.wide")
      def nParts(t: String) = {
        import scala.jdk.CollectionConverters._
        val s = java.nio.file.Files.list(lake.resolve(t))
        try s.iterator().asScala.count(
          _.getFileName.toString.startsWith("part-"))
        finally s.close()
      }
      assert(nParts("state/wide.parquet") >= 8)
      assert(spark.sql("CALL lakep.system.compact('state.wide', 1)")
        .head().isNullAt(0), "plain compaction reports no snapshot")
      assert(nParts("state/wide.parquet") == 1, "coalesced to one file")
      assert(spark.table("lakep.state.wide").count() == 64L)
      assert(java.nio.file.Files.exists(
        lake.resolve("state/wide.parquet/_graft_schema.json")))
      // discovery surface: SHOW PROCEDURES lists the registry,
      // DESCRIBE PROCEDURE resolves one
      val listed = spark.sql("SHOW PROCEDURES IN lakep.system")
        .collect().map(_.getString(3)).toSet
      assert(LakeProcedures.list().toSet.subsetOf(listed), listed.toString)
      assert(spark.sql("DESCRIBE PROCEDURE lakep.system.compact")
        .collect().mkString.contains("compact"))
      // unknown procedure and non-versioned table fail loudly
      intercept[Exception](spark.sql("CALL lakep.system.nope('state.accts')"))
      Seq((1L, "x")).toDF("k", "v").write
        .parquet(lake.resolve("state/plain.parquet").toString)
      intercept[Exception](spark.sql(
        "CALL lakep.system.expire_snapshots('state.plain', 1)").collect())
    } finally {
      spark.conf.unset("spark.sql.catalog.lakep")
      spark.conf.unset("spark.sql.catalog.lakep.path")
    }
  }

  test("snapshot tags: VERSION AS OF name, expire pinning, drop_tag") {
    import spark.implicits._
    val lake = Files.createTempDirectory("graft-lake-tags")
    Files.createDirectories(lake.resolve("state"))
    spark.conf.set("spark.sql.catalog.laketg", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.laketg.path", lake.toString)
    try {
      val store = new graft.streaming.StateStore(
        spark, lake.resolve("state/accts.parquet").toString)
      store.write(Seq((1L, 10L)).toDF("id", "bal"), 0L)
      store.write(Seq((1L, 11L)).toDF("id", "bal"), 1L)
      store.write(Seq((1L, 12L)).toDF("id", "bal"), 2L)
      assert(spark.sql("CALL laketg.system.tag('state.accts', 'stable', 0)")
        .as[Long].head() == 0L)
      // a tag name resolves through VERSION AS OF
      assert(spark.sql(
          "SELECT bal FROM laketg.state.accts VERSION AS OF 'stable'")
        .as[Long].head() == 10L)
      // tags pin their snapshot against expire; untagged old ones drop
      spark.sql("CALL laketg.system.expire_snapshots('state.accts', 1)").collect()
      assert(store.versions == Seq(0L, 2L),
        "tagged v=0 survives, untagged v=1 expires")
      assert(spark.sql(
          "SELECT bal FROM laketg.state.accts VERSION AS OF 'stable'")
        .as[Long].head() == 10L)
      // listing + duplicate-name and numeric-name guards
      assert(spark.sql("CALL laketg.system.tags('state.accts')")
        .as[(String, Long)].collect().toSeq == Seq(("stable", 0L)))
      intercept[Exception](spark.sql(
        "CALL laketg.system.tag('state.accts', 'stable', 2)").collect())
      intercept[Exception](spark.sql(
        "CALL laketg.system.tag('state.accts', '7', 2)").collect())
      // drop releases the pin and the name stops resolving
      assert(spark.sql("CALL laketg.system.drop_tag('state.accts', 'stable')")
        .as[Long].head() == 0L)
      intercept[Exception](spark.sql(
        "SELECT bal FROM laketg.state.accts VERSION AS OF 'stable'").collect())
      spark.sql("CALL laketg.system.expire_snapshots('state.accts', 1)").collect()
      assert(store.versions == Seq(2L), "unpinned v=0 now expires")
      // keep=0 would delete the LATEST snapshot — rejected upfront
      intercept[Exception](spark.sql(
        "CALL laketg.system.expire_snapshots('state.accts', 0)").collect())
      assert(store.versions == Seq(2L))
    } finally {
      spark.conf.unset("spark.sql.catalog.laketg")
      spark.conf.unset("spark.sql.catalog.laketg.path")
    }
  }

  test("CALL rollback: non-destructive revert — current reverts, history intact") {
    import spark.implicits._
    val lake = Files.createTempDirectory("graft-lake-rollback")
    Files.createDirectories(lake.resolve("state"))
    // fresh catalog name per test: Spark caches catalog instances by name
    spark.conf.set("spark.sql.catalog.lakerb", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lakerb.path", lake.toString)
    try {
      val store = new graft.streaming.StateStore(
        spark, lake.resolve("state/accts.parquet").toString)
      store.write(Seq((1L, 10L), (2L, 20L)).toDF("id", "bal"), 0L)
      store.write(Seq((1L, 99L), (2L, 20L), (3L, 30L)).toDF("id", "bal"), 1L)
      // revert the bad v=1 commit: rollback re-commits v=0 as v=2
      assert(spark.sql("CALL lakerb.system.rollback('state.accts', 0)")
        .as[Long].head() == 2L)
      assert(spark.table("lakerb.state.accts").as[(Long, Long)]
        .collect().sorted.toSeq == Seq((1L, 10L), (2L, 20L)),
        "current content reverted to v=0")
      // the rolled-back-over commit is STILL time-travelable
      assert(spark.sql(
          "SELECT bal FROM lakerb.state.accts VERSION AS OF 1 WHERE id = 1")
        .as[Long].head() == 99L, "rollback must not destroy history")
      assert(store.versions == Seq(0L, 1L, 2L))
      // unknown snapshot fails loudly, store untouched
      intercept[Exception](spark.sql(
        "CALL lakerb.system.rollback('state.accts', 7)").collect())
      assert(store.versions == Seq(0L, 1L, 2L))
    } finally {
      spark.conf.unset("spark.sql.catalog.lakerb")
      spark.conf.unset("spark.sql.catalog.lakerb.path")
    }
  }

  test("CALL dedupe: one survivor per key, deterministic pick, both layouts, idempotent") {
    import spark.implicits._
    val lake = Files.createTempDirectory("graft-lake-dedupe")
    Files.createDirectories(lake.resolve("state"))
    spark.conf.set("spark.sql.catalog.lakedd", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lakedd.path", lake.toString)
    try {
      // versioned: dedupe commits a NEW snapshot; the duplicated past
      // stays time-travelable; survivor is the min remaining-struct row
      val store = new graft.streaming.StateStore(
        spark, lake.resolve("state/dup.parquet").toString)
      store.write(Seq((1L, "b"), (1L, "a"), (2L, "z"), (3L, "q"))
        .toDF("id", "v"), 0L)
      val removed = spark.sql("CALL lakedd.system.dedupe('state.dup', 'id')")
        .as[Long].head()
      assert(removed == 1L)
      assert(store.versions == Seq(0L, 1L))
      assert(spark.table("lakedd.state.dup").as[(Long, String)].collect().toSet ==
        Set((1L, "a"), (2L, "z"), (3L, "q")), "min-struct survivor")
      assert(spark.sql("SELECT * FROM lakedd.state.dup VERSION AS OF 0")
        .count() == 4L, "pre-dedupe snapshot intact")
      // idempotent: a rerun removes nothing and the answer is stable
      assert(spark.sql("CALL lakedd.system.dedupe('state.dup', 'id')")
        .as[Long].head() == 0L)
      // plain table through the staged swap
      Seq((1L, 5L), (1L, 3L), (2L, 9L)).toDF("k", "x").write
        .parquet(lake.resolve("state/plaind.parquet").toString)
      assert(spark.sql("CALL lakedd.system.dedupe('state.plaind', 'k')")
        .as[Long].head() == 1L)
      assert(spark.table("lakedd.state.plaind").as[(Long, Long)]
        .collect().toSet == Set((1L, 3L), (2L, 9L)))
      // bad key column fails loudly
      intercept[Exception](spark.sql(
        "CALL lakedd.system.dedupe('state.plaind', 'nope')").collect())
    } finally {
      spark.conf.unset("spark.sql.catalog.lakedd")
      spark.conf.unset("spark.sql.catalog.lakedd.path")
    }
  }

  test("INSERT OVERWRITE and REPLACE WHERE: staged overwrite through the rewrite machinery") {
    import spark.implicits._
    val lake = Files.createTempDirectory("graft-lake-ow")
    Files.createDirectories(lake.resolve("mart"))
    Files.createDirectories(lake.resolve("state"))
    spark.conf.set("spark.sql.catalog.lakeo", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lakeo.path", lake.toString)
    try {
      spark.sql("CREATE TABLE lakeo.mart.t (id BIGINT, v STRING)")
      Seq((1L, "a"), (2L, "b"), (3L, "b")).toDF("id", "v")
        .write.mode("append").insertInto("lakeo.mart.t")
      // full overwrite replaces everything, sidecar survives the swap
      spark.sql("INSERT OVERWRITE lakeo.mart.t VALUES (9L, 'z')")
      assert(spark.table("lakeo.mart.t").as[(Long, String)]
        .collect().toSeq == Seq((9L, "z")))
      assert(Files.exists(lake.resolve("mart/t.parquet/_graft_schema.json")))
      // expression overwrite (REPLACE WHERE): matching rows replaced,
      // the rest survive — including rows a NULL condition leaves alone
      Seq((1L, Some("keep")), (2L, Some("z")), (3L, None: Option[String]))
        .toDF("id", "v").write.mode("append").insertInto("lakeo.mart.t")
      spark.sql(
        "INSERT INTO lakeo.mart.t REPLACE WHERE v = 'z' VALUES (7L, 'new')")
      assert(spark.table("lakeo.mart.t").as[(Long, Option[String])]
        .collect().map(_._1).sorted.toSeq == Seq(1L, 3L, 7L),
        "z-rows replaced; NULL-condition row survives")
      // versioned table: overwrite commits a snapshot, history intact
      val store = new graft.streaming.StateStore(
        spark, lake.resolve("state/s.parquet").toString)
      store.write(Seq((1L, 10L)).toDF("id", "bal"), 0L)
      spark.sql("INSERT OVERWRITE lakeo.state.s VALUES (2L, 99L)")
      assert(store.versions == Seq(0L, 1L))
      assert(spark.table("lakeo.state.s").as[(Long, Long)]
        .collect().toSeq == Seq((2L, 99L)))
      assert(spark.sql("SELECT id FROM lakeo.state.s VERSION AS OF 0")
        .as[Long].head() == 1L)
      // append into a VERSIONED table commits a NEW snapshot — a
      // committed v=<n> must never mutate under VERSION AS OF
      Seq((5L, 5L)).toDF("id", "bal").write.mode("append")
        .insertInto("lakeo.state.s")
      assert(store.versions == Seq(0L, 1L, 2L), "append = new commit")
      assert(spark.table("lakeo.state.s").count() == 2L)
      assert(spark.sql("SELECT count(*) FROM lakeo.state.s VERSION AS OF 1")
        .head().getLong(0) == 1L, "pre-append snapshot unchanged")
    } finally {
      spark.conf.unset("spark.sql.catalog.lakeo")
      spark.conf.unset("spark.sql.catalog.lakeo.path")
    }
  }

  test("DELETE on a single-FILE table: rewrite converts it to the directory layout") {
    import spark.implicits._
    val lake = Files.createTempDirectory("graft-lake-sf")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lakef", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lakef.path", lake.toString)
    try {
      // registered lakes often hold single parquet FILES (the
      // CatalogSpec fixture-copy path) — DML must handle them too
      val tmp = Files.createTempDirectory("sf-src")
      Seq(1L, 2L, 3L).toDF("k").coalesce(1).write.parquet(tmp.resolve("d").toString)
      val file = {
        import scala.jdk.CollectionConverters._
        val st = Files.list(tmp.resolve("d"))
        try st.iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet")).get
        finally st.close()
      }
      Files.copy(file, lake.resolve("m/t.parquet"))
      assert(java.nio.file.Files.isRegularFile(lake.resolve("m/t.parquet")))
      spark.sql("DELETE FROM lakef.m.t WHERE k = 2")
      assert(spark.table("lakef.m.t").as[Long].collect().sorted.toSeq ==
        Seq(1L, 3L))
      assert(java.nio.file.Files.isDirectory(lake.resolve("m/t.parquet")),
        "rewrite lands in the directory layout")
    } finally {
      spark.conf.unset("spark.sql.catalog.lakef")
      spark.conf.unset("spark.sql.catalog.lakef.path")
    }
  }

  test("interrupted publish swap heals on load: .__old restores, stale leftover ignored") {
    import spark.implicits._
    val lake = Files.createTempDirectory("graft-lake-heal")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lakeh", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lakeh.path", lake.toString)
    try {
      spark.sql("CREATE TABLE lakeh.m.t (k BIGINT)")
      Seq(1L, 2L, 3L).toDF("k").write.mode("append").insertInto("lakeh.m.t")
      val live = lake.resolve("m/t.parquet")
      val old = lake.resolve("m/t.parquet.__old")
      // simulate a crash INSIDE the swap window: live dir moved away,
      // staged rewrite never published
      java.nio.file.Files.move(live, old)
      assert(spark.table("lakeh.m.t").as[Long].collect().sorted.toSeq ==
        Seq(1L, 2L, 3L), "load restores the pre-rewrite table")
      assert(java.nio.file.Files.isDirectory(live) &&
        !java.nio.file.Files.exists(old))
      // a stale .__old NEXT TO a live table (crash after publish,
      // before cleanup) is ignored: the committed rewrite wins
      Files.createDirectories(old)
      spark.sql("DELETE FROM lakeh.m.t WHERE k = 1")
      assert(spark.table("lakeh.m.t").as[Long].collect().sorted.toSeq ==
        Seq(2L, 3L))
      assert(!java.nio.file.Files.exists(old), "rewrite clears the leftover")
    } finally {
      spark.conf.unset("spark.sql.catalog.lakeh")
      spark.conf.unset("spark.sql.catalog.lakeh.path")
    }
  }

  test("streaming read of a lake table: appended files arrive as micro-batches") {
    import spark.implicits._
    val lake = Files.createTempDirectory("graft-lake-str")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lakes", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lakes.path", lake.toString)
    try {
      spark.sql("CREATE TABLE lakes.m.t (k BIGINT)")
      Seq(1L, 2L).toDF("k").write.mode("append").insertInto("lakes.m.t")
      val q = Catalog.readStreamTable(spark, "lakes.m.t")
        .writeStream.format("memory").queryName("lake_tail")
        .option("checkpointLocation",
          Files.createTempDirectory("lake-tail-ck").toString)
        .start()
      q.processAllAvailable()
      assert(spark.table("lake_tail").as[Long].collect().sorted.toSeq ==
        Seq(1L, 2L), "snapshot phase")
      Seq(3L).toDF("k").write.mode("append").insertInto("lakes.m.t")
      q.processAllAvailable()
      assert(spark.table("lake_tail").as[Long].collect().sorted.toSeq ==
        Seq(1L, 2L, 3L), "appended file arrives as a new batch")
      q.stop()
      // versioned tables are rejected with the change-feed pointer
      new graft.streaming.StateStore(
        spark, lake.resolve("m/vt.parquet").toString)
        .write(Seq(1L).toDF("k"), 0L)
      val e = intercept[IllegalArgumentException](
        Catalog.readStreamTable(spark, "lakes.m.vt"))
      assert(e.getMessage.contains("change"))
    } finally {
      spark.conf.unset("spark.sql.catalog.lakes")
      spark.conf.unset("spark.sql.catalog.lakes.path")
    }
  }

  test("streaming read of PARTITIONED lake tables: identity values restored, hidden bucket level invisible") {
    import spark.implicits._
    val lake = Files.createTempDirectory("graft-lake-strp")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lakpt", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lakpt.path", lake.toString)
    try {
      // identity layout: partition values live in DIRECTORY NAMES only
      // — the stream must restore them, never emit silent NULLs
      spark.sql(
        """CREATE TABLE lakpt.m.t (n BIGINT, region STRING)
          |PARTITIONED BY (region)""".stripMargin)
      Seq((1L, "EU"), (2L, "US")).toDF("n", "region")
        .write.mode("append").insertInto("lakpt.m.t")
      val q = Catalog.readStreamTable(spark, "lakpt.m.t")
      assert(q.columns.toSeq == Seq("n", "region"))
      val st = q.writeStream.format("memory").queryName("lake_pt")
        .option("checkpointLocation",
          Files.createTempDirectory("lake-pt-ck").toString)
        .start()
      st.processAllAvailable()
      assert(spark.table("lake_pt").as[(Long, String)].collect().sorted.toSeq ==
        Seq((1L, "EU"), (2L, "US")),
        "identity partition values must stream restored and typed")
      // appends into existing AND new partitions arrive as batches
      Seq((3L, "EU"), (4L, "APAC")).toDF("n", "region")
        .write.mode("append").insertInto("lakpt.m.t")
      st.processAllAvailable()
      assert(spark.table("lake_pt").as[(Long, String)].collect().sorted.toSeq ==
        Seq((1L, "EU"), (2L, "US"), (3L, "EU"), (4L, "APAC")))
      st.stop()

      // bucketed layout: the hidden _gbucket directory level must be
      // declared to the file source but never reach the caller
      spark.sql(
        """CREATE TABLE lakpt.m.b (k BIGINT, v STRING)
          |PARTITIONED BY (bucket(4, k))""".stripMargin)
      (1L to 20L).map(i => (i, s"v$i")).toDF("k", "v")
        .write.mode("append").insertInto("lakpt.m.b")
      val qb = Catalog.readStreamTable(spark, "lakpt.m.b")
      assert(qb.columns.toSeq == Seq("k", "v"),
        "the hidden bucket column must not leak into the stream schema")
      val stb = qb.writeStream.format("memory").queryName("lake_ptb")
        .option("checkpointLocation",
          Files.createTempDirectory("lake-ptb-ck").toString)
        .start()
      stb.processAllAvailable()
      assert(spark.table("lake_ptb").as[(Long, String)].collect().sortBy(_._1)
        .toSeq == (1L to 20L).map(i => (i, s"v$i")))
      stb.stop()
    } finally {
      spark.conf.unset("spark.sql.catalog.lakpt")
      spark.conf.unset("spark.sql.catalog.lakpt.path")
    }
  }

  test("streaming read after RENAME COLUMN: renamed column streams real values") {
    import spark.implicits._
    val lake = Files.createTempDirectory("graft-lake-strn")
    Files.createDirectories(lake.resolve("m"))
    spark.conf.set("spark.sql.catalog.lakrn", classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.lakrn.path", lake.toString)
    try {
      spark.sql("CREATE TABLE lakrn.m.t (k BIGINT, v STRING)")
      Seq((1L, "a"), (2L, "b")).toDF("k", "v")
        .write.mode("append").insertInto("lakrn.m.t")
      spark.sql("ALTER TABLE lakrn.m.t RENAME COLUMN v TO label")
      // the files still carry physical 'v'; the stream must read the
      // physical schema and alias back — a logical-schema read would
      // stream 'label' as all-NULL silently
      val q = Catalog.readStreamTable(spark, "lakrn.m.t")
      assert(q.columns.toSeq == Seq("k", "label"))
      val st = q.writeStream.format("memory").queryName("lake_rn")
        .option("checkpointLocation",
          Files.createTempDirectory("lake-rn-ck").toString)
        .start()
      st.processAllAvailable()
      assert(spark.table("lake_rn").as[(Long, String)].collect().sorted.toSeq ==
        Seq((1L, "a"), (2L, "b")), "renamed column streams values, not NULLs")
      // appends through the logical name keep arriving translated
      Seq((3L, "c")).toDF("k", "label")
        .write.mode("append").insertInto("lakrn.m.t")
      st.processAllAvailable()
      assert(spark.table("lake_rn").as[(Long, String)].collect().sorted.toSeq ==
        Seq((1L, "a"), (2L, "b"), (3L, "c")))
      st.stop()
    } finally {
      spark.conf.unset("spark.sql.catalog.lakrn")
      spark.conf.unset("spark.sql.catalog.lakrn.path")
    }
  }

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

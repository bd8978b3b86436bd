package graft.catalog

import graft.SparkSpec
import java.nio.file.{Files, Path}

/** PRIMARY-KEY lake tables ([[PkTables]] — Paimon's
  * `'merge-engine'='deduplicate'` as a table property). The laws:
  *
  *  - writes are BLIND APPENDS; reads resolve latest-per-key by the
  *    monotonic commit sequence (ties inside one commit break by
  *    (file, row position) — deterministically);
  *  - `VERSION AS OF` resolves each historical snapshot's own state;
  *  - full-key equality DELETE is a BLIND equality delete (one key
  *    row written, zero data rows read); a later re-insert REVIVES
  *    the key;
  *  - predicate DELETE / UPDATE / MERGE evaluate over the RESOLVED
  *    rows and commit appends + equality deletes (no data rewrite);
  *  - non-key predicates apply ABOVE the dedup (an old version
  *    matching the predicate must never resurface or vanish a key);
  *    key-only predicates push beneath it (bucket pruning intact);
  *  - key-aware `CALL compact` materializes the resolution: same
  *    content, delete files gone, dedup aggregate gone from plans,
  *    metadata-only fast paths valid again;
  *  - `first-row` keeps the FIRST version instead. */
class PkTableSpec extends SparkSpec {
  import spark.implicits._

  private def withLake(tag: String)(body: (String, Path) => Unit): Unit = {
    val lake = Files.createTempDirectory(s"graft-pk-$tag")
    Files.createDirectories(lake.resolve("m"))
    val cat = s"pk$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftLakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", lake.toString)
    try body(cat, lake)
    finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.path")
    }
  }

  private def mkTable(cat: String, engine: String = "deduplicate"): Unit =
    spark.sql(
      s"""CREATE TABLE $cat.m.t (k BIGINT NOT NULL, v STRING, amt BIGINT)
         |PARTITIONED BY (bucket(4, k))
         |TBLPROPERTIES ('versioned'='true', 'primary-key'='k',
         |  'merge-engine'='$engine')""".stripMargin)

  private def rows(cat: String): Seq[(Long, String, Long)] =
    spark.table(s"$cat.m.t").as[(Long, String, Long)]
      .collect().sortBy(_._1).toSeq

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("blind-append upserts resolve latest-per-key; time travel resolves each snapshot; data files never rewrite") {
    withLake("a") { (cat, lake) =>
      mkTable(cat)
      val dir = lake.resolve("m/t.parquet")
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
        .toDF("k", "v", "amt").write.mode("append")
        .insertInto(s"$cat.m.t") // s-1, seq 1
      val filesAfter1 = Snapshots.latest(dir).get.files.toSet
      Seq((2L, "b2", 21L), (4L, "d", 40L))
        .toDF("k", "v", "amt").write.mode("append")
        .insertInto(s"$cat.m.t") // s-2, seq 2
      Seq((2L, "b3", 22L), (1L, "a3", 13L))
        .toDF("k", "v", "amt").write.mode("append")
        .insertInto(s"$cat.m.t") // s-3, seq 3
      // blind appends: every s-1 file still live, untouched
      assert(filesAfter1.subsetOf(Snapshots.latest(dir).get.files.toSet))
      assert(rows(cat) == Seq((1L, "a3", 13L), (2L, "b3", 22L),
        (3L, "c", 30L), (4L, "d", 40L)))
      // historical snapshots resolve their OWN state
      assert(spark.sql(s"SELECT k, v, amt FROM $cat.m.t VERSION AS OF 2")
        .as[(Long, String, Long)].collect().sortBy(_._1).toSeq ==
        Seq((1L, "a", 10L), (2L, "b2", 21L), (3L, "c", 30L), (4L, "d", 40L)))
      // aggregates over the resolved view (no metadata shortcut)
      assert(spark.table(s"$cat.m.t").count() == 4L)
      assert(spark.sql(s"SELECT sum(amt) FROM $cat.m.t")
        .as[Long].head() == 13L + 22L + 30L + 40L)
    }
  }

  test("duplicate keys INSIDE one commit break ties deterministically (later row position wins)") {
    withLake("b") { (cat, _) =>
      mkTable(cat)
      // one task writes both rows of key 1 into one file, in order
      Seq((1L, "first", 1L), (1L, "second", 2L), (2L, "x", 9L))
        .toDF("k", "v", "amt").coalesce(1).write.mode("append")
        .insertInto(s"$cat.m.t")
      assert(rows(cat) == Seq((1L, "second", 2L), (2L, "x", 9L)))
      // stable across repeated reads
      assert(rows(cat) == rows(cat))
    }
  }

  test("first-row engine keeps the FIRST version") {
    withLake("c") { (cat, _) =>
      mkTable(cat, engine = "first-row")
      Seq((1L, "orig", 1L)).toDF("k", "v", "amt")
        .write.mode("append").insertInto(s"$cat.m.t")
      Seq((1L, "later", 2L), (2L, "n", 3L)).toDF("k", "v", "amt")
        .write.mode("append").insertInto(s"$cat.m.t")
      assert(rows(cat) == Seq((1L, "orig", 1L), (2L, "n", 3L)))
    }
  }

  test("partial-update engine: latest NON-NULL wins per column; deletes retire all fragments") {
    withLake("pu") { (cat, _) =>
      mkTable(cat, engine = "partial-update")
      Seq((1L, Some("a"), None: Option[Long]),
          (2L, None: Option[String], Some(20L)))
        .toDF("k", "v", "amt").write.mode("append").insertInto(s"$cat.m.t")
      Seq((1L, None: Option[String], Some(15L)),
          (2L, Some("b"), None: Option[Long]))
        .toDF("k", "v", "amt").write.mode("append").insertInto(s"$cat.m.t")
      def got() = spark.table(s"$cat.m.t")
        .as[(Long, Option[String], Option[Long])]
        .collect().sortBy(_._1).toSeq
      assert(got() == Seq((1L, Some("a"), Some(15L)),
        (2L, Some("b"), Some(20L))),
        "columns merge across versions; NULL never erases")
      // a newer non-null DOES replace
      Seq((1L, Some("a3"), None: Option[Long])).toDF("k", "v", "amt")
        .write.mode("append").insertInto(s"$cat.m.t")
      assert(got().head == ((1L, Some("a3"), Some(15L))))
      // an equality delete retires EVERY fragment; a re-insert starts
      // fresh (pre-delete fragments stay dead)
      spark.sql(s"DELETE FROM $cat.m.t WHERE k = 2")
      Seq((2L, None: Option[String], Some(9L))).toDF("k", "v", "amt")
        .write.mode("append").insertInto(s"$cat.m.t")
      assert(got() == Seq((1L, Some("a3"), Some(15L)),
        (2L, None, Some(9L))))
      // key-aware compact materializes the merged rows
      spark.sql(s"CALL $cat.system.compact('m.t', 1)")
      assert(got() == Seq((1L, Some("a3"), Some(15L)),
        (2L, None, Some(9L))))
      assert(!planOf(spark.table(s"$cat.m.t")).contains("max_by"))
    }
  }

  test("aggregation engine: the full fold family composes with key-aware compact (r16: bool_and/or, product, listagg, first_value)") {
    withLake("af") { (cat, _) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.tf (k BIGINT NOT NULL, ok BOOLEAN,
           |  seen BOOLEAN, fct DOUBLE, tag STRING, fst STRING)
           |PARTITIONED BY (bucket(2, k))
           |TBLPROPERTIES ('versioned'='true', 'primary-key'='k',
           |  'merge-engine'='aggregation',
           |  'fields.ok.aggregate-function'='bool_and',
           |  'fields.seen.aggregate-function'='bool_or',
           |  'fields.fct.aggregate-function'='product',
           |  'fields.tag.aggregate-function'='listagg',
           |  'fields.fst.aggregate-function'='first_value')""".stripMargin)
      def ins(rows: (Long, Boolean, Boolean, Double, String, String)*) =
        rows.toSeq.toDF("k", "ok", "seen", "fct", "tag", "fst")
          .write.mode("append").insertInto(s"$cat.m.tf")
      def got() = spark.table(s"$cat.m.tf")
        .as[(Long, Boolean, Boolean, Double, String, String)]
        .collect().sortBy(_._1).toSeq
      ins((1L, true, false, 2.0, "a", "first"))
      ins((1L, true, true, 3.0, "b", "second"))
      ins((1L, false, false, 5.0, "c", "third"))
      val folded = (1L, false, true, 30.0, "a,b,c", "first")
      assert(got() == Seq(folded))
      // compact materializes every fold; LATER fragments fold ON TOP —
      // incl. listagg, whose compacted prefix must STAY a prefix (the
      // compacted row's ladder precedes every later fragment's)
      spark.sql(s"CALL $cat.system.compact('m.tf', 1)")
      assert(got() == Seq(folded), "compact is content-neutral")
      ins((1L, true, false, 2.0, "d", "fourth"))
      assert(got() == Seq((1L, false, true, 60.0, "a,b,c,d", "first")))
    }
  }

  test("aggregation engine: declared per-column folds; unconfigured columns default to last_non_null") {
    withLake("ag") { (cat, _) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.tagg (k BIGINT NOT NULL, hits BIGINT,
           |  label STRING)
           |PARTITIONED BY (bucket(4, k))
           |TBLPROPERTIES ('versioned'='true', 'primary-key'='k',
           |  'merge-engine'='aggregation',
           |  'fields.hits.aggregate-function'='sum')""".stripMargin)
      def got() = spark.table(s"$cat.m.tagg")
        .as[(Long, Option[Long], Option[String])]
        .collect().sortBy(_._1).toSeq
      Seq((1L, Some(5L), Some("a")), (2L, Some(7L), None: Option[String]))
        .toDF("k", "hits", "label").write.mode("append")
        .insertInto(s"$cat.m.tagg")
      Seq((1L, Some(3L), None: Option[String]), (2L, Some(1L), Some("b")))
        .toDF("k", "hits", "label").write.mode("append")
        .insertInto(s"$cat.m.tagg")
      assert(got() == Seq((1L, Some(8L), Some("a")),
        (2L, Some(8L), Some("b"))),
        "hits SUM across fragments, label last-non-null")
      // an equality delete resets the fold; re-insert starts fresh
      spark.sql(s"DELETE FROM $cat.m.tagg WHERE k = 1")
      Seq((1L, Some(2L), Some("c"))).toDF("k", "hits", "label")
        .write.mode("append").insertInto(s"$cat.m.tagg")
      assert(got().head == ((1L, Some(2L), Some("c"))))
      // compact materializes the fold; later fragments fold ON TOP of
      // the compacted row (sum is associative — composition is exact)
      spark.sql(s"CALL $cat.system.compact('m.tagg', 1)")
      assert(got().head == ((1L, Some(2L), Some("c"))))
      Seq((1L, Some(4L), None: Option[String])).toDF("k", "hits", "label")
        .write.mode("append").insertInto(s"$cat.m.tagg")
      assert(got().head == ((1L, Some(6L), Some("c"))))
      // validation: folds need the aggregation engine; unknown fn and
      // key-column folds are loud
      def fails(sql: String, frag: String): Unit = {
        val e = intercept[Exception](spark.sql(sql))
        assert(e.getMessage.contains(frag), e.getMessage)
      }
      fails(
        s"""CREATE TABLE $cat.m.bad6 (k BIGINT NOT NULL, hits BIGINT)
           |PARTITIONED BY (bucket(2, k))
           |TBLPROPERTIES ('versioned'='true', 'primary-key'='k',
           |  'fields.hits.aggregate-function'='sum')""".stripMargin,
        "aggregation")
      fails(
        s"""CREATE TABLE $cat.m.bad7 (k BIGINT NOT NULL, hits BIGINT)
           |PARTITIONED BY (bucket(2, k))
           |TBLPROPERTIES ('versioned'='true', 'primary-key'='k',
           |  'merge-engine'='aggregation',
           |  'fields.hits.aggregate-function'='median')""".stripMargin,
        "aggregate-function")
      fails(
        s"""CREATE TABLE $cat.m.bad8 (k BIGINT NOT NULL, hits BIGINT)
           |PARTITIONED BY (bucket(2, k))
           |TBLPROPERTIES ('versioned'='true', 'primary-key'='k',
           |  'merge-engine'='aggregation',
           |  'fields.k.aggregate-function'='sum')""".stripMargin,
        "PRIMARY KEY")
    }
  }

  test("blind full-key DELETE writes ONE equality-delete row (no data read/rewrite); re-insert revives the key") {
    withLake("d") { (cat, lake) =>
      mkTable(cat)
      val dir = lake.resolve("m/t.parquet")
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "v", "amt")
        .write.mode("append").insertInto(s"$cat.m.t") // seq 1
      val dataBefore = Snapshots.dataFiles(Snapshots.latest(dir).get.files)
      spark.sql(s"DELETE FROM $cat.m.t WHERE k = 1") // seq 2 (blind)
      val s2 = Snapshots.latest(dir).get
      assert(Snapshots.dataFiles(s2.files).sorted == dataBefore.sorted,
        "blind delete must not touch data files")
      val eq = PkTables.eqDeleteFiles(s2.files)
      assert(eq.size == 1, s2.files)
      assert(s2.summary.get("added-eqdelete-files").contains(1L))
      assert(rows(cat) == Seq((2L, "b", 20L)))
      // time travel BEFORE the delete still sees the key
      assert(spark.sql(s"SELECT k FROM $cat.m.t VERSION AS OF 1")
        .as[Long].collect().sorted.toSeq == Seq(1L, 2L))
      // REVIVE: a later append (higher seq than the delete) wins
      Seq((1L, "back", 11L)).toDF("k", "v", "amt")
        .write.mode("append").insertInto(s"$cat.m.t") // seq 3
      assert(rows(cat) == Seq((1L, "back", 11L), (2L, "b", 20L)))
    }
  }

  test("predicate DELETE evaluates over RESOLVED rows (an old version matching the predicate must not kill the key)") {
    withLake("e") { (cat, _) =>
      mkTable(cat)
      Seq((1L, "open", 1L), (2L, "open", 2L)).toDF("k", "v", "amt")
        .write.mode("append").insertInto(s"$cat.m.t")
      // key 1's CURRENT version is 'closed'; only its OLD version is 'open'
      Seq((1L, "closed", 1L)).toDF("k", "v", "amt")
        .write.mode("append").insertInto(s"$cat.m.t")
      spark.sql(s"DELETE FROM $cat.m.t WHERE v = 'open'")
      assert(rows(cat) == Seq((1L, "closed", 1L)),
        "key 2 deleted; key 1 kept (its resolved row is 'closed')")
    }
  }

  test("UPDATE appends a new version + equality delete; key-changing UPDATE retires the old key") {
    withLake("f") { (cat, lake) =>
      mkTable(cat)
      val dir = lake.resolve("m/t.parquet")
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "v", "amt")
        .write.mode("append").insertInto(s"$cat.m.t")
      val dataBefore = Snapshots.dataFiles(Snapshots.latest(dir).get.files)
      spark.sql(s"UPDATE $cat.m.t SET amt = amt + 5 WHERE k = 2")
      assert(dataBefore.toSet.subsetOf(
        Snapshots.dataFiles(Snapshots.latest(dir).get.files).toSet),
        "UPDATE must not rewrite data files")
      assert(rows(cat) == Seq((1L, "a", 10L), (2L, "b", 25L)))
      // key-changing update: old key retired, new key live
      spark.sql(s"UPDATE $cat.m.t SET k = 3 WHERE k = 1")
      assert(rows(cat) == Seq((2L, "b", 25L), (3L, "a", 10L)))
    }
  }

  test("MERGE INTO: matched update / matched delete / not-matched insert in ONE commit over resolved rows") {
    withLake("g") { (cat, lake) =>
      mkTable(cat)
      val dir = lake.resolve("m/t.parquet")
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
        .toDF("k", "v", "amt").write.mode("append")
        .insertInto(s"$cat.m.t")
      // shadow key 2 so the MERGE sees its resolved version
      Seq((2L, "b2", 21L)).toDF("k", "v", "amt")
        .write.mode("append").insertInto(s"$cat.m.t")
      val vBefore = Snapshots.latest(dir).get.version
      Seq((1L, 100L), (2L, -1L), (9L, 90L)).toDF("mk", "mamt")
        .createOrReplaceTempView("pk_src")
      spark.sql(
        s"""MERGE INTO $cat.m.t t USING pk_src s ON t.k = s.mk
           |WHEN MATCHED AND s.mamt < 0 THEN DELETE
           |WHEN MATCHED THEN UPDATE SET amt = s.mamt
           |WHEN NOT MATCHED THEN INSERT (k, v, amt) VALUES (s.mk, 'new', s.mamt)"""
          .stripMargin)
      assert(Snapshots.latest(dir).get.version == vBefore + 1L,
        "one commit")
      assert(rows(cat) == Seq((1L, "a", 100L), (3L, "c", 30L),
        (9L, "new", 90L)))
    }
  }

  test("non-key predicates stay ABOVE the dedup; key-only predicates push beneath with bucket pruning; the aggregate is partial") {
    withLake("h") { (cat, _) =>
      mkTable(cat)
      (1L to 400L).map(i => (i, "old", i)).toDF("k", "v", "amt")
        .write.mode("append").insertInto(s"$cat.m.t")
      (1L to 200L).map(i => (i, "new", i + 1000L)).toDF("k", "v", "amt")
        .write.mode("append").insertInto(s"$cat.m.t")
      // semantic check: keys 1..200 are 'new' now — a pre-dedup 'old'
      // filter would wrongly resurface them
      val q = spark.sql(s"SELECT k FROM $cat.m.t WHERE v = 'old'")
      assert(q.as[Long].collect().sorted.toSeq == (201L to 400L))
      val p = planOf(q)
      assert(p.contains("Aggregate"), p)
      // the key-only point lookup prunes buckets BENEATH the dedup
      val q2 = spark.sql(s"SELECT v FROM $cat.m.t WHERE k = 7")
      assert(q2.as[String].collect().toSeq == Seq("new"))
      val p2 = planOf(q2)
      assert(p2.contains("partial_max_by") || p2.contains("partial_min_by"),
        p2) // map-side combine
      // bucket pruning: the data-side listing reads a _gbucket subset
      assert(p2.contains(PartitionSpec.BucketDir), p2)
    }
  }

  test("plan pin: a key point-lookup prunes the EQUALITY-DELETE side to the key's bucket (the _gmor_tdir= scope)") {
    withLake("ep") { (cat, lake) =>
      mkTable(cat)
      val dir = lake.resolve("m/t.parquet")
      (1L to 40L).map(i => (i, s"v$i", i)).toDF("k", "v", "amt")
        .write.mode("append").insertInto(s"$cat.m.t")
      // two blind deletes whose keys land in DIFFERENT buckets
      val bucketOf: Long => Int = k =>
        org.apache.spark.sql.catalyst.expressions.Pmod(
          org.apache.spark.sql.catalyst.expressions.Murmur3Hash(Seq(
            org.apache.spark.sql.catalyst.expressions.Literal(k)), 42),
          org.apache.spark.sql.catalyst.expressions.Literal(4))
          .eval(null).asInstanceOf[Int]
      val k1 = 1L
      val k2 = (2L to 40L).find(k => bucketOf(k) != bucketOf(k1)).get
      spark.sql(s"DELETE FROM $cat.m.t WHERE k = $k1")
      spark.sql(s"DELETE FROM $cat.m.t WHERE k = $k2")
      val eq = PkTables.eqDeleteFiles(Snapshots.latest(dir).get.files)
      assert(eq.size == 2, eq)
      val Seq(f1, f2) = Seq(k1, k2).map(k => eq.find(f =>
        MorDeletes.targetDirOf(f).exists(_.toString ==
          s"${PartitionSpec.BucketDir}=${bucketOf(k)}")).get)
      // survivor lookup in k1's bucket: the pruned churn rides the
      // scan-local broadcast VECTOR (r16 — no join operator at all);
      // a one-key read at 100 TB reads one bucket's delete churn,
      // not the table's
      val survivor = (2L to 40L).find(k =>
        bucketOf(k) == bucketOf(k1) && k != k2).get
      val plan = planOf(
        spark.sql(s"SELECT v FROM $cat.m.t WHERE k = $survivor"))
      assert(!plan.contains("Join"),
        s"pruned eq churn must ride the vector filter:\n$plan")
      assert(plan.contains("eqdeletevectorkilled"), plan)
      // the JOIN fallback (vector disabled) lists ONLY that bucket's
      // eq file — the pruning the vector build reuses
      spark.conf.set(MorDeletes.VectorMaxConf, "0")
      try {
        spark.catalog.clearCache()
        val jplan = planOf(
          spark.sql(s"SELECT v FROM $cat.m.t WHERE k = $survivor"))
        assert(jplan.contains(Snapshots.basename(f1)), jplan)
        assert(!jplan.contains(Snapshots.basename(f2)),
          s"other bucket's eq file must prune:\n$jplan")
      } finally spark.conf.unset(MorDeletes.VectorMaxConf)
    }
  }

  test("key-aware compact materializes resolution: same content, delete files gone, dedup aggregate gone, metadata fast paths back") {
    withLake("i") { (cat, lake) =>
      mkTable(cat)
      val dir = lake.resolve("m/t.parquet")
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
        .toDF("k", "v", "amt").write.mode("append").insertInto(s"$cat.m.t")
      Seq((2L, "b2", 21L)).toDF("k", "v", "amt")
        .write.mode("append").insertInto(s"$cat.m.t")
      spark.sql(s"DELETE FROM $cat.m.t WHERE k = 3")
      val before = rows(cat)
      assert(before == Seq((1L, "a", 10L), (2L, "b2", 21L)))
      spark.sql(s"CALL $cat.system.compact('m.t', 1)")
      val s = Snapshots.latest(dir).get
      assert(PkTables.eqDeleteFiles(s.files).isEmpty, s.files)
      assert(rows(cat) == before, "compact is content-neutral")
      // resolved-clean: the dedup aggregate is GONE from the plan
      val p = planOf(spark.table(s"$cat.m.t"))
      assert(!p.contains("max_by"), p)
      // and an append makes it dirty again
      Seq((1L, "a2", 11L)).toDF("k", "v", "amt")
        .write.mode("append").insertInto(s"$cat.m.t")
      assert(rows(cat) == Seq((1L, "a2", 11L), (2L, "b2", 21L)))
      assert(planOf(spark.table(s"$cat.m.t")).contains("max_by"))
    }
  }

  test("CREATE validation: NOT NULL keys, key-covering partition spec, versioned required, engine names") {
    withLake("j") { (cat, _) =>
      def fails(sql: String, frag: String): Unit = {
        val e = intercept[Exception](spark.sql(sql))
        assert(e.getMessage != null && e.getMessage.contains(frag),
          s"$sql => ${e.getMessage}")
      }
      fails(
        s"""CREATE TABLE $cat.m.bad1 (k BIGINT, v STRING)
           |PARTITIONED BY (bucket(4, k))
           |TBLPROPERTIES ('versioned'='true', 'primary-key'='k')"""
          .stripMargin, "NOT NULL")
      fails(
        s"""CREATE TABLE $cat.m.bad2 (k BIGINT NOT NULL, v STRING, g STRING)
           |PARTITIONED BY (g)
           |TBLPROPERTIES ('versioned'='true', 'primary-key'='k')"""
          .stripMargin, "not part of the primary key")
      fails(
        s"""CREATE TABLE $cat.m.bad3 (k BIGINT NOT NULL, v STRING)
           |PARTITIONED BY (bucket(4, k))
           |TBLPROPERTIES ('primary-key'='k')"""
          .stripMargin, "versioned")
      fails(
        s"""CREATE TABLE $cat.m.bad4 (k BIGINT NOT NULL, v STRING)
           |PARTITIONED BY (bucket(4, k))
           |TBLPROPERTIES ('versioned'='true', 'primary-key'='k',
           |  'merge-engine'='sort-merge')"""
          .stripMargin, "merge-engine")
      fails(
        s"""CREATE TABLE $cat.m.bad5 (k BIGINT NOT NULL, v STRING)
           |PARTITIONED BY (bucket(4, k))
           |TBLPROPERTIES ('versioned'='true', 'merge-engine'='deduplicate')"""
          .stripMargin, "primary-key")
      // PK columns are protected from rename/drop/retype — including
      // key columns the partition spec does NOT already protect
      spark.sql(
        s"""CREATE TABLE $cat.m.t2 (k BIGINT NOT NULL, s STRING NOT NULL,
           |  amt BIGINT)
           |PARTITIONED BY (bucket(4, k))
           |TBLPROPERTIES ('versioned'='true', 'primary-key'='k,s')"""
          .stripMargin)
      val e = intercept[Exception](
        spark.sql(s"ALTER TABLE $cat.m.t2 RENAME COLUMN s TO ss"))
      assert(e.getMessage.contains("PRIMARY KEY"), e.getMessage)
    }
  }

  test("the change feed over a PK table is the RESOLVED changelog; an incremental MV over a PK source folds it correctly") {
    withLake("k") { (cat, _) =>
      mkTable(cat)
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "v", "amt")
        .write.mode("append").insertInto(s"$cat.m.t")           // v1
      MaterializedView.create(spark, s"$cat.m.mv", s"$cat.m.t",
        Seq("k"), Seq("v"), Seq("amt" -> "sum"))
      Seq((1L, "a", 11L)).toDF("k", "v", "amt")
        .write.mode("append").insertInto(s"$cat.m.t")           // v2 upsert
      spark.sql(s"DELETE FROM $cat.m.t WHERE k = 2")            // v3 eq-del
      // the per-version feed carries RESOLVED transitions: the upsert
      // is ONE u (10 → 11), the equality delete ONE d — shadowed
      // versions never appear as inserts
      val ch = Catalog.readTableChanges(spark, s"$cat.m.t", Seq("k"), 1L, 3L)
        .selectExpr("op", "version", "before.amt AS ba", "after.amt AS aa")
        .as[(String, Long, Option[Long], Option[Long])]
        .collect().sortBy(r => (r._2, r._1)).toSeq
      assert(ch == Seq(("u", 2L, Some(10L), Some(11L)),
        ("d", 3L, Some(20L), None)), ch)
      // the MV fold over that resolved feed equals the recompute
      MaterializedView.refresh(spark, s"$cat.m.mv")
      assert(spark.table(s"$cat.m.mv").select("v", "sum_amt")
        .as[(String, Long)].collect().sortBy(_._1).toSeq ==
        Seq(("a", 11L)))
    }
  }

  test("a delete-carrying commit conflicts when data files appeared since its base (validateNoNewData)") {
    withLake("l") { (cat, _) =>
      val base = Seq("f1.parquet", "_graft_eqdeletes/e1.parquet")
      // unchanged: fine
      PkTables.validateNoNewData("DELETE", base)(base)
      // new eq-delete file: fine (deletes compose by sequence)
      PkTables.validateNoNewData("DELETE", base)(
        base :+ "_graft_eqdeletes/e2.parquet")
      // new DATA file: conflict
      intercept[CommitConflictException](
        PkTables.validateNoNewData("DELETE", base)(base :+ "f2.parquet"))
    }
  }
}

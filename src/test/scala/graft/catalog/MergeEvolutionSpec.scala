package graft.catalog

import graft.SparkSpec
import java.nio.file.{Files, Path}

/** `MERGE INTO … WITH SCHEMA EVOLUTION` (Spark 4's clause, enabled by
  * [[org.apache.spark.sql.connector.catalog.TableCapability.AUTOMATIC_SCHEMA_EVOLUTION]]
  * on the lake tables): a MERGE whose source carries NEW columns
  * evolves the target's schema metadata-only (the catalog's ADD
  * COLUMN path) before the row-level write plans — the CDC
  * schema-drift scenario. The laws:
  *
  *  - a new source column ADDs to the target; pre-existing rows read
  *    it as NULL; the merge's own updates/inserts populate it;
  *  - WITHOUT the clause, the same merge fails to resolve (no silent
  *    evolution);
  *  - composes with merge-on-read delta DML and with PRIMARY-KEY
  *    tables. */
class MergeEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def withLake(tag: String)(body: (String, Path) => Unit): Unit = {
    val lake = Files.createTempDirectory(s"graft-mev-$tag")
    Files.createDirectories(lake.resolve("m"))
    val cat = s"mev$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftLakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", lake.toString)
    try body(cat, lake)
    finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.path")
      spark.conf.unset(MorDeletes.ModeConf)
    }
  }

  test("MERGE WITH SCHEMA EVOLUTION adds the source's new column; without the clause it fails to resolve") {
    withLake("a") { (cat, _) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (k BIGINT, v STRING, region STRING)
           |PARTITIONED BY (bucket(4, k))
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      Seq((1L, "a", "EU"), (2L, "b", "US"), (3L, "c", "EU"))
        .toDF("k", "v", "region").write.mode("append")
        .insertInto(s"$cat.m.t")
      Seq((2L, 20L, "US"), (9L, 90L, "EU")).toDF("mk", "score", "mregion")
        .createOrReplaceTempView("mev_src")
      // no clause: the new column must NOT silently evolve
      val e = intercept[Exception](spark.sql(
        s"""MERGE INTO $cat.m.t t USING mev_src s ON t.k = s.mk
           |WHEN MATCHED THEN UPDATE SET v = concat(t.v, '!'),
           |  score = s.score
           |WHEN NOT MATCHED THEN INSERT (k, v, region, score)
           |  VALUES (s.mk, 'new', s.mregion, s.score)""".stripMargin))
      assert(e.getMessage != null, e)
      spark.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.m.t t
           |USING mev_src s ON t.k = s.mk
           |WHEN MATCHED THEN UPDATE SET v = concat(t.v, '!'),
           |  score = s.score
           |WHEN NOT MATCHED THEN INSERT (k, v, region, score)
           |  VALUES (s.mk, 'new', s.mregion, s.score)""".stripMargin)
      val got = spark.table(s"$cat.m.t")
        .select("k", "v", "score")
        .as[(Long, String, Option[Long])].collect().sortBy(_._1).toSeq
      assert(got == Seq((1L, "a", None), (2L, "b!", Some(20L)),
        (3L, "c", None), (9L, "new", Some(90L))),
        "untouched rows read NULL; merged rows carry the new column")
    }
  }

  test("IDENTITY-partitioned targets evolve through FULL 3-action merges (r16: append-at-end ADD COLUMN lifts the UPDATE-only limit)") {
    withLake("id") { (cat, _) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (k BIGINT, v STRING, region STRING)
           |PARTITIONED BY (region)
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      Seq((1L, "a", "EU"), (2L, "b", "US")).toDF("k", "v", "region")
        .write.mode("append").insertInto(s"$cat.m.t")
      Seq((2L, 20L)).toDF("mk", "score").createOrReplaceTempView("mev_srcid")
      // UPDATE evolution: the evolved column appends at the END (past
      // the identity partition column — the rebuild order Spark's
      // insert-action alignment expects)
      spark.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.m.t t
           |USING mev_srcid s ON t.k = s.mk
           |WHEN MATCHED THEN UPDATE SET score = s.score""".stripMargin)
      assert(spark.table(s"$cat.m.t").columns.toSeq ==
        Seq("k", "v", "region", "score"))
      assert(spark.table(s"$cat.m.t").select("k", "score")
        .as[(Long, Option[Long])].collect().sortBy(_._1).toSeq ==
        Seq((1L, None), (2L, Some(20L))))
      // the r15 UPDATE-only limit is LIFTED: an evolving merge with
      // UPDATE + INSERT actions (and a second fresh column) lands
      // end-to-end — rows route to their identity partitions, old
      // rows read the new columns as NULL
      Seq((9L, 90L, "EU"), (2L, 22L, "US")).toDF("mk", "score2", "mregion")
        .createOrReplaceTempView("mev_srcid2")
      spark.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.m.t t
           |USING mev_srcid2 s ON t.k = s.mk
           |WHEN MATCHED THEN UPDATE SET score2 = s.score2
           |WHEN NOT MATCHED THEN INSERT (k, v, region, score2)
           |  VALUES (s.mk, 'new', s.mregion, s.score2)""".stripMargin)
      assert(spark.table(s"$cat.m.t").columns.toSeq ==
        Seq("k", "v", "region", "score", "score2"))
      assert(spark.table(s"$cat.m.t")
        .select("k", "v", "region", "score", "score2")
        .as[(Long, String, String, Option[Long], Option[Long])]
        .collect().sortBy(_._1).toSeq ==
        Seq((1L, "a", "EU", None, None),
          (2L, "b", "US", Some(20L), Some(22L)),
          (9L, "new", "EU", None, Some(90L))))
      // partition pruning still serves the evolved layout
      assert(spark.table(s"$cat.m.t").where($"region" === "EU")
        .select("k").as[Long].collect().sorted.toSeq == Seq(1L, 9L))
    }
  }

  test("schema-evolving MERGE under merge-on-read: one position-delta commit, data files untouched") {
    withLake("b") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (k BIGINT, v STRING, region STRING)
           |PARTITIONED BY (region)
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      Seq((1L, "a", "EU"), (2L, "b", "US")).toDF("k", "v", "region")
        .write.mode("append").insertInto(s"$cat.m.t")
      val dir = lake.resolve("m/t.parquet")
      val dataBefore = Snapshots.dataFiles(Snapshots.latest(dir).get.files)
      Seq((1L, 11L)).toDF("mk", "score").createOrReplaceTempView("mev_src2")
      spark.conf.set(MorDeletes.ModeConf, MorDeletes.MergeOnRead)
      try spark.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.m.t t
           |USING mev_src2 s ON t.k = s.mk
           |WHEN MATCHED THEN UPDATE SET score = s.score""".stripMargin)
      finally spark.conf.unset(MorDeletes.ModeConf)
      val s2 = Snapshots.latest(dir).get
      assert(dataBefore.toSet.subsetOf(Snapshots.dataFiles(s2.files).toSet),
        "delta merge: original data files carried, not rewritten")
      assert(Snapshots.deleteFiles(s2.files).nonEmpty)
      assert(spark.table(s"$cat.m.t").select("k", "score")
        .as[(Long, Option[Long])].collect().sortBy(_._1).toSeq ==
        Seq((1L, Some(11L)), (2L, None)))
    }
  }

  test("schema-evolving MERGE into a PRIMARY-KEY table (evolution + eq-delete delta compose)") {
    withLake("c") { (cat, _) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (k BIGINT NOT NULL, v STRING)
           |PARTITIONED BY (bucket(4, k))
           |TBLPROPERTIES ('versioned'='true', 'primary-key'='k')"""
          .stripMargin)
      Seq((1L, "a"), (2L, "b")).toDF("k", "v")
        .write.mode("append").insertInto(s"$cat.m.t")
      // shadow key 1 so the evolving merge reads resolved rows
      Seq((1L, "a2")).toDF("k", "v")
        .write.mode("append").insertInto(s"$cat.m.t")
      Seq((1L, 10L), (3L, 30L)).toDF("mk", "score")
        .createOrReplaceTempView("mev_src3")
      spark.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.m.t t
           |USING mev_src3 s ON t.k = s.mk
           |WHEN MATCHED THEN UPDATE SET score = s.score
           |WHEN NOT MATCHED THEN INSERT (k, v, score)
           |  VALUES (s.mk, 'new', s.score)""".stripMargin)
      assert(spark.table(s"$cat.m.t").select("k", "v", "score")
        .as[(Long, String, Option[Long])].collect().sortBy(_._1).toSeq ==
        Seq((1L, "a2", Some(10L)), (2L, "b", None), (3L, "new", Some(30L))))
    }
  }
}

package graft.catalog

import graft.SparkSpec
import java.nio.file.{Files, Path}

/** `'sequence.field'` ([[PkTables.SeqFieldProp]] — Paimon's declared
  * version ordering). The laws:
  *
  *  - resolution orders by `(field, commit seq, file, pos)`: a
  *    late-ARRIVING append carrying an older field value (a CDC
  *    replay) never beats the newer value it replays past;
  *  - in-batch duplicate keys resolve by the field, not plan order;
  *  - predicate DELETE/UPDATE/MERGE capture the retired row's field:
  *    a replay below it stays dead, a genuinely newer version
  *    revives; BLIND full-key deletes keep arrival semantics (any
  *    later append revives — the r15 revive law);
  *  - a field-LOWERING update never eats its own insert (same-commit
  *    exclusion);
  *  - key-aware compact preserves field semantics (the materialized
  *    winner still beats later lower-field replays);
  *  - two RACING writers of one key: the field winner wins regardless
  *    of commit order;
  *  - declaration is validated: NOT NULL, non-key, orderable atomic,
  *    no first-row engine, no fold on the field. */
class PkSeqFieldSpec extends SparkSpec {
  import spark.implicits._

  private def withLake(tag: String)(body: (String, Path) => Unit): Unit = {
    val lake = Files.createTempDirectory(s"graft-pksf-$tag")
    Files.createDirectories(lake.resolve("m"))
    val cat = s"pksf$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftLakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", lake.toString)
    try body(cat, lake)
    finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.path")
    }
  }

  private def mkTable(cat: String): Unit =
    spark.sql(
      s"""CREATE TABLE $cat.m.t (k BIGINT NOT NULL, ts BIGINT NOT NULL,
         |  v STRING)
         |PARTITIONED BY (bucket(4, k))
         |TBLPROPERTIES ('versioned'='true', 'primary-key'='k',
         |  'sequence.field'='ts')""".stripMargin)

  private def ins(cat: String, rows: (Long, Long, String)*): Unit =
    rows.toSeq.toDF("k", "ts", "v").write.mode("append")
      .insertInto(s"$cat.m.t")

  private def all(cat: String): Seq[(Long, Long, String)] = {
    spark.catalog.clearCache()
    spark.table(s"$cat.m.t").as[(Long, Long, String)]
      .collect().sortBy(_._1).toSeq
  }

  test("late-arriving lower-field appends never win; in-batch duplicates resolve by field; time travel keeps per-snapshot ladders") {
    withLake("a") { (cat, _) =>
      mkTable(cat)
      ins(cat, (1L, 10L, "new"), (3L, 1L, "x"))                // seq 1
      ins(cat, (1L, 5L, "stale-replay"))                       // seq 2
      // in-batch duplicates: the FIELD picks, not plan order
      ins(cat, (2L, 3L, "a"), (2L, 7L, "b"), (2L, 5L, "c"))    // seq 3
      assert(all(cat) == Seq((1L, 10L, "new"), (2L, 7L, "b"),
        (3L, 1L, "x")))
      // equal field values tie-break by ARRIVAL (commit seq)
      ins(cat, (3L, 1L, "x2"))                                 // seq 4
      assert(all(cat).find(_._1 == 3L).contains((3L, 1L, "x2")))
      // each snapshot resolves its own ladder
      assert(spark.sql(s"SELECT v FROM $cat.m.t VERSION AS OF 2")
        .as[String].collect().sorted.toSeq == Seq("new", "x"))
    }
  }

  test("predicate deletes capture the retired field: replays stay dead, newer versions revive; blind deletes keep arrival revive") {
    withLake("b") { (cat, _) =>
      mkTable(cat)
      ins(cat, (1L, 10L, "new"), (2L, 4L, "two"))              // seq 1
      // predicate (non-key) DELETE → delta path, field captured
      spark.sql(s"DELETE FROM $cat.m.t WHERE v = 'new'")       // seq 2
      assert(all(cat) == Seq((2L, 4L, "two")))
      ins(cat, (1L, 8L, "older-replay"))                       // seq 3
      assert(all(cat) == Seq((2L, 4L, "two")),
        "a replay BELOW the retired field must stay dead")
      ins(cat, (1L, 12L, "newer"))                             // seq 4
      // the dirty full read rides the BUCKET-LOCAL plan: field-aware
      // scan-local eq vector, no join, no exchange
      spark.catalog.clearCache()
      val df = spark.table(s"$cat.m.t")
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("pk-bucket-resolve") &&
        !plan.contains("Exchange") && !plan.contains("Join"), plan)
      assert(all(cat) == Seq((1L, 12L, "newer"), (2L, 4L, "two")),
        "a version ABOVE the retired field revives")
      // BLIND full-key delete: arrival semantics (r15 revive law)
      spark.sql(s"DELETE FROM $cat.m.t WHERE k = 2")           // seq 5
      assert(all(cat) == Seq((1L, 12L, "newer")))
      ins(cat, (2L, 1L, "revive-low"))                         // seq 6
      assert(all(cat).find(_._1 == 2L).contains((2L, 1L, "revive-low")),
        "any later append revives a BLIND delete")
    }
  }

  test("a field-lowering UPDATE never eats its own insert (same-commit exclusion)") {
    withLake("c") { (cat, _) =>
      mkTable(cat)
      ins(cat, (4L, 9L, "high"))                               // seq 1
      spark.sql(
        s"UPDATE $cat.m.t SET ts = 2, v = 'downgrade' WHERE k = 4")
      assert(all(cat) == Seq((4L, 2L, "downgrade")))
    }
  }

  test("key-aware compact preserves field semantics; eq-delete minor compaction keeps both delete families") {
    withLake("d") { (cat, lake) =>
      mkTable(cat)
      ins(cat, (1L, 10L, "ten"), (2L, 5L, "five"), (3L, 7L, "seven")) // 1
      ins(cat, (1L, 12L, "twelve"))                            // seq 2
      spark.sql(s"DELETE FROM $cat.m.t WHERE v = 'five'")      // 3: field
      spark.sql(s"DELETE FROM $cat.m.t WHERE k = 3")           // 4: blind
      spark.sql(s"DELETE FROM $cat.m.t WHERE v = 'twelve'")    // 5: field
      val before = all(cat)
      assert(before.isEmpty)
      // merge the eq files (two families per key stay separate)
      spark.sql(s"CALL $cat.system.rewrite_eqdelete_files('m.t')")
      assert(all(cat) == before)
      // replay below the retired fields stays dead post-merge
      ins(cat, (1L, 11L, "replay-11"), (2L, 4L, "replay-4"))
      assert(all(cat).isEmpty,
        "replays below retired fields must stay dead after the merge")
      // blind-deleted key revives on any append; field keys need newer
      ins(cat, (3L, 1L, "blind-revive"), (1L, 13L, "thirteen"))
      assert(all(cat) == Seq((1L, 13L, "thirteen"),
        (3L, 1L, "blind-revive")))
      // compact materializes; later lower-field replays still lose
      spark.sql(s"CALL $cat.system.compact('m.t', 1)")
      val dir = lake.resolve("m/t.parquet")
      assert(PkTables.resolvedClean(dir, Snapshots.latest(dir).get))
      assert(all(cat) == Seq((1L, 13L, "thirteen"),
        (3L, 1L, "blind-revive")))
      ins(cat, (1L, 9L, "post-compact-replay"))
      assert(all(cat).find(_._1 == 1L).contains((1L, 13L, "thirteen")),
        "compacted winners must still beat lower-field replays")
    }
  }

  test("a DEAD replay emits NO changelog event: the resolved endpoint diff of a field table skips it") {
    withLake("h") { (cat, _) =>
      mkTable(cat)
      ins(cat, (1L, 10L, "new"), (2L, 5L, "two"))              // v1
      ins(cat, (1L, 4L, "stale-replay"))                       // v2: dead
      val diff = graft.catalog.Catalog.readPkTableChanges(
        spark, s"$cat.m.t", 1L, 2L)
      assert(diff.isEmpty,
        "a replay that loses the field ladder changed NOTHING — " +
          "no c/u/d may leak downstream")
      ins(cat, (1L, 12L, "winner"))                            // v3: wins
      val diff2 = graft.catalog.Catalog.readPkTableChanges(
        spark, s"$cat.m.t", 2L, 3L)
      assert(diff2.select("op").as[String].collect().toSeq == Seq("u"))
      assert(diff2.select("after.v").as[String].collect().toSeq ==
        Seq("winner"))
    }
  }

  test("aggregation folds compose with the field ladder: listagg concats in FIELD order, not arrival") {
    withLake("g") { (cat, _) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.tl (k BIGINT NOT NULL, ts BIGINT NOT NULL,
           |  tag STRING)
           |PARTITIONED BY (bucket(2, k))
           |TBLPROPERTIES ('versioned'='true', 'primary-key'='k',
           |  'merge-engine'='aggregation', 'sequence.field'='ts',
           |  'fields.tag.aggregate-function'='listagg')""".stripMargin)
      def ins(rows: (Long, Long, String)*) =
        rows.toSeq.toDF("k", "ts", "tag").write.mode("append")
          .insertInto(s"$cat.m.tl")
      ins((1L, 3L, "c"))
      ins((1L, 1L, "a")) // late arrival, earliest field
      ins((1L, 2L, "b"))
      val got = spark.table(s"$cat.m.tl").select("tag").as[String]
        .collect().toSeq
      assert(got == Seq("a,b,c"),
        s"listagg must order by the declared field: $got")
    }
  }

  test("ONE kill law everywhere: two pending field deletes resolve by the per-key lex-max — vector, join, and compact agree") {
    withLake("i") { (cat, lake) =>
      mkTable(cat)
      // insert ts=5, UPDATE→ts=10, UPDATE→ts=2: two PENDING field
      // deletes per key — (5, seq2) and (10, seq3) — plus the second
      // update's own insert (2, seq3). The canonical law keeps only
      // the lex-max (10, seq3) pair: the same-commit exclusion lets
      // the user's latest value (ts=2) survive. Testing a row against
      // EVERY raw pair instead would let the STALE superseded (5,seq2)
      // delete kill it — the r16 vector-vs-join divergence.
      ins(cat, (1L, 5L, "five"))                               // seq 1
      spark.sql(s"UPDATE $cat.m.t SET ts = 10, v = 'ten' WHERE k = 1")
      spark.sql(s"UPDATE $cat.m.t SET ts = 2, v = 'two' WHERE k = 1")
      val expect = Seq((1L, 2L, "two"))
      assert(all(cat) == expect, "vector path (default ceiling)")
      // force the JOIN fallback (vectors disabled) — same answer
      spark.conf.set(MorDeletes.VectorMaxConf, "0")
      try assert(all(cat) == expect,
        "join fallback must apply the SAME canonical kill law")
      finally spark.conf.unset(MorDeletes.VectorMaxConf)
      // the eq-file merge is content-neutral under the shared law
      spark.sql(s"CALL $cat.system.rewrite_eqdelete_files('m.t')")
      assert(all(cat) == expect)
      // compact resolves through resolvedRows — same law, same rows
      spark.sql(s"CALL $cat.system.compact('m.t', 1)")
      val dir = lake.resolve("m/t.parquet")
      assert(PkTables.resolvedClean(dir, Snapshots.latest(dir).get))
      assert(all(cat) == expect,
        "compact must not drop the live same-commit row")
    }
  }

  test("floating-point sequence fields order by catalyst semantics (-0.0 == 0.0) on every path") {
    withLake("j") { (cat, _) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (k BIGINT NOT NULL, ts DOUBLE NOT NULL,
           |  v STRING)
           |PARTITIONED BY (bucket(4, k))
           |TBLPROPERTIES ('versioned'='true', 'primary-key'='k',
           |  'sequence.field'='ts')""".stripMargin)
      def insD(rows: (Long, Double, String)*): Unit =
        rows.toSeq.toDF("k", "ts", "v").write.mode("append")
          .insertInto(s"$cat.m.t")
      insD((1L, 0.0, "zero"))                                  // seq 1
      spark.sql(s"DELETE FROM $cat.m.t WHERE v = 'zero'")      // seq 2: field 0.0
      // -0.0 EQUALS the retired 0.0 under catalyst ordering, so the
      // equal-field tie breaks by ARRIVAL: the later append revives.
      // Raw java compareTo would order -0.0 < 0.0 and keep it dead on
      // the vector path only — a path divergence.
      insD((1L, -0.0, "negzero"))                              // seq 3
      def names() = {
        spark.catalog.clearCache()
        spark.table(s"$cat.m.t").select("v").collect().map(_.getString(0))
          .toSeq
      }
      assert(names() == Seq("negzero"), "vector path")
      spark.conf.set(MorDeletes.VectorMaxConf, "0")
      try assert(names() == Seq("negzero"), "join path agrees")
      finally spark.conf.unset(MorDeletes.VectorMaxConf)
    }
  }

  test("racing writers of one key: the field winner wins regardless of commit order") {
    withLake("e") { (cat, _) =>
      mkTable(cat)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      try {
        val hi = scala.concurrent.Future { ins(cat, (9L, 100L, "hi")) }
        val lo = scala.concurrent.Future { ins(cat, (9L, 50L, "lo")) }
        scala.concurrent.Await.ready(hi,
          scala.concurrent.duration.Duration(120, "s"))
        scala.concurrent.Await.ready(lo,
          scala.concurrent.duration.Duration(120, "s"))
        assert(all(cat) == Seq((9L, 100L, "hi")),
          "blind appends never conflict; the FIELD picks the winner")
      } finally pool.shutdown()
    }
  }

  test("declaration validation: NOT NULL, non-key, orderable atomic, no first-row, no fold on the field") {
    withLake("f") { (cat, _) =>
      def fails(ddl: String, frag: String): Unit = {
        val e = intercept[Exception](spark.sql(ddl))
        assert(Option(e.getMessage).exists(_.contains(frag)),
          s"expected '$frag' in: ${e.getMessage}")
      }
      fails(
        s"""CREATE TABLE $cat.m.x1 (k BIGINT NOT NULL, ts BIGINT)
           |PARTITIONED BY (bucket(4, k))
           |TBLPROPERTIES ('versioned'='true', 'primary-key'='k',
           |  'sequence.field'='ts')""".stripMargin, "NOT NULL")
      fails(
        s"""CREATE TABLE $cat.m.x2 (k BIGINT NOT NULL, ts BIGINT NOT NULL)
           |PARTITIONED BY (bucket(4, k))
           |TBLPROPERTIES ('versioned'='true', 'primary-key'='k',
           |  'sequence.field'='k')""".stripMargin, "PRIMARY KEY")
      fails(
        s"""CREATE TABLE $cat.m.x3 (k BIGINT NOT NULL,
           |  ts ARRAY<BIGINT> NOT NULL)
           |PARTITIONED BY (bucket(4, k))
           |TBLPROPERTIES ('versioned'='true', 'primary-key'='k',
           |  'sequence.field'='ts')""".stripMargin, "orderable atomic")
      fails(
        s"""CREATE TABLE $cat.m.x4 (k BIGINT NOT NULL, ts BIGINT NOT NULL)
           |PARTITIONED BY (bucket(4, k))
           |TBLPROPERTIES ('versioned'='true', 'primary-key'='k',
           |  'merge-engine'='first-row', 'sequence.field'='ts')"""
          .stripMargin, "first-row")
      fails(
        s"""CREATE TABLE $cat.m.x5 (k BIGINT NOT NULL, ts BIGINT NOT NULL)
           |PARTITIONED BY (bucket(4, k))
           |TBLPROPERTIES ('versioned'='true', 'primary-key'='k',
           |  'merge-engine'='aggregation', 'sequence.field'='ts',
           |  'fields.ts.aggregate-function'='max')""".stripMargin,
        "cannot carry an aggregate-function fold")
      fails(
        s"""CREATE TABLE $cat.m.x6 (k BIGINT NOT NULL, ts BIGINT NOT NULL)
           |PARTITIONED BY (bucket(4, k))
           |TBLPROPERTIES ('versioned'='true', 'primary-key'='k',
           |  'sequence.field'='nope')""".stripMargin, "unknown column")
    }
  }
}

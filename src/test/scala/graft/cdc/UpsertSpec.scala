package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

case class Ticket(ticket_id: Long, status: String, cost: Double)
case class Meter(user_id: Long, spend_cents: Long, n_events: Long)

/** CDC upsert semantics — the reference's PK-table behavior
  * (tickets-cdc.sql:23-37; event mix of gen_data.py:171-200 incl.
  * scheduled→live→finished status transitions). */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def env(op: String, ts: Long, t: Ticket) =
    (op, ts, if (op == "d") Some(t) else None, if (op == "d") None else Some(t))

  private def changesDf(rows: Seq[(String, Long, Option[Ticket], Option[Ticket])]) =
    rows.toDF("op", "ts_ms", "before", "after")

  test("latestByKey keeps newest row per key without sorting partitions") {
    val df = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("id", "ts", "v")
    val out = Upsert.latestByKey(df, Seq("id"), Seq("ts")).orderBy("id")
      .as[(Long, Long, String)].collect()
    assert(out.toSeq == Seq((1L, 20L, "b"), (2L, 5L, "c")))
  }

  test("latestByKey tie-breaks on secondary order column") {
    val df = Seq((1L, 10L, 1L, "first"), (1L, 10L, 2L, "second"))
      .toDF("id", "ts", "seq", "v")
    val out = Upsert.latestByKey(df, Seq("id"), Seq("ts", "seq"))
      .select("v").as[String].collect()
    assert(out.toSeq == Seq("second"))
  }

  test("firstByKey keeps the FIRST version per key (first-row engine)") {
    val df = Seq((1L, 10L, "orig"), (1L, 20L, "dup"), (2L, 5L, "only"))
      .toDF("id", "ts", "v")
    val out = Upsert.firstByKey(df, Seq("id"), Seq("ts")).orderBy("id")
      .as[(Long, Long, String)].collect()
    assert(out.toSeq == Seq((1L, 10L, "orig"), (2L, 5L, "only")))
    // ties resolve on the secondary order column, dual of latestByKey
    val tied = Seq((1L, 10L, 2L, "second"), (1L, 10L, 1L, "first"))
      .toDF("id", "ts", "seq", "v")
    assert(Upsert.firstByKey(tied, Seq("id"), Seq("ts", "seq"))
      .select("v").as[String].collect().toSeq == Seq("first"))
  }

  test("applyChangelog: insert, update, delete, late-event ignored") {
    val t1 = Ticket(1, "scheduled", 10.0)
    val changes = changesDf(Seq(
      env("c", 1, t1),
      env("u", 3, t1.copy(status = "live")),      // status transition
      env("u", 2, t1.copy(status = "IGNORED")),   // older ts loses
      env("c", 1, Ticket(2, "scheduled", 5.0)),
      env("d", 2, Ticket(2, "scheduled", 5.0))))  // delete removes key
    val state = Upsert.applyChangelog(None, changes, Seq("ticket_id"))
      .as[Ticket].collect().sortBy(_.ticket_id)
    assert(state.toSeq == Seq(Ticket(1, "live", 10.0)))
  }

  test("applyChangelog onto existing state is idempotent on replay") {
    val s0 = Seq(Ticket(1, "scheduled", 10.0), Ticket(3, "finished", 7.0)).toDF()
    val changes = changesDf(Seq(
      env("u", 5, Ticket(1, "live", 10.0)),
      env("c", 5, Ticket(4, "scheduled", 1.0))))
    val once = Upsert.applyChangelog(Some(s0), changes, Seq("ticket_id"))
    val twice = Upsert.applyChangelog(Some(once), changes, Seq("ticket_id"))
    val expect = Set(Ticket(1, "live", 10.0), Ticket(3, "finished", 7.0),
      Ticket(4, "scheduled", 1.0))
    assert(once.as[Ticket].collect().toSet == expect)
    assert(twice.as[Ticket].collect().toSet == expect)
  }

  test("applyChangelog equal-ts winner is stable under shuffled replay") {
    // two updates to the same key at the SAME ts_ms: whatever wins must
    // win again when the batch is replayed in any row order/partition
    // layout — the monotonically_increasing_id tie-break this replaces
    // crowned whichever row happened to come later in the scan
    val rivals = Seq(
      env("u", 5, Ticket(1, "live", 10.0)),
      env("u", 5, Ticket(1, "finished", 99.0)))
    val winners = (0 to 3).map { i =>
      val ordered = if (i % 2 == 0) rivals else rivals.reverse
      val df = changesDf(ordered).repartition(1 + i)  // vary layout too
      Upsert.applyChangelog(None, df, Seq("ticket_id"))
        .as[Ticket].collect().toSeq
    }
    assert(winners.distinct.size == 1,
      s"equal-ts replay flipped the winner: $winners")
  }

  test("applyChangelog honors an explicit source seq over content order") {
    // envelope carries seq (LSN/offset): highest seq wins the ts tie,
    // regardless of content-hash order
    val changes = changesDf(Seq(
      env("u", 5, Ticket(1, "live", 10.0)),
      env("u", 5, Ticket(1, "finished", 99.0))))
      .withColumn("seq",
        when(col("after.status") === "live", 2L).otherwise(1L))
    val out = Upsert.applyChangelog(None, changes, Seq("ticket_id"))
      .as[Ticket].collect().toSeq
    assert(out == Seq(Ticket(1, "live", 10.0)))
  }

  test("materializeStream emits latest per key across triggers, honors delete") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Upsert.Envelope[Ticket]]
    val out = Upsert.materializeStream[Long, Ticket](
      mem.toDS(), e => e.after.orElse(e.before).get.ticket_id)
    val q = out.writeStream.format("memory").queryName("mv_state")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(
        Upsert.Envelope("c", 1L, None, Some(Ticket(1, "scheduled", 10.0))),
        Upsert.Envelope("c", 1L, None, Some(Ticket(2, "scheduled", 4.0))))
      q.processAllAvailable()
      mem.addData(
        Upsert.Envelope("u", 2L, Some(Ticket(1, "scheduled", 10.0)),
          Some(Ticket(1, "live", 10.0))),
        Upsert.Envelope("d", 3L, Some(Ticket(2, "scheduled", 4.0)), None))
      q.processAllAvailable()
      val rows = spark.table("mv_state").collect()
        .map(r => (r.getLong(0), Option(r.getStruct(1)).map(_.getString(1))))
      // last emission per key wins
      val latest = rows.zipWithIndex.groupBy(_._1._1)
        .map { case (k, vs) => k -> vs.maxBy(_._2)._1._2 }
      assert(latest == Map(1L -> Some("live"), 2L -> None))
    } finally q.stop()
  }

  test("partial-update merge engine: NULLs never overwrite; fold == one-shot") {
    // (key, sparse a, sparse b, ord)
    val rows = Seq(
      (1L, Some("a1"), None, 1L), (1L, None, Some("b1"), 2L),
      (1L, Some("a2"), None, 3L), (1L, None, None, 4L),
      (2L, None, Some("b2"), 1L), (2L, Some("a3"), None, 2L),
      (3L, None, None, 1L))
    val df = rows.toDF("k", "a", "b", "ord")
    val oneShot = Upsert.partialUpdate(df, Seq("k"), Seq("ord"))
      .select("k", "a", "b").as[(Long, Option[String], Option[String])]
      .collect().toSet
    // latest non-null per column; a row of all NULLs changes nothing
    assert(oneShot == Set(
      (1L, Some("a2"), Some("b1")), (2L, Some("a3"), Some("b2")),
      (3L, None, None)))
    // incremental fold over ord-ordered batches equals the one-shot
    val folded = rows.sortBy(_._4).grouped(2).foldLeft(None: Option[
        org.apache.spark.sql.DataFrame]) { (state, chunk) =>
      Some(Upsert.applyPartial(state, chunk.toDF("k", "a", "b", "ord"),
        Seq("k"), Seq("ord")))
    }.get.select("k", "a", "b")
      .as[(Long, Option[String], Option[String])].collect().toSet
    assert(folded == oneShot)
  }

  test("partial-update changelog rejects delete events loudly") {
    val changes = changesDf(Seq(
      env("c", 1, Ticket(1, "scheduled", 10.0)),
      env("d", 2, Ticket(1, "scheduled", 10.0))))
    val e = intercept[IllegalStateException] {
      Upsert.applyChangelogPartial(None, changes, Seq("ticket_id"))
    }
    assert(e.getMessage.contains("delete"))
  }

  test("retractable aggregation: update subtracts before-image, delete subtracts") {
    val aggs = Seq("spend_cents" -> "sum", "n_events" -> "count")
    val b1 = Seq(
      ("c", 1L, None: Option[Meter], Some(Meter(1, 100, 1))),
      ("c", 2L, None: Option[Meter], Some(Meter(1, 250, 1))),
      ("c", 3L, None: Option[Meter], Some(Meter(2, 10, 1))))
      .toDF("op", "ts_ms", "before", "after")
    val s1 = Upsert.applyChangelogAggregateRetract(None, b1, Seq("user_id"), aggs)
    assert(s1.as[(Long, Long, Long)].collect().toSet ==
      Set((1L, 350L, 2L), (2L, 10L, 1L)))
    val b2 = Seq(
      ("u", 4L, Some(Meter(1, 250, 1)), Some(Meter(1, 500, 1))), // revise 250→500
      ("d", 5L, Some(Meter(2, 10, 1)), None: Option[Meter]))     // retract fully
      .toDF("op", "ts_ms", "before", "after")
    val s2 = Upsert.applyChangelogAggregateRetract(Some(s1), b2, Seq("user_id"), aggs)
    // key 1: 350−250+500 = 600, count 2−1+1 = 2; key 2 retracts to zero
    // (the zero-valued row is kept — remove-on-zero is a policy choice)
    assert(s2.as[(Long, Long, Long)].collect().toSet ==
      Set((1L, 600L, 2L), (2L, 0L, 0L)))
    // non-invertible folds are rejected up front
    val e = intercept[IllegalArgumentException] {
      Upsert.applyChangelogAggregateRetract(None, b1, Seq("user_id"),
        Seq("spend_cents" -> "max"))
    }
    assert(e.getMessage.contains("max"))
  }

  test("aggregation merge engine: fold over any batch split == one-shot group-by") {
    val rows = (1 to 100).map(i => (i % 7L, i.toLong, i.toLong, i * 3L))
    val df = rows.toDF("k", "s", "n", "m")
    val aggs = Seq("s" -> "sum", "n" -> "count", "m" -> "max")
    val oneShot = Upsert.applyAggregate(None, df, Seq("k"), aggs)
      .as[(Long, Long, Long, Long)].collect().toSet
    // expected from first principles
    val expect = rows.groupBy(_._1).map { case (k, vs) =>
      (k, vs.map(_._2).sum, vs.size.toLong, vs.map(_._4).max) }.toSet
    assert(oneShot == expect)
    // arbitrary 3-way split (parity/thirds — order irrelevant here)
    val folded = Seq(0, 1, 2).foldLeft(None: Option[org.apache.spark.sql.DataFrame]) {
      (state, r) => Some(Upsert.applyAggregate(state,
        rows.filter(_._2 % 3 == r).toDF("k", "s", "n", "m"), Seq("k"), aggs))
    }.get.as[(Long, Long, Long, Long)].collect().toSet
    assert(folded == oneShot)
  }
}

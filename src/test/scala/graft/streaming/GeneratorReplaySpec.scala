package graft.streaming

import graft.SparkSpec
import graft.operators.Revenue
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** SURVEY §5.4: faithful replay of the reference generator's workload
  * mix (`postgres-source/gen_data.py`) through the CDC pipeline,
  * asserting stream ≡ batch.
  *
  * The replayed distribution (gen_data.py:100-205, rates per
  * BASELINE.md): ticket INSERTs every 2 base-seconds against a random
  * existing user+movie, cost uniform in [8.50, 25.00], status drawn
  * 70/20/10 scheduled/live/finished; movie INSERTs every 10 s; user
  * INSERTs every 30 s; every 5 s an update batch flips 1–3 random
  * scheduled→live and 1–2 live→finished. Seeded RNG → deterministic.
  *
  * Assertions: (1) final staging state equals the generator's own
  * ledger; (2) the streamed MV equals `Revenue.movieRevenue` batch-
  * recomputed from that ledger — retraction semantics included, since
  * status flips must decrement old buckets; (3) per-movie bucket
  * invariants (counts and revenues sum to totals). */
/** Wire record with a producer seq (the generator's commit counter).
  * Top-level, not nested in the spec class: an encoder over an inner
  * case class needs the outer instance, which the generated accessor
  * code cannot reach — Janino fails to compile and the whole stage
  * silently falls back to interpreted mode (the one codegen-fallback
  * WARN in the r4 test logs). */
private[streaming] case class GenRec(table: String, op: String, ts_ms: Long,
                                     seq: Long, before: String, after: String)

class GeneratorReplaySpec extends SparkSpec {
  import spark.implicits._

  private type Rec = GenRec
  private def Rec(table: String, op: String, ts_ms: Long, seq: Long,
                  before: String, after: String): GenRec =
    GenRec(table, op, ts_ms, seq, before, after)

  private val ticketSchema = StructType(Seq(
    StructField("ticket_id", LongType), StructField("movie_id", LongType),
    StructField("user_id", LongType), StructField("cost", DecimalType(10, 2)),
    StructField("status", StringType), StructField("purchased_at", TimestampType)))
  private val movieSchema = StructType(Seq(
    StructField("movie_id", LongType), StructField("title", StringType),
    StructField("start_date", TimestampType), StructField("duration_minutes", IntegerType)))
  private val userSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("username", StringType),
    StructField("email", StringType), StructField("full_name", StringType)))

  private case class Ticket(id: Long, movieId: Long, userId: Long,
                            costCents: Long, var status: String, purchasedAtMs: Long)

  test("gen_data.py-mix replay: stream ≡ batch MV, bucket invariants hold") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(20260812L)
    val epochMs = 1700000000000L                  // virtual clock origin

    // ---- generate the event ledger (the producer side) ----
    var seq = 0L
    val events = scala.collection.mutable.ArrayBuffer.empty[Rec]
    val tickets = scala.collection.mutable.ArrayBuffer.empty[Ticket]
    var users, movies = 0L
    def tsIso(absMs: Long) = new java.sql.Timestamp(absMs).toString.replace(' ', 'T')
    def emit(table: String, op: String, t: Long, after: String): Unit = {
      seq += 1; events += Rec(table, op, epochMs + t, seq, null, after)
    }
    def ticketJson(tk: Ticket) =
      s"""{"ticket_id":${tk.id},"movie_id":${tk.movieId},"user_id":${tk.userId},""" +
        s""""cost":${tk.costCents / 100}.${f"${tk.costCents % 100}%02d"},"status":"${tk.status}",""" +
        s""""purchased_at":"${tsIso(tk.purchasedAtMs)}"}"""
    val horizonMs = 600000L                       // 600 base-seconds of mix
    for (t <- 0L until horizonMs by 1000L) {
      if (t % 30000 == 0) {                       // gen_data.py:65 user cadence
        users += 1
        emit("users", "c", t,
          s"""{"user_id":$users,"username":"u$users","email":"u$users@example.com","full_name":"User $users"}""")
      }
      if (t % 10000 == 0) {                       // gen_data.py:118 movie cadence
        movies += 1
        emit("movies", "c", t,
          s"""{"movie_id":$movies,"title":"m$movies","start_date":"${tsIso(epochMs + t)}","duration_minutes":${60 + rnd.nextInt(120)}}""")
      }
      if (t % 2000 == 0 && users > 0 && movies > 0) { // gen_data.py:160 tickets
        val w = rnd.nextInt(100)                  // 70/20/10 status draw
        val status = if (w < 70) "scheduled" else if (w < 90) "live" else "finished"
        val tk = Ticket(tickets.length + 1L, 1 + rnd.nextLong(movies),
          1 + rnd.nextLong(users), 850 + rnd.nextInt(1651), status, epochMs + t)
        tickets += tk
        emit("tickets", "c", t, ticketJson(tk))
      }
      if (t % 5000 == 0) {                        // gen_data.py:171-200 updates
        def flip(from: String, to: String, n: Int): Unit = {
          val cands = rnd.shuffle(tickets.filter(_.status == from)).take(n)
          cands.foreach { tk => tk.status = to; emit("tickets", "u", t, ticketJson(tk)) }
        }
        flip("scheduled", "live", 1 + rnd.nextInt(3))
        flip("live", "finished", 1 + rnd.nextInt(2))
      }
    }

    // ---- replay through the pipeline in micro-batched chunks ----
    val dir = java.nio.file.Files.createTempDirectory("graft-genmix").toString
    val mem = MemoryStream[Rec]
    val h = CdcPipeline.start(spark, mem.toDF(),
      Seq(CdcPipeline.TableSpec("tickets", ticketSchema, Seq("ticket_id"), dist = Seq("movie_id")),
        CdcPipeline.TableSpec("movies", movieSchema, Seq("movie_id")),
        CdcPipeline.TableSpec("users", userSchema, Seq("user_id"))),
      s"$dir/state", s"$dir/ckpt", Trigger.ProcessingTime(0))
    try {
      events.grouped(events.length / 6 + 1).foreach { chunk =>
        mem.addData(chunk.toSeq)
        h.query.processAllAvailable()
      }

      // (1) staging ≡ generator ledger
      val staged = h.staging("tickets").get
        .selectExpr("ticket_id", "movie_id", "user_id",
          "cast(cost * 100 as bigint)", "status", "cast(purchased_at as string)")
        .as[(Long, Long, Long, Long, String, String)].collect().toSet
      val ledger = tickets.map(tk => (tk.id, tk.movieId, tk.userId, tk.costCents,
        tk.status, new java.sql.Timestamp(tk.purchasedAtMs).toString
          .replaceAll("\\.0$", ""))).toSet
      assert(staged.map(r => r.copy(_6 = r._6.replaceAll("\\.0$", ""))) == ledger,
        s"staging drifted: ${staged.size} vs ${ledger.size}")
      assert(h.staging("users").get.count() == users)
      assert(h.staging("movies").get.count() == movies)

      // (2) streamed MV ≡ batch recompute from the ledger
      val ledgerTickets = spark.createDataFrame(
        tickets.map(tk => org.apache.spark.sql.Row(tk.id, tk.movieId, tk.userId,
          new java.math.BigDecimal(tk.costCents).movePointLeft(2),
          tk.status, new java.sql.Timestamp(tk.purchasedAtMs))).toSeq.asJava,
        ticketSchema)
      val batchMv = Revenue.movieRevenue(ledgerTickets, h.staging("movies").get)
      val streamMv = h.mv().get
      // parquet round-trip relaxes nullability; compare names + types
      assert(streamMv.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        batchMv.schema.fields.map(f => (f.name, f.dataType)).toSeq)
      assert(streamMv.exceptAll(batchMv).isEmpty && batchMv.exceptAll(streamMv).isEmpty,
        "stream and batch MV diverge")

      // (3) bucket invariants per movie
      val bad = streamMv.filter(
        "scheduled_tickets + live_tickets + finished_tickets <> ticket_count OR " +
        "scheduled_revenue + live_revenue + finished_revenue <> total_revenue")
      assert(bad.isEmpty, bad.collect().mkString("\n"))
    } finally h.query.stop()
  }

  private implicit class SeqAsJava[T](s: Seq[T]) {
    def asJava: java.util.List[T] = {
      val l = new java.util.ArrayList[T](s.size)
      s.foreach(l.add); l
    }
  }
}

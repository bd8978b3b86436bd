package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every raw operator (no verify-path sort)
  * at SPARK_GRAFT_SF_DIR, forcing full materialization through the noop
  * datasource (a `count()` would let Catalyst collapse projections to
  * parquet metadata reads and time nothing). One JSON line on stdout. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Optional query-subset mode (args(0) = comma-separated names): runs
    // only those queries in THIS JVM — the isolation probe for telling
    // "query got slower" apart from "JVM profile polluted by the other
    // 77 queries' warmup+runs" (r4 postmortem: five queries regressed
    // ≥2x with identical code and SQL text).
    val only: Option[Set[String]] =
      args.headOption.filter(_.nonEmpty).map(_.split(',').toSet)
    val ops = only match {
      case Some(names) => SparkEntry.rawOps.view.filterKeys(names).toMap
      case None => SparkEntry.rawOps
    }
    val spark = GraftSession.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup: run EVERY benched query once at the smallest
    // SF so measured times are the query, not first-run JIT +
    // classloading (cold-vs-warm delta observed up to 6x on the
    // hash-heavy ops).
    ops.toSeq.sortBy(_._1).foreach { case (_, f) =>
      try f(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // Confirmed-min measurement: single-JVM runs at this scale are
    // JIT-bimodal — the r5 isolation probe showed identical warm plans
    // alternating between a ~2s compiled mode and 7-43s deopt/interpreted
    // spikes (the r4 regression cluster: five queries whose dominant
    // stage runs on ONE task because the sf0.1 file is a single parquet
    // row group, so one slow core is the whole query). A blind min-of-2
    // can sample two spike runs and report the slow mode as the query's
    // cost. Rule: keep measuring (up to 5 runs, or 90s spent) until the
    // two smallest runs agree within 1.3x — then the min is a confirmed
    // steady-state, not a coin flip.
    def run(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      // JVM hygiene between measurements: accumulated caches/broadcasts
      // from 30+ prior queries otherwise inflate later ones (observed
      // 3s -> 23s for the same plan deep into a bench run)
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        // sentinel: a throwing query must not read as a fast one
        -1.0
      }
    }
    val firstPass = ops.toSeq.sortBy(_._1).map { case (name, fn) =>
      var times = (1 to 2).map(_ => run(name, fn)).toVector
      def minConfirmed: Boolean = {
        val sorted = times.sorted
        sorted(1) <= 1.3 * sorted(0)
      }
      while (!times.contains(-1.0) && !minConfirmed &&
             times.length < 5 && times.sum < 90.0)
        times :+= run(name, fn)
      // per-run times to stderr: the min hides the noise distribution,
      // and the noise IS the signal when chasing bench instability
      System.err.println(
        s"[bench] $name runs=${times.map(t => f"$t%.2f").mkString(",")}")
      (name, if (times.contains(-1.0)) -1.0 else times.min,
        // did this query's own first-pass runs show spread? (needed a
        // third run, or min/max disagree past the confirmation bar)
        times.length > 2 || (!times.contains(-1.0) &&
          times.max > 1.3 * times.min))
    }
    // Session-position cross-check: the r7 artifact showed an
    // alphabetically-CONTIGUOUS 3-9x slow cluster — a degraded session
    // window can confirm a slow min for every query unlucky enough to
    // run inside it (both same-window runs agree, so the 1.3x rule
    // can't see it). A second single-run pass in REVERSE order places
    // every query at a different session position; the reported number
    // is the min across passes, so a position-dependent slowdown must
    // hit the same query in both orders to survive into the artifact.
    // Restricted to queries whose OWN first-pass runs showed spread —
    // a stable confirmed min is already position-independent evidence,
    // and re-running all ~130 queries doubled census wall-clock for
    // queries that never disagreed with themselves. EXCEPTION (r10
    // postmortem, q_ann_ivfpq 2.77→6.96 s with untouched code): a
    // HEAVY query whose two first-pass runs agree may simply have run
    // both in the same cold window — agreement between two cold runs
    // is not warm evidence. The top-decile-expensive queries therefore
    // always get the reverse pass; for everything sub-second the
    // possible error is wobble-scale and not worth doubling the
    // census.
    val decileCut = {
      val ts = firstPass.map(_._2).filter(_ >= 0).sorted
      if (ts.isEmpty) Double.MaxValue
      else ts(math.min(ts.length - 1, (ts.length * 9) / 10))
    }
    val spreadQueries = firstPass.collect {
      case (n, _, true) => n
      case (n, t, _) if t >= 0 && t >= decileCut => n
    }.toSet
    val firstByName = firstPass.map { case (n, t, _) => n -> t }.toMap
    val second = ops.toSeq.sortBy(_._1).reverse.map { case (name, fn) =>
      val first = firstByName(name)
      if (first < 0 || !spreadQueries.contains(name)) name -> first
      else {
        val t = run(name, fn)
        if (t >= 0 && t < first)
          System.err.println(f"[bench] $name reverse-pass improved $first%.2f -> $t%.2f")
        name -> (if (t < 0) first else math.min(first, t))
      }
    }.toMap
    val results = firstPass.map { case (name, _, _) => name -> second(name) }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, -1.0) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    // Confirmed-max rate, the mirror of the query loop's confirmed-min:
    // the first run pays streaming-path JIT/codegen (observed 1.5k vs
    // 2.9k rows/s for identical work), so keep measuring (≤4 runs)
    // until the two best rates agree within 1.3x — the reported number
    // is a confirmed warm capability, not a lucky sample.
    // Skipped in subset mode unless "streaming" is named explicitly.
    val streamRuns: Vector[Double] =
      if (only.exists(!_.contains("streaming"))) Vector.empty
      else {
        // the query warmup loop never exercises the streaming path —
        // pay its JIT/codegen on a small discarded run, not run 1
        streamingThroughput(spark, rows = 2000, triggers = 2)
        var rates = Vector(streamingThroughput(spark), streamingThroughput(spark))
        // stop only when (a) the two best agree within 1.15x — the r8
        // census-vs-driver streaming spread (3,000–3,986 vs 5,275)
        // showed 1.3x lets a congested-window pair through — and
        // (b) the newest run stopped raising the max by >3%: agreement
        // alone confirms a rising warmup curve too early (observed
        // 2002→3090→3271…: 3090/3271 "agree" while still climbing)
        def topTwoAgree = { val s = rates.sorted.reverse; s(1) >= s(0) / 1.15 }
        def stillClimbing = rates.last >= rates.init.max * 1.03
        // minimum 4 measured runs: two agreeing runs inside one
        // congested window confirm a slow max (observed 3000,2717
        // while a clean session reads ~3900) — the max over 4 spans
        // enough wall-clock to escape a transient window; cap raised
        // to 8 to give the tighter agreement bar room to converge
        while (rates.length < 4 ||
               ((!topTwoAgree || stillClimbing) && rates.length < 8))
          rates :+= streamingThroughput(spark)
        System.err.println(
          s"[bench] streaming runs=${rates.map(r => f"$r%.0f").mkString(",")}")
        rates
      }
    val streamRate = if (streamRuns.isEmpty) 0.0 else streamRuns.max
    // per-run rates ride in the artifact: the max hides the spread, and
    // the spread is what distinguishes a confirmed warm capability from
    // a lucky sample (r8: three same-code censuses read 3,000-3,986
    // while the driver read 5,275 — undiagnosable from a scalar)
    val streamRunsJson = streamRuns.map(r => f"$r%.0f").mkString("[", ",", "]")
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failed,"streaming_rows_per_sec":$streamRate%.0f,"streaming_runs":$streamRunsJson,"sf":"$sfDir"}"""
    println(line)
    // belt-and-braces for log-wrapped stdout: also land the line on disk.
    // Subset probes write a scratch file — bench_out.json is the
    // driver's artifact and must only ever hold a FULL census.
    val outFile = if (only.isDefined) "bench_subset.json" else "bench_out.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), line)
    spark.stop()
  }

  /** End-to-end CDC pipeline throughput: replay a synthetic ticket+movie
    * changelog (inserts + status updates, the gen_data.py mix) through
    * CdcPipeline and report rows/s. The reference's generator peaks at
    * ~16 rows/s (BASELINE.md); this measures the engine's ceiling on
    * the same topology. */
  private[graft] def streamingThroughput(spark: SparkSession,
                                         rows: Int = 20000, triggers: Int = 5): Double = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    import graft.streaming.CdcPipeline
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val ticketSchema = StructType(Seq(
      StructField("ticket_id", LongType), StructField("movie_id", LongType),
      StructField("user_id", LongType), StructField("cost", DecimalType(10, 2)),
      StructField("status", StringType), StructField("purchased_at", TimestampType)))
    val movieSchema = StructType(Seq(
      StructField("movie_id", LongType), StructField("title", StringType),
      StructField("start_date", TimestampType), StructField("duration_minutes", IntegerType)))
    val dir = java.nio.file.Files.createTempDirectory("graft-bench-stream").toString
    val mem = MemoryStream[CdcPipeline.CdcRecord]
    val h = CdcPipeline.start(spark, mem.toDF(),
      Seq(CdcPipeline.TableSpec("tickets", ticketSchema, Seq("ticket_id"), dist = Seq("movie_id")),
        CdcPipeline.TableSpec("movies", movieSchema, Seq("movie_id"))),
      s"$dir/state", s"$dir/ckpt", Trigger.ProcessingTime(0))
    def ticket(id: Long, status: String) =
      s"""{"ticket_id":$id,"movie_id":${id % 100},"user_id":${id % 1000},"cost":12.50,"status":"$status","purchased_at":"2026-01-01T00:00:00"}"""
    try {
      mem.addData((0L until 100L).map(m => CdcPipeline.CdcRecord("movies", "c", 0,
        null, s"""{"movie_id":$m,"title":"m$m","start_date":"2026-02-01T00:00:00","duration_minutes":100}""")))
      h.query.processAllAvailable()
      val perTrigger = rows / triggers
      val t0 = System.nanoTime()
      (0 until triggers).foreach { tr =>
        mem.addData((0 until perTrigger).map { i =>
          val id = (tr.toLong * perTrigger + i) % (rows / 2)  // half are updates
          CdcPipeline.CdcRecord("tickets", if (id < tr.toLong * perTrigger + i) "u" else "c",
            tr + 1, null, ticket(id, if (tr % 2 == 0) "scheduled" else "live"))
        })
        h.query.processAllAvailable()
      }
      rows / ((System.nanoTime() - t0) / 1e9)
    } finally h.query.stop()
  }
}

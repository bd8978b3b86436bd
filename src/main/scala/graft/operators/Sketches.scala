package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch surface for interactive-scale analytics: HyperLogLog++
  * distinct counts and quantile sketches — the algorithms a 100 TB
  * dashboard query runs instead of exact aggregation (one pass, fixed
  * memory, mergeable across partitions; both are Spark built-ins and
  * deterministic for a given dataset).
  *
  * Correctness surface follows the ANN-recall-gate pattern: a sketch's
  * raw output has no cross-engine oracle (HLL registers are
  * implementation-defined), so the driver-checkable view is a one-row
  * accuracy verdict against the exact aggregate computed in the same
  * query.
  */
object Sketches {

  /** Per-hour approximate distinct users next to the exact count —
    * the sketch-backed variant of
    * [[EventOps.distinctAgg]]'s COUNT(DISTINCT). */
  def approxDistinctByHour(events: DataFrame, rsd: Double = 0.02): DataFrame =
    events.groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))

  /** One-row sketch-accuracy gate, bounded to the sketches' ACTUAL
    * guarantees so the verdict holds at any scale factor or value
    * distribution (the old 5%-of-value check was both scale-fragile —
    * a steep quantile region flips it — and O(N log N) at 100 TB from
    * the exact percentile):
    *
    *  - input is capped at `maxExactRows` via a deterministic content-
    *    hash filter (one metadata count + a narrow scan — no sort), so
    *    the exact side stays bounded however big the table; sketch and
    *    exact run over the SAME rows, certifying the sketch algorithm,
    *    not the sample.
    *  - distinct_ok: HLL++ at rsd=0.02 within 3σ (6%) of exact — the
    *    HLL error is scale-free, 3σ makes a false alarm ~1‰.
    *  - pXX_ok: approx_percentile(accuracy) guarantees rank error
    *    ≤ N/accuracy; the sketch value must land between the exact
    *    percentiles at p ± 5/accuracy (5× the guaranteed rank window —
    *    distribution-independent, unlike a value-relative band). */
  /** Misra–Gries heavy-hitters summary of the token stream
    * ([[graft.functions.HeavyHitters]]): ≤ `k` (term, est) rows,
    * ranked (est desc, term asc). Sketch output — no cross-engine
    * oracle; [[heavyHittersGate]] certifies the MG guarantees. */
  def heavyHitters(docs: DataFrame, k: Int = 50): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("term"))
      .agg(graft.functions.HeavyHitters.summary(k)(col("term")).as("__hh"))
      .select(posexplode(col("__hh")).as(Seq("__pos", "e")))
      .select(col("e._1").as("term"), col("e._2").as("est"))

  /** EXACT heavy hitters by the standard two-pass sketch-then-recount:
    * pass 1, the Misra–Gries summary proposes ≤ `k` candidate terms
    * (its completeness theorem — every term with true frequency
    * > N/(k+1) survives the summary — makes the candidate set a
    * SUPERSET of the answer regardless of merge order); pass 2 recounts
    * JUST those candidates exactly and keeps `tf·(k+1) > N` (integer
    * form of tf > N/(k+1), exact in any engine). Output is therefore
    * deterministic and oracle-equal to a full exact count, while the
    * expensive full-vocabulary aggregation never runs: pass 2 is a
    * scan-speed `isin` filter over ≤ k strings plus a ≤ k-group count.
    * The classic way a sketch buys exactness at 100 TB. */
  def heavyHittersExact(docs: DataFrame, k: Int = 50): DataFrame = {
    val toks = docs.select(explode(split(col("text"), " ")).as("term"))
    // pass 1: summary AND total in ONE aggregate — N as a separate
    // action was a third full corpus scan for one long
    val row = toks.agg(
      graft.functions.HeavyHitters.summary(k)(col("term")).as("__hh"),
      count(lit(1)).as("__n")).head()
    val cands = row.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    val n = row.getLong(1)
    // pass 2: InSet-filtered recount of <= k terms, threshold inline
    toks.filter(col("term").isin(cands: _*))
      .groupBy("term").agg(count(lit(1)).as("tf"))
      .filter(col("tf") * (k + 1) > lit(n))
      .select("term", "tf")
  }

  /** Per-group EXACT heavy hitters — [[heavyHittersExact]]'s two-pass
    * recipe with the Misra–Gries pass running INSIDE `groupBy(grp)`
    * (the summary is a typed Aggregator, so Spark runs one mergeable
    * sketch per group): pass 1 proposes ≤ `k` candidate terms per
    * group (completeness holds per group — the theorem is about each
    * group's own stream), pass 2 recounts just the (group, candidate)
    * pairs and keeps `tf·(k+1) > N_grp`. The per-source vocabulary
    * monitor a curation dashboard wants, exact at any scale.
    *
    * Scale shape: pass 1 is one hash aggregate carrying ≤ k (term,
    * count) entries per group; the candidate table (groups × k rows)
    * broadcasts into the recount join, and totals (one row per group)
    * broadcast into the threshold filter. The full (group, term)
    * vocabulary aggregation never materializes. */
  def heavyHittersExactByGroup(docs: DataFrame, groupCol: String = "source",
                               k: Int = 50): DataFrame = {
    val spark = docs.sparkSession
    val toks = docs.select(col(groupCol).as("grp"),
      explode(split(col("text"), " ")).as("term"))
    // pass 1: per-group summary AND total in ONE aggregate, then
    // materialize the bounded (groups × k) result locally — deriving
    // candidates and totals from the lazy plan would re-run the full
    // corpus aggregate once per derivation (three scans, not two)
    val c = toks.groupBy("grp").agg(
      graft.functions.HeavyHitters.summary(k)(col("term")).as("__hh"),
      count(lit(1)).as("__n"))
    val local = spark.createDataFrame(
      java.util.Arrays.asList(c.collect(): _*), c.schema)
    val cands = local.select(col("grp"), explode(col("__hh")).as("e"))
      .select(col("grp"), col("e._1").as("term"))
    val totals = local.select("grp", "__n")
    // pass 2: recount just the (group, candidate) pairs
    toks.join(broadcast(cands), Seq("grp", "term"))
      .groupBy("grp", "term").agg(count(lit(1)).as("tf"))
      .join(broadcast(totals), "grp")
      .filter(col("tf") * (k + 1) > col("__n"))
      .select(col("grp").as(groupCol), col("term"), col("tf"))
  }

  /** One-row guarantee gate for [[heavyHitters]] — checks the THEOREMS,
    * not a tolerance, so the verdict is deterministic at any SF:
    * estimates never exceed true counts, under-estimation is bounded by
    * N/(k+1) (the mergeable-summaries bound), and every term with true
    * frequency > N/(k+1) appears in the summary. The exact side is a
    * token-keyed count — same cost class as [[TextOps.vocabulary]],
    * bounded at scale by gating a sample the way [[accuracyGate]]
    * does. */
  def heavyHittersGate(docs: DataFrame, k: Int = 50): DataFrame = {
    val toks = docs.select(explode(split(col("text"), " ")).as("term"))
    // Evaluate the sketch ONCE: it is referenced twice below (theorem
    // checks + completeness anti-join) and would otherwise re-run the
    // full token scan + UDAF per reference. Its size is ≤ k rows by
    // construction, so a driver round-trip is bounded at any SF and
    // leaves nothing cached behind (unlike .cache()).
    val spark = docs.sparkSession
    import spark.implicits._
    val sketch = heavyHitters(docs, k)
      .as[(String, Long)].collect().toSeq.toDF("term", "est")
    val exact = toks.groupBy("term").agg(count(lit(1)).as("tf"))
    val n = toks.agg(count(lit(1)).as("__n"))
    val bound = col("__n").cast("double") / (k + 1.0)
    val checks = sketch.join(exact, "term").crossJoin(n)
      .agg(
        coalesce(bool_and(col("est") <= col("tf")), lit(true)).as("underestimate_ok"),
        coalesce(bool_and(col("tf") - col("est") <= bound), lit(true)).as("error_ok"))
    val missedHeavy = exact.crossJoin(n)
      .filter(col("tf").cast("double") > bound)
      .join(sketch.select("term"), Seq("term"), "left_anti")
      .agg(count(lit(1)).as("__missed"))
    checks.crossJoin(missedHeavy)
      .select(lit(k.toLong).as("k"), col("underestimate_ok"), col("error_ok"),
        (col("__missed") === 0L).as("complete_ok"))
  }

  /** Deterministic mergeable quantile sketch (the MRL/KLL compactor
    * family, deterministic variant: Manku–Rajagopalan–Lindsay 1998;
    * Karnin–Lang–Liberty 2016 describe the randomized refinement):
    * levels of sorted buffers, items at level l carrying weight 2^l;
    * a full buffer sorts and promotes its even-index half one level up
    * (weight doubles). Every compaction perturbs any rank by at most
    * the level's weight, and the sketch ACCOUNTS for its own error:
    * `errBound` accumulates exactly those weights, so the guarantee
    * |rank(estimate(q)) − q·n| ≤ errBound is a theorem of the
    * structure, not a tolerance — which is what the gate checks.
    *
    * This is the 100 TB replacement for exact `percentile` (whose
    * value histogram concentrates on one reducer — the documented
    * limit of [[TextOps.curriculumDeciles]]'s threshold step): memory
    * is O(k·log(n/k)) per partition, partition sketches merge
    * associatively, one pass. Merge order varies with scheduling, so
    * ESTIMATES vary run-to-run within the bound — hence a gate query,
    * not a value oracle (the PCA/ANN-gate pattern). */
  object QuantileSketch {
    final case class Sketch(k: Int, levels: Vector[Vector[Double]],
                            count: Long, errBound: Long) extends Serializable

    def empty(k: Int): Sketch = Sketch(k, Vector(Vector.empty), 0L, 0L)

    /** Compact every over-full level bottom-up: sort, promote the
      * even-index half, charge the level's weight to the error bound. */
    private def compactAll(k: Int, raw: Vector[Vector[Double]],
                           err0: Long): (Vector[Vector[Double]], Long) = {
      var levels = raw
      var err = err0
      var l = 0
      while (l < levels.length) {
        if (levels(l).length >= 2 * k) {
          val sorted = levels(l).sorted
          val promoted = sorted.indices.collect {
            case i if i % 2 == 0 => sorted(i)
          }.toVector
          levels = levels.updated(l, Vector.empty)
          if (l + 1 >= levels.length) levels = levels :+ Vector.empty
          levels = levels.updated(l + 1, levels(l + 1) ++ promoted)
          err += 1L << l
        }
        l += 1
      }
      (levels, err)
    }

    def insertAll(s: Sketch, vs: Iterator[Double]): Sketch = {
      var levels = s.levels
      var err = s.errBound
      var n = s.count
      val buf = scala.collection.mutable.ArrayBuffer(levels(0): _*)
      vs.foreach { v =>
        buf += v
        n += 1
        if (buf.length >= 2 * s.k) {
          val (lv, e) = compactAll(s.k, levels.updated(0, buf.toVector), err)
          levels = lv; err = e
          buf.clear()
          buf ++= levels(0)
        }
      }
      Sketch(s.k, levels.updated(0, buf.toVector), n, err)
    }

    /** Associative merge: level-wise concatenation, then compaction.
      * Error bounds add (each input's accounting stays valid). */
    def merge(a: Sketch, b: Sketch): Sketch = {
      val depth = math.max(a.levels.length, b.levels.length)
      val combined = (0 until depth).map { l =>
        a.levels.lift(l).getOrElse(Vector.empty) ++
          b.levels.lift(l).getOrElse(Vector.empty)
      }.toVector
      val (lv, err) = compactAll(a.k, combined, a.errBound + b.errBound)
      Sketch(a.k, lv, a.count + b.count, err)
    }

    /** Estimate the q-quantile: smallest retained value whose cumulative
      * weight reaches ceil(q·n). */
    def query(s: Sketch, q: Double): Double = {
      val weighted = s.levels.zipWithIndex
        .flatMap { case (vs, l) => vs.map(v => (v, 1L << l)) }
        .sortBy(_._1)
      require(weighted.nonEmpty, "quantile of an empty sketch")
      val target = math.max(1L, math.ceil(q * s.count).toLong)
      var acc = 0L
      weighted.find { case (_, w) => acc += w; acc >= target }
        .map(_._1).getOrElse(weighted.last._1)
    }

    /** Re-run compaction on a sketch whose level-0 buffer reached
      * capacity — the deferred-compaction entry the grouped aggregator
      * uses so its per-row reduce stays an O(1)-ish head append. */
    private[graft] def compacted(s: Sketch): Sketch = {
      val (lv, err) = compactAll(s.k, s.levels, s.errBound)
      Sketch(s.k, lv, s.count, err)
    }

    /** One-pass distributed build: per-partition sketches, reduced by
      * [[merge]]. Nulls drop; NaN is kept (so counts agree with SQL
      * `IS NOT NULL` semantics) and sorts to the top like Scala's
      * double ordering. */
    def build(df: DataFrame, valueCol: String, k: Int = 256): Sketch = {
      val vals = df.filter(col(valueCol).isNotNull)
        .select(col(valueCol).cast("double"))
      val parts = vals.rdd.mapPartitions(it =>
        Iterator.single(insertAll(empty(k), it.map(_.getDouble(0)))))
      parts.fold(empty(k))(merge)
    }
  }

  /** One-row theorem gate for [[QuantileSketch]]: for each probed q,
    * the estimate's exact rank INTERVAL [#{v < est}, #{v ≤ est}] must
    * intersect q·n ± (errBound + 1) — the interval, not the upper
    * endpoint alone, because the theorem bounds where the estimate
    * SITS in sorted order, and inside a run of tied values every
    * position of the run is the same sort location (an upper-endpoint
    * check would fail a perfectly correct sketch whenever a probed
    * quantile lands in a duplicate run longer than the bound).
    * `bound_ok` additionally pins that the accounting stayed
    * non-degenerate (errBound ≤ n/4: at k=256 the structural bound is
    * ~log₂(n/k)·n/k, two orders tighter). Empty input gates vacuously
    * true. */
  def quantileSketchGate(df: DataFrame, valueCol: String,
                         k: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // isNotNull (not na.drop): the pinned oracle counts IS NOT NULL
    // rows, and na.drop would also silently drop NaN — n must agree
    val vals = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("double").as("__v"))
    val s = QuantileSketch.build(vals, "__v", k)
    val probes = Seq(0.1, 0.5, 0.9)
    val oks =
      if (s.count == 0) probes.map(_ => true)
      else {
        val ests = probes.map(q => QuantileSketch.query(s, q))
        val cnts = ests.flatMap(e => Seq(
          sum(when(col("__v") < e, 1L).otherwise(0L)),
          sum(when(col("__v") <= e, 1L).otherwise(0L))))
        val ranks = vals.agg(cnts.head, cnts.tail: _*).head()
        probes.indices.map { i =>
          val rankLt = ranks.getLong(2 * i)
          val rankLe = ranks.getLong(2 * i + 1)
          val target = probes(i) * s.count
          rankLt <= target + s.errBound + 1 && rankLe >= target - s.errBound - 1
        }
      }
    Seq((k.toLong, s.count, oks(0), oks(1), oks(2),
      s.count == 0 || s.errBound <= s.count / 4))
      .toDF("k", "n", "p10_ok", "p50_ok", "p90_ok", "bound_ok")
  }

  /** Per-GROUP version of the quantile-sketch theorem gate, driving the
    * [[graft.functions.QuantileSketchAgg]] grouped aggregator: every
    * group's median estimate must satisfy its own self-accounted
    * bound — checked on the rank INTERVAL [#{v < est}, #{v ≤ est}]
    * like [[quantileSketchGate]] (tied-value runs are one sort
    * position). The per-group sketch rows (one per group — bounded by
    * group cardinality, the same driver-footprint class as the other
    * gates) broadcast back for one exact rank-counting pass; verdict
    * reduces to one row. */
  def quantileSketchGroupedGate(df: DataFrame, groupCol: String,
                                valueCol: String, k: Int = 256,
                                q: Double = 0.5): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.filter(col(valueCol).isNotNull)
    val per = vals.groupBy(col(groupCol))
      .agg(graft.functions.QuantileSketchAgg.sketch(k, Seq(q))(
        col(valueCol).cast("double")).as("s"))
      .select(col(groupCol), col("s._1").as("n"), col("s._2").as("err"),
        col("s._3").getItem(0).as("est"))
    val ranks = vals.join(broadcast(per), groupCol)
      .groupBy(col(groupCol))
      .agg(sum(when(col(valueCol).cast("double") < col("est"), 1L)
          .otherwise(0L)).as("rank_lt"),
        sum(when(col(valueCol).cast("double") <= col("est"), 1L)
          .otherwise(0L)).as("rank_le"),
        first(col("n")).as("n"), first(col("err")).as("err"))
    ranks.agg(count(lit(1)).as("n_groups"),
      coalesce(bool_and(
        col("rank_lt") <= lit(q) * col("n") + col("err") + 1 &&
          col("rank_le") >= lit(q) * col("n") - col("err") - 1), lit(true))
        .as("grouped_ok"))
  }

  /** Count–Min sketch theorem gate (Cormode & Muthukrishnan 2005):
    * build the sketch with Spark's built-in mergeable
    * `count_min_sketch` aggregate (one codegen'd pass, O(w·d) state
    * whatever the term universe), read it back through the public
    * `org.apache.spark.util.sketch.CountMinSketch` API, and certify
    * its guarantees against exact counts of a BOUNDED probe set:
    *
    *  - `lower_ok`: CMS never underestimates (est ≥ true, always);
    *  - `overest_ok`: est ≤ true + ε·N holds with probability
    *    ≥ `confidence` per query — violations over the probe set stay
    *    under 3×(1−confidence)·|probes| + 1. NOTE this budget is a
    *    HEURISTIC, not a probability bound: every probe queries the
    *    same sketch through the same d hash rows, so violations are
    *    positively correlated (one heavy colliding term inflates many
    *    probes at once) and the binomial tail the 3× slack is sized
    *    against does not strictly apply. A correct sketch can
    *    therefore — rarely — fail this gate (a flaky verdict, never
    *    wrong data); a broken sketch overshoots on most probes and is
    *    still caught. The exact-bound alternative (per-probe Markov
    *    across the d rows jointly) needs the row-wise counters, which
    *    the public `CountMinSketch` API does not expose;
    *  - `n_tokens`: the stream length N, exact (oracle-checked), so
    *    the gate certifies the sketch saw every token.
    *
    * Probe set = the md5-least `probeTerms` distinct terms — a
    * deterministic content-hash sample whose exact recount is one
    * TakeOrdered + a ≤ probeTerms-row driver list at ANY scale factor.
    * Driver state: the sketch itself (w·d longs, ~100 KB at the
    * defaults) + the probe rows — bounded everywhere. */
  def countMinGate(docs: DataFrame, eps: Double = 0.001,
                   confidence: Double = 0.99, seed: Int = 42,
                   probeTerms: Int = 200): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(explode(split(col("text"), " ")).as("term"))
    val row = toks.agg(
      expr(s"count_min_sketch(term, CAST($eps AS DOUBLE), " +
        s"CAST($confidence AS DOUBLE), $seed)").as("__cms"),
      count(lit(1)).as("__n")).head()
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(row.getAs[Array[Byte]](0))
    val n = row.getLong(1)
    val probes = toks.groupBy("term").agg(count(lit(1)).as("tf"))
      .orderBy(md5(col("term")), col("term")).limit(probeTerms)
      .as[(String, Long)].collect()
    val ests = probes.map { case (t, tf) => (tf, cms.estimateCount(t)) }
    val lowerOk = ests.forall { case (tf, est) => est >= tf }
    val viol = ests.count { case (tf, est) => est > tf + eps * n }
    val allowed = 3.0 * (1 - confidence) * ests.length + 1
    Seq((ests.length.toLong, lowerOk, viol <= allowed, n))
      .toDF("n_probes", "lower_ok", "overest_ok", "n_tokens")
  }

  def accuracyGate(events: DataFrame, maxExactRows: Long = 200000,
                   accuracy: Int = 1000): DataFrame = {
    val n = events.count()
    val k = math.max(1L, (n + maxExactRows - 1) / maxExactRows)
    val gateIn = if (k <= 1) events
      else events.filter(
        pmod(xxhash64(struct(events.columns.map(col).toSeq: _*)), lit(k)) === 0)
    val eps = 5.0 / accuracy
    gateIn.agg(
        approx_count_distinct(col("user_id"), 0.02).as("__ad"),
        countDistinct(col("user_id")).as("__ed"),
        expr(s"approx_percentile(value, 0.5, $accuracy)").as("__a50"),
        expr(s"percentile(value, ${0.5 - eps})").as("__lo50"),
        expr(s"percentile(value, ${0.5 + eps})").as("__hi50"),
        expr(s"approx_percentile(value, 0.99, $accuracy)").as("__a99"),
        expr(s"percentile(value, ${0.99 - eps})").as("__lo99"),
        expr(s"percentile(value, ${math.min(1.0, 0.99 + eps)})").as("__hi99"))
      .select(
        (abs(col("__ad") - col("__ed")).cast("double")
          <= lit(0.06) * col("__ed")).as("distinct_ok"),
        (col("__a50") >= col("__lo50") && col("__a50") <= col("__hi50"))
          .as("p50_ok"),
        (col("__a99") >= col("__lo99") && col("__a99") <= col("__hi99"))
          .as("p99_ok"))
  }
}

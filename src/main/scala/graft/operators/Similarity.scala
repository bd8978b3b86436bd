package graft.operators

import graft.functions.DotProduct
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`, L2-normalized → dot = cosine).
  *
  * Baseline: brute-force top-k (exact, O(N·M·d) — the correctness
  * oracle). Scale path: multi-table random-hyperplane LSH bucketing,
  * which turns the all-pairs cross join into per-bucket joins.
  */
object Similarity {

  /** Sequential-fold dot product — a native codegen'd expression
    * ([[graft.functions.DotProduct]]); bit-identical to the
    * `aggregate(zip_with(...))` formulation and to DuckDB's list_sum
    * fold, but whole-stage-codegen'd instead of CodegenFallback. */
  def dot(a: Column, b: Column): Column = DotProduct(a, b)

  private def asDouble(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))

  /** The one typed view of the embedding contract — (vec_id, double
    * vector) — shared across the vector operators ([[IvfIndex]],
    * [[Pca]], …) so a change to the column contract lands once. */
  private[operators] def toVecs(embeddings: DataFrame): Dataset[(Long, Array[Double])] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    embeddings.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])]
  }

  /** Spread a per-row map-only vector stream across the executor
    * threads (deterministic id-hash repartition). The scan-side
    * parallelism of a mapPartitions op is whatever the SOURCE split
    * count is — a single-row-group parquet file (the local testdata
    * shape) serializes the whole scoring pass onto one task, which
    * both wastes 31 cores and maximizes exposure to slow-JIT task
    * modes (memory: bench-jit-bimodality). Only applied where per-row
    * results are partitioning-independent: scoring heaps, probe
    * fan-out, encodes, and folds whose merges are exact (the k-means
    * sums accumulate in fixed-point integers precisely so this
    * wrapper cannot perturb them). The shuffle moves the QUERY
    * stream, the small side by design. */
  private[operators] def spread(df: DataFrame, key: String = "vec_id"): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col(key))

  /** Exact brute-force self-ANN: [[bruteForceTopKFor]] with the corpus
    * as its own query set. */
  def bruteForceTopK(embeddings: DataFrame, k: Int = 5,
                     blockRows: Int = 100000): DataFrame =
    bruteForceTopKFor(embeddings, embeddings, k, blockRows)

  /** Exact brute-force cosine top-k of each `queries` vector against
    * the `corpus`. Deterministic ranking: (score desc, neighbor id
    * asc); id-equal pairs are excluded (self-match, when the query set
    * is drawn from the corpus).
    *
    * Shape: block-broadcast matrix scan — the corpus is broadcast in
    * blocks of ≤ `blockRows`, each query partition streams its vectors
    * against the in-memory block keeping a bounded heap, and per-block
    * partial top-k merge through [[rankTopK]]. Queries stay partitioned
    * (distributed), candidates ride broadcasts; the naive cross-join
    * formulation materializes N·M joined rows with per-row array
    * copies — measured 5× slower at 2000×2000×64 — and is kept only as
    * the join-based reference in [[bruteForceTopKJoin]]. Scores are the
    * same sequential double folds, so results are bit-identical to the
    * join version and the SQL oracle.
    *
    * Driver footprint is ONE block at a time (id-hash partitioned
    * filter + collect per block), never the whole table — the earlier
    * full-table `collect()` OOM'd the driver at scale. Blocks are cut
    * by pmod(xxhash64(vec_id), nBlocks), not pmod(id): block sizes stay
    * bounded whatever the id distribution (strided/all-even ids would
    * concentrate a modulo split into one oversized collect). The corpus
    * side is re-scanned once per block, the price every block
    * nested-loop pays; the heap result is arrival-order independent
    * (strict total-order replacement), so blocking doesn't change the
    * answer. */
  def bruteForceTopKFor(queries: DataFrame, corpus: DataFrame, k: Int = 5,
                        blockRows: Int = 100000): DataFrame = {
    val partials = blockedScan(queries, corpus, blockRows) { (qid, q, cand) =>
      // bounded heap per query over this candidate block
      val top = new scala.collection.mutable.ArrayBuffer[(Long, Double)](k)
      var worst = 0
      var i = 0
      while (i < cand.length) {
        val (cid, c) = cand(i)
        if (cid != qid) {
          var s = 0.0
          var j = 0
          while (j < q.length) { s += q(j) * c(j); j += 1 }
          if (top.size < k) {
            top += ((cid, s))
            if (top.size == k) {
              worst = top.indices.minBy(ix => (top(ix)._2, -top(ix)._1))
            }
          } else if (s > top(worst)._2 ||
              (s == top(worst)._2 && cid < top(worst)._1)) {
            top(worst) = ((cid, s))
            worst = top.indices.minBy(ix => (top(ix)._2, -top(ix)._1))
          }
        }
        i += 1
      }
      top.iterator.map(t => (qid, t._1, t._2))
    }
    rankTopK(partials.toDF("query_id", "neighbor_id", "score"), k)
  }

  /** Shared block-broadcast matrix-scan loop: the corpus rides
    * ≤`blockRows` in-memory broadcasts, queries stay partitioned, and
    * `perQuery` folds one query vector against one block into its
    * partial rows. Each block's partial is EAGERLY materialized
    * (`localCheckpoint` — executor-local storage, lineage cut) and the
    * block's broadcast destroyed before the next block is collected:
    * net broadcast residency is ONE block whatever the corpus size, so
    * a census session running hundreds of scan queries accumulates no
    * broadcast blocks (previously each ~50 MB corpus block lived until
    * an eventual GC noticed it — r7's cross-query session-state
    * suspect). The corpus and the repartitioned query stream persist
    * across the block loop (one parquet scan + one shuffle total, not
    * one per block); both release before return. Lineage-cut partials
    * trade recompute-on-executor-loss for the destroyed broadcast —
    * the right trade, since a destroyed broadcast makes recompute
    * impossible anyway.
    *
    * Storage contract: before returning, the per-block partial
    * checkpoints are folded into ONE result checkpoint and RELEASED
    * (`GraftBridge.checkpointRdd(…).unpersist()` — `Dataset.unpersist`
    * cannot reach checkpoint storage), so the call leaves exactly one
    * pinned dataset: the result itself, bounded by Q·k for the top-k
    * folds and by the match set for [[thresholdPairsFor]] (callers
    * bound that by their threshold choice; the gates drive it
    * sample-restricted). Transient peak during the fold is 2× the
    * result — spillable MEMORY_AND_DISK, never the corpus. */
  private def blockedScan(queries: DataFrame, corpus: DataFrame, blockRows: Int)(
      perQuery: (Long, Array[Double], Array[(Long, Array[Double])]) => Iterator[(Long, Long, Double)])
      : DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qvecs = spread(queries).select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].persist()
    // self-scan (the common case: self-ANN, exact near-dup reference):
    // both roles read the SAME rows — cache them once and serve the
    // block collects from the spread copy, instead of materializing an
    // identical second projection (2x cache footprint for nothing)
    val selfScan = queries eq corpus
    val vecs =
      if (selfScan) qvecs
      else corpus.select(col("vec_id"), col("embedding").cast("array<double>"))
        .as[(Long, Array[Double])].persist()
    try {
      val n = vecs.count()
      // ≥ 1 block always, so the partial-union reduce below is total
      // (the old grouped() path produced ZERO blocks on empty input and
      // reduce threw)
      val nBlocks = math.max(1L, (n + blockRows - 1) / blockRows).toInt
      val partials = (0 until nBlocks).map { b =>
        val block = vecs.filter(pmod(xxhash64(col("vec_id")), lit(nBlocks)) === b).collect()
        val bc = spark.sparkContext.broadcast(block)
        try {
          qvecs.mapPartitions { it =>
            val cand = bc.value
            it.flatMap { case (qid, q) => perQuery(qid, q, cand) }
          }.toDF("query_id", "cand_id", "score").localCheckpoint(true)
        } finally bc.destroy()
      }
      if (partials.length == 1) partials.head
      else try partials.reduce(_ union _).localCheckpoint(true)
      finally partials.foreach(p =>
        org.apache.spark.sql.GraftBridge.checkpointRdd(p)
          .foreach(_.unpersist(blocking = false)))
    } finally { qvecs.unpersist(); if (!selfScan) vecs.unpersist(); () }
  }

  /** Exact all-pairs-above-threshold scan: every (query, corpus) pair
    * with dot ≥ threshold, id-equal pairs excluded — the same
    * block-broadcast shape as [[bruteForceTopKFor]] (corpus rides
    * ≤blockRows broadcasts, queries stay partitioned, scores are the
    * sequential fold) but emitting ALL qualifying pairs instead of a
    * bounded heap. O(Q·N) compute: the exact reference / verify stage
    * for the LSH-candidate near-dup path, not the 100 TB scan plan. */
  private[operators] def thresholdPairsFor(queries: DataFrame, corpus: DataFrame,
      threshold: Double, blockRows: Int = 100000): DataFrame =
    blockedScan(queries, corpus, blockRows) { (qid, q, cand) =>
      cand.iterator.flatMap { case (cid, c) =>
        if (cid == qid) None
        else {
          var s = 0.0
          var j = 0
          while (j < q.length) { s += q(j) * c(j); j += 1 }
          if (s >= threshold) Some((qid, cid, s)) else None
        }
      }
    }

  /** Join-based exact top-k (reference formulation; see
    * [[bruteForceTopK]] for why the blocked scan replaced it). */
  def bruteForceTopKJoin(embeddings: DataFrame, k: Int = 5): DataFrame = {
    val e = asDouble(embeddings)
    val scored = e.as("q").join(e.as("c"), col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        dot(col("q.v"), col("c.v")).as("score"))
    rankTopK(scored, k)
  }

  /** Rank candidates to (query_id, rank, neighbor_id, score) via the
    * bounded-heap aggregator ([[graft.functions.TopKAggregator]]) — the
    * window formulation would shuffle and sort every candidate row;
    * this reduces map-side and exchanges ≤ queries×k entries. Same
    * deterministic (score desc, id asc) order. */
  private[operators] def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(graft.functions.TopKAggregator.topK(k)(
        col("neighbor_id"), col("score")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "nb")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("nb._1").as("neighbor_id"), col("nb._2").as("score"))

  /** Multi-table random-hyperplane LSH signatures: for each of `tables`
    * hash tables, `planes` sign bits → one bucket id. A pair is a
    * candidate if it collides in ANY table — recall compounds as
    * 1−(1−p^planes)^tables (the classic Indyk–Motwani trade). All
    * tables' buckets come from one native pass
    * ([[graft.functions.HyperplaneBuckets]] — the per-plane expression
    * lattice it replaced was ~8.5 ms/row at 40×5). */
  def lshBuckets(embeddings: DataFrame, tables: Int = 8, planes: Int = 4,
                 dims: Int = 64): DataFrame = {
    val e = asDouble(embeddings)
    e.select(col("vec_id"),
      posexplode(graft.functions.HyperplaneBuckets(col("v"), tables, planes, dims))
        .as(Seq("table", "bucket")))
  }

  /** LSH-bucketed ANN top-k. Candidate ids are deduped across tables
    * BEFORE scoring (a pair colliding in many tables is scored once),
    * then vectors join back by id for the exact ranking — at scale the
    * bucket join shuffles (table, bucket) pairs of ids only, never the
    * vectors. Approximate: recall < 1 by construction (bruteForceTopK
    * is the exact reference; [[recallVsExact]] makes the recall
    * driver-visible). Defaults sized on the weakly-clustered testdata
    * vectors: 40×5 measures recall@5 = 0.96 (sf0.01) / 0.98 (sf0.1);
    * the old 8×4 scored 0.67. Wider OR-construction (more tables)
    * raises recall, more planes per table cuts candidate volume. */
  def lshTopK(embeddings: DataFrame, k: Int = 5,
              tables: Int = 40, planes: Int = 5, dims: Int = 64): DataFrame =
    lshTopKFor(embeddings, embeddings, k, tables, planes, dims)

  /** [[lshTopK]] with the query and corpus sides split. Per-query
    * results are IDENTICAL to the self-ANN form restricted to the same
    * queries (each query's candidates depend only on its own buckets
    * against the corpus — spec-asserted), which is what lets the recall
    * gates drive the operator over the 200-query sample at O(sample)
    * instead of running the full self-join and discarding 92% of it. */
  def lshTopKFor(queries: DataFrame, corpus: DataFrame, k: Int = 5,
                 tables: Int = 40, planes: Int = 5, dims: Int = 64): DataFrame = {
    val qb = lshBuckets(queries, tables, planes, dims)
    val cb = lshBuckets(corpus, tables, planes, dims)
    val candidates = qb.as("q").join(cb.as("c"),
        col("q.table") === col("c.table") && col("q.bucket") === col("c.bucket") &&
        col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"))
      .distinct()
    val scored = candidates
      .join(asDouble(queries).select(col("vec_id").as("query_id"), col("v").as("qv")),
        "query_id")
      .join(asDouble(corpus).select(col("vec_id").as("neighbor_id"), col("v").as("cv")),
        "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), dot(col("qv"), col("cv")).as("score"))
    rankTopK(scored, k)
  }

  /** Fraction of all pairs the (tables, planes) hyperplane bucketing
    * marks as candidates, measured EXACTLY on a deterministic md5-order
    * sample: distinct colliding (a < b) pairs across every table over
    * n(n−1)/2. Measuring the deduped pair count directly (rather than
    * compounding a mean per-table collision probability) matters on
    * clustered corpora: there the pair-collision distribution is
    * bimodal — a few percent of pairs collide almost surely, the rest
    * almost never — and an independence-compounded mean wildly
    * overestimates, which would push the adaptive entry to brute force
    * exactly where LSH prunes. Cost is the candidate stage of the LSH
    * query itself at sample scale: O(sampleN²·density) id pairs through
    * one join + distinct, nothing collected but one scalar. */
  def lshCandidateFraction(embeddings: DataFrame, tables: Int = 40,
                           planes: Int = 5, dims: Int = 64,
                           sampleN: Int = 500): Double =
    probeMemo.getOrCompute(embeddings,
      s"lshCandidateFraction:$tables:$planes:$dims:$sampleN")(
      java.lang.Double.valueOf(
        lshCandidateFractionUncached(embeddings, tables, planes, dims, sampleN))
    ).doubleValue()

  /** Session memo for the collision-mass probe: every adaptive entry
    * (self/for/directed/filtered, hybrid-RRF dense, MMR candidates,
    * kNN votes) probes the SAME (corpus, params) point — compositions
    * like q_hybrid_rrf were re-paying the probe per call. Keyed on
    * plan fingerprint + file inventory + params ([[ModelMemo]]), so a
    * refreshed corpus re-probes and in-memory test relations bypass. */
  private val probeMemo = new ModelMemo[java.lang.Double]

  /** Explicit cache reset (see [[ModelMemo.invalidate]]). */
  def invalidateProbeCache(): Unit = probeMemo.invalidate()

  private def lshCandidateFractionUncached(
      embeddings: DataFrame, tables: Int, planes: Int, dims: Int,
      sampleN: Int): Double = {
    val sample = embeddings
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(sampleN)
    val n = sample.count()
    if (n < 2) return 0.0
    val b = lshBuckets(sample, tables, planes, dims)
    val pairs = b.as("x").join(b.as("y"),
        col("x.table") === col("y.table") && col("x.bucket") === col("y.bucket") &&
        col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id"), col("y.vec_id"))
      .distinct().count()
    pairs.toDouble / (n.toDouble * (n - 1.0) / 2.0)
  }

  /** Adaptive self-ANN entry: probe the corpus's bucket-collision mass
    * first, run LSH only where it prunes. Hyperplane LSH on a
    * weakly-clustered corpus marks most pairs as candidates — the r4
    * bench measured the wired 40×5 point doing near-brute-force work
    * PLUS bucket-join/dedup overhead (11.2 s vs 0.9 s for the exact
    * blocked scan, SURVEY §2.8's documented regime). An engine should
    * detect that regime and pick the flat scan, exactly as IVF/Faiss
    * deployments fall back to flat search below the index's break-even:
    * when the estimated candidate fraction ≥ `maxCandidateFraction`,
    * the blocked brute-force scan (exact, recall 1) is BOTH faster and
    * better; otherwise the LSH path runs (its recall certified by the
    * driver-visible gate on [[lshTopKFor]], which stays the direct
    * operator under test). */
  def adaptiveTopK(embeddings: DataFrame, k: Int = 5, tables: Int = 40,
                   planes: Int = 5, dims: Int = 64,
                   maxCandidateFraction: Double = 0.25): DataFrame =
    if (lshCandidateFraction(embeddings, tables, planes, dims) >= maxCandidateFraction)
      bruteForceTopK(embeddings, k)
    else lshTopK(embeddings, k, tables, planes, dims)

  /** [[adaptiveTopK]] with the query and corpus sides split — the
    * break-even-guarded entry for retrieval-shaped callers (a bounded
    * query set probing a large corpus, e.g. [[Retrieval.hybridRrfTopK]]'s
    * dense list). The collision-mass probe runs on the CORPUS (the side
    * whose clustering decides whether buckets prune): at or past
    * `maxCandidateFraction` the LSH bucket join would touch most pairs
    * and the exact blocked scan ([[bruteForceTopKFor]], recall 1) is
    * strictly better; below it the bucketed candidate path
    * ([[lshTopKFor]]) runs, shuffling (table, bucket) id pairs only.
    * Same (query_id, rank, neighbor_id, score) schema and deterministic
    * (score desc, id asc) order on both branches, so in the LSH path's
    * recall-1 regime (tight clusters — spec-pinned) the branches are
    * row-identical. */
  def adaptiveTopKFor(queries: DataFrame, corpus: DataFrame, k: Int = 5,
                      tables: Int = 40, planes: Int = 5, dims: Int = 64,
                      maxCandidateFraction: Double = 0.25): DataFrame =
    if (lshCandidateFraction(corpus, tables, planes, dims) >= maxCandidateFraction)
      bruteForceTopKFor(queries, corpus, k)
    else lshTopKFor(queries, corpus, k, tables, planes, dims)

  /** Metadata-filtered vector search — top-k among corpus rows
    * satisfying `pred` (the vector-DB "filtered search" surface:
    * lang/source/label constraints on ANN answers). Strategy picked by
    * a one-agg selectivity probe, the family's break-even discipline:
    *
    *  - PRE-FILTER (selective predicate, sel ≤
    *    `preFilterMaxSelectivity`): exact blocked scan over just the
    *    filtered subset — cost Q·sel·N dots, optimal as sel → 0.
    *  - POST-FILTER (permissive predicate): the full corpus answers
    *    through [[adaptiveTopKFor]] with over-fetch ⌈k/sel⌉+k, then
    *    surviving neighbors re-rank; queries left with <k survivors
    *    re-scan the filtered subset exactly. When the candidate list
    *    is exact (the adaptive entry's break-even fallback — this
    *    testdata's regime), ≥k survivors inside the over-fetch IS the
    *    exact filtered top-k: any filtered row outside the list
    *    scores at or below the list's cutoff, hence below the k-th
    *    survivor. Starved queries take the exact path, so the whole
    *    branch is exact in that regime; in an engaged-index regime it
    *    inherits the entry's certified-recall semantics.
    *
    * Both branches emit (query_id, rank, neighbor_id, score) in the
    * family's deterministic (score desc, id asc) order. */
  def filteredTopKFor(queries: DataFrame, corpus: DataFrame, pred: Column,
                      k: Int = 5, preFilterMaxSelectivity: Double = 0.5,
                      tables: Int = 40, planes: Int = 5, dims: Int = 64,
                      maxCandidateFraction: Double = 0.25): DataFrame = {
    val filtered = corpus.filter(pred)
    val total = corpus.count()
    val kept = filtered.count()
    if (total == 0L || kept <= k.toLong ||
        kept.toDouble / total <= preFilterMaxSelectivity)
      bruteForceTopKFor(queries, filtered, k)
    else {
      val sel = kept.toDouble / total
      val kOver = math.min(kept, math.ceil(k / sel).toLong + k).toInt
      val cands = adaptiveTopKFor(queries, corpus, kOver,
        tables, planes, dims, maxCandidateFraction)
      val surv = cands
        .join(filtered.select(col("vec_id").as("neighbor_id")), "neighbor_id")
        .select("query_id", "neighbor_id", "score")
      val ranked = rankTopK(surv, k).localCheckpoint(true)
      val satisfied = ranked.groupBy("query_id")
        .agg(count(lit(1)).as("n")).filter(col("n") >= k)
        .select("query_id")
      val okRows = ranked.join(satisfied, "query_id")
      val starvedQs = queries.join(
        satisfied.withColumnRenamed("query_id", "vec_id"),
        Seq("vec_id"), "left_anti")
      okRows.select("query_id", "rank", "neighbor_id", "score")
        .unionByName(bruteForceTopKFor(starvedQs, filtered, k)
          .select("query_id", "rank", "neighbor_id", "score"))
    }
  }

  /** Per-label embedding centroids — the nearest-class-mean building
    * block (class prototypes for few-shot heads, per-cluster summary
    * vectors, drift monitoring between corpus snapshots). One row per
    * (label, dim): `(label, dim, n_vectors, mean_micro)` with the mean
    * in integer micro-units.
    *
    * Determinism contract: each component quantizes to micro-units
    * (`floor(v·10⁶)`, one correctly-rounded double product + floor)
    * BEFORE the sum, so accumulation is integer and order-free; the
    * mean is a floor division made engine-portable by shifting the
    * numerator non-negative first (`(s + 10⁶·n) div n − 10⁶` — for
    * non-negative operands truncating and flooring division agree, so
    * Spark's `div` and any SQL engine's integer division match
    * bit-for-bit; components are cosine-normalized, |v| ≤ 1, so the
    * shift always covers the most negative sum).
    *
    * Scale shape: one narrow posexplode (id and label never copied per
    * dim beyond the label key) into one partial+final hash aggregate
    * keyed (label, dim) — labels×dims rows out whatever the corpus. */
  def labelCentroids(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label").cast("bigint").as("label"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "v")))
      .select(col("label"), (col("pos") + 1).cast("bigint").as("dim"),
        expr("CAST(floor(v * 1e6) AS BIGINT)").as("__micro"))
      .groupBy("label", "dim")
      .agg(count(lit(1)).as("n_vectors"), sum(col("__micro")).as("__s"))
      .select(col("label"), col("dim"), col("n_vectors"),
        expr("((__s + 1000000L * n_vectors) div n_vectors) - 1000000L")
          .as("mean_micro"))

  /** Cluster-separation report over [[labelCentroids]]: exact squared
    * L2 distance between every centroid pair (a < b) in integer
    * micro² units, plus each pair's within-class scatter (mean squared
    * vector→centroid distance of the two classes, same units, one
    * rounded division) — a Fisher-style separability audit: pairs
    * whose between-distance is small against their within-scatter are
    * the confusable classes [[centroidClassify]] will mix up.
    *
    * Everything is Long arithmetic on micro-quantized components
    * (the [[labelCentroids]] discipline): |diff| ≤ 2·10⁶ per dim,
    * squared ≤ 4·10¹², ×64 dims ≤ 2.6·10¹⁴ — no IEEE accumulation
    * anywhere. The centroid table is labels×dims rows (broadcast by
    * construction); the pair matrix is C(labels,2) rows. */
  def centroidSeparation(embeddings: DataFrame, dims: Int = 64): DataFrame = {
    val cents = labelCentroids(embeddings)
    val between = cents.as("x").join(cents.as("y"),
        col("x.dim") === col("y.dim") && col("x.label") < col("y.label"))
      .select(col("x.label").as("label_a"), col("y.label").as("label_b"),
        expr("(x.mean_micro - y.mean_micro) * (x.mean_micro - y.mean_micro)")
          .as("d2"))
      .groupBy("label_a", "label_b")
      .agg(sum(col("d2")).as("between_micro2"))
    // within-class scatter: mean ||v - centroid||² per label
    val within = embeddings
      .select(col("label").cast("bigint").as("label"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "v")))
      .select(col("label"), (col("pos") + 1).cast("bigint").as("dim"),
        expr("CAST(floor(v * 1e6) AS BIGINT)").as("vm"))
      .join(broadcast(cents), Seq("label", "dim"))
      .select(col("label"),
        expr("(vm - mean_micro) * (vm - mean_micro)").as("d2"))
      .groupBy("label")
      // nd counts (vector, dim) rows — divide the dims back out so the
      // scatter denominator is VECTORS (keeps every product safely
      // inside BIGINT; multiplying s2 by dims instead can leave it)
      .agg(sum(col("d2")).as("s2"),
        expr(s"count(1) div $dims").as("nv"))
    between
      .join(broadcast(within.select(col("label").as("label_a"),
        col("s2").as("sa"), col("nv").as("nva"))), "label_a")
      .join(broadcast(within.select(col("label").as("label_b"),
        col("s2").as("sb"), col("nv").as("nvb"))), "label_b")
      .select(col("label_a"), col("label_b"), col("between_micro2"),
        // within scatter of the pair: summed d2 per VECTOR of the two
        // classes — one floor division of exact integers
        expr("(sa + sb) div (nva + nvb)").as("within_micro2"),
        // separability in integer ppm — scaled in DECIMAL(38,0) (the
        // chiSquare discipline; micro² magnitudes leave BIGINT when
        // multiplied by 10⁶), floor division back to BIGINT
        expr("""CASE WHEN (sa + sb) div (nva + nvb) = 0 THEN NULL ELSE
               CAST((CAST(between_micro2 AS DECIMAL(38,0)) * 1000000)
                 div CAST((sa + sb) div (nva + nvb) AS DECIMAL(38,0)) AS BIGINT)
               END""")
          .as("separability_ppm"))
      .orderBy("label_a", "label_b")
  }

  /** Nearest-class-mean prediction over [[labelCentroids]] — the
    * Rocchio / prototype classifier that pairs with [[knnClassify]]
    * (O(labels) per vector instead of O(corpus); the standard cheap
    * head once classes have prototypes). Each vector takes the label
    * whose centroid maximizes the inner product, ties to the smallest
    * label. One row per vector:
    * `(vec_id, label, predicted_label, score_micro2)`.
    *
    * Exact end to end: both factors are integer micro-units
    * (`floor(v·10⁶)` components × centroid `mean_micro`), so each
    * product and the 64-term sum are pure Long arithmetic
    * (|score| ≤ dims·10¹² — no overflow, no IEEE accumulation) and the
    * argmax is an integer max_by; no window sort, no double anywhere.
    *
    * Scale shape: the centroid table is labels×dims rows — broadcast
    * by construction; one narrow posexplode, one broadcast equi-join
    * on dim (labels rows per component), two hash aggregates. */
  def centroidClassify(embeddings: DataFrame): DataFrame = {
    val cents = labelCentroids(embeddings)
      .select(col("label").as("__clabel"), col("dim"), col("mean_micro"))
    embeddings
      .select(col("vec_id"), col("label").cast("bigint").as("label"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "v")))
      .select(col("vec_id"), col("label"),
        (col("pos") + 1).cast("bigint").as("dim"),
        expr("CAST(floor(v * 1e6) AS BIGINT)").as("__micro"))
      .join(broadcast(cents), Seq("dim"))
      .groupBy("vec_id", "label", "__clabel")
      .agg(sum(col("__micro") * col("mean_micro")).as("__score"))
      .groupBy("vec_id", "label")
      .agg(expr("max_by(__clabel, struct(__score, -__clabel))")
        .as("predicted_label"),
        max(col("__score")).as("score_micro2"))
  }

  /** k-NN majority-vote label prediction — the classic application
    * query over a similarity index (label propagation / quality-tier
    * transfer across an embedded corpus): each vector takes the modal
    * label of its k nearest neighbors, ties to the smallest label. One
    * row per vector: (query_id, label, predicted_label, votes).
    *
    * Shape: neighbors from [[adaptiveTopK]] — the break-even-guarded
    * entry (exact blocked scan below the LSH break-even, identical
    * rows; bucketed LSH pruning above it, so classifying a 100×
    * corpus never pays the O(N²) self-scan); neighbor labels join
    * back by id
    * (id-keyed equi-joins, vectors never reshuffle); the vote argmax is
    * a min_by aggregate over (−votes, label) — partial-aggregated
    * map-side, no window sort. */
  def knnClassify(embeddings: DataFrame, k: Int = 5): DataFrame = {
    val labels = embeddings.select(col("vec_id"), col("label"))
    val votes = adaptiveTopK(embeddings, k)
      .join(labels.toDF("neighbor_id", "n_label"), "neighbor_id")
      .groupBy("query_id", "n_label").agg(count(lit(1)).as("votes"))
    votes.groupBy("query_id")
      .agg(min_by(struct(col("n_label"), col("votes")),
        struct((-col("votes")).as("nv"), col("n_label"))).as("x"))
      .select(col("query_id"), col("x.n_label").as("predicted_label"),
        col("x.votes").as("votes"))
      .join(labels.toDF("query_id", "label"), "query_id")
      .select("query_id", "label", "predicted_label", "votes")
  }

  /** All DIRECTED near pairs at `threshold`, behind the same
    * break-even guard as [[Dedup.adaptiveNearDup]]: probe the corpus's
    * bucket-collision mass ([[lshCandidateFraction]]) and run the LSH
    * candidate path only where it prunes — below break-even (weakly
    * clustered corpus / low threshold, where candidates ≈ all pairs
    * and the bucket join + distinct + id-fetch would cost MORE than
    * the flat scan) the exact blocked scan [[thresholdPairsFor]] runs
    * instead. The LSH branch symmetrizes [[Dedup.embeddingNearDup]]'s
    * canonical (a < b) pairs into both directions; scores are the same
    * sequential-fold dot on both branches, so in the LSH path's
    * recall-1 regime (tight clusters, high threshold — spec-pinned)
    * the two branches are row-identical. */
  def adaptiveDirectedPairs(embeddings: DataFrame, threshold: Double,
                            tables: Int = 24, planes: Int = 3,
                            maxCandidateFraction: Double = 0.25): DataFrame =
    if (lshCandidateFraction(embeddings, tables, planes) >= maxCandidateFraction)
      thresholdPairsFor(embeddings, embeddings, threshold)
    else {
      val canon = Dedup.embeddingNearDup(embeddings, threshold, tables, planes)
      canon.select(col("a").as("query_id"), col("b").as("cand_id"), col("score"))
        .union(canon.select(col("b").as("query_id"), col("a").as("cand_id"),
          col("score")))
    }

  /** Contrastive (anchor, positive, negative) triplet mining — the
    * training-pair builder for embedding-model fine-tuning (SimCSE/
    * sentence-transformers style): every directed near pair at
    * `threshold` becomes an (anchor, positive), and each anchor draws
    * ONE deterministic pseudo-random negative — the md5-least sample
    * vector scoring BELOW the threshold against it.
    *
    * Negatives come from a fixed md5-order global sample of `sampleN`
    * vectors, so the negative stage costs O(anchors·sampleN) dots
    * against a broadcast — never a second all-pairs pass — and the
    * draw is reshuffle-proof (pure function of the id pair, like the
    * train/val/test split). Anchors with no sub-threshold sample
    * vector (pathological: the whole sample is near them) drop out.
    * Positives come from [[adaptiveDirectedPairs]]: the LSH candidate
    * path where the corpus's collision mass says it prunes, the exact
    * blocked scan below its break-even (the wired τ=0.4 corpus's
    * regime) — so the operator's wired plan is no longer quadratic in
    * the corpus wherever pruning is possible, and the negative
    * machinery is unchanged either way. */
  def contrastiveTriplets(embeddings: DataFrame, threshold: Double = 0.4,
                          sampleN: Int = 200,
                          tables: Int = 24, planes: Int = 3,
                          maxCandidateFraction: Double = 0.25): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val pos = adaptiveDirectedPairs(embeddings, threshold, tables, planes,
        maxCandidateFraction)
      .toDF("anchor", "positive", "pos_score")
    val sample = embeddings
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(sampleN)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect()
    val bc = spark.sparkContext.broadcast(sample)
    // negatives for EVERY vector, not just anchors: restricting to
    // anchors would put the O(N²) positive scan in the DAG twice
    // (once under the anchor-id semi-join, once in the final join) and
    // Spark recomputes it both times; the full negative pass is only
    // O(N·sample) broadcast dots — far cheaper than a second exact
    // scan — and non-anchors drop at the final equi-join
    val negs = spread(asDouble(embeddings))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val cand = bc.value
        val dig = java.security.MessageDigest.getInstance("MD5")
        def md5Hex(s: String): String = {
          dig.reset()
          dig.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            .map("%02x".format(_)).mkString
        }
        it.flatMap { case (a, av) =>
          var bestKey: String = null
          var bestId = -1L
          var bestScore = 0.0
          cand.foreach { case (s, sv) =>
            if (s != a) {
              var d = 0.0
              var j = 0
              while (j < av.length) { d += av(j) * sv(j); j += 1 }
              if (d < threshold) {
                val key = md5Hex(s"$a|$s")
                if (bestKey == null || key < bestKey) {
                  bestKey = key; bestId = s; bestScore = d
                }
              }
            }
          }
          if (bestKey == null) None else Some((a, bestId, bestScore))
        }
      }.toDF("anchor", "negative", "neg_score")
    pos.join(negs, "anchor")
      .select("anchor", "positive", "negative", "pos_score", "neg_score")
  }

  /** Recall@k of an approximate ANN against the exact brute force, as a
    * one-row gate: (k, n_queries, recall_ok = recall ≥ bar). Gives the
    * driver an oracle-checkable view of approximate-by-design operators
    * whose raw output can't have a SQL oracle.
    *
    * Recall is estimated on a deterministic SAMPLE of `sampleQueries`
    * query vectors (first in md5(vec_id) order — reproducible
    * pseudo-random, engine-independent): the exact side costs
    * O(sample·N) instead of the O(N²) full-corpus brute force ×1 per
    * gate, which at sf1 would dominate every real operator. A 200-query
    * sample bounds the recall estimate's standard error to ~
    * √(r(1−r)/(200·k)) ≈ 0.01 at r≈0.95, plenty for a ≥0.9 bar; the
    * approximate side still runs the full operator (that IS the thing
    * under test), only its output is filtered to the sampled queries
    * for the comparison. */
  def recallVsExact(embeddings: DataFrame, k: Int, bar: Double,
                    sampleQueries: Int = 200)(
      approx: DataFrame => DataFrame): DataFrame =
    recallVsExactFor(embeddings, k, bar, sampleQueries)(
      (queries, _) => approx(embeddings)
        .join(broadcast(queries.withColumnRenamed("vec_id", "query_id")),
          "query_id"))

  /** The gate with the approximate side driven in (queries, corpus)
    * form: the operator runs ONLY over the sampled queries (identical
    * per-query results — ANN results depend on a query's own
    * probes/buckets against the corpus, spec-asserted), so BOTH gate
    * sides cost O(sample·N) and the gate stops re-running the full
    * self-ANN to discard all but the sample. */
  def recallVsExactFor(embeddings: DataFrame, k: Int, bar: Double,
                       sampleQueries: Int = 200)(
      approxFor: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val qids = embeddings
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(sampleQueries)
      .select(col("vec_id"))
    val sampled = embeddings.join(broadcast(qids), "vec_id")
    // materialize the exact side ONCE as local rows (bounded: sample×k)
    // — referencing the lazy plan from both the matched and the total
    // aggregate re-ran the full O(sample·N) brute-force scan twice per
    // gate evaluation
    val exact = {
      val e = bruteForceTopKFor(sampled, embeddings, k)
        .select("query_id", "neighbor_id")
      e.sparkSession.createDataFrame(
        java.util.Arrays.asList(e.collect(): _*), e.schema)
    }
    val ap = approxFor(sampled, embeddings).select("query_id", "neighbor_id")
    // one pass: per-(query, neighbor) ap rows are unique (ranked top-k),
    // so a left join cannot duplicate exact rows — count(*) is the
    // total, count(__hit) the intersection (== the former left_semi)
    val scored = exact
      .join(ap.withColumn("__hit", lit(1)), Seq("query_id", "neighbor_id"), "left_outer")
      .agg(count(lit(1)).cast("double").as("__total"),
        count(col("__hit")).cast("double").as("__matched"))
    qids.agg(count(lit(1)).as("n_queries"))
      .crossJoin(scored)
      .select(lit(k.toLong).as("k"), col("n_queries"),
        (col("__matched") / col("__total") >= bar).as("recall_ok"))
  }
}

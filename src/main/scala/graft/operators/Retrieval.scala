package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import org.apache.spark.sql.Encoders

/** Sparse lexical retrieval over the `documents` table — the
  * decontamination / nearest-neighbor-text companion to the dense ANN
  * path ([[Similarity]]): given a set of query documents, return the
  * top-k corpus documents per query under a BM25-family score
  * (Robertson–Spärck Jones; the Okapi BM25 term-frequency saturation
  * with the RATIONAL idf variant `(N - df + 0.5) / (df + 0.5)` — the
  * usual `ln` of that ratio is a libm transcendental and not
  * cross-engine reproducible, and `ln` is monotone, so dropping it
  * reweights but never reorders a single-term ranking; the multi-term
  * ranking is a documented variant, not textbook BM25).
  *
  * Determinism contract: every per-term score is a fixed-shape chain of
  * correctly-rounded IEEE-754 ops (+, −, ×, ÷) over exactly-represented
  * integers, then QUANTIZED to integer micro-units
  * (`floor(score · 10⁶)`) BEFORE the cross-term sum — so accumulation
  * is integer, order-free, and bit-identical to the DuckDB oracle. One
  * document-set statistic (`avgdl`) is itself a single correctly-
  * rounded division of exact integers.
  *
  * Scale shape (the classic distributed inverted-index probe):
  * - postings `(term, doc_id, tf, dl)` are one explode + one
  *   hash-aggregate over the corpus; document BODIES never shuffle.
  * - the query term set is small by definition → `broadcast` joined
  *   against postings, so only postings matching some query term flow
  *   into scoring (candidate generation, not a corpus scan).
  * - `df` is computed ONLY for matched terms (aggregate after the
  *   candidate join), not for the whole vocabulary.
  * - top-k is a per-query window over candidates — k·|queries| rows
  *   out. At 1000 executors this is a broadcast probe + two narrow
  *   aggregates; no all-pairs stage exists.
  */
object Retrieval {

  /** Fitted BM25 inverted index — the persisted-artifact form of the
    * lexical engine (what Lucene's segment files are to Elasticsearch):
    *
    *  - `postings` — one row per distinct `(doc_id, term)`:
    *    `(doc_id, dl, term, tf)`. THE index body; built by one
    *    explode + one hash-aggregate over the corpus, document bodies
    *    never stored or shuffled again.
    *  - `termDf` — one row per vocabulary term: `(term, df_t)` —
    *    document frequency, precomputed at fit so a probe never
    *    re-aggregates the postings.
    *  - `nDocs` / `sumDl` — the two exact-integer corpus statistics;
    *    `avgdl` derives by ONE correctly-rounded IEEE division
    *    (bit-identical to the previous per-call Spark aggregate).
    *
    * Lifecycle mirrors the ANN family ([[IvfIndex]]/[[PqIndex]]):
    * [[fitBm25]] → probe many times ([[bm25TopKWith]]), [[saveBm25]] /
    * [[loadBm25]] for the durable form, [[fitBm25Cached]] for the
    * per-session memo. At 100 TB the index is built once (two
    * aggregates over the corpus), persisted partitioned, and every
    * probe is a broadcast of query terms against it — rebuilding
    * postings per query batch, as the pre-index `bm25TopK` did, pays
    * the corpus scan each call. */
  final case class Bm25Index(postings: DataFrame, termDf: DataFrame,
                             nDocs: Long, sumDl: Long) {
    def avgdl: Double = sumDl.toDouble / nDocs.toDouble
  }

  /** Build the [[Bm25Index]] for a corpus. Both index legs are
    * `localCheckpoint`ed (materialized, lineage cut) so repeated probes
    * re-read a stored index, never the corpus; use [[saveBm25]] for the
    * executor-loss-durable form. */
  def fitBm25(docs: DataFrame): Bm25Index = {
    val postings = docs
      .select(col("doc_id"), split(col("text"), " ").as("__l"))
      .select(col("doc_id"), size(col("__l")).cast("bigint").as("dl"),
        explode(col("__l")).as("term"))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    // postings are one row per distinct (doc, term), so a plain count
    // per term IS the document frequency
    val termDf = postings
      .groupBy("term").agg(count(lit(1)).as("df_t"))
      .localCheckpoint()
    val statsRow = docs
      .select(size(split(col("text"), " ")).cast("bigint").as("__dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__dl")).as("sum_dl"))
      .collect()(0)
    Bm25Index(postings, termDf, statsRow.getLong(0),
      if (statsRow.isNullAt(1)) 0L else statsRow.getLong(1))
  }

  /** Persist an index: postings keep their partitioning (the big leg),
    * vocabulary and the two scalar stats coalesce to single files. */
  def saveBm25(index: Bm25Index, dir: String): Unit = {
    val spark = index.postings.sparkSession
    import spark.implicits._
    index.postings.write.mode("overwrite").parquet(s"$dir/postings")
    index.termDf.coalesce(1).write.mode("overwrite").parquet(s"$dir/terms")
    Seq((index.nDocs, index.sumDl)).toDF("n_docs", "sum_dl")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  def loadBm25(spark: org.apache.spark.sql.SparkSession, dir: String): Bm25Index = {
    val meta = spark.read.parquet(s"$dir/meta").collect()(0)
    Bm25Index(spark.read.parquet(s"$dir/postings"),
      spark.read.parquet(s"$dir/terms"),
      meta.getAs[Long]("n_docs"), meta.getAs[Long]("sum_dl"))
  }

  /** Index payload is two checkpointed DataFrames bound to THIS
    * session's block manager — unlike the scalar probe memo the entry
    * must never outlive or cross its SparkContext, so the key carries
    * the context's applicationId + session identity (a later suite
    * reading the same files through a fresh context re-fits). */
  private val bm25Memo = new ModelMemo[Bm25Index]

  /** Explicit cache reset (see [[ModelMemo.invalidate]]). */
  def invalidateBm25Cache(): Unit = bm25Memo.invalidate()

  /** [[fitBm25]] memoized per (corpus fingerprint, session) — the
    * repeated-probe shape `bm25TopK`/[[hybridRrfTopK]] compositions
    * hit inside one session. */
  def fitBm25Cached(docs: DataFrame): Bm25Index =
    bm25Memo.getOrCompute(docs,
      s"bm25|${docs.sparkSession.sparkContext.applicationId}" +
        s"|${System.identityHashCode(docs.sparkSession)}") {
      fitBm25(docs)
    }

  /** Top-`k` corpus documents per query document. Query term semantics:
    * DISTINCT terms of the query text (set-of-words; query-side tf is
    * ignored, the common practice for short queries). Scores are
    * emitted as `score_micro` (BIGINT, 10⁻⁶ units); ties break on
    * ascending `doc_id`. Fits (or reuses — [[fitBm25Cached]]) the
    * corpus index, then probes it. */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int = 10): DataFrame =
    bm25TopKWith(fitBm25Cached(docs), queries, k)

  /** Probe a fitted [[Bm25Index]]: broadcast the query term set
    * against postings (candidate generation — only postings matching
    * some query term flow into scoring), attach the precomputed df and
    * corpus stats, score, and take the per-query top-k window. */
  def bm25TopKWith(index: Bm25Index, queries: DataFrame, k: Int = 10): DataFrame = {
    val postings = index.postings
    // one-row stats relation keeps the scoring expression byte-identical
    // to the pre-index form (same crossJoin, same column names, same
    // IEEE op order); lit() carries the exact fit-time values
    val stats = postings.sparkSession.range(1)
      .select(lit(index.nDocs).as("n_docs"), lit(index.avgdl).as("avgdl"))
    val qterms = queries
      .select(col("doc_id").as("query_id"),
        explode(split(col("text"), " ")).as("term"))
      .distinct()
    val df = index.termDf
      .join(broadcast(qterms.select("term").distinct()), Seq("term"))
    val scored = postings
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      // k1 = 1.2, b = 0.75 folded into e0-suffixed literals (k1+1 =
      // 2.2e0, 1-b = 0.25e0, k1·b = … kept factored): scientific
      // notation parses as DOUBLE in BOTH engines, so no decimal-vs-
      // double implicit-cast divergence; identical op order, identical
      // floor
      .withColumn("__micro", expr(
        """CAST(floor((((CAST(n_docs AS DOUBLE) - df_t + 0.5e0) / (df_t + 0.5e0))
          |  * ((tf * 2.2e0) / (tf + 1.2e0 * (0.25e0 + 0.75e0 * (dl / avgdl)))))
          |  * 1e6) AS BIGINT)""".stripMargin))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("__micro")).as("score_micro"),
        count(lit(1)).as("n_terms_hit"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col("doc_id"))
    scored
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= k)
      .select("query_id", "doc_id", "rnk", "score_micro", "n_terms_hit")
  }

  /** Hybrid lexical + dense retrieval by reciprocal-rank fusion
    * (Cormack et al. 2009 RRF): fuse each query's BM25 top-`kEach`
    * lexical list and exact-cosine top-`kEach` embedding list with
    * `Σ_lists 1/(rrfK + rank)` — the standard zero-tuning fusion that
    * needs only RANKS, never the two engines' incomparable raw scores.
    *
    * Determinism contract: each list contribution quantizes to integer
    * micro-units (`floor(10⁶ / (rrfK + rank))` — one correctly-rounded
    * IEEE division of exact integers, then floor) BEFORE the sum, so
    * fusion is integer arithmetic and bit-identical to the DuckDB
    * oracle; final ties break on ascending doc_id. Self-matches are
    * excluded from the fused result (the lexical list ranks them —
    * a query trivially retrieves itself — but fusion drops them).
    *
    * Scale shape: both sides are existing engine operators at their
    * scale shapes ([[bm25TopK]]'s broadcast inverted-index probe;
    * [[Similarity.adaptiveTopKFor]] as the dense list — the break-even
    * guard probes the corpus's bucket-collision mass and picks the
    * exact blocked scan below the index's break-even (this testdata's
    * regime, where the pinned oracle certifies it bit-exactly) and the
    * LSH-bucketed candidate path where buckets prune, so the wired
    * plan is sub-quadratic wherever pruning is possible; the fusion is
    * rank-only and identical either way); the fusion itself joins two
    * k·|queries|-row rank lists on (query_id, doc_id) — bounded
    * whatever the corpus. */
  def hybridRrfTopK(docs: DataFrame, embeddings: DataFrame,
                    queryDocs: DataFrame, queryVecs: DataFrame,
                    k: Int = 10, kEach: Int = 10, rrfK: Int = 60,
                    denseTables: Int = 40, densePlanes: Int = 5,
                    denseDims: Int = 64,
                    maxCandidateFraction: Double = 0.25): DataFrame = {
    val lex = bm25TopK(docs, queryDocs, kEach)
      .select(col("query_id"), col("doc_id"), col("rnk").as("lex_rnk"))
    val dense = Similarity.adaptiveTopKFor(queryVecs, embeddings, kEach,
        denseTables, densePlanes, denseDims, maxCandidateFraction)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank").cast("bigint").as("dense_rnk"))
    val fused = lex.join(dense, Seq("query_id", "doc_id"), "full_outer")
      .filter(col("query_id") =!= col("doc_id"))
      .select(col("query_id"), col("doc_id"),
        (coalesce(expr(s"CAST(floor(1000000.0e0 / ($rrfK + lex_rnk)) AS BIGINT)"), lit(0L)) +
          coalesce(expr(s"CAST(floor(1000000.0e0 / ($rrfK + dense_rnk)) AS BIGINT)"), lit(0L)))
          .as("rrf_micro"),
        (when(col("lex_rnk").isNotNull, 1L).otherwise(0L) +
          when(col("dense_rnk").isNotNull, 1L).otherwise(0L)).as("n_sources"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_micro").desc, col("doc_id"))
    fused
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= k)
      .select("query_id", "doc_id", "rnk", "rrf_micro", "n_sources")
  }

  /** Retrieval-quality metrics: score a ranked result list against a
    * per-query relevance set (qrels) — the recall@k / MRR report every
    * retrieval deployment watches. `results` carries
    * `(query_id, doc_id, rnk)` (any engine's top list); `qrels` carries
    * `(query_id, doc_id)` ground-truth pairs.
    *
    * Per query: `n_rel` (ground-truth size), `n_hit` (relevant docs
    * retrieved within rank ≤ `k`), `first_rel_rank` (rank of the first
    * relevant hit, NULL when none), `mrr_micro` =
    * `1000000 div first_rel_rank` (0 when no hit) and `recall_micro` =
    * `(1000000 · n_hit) div n_rel` — both integer floor divisions of
    * exact integers, so the report is bit-identical to any SQL engine
    * computing the same divisions (no IEEE reciprocal ever happens).
    *
    * Scale shape: both inputs are k·|queries| rank lists (bounded
    * whatever the corpus); one equi-join on (query_id, doc_id) and two
    * narrow aggregates. Queries with an empty result list still report
    * (outer join on the qrels side) — a silent engine failure reads as
    * recall 0, not a missing row. */
  def evalMetrics(results: DataFrame, qrels: DataFrame, k: Int = 10): DataFrame = {
    val r = results.filter(col("rnk") <= k)
      .select(col("query_id"), col("doc_id"), col("rnk"))
    val rel = qrels.select(col("query_id"), col("doc_id"))
      .withColumn("__rel", lit(1L))
    val hits = r.join(rel, Seq("query_id", "doc_id"), "left")
    val nRel = rel.groupBy("query_id")
      .agg(count(lit(1)).as("n_rel"))
    val perQuery = hits.groupBy("query_id").agg(
      sum(coalesce(col("__rel"), lit(0L))).as("__n_hit"),
      min(when(col("__rel").isNotNull, col("rnk"))).cast("bigint")
        .as("first_rel_rank"))
    nRel.join(perQuery, Seq("query_id"), "left")
      .select(col("query_id"), col("n_rel"),
        coalesce(col("__n_hit"), lit(0L)).as("n_hit"),
        col("first_rel_rank"),
        coalesce(expr("1000000L div first_rel_rank"), lit(0L)).as("mrr_micro"),
        expr("(1000000L * coalesce(__n_hit, 0L)) div n_rel").as("recall_micro"))
  }

  /** Maximal-marginal-relevance diversified re-ranking (Carbonell &
    * Goldstein 1998): from each query's exact-cosine top-`m` candidate
    * list, greedily select `k` documents maximizing
    * `λ·sim(q,d) − (1−λ)·max_{s∈selected} sim(d,s)` — the standard
    * redundancy-penalized top-k that keeps a near-duplicate-heavy
    * corpus from filling the whole result list with one document's
    * clones.
    *
    * Determinism contract: relevance and pairwise similarities quantize
    * to integer micro-units (`floor(sim·10⁶)`, each from one fixed-order
    * double dot fold) BEFORE the greedy arithmetic, λ arrives already in
    * micro-units (`lambdaMicro`), and each greedy step's objective is
    * pure Long arithmetic (`λµ·rel − (10⁶−λµ)·maxPair`, |values| <
    * 10¹² — no overflow, no IEEE accumulation); ties break on ascending
    * doc id. The result is a pure function of (corpus, params) → the
    * sf0.01 rows pin as a VALUES oracle like the engaged ANN paths.
    *
    * Scale shape: candidates come from [[Similarity.adaptiveTopKFor]]
    * — the break-even-guarded entry (exact blocked scan below the LSH
    * break-even, where the branches are row-identical; bucketed LSH
    * candidates above it — the rerank only consumes the list);
    * vectors attach by id-equi join (never all-pairs); the greedy runs
    * per query over m ≤ ~100 candidates inside `flatMapGroups` — O(k·m)
    * dot products on ≤ m vectors per group, bounded whatever the
    * corpus. */
  def mmrRerank(queryVecs: DataFrame, corpus: DataFrame, k: Int = 5,
                m: Int = 20, lambdaMicro: Long = 700000L): DataFrame = {
    require(lambdaMicro >= 0L && lambdaMicro <= 1000000L,
      s"lambdaMicro must be in [0, 1000000], got $lambdaMicro")
    val spark = corpus.sparkSession
    import spark.implicits._
    val cands = Similarity.adaptiveTopKFor(queryVecs, corpus, m)
      .select(col("query_id"), col("neighbor_id"),
        expr("CAST(floor(score * 1e6) AS BIGINT)").as("rel_micro"))
    val withVec = cands.join(
        corpus.select(col("vec_id").as("neighbor_id"),
          col("embedding").cast("array<double>").as("__v")),
        Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("rel_micro"), col("__v"))
      .as[(Long, Long, Long, Array[Double])]
    val out = withVec.groupByKey(_._1).flatMapGroups { (qid, it) =>
      // deterministic greedy input order: rel desc, id asc — the group's
      // content alone fixes the output whatever the partitioning
      val cs = it.toArray.sortBy(t => (-t._3, t._2))
      val n = cs.length
      def pairMicro(i: Int, j: Int): Long = {
        val a = cs(i)._4; val b = cs(j)._4
        var s = 0.0; var d = 0
        while (d < a.length) { s += a(d) * b(d); d += 1 }
        math.floor(s * 1e6).toLong
      }
      val selected = new scala.collection.mutable.ArrayBuffer[Int](k)
      val used = new Array[Boolean](n)
      val rows = Vector.newBuilder[(Long, Long, Long, Long, Long)]
      var r = 1
      while (r <= math.min(k, n)) {
        var best = -1; var bestScore = Long.MinValue; var bestId = Long.MaxValue
        var i = 0
        while (i < n) {
          if (!used(i)) {
            var maxPair = 0L
            var first = true
            selected.foreach { j =>
              val p = pairMicro(i, j)
              if (first || p > maxPair) { maxPair = p; first = false }
            }
            val score = lambdaMicro * cs(i)._3 - (1000000L - lambdaMicro) * maxPair
            if (score > bestScore || (score == bestScore && cs(i)._2 < bestId)) {
              best = i; bestScore = score; bestId = cs(i)._2
            }
          }
          i += 1
        }
        used(best) = true
        selected += best
        rows += ((qid, cs(best)._2, r.toLong, cs(best)._3, bestScore))
        r += 1
      }
      rows.result().iterator
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong))
    out.toDF("query_id", "doc_id", "rnk", "rel_micro", "mmr_micro")
  }
}

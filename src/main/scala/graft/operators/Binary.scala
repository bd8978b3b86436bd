package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binary (sign-bit) quantization — the 32× compression rung under
  * [[Sq8]] (8 bits/dim) and [[PqIndex]] (16×4 bits/vector): one bit
  * per dimension (`v_j > 0`), packed into two 32-bit halves riding in
  * BIGINTs, searched by Hamming distance (`bit_count(xor)` — a handful
  * of ALU ops per candidate vs 64 FMA lanes for the float dot). The
  * memory-bandwidth tier a billion-vector first-pass filter runs on.
  *
  * Everything here is EXACTLY SQL-expressible — codes are integer sums
  * of powers of two, distances are popcounts — so unlike the other ANN
  * tiers the whole search carries a full value oracle, not a pinned
  * one. Determinism: strict `> 0` sign test, (distance asc, id asc)
  * ranking ties.
  *
  * Honest limit (the [[Sq8]] Matryoshka argument): on the engine's
  * weakly-clustered stress corpus, binary top-5 recovers only ~0.20 of
  * the cosine top-5 — sign bits keep the octant, not the fine
  * structure, and this corpus's variance is spread uniformly. That is
  * the expected operating mode: production binary tiers OVER-FETCH
  * (top-hundreds) and rerank with full vectors; the driver query ships
  * the tier as what it provably is — the exact answer in Hamming
  * space with a full value oracle — and `BinarySpec` pins the regime
  * where sign structure exists (axis-aligned clusters → every binary
  * neighbor stays inside the query's cluster, the first-pass filter's
  * actual job; the full-vector rerank orders within it).
  *
  * Scale shape: codes are one narrow posexplode + one hash aggregate
  * (3 longs per vector out); the top-k scan broadcasts the code table
  * (3 longs/row ⇒ ~24 MB per 10⁶ vectors — broadcastable far past the
  * float table's limits) against partitioned queries through the
  * bounded-heap ranker. Past broadcast range, the shared pigeonhole
  * band machinery ([[Dedup.hammingPairs]]) is the candidate
  * generator — same codes, same distance. */
object Binary {

  /** Sign-bit codes: `(vec_id, hi, lo)` — bit `31−j` of `hi` for
    * dimensions 0..31, bit `63−j` of `lo` for 32..63. Dims beyond 64
    * are rejected rather than silently truncated. */
  def codes(embeddings: DataFrame): DataFrame = {
    // fail loudly on >64 dims (one pruned narrow probe — a silent
    // truncation would quietly zero half the signal)
    val dims = embeddings.agg(max(size(col("embedding")))).head()
    require(dims.isNullAt(0) || dims.getInt(0) <= 64,
      s"Binary.codes supports at most 64 dimensions, got ${dims.get(0)}")
    embeddings
      .select(col("vec_id"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "v")))
      .groupBy("vec_id")
      .agg(
        sum(expr("IF(pos < 32 AND v > 0.0D, shiftleft(1L, 31 - pos), 0L)"))
          .as("hi"),
        sum(expr("IF(pos >= 32 AND v > 0.0D, shiftleft(1L, 63 - pos), 0L)"))
          .as("lo"))
  }

  /** Exact Hamming top-`k` of each query against the corpus, in code
    * space: similarity = 64 − popcount(xor) with ascending-id ties;
    * self-matches excluded. Full SQL oracle — this IS the binary
    * tier's exact answer, not an approximation of it (its agreement
    * with float cosine is a separate, measurable question — the
    * recall-gate protocol covers engaged approximate paths). */
  def topKFor(queries: DataFrame, corpus: DataFrame, k: Int = 5): DataFrame = {
    val qc = codes(queries).select(col("vec_id").as("query_id"),
      col("hi").as("__qhi"), col("lo").as("__qlo"))
    val cc = codes(corpus).select(col("vec_id").as("cand_id"),
      col("hi").as("__chi"), col("lo").as("__clo"))
    // rank through the bounded-heap aggregator, not a window: the
    // window formulation sorts all |Q|·|C| scored pairs through one
    // exchange (measured 2.5 s at sf0.1 self-ANN); the heap partial-
    // reduces map-side and exchanges ≤ |Q|·k entries (0.6 s). Hamming
    // sims ≤ 64 are exact in the heap's double score; same
    // (score desc, id asc) tie order.
    val scored = qc.crossJoin(broadcast(cc))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id").as("neighbor_id"),
        expr("CAST(64 - bit_count(__qhi ^ __chi) - bit_count(__qlo ^ __clo) AS DOUBLE)")
          .as("score"))
    Similarity.rankTopK(scored, k)
      .select(col("query_id"), col("rank").cast("bigint").as("rank"),
        col("neighbor_id"), col("score").cast("bigint").as("hamming_sim"))
  }

  /** Self-ANN form. */
  def topK(embeddings: DataFrame, k: Int = 5): DataFrame =
    topKFor(embeddings, embeddings, k)

  /** The tier's production mode: binary OVER-FETCH (`overFetch`
    * Hamming candidates per query — the popcount-cheap first pass)
    * then exact full-vector rerank of just those candidates to the
    * final top-`k`. Still fully deterministic and SQL-expressible end
    * to end, so the composed pipeline keeps a full value oracle.
    *
    * Measured trade on the stress corpus (sf0.01): over-fetch 50
    * (10 % of the corpus) recovers 0.69 of the cosine top-5 — up from
    * 0.20 for raw binary top-5 — and the knob is `overFetch`, paid in
    * popcounts, not dots. Scale shape: candidate generation as
    * [[topKFor]] (broadcast codes), then an id-equi vector fetch for
    * overFetch·|queries| rows only — the full-vector work shrinks by
    * |corpus|/overFetch. */
  def rerankTopKFor(queries: DataFrame, corpus: DataFrame, k: Int = 5,
                    overFetch: Int = 50): DataFrame = {
    val cand = topKFor(queries, corpus, overFetch)
      .select(col("query_id"), col("neighbor_id"))
    val vecs = corpus.select(col("vec_id"),
      col("embedding").cast("array<double>").as("__v"))
    val scored = cand
      .join(vecs.select(col("vec_id").as("query_id"), col("__v").as("__qv")),
        "query_id")
      .join(vecs.select(col("vec_id").as("neighbor_id"), col("__v").as("__cv")),
        "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        Similarity.dot(col("__qv"), col("__cv")).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "score")
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index: k-means coarse quantizer + per-list
  * exact search with multi-probe.
  *
  * This is the IVF-*flat* variant — lists carry full vectors, probed
  * candidates score by exact dot, the only error source is the probe
  * fraction. [[PqIndex]] is the same layout with product-quantized
  * lists (64× smaller, ADC scoring + refine): prefer it when the index
  * must fit cluster memory at full corpus scale; prefer this when
  * per-candidate exactness matters more than list size.
  *
  * The scale structure: centroids are tiny (nClusters×dims) and live on
  * the driver/broadcast; vector assignment is a narrow mapPartitions
  * against the broadcast; search touches only the `probes` nearest
  * inverted lists instead of the whole corpus (expected cost
  * probes/nClusters of brute force). All arithmetic is the same
  * sequential double fold as the rest of the engine.
  *
  * Build and query are SEPARATE lifecycles: [[build]] fits the
  * quantizer once and persists the inverted lists partitioned AND
  * sorted by (cluster, chunk); [[query]] probes a built index — so a
  * query batch never re-runs k-means and never reshuffles or re-sorts
  * the list side. The probe join is salted the skew-canonical way
  * (salt the big probe stream, replicate the list store): each list is
  * replicated into `chunks` copies at build time and each probe row
  * carries ONE content-hash chunk, so the exchange is keyed on
  * nClusters×chunks keys instead of nClusters — a hot list's probe
  * traffic spreads over `chunks` reducers and parallelism scales with
  * the index, not the (previously fixed-16) cluster count. Only probe
  * rows move at query time; corpus vectors never re-shuffle.
  *
  * Deterministic structure: centroid seeds are the first nClusters
  * vectors in md5(vec_id) order (reproducible pseudo-random spread),
  * assignment is exact-arithmetic argmax with id tie-break, and chunk
  * assignment is a content hash. Centroid LOW BITS can vary with the
  * partition layout (Lloyd's partial sums are double additions, which
  * are order-sensitive) — the operator's contract is the recall gate,
  * not bit-identical centroids; everything downstream of a FIXED model
  * is bit-deterministic.
  */
object IvfIndex {

  final case class Model(centroids: Array[Array[Double]]) extends Serializable

  /** A built index: quantizer + persisted inverted lists, pre-shuffled
    * and pre-sorted by (cluster, chunk), each list replicated `chunks`
    * ways (the salt's replica side — memory × chunks buys hot-list
    * parallelism; chunks=1 disables salting). Reuse across query
    * batches; `close()` drops the cached lists.
    *
    * `deltas` are [[append]] segments in the same layout — the LSM
    * ingest pattern shared with [[PqIndex.Index]]. */
  final case class Index(model: Model, lists: DataFrame, chunks: Int,
                         deltas: Seq[DataFrame] = Nil) {
    private[operators] def segments: Seq[DataFrame] = lists +: deltas
    def close(): Unit = segments.foreach(_.unpersist())
  }

  /** nClusters ≈ 2√N, the classic IVF sizing (lists of ~√N/2 vectors):
    * keeps both the quantizer scan (N·nClusters) and the probed-list
    * scan (probes·N/nClusters) sublinear in N as the corpus grows.
    * 500 vectors → 45 lists, 2 000 → 90, 10⁹ → 4096 (capped: beyond
    * that a second-level quantizer beats more flat lists). */
  def autoClusters(n: Long): Int =
    math.max(16, math.min(4096, math.ceil(2.0 * math.sqrt(n.toDouble)).toInt))

  private def toVecs(embeddings: DataFrame): Dataset[(Long, Array[Double])] =
    Similarity.toVecs(embeddings)

  private[operators] def nearest(v: Array[Double], cs: Array[Array[Double]]): Int = {
    var best = 0
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < cs.length) {
      var s = 0.0
      val cv = cs(c)
      var j = 0
      while (j < v.length) { s += v(j) * cv(j); j += 1 }
      if (s > bestScore) { bestScore = s; best = c }   // ties → lowest id
      c += 1
    }
    best
  }

  /** Session-scoped memo for [[fitCached]] ([[ModelMemo]]: keyed on
    * plan fingerprint + input-file inventory + params; in-memory
    * relations bypass it). [[fit]] is deterministic for a given
    * dataset, so callers that share a corpus share one quantizer
    * instead of re-running Lloyd per query — the r4 bench paid three
    * identical k-means fits per round across the semantic-dedup
    * family. Centroid payload is nClusters×dims doubles (≤ a few MB);
    * the map self-clears past 64 entries as a leak guard. */
  private val fitMemo = new ModelMemo[(Long, Model)]

  /** Explicit cache reset (see [[ModelMemo.invalidate]]). */
  def invalidateFitCache(): Unit = fitMemo.invalidate()

  /** [[fit]] with auto-sizing and per-session memoization. Returns the
    * resolved model; nClusters ≤ 0 → [[autoClusters]] of the corpus
    * count (the count is memoized with the model — it is the other
    * repeated job the un-memoized path paid per call). */
  def fitCached(embeddings: DataFrame, nClusters: Int = -1, iters: Int = 3): Model =
    fitMemo.getOrCompute(embeddings, s"ivf:$nClusters:$iters") {
      val n = embeddings.count()
      val nc = if (nClusters > 0) nClusters else autoClusters(n)
      (n, fit(embeddings, nc, iters))
    }._2

  /** Fixed-point scale for the Lloyd sums: per-element contributions
    * round to 2⁻²⁰ (≈1e-6 — immaterial against unit-norm vectors), in
    * exchange for EXACT integer partial sums whose merges are
    * associative and commutative — the fit is therefore
    * layout-deterministic (any partitioning, any reduce order), not
    * just same-layout-deterministic. Headroom: |v|≤1 ⇒ a cluster
    * holds ~2⁴³ rows before a long could overflow. */
  private val FixedPointScale = 1L << 20

  /** Lloyd's k-means (dot-product objective over normalized vectors).
    * The corpus scan is [[Similarity.spread]] first: single-row-group
    * local parquet otherwise runs every Lloyd pass on ONE task — the
    * exact single-core shape the bench postmortem showed is
    * JIT-deopt-vulnerable, and a serial scan besides. Partial sums
    * accumulate in [[FixedPointScale]] integer units, so the
    * reduceByKey merge order cannot move a bit — fit(x) == fit(x)
    * across ANY layout (spec-pinned), which is what lets [[spread]]
    * wrap this scan without violating its own order-sensitivity
    * rule. */
  def fit(embeddings: DataFrame, nClusters: Int = 16, iters: Int = 5): Model = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val vecs = toVecs(Similarity.spread(embeddings)).cache()
    // deterministic seeding: md5-order pseudo-random sample
    var centroids = vecs
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(nClusters)
      .collect().map(_._2)
    for (_ <- 1 to iters) {
      val bc = spark.sparkContext.broadcast(centroids)
      val sums = vecs.mapPartitions { it =>
        val cs = bc.value
        val acc = Array.fill(cs.length)(new Array[Long](cs(0).length))
        val cnt = new Array[Long](cs.length)
        it.foreach { case (_, v) =>
          val c = nearest(v, cs)
          var j = 0
          while (j < v.length) {
            acc(c)(j) += math.round(v(j) * FixedPointScale); j += 1
          }
          cnt(c) += 1
        }
        acc.indices.iterator.map(c => (c, acc(c), cnt(c)))
      }.rdd
        .keyBy(_._1)
        .reduceByKey { (a, b) =>
          val s = a._2.clone()
          var j = 0
          while (j < s.length) { s(j) += b._2(j); j += 1 }
          (a._1, s, a._3 + b._3)
        }
        .values.collect()
      centroids = centroids.indices.map { c =>
        sums.find(_._1 == c).filter(_._3 > 0).map { case (_, s, n) =>
          // re-normalize the mean so dot stays a cosine proxy; fixed
          // division order keeps the double chain deterministic
          val m = s.map(_.toDouble / FixedPointScale / n)
          val norm = math.sqrt(m.map(x => x * x).sum)
          if (norm > 0) m.map(_ / norm) else centroids(c)
        }.getOrElse(centroids(c))                      // empty list keeps seed
      }.toArray
    }
    vecs.unpersist()
    Model(centroids)
  }

  /** Inverted-list assignment of every vector. Per-row map — spread
    * across executor threads (single-row-group local inputs otherwise
    * serialize the scan; see [[Similarity.spread]]). */
  def assign(embeddings: DataFrame, model: Model): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model.centroids)
    toVecs(Similarity.spread(embeddings)).mapPartitions { it =>
      val cs = bc.value
      it.map { case (id, v) => (id, nearest(v, cs), v) }
    }.toDF("vec_id", "cluster", "v")
  }

  /** Soft (multi-)assignment: each vector to its `m` nearest centroids,
    * one row per (vec_id, cluster, v). The cluster-blocking primitive
    * for [[Dedup.semanticNearDup]] — a pair near in cosine is near both
    * vectors' top centroids, so sharing ANY of the m clusters makes it
    * a candidate (m=1 is hard assignment; larger m trades list volume
    * for cross-boundary recall). Same narrow broadcast-scan shape as
    * [[assign]]. */
  def assignMulti(embeddings: DataFrame, model: Model, m: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model.centroids)
    toVecs(Similarity.spread(embeddings)).mapPartitions { it =>
      val cs = bc.value
      val mm = math.min(m, cs.length)
      it.flatMap { case (id, v) =>
        val scored = cs.indices.map { c =>
          var s = 0.0
          var j = 0
          while (j < v.length) { s += v(j) * cs(c)(j); j += 1 }
          (c, s)
        }
        scored.sortBy(t => (-t._2, t._1)).take(mm)
          .map { case (c, _) => (id, c, v) }
      }
    }.toDF("vec_id", "cluster", "v")
  }

  /** Build the index once: fit the quantizer, assign every vector,
    * replicate each list across the `chunksPerList` salt replicas, and
    * persist the lists already partitioned and sorted by the
    * (cluster, chunk) probe-join key — query batches sort-merge against
    * this layout with zero exchange and zero sort on the corpus side.
    * Eager: the lists materialize here, not in the first query.
    *
    * nClusters ≤ 0 → [[autoClusters]] of the corpus size. iters=3:
    * measured recall@5 is iteration-insensitive on the gate corpora
    * (0.944 vs 0.946 at 3 vs 5 iters, sf0.01 — probe fraction, not
    * centroid convergence, governs recall on weakly-clustered data),
    * and each saved Lloyd pass is a full corpus scan. */
  def build(embeddings: DataFrame, nClusters: Int = -1, iters: Int = 3,
            chunksPerList: Int = 4): Index = {
    val model = fitCached(embeddings, nClusters, iters)
    Index(model, layout(embeddings, model, chunksPerList), chunksPerList)
  }

  /** Assignment of `embeddings` into the persisted (cluster, chunk)
    * replicated, partitioned, sorted list layout. */
  private def layout(embeddings: DataFrame, model: Model,
                     chunksPerList: Int): DataFrame = {
    val lists = assign(embeddings, model)
      // replica side of the salt: each list row in every chunk
      .withColumn("chunk", explode(sequence(lit(0), lit(chunksPerList - 1))))
      .repartition(col("cluster"), col("chunk"))
      .sortWithinPartitions("cluster", "chunk")
      .persist()
    lists.count()                                     // materialize now
    lists
  }

  /** Incremental maintenance, same contract as [[PqIndex.append]]:
    * assign a NEW batch against the frozen quantizer and attach it as a
    * delta segment — O(batch) per ingest micro-batch; the quantizer
    * only drifts on re-[[build]]. */
  def append(index: Index, newEmbeddings: DataFrame): Index =
    index.copy(deltas = index.deltas :+
      layout(newEmbeddings, index.model, index.chunks))

  /** Fold base + delta segments into one re-laid-out list store
    * ([[PqIndex.compact]] semantics: results unchanged, plan fan-out
    * reset). */
  def compact(index: Index): Index = {
    val merged = index.segments.reduce(_ unionByName _)
      .repartition(col("cluster"), col("chunk"))
      .sortWithinPartitions("cluster", "chunk")
      .persist()
    merged.count()
    index.segments.foreach(_.unpersist())
    index.copy(lists = merged, deltas = Nil)
  }

  /** ANN top-k against a built index, multi-probe: each query searches
    * its `probes` nearest inverted lists exactly. Approximate
    * (recall < 1; brute force is the oracle) — recall tracks the probed
    * corpus fraction on weakly-clustered data, so the operating point
    * (probes/nClusters) is certified by the driver-visible recall gate.
    *
    * probes ≤ 0 → 60% of the lists: the ≥0.9-recall operating point on
    * the weakly-clustered testdata vectors (tightly clustered corpora
    * reach it with far fewer — tune per corpus against the gate).
    *
    * Shape: probe rows are (query_id, cluster, chunk, qv) — one row per
    * probed list, chunk = content hash of the query id (the salt) —
    * sort-merge-joined against the pre-partitioned pre-sorted lists on
    * (cluster, chunk): only the probe side exchanges (nClusters×chunks
    * keys), the corpus side reuses the index layout with zero shuffle
    * and zero sort, and the merge hint keeps the planner from
    * broadcasting either side (the probe stream's row estimate lies
    * after the flatMap; a corpus broadcast is the 100 TB anti-plan).
    * Scores pipeline straight into the bounded-heap top-k — candidate
    * vectors never move. */
  def query(index: Index, queries: DataFrame, k: Int = 5,
            probes: Int = -1): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cents = index.model.centroids
    val np = if (probes > 0) math.min(probes, cents.length)
             else math.max(1, math.ceil(cents.length * 0.6).toInt)
    val bc = spark.sparkContext.broadcast(cents)
    val probed = toVecs(Similarity.spread(queries)).mapPartitions { it =>
      val cs = bc.value
      it.flatMap { case (id, v) =>
        val scored = cs.indices.map { c =>
          var s = 0.0
          var j = 0
          while (j < v.length) { s += v(j) * cs(c)(j); j += 1 }
          (c, s)
        }
        scored.sortBy(t => (-t._2, t._1)).take(np)
          .map { case (c, _) => (id, c, v) }
      }
    }.toDF("query_id", "cluster", "qv")
      // salt: spread each query's probe rows by content hash
      .withColumn("chunk",
        pmod(xxhash64(col("query_id")), lit(index.chunks)).cast("int"))
    val scored = index.segments.map { seg =>
      probed.join(seg.hint("merge"), Seq("cluster", "chunk"))
        .filter(col("query_id") =!= col("vec_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          Similarity.dot(col("qv"), col("v")).as("score"))
    }.reduce(_ unionByName _)
    Similarity.rankTopK(scored, k)
  }

  /** Persist a built index to a lake directory — the other half of the
    * build-once/query-many lifecycle: a 100 TB index is built by one
    * job and queried by MANY later sessions, so it must outlive the
    * SparkSession that fit it. Layout: `dir/model` (centroids as
    * (idx, vector) rows — no serialization format dependency, any
    * engine can read it), `dir/meta` (the salt width), `dir/lists`
    * (the inverted lists, delta segments folded in — a [[load]] starts
    * compacted). Plain parquet everywhere: the lake's own format. */
  def save(index: Index, dir: String): Unit = {
    val spark = index.lists.sparkSession
    import spark.implicits._
    index.model.centroids.zipWithIndex
      .map { case (v, i) => (i, v) }.toSeq.toDF("idx", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/model")
    Seq(index.chunks).toDF("chunks")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    // store ONE copy of each list row: the chunk replicas are pure
    // salt-side duplication (layout() explodes every row into all
    // chunks), so persisting them would inflate the on-disk index
    // ×chunks for zero information — load() re-explodes
    index.segments.reduce(_ unionByName _)
      .filter(col("chunk") === 0).drop("chunk")
      .write.mode("overwrite").parquet(s"$dir/lists")
  }

  /** Load a [[save]]d index: restores the (cluster, chunk) partitioned
    * + sorted + persisted list layout, so query batches against the
    * loaded index reuse it with zero corpus-side shuffle exactly as
    * against the freshly built one. Query results are identical
    * (spec-asserted) — the index is pure data. */
  def load(spark: SparkSession, dir: String): Index = {
    import spark.implicits._
    val cents = spark.read.parquet(s"$dir/model")
      .as[(Int, Array[Double])].collect().sortBy(_._1).map(_._2)
    val chunks = spark.read.parquet(s"$dir/meta").as[Int].head()
    val lists = spark.read.parquet(s"$dir/lists")
      .withColumn("chunk", explode(sequence(lit(0), lit(chunks - 1))))
      .repartition(col("cluster"), col("chunk"))
      .sortWithinPartitions("cluster", "chunk")
      .persist()
    lists.count()
    Index(Model(cents), lists, chunks)
  }

  /** Break-even-guarded self-ANN entry — the IVF mirror of
    * [[Similarity.adaptiveTopK]]'s Faiss-style argument: an inverted
    * index only pays when the probed lists cover a small corpus
    * fraction. Expected probed fraction is probes/nClusters (k-means
    * lists are near-balanced on weakly-clustered data — the exact
    * regime where the fraction runs high); at ≥ `maxProbedFraction`
    * the index costs ~fraction × the flat scan PLUS the probe-join
    * overhead, so the exact blocked scan is both faster and recall-1 —
    * run it instead.
    *
    * With DEFAULT probes the fallback is by construction: the default
    * operating point (60 % of lists, the ≥0.9-recall point the gate
    * certifies on this weakly-clustered corpus) is always past
    * break-even, so the entry skips even the sizing scan and runs the
    * exact path — that IS the decision, stated honestly: an IVF index
    * never pays where recall needs most of the lists probed. The index
    * path engages when the caller passes an explicit probe count below
    * the break-even fraction (the clustered-corpus regime, where few
    * probes reach the recall bar). The IVF machinery itself stays
    * certified by the recall gate, which drives [[build]]/[[query]]
    * directly. */
  def adaptiveTopK(embeddings: DataFrame, k: Int = 5, nClusters: Int = -1,
                   probes: Int = -1, iters: Int = 3, chunksPerList: Int = 4,
                   maxProbedFraction: Double = 0.25): DataFrame = {
    if (probes <= 0)                       // default = 0.6·nc ≥ any sane break-even
      return Similarity.bruteForceTopK(embeddings, k)
    val nc = if (nClusters > 0) nClusters else autoClusters(embeddings.count())
    val np = math.min(probes, nc)
    if (np.toDouble / nc >= maxProbedFraction)
      Similarity.bruteForceTopK(embeddings, k)
    else topK(embeddings, k, nc, np, iters, chunksPerList)
  }

  /** Convenience self-ANN: build + query in one call. The result
    * (corpus×k id/score rows) is materialized eagerly and the index is
    * closed before returning — the r4 wrapper left the persisted lists
    * (~4× corpus) cached forever, stranding blocks in any long-lived
    * session. The driver round-trip bounds this wrapper to
    * moderate-corpus use; at full scale [[build]] once and [[query]]
    * many times — that is the point of the split lifecycle. */
  def topK(embeddings: DataFrame, k: Int = 5, nClusters: Int = -1,
           probes: Int = -1, iters: Int = 3, chunksPerList: Int = 4): DataFrame = {
    val spark = embeddings.sparkSession
    val index = build(embeddings, nClusters, iters, chunksPerList)
    try {
      val out = query(index, embeddings, k, probes)
      spark.createDataFrame(
        java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally index.close()
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Sharded small-world graph ANN — the graph-index family (Malkov &
  * Yashunin 2018's HNSW, flattened to its single-layer NSW core)
  * completing the engine's index lineup next to the cell-probe
  * families ([[IvfIndex]], [[PqIndex]]) and the hash family
  * ([[Similarity]] LSH). The reference ships no vector ops (its whole
  * surface is Flink SQL — `flink-cdc/sql/revenue-analytics.sql`); this
  * extends the engine for embedding-scale retrieval per SURVEY §2.8.
  *
  * Distribution model — shard-local graphs, not one global graph:
  * HNSW's global build is inherently sequential (every insert searches
  * the current graph), so a faithful distributed port would serialize
  * on the driver. Instead the corpus is hash-sharded by `vec_id`
  * (deterministic `pmod(xxhash64(id), nShards)` — content-independent,
  * cluster-size-independent), each shard builds its own in-memory
  * graph inside one `mapPartitions` pass, and a query fans out to
  * every shard's graph, merging the per-shard top-k through the
  * bounded-heap [[graft.functions.TopKAggregator]]. That is the
  * standard scale-out shape for graph ANN (per-shard sub-indexes +
  * rank merge): build parallelism = shard count, per-executor memory =
  * one shard's vectors + `2m` neighbor ids per node, query cost =
  * nShards beam searches of O(ef·m) dots instead of one O(N) scan.
  *
  * Determinism (what lets sf0.01 results pin as a VALUES oracle):
  * shard membership is a pure function of (vec_id, nShards); in-shard
  * insertion order is ascending vec_id; beam search and neighbor
  * pruning order by the strict total order (score desc, id asc);
  * scores are the same sequential double fold as
  * [[Similarity.bruteForceTopKFor]]. No RNG anywhere.
  *
  * Honesty note on the census regime: with the default `efSearch` (64)
  * larger than a local-testdata shard (~N/32 rows), the beam search
  * reaches every node of the connected shard graph, so the per-shard
  * result equals the exact per-shard top-k and the merged result the
  * exact global top-k — which is exactly what lets the driver pin a
  * full VALUES oracle. The approximation (and the speedup) regime
  * begins when shards outgrow `efSearch`; [[HnswSpecRecallHook]]-style
  * coverage lives in `HnswSpec`, which forces that regime (few shards,
  * small ef) and checks recall ≥ 0.9, and `q_ann_hnsw_recall` gates
  * the shipped operating point.
  */
object HnswIndex {

  /** A built sharded graph: one persisted DataFrame
    * `(shard, vec_id, v, nbrs)` whose shard-locality (every row of a
    * shard in one partition) is the build's `mapPartitions` output
    * partitioning — do not repartition it. Same build/query/close
    * lifecycle as [[IvfIndex.Index]]. */
  final case class Index(graph: DataFrame, nShards: Int, m: Int) {
    def close(): Unit = { graph.unpersist(); () }
  }

  /** In-memory shard graph: arrays indexed by local node id, node 0 =
    * smallest vec_id (the search entry point). */
  private final class ShardGraph(val ids: Array[Long],
                                 val vecs: Array[Array[Double]],
                                 val adj: Array[Array[Int]])

  private def dotv(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var j = 0
    val n = math.min(a.length, b.length)
    while (j < n) { s += a(j) * b(j); j += 1 }
    s
  }

  /** Greedy beam search over the first `limit` nodes (the whole graph
    * for queries; the already-inserted prefix during build). Returns
    * up to `ef` nodes sorted (score desc, id asc). Deterministic: the
    * frontier and result heaps order by the strict (score, idx) total
    * order, and neighbor expansion follows the adjacency array, whose
    * order is itself deterministic by construction.
    *
    * Seeding: the frontier starts from up to [[EntrySeeds]] stride-
    * spaced nodes, not one entry — the flat stand-in for HNSW's upper
    * layers, whose role is exactly this (long-range hops so a search
    * cannot strand in the entry's neighborhood; single-seed NSW
    * measurably stalls below the 0.9 recall bar on clustered corpora
    * once shards outgrow ef — `HnswSpec`'s approximate-regime test).
    * Stride positions are a pure function of `limit`, so seeding stays
    * deterministic and insertion-order-stable. */
  private val EntrySeeds = 8

  private def beamSearch(vecs: Array[Array[Double]], adj: Int => Seq[Int],
                         qv: Array[Double], ef: Int, limit: Int)
      : mutable.ArrayBuffer[(Int, Double)] = {
    val out = mutable.ArrayBuffer.empty[(Int, Double)]
    if (limit <= 0) return out
    // frontier: best-first (max score, tie min idx)
    val cand = mutable.PriorityQueue.empty[(Double, Int)](
      Ordering.by(t => (t._1, -t._2)))
    // kept set: worst-first so head is the eviction candidate
    val res = mutable.PriorityQueue.empty[(Double, Int)](
      Ordering.by(t => (-t._1, t._2)))
    val visited = new Array[Boolean](vecs.length)
    val nSeeds = math.min(EntrySeeds, limit)
    val stride = math.max(1, limit / nSeeds)
    var s = 0
    while (s < nSeeds) {
      val e = s * stride
      if (e < limit && !visited(e)) {
        visited(e) = true
        val se = dotv(qv, vecs(e))
        cand.enqueue((se, e))
        res.enqueue((se, e))
        if (res.size > ef) res.dequeue()
      }
      s += 1
    }
    while (cand.nonEmpty) {
      val (cs, ci) = cand.dequeue()
      if (res.size >= ef && cs < res.head._1) {
        cand.clear()
      } else {
        val nbrs = adj(ci)
        var i = 0
        while (i < nbrs.length) {
          val nb = nbrs(i)
          if (nb < limit && !visited(nb)) {
            visited(nb) = true
            val s = dotv(qv, vecs(nb))
            if (res.size < ef || s > res.head._1 ||
                (s == res.head._1 && nb < res.head._2)) {
              cand.enqueue((s, nb))
              res.enqueue((s, nb))
              if (res.size > ef) res.dequeue()
            }
          }
          i += 1
        }
      }
    }
    res.dequeueAll.foreach { t: (Double, Int) => out += ((t._2, t._1)) }
    // dequeueAll yields worst-first; present best-first with id ties asc
    out.sortBy(t => (-t._2, t._1))
  }

  /** Incremental NSW construction over one shard's rows (pre-sorted by
    * vec_id): each new node beam-searches the existing prefix for its
    * `m` nearest, links bidirectionally, and any node exceeding the
    * `2m` degree cap keeps its `2m` highest-dot neighbors (score desc,
    * id asc) — plain top-M selection, documented simplification of the
    * paper's diversity heuristic. Edges only reference already-
    * inserted nodes, so build-time searches need no limit filtering
    * beyond the entry. */
  private def buildShard(rows: Array[(Long, Array[Double])], m: Int,
                         efConstruction: Int): ShardGraph = {
    val n = rows.length
    val ids = new Array[Long](n)
    val vecs = new Array[Array[Double]](n)
    var i = 0
    while (i < n) { ids(i) = rows(i)._1; vecs(i) = rows(i)._2; i += 1 }
    val adj = Array.fill(n)(mutable.ArrayBuffer.empty[Int])
    val maxDegree = 2 * m
    def prune(x: Int): Unit = if (adj(x).length > maxDegree) {
      val kept = adj(x).iterator
        .map(y => (dotv(vecs(x), vecs(y)), y)).toArray
        .sortBy(t => (-t._1, t._2)).take(maxDegree).map(_._2)
      adj(x).clear()
      adj(x) ++= kept
    }
    i = 1
    while (i < n) {
      val found = beamSearch(vecs, x => adj(x).toSeq, vecs(i),
        ef = math.max(efConstruction, m), limit = i)
      val sel = found.take(m)
      var j = 0
      while (j < sel.length) {
        val nb = sel(j)._1
        adj(i) += nb
        adj(nb) += i
        prune(nb)
        j += 1
      }
      i += 1
    }
    new ShardGraph(ids, vecs, adj.map(_.toArray))
  }

  private def shardGraphFrom(rows: Seq[(Int, Long, Array[Double], Array[Long])])
      : ShardGraph = {
    val sorted = rows.sortBy(_._2).toArray
    val ids = sorted.map(_._2)
    val vecs = sorted.map(_._3)
    val pos = new mutable.HashMap[Long, Int]
    ids.indices.foreach(i => pos(ids(i)) = i)
    val adj = sorted.map(_._4.flatMap(pos.get(_)))
    new ShardGraph(ids, vecs, adj)
  }

  /** Build the sharded graph index. One shuffle (the shard
    * repartition), one `mapPartitions` build pass, persisted +
    * materialized so every query block reuses the same graph. */
  def build(corpus: DataFrame, m: Int = 8, efConstruction: Int = 48,
            nShards: Int = 32): Index = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sharded = corpus.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"),
        pmod(xxhash64(col("vec_id")), lit(nShards)).cast("int").as("shard"))
      .repartition(nShards, col("shard"))
      .as[(Long, Array[Double], Int)]
    val graph = sharded.mapPartitions { it =>
      it.toVector.groupBy(_._3).toSeq.sortBy(_._1).iterator.flatMap {
        case (shard, rs) =>
          val rows = rs.sortBy(_._1).map(r => (r._1, r._2)).toArray
          val g = buildShard(rows, m, efConstruction)
          g.ids.indices.iterator.map(i =>
            (shard, g.ids(i), g.vecs(i), g.adj(i).map(g.ids(_))))
      }
    }.toDF("shard", "vec_id", "v", "nbrs").persist()
    graph.count()
    Index(graph, nShards, m)
  }

  /** Query the index: query blocks ride broadcasts (mirroring
    * [[Similarity]]'s blocked-scan hygiene — per-block eager
    * `localCheckpoint`, broadcast destroyed before the next block),
    * the graph stays partitioned, each partition runs one beam search
    * per (shard, query) and the global top-k merges through
    * [[Similarity.rankTopK]]. Self-matches (query drawn from the
    * corpus) are excluded. */
  def query(index: Index, queries: DataFrame, k: Int = 5,
            efSearch: Int = 64, blockRows: Int = 100000): DataFrame = {
    val spark = index.graph.sparkSession
    import spark.implicits._
    val q = queries.select(col("vec_id"),
        col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].persist()
    try {
      val n = q.count()
      val nBlocks = math.max(1L, (n + blockRows - 1) / blockRows).toInt
      val g = index.graph.as[(Int, Long, Array[Double], Array[Long])]
      val ef = math.max(efSearch, k + 1)
      val partials = (0 until nBlocks).map { b =>
        val block =
          q.filter(pmod(xxhash64(col("vec_id")), lit(nBlocks)) === b).collect()
        val bc = spark.sparkContext.broadcast(block)
        try {
          g.mapPartitions { it =>
            val qs = bc.value
            it.toVector.groupBy(_._1).toSeq.sortBy(_._1).iterator.flatMap {
              case (_, rows) =>
                val sg = shardGraphFrom(rows)
                qs.iterator.flatMap { case (qid, qv) =>
                  beamSearch(sg.vecs, x => sg.adj(x).toSeq, qv, ef,
                      limit = sg.ids.length)
                    .iterator.filter(t => sg.ids(t._1) != qid).take(k)
                    .map(t => (qid, sg.ids(t._1), t._2))
                }
            }
          }.toDF("query_id", "neighbor_id", "score").localCheckpoint(true)
        } finally bc.destroy()
      }
      val all =
        if (partials.length == 1) partials.head
        else try partials.reduce(_ union _).localCheckpoint(true)
        finally partials.foreach(p =>
          org.apache.spark.sql.GraftBridge.checkpointRdd(p)
            .foreach(_.unpersist(blocking = false)))
      Similarity.rankTopK(all, k)
    } finally { q.unpersist(); () }
  }

  /** Persist the built graph to the plain-parquet lake layout —
    * build-once/query-many across sessions, the [[IvfIndex.save]] /
    * [[PqIndex.save]] contract. The adjacency is stored row-wise
    * (`shard, vec_id, v, nbrs`); shard-locality is NOT a property of
    * the files, it is restored by [[load]]'s hash repartition. */
  def save(index: Index, dir: String): Unit = {
    val spark = index.graph.sparkSession
    import spark.implicits._
    index.graph.write.mode("overwrite").parquet(s"$dir/graph")
    Seq((index.nShards, index.m)).toDF("n_shards", "m")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Load a saved graph: hash-repartition on `shard` puts every shard
    * wholly inside one partition (several shards may share one — the
    * query path groups by shard within a partition, so that is the
    * same locality contract the build emits). Loaded index answers
    * identically to the pre-save one (spec-pinned). */
  def load(spark: SparkSession, dir: String): Index = {
    import spark.implicits._
    val (nShards, m) =
      spark.read.parquet(s"$dir/meta").as[(Int, Int)].head()
    val graph = spark.read.parquet(s"$dir/graph")
      .repartition(nShards, col("shard")).persist()
    graph.count()
    Index(graph, nShards, m)
  }

  /** Convenience self-ANN (build + query + eager materialize + close)
    * — the [[IvfIndex.topK]] lifecycle contract: no persisted graph or
    * checkpoint outlives the call beyond the bounded corpus×k result. */
  def topK(embeddings: DataFrame, k: Int = 5, m: Int = 8,
           efConstruction: Int = 48, efSearch: Int = 64,
           nShards: Int = 32): DataFrame =
    topKFor(embeddings, embeddings, k, m, efConstruction, efSearch, nShards)

  /** (queries, corpus) form, for the recall gate. */
  def topKFor(queries: DataFrame, corpus: DataFrame, k: Int = 5,
              m: Int = 8, efConstruction: Int = 48, efSearch: Int = 64,
              nShards: Int = 32): DataFrame = {
    val spark = corpus.sparkSession
    val index = build(corpus, m, efConstruction, nShards)
    try {
      val out = query(index, queries, k, efSearch)
      spark.createDataFrame(
        java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally index.close()
  }
}

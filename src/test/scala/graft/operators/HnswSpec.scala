package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sharded small-world graph ANN ([[HnswIndex]]) laws:
  * determinism, small-shard exactness (the census regime the pinned
  * oracle relies on), a genuine approximate-regime recall bar, the
  * degree cap, and the gate's (queries, corpus) ≡ restricted-self-ANN
  * argument. */
class HnswSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Deterministic clustered corpus: `n` vectors in `dim` dims around
    * `centers` integer-lattice centroids, jitter from a splitmix-style
    * integer hash — no RNG state, same rows every call. */
  private def clustered(n: Int, dim: Int, centers: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val c = i % centers
      def h(j: Int): Double = {
        var z = i.toLong * 0x9E3779B97F4A7C15L + j.toLong * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        ((z ^ (z >>> 31)) & 0xFFFF).toDouble / 0xFFFF.toDouble - 0.5
      }
      val v = (0 until dim).map { j =>
        (if (j % centers == c) 4.0 else 0.0) + 0.3 * h(j)
      }.toArray
      (i.toLong, v)
    }
    val spark0 = spark
    import spark0.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private def resultSet(df: DataFrame): Set[(Long, Int, Long)] =
    df.select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("deterministic: two independent build+query runs are identical") {
    val emb = Tables.load(spark, dir, "embeddings")
    val a = HnswIndex.topK(emb, k = 5)
    val b = HnswIndex.topK(emb, k = 5)
    assert(resultSet(a) == resultSet(b))
    val sa = a.collect().map(r => r.getDouble(3)).sorted.toSeq
    val sb = b.collect().map(r => r.getDouble(3)).sorted.toSeq
    assert(sa == sb, "scores must be bit-identical across runs")
  }

  test("small shards (ef ≥ shard size) give the exact global top-k") {
    val emb = Tables.load(spark, dir, "embeddings")
    val exact = resultSet(Similarity.bruteForceTopK(emb, k = 5))
    val hnsw = resultSet(HnswIndex.topK(emb, k = 5))
    assert(hnsw == exact,
      "exhaustive-per-shard regime must equal the brute-force ranking")
  }

  test("approximate regime (shards ≫ ef) holds recall ≥ 0.9 on clustered data") {
    val emb = clustered(n = 600, dim = 32, centers = 8)
    // 2 shards of ~300 nodes, beam 16 ≪ shard size: genuinely
    // approximate — the beam search visits a fraction of each shard.
    val approx = HnswIndex.topK(emb, k = 5, m = 8,
      efConstruction = 32, efSearch = 16, nShards = 2)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.bruteForceTopK(emb, k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall below bar in the graph regime")
  }

  test("degree cap: no node exceeds 2m neighbors; edges stay in-shard") {
    val emb = Tables.load(spark, dir, "embeddings")
    val idx = HnswIndex.build(emb, m = 4, nShards = 4)
    try {
      val over = idx.graph
        .filter(size(col("nbrs")) > 8).count()
      assert(over == 0, "degree cap violated")
      // every neighbor id resolves inside its own shard
      val dangling = idx.graph.as("a")
        .select(col("shard"), explode(col("nbrs")).as("nb"))
        .join(idx.graph.select(col("shard").as("s2"),
          col("vec_id").as("nb")), Seq("nb"), "left_outer")
        .filter(col("s2").isNull || col("s2") =!= col("shard"))
        .count()
      assert(dangling == 0, "cross-shard or dangling edge")
    } finally idx.close()
  }

  test("gate form: topKFor(sample, corpus) ≡ full self-ANN restricted to sample") {
    val emb = Tables.load(spark, dir, "embeddings")
    val sample = emb.filter(col("vec_id") % 7 === 0)
    val forSample = resultSet(HnswIndex.topKFor(sample, emb, k = 5))
    val full = resultSet(HnswIndex.topK(emb, k = 5))
      .filter(t => t._1 % 7 == 0)
    assert(forSample == full)
  }

  test("save/load round-trip: loaded graph answers identically") {
    val emb = Tables.load(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") % 11 === 0)
    val tmp = java.nio.file.Files
      .createTempDirectory("hnsw_idx").toString
    val idx = HnswIndex.build(emb)
    try {
      val before = resultSet(HnswIndex.query(idx, queries, k = 5))
      HnswIndex.save(idx, tmp)
      val loaded = HnswIndex.load(spark, tmp)
      try {
        assert(loaded.nShards == idx.nShards && loaded.m == idx.m)
        assert(resultSet(HnswIndex.query(loaded, queries, k = 5)) == before)
      } finally loaded.close()
    } finally idx.close()
  }
}

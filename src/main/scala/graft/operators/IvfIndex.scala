package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index: k-means coarse quantizer + per-list
  * exact search with multi-probe.
  *
  * The scale structure: centroids are tiny (nClusters×dims) and live on
  * the driver/broadcast; vector assignment is a narrow mapPartitions
  * against the broadcast; search touches only the `probes` nearest
  * inverted lists instead of the whole corpus (expected cost
  * probes/nClusters of brute force). All arithmetic is the same
  * sequential double fold as the rest of the engine.
  *
  * Deterministic end-to-end: centroid seeds are the first nClusters
  * vectors in md5(vec_id) order (reproducible pseudo-random spread),
  * Lloyd iterations are exact-arithmetic argmax with id tie-break, so
  * fit() gives the same model on any cluster/partitioning.
  */
object IvfIndex {

  final case class Model(centroids: Array[Array[Double]]) extends Serializable

  private def toVecs(embeddings: DataFrame): Dataset[(Long, Array[Double])] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    embeddings.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])]
  }

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

  /** Lloyd's k-means (dot-product objective over normalized vectors). */
  def fit(embeddings: DataFrame, nClusters: Int = 16, iters: Int = 5): Model = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val vecs = toVecs(embeddings).cache()
    // deterministic seeding: md5-order pseudo-random sample
    var centroids = vecs
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(nClusters)
      .collect().map(_._2)
    for (_ <- 1 to iters) {
      val bc = spark.sparkContext.broadcast(centroids)
      val sums = vecs.mapPartitions { it =>
        val cs = bc.value
        val acc = Array.fill(cs.length)(new Array[Double](cs(0).length))
        val cnt = new Array[Long](cs.length)
        it.foreach { case (_, v) =>
          val c = nearest(v, cs)
          var j = 0
          while (j < v.length) { acc(c)(j) += v(j); j += 1 }
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
          // re-normalize the mean so dot stays a cosine proxy
          val m = s.map(_ / n)
          val norm = math.sqrt(m.map(x => x * x).sum)
          if (norm > 0) m.map(_ / norm) else centroids(c)
        }.getOrElse(centroids(c))                      // empty list keeps seed
      }.toArray
    }
    vecs.unpersist()
    Model(centroids)
  }

  /** Inverted-list assignment of every vector. */
  def assign(embeddings: DataFrame, model: Model): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model.centroids)
    toVecs(embeddings).mapPartitions { it =>
      val cs = bc.value
      it.map { case (id, v) => (id, nearest(v, cs), v) }
    }.toDF("vec_id", "cluster", "v")
  }

  /** ANN top-k with multi-probe: each query searches its `probes`
    * nearest inverted lists exactly. Approximate (recall < 1; the
    * brute-force operator is the oracle — measured recall@5 on the
    * weakly-clustered sf0.01 vectors: 0.60/0.73/0.83 at probes=4/6/8
    * of 16 lists). */
  def topK(embeddings: DataFrame, k: Int = 5, nClusters: Int = 16,
           probes: Int = 6, iters: Int = 5): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val model = fit(embeddings, nClusters, iters)
    val lists = assign(embeddings, model)
    val bc = spark.sparkContext.broadcast(model.centroids)
    val probed = toVecs(embeddings).mapPartitions { it =>
      val cs = bc.value
      it.flatMap { case (id, v) =>
        val scored = cs.indices.map { c =>
          var s = 0.0
          var j = 0
          while (j < v.length) { s += v(j) * cs(c)(j); j += 1 }
          (c, s)
        }
        scored.sortBy(t => (-t._2, t._1)).take(probes)
          .map { case (c, _) => (id, c, v) }
      }
    }.toDF("query_id", "cluster", "qv")
    val scored = probed.join(lists, "cluster")
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Similarity.dot(col("qv"), col("v")).as("score"))
    scored.groupBy("query_id")
      .agg(graft.functions.TopKAggregator.topK(k)(
        col("neighbor_id"), col("score")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "nb")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("nb._1").as("neighbor_id"), col("nb._2").as("score"))
  }
}

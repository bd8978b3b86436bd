package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewIvfSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join on skewed data") {
    val big = (1 to 1000).map(i => (if (i % 10 == 0) 1L else i.toLong, s"v$i"))
      .toDF("k", "payload")                       // hot key 1
    val small = Seq((1L, "one"), (2L, "two"), (500L, "fh")).toDF("k", "name")
    val plain = big.join(small, "k").collect().map(_.toSeq).toSeq
      .sortBy(_.toString)
    val salted = Skew.saltedJoin(big, small, "k", salt = 8)
      .select(plain.headOption.map(_ => big.join(small, "k").columns).getOrElse(Array("k")).map(col).toSeq: _*)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(salted == plain)
  }

  test("adaptiveJoin: both probe branches return the plain join's multiset") {
    val small = Seq((1L, "one"), (2L, "two"), (500L, "fh")).toDF("k", "name")
    // skewed: key 1 carries 10% of rows -> probe >= 0.05 -> salted branch
    val hot = (1 to 1000).map(i => (if (i % 10 == 0) 1L else i.toLong, s"v$i"))
      .toDF("k", "payload")
    // uniform: every key once -> probe 0.001 -> plain branch
    val flat = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("k", "payload")
    for (big <- Seq(hot, flat)) {
      val plain = big.join(small, "k").collect().map(_.toSeq).toSeq.sortBy(_.toString)
      val adaptive = Skew.adaptiveJoin(big, small, "k", salt = 8)
        .select(big.join(small, "k").columns.map(col).toSeq: _*)
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      assert(adaptive == plain)
    }
  }

  test("adaptiveJoin: empty big side takes the plain branch without error") {
    val big = Seq.empty[(Long, String)].toDF("k", "payload")
    val small = Seq((1L, "one")).toDF("k", "name")
    assert(Skew.adaptiveJoin(big, small, "k").count() == 0L)
  }

  test("IVF: deterministic fit, full coverage, sane recall on clustered data") {
    // 3 tight clusters of 10 vectors each
    val vs = (0 until 30).map { i =>
      val base = Array.fill(8)(0.0f)
      base(i / 10) = 1.0f
      base((i / 10) + 4) = 0.1f * (i % 10)
      val n = math.sqrt(base.map(x => x * x).sum).toFloat
      (i.toLong, base.map(_ / n))
    }.toDF("vec_id", "embedding")
    val m1 = IvfIndex.fit(vs, nClusters = 3, iters = 5)
    val m2 = IvfIndex.fit(vs, nClusters = 3, iters = 5)
    assert(m1.centroids.map(_.toSeq).toSeq == m2.centroids.map(_.toSeq).toSeq,
      "fit must be deterministic")
    val top = IvfIndex.topK(vs, k = 3, nClusters = 3, probes = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(top.map(_._1).distinct.length == 30, "every query covered")
    // with probe=1 on tight clusters, neighbors come from the same cluster
    assert(top.forall { case (q, n) => q / 10 == n / 10 })
  }

  test("lshCandidateFraction separates the pruning and no-pruning regimes") {
    def normed(raw: Seq[Array[Double]]): Seq[(Long, Array[Float])] =
      raw.zipWithIndex.map { case (v, i) =>
        val n = math.sqrt(v.map(x => x * x).sum)
        (i.toLong, v.map(x => (x / n).toFloat))
      }
    // pseudo-random corpus: random pairs sit near 90°, so hyperplane
    // collision p ≈ 0.5 and the wired 40×5 point marks most pairs —
    // the regime where the adaptive entry must fall back to exact scan
    val rnd = new scala.util.Random(7)
    val random = normed(Seq.fill(300)(Array.fill(16)(rnd.nextGaussian())))
      .toDF("vec_id", "embedding")
    val fRandom = Similarity.lshCandidateFraction(random, tables = 40, planes = 5, dims = 16)
    assert(fRandom > 0.25, s"random corpus should look non-prunable, got $fRandom")
    // clustered corpus: tight clusters around orthogonal axes — with
    // enough planes per table, cross-cluster pairs almost never
    // collide, in-cluster pairs (~3% of all pairs) usually do
    val clustered = normed((0 until 300).map { i =>
      val v = Array.fill(16)(0.0)
      v(i % 10) = 1.0
      v(10 + i % 6) = 0.05 * (i % 3)
      v
    }).toDF("vec_id", "embedding")
    val fClustered = Similarity.lshCandidateFraction(clustered, tables = 40, planes = 16, dims = 16)
    assert(fClustered < 0.25,
      s"clustered corpus at 16 planes should prune, got $fClustered")
  }

  test("adaptive IVF entry falls back to the exact scan past break-even") {
    // default probes (60% of lists) ≥ the 0.25 break-even → the entry
    // must return the exact blocked-scan result bit-for-bit
    val vs = (0 until 40).map { i =>
      val v = Array.tabulate(8)(j => math.sin(i * 8 + j + 1).toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      (i.toLong, v.map(_ / n))
    }.toDF("vec_id", "embedding")
    val adaptive = IvfIndex.adaptiveTopK(vs, k = 3)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val exact = Similarity.bruteForceTopK(vs, k = 3)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(adaptive == exact)
    // explicit low probe fraction (1 of 4 lists < 0.25) keeps the
    // index path: every query still covered, k rows each
    val indexed = IvfIndex.adaptiveTopK(vs, k = 3, nClusters = 4, probes = 1)
    assert(indexed.select("query_id").distinct().count() == 40)
  }

  test("adaptive near-dup entry returns the exact pair set in the no-pruning regime") {
    // random corpus at τ=0.4: LSH marks most pairs → fallback = exact
    val rnd = new scala.util.Random(11)
    val vs = Seq.fill(120)(Array.fill(16)(rnd.nextGaussian())).zipWithIndex
      .map { case (v, i) =>
        val n = math.sqrt(v.map(x => x * x).sum)
        (i.toLong, v.map(x => (x / n).toFloat))
      }.toDF("vec_id", "embedding")
    val adaptive = Dedup.adaptiveNearDup(vs, threshold = 0.4,
        tables = 24, planes = 3)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val exact = Dedup.embeddingNearDupExact(vs, threshold = 0.4)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(adaptive == exact)
  }

  test("contrastive positives: candidate path engages in the pruning regime and matches exact") {
    // tight orthogonal-axis clusters: in-cluster dots ≈ 0.99, cross ≈ 0
    // — the regime where LSH prunes (fraction < 0.25) AND its recall
    // is 1 (miss prob ~1e-12 at 40x16 for θ≈8°), so the candidate
    // branch must reproduce the exact blocked scan row-for-row.
    val clustered = (0 until 300).map { i =>
      val v = Array.fill(16)(0.0)
      v(i % 10) = 1.0
      v(10 + i % 6) = 0.05 * (i % 3)
      val n = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v.map(x => (x / n).toFloat))
    }.toDF("vec_id", "embedding")
    // same probe call the operator makes -> guarantees branch choice
    val frac = Similarity.lshCandidateFraction(clustered, tables = 40, planes = 16)
    assert(frac < 0.25, s"fixture must be in the pruning regime, got $frac")
    val cand = Similarity.adaptiveDirectedPairs(clustered, threshold = 0.9,
        tables = 40, planes = 16)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val exact = Similarity.thresholdPairsFor(clustered, clustered, threshold = 0.9)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(cand.nonEmpty && cand == exact,
      s"candidate path diverged: ${cand.length} vs ${exact.length} rows")
  }

  test("fitCached keys on the file inventory: hits, re-keys on rewrite, bypasses in-memory") {
    def vecs(seed: Int, n: Int) = {
      val rnd = new scala.util.Random(seed)
      Seq.fill(n)(Array.fill(8)(rnd.nextGaussian())).zipWithIndex.map { case (v, i) =>
        val norm = math.sqrt(v.map(x => x * x).sum)
        (i.toLong, v.map(x => (x / norm).toFloat))
      }.toDF("vec_id", "embedding")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-memo").toString
    vecs(1, 60).repartition(1).write.mode("overwrite").parquet(dir)
    val m1 = IvfIndex.fitCached(spark.read.parquet(dir), nClusters = 4, iters = 2)
    val m1b = IvfIndex.fitCached(spark.read.parquet(dir), nClusters = 4, iters = 2)
    assert(m1 eq m1b, "identical plan over identical files must hit the memo")
    // rewrite the path with DIFFERENT data behind the same plan — the
    // staleness hole the file-inventory key exists to close
    vecs(2, 80).repartition(1).write.mode("overwrite").parquet(dir)
    val m2 = IvfIndex.fitCached(spark.read.parquet(dir), nClusters = 4, iters = 2)
    assert(m1.centroids.map(_.toSeq).toSeq != m2.centroids.map(_.toSeq).toSeq,
      "refreshed files behind an identical plan must re-fit, not serve the stale model")
    // in-memory relations bypass the memo (their data is invisible to
    // any plan fingerprint): two calls fit fresh models
    val local = vecs(3, 50)
    val a = IvfIndex.fitCached(local, nClusters = 4, iters = 2)
    val b = IvfIndex.fitCached(local, nClusters = 4, iters = 2)
    assert(!(a eq b), "no-file plans must compute, not cache")
  }

  test("convenience topK closes its index: no cached RDDs survive the call") {
    // the r4 wrapper stranded the persisted (×chunks) list blocks in
    // any long-lived session; both convenience entries must leave the
    // block manager exactly as they found it
    // 64-dim vectors: the PQ default (m=16 subspaces) needs dims % 16 == 0
    val vs = (0 until 64).map { i =>
      val v = Array.tabulate(64)(j => math.sin(i * 64 + j + 1).toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      (i.toLong, v.map(_ / n))
    }.toDF("vec_id", "embedding")
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    IvfIndex.topK(vs, k = 2, nClusters = 4).collect()
    PqIndex.topK(vs, k = 2, nClusters = 4).collect()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked cached RDD ids: $leaked")
  }
}

package graft.operators

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("bm25TopK: rare terms dominate, tf saturates, self-retrieval ranks first") {
    // "zebra" appears only in docs 1 and 10 (rare, high idf);
    // "the" appears everywhere (df = N, idf floor).
    val docs = Seq(
      (1L, "the zebra runs"),
      (2L, "the cat sits on the mat"),
      (3L, "the dog runs fast"),
      (4L, "the the the the"),
      (10L, "a zebra and the cat"))
      .toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, docs.filter($"doc_id" === 1L), k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.forall(_._1 == 1L))
    assert(out.length == 3)
    // the query doc itself carries all three query terms -> rank 1
    val byRank = out.sortBy(_._3)
    assert(byRank.head._2 == 1L && byRank.head._5 == 3L)
    // docs carrying a rare term (3: "runs", 10: "zebra") outrank docs
    // 2/4, which only match the everywhere-term "the"
    assert(byRank.drop(1).map(_._2).toSet == Set(3L, 10L))
    // scores strictly positive and non-increasing with rank
    assert(byRank.map(_._4).toSeq == byRank.map(_._4).sortBy(-_).toSeq)
    assert(byRank.last._4 > 0L)
  }

  test("bm25TopK: k bounds output per query; queries without matches emit nothing") {
    val docs = Seq(
      (1L, "alpha beta"), (2L, "alpha gamma"), (3L, "beta gamma"),
      (4L, "delta epsilon"))
      .toDF("doc_id", "text")
    val queries = Seq((100L, "alpha"), (200L, "zzz")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, queries, k = 1).collect()
    assert(out.length == 1)               // q200 matches nothing
    assert(out.head.getLong(0) == 100L && out.head.getLong(2) == 1L)
  }

  test("Bm25Index: save/load round-trips; probe of the loaded index equals the direct path") {
    val docs = Seq(
      (1L, "the zebra runs"),
      (2L, "the cat sits on the mat"),
      (3L, "the dog runs fast"),
      (4L, "the the the the"),
      (10L, "a zebra and the cat"))
      .toDF("doc_id", "text")
    val queries = docs.filter($"doc_id" === 1L || $"doc_id" === 10L)
    val direct = Retrieval.bm25TopK(docs, queries, k = 3).collect().toSet
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    val fitted = Retrieval.fitBm25(docs)
    Retrieval.saveBm25(fitted, dir)
    val loaded = Retrieval.loadBm25(spark, dir)
    assert(loaded.nDocs == fitted.nDocs && loaded.sumDl == fitted.sumDl)
    assert(loaded.avgdl == fitted.avgdl)
    val probed = Retrieval.bm25TopKWith(loaded, queries, k = 3).collect().toSet
    assert(probed == direct)
  }

  test("fitBm25Cached: parquet-backed corpus fits once per session; refreshed files re-fit") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25m").toString
    Seq((1L, "alpha beta"), (2L, "alpha gamma"), (3L, "beta gamma"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)
    Retrieval.invalidateBm25Cache()
    val a = Retrieval.fitBm25Cached(docs)
    val b = Retrieval.fitBm25Cached(spark.read.parquet(dir))
    assert(a eq b) // same (plan, files, session) -> the memoized index
    // rewrite with different content: file inventory changes, re-fit
    Seq((1L, "alpha beta"), (2L, "alpha gamma"), (3L, "beta gamma"),
      (4L, "delta"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val c = Retrieval.fitBm25Cached(spark.read.parquet(dir))
    assert(!(a eq c) && c.nDocs == 4L)
  }

  test("hybridRrfTopK: rank-only fusion, self excluded, single-side survivors") {
    // docs and vectors share ids; doc 1 is the query. Lexically, doc 2
    // shares "zebra"; doc 4 shares nothing. Dense-side, vec 4 is the
    // near-duplicate of vec 1; vec 2 is orthogonal. Fusion must
    // surface BOTH single-source candidates and rank the two-source
    // candidate (doc 3: shares a term AND mid cosine) on summed RRF.
    val docs = Seq(
      (1L, "the zebra runs"), (2L, "a zebra sleeps"),
      (3L, "the dog runs"), (4L, "unrelated words entirely"))
      .toDF("doc_id", "text")
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.7f, 0.7f)), (4L, Array(0.99f, 0.1f)))
      .toDF("vec_id", "embedding")
    // kEach=2: dense top-2 = {4 (0.99 cos), 3 (0.7)}; lexical rank 1 is
    // the self-match, so one non-self lexical survivor joins it
    val out = Retrieval.hybridRrfTopK(docs, vecs,
        docs.filter($"doc_id" === 1L), vecs.filter($"vec_id" === 1L),
        k = 5, kEach = 2)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._2)
    // no self-match survives fusion
    assert(!out.exists(_._1 == 1L), s"self leaked: ${out.toSeq}")
    val bySrc = out.map(t => t._1 -> t._4).toMap
    // doc 3 hits both lists (lexical "the… runs" + mid cosine); doc 4
    // is dense-only — both kinds must survive, two-source outranking
    assert(bySrc(3L) == 2L, s"$bySrc")
    assert(bySrc.get(4L).contains(1L), s"$bySrc")
    assert(out.minBy(_._2)._1 == 3L, s"two-source doc must rank first: ${out.toSeq}")
    // rrf_micro is the exact integer sum of floor(1e6/(60+rank)) terms
    out.foreach { case (_, _, micro, nSrc) =>
      assert(micro > 0 && micro <= 2 * (1000000 / 61) && nSrc >= 1)
    }
  }

  test("hybridRrfTopK: adaptive dense path fuses identically to exact at a pruning point") {
    // tight orthogonal-axis clusters (the SkewIvfSpec fixture family):
    // in-cluster dots ~0.99, cross ~0 — the regime where LSH prunes
    // (candidate fraction < 0.25) AND its recall is 1 at 40x16 planes,
    // so the engaged candidate branch must reproduce the exact blocked
    // scan row-for-row, and the fused output must be bit-identical.
    val vecs = (0 until 300).map { i =>
      val v = Array.fill(16)(0.0)
      v(i % 10) = 1.0
      v(10 + i % 6) = 0.05 * (i % 3)
      val n = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v.map(x => (x / n).toFloat))
    }.toDF("vec_id", "embedding")
    val docs = (0 until 300).map(i =>
      (i.toLong, s"w${i % 10} w${(i + 3) % 10} tail$i")).toDF("doc_id", "text")
    val qd = docs.filter($"doc_id" % 50 === 0L)
    val qv = vecs.filter($"vec_id" % 50 === 0L)
    // same probe call the operator makes -> guarantees branch choice
    val frac = Similarity.lshCandidateFraction(vecs, tables = 40, planes = 16, dims = 16)
    assert(frac < 0.25, s"fixture must be in the pruning regime, got $frac")
    // dense entry alone: engaged LSH branch == exact blocked scan
    val adapt = Similarity.adaptiveTopKFor(qv, vecs, k = 5,
        tables = 40, planes = 16, dims = 16)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val exact = Similarity.bruteForceTopKFor(qv, vecs, k = 5)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(adapt.nonEmpty && adapt == exact,
      s"adaptive dense diverged: ${adapt.length} vs ${exact.length} rows")
    // full fusion: LSH-engaged (maxCandidateFraction=0.25) vs exact-
    // forced (maxCandidateFraction=0.0 -> fraction >= 0 always, so the
    // guard takes the brute-force branch) must agree bit-for-bit
    val fusedAdaptive = Retrieval.hybridRrfTopK(docs, vecs, qd, qv,
        k = 5, kEach = 5, denseTables = 40, densePlanes = 16, denseDims = 16)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val fusedExact = Retrieval.hybridRrfTopK(docs, vecs, qd, qv,
        k = 5, kEach = 5, denseTables = 40, densePlanes = 16, denseDims = 16,
        maxCandidateFraction = 0.0)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(fusedAdaptive.nonEmpty && fusedAdaptive == fusedExact,
      s"fusion diverged: ${fusedAdaptive.length} vs ${fusedExact.length} rows")
  }

  test("dsirWeights: target-alike documents get higher weight; accounting exact") {
    // target = doc 1; doc 2 shares its bigrams, doc 3 shares none.
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b c"),
      (3L, "x y z w"))
      .toDF("doc_id", "text")
    val out = TextOps.dsirWeights(docs, docs.filter($"doc_id" === 1L))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    // doc 1: 3 bigrams, each in target (t=1) and with corpus count q:
    // a|b,b|c occur twice (docs 1,2), c|d once -> num=3*2=6, den=2*3+2*3+1*2... recompute:
    // buckets are distinct md5 prefixes with overwhelming probability.
    assert(out(1L)._1 == 3L && out(1L)._2 == 6L)
    assert(out(2L)._1 == 2L && out(2L)._2 == 4L)  // a|b,b|c hit target
    assert(out(3L)._2 == 3L)                      // 3 bigrams, zero target hits
    assert(out(2L)._4 > out(3L)._4, "target-alike doc must outweigh unrelated doc")
    out.values.foreach { case (_, num, den, w) =>
      assert(w == num.toDouble / den.toDouble)
    }
  }

  test("dsirWeights: weight is invariant to input partitioning") {
    val docs = (0L until 40L)
      .map(i => (i, s"w${i % 7} w${(i + 1) % 7} w${(i + 2) % 5} tail$i"))
      .toDF("doc_id", "text")
    val target = docs.filter($"doc_id" % 4 === 0L)
    val a = TextOps.dsirWeights(docs, target).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    val b = TextOps.dsirWeights(docs.repartition(7), target.repartition(3))
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(a == b)
  }

  test("evalMetrics: hand-computed MRR/recall, no-hit query reads as zero") {
    // q1: relevant {10, 20, 30}; retrieved ranks: 10@2, 30@5 -> n_hit 2,
    // first_rel_rank 2, mrr 500000, recall floor(2e6/3)=666666.
    // q2: relevant {40}; retrieved list misses it entirely -> zeros.
    // q3: relevant {50}; NO result rows at all -> still reported, zeros.
    val results = Seq(
      (1L, 99L, 1L), (1L, 10L, 2L), (1L, 98L, 3L), (1L, 97L, 4L), (1L, 30L, 5L),
      (2L, 96L, 1L), (2L, 95L, 2L))
      .toDF("query_id", "doc_id", "rnk")
    val qrels = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 40L), (3L, 50L))
      .toDF("query_id", "doc_id")
    val out = Retrieval.evalMetrics(results, qrels, k = 10).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 3L && out(1L).getLong(2) == 2L)
    assert(out(1L).getLong(3) == 2L && out(1L).getLong(4) == 500000L)
    assert(out(1L).getLong(5) == 666666L)
    assert(out(2L).getLong(2) == 0L && out(2L).isNullAt(3))
    assert(out(2L).getLong(4) == 0L && out(2L).getLong(5) == 0L)
    assert(out(3L).getLong(1) == 1L && out(3L).getLong(2) == 0L,
      "a query with no result rows must still report recall 0")
  }

  test("evalMetrics: k cutoff drops hits ranked past k") {
    val results = Seq((1L, 10L, 1L), (1L, 20L, 7L)).toDF("query_id", "doc_id", "rnk")
    val qrels = Seq((1L, 10L), (1L, 20L)).toDF("query_id", "doc_id")
    val out = Retrieval.evalMetrics(results, qrels, k = 5).collect().head
    assert(out.getLong(2) == 1L && out.getLong(5) == 500000L)
  }

  test("mmrRerank: λ=1 reduces to the exact top-k ranking") {
    val vecs = (0L until 30L).map { i =>
      val a = (i % 7).toDouble / 7.0; val b = 1.0 - a
      (i, Array((a / math.sqrt(a * a + b * b)).toFloat,
        (b / math.sqrt(a * a + b * b)).toFloat))
    }.toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" === 0L)
    val plain = Similarity.bruteForceTopKFor(q, vecs, k = 4)
      .collect()
      .map(r => (r.getAs[Number]("rank").longValue, r.getAs[Long]("neighbor_id")))
      .sortBy(_._1).map(_._2).toSeq
    val mmr = Retrieval.mmrRerank(q, vecs, k = 4, m = 10, lambdaMicro = 1000000L)
      .collect().map(r => (r.getLong(2), r.getLong(1))).sortBy(_._1).map(_._2).toSeq
    assert(mmr == plain,
      s"λ=1 must be relevance-only ranking: got $mmr expected $plain")
  }

  test("mmrRerank: redundancy penalty skips the clone of the first pick") {
    // Docs 1 and 2 are byte-identical embeddings near the query (the
    // near-duplicate corpus case MMR exists for); doc 3 is a distinct
    // direction with lower relevance. Plain top-2 = {1, 2}; MMR at
    // λ=0.5 must pick {1, 3}: the clone's pair-sim 1.0 sinks its
    // marginal score (0.98 − 1.0 < 0) below doc 3's (0.8 − 0.66 > 0).
    val a = Array(0.98f, 0.199f)
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),       // query
      (1L, a), (2L, a),              // exact near-dup pair
      (3L, Array(0.8f, -0.6f)))      // distinct direction
      .toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" === 0L)
    val plain = Similarity.bruteForceTopKFor(q, vecs, k = 2)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(plain == Set(1L, 2L), "plain top-2 is the clone pair")
    val mmr = Retrieval.mmrRerank(q, vecs, k = 2, m = 3, lambdaMicro = 500000L)
      .collect().map(r => (r.getLong(2), r.getLong(1))).sortBy(_._1).map(_._2).toSeq
    assert(mmr.head == 1L, "first pick is pure relevance (id tie -> smaller id)")
    assert(mmr(1) == 3L,
      s"second pick must skip the clone for the distinct direction, got $mmr")
  }

  test("mmrRerank: result invariant to input partitioning") {
    val vecs = (0L until 50L).map { i =>
      val a = math.sin(i * 1.7); val b = math.cos(i * 2.3); val c = math.sin(i * 0.9)
      val n = math.sqrt(a * a + b * b + c * c)
      (i, Array((a / n).toFloat, (b / n).toFloat, (c / n).toFloat))
    }.toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" % 17 === 0L)
    val a = Retrieval.mmrRerank(q, vecs, k = 5, m = 12)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val b = Retrieval.mmrRerank(q.repartition(7), vecs.repartition(13), k = 5, m = 12)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(a == b && a.nonEmpty)
  }
}

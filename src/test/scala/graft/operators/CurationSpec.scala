package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the round-6 curation additions: domain mixing weights,
  * contrastive triplet mining, and PCA. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def normed(raw: Seq[Array[Double]]): Seq[(Long, Array[Float])] =
    raw.zipWithIndex.map { case (v, i) =>
      val n = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v.map(x => (x / n).toFloat))
    }

  test("domainWeights: exact shares and sqrt-rule weights from integer totals") {
    val docs = Seq(
      (1L, "a b c d", "en", "src0"),    // 4 tokens
      (2L, "a b", "en", "src0"),        // 2 tokens
      (3L, "x y z", "de", "src1"))      // 3 tokens
      .toDF("doc_id", "text", "lang", "source")
    val out = TextOps.domainWeights(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(out("src0") == ((2L, 6L, 6.0 / 9.0, math.sqrt(6.0 / 9.0))))
    assert(out("src1") == ((1L, 3L, 3.0 / 9.0, math.sqrt(3.0 / 9.0))))
  }

  test("contrastiveTriplets: near pairs become positives, md5-least far vector is the negative") {
    // vectors 0,1 nearly parallel (positive pair both directions);
    // 2..6 orthogonal-ish (negatives pool)
    val base = Seq(
      Array(1.0, 0.0, 0.0, 0.0),
      Array(0.999, 0.04, 0.0, 0.0),
      // five DISTINCT mutually-far vectors (pairwise |cos| ≤ ~0.71)
      Array(0.0, 1.0, 0.0, 0.0),
      Array(0.0, 0.0, 1.0, 0.0),
      Array(0.0, 0.0, 0.0, 1.0),
      Array(0.0, 0.7, -0.7, 0.0),
      Array(0.0, 0.0, 0.7, -0.7))
    val vs = normed(base).toDF("vec_id", "embedding")
    val rows = Similarity.contrastiveTriplets(vs, threshold = 0.9, sampleN = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.map(t => (t._1, t._2)).toSet == Set((0L, 1L), (1L, 0L)),
      s"directed positives expected, got ${rows.toSeq}")
    rows.foreach { case (a, p, n, ps, ns) =>
      assert(ps >= 0.9 && ns < 0.9, s"scores out of regime: $ps / $ns")
      assert(n != a && n != p)
      // the negative must be the md5-least qualifying candidate
      def md5Hex(s: String) = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val expected = (0L until 7L)
        .filter(s => s != a && s != (if (a == 0L) 1L else 0L))
        .minBy(s => md5Hex(s"$a|$s"))
      assert(n == expected, s"anchor $a: negative $n != md5-least $expected")
    }
  }

  test("compressionRatio: repetition compresses, randomness doesn't; gate bound holds") {
    val rnd = new scala.util.Random(3)
    val docs = Seq(
      (1L, "spam spam " * 200),
      (2L, Seq.fill(400)(rnd.alphanumeric.take(4).mkString).mkString(" ")),
      (3L, "")).toDF("doc_id", "text")
    val out = TextOps.compressionRatio(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L)._3 < 0.1, s"boilerplate must compress hard: ${out(1L)}")
    assert(out(2L)._3 > 3 * out(1L)._3,
      s"random text must compress far worse: ${out(2L)} vs ${out(1L)}")
    assert(out(3L)._2 > 0, "empty doc still emits a (header-only) stream")
    val gate = TextOps.compressionGate(docs).collect()(0)
    assert(gate.getLong(0) == 3 && gate.getBoolean(1) && gate.getBoolean(2), s"$gate")
    // determinism across partitionings (fixed JDK zlib)
    val again = TextOps.compressionRatio(docs.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(again == out.view.mapValues(_._2).toMap)
  }

  test("curriculumDeciles: monotone value-based buckets, ties share a bucket") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = TextOps.curriculumDeciles(docs).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(out.map(_._3).forall(d => d >= 1 && d <= 10))
    // decile is monotone in score
    val sorted = out.sortBy(_._2)
    assert(sorted.map(_._3).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
    // equal scores always share a bucket (value-based, not rank-based)
    out.groupBy(_._2).values.foreach { g =>
      assert(g.map(_._3).distinct.length == 1, s"tie split across buckets: $g")
    }
    // roughly balanced (value ties can skew counts; bound loosely)
    val counts = out.groupBy(_._3).view.mapValues(_.length)
    assert(counts.values.max <= out.length / 2, s"degenerate buckets: $counts")
  }

  test("bigramFluency: common transitions score high, word salad scores low") {
    // docs 1-3 share the same common phrase; doc 4 uses the SAME words
    // in scrambled orders — identical unigram profile, rare bigrams
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox jumps"),
      (3L, "the quick brown fox jumps"),
      (4L, "fox the jumps quick brown")).toDF("doc_id", "text")
    val out = TextOps.bigramFluency(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) == out(2L) && out(2L) == out(3L))
    assert(out(4L) < out(1L),
      s"scrambled word order must score below the common phrasing: $out")
    // n_bigrams = tokens − 1; single-token docs drop out
    val one = TextOps.bigramFluency(Seq((9L, "solo")).toDF("doc_id", "text"))
    assert(one.count() == 0)
  }

  test("QuantileSketch: self-accounted rank bound holds; merge-order independent") {
    import Sketches.QuantileSketch._
    // permuted uniform values — compaction must actually trigger
    val vs = (0 until 20000).map(i => ((i * 7919) % 20000).toDouble)
    val s = insertAll(empty(64), vs.iterator)
    assert(s.count == 20000)
    assert(s.errBound > 0, "no compaction happened — widen the fixture")
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val est = query(s, q)
      val rank = vs.count(_ <= est)
      assert(math.abs(rank - q * s.count) <= s.errBound + 1,
        s"q=$q est=$est rank=$rank bound=${s.errBound}")
    }
    // merging partitioned sketches obeys the same bound
    val merged = vs.grouped(3000)
      .map(g => insertAll(empty(64), g.iterator))
      .reduce(merge)
    assert(merged.count == 20000)
    val est50 = query(merged, 0.5)
    assert(math.abs(vs.count(_ <= est50) - 10000) <= merged.errBound + 1)
    // distributed gate over the events fixture
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val gate = Sketches.quantileSketchGate(events, "value").collect()(0)
    assert((2 to 5).forall(gate.getBoolean), s"gate row: $gate")
    // grouped aggregator surface: per-group bound holds too
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val g = Sketches.quantileSketchGroupedGate(
      orders, "o_orderstatus", "o_totalprice").collect()(0)
    assert(g.getLong(0) == 3 && g.getBoolean(1), s"grouped gate: $g")
    // tied-run regression: half the corpus is ONE value — a correct
    // sketch must pass; the former upper-endpoint rank check failed
    // any probed quantile landing inside a duplicate run longer than
    // the bound
    val dup = ((0 until 5000).map(_ => 1.0) ++ (0 until 5000).map(_ + 2.0))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val dgate = Sketches.quantileSketchGate(dup, "v").collect()(0)
    assert((2 to 5).forall(dgate.getBoolean), s"tied-run gate: $dgate")
    val dg = Sketches.quantileSketchGroupedGate(
      dup.withColumn("grp", lit("all")), "grp", "v").collect()(0)
    assert(dg.getBoolean(1), s"tied-run grouped gate: $dg")
  }

  test("PCA: recovers a planted dominant direction; gate invariants hold") {
    // anisotropic cloud: big variance along axis 2, small elsewhere
    val rnd = new scala.util.Random(5)
    val data = Seq.fill(400) {
      val v = Array.fill(8)(rnd.nextGaussian() * 0.05)
      v(2) += rnd.nextGaussian() * 3.0
      v
    }
    val vs = data.zipWithIndex.map { case (v, i) => (i.toLong, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    val model = Pca.fit(vs, k = 3, iters = 100)
    // dominant component = axis 2 (sign fixed positive by convention)
    assert(math.abs(model.components(0)(2)) > 0.99,
      s"component 0 should align with the planted axis: ${model.components(0).toSeq}")
    assert(model.components(0)(2) > 0, "sign convention: largest coordinate positive")
    assert(model.eigenvalues(0) > 5 * model.eigenvalues(1),
      "planted direction must dominate the spectrum")
    // distributed projection: variance along comp0 equals eigenvalue 0
    val proj = Pca.project(vs, model)
      .select(posexplode(col("projection")).as(Seq("i", "p")))
      .filter(col("i") === 0).agg(variance(col("p"))).head().getDouble(0)
    assert(math.abs(proj - model.eigenvalues(0)) < 1e-6 * model.totalVariance)
    val gate = Pca.gate(vs, k = 3, iters = 100).collect()(0)
    assert((3 to 6).forall(gate.getBoolean), s"gate row: $gate")
    // gate holds on the real corpus shape too (near-isotropic — the
    // regime where the k/d mass bound sits at equality)
    val fixture = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val g2 = Pca.gate(fixture).collect()(0)
    assert((3 to 6).forall(g2.getBoolean), s"fixture gate row: $g2")
    // degenerate corpora raise a clear error, not an RDD crash / NPE
    val empty = vs.filter(col("vec_id") < 0)
    intercept[IllegalArgumentException](Pca.fit(empty, k = 2, iters = 5))
    intercept[IllegalArgumentException](
      Pca.fit(vs.filter(col("vec_id") === 0), k = 2, iters = 5))
  }

  test("leak-free split: normalized-dup groups never straddle splits") {
    // 60 base docs, each with a case/punctuation variant twin
    val docs = (1 to 60).flatMap { i =>
      val body = s"doc number $i content words alpha beta"
      Seq((i.toLong * 2, body), (i.toLong * 2 + 1, body.toUpperCase + "!!"))
    }.toDF("doc_id", "text")
    val split = TextOps.splitAssignLeakFree(docs)
      .as[(Long, String)].collect().toMap
    (1 to 60).foreach { i =>
      assert(split(i.toLong * 2) == split(i.toLong * 2 + 1),
        s"twin pair $i straddles splits")
    }
    // all three splits occur across the 60 group draws
    assert(split.values.toSet == Set("train", "validation", "test"))
  }

  test("leak-free split: singleton groups keep the per-doc membership") {
    val docs = (1L to 200L).map(i => (i, s"unique body $i ${i * 7}"))
      .toDF("doc_id", "text")
    val leak = TextOps.splitAssignLeakFree(docs).as[(Long, String)].collect().toMap
    val plain = TextOps.splitAssign(docs).as[(Long, String)].collect().toMap
    assert(leak == plain)
  }

  test("grouped core composes with near-dup component ids") {
    val docs = (1 to 40).flatMap { i =>
      val body = (1 to 12).map(j => s"w${i}_$j").mkString(" ")
      // near-dup twin: one token changed (Jaccard ≈ 0.8)
      Seq((i.toLong * 2, body),
        (i.toLong * 2 + 1, body.replace(s"w${i}_12", "zz")))
    }.toDF("doc_id", "text")
    val groups = Dedup.dedupPipeline(docs, threshold = 0.5)
      .select(col("doc_id"), col("canonical_id").cast("string").as("group_key"))
    val split = TextOps.splitAssignGrouped(groups)
      .as[(Long, String)].collect().toMap
    (1 to 40).foreach { i =>
      assert(split(i.toLong * 2) == split(i.toLong * 2 + 1),
        s"near-dup pair $i straddles splits")
    }
  }
}

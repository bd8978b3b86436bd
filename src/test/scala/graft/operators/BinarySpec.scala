package graft.operators

import graft.SparkSpec

class BinarySpec extends SparkSpec {
  import spark.implicits._

  test("codes: known sign patterns pack to known halves, reshuffle-invariant") {
    // vec 1: dims 0 and 33 positive -> hi bit 31, lo bit 30
    val v1 = Array.fill(64)(-1.0f); v1(0) = 1.0f; v1(33) = 0.5f
    // vec 2: all positive -> both halves all 32 low bits set
    val v2 = Array.fill(64)(0.1f)
    // vec 3: zeros are NOT positive -> code 0
    val v3 = Array.fill(64)(0.0f)
    val e = Seq((1L, v1), (2L, v2), (3L, v3)).toDF("vec_id", "embedding")
    val out = Binary.codes(e).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((1L << 31, 1L << 30)))
    assert(out(2L) == (((1L << 32) - 1, (1L << 32) - 1)))
    assert(out(3L) == ((0L, 0L)))
    val again = Binary.codes(e.repartition(5)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(again == out)
  }

  test("codes: more than 64 dimensions is a loud error, not a truncation") {
    val e = Seq((1L, Array.fill(65)(1.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] { Binary.codes(e) }
  }

  test("topK: exact Hamming ranking with ascending-id ties, self excluded") {
    def vec(bits: Set[Int]): Array[Float] =
      Array.tabulate(64)(j => if (bits(j)) 1.0f else -1.0f)
    val e = Seq(
      (1L, vec(Set(0, 1, 2, 3))),
      (2L, vec(Set(0, 1, 2, 3))),     // identical to 1 -> distance 0
      (3L, vec(Set(0, 1, 2, 9))),     // distance 2 from 1
      (4L, vec(Set(40, 41, 42, 43)))) // distance 8 from 1
      .toDF("vec_id", "embedding")
    val out = Binary.topKFor(e.filter($"vec_id" === 1L), e, k = 3).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(2L, 3L, 4L))
    assert(out.map(_._3).toSeq == Seq(64L, 62L, 56L))
  }

  test("rerankTopKFor: full over-fetch degenerates to the exact cosine top-k") {
    // overFetch = corpus size - 1 means every candidate survives the
    // binary pass -> the rerank IS the exact scan; scores and order
    // must match bruteForce bit-for-bit.
    val e = (0 until 20).map { i =>
      val a = math.sin(i * 1.3); val b = math.cos(i * 0.7)
      val n = math.sqrt(a * a + b * b)
      (i.toLong, Array.fill(64)(0.0f).updated(0, (a / n).toFloat)
        .updated(1, (b / n).toFloat))
    }.toDF("vec_id", "embedding")
    val q = e.filter($"vec_id" < 3L)
    val rr = Binary.rerankTopKFor(q, e, k = 4, overFetch = 19).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val ex = Similarity.bruteForceTopKFor(q, e, k = 4).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Number]("rank").longValue,
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("score")))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(rr == ex)
  }

  test("axis-aligned clusters: binary neighbors stay inside the query's cluster") {
    // 4 tight clusters on distinct orthogonal sign patterns — the
    // regime where sign bits carry the geometry. Within a cluster all
    // codes tie at distance 0 (ids break them), so the tier's claim is
    // CLUSTER membership — exactly a first-pass filter's job; the
    // full-vector rerank orders within it.
    def unitIn(block: Int, i: Int): Array[Float] = {
      val v = Array.fill(64)(-0.01f)
      (0 until 16).foreach(j => v(block * 16 + j) = 1.0f + 0.01f * ((i + j) % 5))
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val e = (0 until 40).map(i => (i.toLong, unitIn(i % 4, i)))
      .toDF("vec_id", "embedding")
    val q = e.filter($"vec_id" < 4L)
    val bin = Binary.topKFor(q, e, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(bin.length == 20)
    bin.foreach { case (qid, nb) =>
      assert(nb % 4 == qid % 4,
        s"query $qid pulled neighbor $nb from a foreign cluster")
    }
  }
}

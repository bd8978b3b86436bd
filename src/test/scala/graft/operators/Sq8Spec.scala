package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQ8 scalar-quantization specs: code-range law, degenerate
  * dimensions, reconstruction error bound, and search fidelity on a
  * separable corpus. */
class Sq8Spec extends SparkSpec {
  import spark.implicits._

  private def embs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("codes: range law, min maps to 0, constant dimension codes to 0") {
    val e = embs(
      (1L, Seq(0.0f, 5.0f, 7.0f)),
      (2L, Seq(1.0f, 5.0f, 3.0f)),
      (3L, Seq(0.5f, 5.0f, -1.0f)))
    val m = Sq8.fit(e)
    assert(m.mins.toSeq == Seq(0.0, 5.0, -1.0))
    assert(m.maxs.toSeq == Seq(1.0, 5.0, 7.0))
    val c = e.select(col("vec_id"), col("embedding"))
    val coded = Sq8.codes(e, m).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // vec 1: dim0 = 0 (at min), dim1 degenerate = 0, dim2 at max:
    // (7-(-1))*255/8 = 255 exactly -> clamp 255
    assert(coded(1L) == ((3L, 255L)))
    // vec 3: dim0 = floor(0.5*255) = 127, dim1 = 0, dim2 = 0 (at min)
    assert(coded(3L) == ((3L, 127L)))
  }

  test("reconstruct: every value lands within half a cell of the original") {
    val e = embs(
      (1L, Seq(0.1f, -2.0f, 8.5f, 0.0f)),
      (2L, Seq(0.9f, 3.0f, -1.5f, 0.0f)),
      (3L, Seq(0.4f, 0.7f, 2.25f, 0.0f)))
    val m = Sq8.fit(e)
    val orig = e.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val rec = Sq8.reconstruct(e, m).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    for ((id, xs) <- orig; (x, d) <- xs.zipWithIndex) {
      val cell = (m.maxs(d) - m.mins(d)) / 255.0
      assert(math.abs(rec(id)(d) - x) <= cell,
        s"vec $id dim $d: ${rec(id)(d)} vs $x (cell $cell)")
    }
  }

  test("save/load: a round-tripped model codes identically") {
    val e = embs(
      (1L, Seq(0.1f, -2.0f, 8.5f)),
      (2L, Seq(0.9f, 3.0f, -1.5f)),
      (3L, Seq(0.4f, 0.7f, 2.25f)))
    val m = Sq8.fit(e)
    val dir = java.nio.file.Files.createTempDirectory("graft-sq8").toString
    Sq8.save(m, dir, spark)
    val m2 = Sq8.load(spark, dir)
    assert(m2.mins.toSeq == m.mins.toSeq && m2.maxs.toSeq == m.maxs.toSeq)
    assert(Sq8.codes(e, m2).collect().map(_.toSeq).toSet ==
      Sq8.codes(e, m).collect().map(_.toSeq).toSet)
  }

  test("truncatedTopKFor: front-loaded embeddings keep their neighbors at 1/4 the dims") {
    // MRL precondition planted: dims 0-1 carry the cluster signal,
    // dims 2-7 are small deterministic noise
    val rows = (0 until 12).map { i =>
      val c = i % 3
      val base = Seq(math.cos(c * 2.1).toFloat * 4, math.sin(c * 2.1).toFloat * 4)
      (i.toLong, base ++ Seq.tabulate(6)(d => 0.05f * ((i * 5 + d) % 7)))
    }
    val e = embs(rows: _*)
    val full = Similarity.bruteForceTopKFor(e, e, k = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val cut = Sq8.truncatedTopKFor(e, e, dims = 2, k = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(full == cut)
  }

  test("topKFor: separable clusters rank exactly as the full-precision scan") {
    // two tight, well-separated clusters: quantization noise cannot
    // flip any neighbor ordering across clusters
    val rows = (0 until 10).map { i =>
      val base = if (i < 5) 1.0f else -1.0f
      (i.toLong, Seq.tabulate(8)(d => base + 0.01f * ((i * 7 + d) % 5)))
    }
    val e = embs(rows: _*)
    val exact = Similarity.bruteForceTopKFor(e, e, k = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq8 = Sq8.topKFor(e, e, k = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // same 3-neighbor SETS per query (within-cluster order may differ)
    assert(exact.groupBy(_._1).view.mapValues(_.map(_._2)).toMap ==
      sq8.groupBy(_._1).view.mapValues(_.map(_._2)).toMap)
  }
}

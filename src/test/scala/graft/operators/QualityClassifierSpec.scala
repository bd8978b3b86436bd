package graft.operators

import graft.SparkSpec

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // two disjoint vocabularies -> linearly separable in the hashed space
  private def corpus(n: Int) = (0 until n).map { i =>
    val good = i % 2 == 0
    val words = if (good) Seq("alpha", "beta", "gamma", s"g${i % 5}")
                else Seq("zork", "quux", "blorp", s"b${i % 5}")
    (i.toLong, words.mkString(" "), good)
  }

  test("train/score separates disjoint vocabularies") {
    val rows = corpus(80)
    val docs = rows.map(r => (r._1, r._2)).toDF("doc_id", "text")
    val labels = rows.map(r => (r._1, if (r._3) 1.0 else 0.0)).toDF("doc_id", "y")
    val model = QualityClassifier.train(docs, labels, buckets = 256, iters = 40)
    val scored = QualityClassifier.score(docs, model).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val acc = rows.count(r => (scored(r._1) >= 0.5) == r._3).toDouble / rows.length
    assert(acc >= 0.95, s"separable corpus must classify: acc=$acc")
    scored.values.foreach(p => assert(p >= 0.0 && p <= 1.0))
  }

  test("scoring is deterministic under repartitioning") {
    val rows = corpus(60)
    val docs = rows.map(r => (r._1, r._2)).toDF("doc_id", "text")
    val labels = rows.map(r => (r._1, if (r._3) 1.0 else 0.0)).toDF("doc_id", "y")
    val model = QualityClassifier.train(docs, labels, buckets = 256, iters = 10)
    val a = QualityClassifier.score(docs, model).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = QualityClassifier.score(docs.repartition(7), model).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b, "broadcast-model scoring must not depend on partitioning")
  }

  test("gate invariants hold on the fixture corpus") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val out = QualityClassifier.gate(docs).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getBoolean(1), "quartile-extremes training accuracy must reach 0.8")
    assert(r.getBoolean(2))
    assert(r.getLong(3) == 1024L)
  }
}

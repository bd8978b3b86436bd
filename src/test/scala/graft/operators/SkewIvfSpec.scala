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
}

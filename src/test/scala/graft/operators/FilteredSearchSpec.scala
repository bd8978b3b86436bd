package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Metadata-filtered vector search: both strategy branches must give
  * the exact filtered top-k in the adaptive entry's exact regime —
  * including the starvation fallback. */
class FilteredSearchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rs(df: DataFrame): Set[(Long, Int, Long)] =
    df.select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("pre-filter branch == exact scan of the filtered subset") {
    val e = Tables.load(spark, dir, "embeddings")
    val pred = col("label") % 3 === 0
    val got = rs(Similarity.filteredTopKFor(e, e, pred, k = 5))
    val ref = rs(Similarity.bruteForceTopKFor(e, e.filter(pred), k = 5))
    assert(got == ref)
  }

  test("post-filter branch (forced) == pre-filter result") {
    val e = Tables.load(spark, dir, "embeddings")
    val pred = col("label") % 3 === 0
    val post = rs(Similarity.filteredTopKFor(e, e, pred, k = 5,
      preFilterMaxSelectivity = 0.0))
    val pre = rs(Similarity.bruteForceTopKFor(e, e.filter(pred), k = 5))
    assert(post == pre)
  }

  test("starvation fallback: tight predicate under forced post-filter stays exact") {
    val e = Tables.load(spark, dir, "embeddings")
    val pred = col("vec_id") % 7 === 0 // ~14% survive: over-fetch starves
    val post = rs(Similarity.filteredTopKFor(e, e, pred, k = 5,
      preFilterMaxSelectivity = 0.0))
    val pre = rs(Similarity.bruteForceTopKFor(e, e.filter(pred), k = 5))
    assert(post == pre)
  }

  test("kept <= k: every surviving non-self row returned, ranked") {
    val e = Tables.load(spark, dir, "embeddings")
    val pred = col("vec_id") < 4 // 4 kept ≤ k=5
    val out = Similarity.filteredTopKFor(e, e, pred, k = 5)
    val perQ = out.groupBy("query_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // queries inside the subset see 3 neighbors (self excluded), the
    // rest see all 4
    perQ.foreach { case (q, n) => assert(n == (if (q < 4) 3L else 4L)) }
  }
}

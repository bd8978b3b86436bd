package graft.operators

import graft.SparkSpec

/** Specs for edit-distance near-dup pairing and grouped exact heavy
  * hitters. */
class EditDistanceSpec extends SparkSpec {
  import spark.implicits._

  test("editDistancePairs: same-prefix pairs verify, cross-block pairs never form") {
    val docs = Seq(
      (1L, "alpha beta gamma delta one two three"),
      (2L, "alpha beta gamma delta one two threx"),   // 1 edit from doc 1
      (3L, "alpha beta gamma delta completely different tail here"),
      (4L, "zeta eta theta iota one two three")       // different block
    ).toDF("doc_id", "text")
    val out = Dedup.editDistancePairs(docs, prefixTokens = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getBoolean(5)))).toMap
    assert(out.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(out((1L, 2L))._1 == 1L && out((1L, 2L))._2)       // near-identical
    assert(!out((1L, 3L))._2)                                 // tails diverge
  }

  test("editDistancePairs: oversized blocks are dropped before pairing") {
    val boiler = (1L to 70L).map(i => (i, s"same opening four tokens unique$i"))
    val pair = Seq((100L, "rare opening here now x"), (101L, "rare opening here now y"))
    val docs = (boiler ++ pair).toDF("doc_id", "text")
    val out = Dedup.editDistancePairs(docs, prefixTokens = 4, maxBlock = 64)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet == Set((100L, 101L)))   // the 70-doc block never pairs
  }

  test("heavyHittersExactByGroup: per-group thresholds are independent") {
    // group A: 'x' dominates (6 of 10 > 10/3); group B uniform -> with
    // k=2 the threshold is n/3; B's terms tie at 2 of 6 <= 2 -> empty
    val docs = Seq(
      (1L, "x x x y z x x x y z", "A"),
      (2L, "p q r p q r", "B")).toDF("doc_id", "text", "source")
    val out = Sketches.heavyHittersExactByGroup(docs, k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSet == Set(("A", "x", 6L)))
  }

  test("heavyHittersExactByGroup: matches the direct exact count at k=50") {
    val docs = Seq(
      (1L, "a a a b c", "s1"), (2L, "a b b b c", "s1"),
      (3L, "m m n n n n", "s2")).toDF("doc_id", "text", "source")
    val grouped = Sketches.heavyHittersExactByGroup(docs, k = 50)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val direct = docs
      .select(org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.col("text"), " ")).as("term"))
      .groupBy("source", "term").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .filter { case (s, _, tf) =>
        val n = Map("s1" -> 10L, "s2" -> 6L)(s); tf * 51 > n }
      .toSet
    assert(grouped == direct)
  }
}

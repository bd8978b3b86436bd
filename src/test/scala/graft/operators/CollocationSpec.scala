package graft.operators

import graft.SparkSpec

/** PMI collocations: hand-computed micro-units on a tiny corpus, and
  * the discrimination property the score exists for — a glued pair
  * outscores an independent one. */
class CollocationSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed micro-unit PMI on a known corpus") {
    // "a b" ×6 docs plus filler: c(a,b)=6, c(a)=6, c(b)=6, others
    val docs = ((1 to 6).map(i => (i.toLong, "a b")) :+
      (7L, "x y x y x y x y x y")).toDF("doc_id", "text")
    // bigrams: (a,b)×6; (x,y)×5, (y,x)×4 → nb = 15
    val out = TextOps.collocations(docs, minCount = 4L)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out(("a", "b")) == ((6L, 6L * 15L * 1000000L / (6L * 6L))))
    assert(out(("x", "y")) == ((5L, 5L * 15L * 1000000L / (5L * 5L))))
    assert(out(("y", "x")) == ((4L, 4L * 15L * 1000000L / (5L * 5L))))
    assert(!out.contains(("b", "a")))
  }

  test("glued pair outscores an equally frequent independent pair") {
    // "p q" always adjacent; "m"/"n" equally frequent but scattered
    val glued = (1 to 10).map(i => (i.toLong, "p q filler"))
    val scattered = (11 to 20).map(i => (i.toLong, "m filler n m filler n"))
    val out = TextOps.collocations((glued ++ scattered).toDF("doc_id", "text"),
        minCount = 5L)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(out(("p", "q")) > out.getOrElse(("m", "filler"), 0L))
  }
}

package graft.operators

import graft.SparkSpec

/** Specs for the corpus-monitoring additions: TV-distance drift,
  * n-gram novelty scoring, and the broadcast blocklist screen. */
class CurationMonitorSpec extends SparkSpec {
  import spark.implicits._

  test("corpusDrift: identical corpora measure zero, disjoint corpora measure one") {
    val a = Seq((1L, "w x y z w x"), (2L, "y z w x")).toDF("doc_id", "text")
    val b = Seq((3L, "p q r s"), (4L, "q r p q")).toDF("doc_id", "text")
    val same = TextOps.corpusDrift(a, a).collect().head
    assert(same.getAs[Long]("tv_num") == 0L)
    assert(same.getAs[Double]("tv") == 0.0)
    // different word pairs hash to different buckets (deterministic
    // strings, fixed md5) -> disjoint support -> TV = 1
    val far = TextOps.corpusDrift(a, b).collect().head
    assert(far.getAs[Double]("tv") == 1.0)
    assert(far.getAs[Long]("n1") == 8L && far.getAs[Long]("n2") == 6L)
  }

  test("corpusDrift: half-overlapping mass lands strictly between") {
    val a = Seq((1L, "w x w x")).toDF("doc_id", "text")     // 3 bigrams: wx xw wx
    val c = Seq((2L, "w x p q")).toDF("doc_id", "text")     // wx xp pq
    val r = TextOps.corpusDrift(a, c).collect().head
    val tv = r.getAs[Double]("tv")
    assert(tv > 0.0 && tv < 1.0)
  }

  test("novelty: shared sliding windows count with multiplicity; short docs go NULL") {
    // k=3: docs 1 and 2 share "a b c d" at different offsets -> each
    // carries 2 shared windows ([a b c], [b c d]); doc 1 has 5 windows
    // total, doc 2 has 4. Doc 3 repeats its own phrase (still unique
    // corpus-wide -> NOT shared). Doc 4 is sub-k.
    val docs = Seq(
      (1L, "a b c d x y z"),
      (2L, "p q a b c d"),
      (3L, "m n o m n o"),
      (4L, "u v")).toDF("doc_id", "text")
    val out = TextOps.novelty(docs, k = 3, minDocs = 2)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(out(1L) == ((5L, 2L, Some(0.6))))
    assert(out(2L) == ((4L, 2L, Some(0.5))))
    assert(out(3L) == ((4L, 0L, Some(1.0))))
    assert(out(4L) == ((0L, 0L, None)))
  }

  test("novelty: a document's self-repeated window shared by another doc flags every occurrence") {
    val docs = Seq(
      (1L, "a b c z a b c"),   // [a b c] twice, both shared with doc 2
      (2L, "a b c")).toDF("doc_id", "text")
    val out = TextOps.novelty(docs, k = 3, minDocs = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((5L, 2L)))
    assert(out(2L) == ((1L, 1L)))
  }

  test("periodicity: exact periods, repeat counts, and the loop flag") {
    val docs = Seq(
      (1L, "spam ham spam ham spam ham"),       // period 2, 3 repeats -> loop
      (2L, "a a a a"),                          // period 1, 4 repeats -> loop
      (3L, "all distinct tokens here"),         // period = n, not a loop
      (4L, "x y x y z"),                        // z kills the border -> period 5
      (5L, "one two one")).toDF("doc_id", "text") // period 2, 1 repeat
    val out = TextOps.periodicity(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(1L) == ((6L, 2L, 3L, true)))
    assert(out(2L) == ((4L, 1L, 4L, true)))
    assert(out(3L) == ((4L, 4L, 1L, false)))
    assert(out(4L) == ((5L, 5L, 1L, false)))
    assert(out(5L) == ((3L, 2L, 1L, false)))
  }

  test("crossSourceMatrix: diagonal C(n,2), off-diagonal n*m, clean groups vanish") {
    val docs = Seq(
      (1L, "dup content", "web"), (2L, "dup content", "web"),
      (3L, "dup content", "forum"),
      (4L, "other shared", "web"), (5L, "other shared", "books"),
      (6L, "unique text", "web")).toDF("doc_id", "text", "source")
    val out = Dedup.crossSourceMatrix(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out(("web", "web")) == 1L)          // C(2,2 dups in web) = 1
    assert(out(("forum", "web")) == 2L)        // 2 web copies x 1 forum copy
    assert(out(("books", "web")) == 1L)
    assert(!out.contains(("web", "unique")) && out.size == 3)
  }

  test("incremental census: append composes, batch scoring equals one-shot novelty") {
    val b1 = Seq(
      (1L, "a b c d x y z"),
      (2L, "m n o r s t")).toDF("doc_id", "text")
    val b2 = Seq(
      (3L, "p q a b c d"),      // duplicates b1's passage at an offset
      (4L, "u v")).toDF("doc_id", "text")
    val all = b1.unionByName(b2)
    // census composition: build(b1) + b2 == build(b1 ∪ b2)
    val inc = TextOps.appendWindowCensus(TextOps.buildWindowCensus(b1, k = 3), b2, k = 3)
    assert(inc.collect().toSet == TextOps.buildWindowCensus(all, k = 3).collect().toSet)
    // batch scoring vs the appended census == one-shot novelty on b2's docs
    val oneShot = TextOps.novelty(all, k = 3, minDocs = 2)
      .filter($"doc_id" >= 3L).collect().map(_.toSeq).toSet
    val incremental = TextOps.noveltyAgainst(b2, inc, k = 3, minDocs = 2)
      .collect().map(_.toSeq).toSet
    assert(incremental == oneShot)
  }

  test("blocklistFilter: hit counts, distinct terms, and the keep verdict") {
    val docs = Seq(
      (1L, "bad worse bad ok"),
      (2L, "all clean words here"),
      (3L, "bad")).toDF("doc_id", "text")
    val out = TextOps.blocklistFilter(docs, Seq("bad", "worse", "absent"), maxHits = 1L)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(1L) == ((4L, 3L, 2L, false)))  // bad x2 + worse, 2 distinct terms
    assert(out(2L) == ((4L, 0L, 0L, true)))
    assert(out(3L) == ((1L, 1L, 1L, true)))   // exactly at maxHits
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the round-7 curation additions: CCNet-style segment
  * dedup, length-bucketed batching, and DSIR-flavored target
  * affinity. */
class SegmentDedupSpec extends SparkSpec {
  import spark.implicits._

  test("segmentDedup: cross-document segments drop, unique ones survive in order") {
    // window=2 words: doc 1 = [a b][c d][e f], doc 2 = [a b][x y],
    // doc 3 = [c d] — "a b" (docs 1,2) and "c d" (docs 1,3) are
    // boilerplate; everything else is unique to its document.
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b x y"),
      (3L, "c d"))
      .toDF("doc_id", "text")
    val out = TextOps.segmentDedup(docs, window = 2, minDocs = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("e f", 3L, 2L)))     // kept last segment, in order
    assert(out(2L) == (("x y", 2L, 1L)))
    assert(out(3L) == (("", 1L, 1L)))        // fully-boilerplate doc stays, empty
  }

  test("segmentDedup: reassembly with nothing removed reconstructs the text") {
    val docs = Seq(
      (1L, "p q r s t"),                     // 5 words -> [p q][r s][t]
      (2L, "u v"))
      .toDF("doc_id", "text")
    val out = TextOps.segmentDedup(docs, window = 2, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "p q r s t")
    assert(out(2L) == "u v")
  }

  test("substrDedup: sliding duplicated windows merge to maximal spans and vanish") {
    // k=3: docs 1 and 2 share the passage "a b c d" at DIFFERENT
    // offsets — the sliding census flags windows [a b c] and [b c d]
    // in both docs, which merge to one 4-token span each. Doc 3 is
    // clean; doc 4 is shorter than k and must pass through unchanged.
    val docs = Seq(
      (1L, "a b c d x y z"),
      (2L, "p q a b c d"),
      (3L, "m n o r s t"),
      (4L, "u v"))
      .toDF("doc_id", "text")
    val out = TextOps.substrDedup(docs, k = 3, minDocs = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("x y z", 1L, 4L)))
    assert(out(2L) == (("p q", 1L, 4L)))
    assert(out(3L) == (("m n o r s t", 0L, 0L)))
    assert(out(4L) == (("u v", 0L, 0L)))
  }

  test("substrDedup: removed-token accounting matches the reassembled text") {
    val docs = Seq(
      (1L, "c1 c2 c3 c4 c5 tail1 tail2"),
      (2L, "c1 c2 c3 c4 c5 other"),
      (3L, "c3 c4 c5 c1 c2 c3 c4 c5"))     // overlapping + repeated spans
      .toDF("doc_id", "text")
    val out = TextOps.substrDedup(docs, k = 3, minDocs = 2).collect()
    out.foreach { r =>
      val total = r.getString(1) match {
        case "" => 0
        case s => s.split(" ", -1).length
      }
      val original = docs.collect()
        .find(_.getLong(0) == r.getLong(0)).get.getString(1).split(" ", -1).length
      assert(original - total == r.getLong(3),
        s"doc ${r.getLong(0)}: dup_tokens must equal tokens removed")
    }
  }

  test("lengthBuckets: bucket arithmetic, cap, and bounded batch sizes") {
    val docs = (0L until 50L)
      .map(i => (i, Seq.fill((i % 40).toInt + 1)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextOps.lengthBuckets(docs, bucketWidth = 8, maxBucket = 3, batchSize = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out.foreach { case (_, n, b, _) =>
      assert(b == math.min(n / 8, 3L), s"bucket of $n tokens")
    }
    // batches fill to batchSize within each bucket (only the last one short)
    out.groupBy(t => (t._3, t._4)).foreach { case ((b, batch), rows) =>
      assert(rows.length <= 4)
      val maxBatch = out.filter(_._3 == b).map(_._4).max
      if (batch < maxBatch) assert(rows.length == 4)
    }
    // deterministic under reshuffle: same assignment from a repartitioned input
    val again = TextOps.lengthBuckets(docs.repartition(7), bucketWidth = 8,
      maxBucket = 3, batchSize = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("targetAffinity: overlap fraction of distinct bigrams against the target set") {
    val target = Seq((100L, "a b c")).toDF("doc_id", "text") // bigrams: a|b, b|c
    val docs = Seq(
      (1L, "a b c"),        // both bigrams in target -> 2/2
      (2L, "a b x"),        // a|b yes, b|x no -> 1/2
      (3L, "x y z"),        // none -> 0/2
      (4L, "solo"))         // zero bigrams -> absent from output
      .toDF("doc_id", "text")
    val out = TextOps.targetAffinity(docs, target)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((2L, 2L, 1.0)))
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((2L, 0L, 0.0)))
    assert(!out.contains(4L))
  }
}

package graft.operators

import graft.SparkSpec

/** S-curve banding auto-tune: the closed-form operating-point
  * selection for MinHash LSH. */
class BandingTuneSpec extends SparkSpec {
  import spark.implicits._

  test("S-curve laws: boundary cases and monotonicity") {
    // b=1: a single band of r rows collides iff all r minhashes agree
    assert(math.abs(Dedup.bandingCandidateProb(0.8, 1, 8)
      - math.pow(0.8, 8)) < 1e-12)
    // r=1: k independent single-row bands, OR-construction
    assert(math.abs(Dedup.bandingCandidateProb(0.8, 8, 1)
      - (1.0 - math.pow(0.2, 8))) < 1e-12)
    // increasing in s for any fixed banding
    val ss = (1 to 9).map(_ / 10.0)
    for (b <- Seq(2, 4, 8)) {
      val ps = ss.map(Dedup.bandingCandidateProb(_, b, 8 / b))
      assert(ps == ps.sorted, s"not monotone at b=$b: $ps")
    }
    // more bands (fewer rows each) = higher recall at fixed k
    assert(Dedup.bandingCandidateProb(0.5, 8, 1)
      > Dedup.bandingCandidateProb(0.5, 4, 2))
  }

  test("tuneBanding meets the recall bar with the fewest false candidates") {
    // high threshold: few wide bands suffice and filter best
    val (bHigh, rHigh) = Dedup.tuneBanding(k = 16, tau = 0.9)
    assert(bHigh * rHigh == 16)
    assert(Dedup.bandingCandidateProb(0.9, bHigh, rHigh) >= 0.9)
    // low threshold: needs more, narrower bands to keep recall
    val (bLow, rLow) = Dedup.tuneBanding(k = 16, tau = 0.4)
    assert(bLow * rLow == 16)
    assert(Dedup.bandingCandidateProb(0.4, bLow, rLow) >= 0.9)
    assert(bLow >= bHigh, s"lower tau must not choose fewer bands: $bLow vs $bHigh")
    // the high-tau choice admits fewer background-noise candidates
    assert(Dedup.bandingCandidateProb(0.2, bHigh, rHigh)
      <= Dedup.bandingCandidateProb(0.2, bLow, rLow))
    // infeasible bar: returns the max-recall divisor instead of failing
    val (bMax, rMax) = Dedup.tuneBanding(k = 2, tau = 0.05, minRecall = 0.999)
    assert(bMax * rMax == 2 && bMax == 2)
  }

  test("tuned entry surfaces a template family's candidate pairs") {
    val fam = "the quick brown fox jumps over the lazy dog every single day"
    val docs = Seq(
      1L -> fam, 2L -> fam, 3L -> (fam + " again"),
      4L -> "completely unrelated text with different words entirely here now")
      .toDF("doc_id", "text")
    val cand = Dedup.minHashLshTuned(docs, tau = 0.5)
      .as[(Long, Long)].collect().toSet
    assert(cand.contains((1L, 2L)), s"exact duplicates must collide: $cand")
    assert(!cand.contains((1L, 4L)) && !cand.contains((2L, 4L)),
      s"unrelated doc should not flood the candidates: $cand")
  }
}

package graft.operators

import graft.SparkSpec

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("viterbi segmentation is optimal vs exhaustive enumeration") {
    val m = Unigram.Model(Map(
      "a" -> math.log(0.1), "b" -> math.log(0.1), "c" -> math.log(0.05),
      "ab" -> math.log(0.3), "bc" -> math.log(0.2), "abc" -> math.log(0.15),
      "cab" -> math.log(0.1)), maxPieceLen = 3)
    def enumerate(w: String): Seq[Vector[String]] =
      if (w.isEmpty) Seq(Vector.empty)
      else (1 to math.min(3, w.length)).flatMap { l =>
        val (h, t) = (w.take(l), w.drop(l))
        if (m.logp.contains(h)) enumerate(t).map(h +: _) else Seq.empty
      }
    for (w <- Seq("abc", "abcab", "cababc", "abcabcab")) {
      val got = Unigram.encodeWord(w, m)
      val best = enumerate(w).map(p => (p.map(m.logp).sum, p))
        .maxBy(_._1)._1
      assert(math.abs(got.map(m.logp).sum - best) < 1e-12,
        s"$w: got $got (${got.map(m.logp).sum}) vs best $best")
      assert(got.mkString("") == w)
    }
  }

  test("unknown characters fall back to single-char pieces losslessly") {
    val m = Unigram.Model(Map("a" -> math.log(0.5), "b" -> math.log(0.5)),
      maxPieceLen = 3)
    val got = Unigram.encodeWord("axb!", m)
    assert(got.mkString("") == "axb!")
    assert(got.contains("x") && got.contains("!"))
  }

  test("training is deterministic and fits frequent substrings as pieces") {
    val d = docs(
      1L -> "spark filter spark filter merge merge spark",
      2L -> "filter merge spark sort sort filter",
      3L -> "window window spark filter merge sort")
    val m1 = Unigram.train(d, vocabSize = 60, maxPieceLen = 4)
    val m2 = Unigram.train(d, vocabSize = 60, maxPieceLen = 4)
    assert(m1 == m2)
    // high-frequency substrings of corpus words survive the prune
    assert(m1.logp.keys.exists(_.length > 1), "no multi-char piece fitted")
    // probabilities normalize
    val mass = m1.logp.values.map(math.exp).sum
    assert(math.abs(mass - 1.0) < 1e-6, s"prob mass $mass")
  }

  test("train terminates when vocabSize is below the distinct char count") {
    // 14 distinct chars (s,p,a,r,k,f,i,l,t,e,m,g,o,w…) but vocabSize=5:
    // the prune step can only drop multi-char pieces, so the loop must
    // exit at the chars-only vocabulary instead of spinning EM forever.
    val d = docs(1L -> "spark filter merge sort window 0189")
    val m = Unigram.train(d, vocabSize = 5, maxPieceLen = 4)
    assert(m.logp.keys.forall(_.length >= 1))
    assert(m.logp.keys.count(_.length == 1) > 5, "chars must survive")
    // and the model still encodes losslessly via those chars
    assert(Unigram.encodeWord("spark", m).mkString("") == "spark")
  }

  test("log-space EM keeps long low-probability chunks contributing") {
    // A 64-char word of one rare char: linear-space alpha underflows
    // (p^64 for small p), log space must still fit a piece for it.
    val w = "z" * 64
    val d = docs(1L -> s"$w $w a a a a a a a a")
    val m = Unigram.train(d, vocabSize = 30, maxPieceLen = 4, emIters = 3)
    // z-pieces carry real fitted mass (not just the seed estimate):
    // some multi-z piece must survive with non-trivial probability.
    val zMass = m.logp.collect { case (s, lp) if s.forall(_ == 'z') => math.exp(lp) }.sum
    assert(zMass > 0.01, s"z pieces got mass $zMass")
    assert(Unigram.encodeWord(w, m).mkString("") == w)
  }

  test("roundtrip gate holds over a mixed corpus, encode digests agree") {
    val d = docs(
      1L -> "spark filter merge sort window",
      2L -> "spark filter merge sort window",
      3L -> "zq unseen-glyphs 12345 xyzzy")
    val m = Unigram.trainCached(d.limit(2), vocabSize = 50)
    val gate = Unigram.roundtripGate(d, m)
      .as[(Long, Boolean, Boolean)].head()
    assert(gate == ((3L, true, true)))
    val enc = Unigram.encode(d, m)
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // identical docs -> identical digests; different doc differs
    assert(enc(1L) == enc(2L))
    assert(enc(3L) != enc(1L))
    Unigram.invalidateTrainCache()
  }
}

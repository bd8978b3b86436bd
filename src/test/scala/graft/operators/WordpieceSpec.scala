package graft.operators

import graft.SparkSpec

class WordpieceSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("merges rank by likelihood ratio, not raw pair count") {
    // pair (x,##y) occurs 4 times but its parts are everywhere
    // (n_x=104, n_##y=4 → wait ##y only in xy) — use singleton floods:
    // "xy" ×4 with "x" ×96 flooding n_x; "qz" ×3 with q,z appearing
    // nowhere else. BPE picks xy (4 > 3); WordPiece must pick qz:
    // score(qz) = 3/(3·3) = 0.33 ≫ score(xy) = 4/(100·4) = 0.01.
    val corpus = docs(
      1L -> (Seq.fill(4)("xy") ++ Seq.fill(96)("x") ++ Seq.fill(3)("qz"))
        .mkString(" "))
    val m = Wordpiece.train(corpus, numMerges = 1)
    assert(m.vocab.contains("qz"), s"vocab: ${m.vocab}")
    assert(!m.vocab.contains("xy"), s"vocab: ${m.vocab}")
  }

  test("encode is greedy longest-match-first over the vocabulary") {
    val m = Wordpiece.Model(
      Set("u", "n", "d", "e", "r", "un", "und", "##d", "##e", "##r", "##er"),
      maxPieceLen = 3)
    assert(Wordpiece.encodeWord("under", m) == Vector("und", "##er"))
    // prefix "un" exists but the longer "und" must win at position 0
    assert(Wordpiece.encodeWord("und", m) == Vector("und"))
    assert(Wordpiece.encodeWord("run", m) == Vector("r", "##u", "##n"))
  }

  test("unknown characters fall back to single-char pieces losslessly") {
    val m = Wordpiece.Model(Set("a", "b", "ab"), maxPieceLen = 2)
    val got = Wordpiece.encodeWord("axb!", m)
    assert(got.map(_.stripPrefix(Wordpiece.Continuation)).mkString("") == "axb!")
    assert(got.contains("##x") && got.contains("##!"))
  }

  test("words containing literal '##' stay lossless (no bare ##-piece minted)") {
    // '#'-heavy corpus pressures train toward merging '#' + '###'
    // into a bare piece starting with '##' — which decode could not
    // tell from a continuation marker. The guard must keep every such
    // word round-tripping exactly.
    val d = docs(
      1L -> "##x ##x ##x ### #tag #tag ## ## ## ump",
      2L -> "normal words here ##anchor ###triple")
    val m = Wordpiece.train(d, numMerges = 30)
    val gate = Wordpiece.roundtripGate(d, m)
      .as[(Long, Boolean, Boolean)].head()
    assert(gate == ((2L, true, true)), s"gate: $gate")
    for (w <- Seq("##x", "###", "#tag", "##", "####deep"))
      assert(Wordpiece.encodeWord(w, m)
        .map(_.stripPrefix(Wordpiece.Continuation)).mkString("") == w, w)
  }

  test("training is deterministic; roundtrip gate holds over a mixed corpus") {
    val d = docs(
      1L -> "spark filter spark filter merge merge spark window",
      2L -> "filter merge spark sort sort filter unknown-glyphs 12345",
      3L -> ("z" * 150)) // space-free long word exercises chunking
    val m1 = Wordpiece.train(d, numMerges = 40)
    val m2 = Wordpiece.train(d, numMerges = 40)
    assert(m1 == m2)
    assert(m1.vocab.exists(_.stripPrefix(Wordpiece.Continuation).length > 1),
      "no multi-char piece learned")
    val gate = Wordpiece.roundtripGate(d, m1)
      .as[(Long, Boolean, Boolean)].head()
    assert(gate == ((3L, true, true)))
    // identical docs -> identical digests; different docs differ
    val d2 = docs(1L -> "alpha beta", 2L -> "alpha beta", 3L -> "gamma")
    val enc = Wordpiece.encode(d2, m1)
      .as[(Long, Long, String)].collect().map(r => r._1 -> r._3).toMap
    assert(enc(1L) == enc(2L) && enc(3L) != enc(1L))
  }
}

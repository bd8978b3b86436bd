package graft.operators

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower widest widest widest"),
    (3L, "newest newest newest newest newest newest"))
    .toDF("doc_id", "text")

  test("training is deterministic and merges the classic pairs") {
    val m1 = Bpe.train(corpus, numMerges = 10)
    val m2 = Bpe.train(corpus, numMerges = 10)
    assert(m1.merges == m2.merges, "training must be deterministic")
    // the Sennrich corpus's dominant suffix: "e"+"s", then "es"+"t</w>"
    // (every example word ENDS in est, so the t carries the sentinel)
    assert(m1.merges.contains(("e", "s")), m1.merges.toString)
    assert(m1.merges.contains(("es", "t</w>")), m1.merges.toString)
  }

  test("encode emits merged pieces; rare words fall back to characters") {
    val model = Bpe.train(corpus, numMerges = 30)
    // a trained word collapses to few pieces
    assert(Bpe.encodeWord("newest", model.rank).length <= 2)
    // an unseen word still encodes (characters up), losslessly
    val unseen = Bpe.encodeWord("zzq", model.rank)
    assert(unseen.mkString("").stripSuffix(Bpe.EndOfWord) == "zzq")
  }

  test("space-free 100kB document encodes in bounded time and roundtrips") {
    // one giant "word" (the CJK/minified-JS/base64 shape): unchunked
    // this is O(L²) — ~10¹⁰ symbol scans at L=100k; chunked at
    // MaxWordLen it is (L/64)·64² and must finish promptly
    val blob = {
      val sb = new StringBuilder
      var i = 0
      while (sb.length < 100000) { sb.append(('a' + i % 26).toChar); i += 1 }
      sb.toString
    }
    val docs = Seq((1L, blob), (2L, "low lower lowest")).toDF("doc_id", "text")
    val model = Bpe.train(docs, numMerges = 30)
    val t0 = System.nanoTime()
    val enc = Bpe.encode(docs, model).collect()
    val gate = Bpe.roundtripGate(docs, model).collect()(0)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(gate.getBoolean(1), "chunked encode must still decode exactly")
    assert(enc.length == 2)
    assert(secs < 30.0, f"bounded encode took $secs%.1f s — chunking broken?")
  }

  test("roundtrip gate holds on the documents fixture; encode is stable") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val model = Bpe.trainCached(docs, numMerges = 50)
    val gate = Bpe.roundtripGate(docs, model).collect()(0)
    assert(gate.getBoolean(1), "every document must decode to its token stream")
    val e1 = Bpe.encode(docs, model).collect().map(_.toSeq).sortBy(_.toString)
    val e2 = Bpe.encode(docs, model).collect().map(_.toSeq).sortBy(_.toString)
    assert(e1.toSeq == e2.toSeq, "encode must be deterministic")
    // pieces per doc never exceed characters and never undercut words
    val sanity = Bpe.encode(docs, model)
      .join(docs, "doc_id")
      .selectExpr("n_pieces", "size(split(text, ' ')) AS words",
        "length(text) AS chars")
      .as[(Long, Int, Int)].collect()
    assert(sanity.forall { case (p, w, c) => p >= w && p <= c + w })
  }
}

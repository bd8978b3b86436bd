package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The tokenizer-lifecycle law the index family already has
  * (PqIndexSpec save/load): a persisted model loaded in a fresh
  * "session" encodes bit-identically to the in-memory one — without
  * it, every encode session retrains, and a retrain on a grown corpus
  * silently shifts token ids under every downstream consumer. */
class TokenizerPersistenceSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower widest widest widest"),
    (3L, "newest newest newest newest newest newest"),
    (4L, "unseen zebra tokens arrive later"))
    .toDF("doc_id", "text")

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).sortBy(_.toString).toSeq

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("Bpe: save/load round-trip encodes identically, merge order preserved") {
    val m = Bpe.train(corpus, numMerges = 25)
    val dir = tmp("graft-bpe-model")
    Bpe.save(m, dir, spark)
    val loaded = Bpe.load(spark, dir)
    assert(loaded.merges == m.merges, "merge ORDER is the model")
    assert(rows(Bpe.encode(corpus, loaded)) == rows(Bpe.encode(corpus, m)))
  }

  test("Unigram: save/load round-trip encodes identically (exact doubles)") {
    val m = Unigram.train(corpus, vocabSize = 60, maxPieceLen = 4)
    val dir = tmp("graft-unigram-model")
    Unigram.save(m, dir, spark)
    val loaded = Unigram.load(spark, dir)
    assert(loaded.logp == m.logp && loaded.maxPieceLen == m.maxPieceLen)
    assert(rows(Unigram.encode(corpus, loaded)) == rows(Unigram.encode(corpus, m)))
  }

  test("Wordpiece: save/load round-trip encodes identically") {
    val m = Wordpiece.train(corpus, numMerges = 25)
    val dir = tmp("graft-wordpiece-model")
    Wordpiece.save(m, dir, spark)
    val loaded = Wordpiece.load(spark, dir)
    assert(loaded.vocab == m.vocab && loaded.maxPieceLen == m.maxPieceLen)
    assert(rows(Wordpiece.encode(corpus, loaded)) == rows(Wordpiece.encode(corpus, m)))
  }

  test("save overwrites: reloading after a retrain sees the new model") {
    val dir = tmp("graft-bpe-overwrite")
    val small = Bpe.train(corpus, numMerges = 5)
    val big = Bpe.train(corpus, numMerges = 25)
    Bpe.save(small, dir, spark)
    Bpe.save(big, dir, spark)
    assert(Bpe.load(spark, dir).merges == big.merges)
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016, arXiv:1508.07909
  * — the word-internal merge scheme GPT-2-family tokenizers build on):
  * the step that turns a curated text corpus into the token stream a
  * training run consumes, and the missing link between this engine's
  * token-count budgeting (whitespace proxy) and a real subword vocab.
  *
  * Lifecycle mirrors the ANN indexes (build/query split):
  *
  *  - [[train]] is SAMPLE-BOUNDED driver work, like [[PqIndex.fitPq]]:
  *    word frequencies reduce distributedly (token-keyed integer
  *    shuffle, the [[TextOps.vocabulary]] shape), the top `maxWords`
  *    (freq desc, word asc — deterministic) collect, and the greedy
  *    merge loop runs locally over that bounded table. Merge choice is
  *    deterministic: highest pair count, ties to the lexicographically
  *    smallest pair.
  *  - [[encode]] is distributed and model-frozen: merges broadcast
  *    (numMerges strings — KBs), each partition encodes its documents
  *    with zero shuffles; output carries counts and a digest, never
  *    the piece stream (bodies stay put, the engine's dedup rule).
  *
  * Correctness: BPE merges only ever CONCATENATE adjacent pieces of
  * the same word, so decode(encode(w)) == w for every word by
  * construction — [[roundtripGate]] makes that driver-checkable as a
  * one-row boolean over the whole corpus (the same gate pattern as the
  * ANN recall gates: the operator's output has no SQL oracle, its
  * invariant does). */
object Bpe {

  /** End-of-word sentinel appended to each word's final character
    * piece, the standard trick that lets merges distinguish word-final
    * from word-internal contexts ("est</w>" vs "est"). */
  val EndOfWord = "</w>"

  final case class Model(merges: Seq[(String, String)]) extends Serializable {
    /** rank by merge order; earlier merges apply first at encode time */
    @transient lazy val rank: Map[(String, String), Int] = merges.zipWithIndex.toMap
  }

  /** Upper bound on the symbol span [[encodeWord]] scans: the encode
    * loop is O(L²) in word length, and "word" means a SPACE-DELIMITED
    * run — a space-free document (CJK text, minified JS, a base64
    * blob) is ONE word of length L, a quadratic straggler-task
    * generator at corpus scale. Words longer than this are chunked
    * into `MaxWordLen`-sized pieces that train/encode/decode
    * independently, exactly the role of regex pre-tokenization in
    * production BPE tokenizers: merges never span a chunk boundary,
    * so reconstruction (concatenate the chunk decodes) is exact by
    * construction and the roundtrip gate holds unchanged. 64 chars
    * clears every natural-language word while capping per-word encode
    * work at 64² scans. */
  val MaxWordLen = 64

  /** Chunked view of a space-delimited word: itself when short, else
    * `maxWordLen`-sized slices. */
  private def wordChunks(w: String, maxWordLen: Int): Iterator[String] =
    if (w.length <= maxWordLen) Iterator.single(w) else w.grouped(maxWordLen)

  private def wordSymbols(w: String): Vector[String] = {
    val cs = w.toVector.map(_.toString)
    if (cs.isEmpty) Vector.empty
    else cs.init :+ (cs.last + EndOfWord)
  }

  /** Encode one word against a trained model: repeatedly apply the
    * lowest-rank applicable merge (the canonical BPE encode loop). */
  private[operators] def encodeWord(w: String, rank: Map[(String, String), Int]): Vector[String] = {
    var syms = wordSymbols(w)
    var done = syms.length < 2
    while (!done) {
      var best = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = i }
        i += 1
      }
      if (best < 0 || bestRank == Int.MaxValue) done = true
      else {
        syms = (syms.take(best) :+ (syms(best) + syms(best + 1))) ++ syms.drop(best + 2)
        if (syms.length < 2) done = true
      }
    }
    syms
  }

  /** Session-scoped memo for [[trainCached]] — same policy as
    * [[IvfIndex.fitCached]] ([[ModelMemo]]: plan fingerprint +
    * input-file inventory; in-memory relations bypass): training is
    * deterministic per (dataset, params), so the encode query, the
    * gate, and repeated bench runs share one model. */
  private val memo = new ModelMemo[Model]

  /** Explicit cache reset (see [[ModelMemo.invalidate]]). */
  def invalidateTrainCache(): Unit = memo.invalidate()

  /** [[train]] with per-session memoization. */
  def trainCached(docs: DataFrame, numMerges: Int = 200, maxWords: Int = 10000): Model =
    memo.getOrCompute(docs, s"bpe:$numMerges:$maxWords") {
      train(docs, numMerges, maxWords)
    }

  /** Train `numMerges` merges on the corpus's top-`maxWords` word
    * frequency table. Driver state is bounded by maxWords whatever the
    * corpus size; rare tail words outside the sample still encode
    * losslessly (down to characters) — sampling costs compression,
    * never correctness. */
  def train(docs: DataFrame, numMerges: Int = 200, maxWords: Int = 10000): Model = {
    val spark = docs.sparkSession
    import spark.implicits._
    val freqs: Array[(String, Long)] = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxWords)
      .as[(String, Long)].collect()

    // chunk over-long words the same way encode will see them, then
    // re-merge duplicate chunks — bounds the merge loop's per-word
    // cost at MaxWordLen² whatever the corpus contains
    val chunked: Array[(String, Long)] = freqs.iterator
      .flatMap { case (w, n) => wordChunks(w, MaxWordLen).map((_, n)) }
      .toSeq.groupMapReduce(_._1)(_._2)(_ + _)
      .toArray.sortBy { case (w, n) => (-n, w) }

    var words: Array[(Vector[String], Long)] =
      chunked.map { case (w, n) => (wordSymbols(w), n) }
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + n
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        // deterministic argmax: count desc, then lexicographic pair
        val best = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        words = words.map { case (syms, n) =>
          if (syms.length < 2) (syms, n)
          else {
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
                out += joined; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.result(), n)
          }
        }
        m += 1
      }
    }
    Model(merges.result())
  }

  /** Distributed encode: one row per document — (doc_id, n_pieces,
    * pieces_md5). The digest is over the unit-separator-joined piece
    * stream, so two documents encode identically iff their digests
    * match (the dedup-style body-free contract). */
  def encode(docs: DataFrame, model: Model): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    Similarity.spread(docs, "doc_id")
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val rank = bc.value.rank
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val pieces = text.split(" ").iterator.filter(_.nonEmpty)
            .flatMap(wordChunks(_, MaxWordLen)).flatMap(encodeWord(_, rank))
          md.reset()
          var n = 0L
          pieces.foreach { p =>
            if (n > 0) md.update(0x1f.toByte)
            md.update(p.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            n += 1
          }
          (id, n, md.digest().map("%02x".format(_)).mkString)
        }
      }.toDF("doc_id", "n_pieces", "pieces_md5")
  }

  /** One-row roundtrip gate: decode(encode(doc)) must reproduce every
    * document's exact token stream. Decode = strip [[EndOfWord]] and
    * re-join — pure per-row work; the gate reduces to (n_docs,
    * roundtrip_ok) so the driver's oracle can pin the verdict at any
    * SF. (The merge count is NOT emitted: training exhausts below
    * numMerges on small-vocabulary corpora, so it is SF-dependent.) */
  def roundtripGate(docs: DataFrame, model: Model): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    val ok = Similarity.spread(docs, "doc_id")
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val rank = bc.value.rank
        it.map { case (_, text) =>
          val words = text.split(" ").filter(_.nonEmpty)
          // decode chunk-wise (each chunk carries its own EndOfWord
          // sentinel) and concatenate — exact reconstruction even when
          // the text itself contains the sentinel string
          val decoded = words.map(w =>
            wordChunks(w, MaxWordLen)
              .map(encodeWord(_, rank).mkString("").stripSuffix(EndOfWord))
              .mkString(""))
          java.util.Arrays.equals(
            words.asInstanceOf[Array[AnyRef]], decoded.asInstanceOf[Array[AnyRef]])
        }
      }.toDF("ok")
    ok.agg(count(lit(1)).as("n_docs"),
      coalesce(bool_and(col("ok")), lit(true)).as("roundtrip_ok"))
  }

  /** Persist the merge table to the plain-parquet lake layout — the
    * build-once/encode-many split the ANN indexes already have (train
    * at corpus build, load in every encode session; a tokenizer that
    * cannot be persisted forces a retrain per session, and a RETRAINED
    * tokenizer on a grown corpus silently shifts every token id
    * downstream). Merge ORDER is the model, so rows carry their rank. */
  def save(model: Model, dir: String, spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    model.merges.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("ord", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/merges")
  }

  /** Load a merge table persisted by [[save]]; the loaded model encodes
    * identically (strings round-trip parquet exactly; order restores
    * from the rank column). */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String): Model = {
    import spark.implicits._
    Model(spark.read.parquet(s"$dir/merges")
      .as[(Int, String, String)].collect().sortBy(_._1)
      .map(r => (r._2, r._3)).toSeq)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece subword tokenizer (Schuster & Nakajima 2012; Wu et al.
  * 2016 — the BERT-family tokenizer), completing the production
  * tokenizer triad next to [[Bpe]] (GPT family, frequency-greedy
  * merges) and [[Unigram]] (SentencePiece, EM-fitted lattice):
  *
  *  - TRAIN is BPE-shaped (grow a vocabulary by merging adjacent
  *    symbol pairs over a bounded word-frequency table) but the merge
  *    criterion is the LIKELIHOOD gain: pick the pair maximizing
  *    count(ab) / (count(a)·count(b)) — "merge what co-occurs more
  *    than its parts predict", not just "what co-occurs most". Scores
  *    compare EXACTLY (cross-multiplied BigInt products, no float
  *    drift), ties break to the lexicographically smallest pair, so
  *    the model is a pure function of (corpus, params).
  *  - ENCODE is the greedy longest-match-first walk over the fitted
  *    vocabulary with the `##` continuation-piece convention — NOT a
  *    merge replay: at each position the longest vocabulary piece
  *    wins. Characters outside the vocabulary fall back to per-char
  *    pieces (never an UNK that loses bytes), so
  *    decode(encode(w)) == w for EVERY word by construction and
  *    [[roundtripGate]] is driver-checkable at any SF.
  *
  * Lifecycle and scale shape mirror [[Bpe]] exactly: sample-bounded
  * driver train (top `maxWords` by (freq desc, word asc)), broadcast
  * model, zero-shuffle distributed encode emitting (doc_id, n_pieces,
  * pieces_md5) — bodies never move, [[Bpe.MaxWordLen]] chunking kills
  * the quadratic space-free-document straggler. */
object Wordpiece {

  /** Continuation prefix for word-internal pieces ("##ing"). */
  val Continuation = "##"

  final case class Model(vocab: Set[String], maxPieceLen: Int) extends Serializable

  private val memo = new ModelMemo[Model]
  def invalidateTrainCache(): Unit = memo.invalidate()

  def trainCached(docs: DataFrame, numMerges: Int = 200,
                  maxWords: Int = 10000): Model =
    memo.getOrCompute(docs, s"wordpiece:$numMerges:$maxWords") {
      train(docs, numMerges, maxWords)
    }

  private def wordChunks(w: String): Iterator[String] =
    if (w.length <= Bpe.MaxWordLen) Iterator.single(w)
    else w.grouped(Bpe.MaxWordLen)

  /** First char bare, the rest `##`-prefixed — the WordPiece word shape. */
  private def wordSymbols(w: String): Vector[String] = {
    val cs = w.toVector
    if (cs.isEmpty) Vector.empty
    else cs.head.toString +: cs.tail.map(c => Continuation + c)
  }

  private def join(a: String, b: String): String = a + b.stripPrefix(Continuation)

  /** Train `numMerges` likelihood-scored merges on the corpus's
    * top-`maxWords` word table. Driver cost is O(numMerges · symbols)
    * over the bounded table — corpus-size-independent; tail words
    * outside the sample still encode losslessly via the char fallback
    * (sampling costs compression, never correctness). */
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
    val chunked: Array[(String, Long)] = freqs.iterator
      .flatMap { case (w, n) => wordChunks(w).map((_, n)) }
      .toSeq.groupMapReduce(_._1)(_._2)(_ + _)
      .toArray.sortBy { case (w, n) => (-n, w) }

    var words: Array[(Vector[String], Long)] =
      chunked.map { case (w, n) => (wordSymbols(w), n) }
    val vocab = scala.collection.mutable.LinkedHashSet.empty[String]
    words.foreach(_._1.foreach(vocab += _))
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      val symCounts = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length) {
          symCounts(syms(i)) = symCounts.getOrElse(syms(i), 0L) + n
          if (i < syms.length - 1) {
            val p = (syms(i), syms(i + 1))
            pairCounts(p) = pairCounts.getOrElse(p, 0L) + n
          }
          i += 1
        }
      }
      // A BARE (word-initial) piece whose CONTENT starts with "##" is
      // indistinguishable from a continuation piece at decode time
      // (stripPrefix would eat literal characters) — never mint one.
      // Only '#'-leading words can produce such pairs; skipping them
      // costs those words a merge, never losslessness.
      val mergeable = pairCounts.keysIterator.filterNot { case (a, b) =>
        !a.startsWith(Continuation) && join(a, b).startsWith(Continuation)
      }.toSeq
      if (mergeable.isEmpty) exhausted = true
      else {
        // argmax of n_ab/(n_a·n_b), compared exactly: score(x) > score(y)
        // ⇔ n_xab·n_ya·n_yb > n_yab·n_xa·n_xb in BigInt — no float
        // rounding can reorder the merge sequence
        val best = mergeable.reduce { (x, y) =>
          val sx = BigInt(pairCounts(x)) * BigInt(symCounts(y._1)) * BigInt(symCounts(y._2))
          val sy = BigInt(pairCounts(y)) * BigInt(symCounts(x._1)) * BigInt(symCounts(x._2))
          val c = sx.compare(sy)
          if (c > 0) x
          else if (c < 0) y
          else if (implicitly[Ordering[(String, String)]].lteq(x, y)) x else y
        }
        val joined = join(best._1, best._2)
        vocab += joined
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
    val maxLen = if (vocab.isEmpty) 1
      else vocab.iterator.map(_.stripPrefix(Continuation).length).max
    Model(vocab.toSet, maxLen)
  }

  /** Greedy longest-match-first encode of one word (chunk): at each
    * position the LONGEST vocabulary piece wins (initial pieces bare,
    * continuations `##`-prefixed); a position with no vocabulary match
    * emits its single character as a fallback piece — lossless for
    * every input, unknown glyphs included. */
  private[operators] def encodeWord(w: String, m: Model): Vector[String] = {
    val out = Vector.newBuilder[String]
    var pos = 0
    while (pos < w.length) {
      val prefix = if (pos == 0) "" else Continuation
      var l = math.min(m.maxPieceLen, w.length - pos)
      var matched = -1
      while (l >= 1 && matched < 0) {
        val cand = prefix + w.substring(pos, pos + l)
        // never EMIT a bare piece whose content starts with "##" (train
        // never mints one, but a caller-built vocab could carry one):
        // decode could not tell it from a continuation piece
        val decodable = pos > 0 || l < 2 || !cand.startsWith(Continuation)
        if (decodable && m.vocab.contains(cand)) matched = l
        else l -= 1
      }
      if (matched < 0) { out += prefix + w.substring(pos, pos + 1); pos += 1 }
      else { out += prefix + w.substring(pos, pos + matched); pos += matched }
    }
    out.result()
  }

  /** Distributed encode — (doc_id, n_pieces, pieces_md5), the same
    * body-free digest contract as [[Bpe.encode]]/[[Unigram.encode]]. */
  def encode(docs: DataFrame, model: Model): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    Similarity.spread(docs, "doc_id")
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val m = bc.value
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val pieces = text.split(" ").iterator.filter(_.nonEmpty)
            .flatMap(wordChunks).flatMap(encodeWord(_, m))
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

  /** One-row gate: decode(encode(doc)) reproduces every document, and
    * no word segments to more pieces than characters (char fallback is
    * the worst case — the same sanity bound as [[Unigram]]'s). */
  def roundtripGate(docs: DataFrame, model: Model): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    val rows = Similarity.spread(docs, "doc_id")
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val m = bc.value
        it.map { case (_, text) =>
          val words = text.split(" ").filter(_.nonEmpty)
          var ok = true
          var bounded = true
          words.foreach { w =>
            val pieces = wordChunks(w).flatMap(encodeWord(_, m)).toVector
            if (pieces.map(_.stripPrefix(Continuation)).mkString("") != w) ok = false
            if (pieces.length > w.length) bounded = false
          }
          (ok, bounded)
        }
      }.toDF("ok", "bounded")
    rows.agg(count(lit(1)).as("n_docs"),
      coalesce(bool_and(col("ok")), lit(true)).as("roundtrip_ok"),
      coalesce(bool_and(col("bounded")), lit(true)).as("piece_bound_ok"))
  }
  /** Persist the vocabulary to the plain-parquet lake layout (the
    * [[Bpe.save]] contract: train once, encode in any session). */
  def save(model: Model, dir: String, spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    model.vocab.toSeq.map(p => (p, model.maxPieceLen))
      .toDF("piece", "max_piece_len")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/vocab")
  }

  /** Load a vocabulary persisted by [[save]]. */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String): Model = {
    import spark.implicits._
    val rows = spark.read.parquet(s"$dir/vocab")
      .as[(String, Int)].collect()
    require(rows.nonEmpty, s"no wordpiece model at $dir")
    Model(rows.map(_._1).toSet, rows.head._2)
  }
}

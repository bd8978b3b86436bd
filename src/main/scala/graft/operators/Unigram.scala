package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (Kudo 2018, arXiv:1804.10959 — the
  * SentencePiece unigram model): the OTHER production tokenizer family
  * next to [[Bpe]]. Where BPE grows a vocabulary bottom-up by greedy
  * merges, the unigram model starts from a large seed vocabulary of
  * frequent substrings, fits piece probabilities by EM over each
  * word's segmentation lattice, prunes to the target size, and encodes
  * with a Viterbi best segmentation under the fitted log-probs.
  *
  * Lifecycle mirrors [[Bpe]] exactly (the build/query split):
  *
  *  - [[train]] is SAMPLE-BOUNDED driver work: word frequencies reduce
  *    distributedly (token-keyed integer shuffle), the top `maxWords`
  *    rows collect (freq desc, word asc — deterministic), and
  *    seed → EM → prune runs locally over that bounded table. All
  *    selection steps are tie-broken (count desc, piece asc), so the
  *    model is a pure function of (corpus, params).
  *  - [[encode]] is distributed and model-frozen: the piece table
  *    broadcasts (≤ vocabSize strings — KBs), each partition Viterbi-
  *    segments its documents with zero shuffles; output carries counts
  *    and a digest, never the piece stream.
  *
  * Correctness: every single character of the sampled vocabulary is
  * forced into the piece table, and characters outside it fall back to
  * per-char pieces at encode time — so a Viterbi path always exists
  * and decode(encode(w)) == w for EVERY word by construction.
  * [[roundtripGate]] makes that driver-checkable at any SF, and the
  * spec checks Viterbi optimality against exhaustive enumeration on
  * short words. */
object Unigram {

  /** piece → log probability. Pieces never cross a word (or
    * [[Bpe.MaxWordLen]] chunk) boundary. */
  final case class Model(logp: Map[String, Double], maxPieceLen: Int)
      extends Serializable

  private val memo = new ModelMemo[Model]
  def invalidateTrainCache(): Unit = memo.invalidate()

  def trainCached(docs: DataFrame, vocabSize: Int = 400,
                  maxWords: Int = 10000, maxPieceLen: Int = 6,
                  emIters: Int = 2): Model =
    memo.getOrCompute(docs, s"unigram:$vocabSize:$maxWords:$maxPieceLen:$emIters") {
      train(docs, vocabSize, maxWords, maxPieceLen, emIters)
    }

  /** Fit the unigram model on the corpus's top-`maxWords` word table.
    * Driver cost is O(maxWords · wordLen · maxPieceLen) per EM pass —
    * bounded whatever the corpus size; rare tail words still encode
    * losslessly via the char fallback (sampling costs compression,
    * never correctness — the [[Bpe.train]] argument). */
  def train(docs: DataFrame, vocabSize: Int = 400, maxWords: Int = 10000,
            maxPieceLen: Int = 6, emIters: Int = 2): Model = {
    val spark = docs.sparkSession
    import spark.implicits._
    val freqs: Array[(String, Long)] = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxWords)
      .as[(String, Long)].collect()
    // chunk over-long words the way encode will see them (the BPE
    // straggler bound), re-merging duplicate chunks
    val words: Array[(String, Long)] = freqs.iterator
      .flatMap { case (w, n) => wordChunks(w).map((_, n)) }
      .toSeq.groupMapReduce(_._1)(_._2)(_ + _)
      .toArray.sortBy { case (w, n) => (-n, w) }

    // ---- seed vocabulary: all substrings ≤ maxPieceLen, weighted by
    // occurrence count × word freq; single chars are mandatory ----
    val subCounts = scala.collection.mutable.HashMap.empty[String, Double]
    words.foreach { case (w, n) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= maxPieceLen && i + l <= w.length) {
          val s = w.substring(i, i + l)
          subCounts(s) = subCounts.getOrElse(s, 0.0) + n.toDouble
          l += 1
        }
        i += 1
      }
    }
    val chars: Set[String] = subCounts.keysIterator.filter(_.length == 1).toSet
    val seedSize = math.max(vocabSize * 4, chars.size)
    val multi = subCounts.iterator.filter(_._1.length > 1).toArray
      .sortBy { case (s, c) => (-c, s) }.take(seedSize - chars.size)
    var vocab: Array[String] = (chars.toArray ++ multi.map(_._1)).sorted

    // ---- EM + prune rounds: fit probabilities over the lattice, then
    // drop the lowest-expected-mass multi-char pieces until vocabSize ----
    var probs: Map[String, Double] = {
      val tot = vocab.iterator.map(subCounts(_)).sum
      vocab.iterator.map(s => s -> subCounts(s) / tot).toMap
    }
    var done = false
    while (!done) {
      var it = 0
      while (it < emIters) {
        probs = emStep(words, vocab, probs, maxPieceLen)
        it += 1
      }
      // Single chars are mandatory, so `vocabSize` below chars.size is
      // unreachable — the prune step can only drop multi-char pieces.
      // Terminate once nothing prunable remains (chars-only vocabulary)
      // rather than looping EM forever against an impossible target.
      if (vocab.length <= math.max(vocabSize, chars.size)) done = true
      else {
        // prune: keep all single chars + the highest-mass multis;
        // shrink at most 25% per round (the SentencePiece schedule)
        // so probabilities re-fit between cuts
        val keepMulti = math.max(vocabSize - chars.size,
          ((vocab.length - chars.size) * 3) / 4)
        val kept = vocab.iterator.filter(_.length > 1)
          .map(s => (s, probs.getOrElse(s, 0.0))).toArray
          .sortBy { case (s, p) => (-p, s) }.take(keepMulti).map(_._1)
        vocab = (chars.toArray ++ kept).sorted
        val z = vocab.iterator.map(probs.getOrElse(_, 1e-12)).sum
        probs = vocab.iterator.map(s => s -> probs.getOrElse(s, 1e-12) / z).toMap
      }
    }
    Model(probs.map { case (s, p) => s -> math.log(math.max(p, 1e-300)) },
      maxPieceLen)
  }

  /** One EM pass: expected piece counts by forward–backward over each
    * word's segmentation lattice, weighted by word frequency. Runs in
    * LOG space (log-sum-exp per position): linear-space alpha products
    * underflow to 0.0 for chunks near [[Bpe.MaxWordLen]] built from
    * low-probability pieces, silently dropping those words from the
    * counts; log space keeps every reachable word contributing. */
  private def emStep(words: Array[(String, Long)], vocab: Array[String],
                     probs: Map[String, Double], maxPieceLen: Int): Map[String, Double] = {
    val inVocab = vocab.toSet
    val logp: Map[String, Double] =
      probs.iterator.filter(_._2 > 0.0)
        .map { case (s, p) => s -> math.log(p) }.toMap
    val NegInf = Double.NegativeInfinity
    def lse(a: Double, b: Double): Double =
      if (a == NegInf) b
      else if (b == NegInf) a
      else if (a >= b) a + math.log1p(math.exp(b - a))
      else b + math.log1p(math.exp(a - b))
    val counts = scala.collection.mutable.HashMap.empty[String, Double]
    words.foreach { case (w, n) =>
      val L = w.length
      val alpha = new Array[Double](L + 1)
      val beta = new Array[Double](L + 1)
      java.util.Arrays.fill(alpha, NegInf)
      java.util.Arrays.fill(beta, NegInf)
      alpha(0) = 0.0; beta(L) = 0.0
      var i = 1
      while (i <= L) {
        var s = NegInf
        var l = 1
        while (l <= maxPieceLen && l <= i) {
          val piece = w.substring(i - l, i)
          if (inVocab(piece)) logp.get(piece).foreach { lp =>
            if (alpha(i - l) != NegInf) s = lse(s, alpha(i - l) + lp)
          }
          l += 1
        }
        alpha(i) = s
        i += 1
      }
      i = L - 1
      while (i >= 0) {
        var s = NegInf
        var l = 1
        while (l <= maxPieceLen && i + l <= L) {
          val piece = w.substring(i, i + l)
          if (inVocab(piece)) logp.get(piece).foreach { lp =>
            if (beta(i + l) != NegInf) s = lse(s, lp + beta(i + l))
          }
          l += 1
        }
        beta(i) = s
        i -= 1
      }
      val logZ = alpha(L)
      if (logZ != NegInf) {
        var j = 0
        while (j < L) {
          var l = 1
          while (l <= maxPieceLen && j + l <= L) {
            val piece = w.substring(j, j + l)
            if (inVocab(piece) && alpha(j) != NegInf && beta(j + l) != NegInf) {
              logp.get(piece).foreach { lp =>
                val mass = math.exp(alpha(j) + lp + beta(j + l) - logZ)
                if (mass > 0) counts(piece) = counts.getOrElse(piece, 0.0) + n * mass
              }
            }
            l += 1
          }
          j += 1
        }
      }
    }
    val tot = counts.valuesIterator.sum
    if (tot <= 0) probs
    else vocab.iterator.map(s => s -> (counts.getOrElse(s, 0.0) / tot)).toMap
  }

  private def wordChunks(w: String): Iterator[String] =
    if (w.length <= Bpe.MaxWordLen) Iterator.single(w)
    else w.grouped(Bpe.MaxWordLen)

  /** Log-prob floor for the per-char unknown fallback: far below any
    * fitted piece, so it is only chosen when no in-vocab path covers a
    * character — guaranteeing a Viterbi path for EVERY input. */
  private val UnkLogp = -1e4

  /** Viterbi best segmentation of one word (chunk). Tie-breaks are
    * fully deterministic: higher score, then FEWER pieces, then the
    * longer last piece. */
  private[operators] def encodeWord(w: String, m: Model): Vector[String] = {
    val L = w.length
    if (L == 0) return Vector.empty
    val bestScore = new Array[Double](L + 1)
    val bestPieces = new Array[Int](L + 1)
    val bestBack = new Array[Int](L + 1) // start index of winning last piece
    java.util.Arrays.fill(bestScore, Double.NegativeInfinity)
    bestScore(0) = 0.0
    var i = 1
    while (i <= L) {
      var l = 1
      val maxL = math.min(m.maxPieceLen, i)
      while (l <= maxL) {
        val piece = w.substring(i - l, i)
        val lp = m.logp.getOrElse(piece, if (l == 1) UnkLogp else Double.NegativeInfinity)
        if (lp > Double.NegativeInfinity && bestScore(i - l) > Double.NegativeInfinity) {
          val sc = bestScore(i - l) + lp
          val np = bestPieces(i - l) + 1
          val better = sc > bestScore(i) ||
            (sc == bestScore(i) && (np < bestPieces(i) ||
              (np == bestPieces(i) && l > i - bestBack(i))))
          if (better) {
            bestScore(i) = sc; bestPieces(i) = np; bestBack(i) = i - l
          }
        }
        l += 1
      }
      i += 1
    }
    val out = List.newBuilder[String]
    var pos = L
    val rev = scala.collection.mutable.ArrayBuffer.empty[String]
    while (pos > 0) { rev += w.substring(bestBack(pos), pos); pos = bestBack(pos) }
    out ++= rev.reverseIterator
    out.result().toVector
  }

  /** Distributed Viterbi encode — (doc_id, n_pieces, pieces_md5), the
    * same body-free digest contract as [[Bpe.encode]]. */
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
    * no document segments to more pieces than characters (the unigram
    * sanity bound — char fallback is the worst case). */
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
            if (pieces.mkString("") != w) ok = false
            if (pieces.length > w.length) bounded = false
          }
          (ok, bounded)
        }
      }.toDF("ok", "bounded")
    rows.agg(count(lit(1)).as("n_docs"),
      coalesce(bool_and(col("ok")), lit(true)).as("roundtrip_ok"),
      coalesce(bool_and(col("bounded")), lit(true)).as("piece_bound_ok"))
  }
  /** Persist the piece table to the plain-parquet lake layout (the
    * [[Bpe.save]] contract: train once, encode in any session). Log
    * probabilities are doubles and round-trip parquet exactly, so the
    * loaded model's Viterbi segmentations are bit-identical. */
  def save(model: Model, dir: String, spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    model.logp.toSeq.map { case (p, lp) => (p, lp, model.maxPieceLen) }
      .toDF("piece", "logp", "max_piece_len")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/pieces")
  }

  /** Load a piece table persisted by [[save]]. */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String): Model = {
    import spark.implicits._
    val rows = spark.read.parquet(s"$dir/pieces")
      .as[(String, Double, Int)].collect()
    require(rows.nonEmpty, s"no unigram model at $dir")
    Model(rows.map(r => r._1 -> r._2).toMap, rows.head._3)
  }
}

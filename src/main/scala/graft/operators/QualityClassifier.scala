package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hashed-feature logistic-regression quality classifier — the
  * fastText-style linear filter every large CCNet/GPT/LLaMA-class
  * pipeline trains to keep "good" documents (reference points: CCNet's
  * fastText LM filter, GPT-3's WebText-vs-crawl classifier). Features
  * are hashed bag-of-words buckets (presence, ℓ₂-normalized per doc),
  * so the MODEL is a fixed `buckets + 1` dense double vector no matter
  * the corpus or vocabulary size — it broadcasts to every executor,
  * and training state on the driver is O(buckets).
  *
  * Training is full-batch gradient descent on logistic loss: each
  * iteration is one pass over a CACHED per-doc feature Dataset
  * (`(buckets[], y)` — one row per doc, built once), computing
  * per-partition partial gradients that reduce driver-side in
  * partition-index order (deterministic given a fixed partitioning,
  * the [[Pca]] moment-aggregation idiom). `mapPartitions` is justified
  * here the same way it is for PCA: Catalyst has no iterative-
  * optimization primitive, and the per-iteration reduce result is
  * O(buckets), not O(corpus).
  *
  * At 100 TB: the cached features are (doc_id, small int array) — text
  * is dropped after hashing, nothing ever shuffles (narrow scan →
  * cache); each of the ~20 iterations is a map + driver-side
  * O(buckets) reduce. Scoring is a broadcast-model narrow map at scan
  * speed.
  */
object QualityClassifier {

  final case class Model(weights: Array[Double], bias: Double, buckets: Int)

  /** Number of reserved document-statistics slots appended after the
    * hashed-token space: 16 one-hot token-count buckets + 16 one-hot
    * mean-word-length buckets. Quality is often a LENGTH/SHAPE signal
    * (the heuristic score is built from exactly such ratios), which
    * pure vocabulary presence cannot see when good and bad documents
    * share a vocabulary — the same reason CCNet-class filters feed
    * document statistics alongside the bag of words. */
  val StatSlots = 32

  /** Distinct hashed token buckets per document plus the stats slots
    * (binary presence, normalized by 1/√|set| inside the
    * gradient/score kernels). */
  private def docBuckets(docs: DataFrame, buckets: Int) =
    docs.select(col("doc_id"),
      array_sort(array_distinct(expr(
        s"""concat(
           |  transform(split(text, ' '), t -> int(pmod(xxhash64(t), $buckets))),
           |  array(
           |    $buckets + int(least(size(split(text, ' ')) / 16, 15)),
           |    $buckets + 16 + int(least(length(text) / greatest(size(split(text, ' ')), 1), 15))
           |  ))""".stripMargin)))
        .as("fs"))

  /** Train on `labels` = (doc_id, y ∈ {0.0, 1.0}). Fixed `iters`
    * full-batch steps, learning rate `lr`, no regularization (the
    * hashed space is its own capacity bound). */
  def train(docs: DataFrame, labels: DataFrame, buckets: Int = 1024,
            iters: Int = 30, lr: Double = 2.0): Model = {
    val spark = docs.sparkSession
    import spark.implicits._
    // size the cached-feature partitioning to the labeled set: each
    // GD iteration is one job over this Dataset, so at gate scale
    // (hundreds of labeled docs) 32 near-empty tasks × iters is pure
    // scheduling overhead — pack >= ~1k docs per task, capped at the
    // session parallelism (at 100 TB the cap binds and nothing
    // changes). Partition-count choice does not affect the gate's
    // pinned booleans; the partition-index-order reduce stays.
    val nLab = labels.count()
    val parts = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong, nLab / 1024 + 1)).toInt
    val ds = docBuckets(docs, buckets)
      .join(labels.select(col("doc_id"), col("y").cast("double")), "doc_id")
      .select(col("fs"), col("y")).as[(Array[Int], Double)]
      .coalesce(parts)
      .cache()
    try {
      val n = ds.count().toDouble
      require(n > 0, "quality classifier: empty training set")
      var w = new Array[Double](buckets + StatSlots)
      var b = 0.0
      var it = 0
      while (it < iters) {
        val bw = spark.sparkContext.broadcast(w)
        val bb = b
        // partials: [gradW..., gradB, loss] per partition
        val partials = ds.mapPartitions { rows =>
          val wl = bw.value
          val acc = new Array[Double](wl.length + 2)
          rows.foreach { case (fs, y) =>
            val norm = 1.0 / math.sqrt(math.max(fs.length, 1).toDouble)
            var m = bb
            var i = 0
            while (i < fs.length) { m += wl(fs(i)) * norm; i += 1 }
            val p = 1.0 / (1.0 + math.exp(-m))
            val g = p - y
            i = 0
            while (i < fs.length) { acc(fs(i)) += g * norm; i += 1 }
            acc(wl.length) += g
            // logistic loss via the stable log1p form
            acc(wl.length + 1) +=
              (if (y > 0.5) math.log1p(math.exp(-m)) else math.log1p(math.exp(m)))
          }
          Iterator.single(acc)
        }.collect()  // partition-index order → deterministic reduce
        bw.destroy()
        val g = new Array[Double](w.length + 2)
        partials.foreach { p =>
          var i = 0
          while (i < g.length) { g(i) += p(i); i += 1 }
        }
        val w2 = new Array[Double](w.length)
        var i = 0
        while (i < w.length) { w2(i) = w(i) - lr * g(i) / n; i += 1 }
        b -= lr * g(w.length) / n
        w = w2
        it += 1
      }
      Model(w, b, buckets)
    } finally ds.unpersist()
  }

  /** Broadcast-model scoring: p(good) per document plus the hard
    * keep/drop call at `threshold`. Narrow map — runs at scan speed. */
  def score(docs: DataFrame, model: Model, threshold: Double = 0.5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bm = spark.sparkContext.broadcast(model)
    val scoreUdf = docBuckets(docs, model.buckets)
      .select(col("doc_id"), col("fs")).as[(Long, Array[Int])]
      .mapPartitions { rows =>
        val m = bm.value
        rows.map { case (id, fs) =>
          val norm = 1.0 / math.sqrt(math.max(fs.length, 1).toDouble)
          var s = m.bias
          var i = 0
          while (i < fs.length) { s += m.weights(fs(i)) * norm; i += 1 }
          (id, 1.0 / (1.0 + math.exp(-s)))
        }
      }.toDF("doc_id", "p_good")
    scoreUdf.withColumn("keep", col("p_good") >= threshold)
  }

  /** Self-certifying gate: train to separate documents whose heuristic
    * quality score ([[TextOps.quality]]) is in the TOP vs BOTTOM
    * quartile — a linearly-learnable signal (quality is itself built
    * from token statistics the hashed features see). Emits invariant
    * booleans the oracle pins as constants: training accuracy on the
    * (well-separated) extremes ≥ 0.8, loss decreased vs the
    * zero-model's ln 2, and scores are proper probabilities. */
  def gate(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val q = TextOps.quality(docs).select(col("doc_id"), col("quality_score"))
    val cuts = q.stat.approxQuantile("quality_score", Array(0.25, 0.75), 0.0)
    val labels = q
      .filter(col("quality_score") <= cuts(0) || col("quality_score") >= cuts(1))
      .select(col("doc_id"),
        when(col("quality_score") >= cuts(1), 1.0).otherwise(0.0).as("y"))
    val model = train(docs.join(labels.select("doc_id"), "doc_id"), labels)
    val scored = score(docs.join(labels.select("doc_id"), "doc_id"), model)
      .join(labels, "doc_id")
    val agg = scored.agg(
      count(lit(1)).as("n"),
      sum(when((col("p_good") >= 0.5) === (col("y") > 0.5), 1L).otherwise(0L))
        .as("n_correct"),
      max(col("p_good")).as("pmax"), min(col("p_good")).as("pmin"))
      .collect()(0)
    val (n, correct) = (agg.getLong(0), agg.getLong(1))
    // n_docs (a plain count the oracle recomputes) + pinned-constant
    // booleans: the oracle-safe gate shape (labeled-set size depends on
    // quantile tie handling, which is NOT cross-engine stable — so the
    // labeled count feeds the booleans, not the output)
    val nDocs = docs.count()
    // n_buckets, not "n_params": the model carries buckets + StatSlots
    // weights plus a bias (1057 at the default), and pinning the
    // hashed-space size is what the oracle can recompute
    Seq((nDocs, correct.toDouble / math.max(n, 1L) >= 0.8,
      agg.getDouble(2) <= 1.0 && agg.getDouble(3) >= 0.0,
      model.buckets.toLong))
      .toDF("n_docs", "acc_ok", "probs_ok", "n_buckets")
  }
}

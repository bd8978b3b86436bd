package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Principal-component analysis over the embedding column — the
  * whitening / dimensionality-reduction stage a large-scale embedding
  * pipeline runs before clustering or indexing (SemDeDup whitens before
  * cosine; PQ codebooks train better in decorrelated space; 64→k
  * projection cuts ANN scan cost k/64).
  *
  * Scale shape, the classic two-phase split:
  *
  *  - MOMENTS are distributed: one `mapPartitions` pass accumulates
  *    (n, Σx, Σxxᵀ) per partition — d + d² doubles of local state — and
  *    one reduce folds them. The corpus is touched ONCE; nothing but
  *    the 33 KB moment block moves.
  *  - The EIGENSOLVE is driver work on the d×d covariance (power
  *    iteration with Gram–Schmidt deflation, fixed iteration count,
  *    deterministic start vectors, sign fixed by the largest-magnitude
  *    coordinate) — O(k·iters·d²) flops, microseconds at d=64, zero
  *    cluster involvement, exactly like the IVF/PQ codebook fits.
  *  - PROJECTION is a narrow broadcast map: (x − μ)ᵀQ per row, no
  *    shuffle.
  *
  * Double accumulation order varies with partitioning, so the model is
  * deterministic only to fp tolerance — which is why the driver-visible
  * query is a GATE ([[gate]]): orthonormality, eigenvalue ordering, the
  * top-k ≥ k/d·trace mass bound, and the eigenpair residual all hold to
  * tolerances that dwarf accumulation noise. (Same policy as the ANN
  * recall gates: the operator's invariants are checkable even where its
  * raw floats are not.) */
object Pca {

  final case class Model(mean: Array[Double], components: Array[Array[Double]],
                         eigenvalues: Array[Double], totalVariance: Double,
                         n: Long) extends Serializable

  private def toVecs(embeddings: DataFrame): Dataset[(Long, Array[Double])] =
    Similarity.toVecs(embeddings)

  /** Fit mean + top-`k` principal components. One distributed pass for
    * the moments; the d×d eigensolve runs on the driver. */
  def fit(embeddings: DataFrame, k: Int = 8, iters: Int = 200): Model = {
    val vecs = toVecs(embeddings)
    val moments = vecs.rdd.mapPartitions { it =>
      var cnt = 0L
      var sum: Array[Double] = null
      var outer: Array[Double] = null
      it.foreach { case (_, v) =>
        if (sum == null) { sum = new Array[Double](v.length); outer = new Array[Double](v.length * v.length) }
        var i = 0
        while (i < v.length) {
          sum(i) += v(i)
          var j = 0
          val base = i * v.length
          while (j < v.length) { outer(base + j) += v(i) * v(j); j += 1 }
          i += 1
        }
        cnt += 1
      }
      if (cnt == 0) Iterator.empty else Iterator.single((cnt, sum, outer))
    }.collect().reduceOption[(Long, Array[Double], Array[Double])] { (a, b) =>
      val s = a._2.clone(); val o = a._3.clone()
      var i = 0
      while (i < s.length) { s(i) += b._2(i); i += 1 }
      var j = 0
      while (j < o.length) { o(j) += b._3(j); j += 1 }
      (a._1 + b._1, s, o)
    }
    val (n, s, ss) = moments.getOrElse(throw new IllegalArgumentException(
      "PCA over an empty embedding corpus"))
    if (n < 2) throw new IllegalArgumentException(
      s"PCA needs at least 2 vectors for a sample covariance (got $n)")
    val d = s.length
    val mean = s.map(_ / n)
    // covariance C = (Σxxᵀ − n μμᵀ) / (n − 1)
    val c = new Array[Double](d * d)
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) {
        c(i * d + j) = (ss(i * d + j) - n * mean(i) * mean(j)) / math.max(n - 1, 1).toDouble
        j += 1
      }
      i += 1
    }
    def matVec(v: Array[Double]): Array[Double] = {
      val out = new Array[Double](d)
      var i = 0
      while (i < d) {
        var acc = 0.0
        var j = 0
        val base = i * d
        while (j < d) { acc += c(base + j) * v(j); j += 1 }
        out(i) = acc
        i += 1
      }
      out
    }
    def dotv(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def normalize(v: Array[Double]): Array[Double] = {
      val nrm = math.sqrt(dotv(v, v))
      if (nrm == 0) v else v.map(_ / nrm)
    }
    val comps = new Array[Array[Double]](math.min(k, d))
    val eigs = new Array[Double](comps.length)
    var m = 0
    while (m < comps.length) {
      // deterministic start: basis vector m plus a small uniform mix so
      // a start orthogonal to the target cannot stall the iteration
      var v = normalize(Array.tabulate(d)(j => (if (j == m) 1.0 else 0.0) + 1e-3))
      var it = 0
      while (it < iters) {
        var w = matVec(v)
        // Gram–Schmidt deflation against already-extracted components
        var p = 0
        while (p < m) {
          val proj = dotv(w, comps(p))
          var j = 0
          while (j < d) { w(j) -= proj * comps(p)(j); j += 1 }
          p += 1
        }
        v = normalize(w)
        it += 1
      }
      // sign convention: largest-|coordinate| (lowest index on ties) positive
      var best = 0
      var j = 1
      while (j < d) { if (math.abs(v(j)) > math.abs(v(best))) best = j; j += 1 }
      if (v(best) < 0) v = v.map(-_)
      comps(m) = v
      eigs(m) = dotv(v, matVec(v))
      m += 1
    }
    val trace = (0 until d).map(i => c(i * d + i)).sum
    Model(mean, comps, eigs, trace, n)
  }

  /** Project every vector onto the model's components: (vec_id,
    * projection[k]) — a narrow broadcast map, no shuffle. */
  def project(embeddings: DataFrame, model: Model): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    toVecs(Similarity.spread(embeddings)).mapPartitions { it =>
      val mdl = bc.value
      it.map { case (id, v) =>
        val centered = new Array[Double](v.length)
        var i = 0
        while (i < v.length) { centered(i) = v(i) - mdl.mean(i); i += 1 }
        val proj = mdl.components.map { q =>
          var acc = 0.0; var j = 0
          while (j < q.length) { acc += centered(j) * q(j); j += 1 }
          acc
        }
        (id, proj)
      }
    }.toDF("vec_id", "projection")
  }

  /** One-row driver gate over the fitted model's invariants (the
    * raw floats have no cross-engine oracle; these do):
    *
    *  - `orthonormal_ok`: max |QᵀQ − I| below 1e-8 — deflation kept the
    *    basis orthonormal.
    *  - `ordered_ok`: eigenvalues non-increasing (1e-9·trace slack).
    *  - `explained_ok`: Σ top-k Rayleigh ≥ 0.98·(k/d)·trace. The top-k
    *    eigenvalue mass of ANY covariance is ≥ k/d of the trace (each
    *    top eigenvalue ≥ the mean), so a converged solver must clear
    *    this with the slack absorbing isotropic-spectrum fp noise.
    *  - `residual_ok`: the DISTRIBUTED projection agrees with the
    *    driver model — Var(projectionᵢ) over the corpus must equal the
    *    i-th Rayleigh eigenvalue (mathematically exact: Var(Xqᵢ) =
    *    qᵢᵀCqᵢ), to 1e-3 relative tolerance. This is the end-to-end
    *    check that the broadcast/centering/projection plumbing computes
    *    what the model says it computes. */
  def gate(embeddings: DataFrame, k: Int = 8, iters: Int = 200): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val model = fit(embeddings, k, iters)
    val d = model.mean.length
    val q = model.components
    var orthoErr = 0.0
    for (i <- q.indices; j <- q.indices) {
      val dot = q(i).zip(q(j)).map { case (a, b) => a * b }.sum
      orthoErr = math.max(orthoErr, math.abs(dot - (if (i == j) 1.0 else 0.0)))
    }
    val ordered = model.eigenvalues.zip(model.eigenvalues.drop(1))
      .forall { case (a, b) => a >= b - 1e-9 * model.totalVariance }
    val explained = model.eigenvalues.sum >=
      0.98 * (q.length.toDouble / d) * model.totalVariance
    // residual needs C again — recompute from a second bounded pass is
    // wasteful; instead check against the projected corpus: for each
    // component, Var(proj_i) must equal its Rayleigh eigenvalue.
    val projVar = project(embeddings, model)
      .select(posexplode(col("projection")).as(Seq("i", "p")))
      .groupBy("i").agg(count(lit(1)).as("n"), sum(col("p")).as("s"),
        sum(col("p") * col("p")).as("ss"))
      .select(col("i"), ((col("ss") - col("s") * col("s") / col("n")) /
        (col("n") - lit(1.0))).as("v"))
      .as[(Int, Double)].collect().toMap
    val residual = q.indices.forall { i =>
      math.abs(projVar(i) - model.eigenvalues(i)) <=
        1e-3 * math.max(model.totalVariance / d, model.eigenvalues(i))
    }
    Seq((model.n, d.toLong, q.length.toLong, orthoErr < 1e-8, ordered,
      explained, residual))
      .toDF("n", "d", "k", "orthonormal_ok", "ordered_ok", "explained_ok",
        "residual_ok")
  }
}

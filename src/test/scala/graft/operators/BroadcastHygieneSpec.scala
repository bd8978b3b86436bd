package graft.operators

import graft.SparkSpec
import org.apache.spark.graftprobe.BroadcastProbe

/** Broadcast lifecycle hygiene for the blocked matrix scans: corpus
  * blocks must not outlive their scan. r7 flagged that each blocked
  * scan left its (up to ~50 MB) per-block broadcasts alive until an
  * eventual GC, so a 119-query census session accumulated them — the
  * prime suspect for the driver bench's cross-query degradation. */
class BroadcastHygieneSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, dim: Int) = {
    val rnd = new scala.util.Random(7)
    (0 until n).map { i =>
      val v = Array.fill(dim)(rnd.nextGaussian())
      val norm = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v.map(x => (x / norm).toFloat))
    }.toDF("vec_id", "embedding")
  }

  /** Poll (gc + ContextCleaner latency) until broadcasts created after
    * `exclude` shrink under `maxBytes`, or fail after ~15s. */
  private def assertBroadcastsDrain(exclude: Set[Long], maxBytes: Long): Unit = {
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    var bytes = BroadcastProbe.liveBroadcastBytes(exclude)
    while (bytes > maxBytes && System.nanoTime() < deadline) {
      System.gc()
      Thread.sleep(200)
      bytes = BroadcastProbe.liveBroadcastBytes(exclude)
    }
    assert(bytes <= maxBytes,
      s"$bytes bytes of new broadcast blocks still live (cap $maxBytes)")
  }

  test("blocked brute-force scan destroys its corpus-block broadcasts") {
    val emb = vecs(600, 128) // 4 blocks x ~150 KB at blockRows=150
    val before = BroadcastProbe.liveBroadcastIds()
    val out = Similarity.bruteForceTopKFor(emb, emb, k = 3, blockRows = 150)
    assert(out.count() == 600 * 3)
    // one leaked block is ~150 KB; task binaries GC away under the poll
    assertBroadcastsDrain(before, maxBytes = 100 * 1024)
  }

  test("blocked threshold scan destroys its corpus-block broadcasts") {
    val emb = vecs(600, 128)
    val before = BroadcastProbe.liveBroadcastIds()
    val out = Similarity.thresholdPairsFor(emb, emb, threshold = 0.3, blockRows = 150)
    assert(out.count() >= 0)
    assertBroadcastsDrain(before, maxBytes = 100 * 1024)
  }

  test("blocked scan results are unchanged by the block count") {
    val emb = vecs(120, 16)
    val one = Similarity.bruteForceTopKFor(emb, emb, k = 4, blockRows = 100000)
      .orderBy("query_id", "rank").collect()
    val many = Similarity.bruteForceTopKFor(emb, emb, k = 4, blockRows = 25)
      .orderBy("query_id", "rank").collect()
    assert(one.sameElements(many))
  }
}

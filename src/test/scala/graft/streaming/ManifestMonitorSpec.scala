package graft.streaming

import graft.SparkSpec
import graft.operators.Validate
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

object ManifestMonitorSpec {
  case class Doc(doc_id: Long, text: String, source: String, n_chars: Long)
}

/** Streaming manifest: stream ≡ the one-shot Validate.manifest over
  * any batch split, and the XOR self-inverse hazard is contained by
  * the versioned replay discipline. */
class ManifestMonitorSpec extends SparkSpec {
  import spark.implicits._
  import ManifestMonitorSpec.Doc

  private val batch1 = Seq(
    Doc(1L, "alpha beta gamma", "web", 16L),
    Doc(2L, "delta", "web", 5L),
    Doc(3L, "epsilon zeta", "forum", 12L))
  private val batch2 = Seq(
    Doc(4L, "eta theta", "web", 9L),
    Doc(5L, "iota", "forum", 4L))

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap

  test("two streamed batches fold to the one-shot manifest") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-mm").toString
    val mem = MemoryStream[Doc]
    val q = ManifestMonitor.run(mem.toDF(), s"$dir/state", s"$dir/ckpt",
      Trigger.ProcessingTime(0))
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    val store = new StateStore(spark, s"$dir/state")
    val streamed = asMap(store.read().get)
    val oneShot = asMap(Validate.manifest((batch1 ++ batch2).toDF()))
    assert(streamed == oneShot)
    assert(store.versions.size == 2, "one version per micro-batch")
  }

  test("replay law: a re-merged batch rebuilds its version, never double-XORs") {
    val v0 = ManifestMonitor.merge(None,
      ManifestMonitor.batchManifest(batch1.toDF()))
    val v1 = ManifestMonitor.merge(Some(v0),
      ManifestMonitor.batchManifest(batch2.toDF()))
    // replaying batch2 from the PRE-batch state reproduces v1 exactly
    val replay = ManifestMonitor.merge(Some(v0),
      ManifestMonitor.batchManifest(batch2.toDF()))
    assert(asMap(replay) == asMap(v1))
    // the naive path (merging batch2 onto v1 again) CANCELS batch2's
    // checksum — the spec documents why the versioned discipline exists
    val naive = ManifestMonitor.merge(Some(v1),
      ManifestMonitor.batchManifest(batch2.toDF()))
    val webNaive = asMap(naive)("web")
    val webTrue = asMap(v1)("web")
    assert(webNaive._5 != webTrue._5, "double-merge must visibly corrupt")
  }

  test("checksum is batch-split-proof: any partition of the docs folds equal") {
    val all = batch1 ++ batch2
    val oneShot = asMap(ManifestMonitor.merge(None,
      ManifestMonitor.batchManifest(all.toDF())))
    for (cut <- 1 until all.size) {
      val (a, b) = all.splitAt(cut)
      val folded = asMap(ManifestMonitor.merge(
        Some(ManifestMonitor.merge(None, ManifestMonitor.batchManifest(a.toDF()))),
        ManifestMonitor.batchManifest(b.toDF())))
      assert(folded == oneShot, s"cut at $cut")
    }
  }
}

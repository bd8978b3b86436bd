package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

object QualityMonitorSpec {
  case class Doc(doc_id: Long, text: String, source: String)
}

/** Streaming corpus-quality monitor: stream ≡ batch over any split,
  * bounded histogram shape, replay rebuilds its version. */
class QualityMonitorSpec extends SparkSpec {
  import spark.implicits._
  import QualityMonitorSpec.Doc

  private val batch1 = Seq(
    Doc(1L, "the quick brown fox jumps over a lazy dog near the bank", "web"),
    Doc(2L, "spam spam spam spam spam spam", "web"),
    Doc(3L, "a of to in is it and the mixed tokens here now", "forum"))
  private val batch2 = Seq(
    Doc(4L, "fresh second batch content with plenty of distinct words", "web"),
    Doc(5L, "x", "forum"))

  private def hist(docs: Seq[Doc]) =
    QualityMonitor.batchHistogram(docs.toDF())
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap

  test("two streamed batches fold to the one-shot histogram") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-qm").toString
    val mem = MemoryStream[Doc]
    val q = QualityMonitor.run(mem.toDF(), s"$dir/state", s"$dir/ckpt",
      Trigger.ProcessingTime(0))
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    val store = new StateStore(spark, s"$dir/state")
    val streamed = store.read().get.collect()
      .map(r => (r.getString(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(streamed == hist(batch1 ++ batch2))
    assert(store.versions.size == 2, "one version per micro-batch")
  }

  test("histogram shape: bins stay in 0..10, totals cover every document") {
    val h = hist(batch1 ++ batch2)
    assert(h.keys.forall { case (_, b) => b >= 0 && b <= 10 })
    assert(h.values.map(_._1).sum == 5L)
  }

  test("replaying a batch rebuilds its version from the pre-batch state") {
    // version 1 must be derivable as merge(version 0, hist(batch2)) —
    // the property the foreachBatch replay path relies on
    val v0 = QualityMonitor.merge(None, batch1.toDF()
      .transform(QualityMonitor.batchHistogram))
    val v1 = QualityMonitor.merge(Some(v0), batch2.toDF()
      .transform(QualityMonitor.batchHistogram))
    val v1replay = QualityMonitor.merge(Some(v0), batch2.toDF()
      .transform(QualityMonitor.batchHistogram))
    assert(v1.collect().toSet == v1replay.collect().toSet)
    assert(v1.collect().toSet ==
      QualityMonitor.merge(None, (batch1 ++ batch2).toDF()
        .transform(QualityMonitor.batchHistogram)).collect().toSet)
  }
}

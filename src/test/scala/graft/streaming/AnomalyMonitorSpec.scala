package graft.streaming

import graft.SparkSpec
import graft.operators.Analytics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

object AnomalyMonitorSpec {
  case class Ev(user_id: Long, event_id: Long, ts: java.sql.Timestamp,
                event_type: String)
}

/** Streaming anomaly monitor: stream ≡ batch over any split — even one
  * that cuts an hour in half — and the state stays bounded by
  * groups × observed hours. */
class AnomalyMonitorSpec extends SparkSpec {
  import spark.implicits._
  import AnomalyMonitorSpec.Ev

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
  private val hour = 3600L

  // 30 steady hours of 5 events then a 50-event spike hour; the split
  // point lands MID-hour-10, so the merge must sum partial hours.
  private val all: Seq[Ev] =
    ((0 until 30).flatMap(h => (0 until 5).map(i =>
      Ev(1L, h.toLong * 10 + i, ts(h * hour + i * 60), "click"))) ++
      (0 until 50).map(i => Ev(1L, 5000L + i, ts(30 * hour + i), "click")))
  private val (batch1, batch2) = all.splitAt(52)  // cuts hour 10 in two

  test("streamed hourly state answers the batch anomaly query identically") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-am").toString
    val mem = MemoryStream[Ev]
    val q = AnomalyMonitor.run(mem.toDF(), s"$dir/state", s"$dir/ckpt",
      Trigger.ProcessingTime(0))
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    val store = new StateStore(spark, s"$dir/state")
    val state = store.read().get
    // bounded state: one row per (type, observed hour)
    assert(state.count() == 31L)
    val streamed = AnomalyMonitor.report(state)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val batch = Analytics.countAnomalies(all.toDF())
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(streamed == batch && streamed.nonEmpty,
      "stream-maintained state must answer the batch query bit-for-bit")
    // and the planted spike is flagged in both
    assert(streamed.exists(r => r(1) == 30L && r(4) == true))
  }

  test("straddled hour sums exactly across the batch boundary") {
    val d1 = Analytics.hourlyCounts(batch1.toDF())
    val d2 = Analytics.hourlyCounts(batch2.toDF())
    val merged = AnomalyMonitor.merge(Some(
        AnomalyMonitor.merge(None, d1)), d2)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(merged(10L) == 5L, "hour 10 split across batches must sum to 5")
    assert(merged(30L) == 50L)
  }
}

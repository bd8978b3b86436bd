package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq((1L, "hello world"), (2L, "a" * 300)).toDF("doc_id", "text")
  }

  test("payloadMeta: byte length and digest over the binary column") {
    val rows = Multimodal.payloadMeta(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows == Map(1L -> 11L, 2L -> 300L))
  }

  test("decodeFeatures: batched decode keeps schema + determinism") {
    implicit val s = spark
    val out = Multimodal.decodeFeatures(
      Multimodal.mediaFromDocuments(docs), batchSize = 1).collect()
      .map(f => f.doc_id -> f).toMap
    assert(out(1L).n_bytes == 11 && out(1L).channels == 3)
    assert(out(1L).features.length == 8)
    assert(math.abs(out(1L).features.sum - 1.0f) < 1e-5) // normalized histogram
    // determinism across runs / batch sizes
    val again = Multimodal.decodeFeatures(
      Multimodal.mediaFromDocuments(docs), batchSize = 64).collect()
      .map(f => f.doc_id -> f).toMap
    assert(out(1L).features.toSeq == again(1L).features.toSeq)
  }

  test("sampleFrames: strided fixed-size frames, bounded by payload") {
    implicit val s = spark
    val frames = Multimodal.sampleFrames(
      Multimodal.mediaFromDocuments(docs), frameBytes = 32, stride = 4).collect()
    val byDoc = frames.groupBy(_.doc_id)
    assert(!byDoc.contains(1L))            // 11 bytes < one frame
    assert(byDoc(2L).map(_.frame_idx).sorted.toSeq == Seq(0, 4, 8)) // 9 frames, stride 4
    assert(byDoc(2L).forall(_.frame.length == 32))
  }

  test("resizePayload: truncate/pad to target") {
    implicit val s = spark
    val out = Multimodal.resizePayload(
      Multimodal.mediaFromDocuments(docs), target = 64).collect()
    assert(out.forall(_.payload.length == 64))
  }

  test("composition: media features feed similarity search (near-dup media found)") {
    implicit val s = spark
    import spark.implicits._
    // two identical payloads + one different → extracted features make
    // the duplicates each other's top neighbor
    val media = Seq((1L, "same media bytes"), (2L, "same media bytes"),
      (3L, "totally different other thing")).toDF("doc_id", "text")
    val feats = Multimodal.decodeFeatures(Multimodal.mediaFromDocuments(media))
      .select($"doc_id".as("vec_id"), $"features".as("embedding"))
    val top1 = Similarity.bruteForceTopK(feats, k = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(top1(1L) == 2L && top1(2L) == 1L)
  }
}

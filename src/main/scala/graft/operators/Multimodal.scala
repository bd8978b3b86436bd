package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: media as opaque
  * `binary` columns with typed metadata, decoded/feature-extracted in
  * batched partition-wise passes.
  *
  * Spark-side plumbing is real — schemas, batch shape, partitioning,
  * typed Datasets; the byte-level media decode itself is a STUB (the
  * container ships no image/audio codecs): `StubCodec.decode` derives
  * deterministic fake dimensions/features from the bytes. Swapping in a
  * real codec (e.g. TwelveMonkeys ImageIO on the executor classpath)
  * changes only that one function.
  *
  * Scale design: media bytes ride the scan as a single binary column —
  * never a join key, never shuffled (every op below is narrow until an
  * explicit aggregate). Decoders run `mapPartitions` with an internal
  * batch loop, the Scala analog of Arrow-batched `mapInPandas`:
  * per-batch amortized codec setup, bounded memory (`batchSize` rows in
  * flight), whole-partition locality.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, n_bytes: Long,
                                 width: Int, height: Int, channels: Int,
                                 features: Array[Float])
  final case class FrameSample(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Attach the opaque binary payload (in production: the image/audio
    * bytes column of the lake table; here: UTF-8 of `text`). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", col("text").cast("binary"))

  /** Metadata pass over the binary column — pure column expressions, no
    * decode: byte length and digest (dedup key for media). */
  def payloadMeta(docs: DataFrame): DataFrame =
    withPayload(docs).select(
      col("doc_id"),
      octet_length(col("payload")).cast("bigint").as("n_bytes"),
      md5(col("text")).as("payload_md5"))

  /** STUB deterministic "codec" — replace with a real decoder. */
  object StubCodec {
    /** ??? real decode goes here; deterministic fake keeps the
      * pipeline testable without codecs. */
    def decode(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      val n = payload.length
      val width = 16 + (n % 64)
      val height = 16 + ((n / 64) % 64)
      val channels = 3
      // 8-dim "embedding": byte-histogram moments, deterministic
      val feats = new Array[Float](8)
      var i = 0
      while (i < n) {
        feats(payload(i) & 7) += 1.0f
        i += 1
      }
      var j = 0
      while (j < 8) { feats(j) /= math.max(n, 1).toFloat; j += 1 }
      (width, height, channels, feats)
    }
  }

  /** Batched partition-wise decode + feature extraction. */
  def decodeFeatures(media: Dataset[MediaRecord], batchSize: Int = 64)
                    (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch: real codecs amortize setup here (Arrow-batch analog)
        batch.iterator.map { r =>
          val (w, h, c, f) = StubCodec.decode(r.payload)
          MediaFeatures(r.doc_id, r.payload.length.toLong, w, h, c, f)
        }
      }
    }
  }

  /** Frame sampling (video analog): every `stride`-th fixed-size slice
    * of the payload as a frame. Generator-style flatMap keeps peak
    * memory at one frame, not one video. */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int = 32,
                   stride: Int = 4)(implicit spark: SparkSession): Dataset[FrameSample] = {
    import spark.implicits._
    media.flatMap { r =>
      val nFrames = r.payload.length / frameBytes
      (0 until nFrames by stride).iterator.map { i =>
        FrameSample(r.doc_id, i,
          java.util.Arrays.copyOfRange(r.payload, i * frameBytes, (i + 1) * frameBytes))
      }
    }
  }

  /** "Resize" stub (image analog): truncate/pad payload to `target`
    * bytes — stands in for a decode→resize→re-encode partition pass. */
  def resizePayload(media: Dataset[MediaRecord], target: Int = 256)
                   (implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    media.map(r => MediaRecord(r.doc_id, java.util.Arrays.copyOf(r.payload, target)))
  }

  /** Typed view of documents as media records. */
  def mediaFromDocuments(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    withPayload(docs).select(col("doc_id"), col("payload")).as[MediaRecord]
  }
}

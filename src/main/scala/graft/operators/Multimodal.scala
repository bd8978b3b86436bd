package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: media as opaque
  * `binary` columns with typed metadata, decoded/feature-extracted in
  * batched partition-wise passes.
  *
  * Spark-side plumbing is real — schemas, batch shape, partitioning,
  * typed Datasets. The byte-level decode is REAL for images
  * ([[ImageCodec]], JDK `javax.imageio` PNG/JPEG), audio
  * ([[decodeAudioMeta]], JDK `javax.sound.sampled` WAV PCM), and
  * MJPEG video ([[VideoCodec]] container split + per-frame JPEG
  * decode); [[StubCodec]] remains the honest deterministic stand-in
  * only for containers/codecs the JDK cannot parse (H.264, VP9, …) —
  * swapping in a real codec changes only that one function.
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

  /** Real image decode via the JDK's own `javax.imageio` (PNG/JPEG
    * readers ship in every JRE — no external codec needed): dimensions,
    * band count, and per-band mean intensity (normalized to 0–1) as the
    * feature vector. Payloads that are not a decodable image fall back
    * to [[StubCodec]] — which remains the honest stand-in for VIDEO
    * only (no container/codec in the JDK). */
  object ImageCodec {
    def isPng(b: Array[Byte]): Boolean =
      b.length > 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'
    def isJpeg(b: Array[Byte]): Boolean =
      b.length > 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff
    def isImage(b: Array[Byte]): Boolean = isPng(b) || isJpeg(b)

    /** Decode to (width, height, bands, per-band mean/255). Returns
      * None when ImageIO cannot parse the payload. */
    def decode(payload: Array[Byte]): Option[(Int, Int, Int, Array[Float])] = {
      if (!isImage(payload)) return None
      // NonFatal, not just IOException: ImageIO readers throw unchecked
      // exceptions on corrupt bodies behind valid magic bytes (broken
      // ICC profiles → CMMException, malformed chunk lengths →
      // NegativeArraySizeException) — any of them must mean "not an
      // image", not a 4x-retried task failure
      val img = try {
        Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      } catch { case scala.util.control.NonFatal(_) => None }
      img.map { im =>
        val r = im.getRaster
        val (w, h, c) = (im.getWidth, im.getHeight, r.getNumBands)
        val sums = new Array[Double](c)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var b = 0
            while (b < c) { sums(b) += r.getSample(x, y, b); b += 1 }
            x += 1
          }
          y += 1
        }
        (w, h, c, sums.map(s => (s / (w.toDouble * h) / 255.0).toFloat))
      }
    }

    /** Band-interleaved 8-bit sample bytes of a decoded image — the
      * codec-independent pixel view [[decodeImageMeta]] digests. */
    def sampleBytes(im: java.awt.image.BufferedImage): Array[Byte] = {
      val r = im.getRaster
      val (w, h, c) = (im.getWidth, im.getHeight, r.getNumBands)
      val out = new Array[Byte](w * h * c)
      var i = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var b = 0
          while (b < c) { out(i) = r.getSample(x, y, b).toByte; i += 1; b += 1 }
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** REAL video decode within JDK limits — the MJPEG (Motion-JPEG)
    * container family, where a stream is a sequence of complete JPEG
    * images back-to-back (the format MJPEG-over-HTTP cameras and
    * MJPEG-in-AVI streams carry). The JDK ships no video framework,
    * but it DOES ship a JPEG codec — so the container layer
    * (frame-boundary parsing) implemented here turns video decode into
    * per-frame [[ImageCodec]] work, all real bytes end to end.
    * Arbitrary containers/codecs (H.264, VP9, …) remain [[StubCodec]]'s
    * honestly-documented territory. */
  object VideoCodec {
    /** Split a concatenated-JPEG (MJPEG) payload into its complete
      * JPEG frames by walking the actual JPEG segment structure —
      * scanning for the next `FF D8` would misfire on those bytes
      * inside entropy-coded data, so each frame is walked segment by
      * segment: marker segments skip by their declared big-endian
      * length; after SOS the entropy stream is scanned byte-wise where
      * `FF 00` is a stuffed data byte and `FF D0–D7` are restart
      * markers (both stay inside the scan), any other `FF xx` returns
      * to segment parsing, and `FF D9` (EOI) closes the frame. A
      * malformed tail yields the frames parsed so far — decode health
      * is monitorable as n_frames vs n_decoded downstream. */
    def splitJpegFrames(payload: Array[Byte]): Seq[Array[Byte]] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      val n = payload.length
      def u(i: Int): Int = payload(i) & 0xff
      var pos = 0
      while (pos + 3 < n && u(pos) == 0xff && u(pos + 1) == 0xd8) {
        val start = pos
        pos += 2
        var end = -1
        var ok = true
        while (ok && end < 0) {
          if (pos + 1 >= n || u(pos) != 0xff) ok = false
          else u(pos + 1) match {
            case 0xd9 => end = pos + 2                       // EOI
            case 0xd8 | 0x01 => pos += 2                     // standalone
            case m if m >= 0xd0 && m <= 0xd7 => pos += 2     // RSTn
            case 0xda =>                                     // SOS
              if (pos + 3 >= n) ok = false
              else {
                pos += 2 + ((u(pos + 2) << 8) | u(pos + 3))  // scan header
                // entropy-coded data: FF 00 stuffed, FF D0-D7 restart
                var done = false
                while (!done && ok) {
                  if (pos + 1 >= n) ok = false
                  else if (u(pos) != 0xff) pos += 1
                  else u(pos + 1) match {
                    case 0x00 => pos += 2
                    case m if m >= 0xd0 && m <= 0xd7 => pos += 2
                    case _ => done = true                    // next marker
                  }
                }
              }
            case _ =>                                        // sized segment
              if (pos + 3 >= n) ok = false
              else pos += 2 + ((u(pos + 2) << 8) | u(pos + 3))
          }
        }
        if (end < 0) return out.toSeq                        // malformed tail
        out += java.util.Arrays.copyOfRange(payload, start, end)
        pos = end
      }
      out.toSeq
    }
  }

  /** Deterministic fake "codec" — the honest stand-in for payloads the
    * JDK cannot decode (non-MJPEG video containers; arbitrary binary).
    * Image payloads take the real [[ImageCodec]] path; MJPEG video
    * takes the real [[VideoCodec]] + per-frame [[ImageCodec]] path. */
  object StubCodec {
    /** Deterministic fake decode for non-image payloads (the video
      * stand-in); [[ImageCodec.decode]] is the real path. */
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

  /** Batched partition-wise decode + feature extraction: real
    * `javax.imageio` decode for PNG/JPEG payloads, deterministic stub
    * for everything else (the video stand-in). */
  def decodeFeatures(media: Dataset[MediaRecord], batchSize: Int = 64)
                    (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch: real codecs amortize setup here (Arrow-batch analog)
        batch.iterator.map { r =>
          val (w, h, c, f) =
            ImageCodec.decode(r.payload).getOrElse(StubCodec.decode(r.payload))
          MediaFeatures(r.doc_id, r.payload.length.toLong, w, h, c, f)
        }
      }
    }
  }

  /** Deterministic grayscale-PNG encode of each document's leading
    * `width`-aligned text bytes — the fixture builder that gives the
    * decode path REAL images to chew on (the corpus ships no media
    * column): pixel (x, y) = byte `y·width + x`, 8-bit gray, lossless
    * by PNG's contract. Documents shorter than one row are dropped.
    * Emits (doc_id, payload) with a genuine PNG byte stream. */
  def encodePng(docs: DataFrame, width: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val h = bytes.length / width
          if (h == 0) None
          else {
            val img = new java.awt.image.BufferedImage(
              width, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            img.getRaster.setDataElements(0, 0, width, h,
              java.util.Arrays.copyOf(bytes, width * h))
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            Some((id, bos.toByteArray))
          }
        }
      }.toDF("doc_id", "payload")
  }

  /** Real-decode metadata pass: parse each payload with `javax.imageio`
    * and emit (doc_id, width, height, channels, px_md5) where px_md5
    * digests the decoded band-interleaved 8-bit samples — for a
    * lossless gray PNG built by [[encodePng]], byte-identical to the
    * source text bytes, which is what makes the whole decode loop
    * oracle-checkable in SQL. Rows whose payload fails to parse are
    * dropped (count the difference upstream to monitor codec health). */
  def decodeImageMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, payload) =>
          // NonFatal: corrupt-body payloads drop rather than kill tasks
          val img = try {
            Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
          } catch { case scala.util.control.NonFatal(_) => None }
          img.map { im =>
            md.reset()
            val digest = md.digest(ImageCodec.sampleBytes(im))
              .map("%02x".format(_)).mkString
            (id, im.getWidth.toLong, im.getHeight.toLong,
              im.getRaster.getNumBands.toLong, digest)
          }
        }
      }.toDF("doc_id", "width", "height", "channels", "px_md5")
  }

  /** Perceptual average-hash (aHash) of each decoded image — the
    * classic 64-bit image fingerprint: average-pool the decoded
    * grayscale grid onto 8×8 cells, bit (r, c) set iff its cell's mean
    * exceeds the global pixel mean. All-integer decision (cell_sum ·
    * n_total > total_sum · n_cell — exact cross-multiplication, no
    * float division), over the REAL `javax.imageio` decode, so the
    * hash is a pure deterministic function of the payload. Images
    * smaller than the 8×8 grid (either dimension < 8) drop — too
    * little signal to pool. Emits (doc_id, ahash, width, height).
    *
    * This is the image-modality entry into the dedup family: exact
    * dedup compares `ahash` equality, near-dup goes through
    * [[imageNearDupPairs]]'s banded Hamming join — the same pipeline
    * shape text uses with SimHash, over decoded pixels instead of
    * token streams. */
  def imageAHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val img = try {
            Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
          } catch { case scala.util.control.NonFatal(_) => None }
          img.filter(im => im.getWidth >= 8 && im.getHeight >= 8).map { im =>
            val w = im.getWidth; val h = im.getHeight
            val raster = im.getRaster
            val cellSum = Array.ofDim[Long](8, 8)
            val cellCnt = Array.ofDim[Long](8, 8)
            var total = 0L
            var y = 0
            while (y < h) {
              val cy = math.min(7, y * 8 / h)
              var x = 0
              while (x < w) {
                val cx = math.min(7, x * 8 / w)
                val v = raster.getSample(x, y, 0).toLong
                cellSum(cy)(cx) += v
                cellCnt(cy)(cx) += 1
                total += v
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h
            var hash = 0L
            var r = 0
            while (r < 8) {
              var c = 0
              while (c < 8) {
                // cell mean > global mean, compared exactly in integers
                if (cellSum(r)(c) * n > total * cellCnt(r)(c))
                  hash |= 1L << (r * 8 + c)
                c += 1
              }
              r += 1
            }
            (id, hash, w.toLong, h.toLong)
          }
        }
      }.toDF("doc_id", "ahash", "width", "height")
  }

  /** Image near-duplicate pairs by aHash Hamming distance — the
    * multimodal mirror of [[Dedup.simHashPairs]]: candidates from the
    * pigeonhole banded equi-join over the 64-bit fingerprint (a pair
    * within `maxDist` must match one of maxDist+1 blocks exactly),
    * exact popcount verify. Emits (a, b, dist). */
  def imageNearDupPairs(media: DataFrame, maxDist: Int = 2): DataFrame =
    Dedup.hammingPairs(imageAHash(media).select("doc_id", "ahash"),
      "ahash", maxDist, bits = 64)

  /** Deterministic 8-bit-PCM WAV encode of each document's text bytes
    * — the audio-side fixture builder (mono, unsigned 8-bit, `sampleRate`
    * Hz; one byte per frame, so the data chunk IS the text bytes).
    * The JDK's `javax.sound.sampled` writes and reads WAV natively —
    * like [[encodePng]]/[[decodeImageMeta]], this makes the audio
    * decode loop REAL and oracle-checkable, leaving [[StubCodec]] as
    * the honest stand-in for video only. */
  def encodeWav(docs: DataFrame, sampleRate: Int = 8000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val fmt = new javax.sound.sampled.AudioFormat(
            sampleRate.toFloat, 8, 1, false, false) // unsigned 8-bit mono
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(bytes), fmt, bytes.length.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          (id, bos.toByteArray)
        }
      }.toDF("doc_id", "payload")
  }

  /** Real audio decode via `javax.sound.sampled`: parse each WAV
    * payload and emit format metadata plus the md5 of the decoded PCM
    * frames — for the lossless 8-bit PCM built by [[encodeWav]],
    * byte-identical to the source text bytes (the SQL-oracle hook).
    * Non-parsing payloads drop, same contract as
    * [[decodeImageMeta]]. */
  def decodeAudioMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, payload) =>
          val ais = try {
            Option(javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(payload)))
          } catch { case scala.util.control.NonFatal(_) => None }
          ais.map { a =>
            val fmt = a.getFormat
            val pcm = a.readAllBytes()
            md.reset()
            val digest = md.digest(pcm).map("%02x".format(_)).mkString
            (id, fmt.getSampleRate.toLong, fmt.getChannels.toLong,
              fmt.getSampleSizeInBits.toLong,
              pcm.length.toLong / math.max(fmt.getFrameSize, 1), digest)
          }
        }
      }.toDF("doc_id", "sample_rate", "channels", "bits", "n_frames", "pcm_md5")
  }

  /** Energy-window audio fingerprint over the REAL decoded PCM — the
    * audio twin of [[imageAHash]]: split the decoded frame stream into
    * 64 equal windows, bit w set iff window w's mean sample value
    * exceeds the global mean (exact integer cross-multiplication, no
    * float division). Deterministic function of the payload; clips
    * shorter than 64 frames drop. Emits (doc_id, afp, n_frames).
    * Because [[encodeWav]]'s 8-bit PCM is lossless over the source
    * bytes, the fingerprint is SQL-expressible over the text itself —
    * a direct oracle, no pinning needed. Near-dup pairs go through the
    * same banded Hamming join as SimHash/aHash
    * ([[audioNearDupPairs]]). */
  def audioFingerprint(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val ais = try {
            Option(javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(payload)))
          } catch { case scala.util.control.NonFatal(_) => None }
          ais.map(_.readAllBytes()).filter(_.length >= 64).map { pcm =>
            val n = pcm.length
            val winSum = new Array[Long](64)
            val winCnt = new Array[Long](64)
            var total = 0L
            var f = 0
            while (f < n) {
              val w = (f.toLong * 64 / n).toInt
              val v = (pcm(f) & 0xff).toLong // unsigned 8-bit samples
              winSum(w) += v
              winCnt(w) += 1
              total += v
              f += 1
            }
            var afp = 0L
            var w = 0
            while (w < 64) {
              if (winSum(w) * n > total * winCnt(w)) afp |= 1L << w
              w += 1
            }
            (id, afp, n.toLong)
          }
        }
      }.toDF("doc_id", "afp", "n_frames")
  }

  /** Audio near-duplicate pairs by fingerprint Hamming distance —
    * [[Dedup.hammingPairs]] over [[audioFingerprint]]. */
  def audioNearDupPairs(media: DataFrame, maxDist: Int = 2): DataFrame =
    Dedup.hammingPairs(
      audioFingerprint(media).select(col("doc_id"), col("afp")),
      "afp", maxDist, bits = 64)

  /** Deterministic MJPEG encode of each document's text bytes — the
    * video-side fixture builder completing the modality set
    * ([[encodePng]] images, [[encodeWav]] audio): consecutive
    * `width`×`frameH` byte tiles of the text become 8-bit gray frames,
    * each REALLY JPEG-encoded by `javax.imageio`, concatenated into
    * one Motion-JPEG stream per document. Documents shorter than one
    * frame drop. Emits (doc_id, payload) with a genuine multi-frame
    * MJPEG byte stream. */
  def encodeMjpeg(docs: DataFrame, width: Int = 16, frameH: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val frameBytes = width * frameH
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val nFrames = bytes.length / frameBytes
          if (nFrames == 0) None
          else {
            val bos = new java.io.ByteArrayOutputStream()
            var f = 0
            while (f < nFrames) {
              val img = new java.awt.image.BufferedImage(
                width, frameH, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
              img.getRaster.setDataElements(0, 0, width, frameH,
                java.util.Arrays.copyOfRange(bytes,
                  f * frameBytes, (f + 1) * frameBytes))
              javax.imageio.ImageIO.write(img, "jpg", bos)
              f += 1
            }
            Some((id, bos.toByteArray))
          }
        }
      }.toDF("doc_id", "payload")
  }

  /** Real video decode: split each MJPEG payload into frames
    * ([[VideoCodec.splitJpegFrames]] — actual JPEG segment walking),
    * decode EVERY frame with `javax.imageio`, and emit
    * (doc_id, n_frames, n_decoded, width, height, uniform_geometry):
    * container frame count, how many frames the image codec parsed,
    * the first decoded frame's dimensions, and a bit pinning that
    * every frame decoded to the same geometry with one gray band.
    * JPEG is lossy, so pixel VALUES are certified in the spec (mean
    * absolute error bound against the source tile), while this
    * driver-facing pass emits the structural facts a SQL oracle can
    * derive from the source text exactly. Payloads with zero
    * parseable frames drop. */
  def decodeVideoMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val frames = VideoCodec.splitJpegFrames(payload)
          val decoded = frames.flatMap { fb =>
            try Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(fb)))
            catch { case scala.util.control.NonFatal(_) => None }
          }
          decoded.headOption.map { first =>
            val (w, h) = (first.getWidth.toLong, first.getHeight.toLong)
            val uniform = decoded.forall(im => im.getWidth.toLong == w &&
              im.getHeight.toLong == h && im.getRaster.getNumBands == 1)
            (id, frames.length.toLong, decoded.length.toLong, w, h, uniform)
          }
        }
      }.toDF("doc_id", "n_frames", "n_decoded", "width", "height", "uniform_geometry")
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

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

  test("ImageCodec: real PNG decode — exact dimensions, bands, means") {
    // 4×2 gray image with known pixel values → known mean
    val img = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val px = Array(0, 51, 102, 153, 204, 255, 0, 51).map(_.toByte)
    img.getRaster.setDataElements(0, 0, 4, 2, px)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val payload = bos.toByteArray
    assert(Multimodal.ImageCodec.isPng(payload))
    val Some((w, h, c, feats)) = Multimodal.ImageCodec.decode(payload)
    assert((w, h, c) == (4, 2, 1))
    val expectedMean = px.map(_ & 0xff).sum / 8.0 / 255.0
    assert(math.abs(feats(0) - expectedMean) < 1e-6)
    // non-image payloads are not claimed by the image path
    assert(Multimodal.ImageCodec.decode("plain text".getBytes).isEmpty)
  }

  test("decodeFeatures dispatches: real decode for PNG, stub for other bytes") {
    implicit val s = spark
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(3, 3,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, 3, 3, Array.fill[Byte](9)(100))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val media = Seq(Multimodal.MediaRecord(1L, bos.toByteArray),
      Multimodal.MediaRecord(2L, "not an image".getBytes)).toDS()
    val out = Multimodal.decodeFeatures(media).collect().map(f => f.doc_id -> f).toMap
    assert(out(1L).width == 3 && out(1L).height == 3 && out(1L).channels == 1)
    assert(math.abs(out(1L).features(0) - 100 / 255.0f) < 1e-6)
    assert(out(2L).channels == 3, "non-image payload takes the stub path")
  }

  test("ImageCodec: JPEG decodes through the real path (lossy values, exact dims)") {
    val img = new java.awt.image.BufferedImage(8, 4,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, 8, 4, Array.tabulate[Byte](32)(i => (i * 8).toByte))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val payload = bos.toByteArray
    assert(Multimodal.ImageCodec.isJpeg(payload) && !Multimodal.ImageCodec.isPng(payload))
    val Some((w, h, c, feats)) = Multimodal.ImageCodec.decode(payload)
    assert((w, h, c) == (8, 4, 1), "JPEG is lossy in values, exact in dimensions")
    // mean within JPEG quantization slack of the source mean
    val srcMean = (0 until 32).map(_ * 8).sum / 32.0 / 255.0
    assert(math.abs(feats(0) - srcMean) < 0.1, s"${feats(0)} vs $srcMean")
  }

  test("corrupt image bodies behind valid magic fall back instead of killing tasks") {
    implicit val s = spark
    import spark.implicits._
    // PNG magic + garbage body: passes isPng, must not throw anywhere
    val corrupt = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      Array.fill[Byte](64)(0x41)
    assert(Multimodal.ImageCodec.isPng(corrupt))
    assert(Multimodal.ImageCodec.decode(corrupt).isEmpty)
    val media = Seq(Multimodal.MediaRecord(1L, corrupt)).toDS()
    val out = Multimodal.decodeFeatures(media).collect()
    assert(out.length == 1 && out(0).channels == 3, "must take the stub path")
    val meta = Multimodal.decodeImageMeta(media.toDF("doc_id", "payload")).collect()
    assert(meta.isEmpty, "unparseable payloads drop from the decode-meta pass")
  }

  test("encodePng → decodeImageMeta: lossless loop, digest matches source bytes") {
    val out = Multimodal.decodeImageMeta(Multimodal.encodePng(docs)).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(1L), "sub-row documents are dropped")
    val r2 = out(2L)
    assert(r2.getLong(1) == 16 && r2.getLong(2) == 300 / 16 && r2.getLong(3) == 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = md.digest(("a" * (16 * (300 / 16))).getBytes)
      .map("%02x".format(_)).mkString
    assert(r2.getString(4) == expected, "decoded pixels must be the source bytes")
  }

  test("encodeWav → decodeAudioMeta: lossless PCM loop, format metadata exact") {
    import spark.implicits._
    val audio = Seq((1L, "hello pcm world"), (2L, "x")).toDF("doc_id", "text")
    val out = Multimodal.decodeAudioMeta(Multimodal.encodeWav(audio)).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getLong(1) == 8000L && r1.getLong(2) == 1L && r1.getLong(3) == 8L)
    assert(r1.getLong(4) == "hello pcm world".length.toLong)
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = md.digest("hello pcm world".getBytes)
      .map("%02x".format(_)).mkString
    assert(r1.getString(5) == expected, "decoded PCM must be the source bytes")
    assert(out(2L).getLong(4) == 1L)   // single-byte payloads round-trip too
  }

  test("decodeAudioMeta: non-WAV payloads drop instead of killing tasks") {
    import spark.implicits._
    val junk = Seq((1L, Array[Byte](1, 2, 3, 4)),
      (2L, "RIFFgarbageWAVEnotreally".getBytes)).toDF("doc_id", "payload")
    assert(Multimodal.decodeAudioMeta(junk).collect().isEmpty)
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
  test("imageAHash: deterministic, duplicate-invariant, near-dup discriminating") {
    import spark.implicits._
    val base = ("the quick brown fox jumps over the lazy dog again and again " * 4)
    val far = ("zzz aaa qqq mmm xxx 000 111 222 333 444 555 666 777 888 999 " * 4)
    val d = Seq(1L -> base, 2L -> base, 3L -> (base.dropRight(2) + "xy"),
      4L -> far).toDF("doc_id", "text")
    val hashed = Multimodal.imageAHash(Multimodal.encodePng(d))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(hashed(1L) == hashed(2L), "identical images must hash equal")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hashed(1L), hashed(3L)) < ham(hashed(1L), hashed(4L)),
      s"tail-edited image must be nearer than unrelated: $hashed")
    // sub-8x8 image (short doc) drops rather than hashing noise
    val short = Multimodal.imageAHash(Multimodal.encodePng(
      Seq(9L -> "tiny").toDF("doc_id", "text")))
    assert(short.count() == 0)
  }

  test("imageNearDupPairs: banded join equals the all-pairs filter") {
    import spark.implicits._
    val base = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do " * 4)
    val d = (1L to 8L).map { i =>
      i -> (if (i <= 4) base else base.replace("lorem", s"v$i" * 3))
    }.toDF("doc_id", "text")
    val banded = Multimodal.imageNearDupPairs(Multimodal.encodePng(d), maxDist = 3)
      .as[(Long, Long, Long)].collect().toSet
    val hashed = Multimodal.imageAHash(Multimodal.encodePng(d))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r._2)
    val brute = (for {
      (a, ha) <- hashed; (b, hb) <- hashed if a < b
      dist = java.lang.Long.bitCount(ha ^ hb).toLong if dist <= 3
    } yield (a, b, dist)).toSet
    assert(banded == brute, s"banded=$banded brute=$brute")
    assert(brute.nonEmpty, "fixture should produce at least one near pair")
  }

  test("encodeMjpeg → splitJpegFrames → decode: real MJPEG loop, frame-exact") {
    import spark.implicits._
    // 3 full 16x8 frames + a 37-byte tail that must not become a frame
    val text = ("the quick brown fox jumps over the lazy dog " * 10).take(3 * 128 + 37)
    val d = Seq(1L -> text, 2L -> "short").toDF("doc_id", "text")
    val enc = Multimodal.encodeMjpeg(d).as[(Long, Array[Byte])].collect().toMap
    assert(!enc.contains(2L), "sub-frame doc must drop")
    val payload = enc(1L)
    // the container really is concatenated JPEGs: split by segment
    // walking finds exactly 3 complete frames, each independently
    // decodable by the stock JDK reader at the declared geometry
    val frames = Multimodal.VideoCodec.splitJpegFrames(payload)
    assert(frames.length == 3, s"got ${frames.length} frames")
    assert(frames.forall(f => (f(0) & 0xff) == 0xff && (f(1) & 0xff) == 0xd8))
    assert(frames.map(_.length).sum == payload.length, "split must cover the stream")
    val bytes = text.getBytes("UTF-8")
    frames.zipWithIndex.foreach { case (fb, i) =>
      val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fb))
      assert(im.getWidth == 16 && im.getHeight == 8 &&
        im.getRaster.getNumBands == 1)
      // JPEG is lossy but close on smooth ASCII data: certify pixel
      // REALITY with a mean-absolute-error bound vs the source tile
      val src = bytes.slice(i * 128, (i + 1) * 128).map(_ & 0xff)
      val dec = Multimodal.ImageCodec.sampleBytes(im).map(_ & 0xff)
      val mae = src.zip(dec).map { case (s, v) => math.abs(s - v) }.sum / 128.0
      assert(mae <= 16.0, s"frame $i mean abs err $mae — decode not tracking source")
    }
    // the driver-facing pass agrees with the container ground truth
    val meta = Multimodal.decodeVideoMeta(Multimodal.encodeMjpeg(d))
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    assert(meta.toSeq == Seq((1L, 3L, 3L, 16L, 8L, true)), meta.toSeq.toString)
    // malformed tail: frames parsed so far survive, garbage drops
    val truncated = java.util.Arrays.copyOf(payload, frames(0).length + 10)
    assert(Multimodal.VideoCodec.splitJpegFrames(truncated).length == 1)
    assert(Multimodal.VideoCodec.splitJpegFrames("not a video".getBytes).isEmpty)
  }

  test("audioFingerprint: deterministic, duplicate-invariant, banded pairs == brute") {
    import spark.implicits._
    val base = ("pulse pulse quiet quiet PULSE PULSE silence silence " * 4)
    val d = Seq(1L -> base, 2L -> base, 3L -> (base.dropRight(3) + "end"),
      4L -> ("z" * 40)).toDF("doc_id", "text") // doc 4 < 64 frames -> drops
    val fp = Multimodal.audioFingerprint(Multimodal.encodeWav(d))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(!fp.contains(4L), "sub-64-frame clip must drop")
    assert(fp(1L) == fp(2L), "identical clips must fingerprint equal")
    val banded = Multimodal.audioNearDupPairs(Multimodal.encodeWav(d), maxDist = 3)
      .as[(Long, Long, Long)].collect().toSet
    val brute = (for {
      (a, ha) <- fp.toSeq; (b, hb) <- fp.toSeq if a < b
      dist = java.lang.Long.bitCount(ha ^ hb).toLong if dist <= 3
    } yield (a, b, dist)).toSet
    assert(banded == brute, s"banded=$banded brute=$brute")
    assert(brute.contains((1L, 2L, 0L)))
  }

}

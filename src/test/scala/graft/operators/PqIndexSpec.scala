package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** IVF-PQ lifecycle: packed-code determinism and LSM append/compact. */
class PqIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("append makes new vectors searchable; compact changes plans, not results") {
    val emb = Tables.load(spark, dir, "embeddings")
    val half1 = emb.filter(col("vec_id") % 2 === 0)
    val half2 = emb.filter(col("vec_id") % 2 =!= 0)

    val base = PqIndex.build(half1, nClusters = 8)
    val appended = PqIndex.append(base, half2)
    try {
      // full-corpus probes at full probe width so results are corpus-complete
      val rAppend = PqIndex.query(appended, emb, emb, k = 3, probes = 8)
        .select("query_id", "rank", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      // odd ids exist only in the delta segment — they must be findable
      assert(rAppend.exists(_._3 % 2 != 0),
        "no delta-segment vector ever surfaced as a neighbor")
      assert(rAppend.exists(_._3 % 2 == 0), "base segment lost")

      val compacted = PqIndex.compact(appended)
      val rCompact = PqIndex.query(compacted, emb, emb, k = 3, probes = 8)
        .select("query_id", "rank", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(rCompact == rAppend,
        s"compaction changed results: ${rCompact.diff(rAppend)} vs ${rAppend.diff(rCompact)}")
      compacted.close()
    } finally () // appended's segments are unpersisted by compact()
  }

  test("IVF-flat append/compact matches the PQ lifecycle contract") {
    val emb = Tables.load(spark, dir, "embeddings")
    val half1 = emb.filter(col("vec_id") % 2 === 0)
    val half2 = emb.filter(col("vec_id") % 2 =!= 0)
    val appended = IvfIndex.append(IvfIndex.build(half1, nClusters = 8), half2)
    try {
      val rAppend = IvfIndex.query(appended, emb, k = 3, probes = 8)
        .select("query_id", "rank", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(rAppend.exists(_._3 % 2 != 0), "delta vectors must be searchable")
      val compacted = IvfIndex.compact(appended)
      val rCompact = IvfIndex.query(compacted, emb, k = 3, probes = 8)
        .select("query_id", "rank", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(rCompact == rAppend, "compaction changed IVF results")
      compacted.close()
    } finally ()
  }

  test("streaming ingest: foreachBatch appends keep the index fresh per micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val emb = Tables.load(spark, dir, "embeddings")
    val half1 = emb.filter(col("vec_id") % 2 === 0)
    val half2rows = emb.filter(col("vec_id") % 2 =!= 0)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect()

    var idx = PqIndex.build(half1, nClusters = 8)
    val mem = MemoryStream[(Long, Array[Double])]
    val q = mem.toDF().toDF("vec_id", "embedding")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        idx = PqIndex.append(idx, batch)   // O(batch), quantizers frozen
      }.start()
    try {
      val (b1, b2) = half2rows.splitAt(half2rows.length / 2)
      mem.addData(b1.toSeq); q.processAllAvailable()
      mem.addData(b2.toSeq); q.processAllAvailable()

      assert(idx.deltas.size == 2, s"one delta segment per micro-batch, got ${idx.deltas.size}")
      val res = PqIndex.query(idx, emb, emb, k = 3, probes = 8)
        .select("neighbor_id").as[Long].collect().toSet
      assert(res.exists(_ % 2 != 0), "streamed vectors must be searchable")
      assert(res.exists(_ % 2 == 0), "base vectors lost")
    } finally { q.stop(); idx.close() }
  }

  test("native PqAdc equals the declarative HOF formulation bit-for-bit") {
    import spark.implicits._
    val m = 16; val ksub = 16
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { _ =>
      (rnd.nextLong(), Array.fill(m * ksub)(rnd.nextDouble() * 2 - 1))
    }.toDF("codes", "lut")
    val native = graft.functions.PqAdc(col("codes"), col("lut"), m, ksub)
    val hof = aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
      (acc, i) => acc + element_at(col("lut"),
        i * ksub + call_function("shiftrightunsigned", col("codes"), i * 4)
          .bitwiseAND(lit(15L)).cast("int") + 1))
    val diff = rows.select(native.as("a"), hof.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0, s"$diff/200 rows diverged between native and HOF ADC")
  }

  test("save/load round-trips both indexes: identical query results, restored layout") {
    val emb = Tables.load(spark, dir, "embeddings")
    val tmp = java.nio.file.Files.createTempDirectory("graft-idx").toString

    val ivf = IvfIndex.build(emb, nClusters = 8)
    IvfIndex.save(ivf, s"$tmp/ivf")
    val ivf2 = IvfIndex.load(spark, s"$tmp/ivf")
    try {
      val a = IvfIndex.query(ivf, emb, k = 3, probes = 8)
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      val b = IvfIndex.query(ivf2, emb, k = 3, probes = 8)
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      assert(a == b, "loaded IVF index must answer identically")
    } finally { ivf.close(); ivf2.close() }

    val pq = PqIndex.build(emb, nClusters = 8)
    PqIndex.save(pq, s"$tmp/pq")
    val pq2 = PqIndex.load(spark, s"$tmp/pq")
    try {
      assert(pq2.pq.m == pq.pq.m && pq2.pq.ksub == pq.pq.ksub &&
        pq2.pq.dsub == pq.pq.dsub && pq2.chunks == pq.chunks)
      val a = PqIndex.query(pq, emb, emb, k = 3, probes = 8)
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      val b = PqIndex.query(pq2, emb, emb, k = 3, probes = 8)
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      assert(a == b, "loaded IVF-PQ index must answer identically")
    } finally { pq.close(); pq2.close() }
  }

  test("tunedProbes finds a cheap operating point on a clustered corpus") {
    import spark.implicits._
    // tight orthogonal-axis clusters: a query's true neighbors live in
    // its own coarse list, so 1-2 probes of 10 already meet the bar —
    // the regime where the blind 60% default wastes ~0.5 corpus of ADC
    val clustered = (0 until 300).map { i =>
      val v = Array.fill(16)(0.0)
      v(i % 10) = 1.0
      v(10 + i % 6) = 0.05 * (i % 3)
      val n = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v.map(x => (x / n).toFloat))
    }.toDF("vec_id", "embedding")
    val index = PqIndex.build(clustered, nClusters = 10)
    try {
      val np = PqIndex.tunedProbes(index, clustered, k = 5, bar = 0.9,
        sampleQueries = 60)
      assert(np < math.ceil(10 * 0.6),
        s"tuning should beat the 60% default on tight clusters, got $np")
      // independent full-corpus certification of the tuned point
      val got = PqIndex.query(index, clustered, clustered, k = 5, probes = np)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = Similarity.bruteForceTopK(clustered, k = 5)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (got & exact).size.toDouble / exact.size
      assert(recall >= 0.9, s"tuned point recall $recall below bar")
    } finally index.close()
  }

  test("adaptive IVF-PQ entry falls back to the exact scan past break-even") {
    import spark.implicits._
    val vs = (0 until 40).map { i =>
      val v = Array.tabulate(16)(j => math.sin(i * 16 + j + 1).toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      (i.toLong, v.map(_ / n))
    }.toDF("vec_id", "embedding")
    // default probes (60% of lists) ≥ the 0.25 break-even → bit-for-bit
    // the exact blocked-scan result, without paying an index build
    val adaptive = PqIndex.adaptiveTopK(vs, k = 3)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val exact = Similarity.bruteForceTopK(vs, k = 3)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(adaptive == exact)
    // explicit low probe fraction (2 of 10 lists < 0.25) keeps the
    // engaged path: every query covered, k rows each
    val indexed = PqIndex.adaptiveTopK(vs, k = 3, nClusters = 10, probes = 2)
    assert(indexed.select("query_id").distinct().count() == 40)
  }

  test("packed 64-bit encoding is deterministic and self-consistent") {
    val pq = PqIndex.fitPq(Tables.load(spark, dir, "embeddings"))
    assert(pq.m == 16 && pq.ksub == 16 && pq.dsub == 4)
    val v = Array.tabulate(64)(i => math.sin(i + 1))
    val c1 = PqIndex.encodeOne(v, pq)
    val c2 = PqIndex.encodeOne(v.clone(), pq)
    assert(c1 == c2, "encode must be a pure function of the vector")
    // every nibble decodes to a valid codebook entry
    (0 until 16).foreach { s =>
      val code = ((c1 >>> (4 * s)) & 15L).toInt
      assert(code >= 0 && code < pq.codebooks(s).length)
    }
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Two-phase global-id assignment: equality with the single-reducer
  * window reference, contiguity, and reshuffle determinism. */
class IdsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) =
    (1 to n).map(i => (i.toLong * 7 % 1000, s"doc $i")).toDF("k", "body")
      // duplicate k values on purpose: the caller must tie-break
      .withColumn("uniq", monotonically_increasing_id())

  test("two-phase ids == single-window reference, contiguous 0..N-1") {
    val df = corpus(500)
    val keys = Seq(col("k"), col("uniq"))
    val fast = Ids.assignIds(df, keys, "id", parts = 8)
      .select(col("uniq"), col("id")).as[(Long, Long)].collect().toMap
    val ref = Ids.assignIdsGlobalWindow(df, keys, "id")
      .select(col("uniq"), col("id")).as[(Long, Long)].collect().toMap
    assert(fast == ref)
    assert(fast.values.toSeq.sorted == (0L until 500L))
  }

  test("ids are input-partitioning invariant") {
    val df = corpus(300)
    val keys = Seq(col("k"), col("uniq"))
    val a = Ids.assignIds(df.repartition(3), keys, "id", parts = 5)
      .select(col("uniq"), col("id")).as[(Long, Long)].collect().toMap
    val b = Ids.assignIds(df.repartition(11), keys, "id", parts = 5)
      .select(col("uniq"), col("id")).as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("more partitions than rows: still contiguous") {
    val df = corpus(5)
    val out = Ids.assignIds(df, Seq(col("uniq")), "id", parts = 16)
      .select(col("id")).as[Long].collect().sorted
    assert(out.toSeq == (0L until 5L))
  }

  test("balanced shards: totals differ by at most one maximal doc") {
    val rnd = new scala.util.Random(3)
    val docs = (1 to 400).map { i =>
      val n = 1 + rnd.nextInt(120)
      (i.toLong, Seq.fill(n)("w").mkString(" "))
    }.toDF("doc_id", "text")
    val out = Ids.balancedShards(docs, nShards = 8)
      .select("shard", "total_tokens").as[(Long, Long)].collect()
    assert(out.length == 8)
    val totals = out.map(_._2)
    assert(totals.max - totals.min <= 120L,
      s"imbalance ${totals.max - totals.min} exceeds max doc size")
    // conservation: stripe assignment loses no tokens
    assert(totals.sum ==
      docs.select(size(split(col("text"), " ")).cast("long")).as[Long]
        .collect().sum)
  }

  test("documentIds is the md5-permutation rank") {
    val docs = (1L to 50L).map(i => (i, s"t$i", "en", "web", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Ids.documentIds(docs)
      .as[(Long, Long)].collect().toMap
    val expect = (1L to 50L)
      .sortBy(i => (java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, i))
      .zipWithIndex.map { case (d, r) => d -> r.toLong }.toMap
    assert(got == expect)
  }

  test("ntileRank == NTILE window for every k, with ties and remainders") {
    import org.apache.spark.sql.expressions.Window
    // 97 rows (not divisible by most k), heavy value ties so the
    // tie-break column decides — equality must hold row-for-row
    val df = (1L to 97L).map(i => (i, i % 7)).toDF("id", "v")
    for (k <- Seq(1, 2, 5, 10, 13, 97, 200)) {
      val fast = Ids.ntileRank(df, Seq(col("v"), col("id")), k, "b")
        .select("id", "b").as[(Long, Int)].collect().toMap
      val ref = df.withColumn("b",
          ntile(k).over(Window.orderBy(col("v"), col("id"))))
        .select("id", "b").as[(Long, Int)].collect().toMap
      assert(fast == ref, s"k=$k")
    }
    // descending keys agree too
    val fd = Ids.ntileRank(df, Seq(col("v").desc, col("id")), 5, "b")
      .select("id", "b").as[(Long, Int)].collect().toMap
    val rd = df.withColumn("b",
        ntile(5).over(Window.orderBy(col("v").desc, col("id"))))
      .select("id", "b").as[(Long, Int)].collect().toMap
    assert(fd == rd)
  }

  test("ntileRankGrouped == partitioned NTILE window, uneven groups") {
    import org.apache.spark.sql.expressions.Window
    // three groups of very different sizes (1, 30, 120 rows) with
    // value ties; equality must hold per group, row-for-row
    val df = ((1L to 120L).map(i => ("big", i, i % 5)) ++
      (1L to 30L).map(i => ("mid", i, i % 3)) ++
      Seq(("one", 1L, 0L)))
      .toDF("g", "id", "v")
    for (k <- Seq(1, 4, 10, 50)) {
      val fast = Ids.ntileRankGrouped(df, Seq("g"),
          Seq(col("v"), col("id")), k, "b", parts = 7)
        .select("g", "id", "b").as[(String, Long, Int)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val ref = df.withColumn("b", ntile(k).over(
          Window.partitionBy(col("g")).orderBy(col("v"), col("id"))))
        .select("g", "id", "b").as[(String, Long, Int)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(fast == ref, s"k=$k")
    }
  }

  test("prefixSums == single-window running totals, reshuffle-proof, multi-col") {
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 400).map(i =>
      (i.toLong * 13 % 97, i.toLong % 5, i.toLong * 3 % 11))
      .toDF("k", "a", "b").withColumn("uniq", monotonically_increasing_id())
    val keys = Seq(col("k"), col("uniq"))
    val fast = Ids.prefixSums(df, keys, Seq("a", "b"), parts = 7)
      .select("uniq", "cum_a", "cum_b").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val w = Window.orderBy(keys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = df.withColumn("ca", sum(col("a")).over(w))
      .withColumn("cb", sum(col("b")).over(w))
      .select("uniq", "ca", "cb").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(fast == ref)
    val again = Ids.prefixSums(df.repartition(9), keys, Seq("a", "b"), parts = 4)
      .select("uniq", "cum_a", "cum_b").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(again == ref, "partitioning must not change the running totals")
  }

  test("prefixSumsGrouped == per-group window running totals, reshuffle-proof") {
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 300).map(i =>
      (s"g${i % 3}", i.toLong * 13 % 97, i.toLong % 7))
      .toDF("g", "k", "a").withColumn("uniq", monotonically_increasing_id())
    val keys = Seq(col("k"), col("uniq"))
    val fast = Ids.prefixSumsGrouped(df, Seq("g"), keys, Seq("a"), parts = 5)
      .select("uniq", "cum_a").as[(Long, Long)].collect().toMap
    val w = Window.partitionBy(col("g")).orderBy(keys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = df.withColumn("ca", sum(col("a")).over(w))
      .select("uniq", "ca").as[(Long, Long)].collect().toMap
    assert(fast == ref)
    val again = Ids.prefixSumsGrouped(df.repartition(11), Seq("g"), keys,
      Seq("a"), parts = 3)
      .select("uniq", "cum_a").as[(Long, Long)].collect().toMap
    assert(again == ref, "partitioning must not change the grouped totals")
  }

  test("prefixSums: parts far beyond distinct keys — offsets key by observed pid") {
    import org.apache.spark.sql.expressions.Window
    // heavy skew (3 distinct keys, 16 range partitions): offsets must
    // pair with the OBSERVED partition ids, never assume 0..k chaining
    val df = ((1 to 100).map(_ => 1L) ++ Seq(2L) ++ Seq(1000L))
      .toDF("k").withColumn("x", col("k") % 5)
      .withColumn("uniq", monotonically_increasing_id())
    val fast = Ids.prefixSums(df, Seq(col("k"), col("uniq")), Seq("x"), parts = 16)
      .select("uniq", "cum_x").as[(Long, Long)].collect().toMap
    val ref = df.withColumn("cum_x", sum(col("x")).over(
        Window.orderBy(col("k"), col("uniq"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("uniq", "cum_x").as[(Long, Long)].collect().toMap
    assert(fast == ref)
    assert(fast.size == 102, "no rows may be dropped by the offset join")
  }

  test("grouped forms keep NULL-group rows (null-safe offset join)") {
    import org.apache.spark.sql.expressions.Window
    // window/DuckDB treat NULL as a regular partition value; the
    // offset join must too (null-unsafe equality would drop the rows)
    val df = Seq[(String, Long, Long)](
      ("a", 1L, 3L), ("a", 2L, 1L), (null, 3L, 5L), (null, 4L, 2L),
      (null, 6L, 1L), ("b", 5L, 4L))
      .toDF("g", "id", "x")
    val fast = Ids.prefixSumsGrouped(df, Seq("g"), Seq(col("id")), Seq("x"),
        parts = 5)
      .select("id", "cum_x").as[(Long, Long)].collect().toMap
    val ref = df.withColumn("cum_x", sum(col("x")).over(
        Window.partitionBy(col("g")).orderBy(col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "cum_x").as[(Long, Long)].collect().toMap
    assert(fast == ref)
    assert(fast.size == 6, "NULL-group rows must survive")
    val fn = Ids.ntileRankGrouped(df, Seq("g"), Seq(col("id")), 2, "b", parts = 5)
      .select("id", "b").as[(Long, Int)].collect().toMap
    val rn = df.withColumn("b", ntile(2).over(
        Window.partitionBy(col("g")).orderBy(col("id"))))
      .select("id", "b").as[(Long, Int)].collect().toMap
    assert(fn == rn)
  }
}

package graft.functions

import graft.SparkSpec

class RegistrySpec extends SparkSpec {
  import spark.implicits._

  test("native expressions callable from SQL") {
    Registry.register(spark)
    Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .createOrReplaceTempView("vs")
    assert(spark.sql("SELECT graft_dot(a, b) FROM vs").as[Double].head() == 11.0)
    Seq("a b c d").toDF("text").createOrReplaceTempView("ts")
    assert(spark.sql("SELECT graft_word_shingles(text, 3) FROM ts")
      .as[Seq[String]].head() == Seq("a b c", "b c d"))
    val sh = spark.sql("SELECT graft_simhash(text) FROM ts").as[Long].head()
    assert(sh != 0L)
    // winnow with w=1 degenerates to the per-shingle hash set
    assert(spark.sql("SELECT size(graft_winnow(text, 3, 1)) FROM ts")
      .as[Int].head() == 2)
    assert(spark.sql("SELECT size(graft_hyperplane_buckets(a, 4, 3, 2)) FROM vs")
      .as[Int].head() == 4)
    // ADC with m=2 → 32-bit sub-codes: word 1<<32 → sub-codes (0, 1) →
    // lut[0·2+0] + lut[1·2+1] = 1.5 + 4.25
    Seq((1L << 32, Array(1.5, 2.0, 3.0, 4.25))).toDF("codes", "lut")
      .createOrReplaceTempView("pq")
    assert(spark.sql("SELECT graft_pq_adc(codes, lut, 2, 2) FROM pq")
      .as[Double].head() == 5.75)
  }

  test("UDAFs callable from SQL text match their DataFrame forms") {
    Registry.register(spark)
    val scores = Seq(
      ("g1", 1L, 0.9), ("g1", 2L, 0.7), ("g1", 3L, 0.95), ("g1", 4L, 0.7),
      ("g2", 5L, 0.1), ("g2", 6L, 0.4))
      .toDF("grp", "id", "score")
    scores.createOrReplaceTempView("scores")
    // top-k per group: SQL vs DataFrame aggregator, k=2; ties (0.7 at
    // ids 2,4) resolve id-asc identically in both
    val sqlTop = spark.sql(
      "SELECT grp, graft_topk(id, score, 2) AS top FROM scores GROUP BY grp")
      .as[(String, Seq[(Long, Double)])].collect().toMap
    val dfTop = scores.groupBy("grp")
      .agg(TopKAggregator.topK(2)($"id", $"score").as("top"))
      .as[(String, Seq[(Long, Double)])].collect().toMap
    assert(sqlTop == dfTop)
    assert(sqlTop("g1") == Seq((3L, 0.95), (1L, 0.9)))
    // heavy hitters: SQL vs DataFrame aggregator, k=2 over a skewed stream
    val terms = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c", "d"))
      .toDF("term")
    terms.createOrReplaceTempView("terms")
    val sqlHh = spark.sql(
      "SELECT graft_heavy_hitters(term, 2) AS hh FROM terms")
      .as[Seq[(String, Long)]].head()
    val dfHh = terms.agg(HeavyHitters.summary(2)($"term").as("hh"))
      .as[Seq[(String, Long)]].head()
    assert(sqlHh == dfHh)
    assert(sqlHh.map(_._1).contains("a"))  // the true heavy term survives
  }

  test("graft_quantile: SQL estimate obeys the sketch's rank bound") {
    Registry.register(spark)
    val vs = (0 until 4000).map(i => (i % 4, ((i * 7919) % 4000).toDouble))
    vs.toDF("grp", "v").createOrReplaceTempView("qvals")
    val rows = spark.sql(
      "SELECT grp, graft_quantile(v, 0.5, 64) AS med FROM qvals GROUP BY grp")
      .as[(Int, Double)].collect()
    assert(rows.length == 4)
    // per group (1000 uniform values): median estimate lands near the
    // middle — bound from the k=64 structure is a few percent of n
    rows.foreach { case (g, med) =>
      val inGroup = vs.filter(_._1 == g).map(_._2)
      val rank = inGroup.count(_ <= med)
      assert(math.abs(rank - inGroup.length / 2.0) <= 200,
        s"group $g: median estimate rank $rank of ${inGroup.length}")
    }
  }

  test("config args must be literals: column reference fails with a clear error") {
    Registry.register(spark)
    Seq(("a b c d", 3)).toDF("text", "n").createOrReplaceTempView("cfg")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_word_shingles(text, n) FROM cfg").collect()
    }
    assert(e.getMessage.contains("graft_word_shingles") &&
      e.getMessage.contains("literal"), e.getMessage)
    // foldable constant expressions still fold (1 + 2 is fine)
    assert(spark.sql("SELECT graft_word_shingles(text, 1 + 2) FROM cfg")
      .as[Seq[String]].head() == Seq("a b c", "b c d"))
  }

  test("q_sql_curation: SQL text and DataFrame path agree row-exact, plan-identical") {
    import org.apache.spark.sql.functions._
    Registry.register(spark)
    val docs = Seq(
      (1L, "en", "the cat sat on the mat and the dog ran off!"),
      (2L, "en", "the cat sat on the mat and the dog ran off?"),  // dup of 1 normalized
      (3L, "en", "a completely different tale of two cities in winter"),
      (4L, "es", "el perro y el gato en la casa de la abuela"),
      (5L, "es", "los ninos juegan en el parque que esta cerca"),
      (6L, "en", "it is a truth universally acknowledged that a single man"),
      (7L, "en", "short one"))
      .toDF("doc_id", "lang", "text")
    docs.createOrReplaceTempView("documents")
    val sqlOut = spark.sql(graft.SparkEntry.CurationSql)
    val df = {
      val n = docs.select(col("doc_id"), col("lang"), col("text"),
        trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "),
          " +", " ")).as("norm"))
      val canon = n.groupBy(md5(col("norm"))).agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      val t = n.join(canon, "doc_id")
        .select(col("doc_id"), col("lang"), split(col("text"), " ").as("toks"))
      val qual = t.select(col("doc_id"), col("lang"),
        (size(array_distinct(col("toks"))).cast("double") / size(col("toks")) * 0.5
          + size(filter(col("toks"), x => array_contains(
              array(Seq("the","a","of","and","to","in","is","it").map(lit): _*), x)))
            .cast("double") / size(col("toks")) * 0.2
          + least(lit(1.0), size(col("toks")).cast("double") / 100.0) * 0.3)
          .as("quality_score"))
      val top = qual.groupBy("lang")
        .agg(TopKAggregator.topK(8)(col("doc_id"), col("quality_score")).as("picks"))
      top.select(col("lang"), posexplode(col("picks")).as(Seq("pos", "pick")))
        .select(col("lang"), (col("pos") + 1).cast("bigint").as("rnk"),
          col("pick._1").as("doc_id"), col("pick._2").as("quality_score"))
    }
    val a = sqlOut.collect().map(_.toSeq).sortBy(_.toString).toSeq
    val b = df.collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(a.nonEmpty && a == b, s"SQL vs DataFrame rows diverged:\n$a\n$b")
    // normalized dedup really deduped (doc 2 is doc 1 modulo punctuation)
    assert(!a.exists(_(2) == 2L), "normalized duplicate leaked through canon")
    // plan identity: same physical operator skeleton from both entries
    def skeleton(d: org.apache.spark.sql.DataFrame): Seq[String] =
      d.queryExecution.executedPlan.collect { case p => p.getClass.getSimpleName }
    assert(skeleton(sqlOut) == skeleton(df),
      s"plan skeletons diverged:\n${skeleton(sqlOut)}\n${skeleton(df)}")
  }
}

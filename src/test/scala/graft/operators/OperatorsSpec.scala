package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Operator-level semantics the oracle can't see (invariants,
  * degenerate inputs, hashing properties). */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("revenue MV invariants: buckets sum to totals (randomized)") {
    // property over seeded random workloads (reference invariant by
    // construction of revenue-analytics.sql:50-58)
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val statuses = Seq("scheduled", "live", "finished")
      val ts = (1 to 40).map { i =>
        (i.toLong, 1L + rnd.nextInt(5), 1L,
          BigDecimal(850 + rnd.nextInt(1651)) / 100,
          statuses(rnd.nextInt(3)), java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
      }
      val t = ts.toDF("ticket_id", "movie_id", "user_id", "cost", "status", "purchased_at")
      val m = (1L to 5L).map(i => (i, s"m$i", java.sql.Timestamp.valueOf("2026-02-01 00:00:00"), 100))
        .toDF("movie_id", "title", "start_date", "duration_minutes")
      Revenue.movieRevenue(t, m).collect().foreach { r =>
        val rev = Seq("scheduled_revenue", "live_revenue", "finished_revenue")
          .map(c => BigDecimal(r.getDecimal(r.fieldIndex(c)))).sum
        val cnt = Seq("scheduled_tickets", "live_tickets", "finished_tickets")
          .map(c => r.getLong(r.fieldIndex(c))).sum
        assert(BigDecimal(r.getDecimal(r.fieldIndex("total_revenue"))) == rev)
        assert(r.getLong(r.fieldIndex("ticket_count")) == cnt)
      }
    }
  }

  test("shingles: known n-grams, short docs give empty array") {
    val out = TextOps.withShingles(docs(1L -> "a b c d", 2L -> "x y"), 3)
      .select("doc_id", "shingles").as[(Long, Seq[String])].collect().toMap
    assert(out(1L) == Seq("a b c", "b c d"))
    assert(out(2L).isEmpty)
  }

  test("shingles are distinct (repeated n-grams collapse)") {
    val out = TextOps.withShingles(docs(1L -> "a b a b a b"), 3)
      .select("shingles").as[Seq[String]].head()
    assert(out == Seq("a b a", "b a b"))
  }

  test("normalized dedup collapses case/punctuation/whitespace variants") {
    val d = docs(
      1L -> "Hello,  World!",
      2L -> "hello world",
      3L -> "HELLO ... world",
      4L -> "goodbye world")
    val out = Dedup.exactNormalized(d)
      .select("doc_id", "canonical_id", "is_dup")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == (1L, 1L, false))
    assert(out(2L) == (2L, 1L, true) && out(3L) == (3L, 1L, true))
    assert(out(4L) == (4L, 4L, false))
    // raw exact sees them all as distinct
    assert(Dedup.exact(d).filter(col("is_dup")).count() == 0)
  }

  test("exact dedup maps duplicates to min doc_id") {
    val out = Dedup.exact(docs(1L -> "same", 2L -> "same", 3L -> "other"))
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 1L, false), (2L, 1L, true), (3L, 3L, false)))
  }

  test("ngram jaccard: identical docs score 1.0, disjoint docs absent") {
    val out = Dedup.ngramJaccard(docs(
      1L -> "a b c d e", 2L -> "a b c d e", 3L -> "p q r s t"), threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("setSimJoin equals ngramJaccard: prefix filtering loses no pairs") {
    // corpus engineered so one shingle ("the common phrase x") is shared
    // by most docs (highest df — should land in almost no prefix) while
    // true near-dup pairs differ by one token; plus an exact duplicate,
    // a disjoint doc, and a too-short doc (empty shingle set).
    val d = docs(
      1L -> "the common phrase x alpha beta gamma delta",
      2L -> "the common phrase x alpha beta gamma epsilon",
      3L -> "the common phrase x alpha beta gamma delta",
      4L -> "p q r s t u v w",
      5L -> "too short",
      6L -> "the common phrase x totally different tail here now ok")
    for (tau <- Seq(0.3, 0.5, 0.8)) {
      val brute = Dedup.ngramJaccard(d, threshold = tau)
        .as[(Long, Long, Double)].collect().toSet
      val pruned = Dedup.setSimJoin(d, threshold = tau)
        .as[(Long, Long, Double)].collect().toSet
      assert(pruned == brute, s"tau=$tau")
    }
    // sanity: the exact-dup pair is present with jaccard 1.0 at tau=0.5
    val at5 = Dedup.setSimJoin(d, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(at5.contains((1L, 3L, 1.0)))
  }

  test("count-min gate: verdicts hold and counts are exact on a known stream") {
    val d = docs(
      1L -> "x x x x x y y z",
      2L -> "x y z w v u t s",
      3L -> "a b c d e f g h")
    val out = Sketches.countMinGate(d, probeTerms = 10)
      .as[(Long, Boolean, Boolean, Long)].head()
    // 16 distinct terms, probe cap 10; 24 tokens total
    assert(out == ((10L, true, true, 24L)))
    // uncapped probes cover the whole vocabulary
    val full = Sketches.countMinGate(d, probeTerms = 1000)
      .as[(Long, Boolean, Boolean, Long)].head()
    assert(full == ((16L, true, true, 24L)))
  }

  test("gopher rules: each rule rejects independently; good doc kept") {
    val good = (1 to 60).map(i => s"word$i").mkString(" ") + " the a of"
    val short = "the a of and to tiny"                       // < minTokens
    val longWords = (1 to 60).map(i => "w" * 12 + i).mkString(" ") + " the a" // mean len > 10
    val numeric = (1 to 60).map(i => i.toString).mkString(" ") + " the a"    // alpha frac < 0.8
    val noStops = (1 to 60).map(i => s"word$i").mkString(" ")                // < 2 stopwords
    val out = TextOps.gopherRules(docs(
      1L -> good, 2L -> short, 3L -> longWords, 4L -> numeric, 5L -> noStops))
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> false, 4L -> false, 5L -> false))
  }

  test("keepBest: component representative is the highest-quality member") {
    // docs 1,2,3 are one near-dup component; 3 has the richest tail
    // (highest distinct ratio + stopwords) so it should be kept; 4 alone
    val d = docs(
      1L -> "a b c d e f g h a b c d e f g h",
      2L -> "a b c d e f g h a b c d e f g h x",
      3L -> "a b c d e f g h the of and to in is it q r s t u v w",
      4L -> "z1 z2 z3 z4 z5 z6 z7 z8")
    val base = Dedup.dedupPipeline(d, threshold = 0.3)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r._2).toMap
    val out = Dedup.keepBestPipeline(d, threshold = 0.3)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    // same component structure as dedupPipeline…
    val comp13 = base(1L)
    if (base(3L) == comp13) {
      // …but the kept member maximizes quality, not minimizes id
      val q = TextOps.quality(d).select("doc_id", "quality_score")
        .as[(Long, Double)].collect().toMap
      val members = base.collect { case (id, c) if c == comp13 => id }
      val best = members.maxBy(id => (q(id), -id))
      members.foreach { id =>
        assert(out(id)._2 == best && out(id)._3 == (id != best))
      }
    }
    assert(out(4L) == (4L, 4L, false))
  }

  test("simhash: identical texts agree; hamming grows with divergence") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val out = Dedup.simHash(docs(
      1L -> base, 2L -> base,
      3L -> base.replace("fox", "cat"),
      4L -> "completely different words entirely unrelated content here"))
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(out(1L) == out(2L))
    assert(ham(out(1L), out(3L)) < ham(out(1L), out(4L)))
  }

  test("simhash pairs: near-duplicates found, distant pairs excluded") {
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16"
    val pairs = Dedup.simHashPairs(docs(
      1L -> base, 2L -> base, 3L -> "z1 z2 z3 z4 z5 z6 z7 z8"), maxDist = 3)
      .select("a", "b").as[(Long, Long)].collect()
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("brute-force ANN: duplicated vector is its twin's top neighbor") {
    val vs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)), (2L, Array(1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)), (4L, Array(0.6f, 0.8f, 0.0f)))
      .toDF("vec_id", "embedding")
    val top1 = Similarity.bruteForceTopK(vs, 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(top1(1L) == 2L && top1(2L) == 1L)
  }

  test("dot product expression equals the HOF formulation") {
    val vs = Seq((1L, Array(0.1f, -0.2f, 0.3f)), (2L, Array(-0.4f, 0.5f, 0.6f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val pair = vs.as("x").join(vs.as("y"), col("x.vec_id") < col("y.vec_id"))
    val native = pair.select(Similarity.dot(col("x.v"), col("y.v"))).as[Double].head()
    val hof = pair.select(
      aggregate(zip_with(col("x.v"), col("y.v"), (a, b) => a * b),
        lit(0.0), (acc, v) => acc + v)).as[Double].head()
    assert(native == hof)
  }

  test("dedup pipeline: canonical assignment follows verified chains") {
    // A≈B≈C near-identical template family (plus bridging members so
    // the min label reaches the chain tail within 3 rounds); D distinct
    val fam = "the quick brown fox jumps over the lazy dog every single day"
    val out = Dedup.dedupPipeline(docs(
      1L -> fam,
      2L -> fam,
      3L -> (fam + " again"),
      4L -> "completely unrelated content with different words entirely here now"),
      threshold = 0.5)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(out.head == ((1L, 1L, false)))
    assert(out(1) == ((2L, 1L, true)))
    assert(out(2) == ((3L, 1L, true)))
    assert(out(3) == ((4L, 4L, false)))
  }

  test("connected components: 6-hop chain, triangle, isolate all reach component min") {
    // the case fixed-3-round propagation got wrong: a chain deeper than
    // the round budget left its tail labeled mid-chain
    val edges = Seq(
      (7L, 6L), (6L, 5L), (5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L), // 6-hop chain
      (10L, 11L), (11L, 12L), (10L, 12L),                          // triangle
      (20L, 21L)).toDF("a", "b")
    // both component paths must agree: driver union-find (small-edge
    // adaptive default) and the at-scale star-contraction loop
    // (forced via maxDriverEdges = 0)
    for (maxDriver <- Seq(1000000L, 0L)) {
      val cc = Dedup.connectedComponents(edges, maxDriverEdges = maxDriver)
        .as[(Long, Long)].collect().toMap
      assert((1L to 7L).forall(cc(_) == 1L), s"maxDriver=$maxDriver: $cc")
      assert((10L to 12L).forall(cc(_) == 10L))
      assert(cc(20L) == 20L && cc(21L) == 20L)
      assert(!cc.contains(99L))                   // edgeless nodes absent
    }
  }

  test("winnow native expression equals the declarative HOF formulation") {
    // reference = the transform/slice/array_min chain the native
    // expression replaced (kept here as the semantic oracle)
    def declarative(docs: org.apache.spark.sql.DataFrame, n: Int, w: Int) = {
      val toks = split(col("text"), " ")
      val shingles = when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
        .otherwise(array())
      val hashes = transform(shingles, s => md5(s))
      val mins = when(size(hashes) >= w,
        transform(sequence(lit(1), size(hashes) - (w - 1)),
          i => array_min(slice(hashes, i, lit(w)))))
        .otherwise(hashes)
      docs.select(col("doc_id"), explode(array_distinct(mins)).as("fp"))
    }
    val rnd = new scala.util.Random(7)
    val corpus = docs((1L to 60L).map { i =>
      // lengths straddle every edge: < n (no rows), n ≤ len < n+w-1
      // (all hashes kept), and long duplicate-heavy sequences
      val len = rnd.nextInt(20)
      i -> (0 until len).map(_ => s"w${rnd.nextInt(6)}").mkString(" ")
    }: _*)
    for ((n, w) <- Seq((3, 4), (2, 5), (1, 1))) {
      val native = TextOps.winnow(corpus, n, w)
        .as[(Long, String)].collect().sorted.toSeq
      val ref = declarative(corpus, n, w)
        .as[(Long, String)].collect().sorted.toSeq
      assert(native == ref, s"n=$n w=$w")
    }
  }

  test("content flags count url/email tokens and density") {
    val out = TextOps.contentFlags(docs(
      1L -> "see https://example.org/a and mail me@host.com now",
      2L -> "plain words only")).as[(Long, Long, Long, Double)]
      .collect().sortBy(_._1).toSeq
    assert(out(0) == ((1L, 1L, 1L, 2.0 / 6)))
    assert(out(1) == ((2L, 0L, 0L, 0.0)))
  }

  test("top tf-idf prefers frequent-here, rare-elsewhere terms") {
    // "common" appears in every doc (df=3 → n/df=1); each doc's marker
    // term is unique (df=1 → n/df=3)
    val out = TextOps.topTfidf(docs(
      1L -> "common alpha alpha common",
      2L -> "common beta common common",
      3L -> "gamma common")).as[(Long, String, Double)]
      .collect().sortBy(_._1).toSeq
    assert(out(0) == ((1L, "alpha", 2.0 * 3 / 1)))
    // doc 2: beta tf=1 df=1 → 3.0; common tf=3 df=3 → 3.0 — term tie-break
    assert(out(1) == ((2L, "beta", 3.0)))
    assert(out(2) == ((3L, "gamma", 3.0)))
  }

  test("keywords: top-k tf-idf list, rank order, term tie-break, k bound") {
    // Same df structure as the topTfidf spec plus a wide doc proving
    // the k cutoff and a tied-score doc proving term-asc ordering.
    val out = TextOps.keywords(docs(
      1L -> "common alpha alpha common",
      2L -> "xray yankee",
      3L -> "a b c d e common"), k = 3)
      .as[(Long, Long, String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    // doc 1: alpha tf2·(3/1)=6 > common tf2·(3/2)=3
    assert(out(1L).map(r => (r._3, r._4)) == Seq("alpha" -> 6.0, "common" -> 3.0))
    // doc 2: xray/yankee both tf1·df1 → score 3.0; term asc breaks the tie
    assert(out(2L).map(_._3) == Seq("xray", "yankee"))
    assert(out(2L).map(_._2) == Seq(1L, 2L))
    // doc 3 has 6 distinct terms; only k=3 survive, unique singles
    // (score 3.0) outrank the everywhere-term common (1.5)
    assert(out(3L).map(_._3) == Seq("a", "b", "c"))
    // keywords ranked 1 agree with topTfidf's argmax on every doc
    val top1 = TextOps.topTfidf(docs(
      1L -> "common alpha alpha common",
      2L -> "xray yankee",
      3L -> "a b c d e common")).as[(Long, String, Double)]
      .collect().map(r => r._1 -> r._2).toMap
    out.foreach { case (d, rows) => assert(rows.head._3 == top1(d)) }
  }

  test("histogram: floor-div buckets, exact bounds, edge values, degenerate span") {
    val orders = Seq(1.00, 1.01, 10.50, 20.99).toDF("o_totalprice")
    val out = Stats.histogram(orders, nb = 20)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // span = 2099-100+1 = 2000; bucket = (c-100)*20 div 2000
    assert(out.map(_._1) == Seq(0L, 9L, 19L), "min→0, max→nb-1")
    assert(out(0) == ((0L, 2L, 100L, 101L, 201L)))
    // (1050-100)·20 div 2000 = 19000 div 2000 = 9 (floor, not round)
    assert(out(1) == ((9L, 1L, 1050L, 1050L, 1050L)))
    assert(out(2) == ((19L, 1L, 2099L, 2099L, 2099L)))
    assert(out.map(_._2).sum == 4L, "every row lands in exactly one bucket")
    // all-equal input: span 1, everything in bucket 0
    val one = Stats.histogram(Seq(5.00, 5.00).toDF("o_totalprice"), nb = 20)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(one == Seq((0L, 2L, 500L, 500L, 1000L)))
    // empty input: empty histogram, no null-bucket row
    assert(Stats.histogram(Seq.empty[Double].toDF("o_totalprice")).count() == 0L)
  }

  test("autocorr: perfect lag-1 line gives acf 1, gaps pair nothing, constants NULL") {
    def ev(rows: Seq[(String, Long, Double)]) =
      rows.zipWithIndex.map { case ((ty, day, v), i) =>
        (1L, i.toLong, new java.sql.Timestamp(day * 86400000L + 1000L), ty, Some(v))
      }.toDF("user_id", "event_id", "ts", "event_type", "value")
    // strictly increasing line: lag-1 pairs are again a perfect line;
    // mirror the operator's exact double chain (sqrt·sqrt rounds a
    // perfect correlation to within one ulp of 1 — deterministically)
    val line = ev((0L to 5L).map(d => ("view", d, 1.0 + d)))
    val r1 = Stats.autocorr(line, Seq(1)).collect()(0)
    assert(r1.getAs[Long]("n_pairs") == 5L)
    val xs = (0L to 4L).map(d => 100L + 100L * d)
    val ys = (1L to 5L).map(d => 100L + 100L * d)
    val (n, sx, sy) = (5L, xs.sum, ys.sum)
    val (sxy, sxx, syy) = (xs.zip(ys).map { case (a, b) => a * b }.sum,
      xs.map(a => a * a).sum, ys.map(a => a * a).sum)
    val expected = (n * sxy - sx * sy).toDouble /
      (math.sqrt((n * sxx - sx * sx).toDouble) *
        math.sqrt((n * syy - sy * sy).toDouble))
    assert(r1.getAs[Double]("acf") == expected)
    assert(math.abs(expected - 1.0) < 1e-12)
    // calendar gap: days 0,1,3,4 -> lag-1 pairs only (0,1) and (3,4)
    val gap = ev(Seq(("view", 0L, 1.0), ("view", 1L, 2.0),
      ("view", 3L, 5.0), ("view", 4L, 3.0)))
    val rg = Stats.autocorr(gap, Seq(1)).collect()(0)
    assert(rg.getAs[Long]("n_pairs") == 2L, "a day hole must not pair across")
    assert(rg.isNullAt(rg.fieldIndex("acf")), "n<3 reports NULL")
    // constant series: zero variance -> NULL
    val const = ev((0L to 4L).map(d => ("click", d, 7.0)))
    val rc = Stats.autocorr(const, Seq(1)).collect()(0)
    assert(rc.isNullAt(rc.fieldIndex("acf")))
  }

  test("ksDrift: identical halves read D=0; disjoint supports read D=n1*n2") {
    def ev(rows: Seq[(Long, Double)]) = rows.zipWithIndex.map { case ((day, v), i) =>
      (1L, i.toLong, new java.sql.Timestamp(day * 86400000L + 1000L), "view", Some(v))
    }.toDF("user_id", "event_id", "ts", "event_type", "value")
    // days 0,1 vs 2,3 (mid = 2): same value multiset on both sides
    val same = Stats.ksDrift(ev(Seq((0L, 1.0), (1L, 2.0), (2L, 1.0), (3L, 2.0))))
      .collect()(0)
    assert(same.getAs[Long]("n1") == 2L && same.getAs[Long]("n2") == 2L)
    assert(same.getAs[Long]("d_num") == 0L && same.getAs[Double]("ks") == 0.0)
    // disjoint supports: all side-1 values below all side-2 values
    val dis = Stats.ksDrift(ev(Seq((0L, 1.0), (1L, 2.0), (2L, 9.0), (3L, 8.0))))
      .collect()(0)
    assert(dis.getAs[Long]("d_num") == 4L, "full separation: |2*2 - 0*2| = 4")
    assert(dis.getAs[Double]("ks") == 1.0)
    // argmax lands at the crossing point: the largest side-1 value
    assert(dis.getAs[Long]("at_cents") == 200L)
  }

  test("ksDrift: hand-computed partial drift with ties across sides") {
    def ev(rows: Seq[(Long, Double)]) = rows.zipWithIndex.map { case ((day, v), i) =>
      (1L, i.toLong, new java.sql.Timestamp(day * 86400000L + 1000L), "view", Some(v))
    }.toDF("user_id", "event_id", "ts", "event_type", "value")
    // side1 (days 0-1): cents 100,100,300 ; side2 (days 2-3): 100,300,300
    val r = Stats.ksDrift(ev(Seq((0L, 1.0), (0L, 1.0), (1L, 3.0),
      (2L, 1.0), (3L, 3.0), (3L, 3.0)))).collect()(0)
    // at c=100: |2*3 - 1*3| = 3 ; at c=300: |3*3 - 3*3| = 0 -> D=3 at 100
    assert(r.getAs[Long]("d_num") == 3L)
    assert(r.getAs[Long]("at_cents") == 100L)
    assert(r.getAs[Double]("ks") == 3.0 / 9.0)
  }

  test("ksDriftByType: each type reads its own single-type ksDrift") {
    def ev(rows: Seq[(String, Long, Double)]) = rows.zipWithIndex.map {
      case ((ty, day, v), i) =>
        (1L, i.toLong, new java.sql.Timestamp(day * 86400000L + 1000L), ty, Some(v))
    }.toDF("user_id", "event_id", "ts", "event_type", "value")
    val viewRows = Seq(("view", 0L, 1.0), ("view", 1L, 2.0),
      ("view", 2L, 9.0), ("view", 3L, 8.0))              // full separation
    val clickRows = Seq(("click", 0L, 5.0), ("click", 1L, 6.0),
      ("click", 2L, 5.0), ("click", 3L, 6.0))            // identical halves
    val got = Stats.ksDriftByType(ev(viewRows ++ clickRows)).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // both types share the global half split here, so each row must
    // equal the single-type operator run on that type's slice alone
    for ((ty, rows) <- Seq("view" -> viewRows, "click" -> clickRows)) {
      val solo = Stats.ksDrift(ev(rows)).collect()(0)
      assert(got(ty) == ((solo.getLong(0), solo.getLong(1),
        solo.getLong(2), solo.getLong(3))), ty)
    }
    assert(got("view")._3 == 4L, "disjoint supports: D numerator = n1*n2")
    assert(got("click")._3 == 0L, "identical halves: zero drift")
  }

  test("mannWhitney: hand ranks with ties; all-tied variance reads NULL") {
    def ev(rows: Seq[(Long, Double)]) = rows.zipWithIndex.map { case ((day, v), i) =>
      (1L, i.toLong, new java.sql.Timestamp(day * 86400000L + 1000L), "view", Some(v))
    }.toDF("user_id", "event_id", "ts", "event_type", "value")
    // side1 (days 0,1): 1.0, 2.0 ; side2 (days 2,3): 2.0, 4.0
    // combined ranks: 100->1, 200->midrank 2.5 (x2), 400->4
    // R1 = 1 + 2.5 = 3.5 -> r1_2 = 7, u1_2 = 7 - 2*3 = 1 -> U1 = 0.5
    val r = Stats.mannWhitney(ev(Seq((0L, 1.0), (1L, 2.0),
      (2L, 2.0), (3L, 4.0)))).collect()(0)
    assert(r.getAs[Long]("n1") == 2L && r.getAs[Long]("n2") == 2L)
    assert(r.getAs[Long]("u1_2") == 1L)
    assert(r.getAs[Long]("ties") == 6L, "one pair tied: 2^3-2")
    // mirror the operator's exact double chain
    val (na, nb, ties) = (2.0, 2.0, 6.0)
    val z = ((1.0 / 2.0) - (na * nb / 2.0)) /
      math.sqrt((na * nb / 12.0) *
        ((na + nb + 1.0) - (ties / ((na + nb) * (na + nb - 1.0)))))
    assert(r.getAs[Double]("z_score") == z)
    // every observation identical: tie term kills the variance -> NULL
    val allTied = Stats.mannWhitney(ev(Seq((0L, 5.0), (1L, 5.0),
      (2L, 5.0), (3L, 5.0)))).collect()(0)
    assert(allTied.isNullAt(allTied.fieldIndex("z_score")))
  }

  test("mad: hand-computed median and deviation median per group") {
    val orders = Seq(("O", 1.00), ("O", 2.00), ("O", 6.00),
      ("F", 5.00), ("F", 5.00))
      .toDF("o_orderstatus", "o_totalprice")
    val out = Stats.mad(orders, "o_orderstatus", "o_totalprice").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // O: cents 100,200,600 -> med 200; devs 100,0,400 -> mad 100
    assert(out("O") == ((3L, 200.0, 100.0)))
    // F: constant -> mad 0
    assert(out("F") == ((2L, 500.0, 0.0)))
  }

  test("typeTokenRatio: diversity counts, repeated-term collapse") {
    val out = TextOps.typeTokenRatio(docs(
      1L -> "a a b", 2L -> "w x y z", 3L -> "solo"))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out(0) == ((1L, 3L, 2L, 2.0 / 3)))
    assert(out(1) == ((2L, 4L, 4L, 1.0)), "all-distinct doc has TTR 1")
    assert(out(2) == ((3L, 1L, 1L, 1.0)))
  }

  test("promptCompletionPairs: token-boundary split, roundtrip, short-doc drop") {
    val out = TextOps.promptCompletionPairs(docs(
      1L -> "a b c d e", 2L -> "x y"), promptTokens = 3)
      .as[(Long, String, String, Long, Long)].collect().toSeq
    assert(out == Seq((1L, "a b c", "d e", 3L, 2L)), s"got $out")
    // prompt ⧺ ' ' ⧺ completion round-trips the document
    assert(out.head._2 + " " + out.head._3 == "a b c d e")
  }

  test("interArrival: per-user gap profile; single-event users absent") {
    val ts = (sec: Long) => new java.sql.Timestamp(sec * 1000L)
    // u1 gaps: 10s, 30s → min 10e6, max 30e6, median 20e6 (interpolated)
    val ev = Seq(
      (1L, 1L, ts(0L)), (1L, 2L, ts(10L)), (1L, 3L, ts(40L)),
      (2L, 4L, ts(5L)))
      .toDF("user_id", "event_id", "ts")
    val out = EventOps.interArrival(ev)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 10000000L, 30000000L, 2.0e7)), s"got $out")
  }

  test("stratified sample: per-group quota, deterministic") {
    val orders = (1L to 200L).map(i => (i, if (i % 3 == 0) "A" else "B"))
      .toDF("o_orderkey", "o_orderstatus")
    val once = EventOps.sampleOrdersStratified(orders, 7)
      .as[(Long, String)].collect().toSet
    val again = EventOps.sampleOrdersStratified(
        orders.repartition(13), 7)   // layout must not matter
      .as[(Long, String)].collect().toSet
    assert(once == again)
    assert(once.groupBy(_._2).forall(_._2.size == 7))
  }

  test("sketch gate holds on the small scale dir") {
    val events = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val row = Sketches.accuracyGate(events).collect().head
    assert((0 until 3).forall(i => row.getBoolean(i)), row.toString)
  }

  test("sketch gate: bounded exact side (maxExactRows < N) still verdicts true") {
    // the 100 TB path: content-hash sample caps the exact sort
    val events = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "events")
    val row = Sketches.accuracyGate(events, maxExactRows = 2000).collect().head
    assert((0 until 3).forall(i => row.getBoolean(i)), row.toString)
  }

  test("embedding near-dup: LSH pairs ⊆ exact pairs; sampled recall gate true") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val exact = Dedup.embeddingNearDupExact(emb, threshold = 0.4)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingNearDup(emb, threshold = 0.4)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), "LSH emits only exact-verified pairs (precision 1)")
    val gate = Dedup.nearDupRecallGate(emb, threshold = 0.4, bar = 0.95)
      .collect().head
    assert(gate.getBoolean(1), gate.toString)
    // candidate-set identity (what lets the gate skip the verify
    // stage): verified ∩ exact == candidates ∩ exact, because every
    // exact pair that is a candidate survives the exact-dot verify by
    // definition — so the candidate-measured gate verdict equals one
    // measured against the fully-verified operator output
    val qids = emb.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(200).select(col("vec_id"))
    val verifiedGate = Dedup.pairRecallGate(emb,
      Dedup.embeddingNearDupFor(emb.join(broadcast(qids), "vec_id"), emb, 0.4),
      threshold = 0.4, bar = 0.95)
      .collect().head
    assert(verifiedGate.getBoolean(1) == gate.getBoolean(1),
      s"candidate-gate verdict diverged from verified-gate: $gate vs $verifiedGate")
  }

  test("hyperplane buckets: native pass equals per-plane sign arithmetic") {
    // pin the bucket derivation: sequential-fold projection sign per
    // plane, bit b of table t from plane t*planes+b — a change here
    // silently invalidates every tuned recall measurement
    val v = Array(0.3, -0.7, 0.64, 0.05)
    val (tables, planes, dims) = (3, 4, 4)
    val expected = (0 until tables).map { t =>
      (0 until planes).map { b =>
        val plane = graft.functions.HyperplaneBuckets.planeVector(t * planes + b, dims)
        val proj = v.zip(plane).foldLeft(0.0) { case (a, (x, p)) => a + x * p }
        if (proj >= 0) 1L << b else 0L
      }.sum
    }
    val out = Seq(Tuple1(v)).toDF("v")
      .select(graft.functions.HyperplaneBuckets(col("v"), tables, planes, dims))
      .as[Seq[Long]].head()
    assert(out == expected)
  }

  test("multi-table LSH candidates are a superset of exact top-1 for clustered data") {
    // two tight clusters: LSH must recover within-cluster neighbors
    val vs = (0 until 8).map { i =>
      val base = if (i < 4) Array(1.0f, 0.0f, 0.05f * i, 0.0f)
                 else Array(0.0f, 1.0f, 0.0f, 0.05f * i)
      val n = math.sqrt(base.map(x => x * x).sum).toFloat
      (i.toLong, base.map(_ / n))
    }.toDF("vec_id", "embedding")
    val lsh = Similarity.lshTopK(vs, k = 3, dims = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // same-cluster neighbors collide in at least one of 8 tables
    assert((0 until 4).forall(i => lsh.exists(p => p._1 == i && p._2 < 4)))
  }

  test("incremental dedup candidates equal batch LSH restricted to new docs") {
    val all = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val old = all.filter(col("doc_id") % 3 =!= 0)
    val b1 = all.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 === 0)
    val b2 = all.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 =!= 0)

    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("a", "b").as[(Long, Long)].collect().toSet
    val fullPairs = pairs(Dedup.minHashLsh(all))
    def touching(ids: Set[Long]) =
      fullPairs.filter(p => ids.contains(p._1) || ids.contains(p._2))
    val idSet = (df: org.apache.spark.sql.DataFrame) =>
      df.select("doc_id").as[Long].collect().toSet

    // batch 1 vs indexed corpus: pairs touching b1, minus pairs with an
    // endpoint in the not-yet-seen b2
    val idx0 = Dedup.buildBandIndex(old)
    val inc1 = pairs(Dedup.incrementalCandidates(idx0, b1))
    assert(inc1 == touching(idSet(b1)).filterNot(p =>
      idSet(b2).contains(p._1) || idSet(b2).contains(p._2)),
      "batch-1 increment must cover exactly pairs touching b1 but not unseen b2")

    // after registering b1, batch 2 sees old ∪ b1 ∪ itself
    val idx1 = Dedup.appendBands(idx0, b1)
    val inc2 = pairs(Dedup.incrementalCandidates(idx1, b2))
    assert(inc2 == touching(idSet(b2)),
      "batch-2 increment must cover every full-LSH pair touching b2")
    // the union of increments + the base batch run reconstructs full LSH
    assert((pairs(Dedup.minHashLsh(old)) ++ inc1 ++ inc2) == fullPairs,
      "incremental runs must compose to the one-shot batch result")
    idx1.close()
  }

  test("mixture sample: quotas filled per language, deterministic draw, underfill ok") {
    val d = Seq.tabulate(30)(i =>
        (i.toLong, "txt", if (i % 3 == 0) "en" else if (i % 3 == 1) "es" else "zz"))
      .toDF("doc_id", "text", "lang")
    val out = TextOps.mixtureSample(d,
        Map("en" -> 0.5, "es" -> 0.3, "fr" -> 0.2), total = 10)
      .select("doc_id", "lang", "pick_order")
      .as[(Long, String, Long)].collect()
    val byLang = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang == Map("en" -> 5, "es" -> 3))   // fr absent → underfills, zz unrequested
    // repeated draw is identical (hash order, no RNG)
    val again = TextOps.mixtureSample(d,
        Map("en" -> 0.5, "es" -> 0.3, "fr" -> 0.2), total = 10)
      .as[(Long, String, Long)].collect()
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("runs test: hand series — alternation maxes runs, monotone is one run") {
    def day(d: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusDays(d.toLong))
    // values 1,3,2,4,1 -> steps up,down,up,down: 4 runs, 2 up, 2 down
    val alt = Seq(1.0, 3.0, 2.0, 4.0, 1.0).zipWithIndex
      .map { case (p, i) => (day(i), p) }.toDF("o_orderdate", "o_totalprice")
    assert(Stats.runsTest(alt).as[(Long, Long, Long)].head() == ((2L, 2L, 4L)))
    // monotone 1,2,3,4 -> one run of ups
    val mono = Seq(1.0, 2.0, 3.0, 4.0).zipWithIndex
      .map { case (p, i) => (day(i), p) }.toDF("o_orderdate", "o_totalprice")
    assert(Stats.runsTest(mono).as[(Long, Long, Long)].head() == ((3L, 0L, 1L)))
    // single day -> no steps, zero runs
    val one = Seq((day(0), 5.0)).toDF("o_orderdate", "o_totalprice")
    assert(Stats.runsTest(one).as[(Long, Long, Long)].head() == ((0L, 0L, 0L)))
  }

  test("lsh quality audit: planted dup found; empty corpus yields NULL ppms") {
    // two near-identical docs (one token changed) + one unrelated:
    // truth has the near pair; LSH should candidate it (recall 1e6)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "completely different words appear in this other document here")
    ).toDF("doc_id", "text")
    val out = Dedup.lshQualityAudit(docs)
      .as[(Long, Long, Long, Option[Long], Option[Long])].head()
    assert(out._2 == 1L && out._3 >= 1L, s"truth pair must be found: $out")
    assert(out._5.contains(1000000L), s"recall must be 1e6 ppm: $out")
    // shingle-less corpus: zero candidates and truths, NULL ppms (the
    // div-by-zero guard on both engines)
    val empty = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    val z = Dedup.lshQualityAudit(empty)
      .as[(Long, Long, Long, Option[Long], Option[Long])].head()
    assert(z == ((0L, 0L, 0L, None, None)), s"got $z")
  }

  test("mann-kendall + theil-sen: random series match in-memory references") {
    val rnd = new scala.util.Random(41)
    val ts = (w: Long) => new java.sql.Timestamp(w * 604800L * 1000L)
    for (trial <- 1 to 3) {
      val weeks = (0L until (6L + trial)).map(w =>
        w -> (rnd.nextInt(900) + 100)) // cents in [100, 999]
      // whole-dollar prices: floor(c*100.0) is exact, so the in-memory
      // reference's integers match the engine's cents bit-for-bit
      val orders = weeks.map { case (w, c) => ("P", ts(w), c.toDouble) }
        .toDF("o_orderpriority", "o_orderdate", "o_totalprice")
      val ys = weeks.map { case (w, c) => (w, c.toLong * 100L) }
      val pairs = for {
        i <- ys.indices; j <- ys.indices if ys(j)._1 > ys(i)._1
      } yield (ys(i), ys(j))
      val s = pairs.map { case ((_, a), (_, b)) => java.lang.Long.signum(b - a).toLong }.sum
      val mk = Stats.mannKendall(orders)
        .as[(String, Long, Long, Long, Long)].head()
      assert(mk._2 == ys.size.toLong && mk._3 == s, s"trial $trial: $mk vs S=$s")
      // theil-sen low median over (slope, dy, dx, w1, w2) order
      val wantSlope = {
        val all = pairs.map { case ((w1, a), (w2, b)) =>
          ((b - a).toDouble / (w2 - w1).toDouble, b - a, w2 - w1, w1, w2)
        }.sorted
        all(((all.size + 1) / 2) - 1)._1
      }
      val tsn = Stats.theilSen(orders)
        .as[(String, Long, Double, Long, Long)].head()
      assert(tsn._2 == pairs.size.toLong && tsn._3 == wantSlope,
        s"trial $trial: $tsn vs $wantSlope")
    }
  }

  test("mann-kendall: hand-computed sign sums on monotone and mixed series") {
    // priority A: weeks 0..3 with strictly rising revenue -> all 6
    // pairs concordant, S = +6; priority B: down-up-down -> mixed
    val ts = (w: Long) => new java.sql.Timestamp(w * 604800L * 1000L)
    val rows =
      Seq(0L -> 1.0, 1L -> 2.0, 2L -> 3.0, 3L -> 4.0).map { case (w, p) =>
        ("A", ts(w), p) } ++
      Seq(0L -> 3.0, 1L -> 1.0, 2L -> 2.0).map { case (w, p) =>
        ("B", ts(w), p) }
    val orders = rows.toDF("o_orderpriority", "o_orderdate", "o_totalprice")
    val out = Stats.mannKendall(orders)
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("A") == (("A", 4L, 6L, 6L, 0L)))
    // B pairs: (3,1)-1, (3,2)-1, (1,2)+1 -> S=-1, conc 1, disc 2
    assert(out("B") == (("B", 3L, -1L, 1L, 2L)))
  }

  test("theil-sen: low median slope of hand pairs, exact dy/dx returned") {
    // weeks 0,1,3 with cents 100,300,400: slopes 200/1, 100/3=33.33,
    // 150/1... pairs: (0,1)=200, (0,3)=100, (1,3)=50 -> sorted
    // [50, 100, 200], low median (m=3 -> rank 2) = 100 cents/week
    val ts = (w: Long) => new java.sql.Timestamp(w * 604800L * 1000L)
    val orders = Seq(("X", ts(0L), 1.0), ("X", ts(1L), 3.0),
      ("X", ts(3L), 4.0)).toDF("o_orderpriority", "o_orderdate", "o_totalprice")
    val got = Stats.theilSen(orders)
      .as[(String, Long, Double, Long, Long)].collect().toSeq
    assert(got == Seq(("X", 3L, 100.0, 300L, 3L)))
  }

  test("survival table: hand life table, at-risk monotone, ppm floors") {
    // durations in days: 0, 3 (bucket 0), 10 (bucket 1), 20 (bucket 2)
    val day0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def plus(d: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusDays(d.toLong))
    val orders = Seq((1L, day0), (2L, day0), (3L, day0), (4L, day0))
      .toDF("o_orderkey", "o_orderdate")
    val li = Seq((1L, plus(0)), (2L, plus(3)), (3L, plus(10)), (4L, plus(20)))
      .toDF("l_orderkey", "l_shipdate")
    val got = Stats.survivalTable(orders, li)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, 4L, 500000L, 500000L),   // 2 events of 4 at risk
      (1L, 1L, 2L, 500000L, 250000L),   // 1 of remaining 2
      (2L, 1L, 1L, 1000000L, 0L)))      // last one ships, none survive
  }

  test("ols daily: perfect line recovered exactly; degenerate single day NULL") {
    def ts(d: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(1970, 1, 1, 0, 0).plusDays(d.toLong))
    // y = 2x + 3 cents on days 0..4 -> slope 2, intercept 3, r2 = 1
    val line = (0 to 4).map(d => (d.toLong, ts(d), "A", (2 * d + 3) / 100.0))
    val single = Seq((9L, ts(0), "B", 1.00))
    val events = (line ++ single).toDF("event_id", "ts", "event_type", "value")
    val out = Stats.olsDaily(events)
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(out("A") == (("A", 5L, Some(2.0), Some(3.0), Some(1.0))),
      s"got ${out("A")}")
    assert(out("B")._3.isEmpty && out("B")._5.isEmpty, "n=1 has no trend")
  }

  test("u-shaped attribution: 40/20/40 with remainder to first; degenerate journeys") {
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val events = Seq(
      // user 1: 5 touches then purchase -> first 400000+r, last 400000,
      // 3 middles 66666 each (200000 div 3), r = 200000-66666*3 = 2
      (1L, ts(1), 1L, "view"), (1L, ts(2), 2L, "click"),
      (1L, ts(3), 3L, "view"), (1L, ts(4), 4L, "click"),
      (1L, ts(5), 5L, "view"), (1L, ts(6), 6L, "purchase"),
      // user 2: single touch -> full credit
      (2L, ts(1), 7L, "click"), (2L, ts(2), 8L, "purchase"),
      // user 3: no purchase -> contributes nothing
      (3L, ts(1), 9L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = graft.operators.Analytics.uShapedAttribution(events)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // view: first (400002) + middle (66666) + LAST (rk5 is a view:
    // 400000) = 866668 over 3 touches
    assert(got("view") == (("view", 866668L, 3L)), s"got ${got("view")}")
    // click: two middles (66666*2) + user2 full (1000000)
    assert(got("click") == (("click", 1133332L, 3L)), s"got ${got("click")}")
    assert(!got.contains("purchase"), "the conversion itself earns no credit")
    // total credit = 1e6 per converting user
    assert(got.values.map(_._2).sum == 2000000L)
  }

  test("target encode: out-of-fold means exclude own fold; single fold NULL") {
    // type A: ids 0..3 -> folds 0,1,2,3 with cents 100,200,300,400;
    // fold 0's oof mean = (200+300+400)/3 = 300.0
    val a = (0 to 3).map(i => (i.toLong, "A", (i + 1) * 1.00))
    // type B: one id -> one fold -> NULL encoding
    val b = Seq((10L, "B", 9.00))
    val events = (a ++ b).toDF("event_id", "event_type", "value")
    val out = Stats.targetEncode(events)
      .as[(String, Long, Long, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(out(("A", 0L)) == (("A", 0L, 1L, 100L, Some(300.0))))
    assert(out(("A", 3L)) == (("A", 3L, 1L, 400L, Some(200.0))))
    assert(out(("B", 0L))._5.isEmpty, "single-fold category encodes NULL")
  }

  test("record linkage: blocked pairs score agreement weights; cross-block never pairs") {
    val customers = Seq(
      // same nation, same $1000 bucket, same segment + close balance +
      // same suffix -> 100
      (1L, "Customer#01", 0, 500.00, "AUTO"),
      (2L, "Customer#01", 0, 520.00, "AUTO"),
      // same block, different segment + far balance + same suffix -> 20 (dropped)
      (3L, "Customer#01", 0, 900.00, "HOUSE"),
      // same everything but another NATION -> never a candidate
      (4L, "Customer#01", 1, 500.00, "AUTO"),
      // same nation but another balance bucket -> never a candidate
      (5L, "Customer#01", 0, 1700.00, "AUTO"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val got = Dedup.recordLinkage(customers)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 100L)), s"got $got")
    // threshold 0 exposes the low-scoring in-block pair (score 20+30?
    // 3 is $400/$380 away from 1/2 -> only suffix agrees: 20)
    val all = Dedup.recordLinkage(customers, minScore = 0L)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    assert(all((1L, 3L)) == 20L && all((2L, 3L)) == 20L)
  }

  test("winsorized mean: clamp to boundary-rank values; outlier absorbed") {
    // cents 100..1000, n=10, t=1: low=rank2=200, high=rank9=900,
    // sum = (200+...+900) + 1*(200+900) = 4400 + 1100 = 5500
    val f = (1 to 10).map(i => (i.toLong, "F", i * 1.00))
    val out = Stats.winsorizedMean(f.toDF("o_orderkey", "o_orderstatus", "o_totalprice"))
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out == Seq(("F", 10L, 5500L, 550.0)), s"got $out")
    // planted 10000-cent outlier (n=11, t=1): clamped to the new rank-10
    // value (1000), never contributing its own magnitude
    val w = (f :+ ((99L, "F", 100.0)))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
    val o2 = Stats.winsorizedMean(w).as[(String, Long, Long, Double)].head()
    // ranks 2..10 sum = 200+...+1000 = 5400; + low(200) + high(1000)
    assert(o2 == (("F", 11L, 6600L, 600.0)), s"got $o2")
  }

  test("trimmed mean: rank-trimmed hand values; tiny groups keep everything") {
    // group F: cents [100..1000], n=10, t=1 -> keep ranks 2..9:
    // sum = 200+...+900 = 4400, mean 550.0
    val f = (1 to 10).map(i => (i.toLong, "F", i * 1.00))
    // group O: n=3, t=0 -> keep all: sum 600, mean 200.0
    val o = Seq((21L, "O", 1.0), (22L, "O", 2.0), (23L, "O", 3.0))
    val orders = (f ++ o)
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
    val out = Stats.trimmedMean(orders)
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("F") == (("F", 8L, 4400L, 550.0)), s"got ${out("F")}")
    assert(out("O") == (("O", 3L, 600L, 200.0)), s"got ${out("O")}")
    // trim order is (cents, key): outliers drop by VALUE rank, so the
    // extreme 10000-cent row never reaches the kept sum
    val withOutlier = (f :+ ((99L, "F", 100.0))) // 10000 cents
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
    val t2 = Stats.trimmedMean(withOutlier)
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(t2("F")._3 == 200L + 300L + 400L + 500L + 600L + 700L + 800L + 900L + 1000L,
      "the planted outlier must be the trimmed top rank")
  }

  test("contamination report: hand-computed ppm coverage; shingle-less eval docs absent") {
    val train = Seq(
      (1L, "a b c d"),        // shingles: "a b c", "b c d"
      (2L, "x y z"))          // "x y z"
      .toDF("doc_id", "text")
    val eval = Seq(
      (100L, "a b c d e"),    // 3 shingles, 2 in train -> 666666 ppm
      (101L, "x y z"),        // fully contaminated -> 1000000
      (102L, "p q r s"),      // fully novel -> 0
      (103L, "p q"))          // < 3 tokens: no shingles, no row
      .toDF("doc_id", "text")
    val out = TextOps.contaminationReport(train, eval)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet == Set(100L, 101L, 102L))
    assert(out(100L) == ((100L, 3L, 2L, 666666L)))
    assert(out(101L) == ((101L, 1L, 1L, 1000000L)))
    assert(out(102L) == ((102L, 2L, 0L, 0L)))
  }

  test("temperature mix: sqrt flattens the head, integer shares, exact micros") {
    // 100 vs 4 vs 1 docs: w_micro = floor(sqrt(n)*1e6) = 10e6, 2e6, 1e6
    val d = ((1 to 100).map(i => (i.toLong, "web")) ++
      (101 to 104).map(i => (i.toLong, "books")) :+ (105L, "code"))
      .toDF("doc_id", "source")
    val out = TextOps.temperatureMix(d)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("web")._3 == 10000000L && out("books")._3 == 2000000L &&
      out("code")._3 == 1000000L)
    // raw shares: 100/105, 4/105, 1/105 in floor ppm
    assert(out("web")._4 == 952380L && out("books")._4 == 38095L &&
      out("code")._4 == 9523L)
    // temperature shares flatten: 10/13, 2/13, 1/13
    assert(out("web")._5 == 769230L && out("books")._5 == 153846L &&
      out("code")._5 == 76923L)
    // the head's share strictly drops, every tail share strictly rises
    assert(out("web")._5 < out("web")._4)
    assert(out("books")._5 > out("books")._4 && out("code")._5 > out("code")._4)
  }

  test("budget mix: sliver-refinement selection equals the exact windowed form") {
    // the scale-path contract: histogram + boundary walk + boundary-
    // bucket-only sort selects EXACTLY the documents the per-language
    // total sort selects — at two budgets and two SFs, including the
    // keep-all regime (huge budget) and a budget landing mid-bucket
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01");
         budget <- Seq(500L, 2000L, 10000000L)) {
      val d = graft.sources.Tables.load(spark, dir, "documents")
      val exact = TextOps.budgetMix(d, budget)
        .select("doc_id").as[Long].collect().toSet
      val approx = TextOps.budgetMixSelect(d, budget)
        .select("doc_id").as[Long].collect().toSet
      assert(approx == exact,
        s"$dir budget=$budget: sliver path diverged " +
          s"(missing=${(exact -- approx).take(5)}, extra=${(approx -- exact).take(5)})")
    }
  }

  test("sampled-query ANN forms equal the full self-ANN restricted to the sample") {
    // the bridge lemma the O(sample) recall gates rest on: driving the
    // operator over (sample, corpus) gives the SAME per-query results
    // as the full self-join filtered to the sample
    import org.apache.spark.sql.functions.{broadcast, col, md5}
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qids = emb.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(50).select("vec_id")
    val sample = emb.join(broadcast(qids), "vec_id")
    val qset = qids.as[Long].collect().toSet

    val fullLsh = Similarity.lshTopK(emb, k = 5)
      .filter(col("query_id").isin(qset.toSeq: _*))
      .select("query_id", "rank", "neighbor_id").collect().map(_.toSeq).toSet
    val forLsh = Similarity.lshTopKFor(sample, emb, k = 5)
      .select("query_id", "rank", "neighbor_id").collect().map(_.toSeq).toSet
    assert(forLsh == fullLsh, "lshTopKFor diverged from restricted self-ANN")

    val fullPairs = Dedup.embeddingNearDup(emb, threshold = 0.4)
      .filter(col("a").isin(qset.toSeq: _*) || col("b").isin(qset.toSeq: _*))
      .select("a", "b").collect().map(_.toSeq).toSet
    val forPairs = Dedup.embeddingNearDupFor(sample, emb, threshold = 0.4)
      .select("a", "b").collect().map(_.toSeq).toSet
    assert(forPairs == fullPairs, "embeddingNearDupFor diverged from full pairs")
  }

  test("knn classify: tight label groups predict their own label; ties break low") {
    // two well-separated direction groups in 4d (normalized), 3 vecs each
    def v(xs: Double*) = {
      val n = math.sqrt(xs.map(x => x * x).sum)
      xs.map(x => (x / n).toFloat).toArray
    }
    val rows = Seq(
      (1L, v(1, 0.01, 0, 0), 7), (2L, v(1, 0, 0.01, 0), 7), (3L, v(1, 0, 0, 0.01), 7),
      (4L, v(0, 0.01, 1, 0), 9), (5L, v(0.01, 0, 1, 0), 9), (6L, v(0, 0, 1, 0.01), 9))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val out = Similarity.knnClassify(emb, k = 2)
      .select("query_id", "label", "predicted_label", "votes")
      .as[(Long, Int, Int, Long)].collect().map(r => r._1 -> r).toMap
    rows.foreach { case (id, _, lbl) =>
      assert(out(id)._3 == lbl && out(id)._4 == 2L,
        s"vec $id: expected unanimous $lbl, got ${out(id)}")
    }
    // k=3: the third neighbor crosses groups → votes 2 vs 1, majority holds
    val o3 = Similarity.knnClassify(emb, k = 3)
      .select("query_id", "predicted_label", "votes")
      .as[(Long, Int, Long)].collect().map(r => r._1 -> r).toMap
    rows.foreach { case (id, _, lbl) => assert(o3(id)._2 == lbl && o3(id)._3 == 2L) }
  }

  test("semantic dedup pipeline: canonical ids equal CC over the pair graph") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val canon = Dedup.semanticDedupPipeline(emb, threshold = 0.4)
      .select("vec_id", "canonical_id").as[(Long, Long)].collect().toMap
    // every vector assigned; canonical is a component minimum (≤ self)
    assert(canon.size == emb.count())
    assert(canon.forall { case (v, c) => c <= v })
    // canonical ids are fixpoints (a canonical maps to itself)
    canon.values.foreach(c => assert(canon(c) == c))
    // dup pairs really are near: every non-self assignment came from an
    // edge path, so at least one semantic pair touches the group
    val pairs = Dedup.semanticNearDup(emb, threshold = 0.4)
      .select("a", "b").as[(Long, Long)].collect()
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(canon.filter { case (v, c) => v != c }.keys.forall(inPairs.contains))
  }

  test("semantic near-dup: pairs are exact-verified and gate passes on testdata") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val semantic = Dedup.semanticNearDup(emb, threshold = 0.4)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val exact = Dedup.embeddingNearDupExact(emb, threshold = 0.4)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(semantic.subsetOf(exact), // every emitted pair is dot-verified
      s"non-exact pairs emitted: ${(semantic -- exact).take(5)}")
    val gate = Dedup.pairRecallGate(emb,
        Dedup.semanticNearDup(emb, threshold = 0.4), threshold = 0.4, bar = 0.9)
      .select("recall_ok").as[Boolean].head()
    assert(gate)
  }

  test("contract validation counts each violation class, zero on clean data") {
    val li = Seq(
      (1L, 1, 10.0, "A", Option("2026-01-01"), 100L),   // clean
      (1L, 1, 10.0, "A", Option("2026-01-01"), 100L),   // pk dup
      (2L, 1, -5.0, "N", Option("2026-01-01"), 100L),   // negative cost
      (3L, 1, 10.0, "X", None, 999L))                    // bad status + null ts + bad FK
      .toDF("l_orderkey", "l_linenumber", "l_extendedprice", "l_returnflag",
        "l_shipdate", "l_partkey")
    val part = Seq((100L, "m")).toDF("p_partkey", "p_name")
    val out = Validate.ticketContract(li, part)
      .as[(String, Long)].collect().toMap
    assert(out == Map(
      "purchased_at_not_null" -> 1L, "cost_non_negative" -> 1L,
      "status_domain" -> 1L, "pk_unique" -> 1L, "fk_movie" -> 1L))
    // clean single row: all zeros
    val clean = Validate.ticketContract(li.limit(1), part)
      .as[(String, Long)].collect().toMap
    assert(clean.values.forall(_ == 0L))
  }

  test("embedding contract flags bad dims, NaN, off-norm, and dup ids") {
    def unit(d: Int): Seq[Double] = {
      val v = Array.fill(d)(1.0)
      v.map(_ / math.sqrt(d.toDouble)).toSeq
    }
    val rows = Seq(
      (1L, unit(64)),                               // clean
      (2L, unit(32)),                               // wrong dims
      (3L, unit(64).updated(0, Double.NaN)),        // NaN component
      (4L, unit(64).map(_ * 2.0)),                  // norm 2
      (4L, unit(64)))                               // dup id
    val emb = rows.toDF("vec_id", "embedding")
    val out = Validate.embeddingContract(emb)
      .as[(String, Long)].collect().toMap
    assert(out("dims_uniform") == 1L)
    assert(out("components_finite") == 1L)
    // NaN norm is ALSO off-norm: both engines order NaN above every
    // value, so NaN > tol holds → vec 3 (NaN) and vec 4 (norm 2);
    // the short vec 2 is still unit-norm
    assert(out("unit_norm") == 2L)
    assert(out("id_unique") == 1L)
    // the real tables are contract-clean at every SF
    val real = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    assert(Validate.embeddingContract(real)
      .as[(String, Long)].collect().forall(_._2 == 0L))
  }

  test("vocabGrowth: hand-computed cumulative distinct terms per decile") {
    // 4 docs, 2 buckets: doc1-2 bring {a,b,c}; doc3-4 add only {d}
    val d = Seq((1L, "a b"), (2L, "b c"), (3L, "a d"), (4L, "c d a"))
      .toDF("doc_id", "text")
    val out = TextOps.vocabGrowth(d, buckets = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 3L), (2L, 4L, 4L)))
    // reshuffle-proof: the curve only depends on doc_id order
    val again = TextOps.vocabGrowth(d.repartition(5), buckets = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(again == out)
  }

  test("zipfShare: hand-computed top-k token shares in floor ppm") {
    // counts: a=4, b=2, c=1, d=1 (total 8); ranks a,b,c,d
    val d = Seq((1L, "a a b"), (2L, "a b c"), (3L, "a d"))
      .toDF("doc_id", "text")
    val out = TextOps.zipfShare(d, ks = Seq(1L, 2L, 4L))
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 4L, 500000L), (2L, 6L, 750000L), (4L, 8L, 1000000L)))
  }

  test("manifest: reshuffle-proof checksum that flips on any edited document") {
    val docs = Seq(
      (1L, "alpha beta", "web", 10L), (2L, "gamma", "web", 5L),
      (3L, "delta", "books", 5L))
      .toDF("doc_id", "text", "source", "n_chars")
    val base = Validate.manifest(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(5)))).toMap
    assert(base("web")._1 == 2L && base("web")._2 == 15L)
    assert(base("books")._1 == 1L)
    // XOR is order-free: any partitioning reads the same checksum
    val shuffled = Validate.manifest(docs.repartition(7)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(5)))).toMap
    assert(shuffled == base)
    // one edited character flips the source's checksum, others untouched
    val edited = Seq(
      (1L, "alpha betb", "web", 10L), (2L, "gamma", "web", 5L),
      (3L, "delta", "books", 5L))
      .toDF("doc_id", "text", "source", "n_chars")
    val after = Validate.manifest(edited).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(5)))).toMap
    assert(after("web")._3 != base("web")._3)
    assert(after("books") == base("books"))
  }

  test("bloom decontamination equals the broadcast-join form exactly") {
    import org.apache.spark.sql.functions.col
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = graft.sources.Tables.load(spark, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 97 =!= 0)
      val eval_ = docs.filter(col("doc_id") % 97 === 0)
      val exact = TextOps.decontaminate(corpus, eval_)
        .collect().map(_.toSeq).toSet
      val bloom = TextOps.decontaminateBloom(corpus, eval_)
        .collect().map(_.toSeq).toSet
      assert(bloom == exact, s"$dir: bloom path diverged")
    }
    // empty eval set: no rows, no crash (degenerate bloom)
    val d = docs(1L -> "a b c d")
    assert(TextOps.decontaminateBloom(d, d.limit(0)).count() == 0)
  }

  test("heavy hitters: MG guarantees hold on skewed and adversarial streams") {
    // skewed: term t_i appears i² times (t_20 dominates), plus a long
    // tail of singletons to force decrements at small capacity
    val body = (1 to 20).flatMap(i => Seq.fill(i * i)(s"t$i")) ++
      (1 to 300).map(i => s"u$i")
    for (seed <- Seq(1, 2)) { // two shuffles: result ranking is stable
      val shuffled = new scala.util.Random(seed).shuffle(body)
      val d = shuffled.grouped(50).zipWithIndex
        .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
        .toDF("doc_id", "text")
      val k = 10
      val est = Sketches.heavyHitters(d, k)
        .as[(String, Long)].collect().toMap
      val exact = body.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val n = body.size.toDouble
      assert(est.size <= k)
      est.foreach { case (t, e) =>
        assert(e <= exact(t), s"$t overestimated: $e > ${exact(t)}")
        assert(exact(t) - e <= n / (k + 1), s"$t error too large")
      }
      exact.filter(_._2 > n / (k + 1)).keys.foreach { t =>
        assert(est.contains(t), s"heavy term $t missing from summary")
      }
      val gate = Sketches.heavyHittersGate(d, k).collect().head
      assert(gate.getAs[Boolean]("underestimate_ok") &&
        gate.getAs[Boolean]("error_ok") && gate.getAs[Boolean]("complete_ok"))
    }
  }

  test("top-k per group: heap result equals window semantics, ties break by key") {
    val o = Seq(
      (1L, "A", 50.0), (2L, "A", 90.0), (3L, "A", 90.0), (4L, "A", 10.0),
      (5L, "B", 5.0))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
    val out = EventOps.topOrdersPerStatus(o, k = 3)
      .select("o_orderstatus", "rank", "o_orderkey")
      .as[(String, Long, Long)].collect().toSet
    // price desc, then key asc on the 90.0 tie; 10.0 drops out of top-3
    assert(out == Set(("A", 1L, 2L), ("A", 2L, 3L), ("A", 3L, 1L), ("B", 1L, 5L)))
  }

  test("outlier flags: fences from exact quartiles, per group") {
    val o = (Seq.tabulate(11)(i => (i.toLong, "A", 100.0 + i)) :+
        (99L, "A", 10000.0) :+ (100L, "B", 1.0))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
    val out = EventOps.outlierFlags(o)
      .select("o_orderkey", "is_outlier").as[(Long, Boolean)].collect().toMap
    assert(out(99L), "the 10000.0 point must flag")
    assert((0L to 10L).forall(i => !out(i)), "the tight cluster must not flag")
    assert(!out(100L), "a singleton group has zero IQR around itself")
  }

  test("stats profile: exact moments match closed-form on known data") {
    // x = 1,2,3,4 → mean 2.5, var_samp 5/3; y = 2x → corr 1
    val df = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0), (4.0, 8.0))
      .toDF("x", "y").withColumn("g", lit("a"))
    val r = Stats.profile(df, "g", "x", "y").collect().head
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("mean_x") == 2.5)
    assert(math.abs(r.getAs[Double]("var_x") - 5.0 / 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("corr_xy") - 1.0) < 1e-12)
    // n=1 group: variance and corr are NULL, not a division error
    val one = Stats.profile(Seq((1.0, 2.0)).toDF("x", "y")
      .withColumn("g", lit("z")), "g", "x", "y").collect().head
    assert(one.isNullAt(one.fieldIndex("var_x")) &&
      one.isNullAt(one.fieldIndex("corr_xy")))
  }

  test("full outer coverage: unmatched rows survive from both sides") {
    val customer = Seq((1L, "ann", "BUILDING"), (2L, "bob", "BUILDING"),
        (3L, "cam", "AUTO"))
      .toDF("c_custkey", "c_name", "c_mktsegment")
    val orders = Seq((10L, 2L, "O"), (11L, 3L, "O"), (12L, 1L, "F"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus")
    val out = EventOps.segmentOrderCoverage(customer, orders)
      .collect().map(r => (r.getLong(0),
        Option(r.getAs[String]("c_name")), Option(r.getAs[Any]("n_open")))).toSet
    assert(out == Set(
      (1L, Some("ann"), None),          // left-only: no open orders
      (2L, Some("bob"), Some(1L)),      // matched
      (3L, None, Some(1L))))            // right-only: outside the segment
  }

  test("sequence packing: spans tile the shard stream, boundaries straddle") {
    // 3 docs in shard 0 (doc_id % 8 == 0): 3 + 4 + 2 tokens at seqLen=4
    // → token stream [0,9): doc 0 fills [0,3), doc 8 straddles seqs 0/1
    // ([3,7)), doc 16 lands in seq 1 ([7,9))
    val d = docs(0L -> "a b c", 8L -> "d e f g", 16L -> "h i", 3L -> "x y z w v")
    val out = TextOps.packSequences(d, seqLen = 4, shards = 8)
      .select("doc_id", "shard", "cum_tokens", "start_seq", "end_seq")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(0L) == (0L, 0L, 3L, 0L, 0L))
    assert(out(8L) == (8L, 0L, 7L, 0L, 1L))     // straddles the seq 0/1 cut
    assert(out(16L) == (16L, 0L, 9L, 1L, 2L))
    assert(out(3L) == (3L, 3L, 5L, 0L, 1L))     // other shard restarts at 0
    // invariant: within a shard, spans are contiguous in doc order
    val s0 = Seq(out(0L), out(8L), out(16L))
    s0.sliding(2).foreach { case Seq(a, b) =>
      assert(b._4 == a._5 || b._4 == a._5 + 1)  // next start at/after prev end
    }
  }

  test("token chunking: stride windows, short tail, single-chunk doc") {
    val d = docs(1L -> (1 to 10).map(i => s"t$i").mkString(" "), 2L -> "a b")
    val out = TextOps.chunk(d, size = 4, stride = 3)
      .select("doc_id", "chunk_idx", "n_chunk_tokens", "chunk_md5")
      .as[(Long, Long, Long, String)].collect()
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    // starts 0,3,6,9 → window sizes 4,4,4,1 (tail clamps)
    assert(d1.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(d1.map(_._3).toSeq == Seq(4L, 4L, 4L, 1L))
    val d2 = out.filter(_._1 == 2L)
    assert(d2.length == 1 && d2.head._3 == 2L)
    // digest is of the joined window text
    val md5ab = spark.sql("SELECT md5('a b')").as[String].head()
    assert(d2.head._4 == md5ab)
  }

  test("vocabulary: frequency-ranked, term tie-break, bounded size") {
    val d = docs(1L -> "b a a c b a", 2L -> "c b d")
    val v = TextOps.vocabulary(d, size = 3)
      .select("term", "n", "token_id").as[(String, Long, Long)].collect().toList
    // counts: a=3, b=3, c=2, d=1 → rank by (n desc, term asc)
    assert(v == List(("a", 3L, 1L), ("b", 3L, 2L), ("c", 2L, 3L)))
  }

  test("pii redaction: counts per kind, digest reflects placeholders") {
    val d = docs(
      1L -> "mail me at bob@x.com or visit https://x.com/a call 555-123-4567",
      2L -> "clean text no pii")
    val out = TextOps.redactPii(d)
      .select("doc_id", "n_urls", "n_emails", "n_phones", "redacted_md5")
      .as[(Long, Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 1 && out(1L)._3 == 1 && out(1L)._4 == 1)
    assert(out(2L)._2 == 0 && out(2L)._3 == 0 && out(2L)._4 == 0)
    // digest equals md5 of the manually redacted string
    val expected = spark.sql(
      "SELECT md5('mail me at [EMAIL] or visit [URL] call [PHONE]')")
      .as[String].head()
    assert(out(1L)._5 == expected)
  }

  test("labelCentroids: hand-computed micro means, negative components floor portably") {
    // Dyadic components (0.25, 0.75 — exact in float) keep the micro
    // quantization predictable; label 0 avgs to (0.5, -0.5) with a
    // NEGATIVE dim-2 sum exercising the shift-portable floor division:
    // s = -1000000, n = 2 -> (-1000000 + 2000000) div 2 - 1000000 = -500000.
    val e = Seq(
      (1L, Array(0.25f, -0.25f), 0),
      (2L, Array(0.75f, -0.75f), 0),
      (3L, Array(1.0f, 0.5f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.labelCentroids(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out((0L, 1L)) == ((2L, 500000L)))
    assert(out((0L, 2L)) == ((2L, -500000L)))
    assert(out((1L, 1L)) == ((1L, 1000000L)))
    assert(out((1L, 2L)) == ((1L, 500000L)))
    // partitioning invariance: integer sums are order-free
    val again = Similarity.labelCentroids(e.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(again == out)
  }

  test("centroidSeparation: hand micro^2 distances, scatter, ppm ratio") {
    // same dyadic fixture, dims=2: centroids L0=(0.5,-0.5), L1=(1.0,0.5)
    val e = Seq(
      (1L, Array(0.25f, -0.25f), 0),
      (2L, Array(0.75f, -0.75f), 0),
      (3L, Array(1.0f, 0.5f), 1))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.centroidSeparation(e, dims = 2).collect()(0)
    assert(r.getLong(0) == 0L && r.getLong(1) == 1L)
    // between = (500000-1000000)^2 + (-500000-500000)^2 = 1.25e12
    assert(r.getAs[Long]("between_micro2") == 1250000000000L)
    // label-0 scatter: each vector sits 250000 off per dim ->
    // 4 * 250000^2 = 2.5e11; label-1 scatter 0; per-vector = 2.5e11/3
    val within = 250000000000L / 3L
    assert(r.getAs[Long]("within_micro2") == within)
    assert(r.getAs[Long]("separability_ppm") ==
      (BigInt(1250000000000L) * 1000000 / within).toLong)
  }

  test("centroidClassify: separable classes recover their own labels") {
    // Two tight classes on orthogonal axes + one off-axis probe:
    // every member scores its own centroid highest; the probe (label 0
    // but nearer axis y) crosses over — the classifier must say 1.
    val e = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.9f, 0.1f), 0),
      (3L, Array(0.0f, 1.0f), 1), (4L, Array(0.1f, 0.9f), 1),
      (5L, Array(0.2f, 0.8f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.centroidClassify(e).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((0L, 0L)) && out(2L) == ((0L, 0L)))
    assert(out(3L) == ((1L, 1L)) && out(4L) == ((1L, 1L)))
    assert(out(5L)._2 == 1L, s"off-axis probe must cross over, got ${out(5L)}")
    assert(out.size == 5)
  }

  test("decontaminateSemantic: planted eval-twin flagged, orthogonal rows keep") {
    // eval vec 100 = corpus vec 1's direction (cos 1.0); corpus vec 2
    // is orthogonal to the whole eval set; corpus 3 sits at cos 0.6 to
    // eval 101 — above the 0.4 bar, a hit.
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.6f, -0.8f)))
      .toDF("vec_id", "embedding")
    val evalSet = Seq(
      (100L, Array(1.0f, 0.0f)),
      (101L, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Dedup.decontaminateSemantic(corpus, evalSet, threshold = 0.4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(3)))).toMap
    assert(out(1L) == ((2L, false)), "twin must hit BOTH identical eval vecs")
    assert(out(2L) == ((0L, true)), "orthogonal row keeps")
    assert(out(3L) == ((2L, false)), "cos 0.6 >= 0.4 is a leak")
    assert(out.size == 3, "every corpus row reports")
  }
}

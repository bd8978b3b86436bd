package graft

import graft.operators.{Projections, Revenue}
import graft.cdc.Upsert
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions.col

/** Plan-shape regression tests — the scale contract, asserted.
  *
  * These pin the physical properties that keep the engine viable at
  * 100 TB: pruned scans, pushed filters, broadcast dimension joins,
  * agg-based (sort-free) latest-by-key. A refactor that silently turns
  * the broadcast join into a sort-merge join or widens a scan fails
  * here, not in a cluster postmortem.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("revenue MV: broadcast join, pushed filters, pruned fact scan") {
    val p = plan(Revenue.movieRevenue(
      Revenue.ticketsFromLineitem(Tables.load(spark, dir, "lineitem")),
      Revenue.moviesFromPart(Tables.load(spark, dir, "part")),
      Revenue.testdataStatuses))
    assert(p.contains("BroadcastHashJoin"), "dimension join must broadcast")
    assert(!p.contains("SortMergeJoin"))
    assert(p.contains("IsNotNull(l_shipdate)"), "filter must reach the scan")
    // fact scan reads only the 4 needed columns of lineitem's 11
    val readSchemas = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(readSchemas.exists(s => s.contains("l_partkey") && !s.contains("l_quantity")
      && !s.contains("l_orderkey")), s"fact scan not pruned: $readSchemas")
  }

  test("projection: column pruning reaches the parquet scan") {
    val p = plan(Projections.movies(Tables.load(spark, dir, "part")))
    val rs = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(rs.contains("p_partkey") && !rs.contains("p_retailprice"),
      s"unneeded column read: $rs")
  }

  test("latestByKey: partial+final aggregate, one exchange, no window") {
    import spark.implicits._
    val df = Seq((1L, 2L, "x")).toDF("k", "ts", "v")
    val p = plan(Upsert.latestByKey(df, Seq("k"), Seq("ts")))
    // struct payloads make the planner choose SortAggregate (hash agg
    // needs fixed-width buffers); the contract is: two-phase agg with
    // map-side partial reduction, a single exchange, and no Window.
    assert(p.linesIterator.count(_.trim.matches("""\(\d+\) \w*Aggregate.*""")) == 2,
      "partial+final aggregation expected")
    assert(p.linesIterator.count(_.trim.startsWith("Exchange")) <= 1,
      "latest-by-key must shuffle once")
    assert(!p.contains("Window"), "row_number window formulation regressed in")
  }

  test("near-dup pairing plans carry no all-pairs join") {
    // the scale contract for the pairing family: candidates come from
    // equi-joins (LSH buckets / simhash blocks), never a cartesian —
    // BroadcastNestedLoopJoin over N² pairs is dead at 100 TB
    val emb = Tables.load(spark, dir, "embeddings")
    val docs = Tables.load(spark, dir, "documents")
    for ((name, df) <- Seq(
        "embeddingNearDup" -> operators.Dedup.embeddingNearDup(emb, threshold = 0.4),
        "simHashPairs" -> operators.Dedup.simHashPairs(docs, maxDist = 3),
        // the pipeline's lazily-planned stage (canonicalization behind
        // it is checkpoint-truncated equi-join rounds, asserted in
        // OperatorsSpec)
        "dedupPipeline edges" -> operators.Dedup.nearDupEdges(docs))) {
      val p = plan(df)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name is all-pairs")
      assert(!p.contains("CartesianProduct"), s"$name is all-pairs")
    }
  }

  test("r12 analytics: invoice pairing equi-joins on the customer block, kendall's only non-equi join is over the bounded weekly table") {
    val orders = Tables.load(spark, dir, "orders")
    // near-duplicate invoices: the o_custkey equality must be the JOIN
    // KEY (hash/sort-merge), the tolerance bands mere residuals — a
    // nested-loop here is all-pairs O(n²) at 100 TB
    val pInv = plan(graft.operators.CustomerOps.invoiceNearMatches(orders))
    assert(!pInv.contains("NestedLoop") && !pInv.contains("CartesianProduct"),
      s"invoice pairing must block on the customer key:\n$pInv")
    // kendall: the week-pair join is genuinely non-equi, but it runs
    // over the calendar-bounded weekly AGGREGATE (broadcast), never
    // fact rows
    val pK = plan(graft.operators.Stats.kendallWeekly(orders))
    assert(pK.contains("BroadcastNestedLoopJoin"),
      s"week pairs must broadcast the bounded weekly table:\n$pK")
    // decile migration rides the two-phase rank (assignIds
    // localCheckpoints its slice-partitioned windows, whose
    // window-form equality IdsSpec pins): the FINAL plan must carry
    // no window at all — a windowspecdefinition here would mean the
    // ranking regressed to a live (potentially global) window
    val pD = plan(graft.operators.CustomerOps.decileMigration(orders))
    assert(!pD.contains("windowspecdefinition"),
      s"decile migration must rank via the checkpointed two-phase pass:\n$pD")
    assert(!pD.contains("CartesianProduct"))
  }

  test("round-8 ops: equi-join-only pairing, broadcast fusion sides") {
    val docs = Tables.load(spark, dir, "documents")
    val emb = Tables.load(spark, dir, "embeddings")
    // image near-dup joins on (block, value) — never a cartesian
    val img = plan(operators.Multimodal.imageNearDupPairs(
      operators.Multimodal.encodePng(docs), maxDist = 2))
    assert(!img.contains("BroadcastNestedLoopJoin") && !img.contains("CartesianProduct"),
      s"image pairing is all-pairs:\n$img")
    // hybrid RRF: the lexical side keeps bm25's broadcast-probe shape
    // (query terms / df broadcast against postings), and the fusion
    // join itself is an equi-join of two bounded rank lists
    val rrf = plan(operators.Retrieval.hybridRrfTopK(
      docs, emb, docs.filter(col("doc_id") % 191 === 0),
      emb.filter(col("vec_id") % 191 === 0)))
    assert(rrf.contains("BroadcastHashJoin"), "bm25 probe must broadcast")
    assert(!rrf.contains("CartesianProduct"), s"fusion went all-pairs:\n$rrf")
    // tokenizer-metered budget: doc bodies feed the tokenizer scan and
    // the quality scan; the quota window shuffles id-keyed rows only
    val bmb = plan(operators.TextOps.budgetMixTokenized(docs,
      operators.Bpe.encode(docs, operators.Bpe.Model(Seq(("a", "b"))))
        .select(col("doc_id"), col("n_pieces").as("n_tokens"))))
    assert(!bmb.contains("CartesianProduct"), s"budget join went all-pairs:\n$bmb")
  }

  test("round-6 curation ops: aggregate-only / broadcast-only plans") {
    val docs = Tables.load(spark, dir, "documents")
    val emb = Tables.load(spark, dir, "embeddings")
    // domainWeights: one partial+final aggregate over the corpus plus a
    // broadcast of the single-row total — no sort, no SMJ, no window
    val dw = plan(operators.TextOps.domainWeights(docs))
    assert(dw.contains("HashAggregate"), dw)
    assert(dw.contains("BroadcastExchange") || dw.contains("BroadcastNestedLoopJoin"),
      "global total must ride a broadcast")
    assert(!dw.contains("SortMergeJoin") && !dw.contains("Window"), dw)
    // token sums must not drag the document bodies through the exchange
    assert(!dw.linesIterator.exists(l => l.contains("Exchange") && l.contains("text")),
      "document bodies in the shuffle")
    // contrastive triplets: the negative stage is a broadcast scan, the
    // positive join is an equi-join on the anchor id — no cartesian
    val ct = plan(operators.Similarity.contrastiveTriplets(emb, threshold = 0.4))
    assert(!ct.contains("CartesianProduct"), ct)
    // PCA projection: narrow map over the scan — no exchange at all
    // beyond the deterministic spread repartition
    val model = operators.Pca.fit(emb, k = 2, iters = 10)
    val pj = plan(operators.Pca.project(emb, model))
    assert(!pj.contains("SortMergeJoin") && !pj.contains("HashAggregate"), pj)
  }

  test("round-7 curation ops: hash-keyed census, broadcast target set, no cartesian") {
    val docs = Tables.load(spark, dir, "documents")
    // segmentDedup: the duplicate census and the filter join key on the
    // md5 hash — document text must not ride the census exchange; no
    // cartesian/BNLJ anywhere
    val sd = plan(operators.TextOps.segmentDedup(docs))
    assert(!sd.contains("CartesianProduct") && !sd.contains("BroadcastNestedLoopJoin"), sd)
    assert(sd.contains("HashAggregate"), "hash census expected: " + sd)
    // substrDedup: same census shape with sliding windows — equi-joins
    // only, no cartesian/BNLJ
    val ss = plan(operators.TextOps.substrDedup(docs))
    assert(!ss.contains("CartesianProduct") && !ss.contains("BroadcastNestedLoopJoin"), ss)
    // targetAffinity: the target's distinct-hash set broadcasts; the
    // per-doc count is aggregate-only
    val ta = plan(operators.TextOps.targetAffinity(
      docs, docs.filter(col("source") === "src0")))
    assert(ta.contains("BroadcastExchange"), "target set must broadcast: " + ta)
    assert(!ta.contains("CartesianProduct") && !ta.contains("SortMergeJoin"), ta)
    // lengthBuckets: narrow arithmetic + one bucket-partitioned window;
    // no join at all
    val lb = plan(operators.TextOps.lengthBuckets(docs))
    assert(lb.contains("Window"), lb)
    assert(!lb.contains("Join"), "no join belongs in bucket assignment: " + lb)
    // dsirWeights: both count models broadcast (≤4096 rows each); the
    // doc side never sort-merge joins and nothing goes cartesian
    val dw = plan(operators.TextOps.dsirWeights(
      docs, docs.filter(col("source") === "src0")))
    assert(dw.contains("BroadcastExchange"), "bucket models must broadcast: " + dw)
    assert(!dw.contains("CartesianProduct") && !dw.contains("SortMergeJoin") &&
      !dw.contains("BroadcastNestedLoopJoin"), dw)
    // bm25TopK: inverted-index probe — query terms and df broadcast-
    // hash-join against postings; the only nested-loop is the 1-row
    // corpus-stats attach; no cartesian, no sort-merge join
    val bm = plan(operators.Retrieval.bm25TopK(
      docs, docs.filter(col("doc_id") % 191 === 0)))
    assert(bm.contains("BroadcastHashJoin"), "broadcast probe expected: " + bm)
    assert(!bm.contains("CartesianProduct") && !bm.contains("SortMergeJoin"), bm)
  }

  test("round-7 monitors: digest-keyed windows/joins, broadcast totals, no cartesian") {
    val docs = Tables.load(spark, dir, "documents")
    val events = Tables.load(spark, dir, "events")
    // novelty: same sliding-window census as substrDedup — window keys
    // are the 16-byte hash pair, no cartesian/BNLJ
    val nv = plan(operators.TextOps.novelty(docs))
    assert(!nv.contains("CartesianProduct") && !nv.contains("BroadcastNestedLoopJoin"), nv)
    assert(nv.contains("Window"), "census windows expected: " + nv)
    // corpusDrift: the <=4096-row model table finishes on the driver
    // (each corpus scanned exactly once upstream); the returned frame
    // is a single local row — no distributed plan left to mis-shape
    val cd = plan(operators.TextOps.corpusDrift(
      docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1)))
    assert(cd.contains("LocalTableScan") && !cd.contains("Exchange"), cd)
    // blocklist: narrow scan-speed pass — no join, no exchange beyond
    // the scan itself
    val bl = plan(operators.TextOps.blocklistFilter(docs, Seq("slow", "dup")))
    assert(!bl.contains("Join") && !bl.contains("Window"), bl)
    // editDistancePairs: pairs form inside __blk equi-join buckets
    // only; the block-size guard is a same-key window, never cartesian
    val ed = plan(operators.Dedup.editDistancePairs(docs))
    assert(!ed.contains("CartesianProduct") && !ed.contains("BroadcastNestedLoopJoin"), ed)
    // grouped heavy hitters: candidates and totals broadcast into the
    // recount; no cartesian/BNLJ
    val hh = plan(operators.Sketches.heavyHittersExactByGroup(docs))
    assert(hh.contains("BroadcastExchange"), "candidate set must broadcast: " + hh)
    assert(!hh.contains("CartesianProduct") && !hh.contains("BroadcastNestedLoopJoin"), hh)
    // sq8 codes: broadcast-literal bounds -> pure narrow transform
    val sq = plan(operators.Sq8.codes(
      Tables.load(spark, dir, "embeddings"),
      operators.Sq8.Model(Array.fill(64)(0.0), Array.fill(64)(1.0))))
    assert(!sq.contains("Join") && !sq.contains("Exchange"),
      "codes must be a narrow scan pass: " + sq)
    // diagnostics: lateness = one keyed window + <=64-row aggregate;
    // skew = two aggregates; neither joins
    val lp = plan(operators.EventOps.latenessProfile(events))
    assert(lp.contains("Window") && !lp.contains("Join"), lp)
    val ks = plan(operators.EventOps.keySkewProfile(events, "user_id"))
    assert(!ks.contains("Join") && !ks.contains("Window"), ks)
  }

  test("IVF probe join is salted: keyed on (cluster, chunk), index layout reused") {
    // the round-3 defect: a probe join keyed on cluster alone is a
    // ≤nClusters-key exchange (max 16-way parallelism at the old
    // default, hot-centroid skew). The fix pins BOTH halves of the
    // salted key in the join, and nClusters scales with the corpus.
    val emb = Tables.load(spark, dir, "embeddings")
    assert(operators.IvfIndex.autoClusters(2000) >= 64,
      "auto cluster count must scale past the old fixed 16")
    val idx = operators.IvfIndex.build(emb, nClusters = 8, chunksPerList = 4)
    try {
      val p = plan(operators.IvfIndex.query(idx, emb, k = 3, probes = 2))
      val joinKeyLines = p.linesIterator
        .filter(l => l.contains("keys") || l.contains("Keys")).toSeq
      assert(joinKeyLines.exists(l => l.contains("cluster") && l.contains("chunk")),
        s"probe join must be keyed on (cluster, chunk), got: $joinKeyLines")
      assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
        "query must reuse the persisted index lists, not recompute them")
    } finally idx.close()
  }

  test("corpus curation: equi-joins only, pruned document scans") {
    val docs = Tables.load(spark, dir, "documents")
    val p = plan(operators.TextOps.curateCorpus(docs))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "curation must stay equi-join only")
    // document bodies feed the narrow quality/langid expressions but
    // must not survive into any join exchange
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString
    assert(!exchanges.contains("text#"), s"document bodies shuffled: $exchanges")
  }

  test("full corpus pipeline: equi-joins only, bodies never shuffled") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.load(spark, dir, "documents")
    val p = plan(operators.TextOps.prepareCorpus(
      docs.filter(col("doc_id") % 97 =!= 0), docs.filter(col("doc_id") % 97 === 0)))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "the composed pipeline must stay equi-join only")
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString
    assert(!exchanges.contains("text#"), s"document bodies shuffled: $exchanges")
  }

  test("IVF-PQ probe join: salted key, codes not vectors, index layout reused") {
    val emb = Tables.load(spark, dir, "embeddings")
    val idx = operators.PqIndex.build(emb, nClusters = 8, chunksPerList = 4)
    try {
      val p = plan(operators.PqIndex.query(idx, emb, emb, k = 3, probes = 2))
      val joinKeyLines = p.linesIterator
        .filter(l => l.contains("keys") || l.contains("Keys")).toSeq
      assert(joinKeyLines.exists(l => l.contains("cluster") && l.contains("chunk")),
        s"probe join must be keyed on (cluster, chunk), got: $joinKeyLines")
      assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
        "query must reuse the persisted code lists, not recompute them")
      // the PQ point: no full vectors on the list side of the probe join —
      // the cached lists' Output is (vec_id, cluster, codes, chunk); the
      // only vector fetches are the refine stage's id-equi-joins
      val lines = p.linesIterator.toSeq
      val cachedOut = lines.zipWithIndex
        .filter(_._1.trim.matches("""\(\d+\) InMemoryTableScan.*"""))
        .map { case (_, i) => lines(i + 1) }.mkString
      assert(cachedOut.contains("codes#") && !cachedOut.contains("embedding"),
        s"lists must carry packed codes, not vectors: $cachedOut")
      // probe-side exchange ships the query VECTOR, never the 4× larger
      // ADC lookup table (LUTs build post-join at the list side)
      val exchanges = lines.zipWithIndex
        .filter(_._1.trim.matches("""\(\d+\) Exchange.*"""))
        .map { case (_, i) => lines(i + 1) }.mkString
      assert(exchanges.contains("qv#") && !exchanges.contains("lut"),
        s"probe exchange must carry qv, not the LUT: $exchanges")
    } finally idx.close()
  }

  test("fluency: integer-only exchanges, document bodies never shuffled") {
    val docs = Tables.load(spark, dir, "documents")
    val p = plan(operators.TextOps.unigramFluency(docs))
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString
    assert(!exchanges.contains("text#"), s"document bodies shuffled: $exchanges")
    assert(p.contains("HashAggregate"), "tf/cf must partial-aggregate map-side")
  }

  test("decontamination: eval shingles broadcast, corpus side never join-shuffled") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.load(spark, dir, "documents")
    val p = plan(operators.TextOps.decontaminate(
      docs.filter(col("doc_id") % 97 =!= 0), docs.filter(col("doc_id") % 97 === 0)))
    assert(p.contains("BroadcastHashJoin"),
      "eval set is tiny next to the corpus — the shingle join must broadcast it")
    assert(!p.contains("SortMergeJoin"),
      "corpus shingles must not be shuffled for the join (broadcast regressed)")
  }

  test("packing/chunking/redaction/vocab: narrow or sharded plans, no global sort") {
    val docs = Tables.load(spark, dir, "documents")
    // packing: the running total must window per shard, never globally
    val pk = plan(operators.TextOps.packSequences(docs))
    assert(pk.contains("Window"), "packing is a running total")
    assert(!pk.contains("SinglePartition"),
      "packing window must partition by shard — a global window is the 100 TB anti-plan")
    // chunking and redaction are per-row: zero exchanges
    for ((n, df) <- Seq("chunk" -> operators.TextOps.chunk(docs),
        "redactPii" -> operators.TextOps.redactPii(docs))) {
      val p = plan(df)
      assert(!p.linesIterator.exists(_.trim.startsWith("Exchange")),
        s"$n must be narrow (scan-speed), found an exchange")
    }
    // vocabulary: top-N via per-partition heaps, not a global sort
    val pv = plan(operators.TextOps.vocabulary(docs))
    assert(pv.contains("TakeOrderedAndProject"),
      "vocabulary top-N must use bounded heaps, not a global Sort+Limit")
  }

  test("semantic near-dup and knn classify: equi-joins only, agg-based ranking") {
    val emb = Tables.load(spark, dir, "embeddings")
    val ps = plan(operators.Dedup.semanticNearDup(emb, threshold = 0.4))
    assert(!ps.contains("BroadcastNestedLoopJoin") && !ps.contains("CartesianProduct"),
      "cluster blocking must stay equi-join only")
    val pk = plan(operators.Similarity.knnClassify(emb, k = 5))
    assert(!pk.contains("Window"),
      "vote argmax must be the min_by aggregate, not a window sort")
    assert(!pk.contains("CartesianProduct"))
  }

  test("bloom decontamination: might-contain prefilter sits on the corpus scan") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.load(spark, dir, "documents")
    val p = plan(operators.TextOps.decontaminateBloom(
      docs.filter(col("doc_id") % 97 =!= 0), docs.filter(col("doc_id") % 97 === 0)))
    assert(p.contains("might_contain"),
      "the bloom prefilter must be in the plan, before the join")
    assert(p.contains("BroadcastHashJoin"),
      "the exact re-verify join must still broadcast the eval side")
  }

  test("round-9 ops: range-exchange rank, broadcast PMI sides, narrow z-order") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.load(spark, dir, "documents")
    // two-phase ids: the rank stage materializes ONCE behind a
    // consistency checkpoint (re-executing would resample the range
    // boundaries — offsets from one sampling joined to ranks from
    // another mis-rank), so the visible plan is the checkpointed rank
    // scan joined to the BROADCAST offsets — never a shuffle join,
    // never a partition-less window. The rank stage's own
    // range-exchange + _pid-window shape is asserted behaviorally in
    // IdsSpec (window-form equality + partitioning invariance).
    val pi = plan(operators.Ids.assignIds(docs,
      Seq(org.apache.spark.sql.functions.md5(col("doc_id").cast("string")),
        col("doc_id")), "id"))
    assert(pi.contains("Scan ExistingRDD"),
      "rank stage must be pinned behind the consistency checkpoint")
    assert(pi.contains("BroadcastHashJoin") && !pi.contains("SortMergeJoin"),
      "prefix offsets must broadcast")
    assert(!pi.linesIterator.exists(l =>
      l.contains("Window") && l.contains("PartitionBy: []")),
      "no global window anywhere")
    // collocations: count sides broadcast, no sort-merge join, bodies
    // never shuffled
    val pc = plan(operators.TextOps.collocations(docs))
    assert(pc.contains("BroadcastHashJoin") && !pc.contains("SortMergeJoin"),
      "unigram count joins must broadcast")
    val cex = pc.linesIterator.filter(_.contains("Exchange")).mkString
    assert(!cex.contains("text#"), s"document bodies shuffled: $cex")
    // z-order codes: a pure projection — no exchange, no join
    val orders = Tables.load(spark, dir, "orders")
    val pz = plan(operators.Layout.ordersZorder(orders))
    assert(!pz.contains("Exchange") && !pz.contains("Join"),
      "morton codes must be a narrow scan-speed projection")
    // pagerank: equi-joins only, no cartesian/nested-loop
    val pr = plan(operators.GraphOps.purchaseGraph(orders,
      Tables.load(spark, dir, "lineitem")))
    assert(!pr.contains("CartesianProduct") &&
      !pr.contains("BroadcastNestedLoopJoin"))
  }

  test("pricing SQL through the catalog: partial+final agg, single exchange") {
    Tables.registerAll(spark, dir)
    val p = plan(spark.sql(SparkEntry.PricingSql))
    assert(p.contains("HashAggregate"))
    // two-phase agg = exactly one shuffle before the final sort
    val exchanges = p.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 2, s"expected agg+sort exchanges only, got $exchanges")
  }

  test("funnel: window-free — chained aggregates, no Window, no Sort") {
    val p = plan(graft.operators.Analytics.funnel(Tables.load(spark, dir, "events")))
    assert(!p.contains("Window"), "funnel must not assemble per-user timelines")
    assert(!p.linesIterator.exists(_.trim.matches("""\(\d+\) Sort.*""")),
      "funnel stages are min-aggregates, never sorts")
    assert(p.contains("HashAggregate"))
  }

  test("rollingWindow: one exchange on the partition key feeding one Window") {
    val p = plan(graft.operators.EventOps.rollingWindow(Tables.load(spark, dir, "events")))
    assert(p.contains("Window"))
    assert(p.linesIterator.count(_.trim.matches("""\(\d+\) Exchange.*""")) == 1,
      "rolling frame needs exactly the key exchange:\n" +
        p.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
  }

  test("countAnomalies: windows run over the hourly aggregate, not raw events") {
    val p = plan(graft.operators.Analytics.countAnomalies(Tables.load(spark, dir, "events")))
    // the aggregate must appear BELOW the window in the plan walk:
    // formatted explain lists operators leaves-first, so the hash
    // aggregate's node id must be smaller than the window's
    def firstId(pat: String): Int =
      p.linesIterator.map(_.trim).collectFirst {
        case l if l.matches(s"""\\(\\d+\\) $pat.*""") =>
          l.drop(1).takeWhile(_ != ')').toInt
      }.getOrElse(Int.MaxValue)
    assert(firstId("HashAggregate") < firstId("Window"),
      "baseline windows must consume (group, hour) rows, not raw events")
  }

  test("keywords: bounded in-group ranking — no Window over the exploded corpus") {
    val p = plan(graft.operators.TextOps.keywords(Tables.load(spark, dir, "documents")))
    assert(!p.contains("Window"),
      "per-doc top-k is a collect+array_sort aggregate, never a window sort")
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"))
  }

  test("histogram: two-pass shape — broadcast 1-row bounds, one bucket aggregate") {
    val p = plan(graft.operators.Stats.histogram(Tables.load(spark, dir, "orders")))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the (min,max) bounds row must broadcast, not shuffle-join")
    assert(!p.linesIterator.exists(_.trim.matches("""\(\d+\) Sort.*""")),
      "bucketing is a floor division at scan speed, never a sort")
  }

  test("peakConcurrency: no global single-partition window anywhere in the sweep") {
    // the operator is eager (driver combine) — pin the law on its
    // deltas-side building block instead: the sessionize windows it
    // consumes are PARTITIONED (per-user), and the sweep itself is a
    // range exchange + per-partition fold with an O(partitions)
    // driver combine, asserted behaviorally in AnalyticsSpec. Here:
    // the session assembly must not contain a partition-less window.
    val sessions = graft.operators.EventOps.sessionize(
      Tables.load(spark, dir, "events"))
    val p = plan(sessions)
    val globalWindow = p.linesIterator.exists(l =>
      l.contains("Window") && l.contains("PartitionBy: []"))
    assert(!globalWindow, "session windows must partition by user")
  }

  test("ksDrift/mannWhitney: cumulative counts never use a global window") {
    for (df <- Seq(
      graft.operators.Stats.ksDrift(Tables.load(spark, dir, "events")),
      graft.operators.Stats.mannWhitney(Tables.load(spark, dir, "events")))) {
      val p = plan(df)
      val globalWindow = p.linesIterator.exists(l =>
        l.contains("Window") && l.contains("PartitionBy: []"))
      assert(!globalWindow,
        "ECDF cumulatives must ride the range-exchange prefix sum, " +
          "not a single-partition window")
    }
  }

  test("star join: date filter pushed to the orders scan, fact scan pruned, dims broadcast") {
    val p = plan(graft.operators.DecisionSupport.regionalRevenue(
      Tables.load(spark, dir, "region"), Tables.load(spark, dir, "nation"),
      Tables.load(spark, dir, "customer"), Tables.load(spark, dir, "supplier"),
      Tables.load(spark, dir, "orders"), Tables.load(spark, dir, "lineitem")))
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      "order-date range must reach the orders parquet scan as a pushed filter")
    val liSchema = p.linesIterator.filter(l => l.contains("ReadSchema") &&
      l.contains("l_extendedprice")).mkString
    assert(liSchema.contains("l_discount") && !liSchema.contains("l_quantity")
      && !liSchema.contains("l_shipdate"),
      s"lineitem scan must read only the 4 needed columns: $liSchema")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "every dimension must broadcast — no shuffle join in the star")
  }
}

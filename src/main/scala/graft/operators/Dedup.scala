package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication family for training-data pipelines (north-star
  * extensions, BASELINE.json): exact, n-gram Jaccard, MinHash+LSH,
  * SimHash, embedding-cosine near-dup.
  *
  * Hashing is md5-hex everywhere — slower per byte than xxhash but
  * bit-identical across engines (the DuckDB oracle computes the same
  * strings), and still cheap relative to the shuffle the pairing step
  * needs. Swap `HashFns.shingleHash` for `xxhash64` on a real cluster
  * if profiling demands it; nothing downstream depends on the choice.
  */
object Dedup {

  /** Exact dedup: canonical = min doc_id among identical texts. Hash
    * groupBy on md5(text) — one shuffle keyed by a 32-char digest, not
    * the document body (at 100 TB shuffling full texts is the mistake
    * this avoids). */
  def exact(docs: DataFrame): DataFrame = {
    val canon = docs
      .select(md5(col("text")).as("__h"), col("doc_id"))
      .groupBy("__h").agg(min("doc_id").as("canonical_id"))
    docs.select(col("doc_id"), md5(col("text")).as("__h"))
      .join(canon, "__h")
      .select(col("doc_id"), col("canonical_id"),
        (col("doc_id") =!= col("canonical_id")).as("is_dup"))
  }

  /** [[exact]] over canonically-normalized text
    * ([[TextOps.normalized]]): case / punctuation / whitespace variant
    * duplicates collapse to one canonical doc — the normalize-then-
    * hash exact-dedup pass a crawl pipeline runs before the fuzzy
    * family. Same digest-keyed single-shuffle shape as [[exact]]. */
  def exactNormalized(docs: DataFrame): DataFrame =
    exact(docs.withColumn("text", TextOps.normalized(col("text"))))

  /** Duplicate-group size profile over a content key — the monitoring
    * view every dedup run reports (how much of the corpus collapses,
    * and in what group sizes: a spike at large sizes means
    * boilerplate/crawl loops). Default key = full-text digest (the
    * [[exact]] groups); pass a coarser key — e.g. an opening-tokens
    * digest — to profile boilerplate prefixes. One row per observed
    * group size: (group_size, n_groups, n_docs), ascending.
    *
    * Scale shape: digest-keyed count (the [[exact]] shuffle) then a
    * group-size-keyed count over one row PER GROUP — output rows are
    * bounded by the largest group size, never the corpus. */
  def groupStats(docs: DataFrame,
                 key: Column = md5(col("text"))): DataFrame =
    docs.select(key.as("__h"))
      .groupBy("__h").agg(count(lit(1)).as("group_size"))
      .groupBy("group_size").agg(count(lit(1)).as("n_groups"))
      .select(col("group_size"), col("n_groups"),
        (col("group_size") * col("n_groups")).as("n_docs"))

  /** Cross-source duplication matrix — WHICH corpora duplicate into
    * which: for every unordered source pair (a ≤ b), the number of
    * duplicate document pairs whose members sit in those sources,
    * keyed on any content digest (same `key` contract as
    * [[groupStats]]). The provenance view a curation team reads
    * before deciding which crawl to drop: a heavy off-diagonal cell
    * means two feeds ship the same content; a heavy diagonal means a
    * feed duplicates itself.
    *
    * Scale shape: one digest-keyed count per (digest, source) — the
    * [[exact]] shuffle with a source column — then a per-digest
    * self-join over SOURCE COUNTS (rows per digest = #distinct
    * sources holding it, not group size: a 10⁶-copy digest in 3
    * sources contributes 6 count rows, never 10¹² pairs), and a
    * ≤|sources|² aggregate. Pair arithmetic is exact integers:
    * n_a·n_b off-diagonal, C(n_a, 2) on it. */
  def crossSourceMatrix(docs: DataFrame,
                        key: Column = md5(col("text"))): DataFrame = {
    val counts = docs.select(key.as("__h"), col("source"))
      .groupBy("__h", "source").agg(count(lit(1)).as("n"))
    val l = counts.select(col("__h"), col("source").as("source_a"), col("n").as("na"))
    val r = counts.select(col("__h"), col("source").as("source_b"), col("n").as("nb"))
    l.join(r, "__h").filter(col("source_a") <= col("source_b"))
      .select(col("source_a"), col("source_b"),
        when(col("source_a") === col("source_b"),
          expr("na * (na - 1) DIV 2")).otherwise(col("na") * col("nb"))
          .cast("bigint").as("pairs"))
      .groupBy("source_a", "source_b")
      .agg(sum(col("pairs")).as("n_dup_pairs"))
      .filter(col("n_dup_pairs") > 0)
  }

  /** Exploded (doc_id, shingle) pairs, distinct per doc. */
  private def shingleRows(docs: DataFrame, n: Int): DataFrame =
    TextOps.withShingles(docs, n)
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))

  /** N-gram Jaccard near-dup pairs: J(a,b) = |A∩B| / |A∪B| ≥ threshold.
    *
    * Plan: explode distinct shingles → self-join on shingle (the only
    * shuffle, keyed by shingle) → count per pair → join sizes →
    * filter. Quadratic only within a shingle's posting list; at scale
    * use [[dedupPipeline]], which runs [[minHashLsh]] first and
    * Jaccard-verifies only candidates.
    */
  /** Internal 128-bit shingle key: two seeded xxhash64 longs — 16
    * bytes on the wire vs md5's 32-char string, and an order of
    * magnitude cheaper to compute. NOT parity-bearing (the oracle
    * derives duplicate flags from its own hashing; both sides agree on
    * content equality barring a simultaneous 2×64-bit collision, which
    * 128 bits keeps negligible at 100 TB shingle counts — the reason
    * a single xxhash64 would NOT be safe there). */
  private def shingleKeys(docs: DataFrame, n: Int): DataFrame =
    shingleRows(docs, n).select(col("doc_id"),
      xxhash64(col("shingle")).as("s1"),
      xxhash64(lit(1), col("shingle")).as("s2"))

  def ngramJaccard(docs: DataFrame, n: Int = 3, threshold: Double = 0.5): DataFrame = {
    // join key = 128-bit shingle hash pair: fixed 16-byte shuffle key
    // instead of the raw n-gram text (the shuffle moves digests, not
    // corpus)
    val sh = shingleKeys(docs, n)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val pairs = sh.as("x").join(sh.as("y"),
        col("x.s1") === col("y.s1") && col("x.s2") === col("y.s2"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "sza"), "a")
      .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "szb"), "b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sza") + col("szb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** Exact thresholded Jaccard set-similarity self-join via PREFIX
    * FILTERING (the AllPairs / PPJoin family: Bayardo et al. WWW'07
    * "Scaling Up All Pairs Similarity Search"; Xiao et al. WWW'08) —
    * result-identical to [[ngramJaccard]] (same (a, b, jaccard ≥ τ)
    * rows over the same n-shingle sets; the spec pins equality and the
    * driver oracle is the same brute-force SQL) but with the quadratic
    * shingle self-join replaced by a pruned candidate join:
    *
    *  1. order each document's shingles by GLOBAL document frequency
    *     ascending (rarest first — the canonical total order that
    *     minimizes posting lists), rank within the doc;
    *  2. keep only each doc's PREFIX of length |A| − ⌈τ·|A|⌉ + 1: if
    *     J(A,B) ≥ τ then |A∩B| ≥ τ·|A| (J ≤ i/|A|), so two docs whose
    *     prefixes under one total order are disjoint cannot reach τ —
    *     the prefix-filter theorem;
    *  3. self-join PREFIXES only, with the length filter
    *     min(|A|,|B|) ≥ τ·max(|A|,|B|) (also implied by J ≥ τ) in the
    *     join condition;
    *  4. exact-verify the surviving candidates with the same
    *     intersection count as [[ngramJaccard]].
    *
    * Why it matters at 100 TB: [[ngramJaccard]]'s self-join is
    * quadratic in every shingle's posting list — one boilerplate
    * shingle shared by 10⁶ docs is 10¹² join rows. Here that shingle
    * has the HIGHEST df, so it lands in almost no prefix; join work
    * concentrates on rare shingles with short posting lists. This is
    * the exact-answer scale path where MinHash+LSH ([[minHashLsh]])
    * is the approximate one — same pruning spirit, no recall loss.
    *
    * Two PPJoin refinements past plain AllPairs (both exact — the
    * sf0.1 selectivity probe measured 1,210 candidates per verified
    * pair before them, i.e. verification dominated the query):
    *
    *  - POSITIONAL filter (Xiao et al. §3.2), aggregate form: the
    *    same groupBy that dedups candidate rows counts each pair's
    *    shared-prefix tokens and their deepest ranks; beyond rank r a
    *    doc has only sz − r tokens left, so overlap ≤ shared + min(szₐ
    *    − rₐ, szᵦ − rᵦ) — pairs that cannot reach the equivalent
    *    overlap bar α = ⌈τ/(1+τ)·(szₐ+szᵦ)⌉ are pruned inside the
    *    dedup shuffle, before any verification.
    *  - ARRAY verify: surviving pairs fetch each doc's pre-aggregated
    *    sorted shingle array (one doc_id-keyed aggregate, reused for
    *    both sizes and sets) and count the intersection with one
    *    codegen'd linear merge per pair
    *    ([[graft.functions.SortedIntersectCount]]) — the former
    *    formulation re-exploded both docs' full shingle sets through a
    *    (pair × |A|)-row equi-join + groupBy, 16M rows at sf0.1; the
    *    built-in array_intersect is a quadratic interpreted fallback
    *    on struct elements. */
  def setSimJoin(docs: DataFrame, n: Int = 3, threshold: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = shingleKeys(docs, n)
    // one doc-keyed aggregate serves the rank join (sz), the length
    // filter, and the verify stage (set array)
    val sets = sh.groupBy("doc_id")
      .agg(count(lit(1)).as("sz"),
        sort_array(collect_list(struct(col("s1"), col("s2")))).as("set"))
    val sizes = sets.select("doc_id", "sz")
    val freq = sh.groupBy("s1", "s2").agg(count(lit(1)).as("df"))
    // rank shuffles on doc_id (bounded groups: a doc's own shingle
    // count); freq join shuffles on the 16-byte shingle key
    val ranked = sh.join(freq, Seq("s1", "s2"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("s1"), col("s2"))))
      .join(sizes, "doc_id")
    val prefix = ranked
      .filter(col("rnk") <= col("sz") - ceil(col("sz") * threshold) + 1)
      .select("doc_id", "s1", "s2", "sz", "rnk")
    val cand = prefix.as("x").join(prefix.as("y"),
        col("x.s1") === col("y.s1") && col("x.s2") === col("y.s2") &&
        col("x.doc_id") < col("y.doc_id") &&
        least(col("x.sz"), col("y.sz")).cast("double") >=
          greatest(col("x.sz"), col("y.sz")) * threshold)
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.sz").as("sza"), col("y.sz").as("szb"),
        col("x.rnk").as("ra"), col("y.rnk").as("rb"))
      // dedup + positional filter in ONE shuffle: overlap ≤ shared
      // prefix tokens + what remains past the deepest shared ranks
      .groupBy("a", "b", "sza", "szb")
      .agg(count(lit(1)).as("__shared"),
        max(col("ra")).as("__ra"), max(col("rb")).as("__rb"))
      // keep iff ub·(1+τ) ≥ τ·(szₐ+szᵦ), with an epsilon slack so a
      // double rounding can never prune a TRUE pair (false keeps are
      // harmless — the verify stage is exact)
      .filter((col("__shared") +
          least(col("sza") - col("__ra"), col("szb") - col("__rb")))
          .cast("double") * lit(1.0 + threshold) >=
        (col("sza") + col("szb")) * lit(threshold) - lit(1e-6))
      .select("a", "b")
    val inter = cand
      .join(sets.select(col("doc_id").as("a"), col("set").as("__seta"),
        col("sz").as("sza")), "a")
      .join(sets.select(col("doc_id").as("b"), col("set").as("__setb"),
        col("sz").as("szb")), "b")
      .select(col("a"), col("b"), col("sza"), col("szb"),
        graft.functions.SortedIntersectCount(col("__seta"), col("__setb"))
          .as("inter"))
    inter
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sza") + col("szb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** MinHash signatures: for seed s, minhash_s = lexicographic min of
    * md5(s || '|' || shingle) — a valid min-wise hash family, portable
    * across engines. One explode + k min-aggregates = a single shuffle
    * on doc_id regardless of k. */
  def minHashSignatures(docs: DataFrame, n: Int = 3, k: Int = 8): DataFrame =
    shingleRows(docs, n).groupBy("doc_id")
      .agg(
        min(md5(concat(lit("0|"), col("shingle")))).as("mh0"),
        (1 until k).map(s =>
          min(md5(concat(lit(s"$s|"), col("shingle"))))
            .as(s"mh$s")): _*)

  /** MinHash + LSH banding: k minhashes in `bands` bands of r = k/bands
    * rows; docs sharing any band hash become candidate pairs. Candidate
    * generation is a self-join keyed on (band, band_hash) — posting
    * lists are tiny for random data, so the join is near-linear; skew
    * from boilerplate-heavy buckets is AQE's skew-join case.
    */
  def minHashLsh(docs: DataFrame, n: Int = 3, k: Int = 8, bands: Int = 4): DataFrame = {
    val banded = bandRows(docs, n, k, bands)
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.band_hash") === col("y.band_hash") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
  }

  /** Candidate probability of a (bands, rowsPerBand) MinHash banding at
    * Jaccard similarity `s` — the classic S-curve `1 − (1 − s^r)^b`
    * (Indyk–Motwani; Leskovec–Rajaraman–Ullman ch. 3). Closed-form and
    * deterministic: the analytic mirror of what
    * [[Similarity.lshCandidateFraction]] MEASURES for hyperplane LSH. */
  def bandingCandidateProb(s: Double, bands: Int, rowsPerBand: Int): Double =
    1.0 - math.pow(1.0 - math.pow(s, rowsPerBand), bands)

  /** Operating-point selection for MinHash banding — the S-curve
    * mirror of [[PqIndex.tunedProbes]], finishing the family (IVF and
    * hyperplane-LSH pick their points by measurement, IVF-PQ by the
    * probe ladder; banding has a CLOSED FORM, so it tunes by
    * arithmetic): among the band counts dividing `k`, keep those whose
    * recall at the dedup threshold `tau` meets `minRecall`, then pick
    * the one minimizing the false-candidate rate at the background
    * similarity `sLow` (ties to fewer bands — cheaper join). When no
    * divisor meets the bar (k too small for the threshold), return the
    * max-recall divisor — the honest best the budget allows; callers
    * wanting guarantees raise k. Returns (bands, rowsPerBand). */
  def tuneBanding(k: Int, tau: Double, minRecall: Double = 0.9,
                  sLow: Double = 0.2): (Int, Int) = {
    require(k >= 1 && tau > 0 && tau <= 1, s"bad banding params k=$k tau=$tau")
    val divisors = (1 to k).filter(k % _ == 0)
    val meeting = divisors.filter(b => bandingCandidateProb(tau, b, k / b) >= minRecall)
    val chosen =
      if (meeting.nonEmpty)
        meeting.minBy(b => (bandingCandidateProb(sLow, b, k / b), b))
      else divisors.maxBy(b => (bandingCandidateProb(tau, b, k / b), -b))
    (chosen, k / chosen)
  }

  /** [[minHashLsh]] at the [[tuneBanding]]-selected operating point —
    * candidates for a `tau`-threshold dedup without hand-picking the
    * banding. */
  def minHashLshTuned(docs: DataFrame, n: Int = 3, k: Int = 8,
                      tau: Double = 0.5, minRecall: Double = 0.9): DataFrame =
    minHashLsh(docs, n, k, tuneBanding(k, tau, minRecall)._1)

  /** Record linkage (entity resolution over STRUCTURED records — the
    * Fellegi–Sunter blocking+scoring shape, the structured sibling of
    * the text near-dup family): candidate pairs come from equality
    * BLOCKS (never an all-pairs join), each pair scores the sum of
    * integer field-agreement weights, and pairs at or above the match
    * threshold survive. Weights here: +50 same market segment, +30
    * account balance within $100 (exact integer cents), +20 same
    * 2-char name suffix; threshold 50.
    *
    * Scale shape: ONE shuffle on the block key; pair work is
    * O(Σ block²). The wired block (nation, $1000-balance bucket)
    * bounds block sizes by the balance histogram — at 100× customers,
    * narrow the bucket (the standard blocking-key refinement), never
    * widen the join. The balance bucket shifts +1000 before the
    * floor-div so the operand stays non-negative (Spark `div`
    * truncates toward zero, DuckDB `//` floors — they agree only on
    * non-negative operands). */
  def recordLinkage(customer: DataFrame, minScore: Long = 50L): DataFrame = {
    val base = customer.select(col("c_custkey"), col("c_nationkey"),
      col("c_mktsegment"),
      expr("CAST(floor(c_acctbal * 100) AS BIGINT)").as("__cents"),
      expr("(CAST(floor(c_acctbal) AS BIGINT) + 1000L) div 1000L").as("__kb"),
      expr("substring(c_name, -2, 2)").as("__sfx"))
    val a = base.select(col("c_nationkey"), col("__kb"),
      col("c_custkey").as("a"), col("c_mktsegment").as("__seg_a"),
      col("__cents").as("__c_a"), col("__sfx").as("__s_a"))
    val b = base.select(col("c_nationkey"), col("__kb"),
      col("c_custkey").as("b"), col("c_mktsegment").as("__seg_b"),
      col("__cents").as("__c_b"), col("__sfx").as("__s_b"))
    a.join(b, Seq("c_nationkey", "__kb"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        (when(col("__seg_a") === col("__seg_b"), 50L).otherwise(0L) +
          when(abs(col("__c_a") - col("__c_b")) <= 10000L, 30L).otherwise(0L) +
          when(col("__s_a") === col("__s_b"), 20L).otherwise(0L)).as("score"))
      .filter(col("score") >= minScore)
      .orderBy("a", "b")
  }

  /** LSH quality audit — the measured counterpart of
    * [[bandingCandidateProb]]'s S-curve prediction: candidate pairs
    * from [[minHashLsh]] vs the EXACT τ-threshold truth from
    * [[setSimJoin]] (the prefix-filtered scale path, so the audit
    * itself runs at corpus scale), reduced to one row of exact
    * integer counts and floor-div ppm precision/recall. This is the
    * dedup-operations health check a pipeline runs before trusting a
    * banding configuration on a new corpus — analytic tuning assumes
    * the S-curve; the audit measures the corpus's actual pair mix. */
  def lshQualityAudit(docs: DataFrame, n: Int = 3, k: Int = 8,
                      bands: Int = 4, threshold: Double = 0.5): DataFrame = {
    val pred = minHashLsh(docs, n, k, bands).withColumn("__p", lit(1L))
    val truth = setSimJoin(docs, n, threshold).select(col("a"), col("b"))
      .withColumn("__t", lit(1L))
    pred.join(truth, Seq("a", "b"), "full_outer")
      // empty-corpus guard: a global sum over zero rows is NULL
      .agg(coalesce(sum(coalesce(col("__p"), lit(0L))), lit(0L))
          .as("n_candidates"),
        coalesce(sum(coalesce(col("__t"), lit(0L))), lit(0L)).as("n_true"),
        coalesce(sum(when(col("__p").isNotNull && col("__t").isNotNull, 1L)
          .otherwise(0L)), lit(0L)).as("tp"))
      .select(col("n_candidates"), col("n_true"), col("tp"),
        expr("""CASE WHEN n_candidates = 0 THEN NULL
                ELSE (tp * 1000000L) div n_candidates END""")
          .as("precision_ppm"),
        expr("""CASE WHEN n_true = 0 THEN NULL
                ELSE (tp * 1000000L) div n_true END""").as("recall_ppm"))
  }

  /** The (doc_id, band, band_hash) rows [[minHashLsh]] self-joins —
    * factored out so the incremental path bands only the NEW batch. */
  private def bandRows(docs: DataFrame, n: Int, k: Int, bands: Int): DataFrame = {
    val r = k / bands
    minHashSignatures(docs, n, k).select(col("doc_id"), posexplode(array(
      (0 until bands).map(b =>
        md5(concat_ws("#", (0 until r).map(i => col(s"mh${b * r + i}")): _*))): _*
    )).as(Seq("band", "band_hash")))
  }

  /** Persisted LSH banding state for incremental dedup of a growing
    * corpus: segments of (doc_id, band, band_hash) rows, each
    * partitioned by the (band, band_hash) join key — the signature
    * store a continuously-crawled corpus maintains so each new crawl
    * batch dedups against ALL previously seen documents at O(batch)
    * signature cost (corpus signatures are never recomputed). */
  final case class BandIndex(n: Int, k: Int, nBands: Int,
                             segments: Seq[DataFrame]) {
    private[operators] def all: DataFrame = segments.reduce(_ unionByName _)
    def close(): Unit = segments.foreach(_.unpersist())
  }

  private def bandSegment(docs: DataFrame, n: Int, k: Int, bands: Int): DataFrame = {
    val seg = bandRows(docs, n, k, bands)
      .repartition(col("band"), col("band_hash"))
      .sortWithinPartitions("band", "band_hash")
      .persist()
    seg.count()
    seg
  }

  def buildBandIndex(docs: DataFrame, n: Int = 3, k: Int = 8,
                     bands: Int = 4): BandIndex =
    BandIndex(n, k, bands, Seq(bandSegment(docs, n, k, bands)))

  /** Register a processed batch's signatures (call after
    * [[incrementalCandidates]] so the NEXT batch dedups against this
    * one too). O(batch). */
  def appendBands(index: BandIndex, newDocs: DataFrame): BandIndex =
    index.copy(segments = index.segments :+
      bandSegment(newDocs, index.n, index.k, index.nBands))

  /** Candidate near-dup pairs TOUCHING the new batch: each new document
    * against the indexed corpus AND the batch itself — exactly the
    * pairs [[minHashLsh]] over (corpus ∪ batch) emits that involve a
    * batch document, at O(batch) new-signature cost. Pairs are
    * (a, b) with a < b, ready for the same candidates-only Jaccard
    * verify as [[nearDupEdges]]. */
  def incrementalCandidates(index: BandIndex, newDocs: DataFrame): DataFrame = {
    val nb = bandRows(newDocs, index.n, index.k, index.nBands)
    nb.as("x").join(index.all.unionByName(nb).as("y"),
        col("x.band") === col("y.band") && col("x.band_hash") === col("y.band_hash") &&
        col("x.doc_id") =!= col("y.doc_id"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("b"))
      .distinct()
  }

  /** Verified near-dup edge list (a, b): LSH banding candidates
    * ([[minHashLsh]]) with exact Jaccard ≥ threshold confirmed on the
    * candidates only — the lazily-planned stage of [[dedupPipeline]]
    * (split out so plan tests can assert its join shapes; the
    * driver-paced [[connectedComponents]] loop checkpoints lineage
    * away). */
  def nearDupEdges(docs: DataFrame, n: Int = 3, k: Int = 8, bands: Int = 4,
                   threshold: Double = 0.5): DataFrame = {
    val cand = minHashLsh(docs, n, k, bands)
    val sh = shingleKeys(docs, n)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = cand
      .join(sh.toDF("a", "s1", "s2"), "a")
      .join(sh.toDF("b", "s1", "s2"), Seq("b", "s1", "s2"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.toDF("a", "sza"), "a")
      .join(sizes.toDF("b", "szb"), "b")
      .filter(col("inter").cast("double") /
        (col("sza") + col("szb") - col("inter")) >= threshold)
      .select(col("a"), col("b"))
  }

  /** Connected components over an undirected edge list (a, b) →
    * (node, canonical_id = component minimum), by ALTERNATING
    * large-star / small-star contraction (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14 — a published
    * public algorithm): each half-round is a keyed min-aggregate plus
    * an equi-join on node id (never a cartesian), and the edge set
    * converges to per-component stars in O(log n) rounds — so an
    * adversarial duplicate CHAIN of any depth canonicalizes, where the
    * previous fixed-3-round label propagation stopped at 3 hops.
    *
    * The loop is driver-paced with an O(1)-row convergence probe per
    * round (edge count + order-free checksum) and a localCheckpoint to
    * keep the plan from growing with rounds — the Spark idiom for
    * iterate-to-fixpoint graph passes. Nodes without edges are absent
    * from the output (callers left-join and coalesce to self).
    *
    * Adaptive small-graph path: near-dup edge sets are usually TINY
    * relative to the corpus (dedup rates are a few percent; pairs, not
    * documents), so when the deduped edge count is ≤ `maxDriverEdges`
    * the component pass runs as driver union-find — one collect of id
    * pairs (16 B/edge, so the default 1M edges bounds driver state at
    * ~16 MB) instead of O(log n) cluster rounds whose per-round
    * scheduling latency dominates small inputs. Star-contraction
    * remains the at-scale path (and the spec pins both paths equal;
    * pass maxDriverEdges = 0 to force it). */
  def connectedComponents(edges: DataFrame,
                          maxDriverEdges: Long = 1000000): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val dedupEdges = edges.select("a", "b").filter(col("a") =!= col("b"))
      .distinct()
    // ONE evaluation serves as both size guard and collect: pulling
    // maxDriverEdges+1 rows tells us whether the set fits without a
    // separate count() job re-running the (often expensive) upstream
    // candidate/verify pipeline that produced the edges.
    val probe =
      if (maxDriverEdges <= 0) Array.empty[(Long, Long)]
      else dedupEdges.as[(Long, Long)].limit(
        math.min(maxDriverEdges, Int.MaxValue - 1).toInt + 1).collect()
    if (maxDriverEdges > 0 && probe.length <= maxDriverEdges) {
      val pairs = probe
      // union-find with path compression; canonical = component min
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = pairs.iterator.flatMap(p => Iterator(p._1, p._2)).toSet
      return nodes.iterator.map(n => (n, find(n))).toSeq
        .toDF("node", "canonical_id")
    }
    connectedComponentsDistributed(dedupEdges)
  }

  /** The star-contraction loop body (see [[connectedComponents]]);
    * `edges` must already be deduped and self-loop-free. */
  private def connectedComponentsDistributed(edges: DataFrame): DataFrame = {
    def sym(e: DataFrame): DataFrame =
      e.select(col("a").as("u"), col("b").as("v"))
        .unionAll(e.select(col("b").as("u"), col("a").as("v")))
    // m(u) = min(Γ(u) ∪ {u})
    def minMap(s: DataFrame): DataFrame =
      s.groupBy("u").agg(min("v").as("__mv"))
        .select(col("u"), least(col("u"), col("__mv")).as("m"))
    def largeStar(e: DataFrame): DataFrame = {
      val s = sym(e)
      s.join(minMap(s), "u").filter(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b")).distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val s = sym(e)
      val m = minMap(s)
      s.join(m, "u").filter(col("v") < col("u"))
        .select(col("v").as("a"), col("m").as("b"))
        .unionAll(m.select(col("u").as("a"), col("m").as("b")))
        .filter(col("a") =!= col("b")).distinct()
    }
    // order-free edge-set signature: (count, sum of canonical-pair
    // hashes) — summed in decimal(38,0): a long sum of 64-bit hashes
    // overflows (ANSI mode throws)
    def sig(e: DataFrame): Seq[Any] =
      e.agg(count(lit(1)),
        sum(xxhash64(least(col("a"), col("b")), greatest(col("a"), col("b")))
          .cast("decimal(38,0)")))
        .collect().head.toSeq
    var e = edges.localCheckpoint()
    var prevSig = sig(e)
    var converged = false
    var rounds = 0
    while (!converged && rounds < 50) {            // 50 ≫ log₂(any corpus)
      e = smallStar(largeStar(e)).localCheckpoint()
      val s = sig(e)
      converged = s == prevSig
      prevSig = s
      rounds += 1
    }
    // converged edge set is a star per component: (leaf, component-min)
    sym(e).groupBy("u").agg(min("v").as("__mv"))
      .select(col("u").as("node"), least(col("u"), col("__mv")).as("canonical_id"))
  }

  /** The composed near-dup pipeline a training-data run actually
    * executes, end to end: MinHash+LSH candidate generation → exact
    * Jaccard verification ON CANDIDATES ONLY → canonical assignment by
    * connected components over the verified near-dup edges. One row per
    * document: (doc_id, canonical_id, is_dup).
    *
    * Scale shape: every stage is an equi-join or keyed aggregate —
    * candidates from the banding join ([[minHashLsh]]), intersection
    * counts from a (pair × shingle) equi-join proportional to the
    * CANDIDATE volume (the all-pairs Jaccard of [[ngramJaccard]] never
    * appears), and canonicalization by [[connectedComponents]]
    * star-contraction (equi-joins only, O(log n) driver-paced rounds —
    * duplicate chains of ANY depth reach their component minimum, where
    * the previous fixed-3-round propagation mis-canonicalized >3-hop
    * chains). Recall is governed by the LSH banding (k, bands), as in
    * the standalone candidate operator. */
  def dedupPipeline(docs: DataFrame, n: Int = 3, k: Int = 8, bands: Int = 4,
                    threshold: Double = 0.5): DataFrame = {
    val cc = connectedComponents(nearDupEdges(docs, n, k, bands, threshold))
    docs.select(col("doc_id"))
      .join(cc.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("canonical_id"), col("doc_id")).as("canonical_id"))
      .withColumn("is_dup", col("doc_id") =!= col("canonical_id"))
  }

  /** Quality-aware canonical selection: [[dedupPipeline]]'s duplicate
    * components, but the kept representative per component is the
    * HIGHEST-quality member ([[TextOps.quality]] score, ties to the
    * smaller doc_id) instead of the smallest id — what production
    * dedup actually does (keep the best copy, not an arbitrary one).
    *
    * Scale: adds one id-keyed equi-join and one component-keyed
    * max-struct aggregation on top of the pipeline — both shuffles on
    * bounded-width key columns, document bodies never move. The
    * max(struct(score, -id)) argmax is a single partial+final agg, no
    * window sort. */
  def keepBestPipeline(docs: DataFrame, n: Int = 3, k: Int = 8, bands: Int = 4,
                       threshold: Double = 0.5): DataFrame = {
    val comp = dedupPipeline(docs, n, k, bands, threshold)
      .select(col("doc_id"), col("canonical_id").as("comp_id"))
    val q = TextOps.quality(docs).select("doc_id", "quality_score")
    val best = comp.join(q, "doc_id")
      .groupBy("comp_id")
      .agg(max(struct(col("quality_score"), (-col("doc_id")).as("neg"))).as("b"))
      .select(col("comp_id"), (-col("b.neg")).cast("long").as("keep_id"))
    comp.join(best, "comp_id")
      .select(col("doc_id"), col("keep_id"),
        (col("doc_id") =!= col("keep_id")).as("is_dup"))
  }

  /** The SemDeDup end product: canonical assignment over the verified
    * semantic pairs — [[semanticNearDup]] edges canonicalized by
    * [[connectedComponents]] star-contraction, one representative
    * (component-minimum id) per semantic duplicate group. The
    * embedding-space mirror of [[dedupPipeline]]; approximate exactly
    * where the pair stage is (recall gated by
    * `q_dedup_semantic_gate`), exact from pairs to canonical ids. */
  def semanticDedupPipeline(embeddings: DataFrame, threshold: Double = 0.4,
                            nClusters: Int = -1,
                            assignments: Int = 8): DataFrame = {
    val cc = connectedComponents(
      semanticNearDup(embeddings, threshold, nClusters, assignments)
        .select("a", "b"))
    embeddings.select(col("vec_id"))
      .join(cc.withColumnRenamed("node", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("canonical_id"), col("vec_id")).as("canonical_id"))
      .withColumn("is_dup", col("vec_id") =!= col("canonical_id"))
  }

  /** SimHash (60-bit, frequency-weighted): bit j of the fingerprint is
    * the sign of Σ_tokens (bit j of md5(token) ? +1 : −1). Native
    * one-pass expression ([[graft.functions.SimHash64]]) — a narrow map
    * at scan speed; the explode × 60-bit-column × groupBy formulation
    * (which the SQL oracle still spells out) shuffles 25M agg cells at
    * sf0.1 for the same answer. 60 bits stay clear of BIGINT sign. */
  def simHash(docs: DataFrame, bits: Int = 60): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.SimHash64(col("text"), bits).as("simhash"))

  /** SimHash near-dup pairs by Hamming distance, via pigeonhole
    * banding: split the `bits`-bit fingerprint into maxDist+1 blocks —
    * a pair at Hamming distance ≤ maxDist differs in ≤ maxDist blocks,
    * so AT LEAST ONE block matches exactly. Candidates come from an
    * equi-join on (block index, block value) — hash-join shuffles of
    * id+block rows, never an all-pairs cross — then the exact Hamming
    * check keeps true pairs. Exact (recall 1): pigeonhole is a
    * guarantee, not a probability. */
  def simHashPairs(docs: DataFrame, maxDist: Int = 3, bits: Int = 60): DataFrame =
    hammingPairs(simHash(docs, bits), "simhash", maxDist, bits)

  /** Generic banded Hamming-distance pair mining over ANY per-row
    * fingerprint column — the pigeonhole shape [[simHashPairs]] and
    * [[Multimodal.imageNearDupPairs]] share: split the `bits`-bit
    * fingerprint into maxDist+1 blocks (a pair within distance must
    * match at least one block exactly), candidates from the
    * (block, value) equi-join, exact popcount verify. `hashed` must
    * carry (doc_id, `hashCol`). */
  private[operators] def hammingPairs(hashed: DataFrame, hashCol: String,
                                      maxDist: Int, bits: Int): DataFrame = {
    // maxDist = 0 is valid: one full-hash block, exact-duplicate mining
    require(maxDist >= 0 && bits <= 64 && bits / (maxDist + 1) >= 1,
      s"bad hamming banding: maxDist=$maxDist bits=$bits")
    val blocks = maxDist + 1
    val width = bits / blocks
    val banded = hashed.select(col("doc_id"), col(hashCol).as("__h"),
      posexplode(array((0 until blocks).map { b =>
        val lo = b * width
        val hi = if (b == blocks - 1) bits else lo + width // last absorbs remainder
        shiftrightunsigned(col(hashCol), lo)
          .bitwiseAND(lit(if (hi - lo == 64) -1L else (1L << (hi - lo)) - 1))
      }: _*)).as(Seq("blk", "blk_val")))
    banded.as("x").join(banded.as("y"),
        col("x.blk") === col("y.blk") && col("x.blk_val") === col("y.blk_val") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        bit_count(col("x.__h").bitwiseXOR(col("y.__h")))
          .cast("bigint").as("dist"))
      .distinct()                                  // pairs matching >1 block
      .filter(col("dist") <= maxDist)
  }

  /** Exact embedding near-dup: every pair (a < b) with dot ≥ threshold
    * (vectors are L2-normalized, so dot = cosine). Block-broadcast scan
    * ([[Similarity.thresholdPairsFor]]): exact by construction, O(N²)
    * compute distributed over query partitions — the deterministic
    * reference / verify-stage formulation. [[embeddingNearDup]] is the
    * sub-quadratic scale path; its recall against this operator is
    * certified by [[nearDupRecallGate]]. */
  def embeddingNearDupExact(embeddings: DataFrame, threshold: Double = 0.9,
                            blockRows: Int = 100000): DataFrame =
    Similarity.thresholdPairsFor(embeddings, embeddings, threshold, blockRows)
      .filter(col("query_id") < col("cand_id"))
      .select(col("query_id").as("a"), col("cand_id").as("b"), col("score"))

  /** One-row recall gate for the approximate [[embeddingNearDup]]:
    * pair-recall vs the exact scan, on a deterministic md5-order sample
    * of `sampleQueries` vectors (the exact side costs O(sample·N), not
    * O(N²) — the same sampled-gate pattern as the ANN recall gates).
    * recall_ok is vacuously true when the sample grazes no pair (no
    * evidence of a miss). */
  def nearDupRecallGate(embeddings: DataFrame, threshold: Double = 0.9,
                        bar: Double = 0.95, sampleQueries: Int = 200): DataFrame = {
    // approximate side driven over the sampled probe set only — same
    // pairs touching the sample as the full self-join (spec-asserted),
    // at O(sample) probe cost.
    //
    // CANDIDATE-set identity: the intersection is measured against the
    // raw LSH candidate pairs, NOT the verified output — recall only
    // counts |approx ∩ exact|, and every exact pair (dot ≥ τ) that is
    // a candidate passes [[verifyPairs]]'s exact-dot filter by
    // definition, so verified ∩ exact == candidates ∩ exact EXACTLY
    // (verification only removes false positives, which are outside
    // the exact set). Same verdict, spec-pinned — and the gate skips
    // the verify stage's id-fetch of vector arrays for the multi-
    // million-row candidate set, which was 2/3 of its cost. The
    // verify machinery stays driver-exercised through the composed
    // dedup pipeline and the canon entries.
    val qids = embeddings
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(sampleQueries)
      .select(col("vec_id"))
    val spark = embeddings.sparkSession
    import spark.implicits._
    val nQueries = qids.count()
    val sampled = embeddings.join(broadcast(qids), "vec_id")
    // the sample-restricted exact match set: BOUNDED (sample × the
    // corpus's near-rate at τ — the very quantity the gate certifies;
    // a τ where this explodes is a τ where the dedup operator itself
    // is meaningless), so it collects like the ANN gates' sample×k
    // sets. Membership is then tested PER EXACT PAIR: a pair is an
    // LSH candidate iff its two vectors share a bucket in some table
    // — a pure function of the pair's own buckets at the operator's
    // wired point (24×3) — so only the ≤2·|exact| pair vectors ever
    // get bucketed (id-pushdown scan), and no corpus-wide candidate
    // stream (10⁷ rows at sf0.1) exists in the gate's plan at all.
    val exactPairs = Similarity.thresholdPairsFor(sampled, embeddings, threshold)
      .select(least(col("query_id"), col("cand_id")).as("a"),
        greatest(col("query_id"), col("cand_id")).as("b"))
      .distinct()
      .as[(Long, Long)].collect()
    val ok = if (exactPairs.isEmpty) true else {
      val idSet = exactPairs.flatMap(p => Seq(p._1, p._2)).distinct.toSeq
      val buckets: Map[Long, Array[Long]] = Similarity.lshBuckets(
          embeddings.filter(col("vec_id").isin(idSet: _*)),
          tables = 24, planes = 3)
        .groupBy("vec_id")
        .agg(sort_array(collect_list(struct(col("table"), col("bucket"))))
          .as("bs"))
        .as[(Long, Seq[(Int, Long)])].collect()
        .map { case (id, bs) => id -> bs.map(_._2).toArray }.toMap
      val matched = exactPairs.count { case (a, b) =>
        val (ba, bb) = (buckets(a), buckets(b))
        ba.indices.exists(t => ba(t) == bb(t))
      }
      matched.toDouble / exactPairs.length >= bar
    }
    Seq((nQueries, ok)).toDF("n_queries", "recall_ok")
  }

  /** The gate body, generalized over WHICH approximate pair operator is
    * under test ([[embeddingNearDup]], [[semanticNearDup]], …):
    * pair-recall of `approxPairs` (columns a, b) against the exact
    * blocked scan on the deterministic query sample. */
  def pairRecallGate(embeddings: DataFrame, approxPairs: DataFrame,
                     threshold: Double, bar: Double,
                     sampleQueries: Int = 200): DataFrame = {
    val qids = embeddings
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(sampleQueries)
      .select(col("vec_id"))
    val exactPairs = Similarity.thresholdPairsFor(
        embeddings.join(broadcast(qids), "vec_id"), embeddings, threshold)
      .select(least(col("query_id"), col("cand_id")).as("a"),
        greatest(col("query_id"), col("cand_id")).as("b"))
      .distinct()
    // one pass over the exact side: approx (a, b) rows are deduped, so
    // the left join cannot multiply exact rows — count(*) is the total,
    // count(__hit) the intersection. The former matched/total split
    // referenced exactPairs from TWO aggregates, running its distinct
    // shuffle (and a traversal of the blocked-scan partials) twice per
    // gate evaluation.
    val approx = approxPairs.select("a", "b").distinct()
    val scored = exactPairs
      .join(approx.withColumn("__hit", lit(1)), Seq("a", "b"), "left_outer")
      .agg(count(lit(1)).cast("double").as("__total"),
        count(col("__hit")).cast("double").as("__matched"))
    qids.agg(count(lit(1)).as("n_queries"))
      .crossJoin(scored)
      .select(col("n_queries"),
        // empty exact set -> 0/0 = NULL -> vacuously true (unchanged)
        coalesce(col("__matched") / col("__total") >= bar, lit(true))
          .as("recall_ok"))
  }

  /** Semantic (embedding-cluster-blocked) near-dup — the SemDeDup
    * pattern (Abbas et al. 2023, arXiv:2303.09540): cluster the corpus
    * with the IVF k-means quantizer, then score pairs WITHIN shared
    * clusters only. Approximate (cross-cluster pairs are unseen) —
    * [[pairRecallGate]] makes the recall driver-visible, and
    * `assignments` (soft multi-assignment, each vector in its
    * `assignments` nearest clusters) is the recall knob: a near pair is
    * near both vectors' top centroids, so sharing ANY cluster recovers
    * boundary pairs that hard assignment splits.
    *
    * Scale shape vs the LSH path ([[embeddingNearDup]]): candidate
    * volume is Σ_lists |list|² ≈ m²·N^1.5/nc with the ≈2√N
    * auto-sizing — subquadratic, and each stage is an equi-join: the
    * cluster self-join moves (vec_id, cluster) id pairs only, vectors
    * join back BY ID for the exact dot verify. Cluster-blocking beats
    * hyperplane LSH when the corpus is genuinely clustered (the
    * candidate lists mirror the data's own structure); LSH wins on
    * unstructured corpora — the wired τ=0.4 testdata vectors are that
    * worst case, hence the wide default m=8 (measured pair-recall
    * 1.00 / 1.00 / 0.97 at sf0.001/0.01/0.1; m=2 suffices on clustered
    * corpora where same-cluster probability is what SemDeDup banks
    * on). */
  def semanticNearDup(embeddings: DataFrame, threshold: Double = 0.4,
                      nClusters: Int = -1, assignments: Int = 8,
                      iters: Int = 3): DataFrame =
    // fitCached: the pair query, the canon pipeline, and the recall
    // gate all derive from this operator over the same corpus — one
    // quantizer per session serves all three (the r4 bench re-ran an
    // identical k-means fit three times per round)
    semanticNearDup(embeddings, threshold,
      IvfIndex.fitCached(embeddings, nClusters, iters), assignments)

  /** [[semanticNearDup]] against a caller-supplied (pre-fit) quantizer —
    * the model-owning mirror of the [[IvfIndex.build]]/[[IvfIndex.query]]
    * lifecycle split: fit once, run the pair stage (and its gate)
    * against the same model. */
  def semanticNearDup(embeddings: DataFrame, threshold: Double,
                      model: IvfIndex.Model, assignments: Int): DataFrame = {
    val asg = IvfIndex.assignMulti(embeddings, model, assignments)
      .select("vec_id", "cluster")
    val cand = asg.as("x").join(asg.as("y"),
        col("x.cluster") === col("y.cluster") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
      .distinct()                                  // score each pair once
    val e = embeddings.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    cand
      .join(e.select(col("vec_id").as("a"), col("v").as("va")), "a")
      .join(e.select(col("vec_id").as("b"), col("v").as("vb")), "b")
      .select(col("a"), col("b"),
        Similarity.dot(col("va"), col("vb")).as("score"))
      .filter(col("score") >= threshold)
  }

  /** Embedding near-dup, the scale path: pairs with dot-product
    * similarity ≥ threshold (vectors are L2-normalized, so dot =
    * cosine). Approximate — [[embeddingNearDupExact]] is the exact
    * reference and [[nearDupRecallGate]] makes the recall
    * driver-visible.
    *
    * Candidates come from multi-table hyperplane LSH
    * ([[Similarity.lshBuckets]]) — equi-joins on (table, bucket) over
    * id-sized rows — then the exact sequential-fold dot verifies each
    * candidate once (matching the oracle's list_sum ordering). The
    * recall/cost knob is (tables, planes): recall per pair at angle θ is
    * 1−(1−(1−θ/π)^planes)^tables. The defaults are sized for the LOW
    * τ=0.4 operating point the wired query uses (measured recall 1.0 on
    * the sf0.01 and sf0.1 corpora); high-threshold dedup (τ≥0.8, the
    * common near-dup case) reaches recall ~1 with far fewer tables and
    * more planes per table, where the LSH volume win over all-pairs is
    * large. The previous formulation was an all-pairs cross join —
    * correct at 2 500 vectors, dead at 100 TB. */
  def embeddingNearDup(embeddings: DataFrame, threshold: Double = 0.9,
                       tables: Int = 24, planes: Int = 3): DataFrame = {
    // self form keeps the x < y join restriction: each unordered pair
    // enters the candidate join ONCE (the ≠ form of the sampled
    // variant would double join output before the distinct)
    val b = Similarity.lshBuckets(embeddings, tables, planes)
    val cand = b.as("x").join(b.as("y"),
        col("x.table") === col("y.table") && col("x.bucket") === col("y.bucket") &&
        col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
      .distinct()                                  // score each pair once
    verifyPairs(cand, embeddings, threshold)
  }

  /** Break-even-guarded near-dup entry, the pair-mining mirror of
    * [[Similarity.adaptiveTopK]]: probe the corpus's bucket-collision
    * mass first ([[Similarity.lshCandidateFraction]], measured exactly
    * on a deterministic md5-order sample) and run the LSH path only
    * where it prunes. At a low threshold on a weakly-clustered corpus
    * (the wired τ=0.4 regime) the candidate set ≈ all pairs, so the
    * bucket join + distinct + id-fetch verify costs MORE than the
    * exact blocked scan it feeds — there the exact scan (recall 1) is
    * strictly better. The LSH path's recall stays certified by
    * [[nearDupRecallGate]], which drives [[embeddingNearDupFor]]
    * directly. */
  def adaptiveNearDup(embeddings: DataFrame, threshold: Double = 0.9,
                      tables: Int = 24, planes: Int = 3,
                      maxCandidateFraction: Double = 0.25): DataFrame =
    if (Similarity.lshCandidateFraction(embeddings, tables, planes)
        >= maxCandidateFraction)
      embeddingNearDupExact(embeddings, threshold)
    else embeddingNearDup(embeddings, threshold, tables, planes)

  /** [[embeddingNearDup]] with the probe side split out: canonical
    * (a < b) pairs TOUCHING `queries`, against the full corpus — the
    * recall gate's O(sample·buckets) form. Needs the symmetric ≠ join
    * (a sampled vector's pair partner may have a smaller id), so the
    * self case should use [[embeddingNearDup]], whose x < y restriction
    * halves the candidate join. Pair set equality with the restricted
    * self form is spec-asserted. */
  def embeddingNearDupFor(queries: DataFrame, corpus: DataFrame,
                          threshold: Double = 0.9,
                          tables: Int = 24, planes: Int = 3): DataFrame = {
    val qb = Similarity.lshBuckets(queries, tables, planes)
    val cb = Similarity.lshBuckets(corpus, tables, planes)
    val cand = qb.as("x").join(cb.as("y"),
        col("x.table") === col("y.table") && col("x.bucket") === col("y.bucket") &&
        col("x.vec_id") =!= col("y.vec_id"))
      .select(least(col("x.vec_id"), col("y.vec_id")).as("a"),
        greatest(col("x.vec_id"), col("y.vec_id")).as("b"))
      .distinct()                                  // score each pair once
    verifyPairs(cand, corpus, threshold)
  }

  /** SEMANTIC decontamination — the embedding-space complement of the
    * shingle-collision screen ([[TextOps.decontaminate]]): a corpus
    * row is contaminated when its cosine against ANY eval vector
    * reaches `threshold` — the paraphrased/translated benchmark leak
    * the exact n-gram screen cannot see (the screen modern model
    * reports run alongside n-gram decontamination). Emits EVERY corpus
    * row with its audit columns (`n_eval_hits`, `max_eval_sim`,
    * `keep`) — the decontamination report, filterable to the keep-list.
    *
    * Exact by construction: the threshold scan is
    * [[Similarity.thresholdPairsFor]]'s fixed-order double fold (bit-
    * identical to the SQL oracle), `max` only compares. Scale shape:
    * the EVAL side rides the blocked broadcast (eval sets are small by
    * definition — the corpus streams partitioned past it once), then
    * one groupBy on vec_id and one left join against the corpus ids. */
  def decontaminateSemantic(corpus: DataFrame, evalSet: DataFrame,
                            threshold: Double = 0.4): DataFrame = {
    val hits = Similarity.thresholdPairsFor(corpus, evalSet, threshold)
      .groupBy(col("query_id").as("vec_id"))
      .agg(count(lit(1)).as("n_eval_hits"),
        max(col("score")).as("max_eval_sim"))
    corpus.select(col("vec_id"))
      .join(hits, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("n_eval_hits"), lit(0L)).as("n_eval_hits"),
        col("max_eval_sim"),
        col("n_eval_hits").isNull.as("keep"))
  }

  /** Exact-dot verification of candidate (a, b) pairs by id-fetch from
    * `corpus` — the shared tail of the two candidate forms above. */
  private def verifyPairs(cand: DataFrame, corpus: DataFrame,
                          threshold: Double): DataFrame = {
    val e = corpus.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    cand
      .join(e.select(col("vec_id").as("a"), col("v").as("va")), "a")
      .join(e.select(col("vec_id").as("b"), col("v").as("vb")), "b")
      .select(col("a"), col("b"),
        Similarity.dot(col("va"), col("vb")).as("score"))
      .filter(col("score") >= threshold)
  }

  /** Typo-tolerant near-dup pairs by EDIT DISTANCE — the character-
    * level complement of the token-set families ([[ngramJaccard]]
    * Jaccard, [[simhash]] Hamming): candidate pairs from opening-
    * token-prefix blocking, verified with exact Levenshtein distance
    * and flagged at `maxDistMicro` millionths of the longer length.
    * Catches the small-edit duplicate class (OCR noise, template
    * fills, punctuation drift) that token-shingle Jaccard under-scores
    * when every shingle shifts.
    *
    * Scale shape: the block key is a 32-hex digest of the first
    * `prefixTokens` tokens, so candidates form within equi-join
    * buckets only; blocks larger than `maxBlock` (a too-common
    * opening — boilerplate headers) are dropped by a same-partitioning
    * window count BEFORE any pairing, bounding per-block work at
    * O(maxBlock²) — the same guard LSH banding applies. Levenshtein
    * is O(len²) per verified pair, confined to the blocked candidate
    * set, never all pairs. All-integer output (the normalized
    * distance is integer micro-units via floor division) keeps the
    * result engine-exact. */
  def editDistancePairs(docs: DataFrame, prefixTokens: Int = 4,
                        maxDistMicro: Long = 100000L,
                        maxBlock: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = docs.select(col("doc_id"), col("text"),
      md5(concat_ws(" ",
        slice(split(col("text"), " "), 1, prefixTokens))).as("__blk"))
      .withColumn("__bn", count(lit(1)).over(Window.partitionBy("__blk")))
      .filter(col("__bn") <= maxBlock)
    val a = keyed.select(col("__blk"), col("doc_id").as("doc_a"),
      col("text").as("__ta"))
    val b = keyed.select(col("__blk"), col("doc_id").as("doc_b"),
      col("text").as("__tb"))
    a.join(b, "__blk").filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("__ta"), col("__tb")).cast("bigint").as("lev"),
        greatest(length(col("__ta")), length(col("__tb"))).cast("bigint")
          .as("max_len"))
      .withColumn("dist_micro",
        expr("CAST((lev * 1000000) DIV max_len AS BIGINT)"))
      .withColumn("is_dup", col("dist_micro") <= maxDistMicro)
  }
}

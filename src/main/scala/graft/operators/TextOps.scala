package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines over the
  * `documents` table: token stats, quality scoring, language ID,
  * shingle fingerprinting. (North-star extensions beyond the
  * reference's own surface — BASELINE.json.)
  *
  * All ops are narrow (no shuffle): per-row expressions built from
  * codegen'd `functions._` higher-order functions over a split-once
  * token array. At 100 TB these run at scan speed with column pruning —
  * the parquet reader materializes only `doc_id` and `text`.
  *
  * Cross-engine determinism rule: integer arithmetic + single-rounded
  * double divisions only (each division of exactly-computed integers is
  * correctly rounded IEEE-754, so Spark and the DuckDB oracle agree
  * bit-for-bit).
  */
object TextOps {

  private def toks: Column = split(col("text"), " ")

  /** Whitespace + regex-word token counting. */
  def tokenStats(docs: DataFrame): DataFrame = docs.select(
    col("doc_id"),
    length(col("text")).cast("bigint").as("n_chars"),
    size(toks).cast("bigint").as("n_tokens"),
    size(array_distinct(toks)).cast("bigint").as("n_distinct_tokens"),
    // BPE-ish regex token count: alphanumeric runs + single non-space symbols
    size(expr("regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]', 0)"))
      .cast("bigint").as("n_regex_tokens"),
    (aggregate(transform(toks, t => length(t)), lit(0), (a, x) => a + x)
      .cast("double") / size(toks)).as("mean_token_len"))

  private val stopEn = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Quality scoring: length, lexical diversity, stopword density.
    * Score weights follow common pretraining-data heuristics (length
    * saturation + diversity + stopword signal). */
  def quality(docs: DataFrame): DataFrame = {
    val n = size(toks)
    val stopHits = size(filter(toks, t => t.isInCollection(stopEn)))
    val distinctRatio = size(array_distinct(toks)).cast("double") / n
    val stopRatio = stopHits.cast("double") / n
    val lenScore = least(lit(1.0), n.cast("double") / lit(100.0))
    docs.select(
      col("doc_id"),
      n.cast("bigint").as("n_tokens"),
      distinctRatio.as("distinct_ratio"),
      stopRatio.as("stopword_ratio"),
      (distinctRatio * 0.5 + stopRatio * 0.2 + lenScore * 0.3).as("quality_score"))
  }

  /** Syllable-complexity profile — the pronounceability/readability
    * proxy (the syllables-per-word term of Flesch-family formulas;
    * sentence terms are N/A on the unpunctuated corpus): syllables
    * approximated as maximal vowel runs (`[aeiouy]+`), counted over
    * the WHOLE text in one regexp pass — spaces break runs, so no
    * per-word explode ever happens; the count is
    * `len(replace(runs,'#')) − len(strip(runs))`. Exact integers; the
    * per-word rate is one floor-div ppm. */
  def syllableProfile(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("bigint").as("n_words"),
        (length(regexp_replace(col("text"), "[aeiouy]+", "#")) -
          length(regexp_replace(col("text"), "[aeiouy]+", "")))
          .cast("bigint").as("n_syllables"))
      .filter(col("n_words") > 0L)
      .withColumn("syllables_per_word_ppm",
        expr("(n_syllables * 1000000L) div n_words"))

  /** Gopher-style rule-based quality filter (Rae et al. 2021,
    * "Scaling Language Models: ... Gopher", Table A1 heuristics),
    * adapted to the space-tokenized corpus: token-count window, mean
    * word length window, alphabetic-word fraction, and a minimum count
    * of DISTINCT stopwords (the Gopher "contains at least 2 of a
    * stopword list" rule). Per-doc flags plus the conjunctive `keep`
    * verdict — each rule column kept so downstream can audit WHICH
    * rule rejected a document (the usual ablation need).
    *
    * Scale: one narrow projection over the scan, no shuffle, fully
    * codegen'd array expressions — embarrassingly parallel at any SF. */
  def gopherRules(docs: DataFrame, minTokens: Int = 50, maxTokens: Int = 100000,
                  minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                  minAlphaFrac: Double = 0.8, minStopHits: Int = 2): DataFrame = {
    val n = size(toks)
    val meanLen = aggregate(transform(toks, t => length(t)), lit(0),
      (a, x) => a + x).cast("double") / n
    val alphaFrac = size(filter(toks, t => t.rlike("[a-z]"))).cast("double") / n
    val stopDistinct = size(array_intersect(array_distinct(toks),
      array(stopEn.map(lit): _*)))
    docs.select(
      col("doc_id"),
      n.cast("bigint").as("n_tokens"),
      meanLen.as("mean_word_len"),
      alphaFrac.as("alpha_frac"),
      stopDistinct.cast("bigint").as("stop_distinct"),
      (n.between(minTokens, maxTokens) &&
        meanLen.between(minMeanLen, maxMeanLen) &&
        alphaFrac >= minAlphaFrac &&
        stopDistinct >= minStopHits).as("keep"))
  }

  private val stopSets: Seq[(String, Seq[String])] = Seq(
    "en" -> stopEn,
    "es" -> Seq("el", "la", "de", "y", "en", "que", "los"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "de", "et", "est", "les"))

  /** N-gram/stopword language-ID heuristic: per-language stopword hit
    * counts, argmax with fixed tie order en>es>de>fr. */
  def langId(docs: DataFrame): DataFrame = {
    val scores = stopSets.map { case (lang, words) =>
      lang -> size(filter(toks, t => t.isInCollection(words)))
    }
    val Seq(en, es, de, fr) = scores.map(_._2)
    docs.select(
      col("doc_id") +: scores.map { case (l, c) => c.cast("bigint").as(s"score_$l") } :+
      when(en >= es && en >= de && en >= fr, "en")
        .when(es >= de && es >= fr, "es")
        .when(de >= fr, "de")
        .otherwise("fr").as("predicted_lang"): _*)
  }

  /** Word n-gram shingles of the document, distinct, as an array column
    * `shingles` (empty when the document is shorter than n). Shared by
    * fingerprinting and the dedup family. Native one-pass expression —
    * see [[graft.functions.WordShingles]] for why not the declarative
    * transform/slice/array_distinct chain. */
  def withShingles(docs: DataFrame, n: Int = 3): DataFrame =
    docs.withColumn("shingles",
      graft.functions.WordShingles(col("text"), n))

  /** Document fingerprinting: minimum-hash shingle fingerprint (the
    * 1-hash special case of winnowing; rolling windows collapse to the
    * global min because every window contains the global minimum hash
    * once w ≥ n_shingles). md5-hex min is engine-portable. */
  def fingerprint(docs: DataFrame, n: Int = 3): DataFrame =
    withShingles(docs, n).select(
      col("doc_id"),
      size(col("shingles")).cast("bigint").as("n_shingles"),
      array_min(transform(col("shingles"), s => md5(s))).as("fingerprint"))

  /** Noise/PII-shaped content flags — the strip/score signals a
    * pretraining cleanup pass keys on: URL-ish and email-ish token
    * counts plus their density. Narrow regexp counting at scan speed;
    * patterns kept in the regex subset Spark and DuckDB interpret
    * identically (no lookaround, explicit classes). */
  def contentFlags(docs: DataFrame): DataFrame = {
    val urls = size(expr("regexp_extract_all(text, 'https?://[a-z0-9./_-]+', 0)"))
    val emails = size(expr("regexp_extract_all(text, '[a-z0-9._-]+@[a-z0-9._-]+', 0)"))
    docs.select(
      col("doc_id"),
      urls.cast("bigint").as("n_urls"),
      emails.cast("bigint").as("n_emails"),
      ((urls + emails).cast("double") / size(toks)).as("noise_ratio"))
  }

  /** Per-document top TF-IDF term (tf × N/df, the log-free rational
    * variant: every value is one correctly-rounded division of exact
    * integers, so Spark and DuckDB agree bit-for-bit — `ln` is only
    * faithfully rounded and may differ in the last ulp between libms).
    * Ties break toward the lexicographically smallest term.
    *
    * Scale shape: explode distinct per-doc tokens once; df is a
    * token-keyed count (shuffle moves (token, count) pairs); the
    * doc-side tf join is token-keyed; the final per-doc argmax is a
    * max_by aggregate — partial map-side reduction, no window sort. */
  def topTfidf(docs: DataFrame): DataFrame = {
    val tokens = docs.select(col("doc_id"), explode(toks).as("term"))
    val tf = tokens.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("__n"))
    tf.join(df, "term").crossJoin(n)
      .select(col("doc_id"), col("term"),
        (col("tf").cast("double") * col("__n") / col("df")).as("score"))
      .groupBy("doc_id")
      // (score desc, term asc) argmax as a min_by over (−score, term)
      .agg(min_by(struct(col("term"), col("score")),
        struct((-col("score")).as("ns"), col("term"))).as("x"))
      .select(col("doc_id"), col("x.term").as("top_term"), col("x.score").as("tfidf"))
  }

  /** Per-document top-k TF-IDF keywords — the document-tagging pass
    * (search facets, cluster labels, weak topic signals) generalizing
    * [[topTfidf]]'s argmax to a ranked list. Same log-free rational
    * score (`tf × N/df`, one correctly-rounded division of exact
    * integers), ties toward the lexicographically smaller term.
    *
    * Scale shape: identical token-keyed tf/df joins; the per-doc rank
    * is a bounded in-group sort — `collect_list` gathers only the
    * doc's OWN distinct terms (bounded by document length, never the
    * corpus), then `array_sort` + `slice` pick k — so no window
    * operator ever sorts the exploded corpus and the exchange carries
    * one row per (doc, term). The (−score, term) struct sort is the
    * (score desc, term asc) order; negating a double is exact, and
    * scores are ≥ 1 so −0.0 never appears. */
  def keywords(docs: DataFrame, k: Int = 3): DataFrame = {
    val tokens = docs.select(col("doc_id"), explode(toks).as("term"))
    val tf = tokens.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("__n"))
    tf.join(df, "term").crossJoin(n)
      .select(col("doc_id"), col("term"),
        (col("tf").cast("double") * col("__n") / col("df")).as("score"))
      .groupBy("doc_id")
      .agg(slice(array_sort(collect_list(
        struct((-col("score")).as("ns"), col("term")))), 1, k).as("top"))
      .select(col("doc_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("doc_id"), (col("pos") + 1).cast("bigint").as("rank"),
        col("e.term").as("term"), (-col("e.ns")).as("tfidf"))
  }

  /** Prompt/completion pair extraction — the SFT / memorization-probe
    * data shape: each document splits at a FIXED token boundary into
    * a prompt (the first `promptTokens` tokens) and a completion (the
    * rest), documents too short to yield a non-empty completion
    * dropped. Token-boundary splitting (rather than a sentence
    * heuristic) is the shape LM eval harnesses use for continuation
    * probes, and it is exact on any tokenizable text. Reassembly via
    * the same single-space joiner the tokenization splits on, so
    * `prompt ⧺ ' ' ⧺ completion` round-trips the document.
    *
    * Scale shape: one narrow scan — slice + join per row, no
    * shuffle. */
  def promptCompletionPairs(docs: DataFrame, promptTokens: Int = 8): DataFrame =
    docs
      .select(col("doc_id"), toks.as("__t"))
      .filter(size(col("__t")) > promptTokens)
      .select(col("doc_id"),
        concat_ws(" ", slice(col("__t"), 1, promptTokens)).as("prompt"),
        concat_ws(" ", expr(s"slice(__t, ${promptTokens + 1}, size(__t) - $promptTokens)"))
          .as("completion"),
        lit(promptTokens.toLong).as("prompt_tokens"),
        (size(col("__t")) - promptTokens).cast("bigint").as("completion_tokens"))

  /** Per-language document-length deciles — the corpus-shape report
    * (truncation/chunking policies read off these bounds): equal-depth
    * buckets of `n_chars` within each language, exact integer bounds
    * per bucket. Rides [[graft.operators.Ids.ntileRankGrouped]], so a
    * language holding most of the corpus never sorts on one task;
    * NTILE-window equality is spec-pinned there. */
  def lengthDeciles(docs: DataFrame, n: Int = 10): DataFrame =
    graft.operators.Ids.ntileRankGrouped(
        docs.select(col("lang"), col("doc_id"), col("n_chars")),
        Seq("lang"), Seq(col("n_chars"), col("doc_id")), n, "__b")
      .withColumn("bucket", col("__b").cast("bigint"))
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("lo_chars"),
        max(col("n_chars")).as("hi_chars"))

  /** Corpus composition card — the per-(language, source) inventory a
    * dataset card leads with: document count, exact char and
    * whitespace-token totals, and each cell's share of the corpus in
    * integer parts-per-million. One narrow scan + one small aggregate
    * + a broadcast 1-row total. */
  def corpusStats(docs: DataFrame): DataFrame = {
    val cells = docs
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("n_chars"),
        sum(size(toks)).as("n_tokens"))
    val total = docs.agg(count(lit(1)).as("__total"))
    cells.crossJoin(broadcast(total))
      .select(col("lang"), col("source"), col("n_docs"),
        col("n_chars").cast("bigint").as("n_chars"),
        col("n_tokens").cast("bigint").as("n_tokens"),
        expr("n_docs * 1000000L div __total").as("doc_share_ppm"))
  }

  /** Type-token ratio — the lexical-diversity quality signal (low TTR
    * flags template/boilerplate text the repetition fractions can
    * miss on long documents): distinct terms over total terms, both
    * exact integers, one correctly-rounded division presented at the
    * boundary. Emitted with the raw counts so a downstream filter can
    * re-threshold without re-tokenizing.
    *
    * Scale shape: one narrow scan — `size(array_distinct(...))` and
    * `size(...)` evaluate per row at scan speed, no shuffle. */
  def typeTokenRatio(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(toks).cast("bigint").as("n_tokens"),
      size(array_distinct(toks)).cast("bigint").as("n_types"))
      .withColumn("ttr",
        col("n_types").cast("double") / col("n_tokens"))

  /** Winnowing (Schleimer et al.): the distinct set of per-window
    * minima over the ORDERED (non-distinct) shingle hash sequence,
    * window size w — guarantees any match of length ≥ w+n−1 tokens
    * shares a fingerprint. One row per (doc_id, fingerprint). Documents
    * shorter than one window keep all their hashes. Native one-pass
    * expression (md5 each shingle once + monotonic-deque sliding min) —
    * see [[graft.functions.WinnowFingerprints]] for why not the
    * transform/slice/array_min HOF chain it replaced. */
  def winnow(docs: DataFrame, n: Int = 3, w: Int = 4): DataFrame =
    docs.select(col("doc_id"),
      explode(graft.functions.WinnowFingerprints(col("text"), n, w)).as("fp"))

  /** Unigram-LM fluency proxy: each document's mean corpus-frequency of
    * its tokens, normalized by total corpus tokens — the rational-
    * arithmetic stand-in for the perplexity filters (CCNet-style LM
    * scoring) a pretraining pipeline runs; low scores flag gibberish /
    * OOV-heavy documents. (A log-space LM score would need `ln`, which
    * is only faithfully rounded and drifts in the last ulp between
    * libms — see the file-header determinism rule; the mean-frequency
    * form keeps every value one correctly-rounded division chain of
    * exact integers.)
    *
    * Scale shape: token-keyed integer shuffles only (tf, then
    * vocab-sized cf), a vocab-sized equi-join, and a doc-keyed integer
    * sum — all partial-aggregated map-side; no document bodies and no
    * doubles move. Integer sums are order-independent, so the result
    * is partitioning-proof (a double-sum formulation would not be). */
  def unigramFluency(docs: DataFrame): DataFrame = {
    val tokens = docs.select(col("doc_id"), explode(toks).as("term"))
    val tf = tokens.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val cf = tf.groupBy("term").agg(sum(col("tf")).as("cf"))
    val tot = tokens.agg(count(lit(1)).as("__total"))
    tf.join(cf, "term")
      .groupBy("doc_id")
      .agg(sum(col("tf") * col("cf")).as("mass"), sum(col("tf")).as("n_tokens"))
      .crossJoin(tot)
      .select(col("doc_id"), col("n_tokens"), col("mass"),
        (col("mass").cast("double") / col("__total").cast("double") /
          col("n_tokens").cast("double")).as("fluency"))
  }

  /** Bigram corpus-frequency fluency — the second-order companion of
    * [[unigramFluency]] and a stronger perplexity proxy (CCNet-style
    * LM filtering ranks documents by how typical their WORD TRANSITIONS
    * are, not just their vocabulary): mass = Σ_bigram tf·cf over the
    * document's adjacent-token pairs, normalized by corpus and document
    * bigram totals. A doc of common words in word-salad order scores
    * low here while scoring high on the unigram signal.
    *
    * Bigram extraction is NARROW — an indexed `transform` over the
    * token array (no positional self-join, no extra shuffle); after
    * that the shape is exactly [[unigramFluency]]'s: token-keyed
    * integer shuffles, one bounded equi-join, one rounded chain at the
    * end. Documents with < 2 tokens drop out (no bigrams). */
  def bigramFluency(docs: DataFrame): DataFrame = {
    // split once into a column, then the indexed transform reads the
    // SAME array (three inline split() calls would re-tokenize per use)
    val bigramsOf = expr(
      "transform(slice(__l, 1, size(__l) - 1), " +
        "(x, i) -> concat(x, chr(31), element_at(__l, i + 2)))")
    val bigrams = docs.select(col("doc_id"), split(col("text"), " ").as("__l"))
      .select(col("doc_id"), explode(bigramsOf).as("bg"))
    val tf = bigrams.groupBy("doc_id", "bg").agg(count(lit(1)).as("tf"))
    val cf = tf.groupBy("bg").agg(sum(col("tf")).as("cf"))
    // corpus total = Σcf — a tiny agg over the (already reduced) bigram
    // vocabulary, not a second full corpus scan
    val tot = cf.agg(sum(col("cf")).as("__total"))
    tf.join(cf, "bg")
      .groupBy("doc_id")
      .agg(sum(col("tf") * col("cf")).as("mass"), sum(col("tf")).as("n_bigrams"))
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), col("n_bigrams"), col("mass"),
        (col("mass").cast("double") / col("__total").cast("double") /
          col("n_bigrams").cast("double")).as("bigram_fluency"))
  }

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1): the
    * fraction of tokens taken by the single most frequent token, and
    * the fraction of word bigrams that are repeats. High values mark
    * boilerplate/spam documents a pretraining filter drops.
    *
    * Scale shape: per-row and shuffle-free — the top-token count is the
    * longest run of the SORTED token array (no explode + groupBy, which
    * would shuffle one row per token at 100 TB), and the bigram repeat
    * fraction is `n − distinct(n)` over a per-row zip. Runs at scan
    * speed like the rest of this file.
    *
    * Determinism: both fractions are one correctly-rounded division of
    * exactly-computed integers (see file header). */
  def repetition(docs: DataFrame): DataFrame = {
    val n = size(toks)
    // longest run in the sorted array == count of the most frequent token
    val maxRun = aggregate(
      array_sort(toks),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc("prev"), acc("run") + 1).otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))
    val bigrams = zip_with(
      slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
      (a, b) => concat_ws(" ", a, b))
    val nb = size(bigrams)
    val db = size(array_distinct(bigrams))
    docs.select(
      col("doc_id"),
      n.cast("bigint").as("n_tokens"),
      (maxRun.cast("double") / n).as("top_token_frac"),
      when(nb === 0, lit(0.0))
        .otherwise((nb - db).cast("double") / nb).as("dup_bigram_frac"))
  }

  /** Benchmark decontamination: find corpus documents sharing at least
    * one word n-gram with an evaluation set — the overlap check every
    * pretraining run performs so benchmark text does not leak into
    * training data (the n-gram–collision method of GPT-3 appendix C /
    * Dodge et al. 2021). One row per contaminated doc: how many distinct
    * shingles leak, how many eval docs are hit, and the smallest hit
    * eval id (deterministic exemplar for triage).
    *
    * Scale shape: eval benchmarks are tiny next to a 100 TB corpus, so
    * the eval shingle side is BROADCAST — the corpus side is never
    * shuffled by the join; only the (doc_id, shingle, eval_id) hit
    * tuples move in the final aggregation. */
  def decontaminate(docs: DataFrame, evalDocs: DataFrame, n: Int = 3): DataFrame = {
    val corpusSh = withShingles(docs, n)
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))
    val evalSh = withShingles(evalDocs.select(col("doc_id").as("eval_id"), col("text")), n)
      .select(col("eval_id"), explode(col("shingles")).as("shingle"))
    corpusSh.join(broadcast(evalSh), "shingle")
      .groupBy("doc_id")
      .agg(
        countDistinct(col("shingle")).as("n_shared_shingles"),
        countDistinct(col("eval_id")).as("n_eval_docs_hit"),
        min(col("eval_id")).as("first_eval_hit"))
  }

  /** Eval-side contamination coverage — the "is this benchmark
    * compromised" report dual to [[decontaminate]]'s train-side view:
    * per EVAL document, how many of its distinct word `n`-shingles
    * appear anywhere in the training corpus, as an exact ppm fraction
    * (integer floor division — cross-engine bit-exact). Eval docs with
    * fewer than `n` tokens have no shingles and no row (nothing to
    * measure).
    *
    * Scale shape: the corpus side is only ever PROBED — eval shingles
    * broadcast into one pass over the corpus shingle stream, distinct
    * hits collapse to ≤ |eval shingles| rows, and every aggregate is
    * eval-sized. The corpus never shuffles. */
  def contaminationReport(docs: DataFrame, evalDocs: DataFrame,
                          n: Int = 3): DataFrame = {
    val corpusSh = withShingles(docs, n)
      .select(explode(col("shingles")).as("shingle"))
    val evalSh = withShingles(
        evalDocs.select(col("doc_id").as("eval_id"), col("text")), n)
      .select(col("eval_id"), explode(col("shingles")).as("shingle"))
    val totals = evalSh.groupBy("eval_id")
      .agg(count(lit(1)).as("n_shingles"))
    val hits = corpusSh.join(broadcast(evalSh), "shingle")
      .select("eval_id", "shingle").distinct()
      .groupBy("eval_id").agg(count(lit(1)).as("__hits"))
    totals.join(hits, Seq("eval_id"), "left")
      .select(col("eval_id"), col("n_shingles"),
        coalesce(col("__hits"), lit(0L)).as("n_contaminated"))
      .withColumn("coverage_ppm",
        expr("(n_contaminated * 1000000L) div n_shingles"))
  }

  /** [[decontaminate]] with a Bloom prefilter — the large-eval-set
    * scale path. The broadcast-join form ships every eval shingle to
    * every executor and hash-joins ALL corpus shingles against them;
    * here a driver-built Bloom filter over the eval shingle hashes
    * (bits ≈ −n·ln(fpp)/ln²2 — a few MB where the shingle set is GBs)
    * prefilters the corpus side AT THE SCAN via Spark's native
    * might-contain expression, so only probable hits reach the join.
    * Bloom filters have no false negatives and every bloom-positive is
    * exactly re-verified by the same equi-join, so the result is
    * IDENTICAL to [[decontaminate]] row-for-row (same oracle; equality
    * also asserted in OperatorsSpec) — only the plan changes. */
  def decontaminateBloom(docs: DataFrame, evalDocs: DataFrame, n: Int = 3,
                         fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.types.BinaryType
    val corpusSh = withShingles(docs, n)
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))
    val evalSh = withShingles(evalDocs.select(col("doc_id").as("eval_id"), col("text")), n)
      .select(col("eval_id"), explode(col("shingles")).as("shingle"))
    val nItems0 = math.max(1L, evalSh.select("shingle").distinct().count())
    val numBits0 = math.max(64L,
      math.ceil(-nItems0 * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    // BloomFilterAggregate silently clamps its arguments to the session
    // confs (defaults: 4M items / 64M bits) — past that the filter
    // would be undersized, fpp degrades, and the prefilter stops
    // pruning (rows stay correct regardless: blooms have no false
    // negatives and every positive is re-verified by the exact join).
    // Clamp explicitly and say so, instead of degrading silently.
    val spark = docs.sparkSession
    def conf(key: String, dflt: Long): Long =
      spark.conf.getOption(key).map(_.toLong).getOrElse(dflt)
    val maxItems = conf("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", 4000000L)
    val maxBits = conf("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", 67108864L)
    val nItems = math.min(nItems0, maxItems)
    val numBits = math.min(numBits0, maxBits)
    if (nItems < nItems0 || numBits < numBits0)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"decontaminateBloom: eval shingle set ($nItems0 distinct, $numBits0 bits ideal) " +
          s"exceeds session bloom limits ($maxItems items / $maxBits bits); " +
          "the prefilter's false-positive rate degrades past this point — " +
          "raise spark.sql.optimizer.runtime.bloomFilter.maxNumItems/maxNumBits " +
          "(correctness is unaffected: positives are exactly re-verified)")
    val bloomAgg = GraftBridge.column(
      new BloomFilterAggregate(
        GraftBridge.expression(xxhash64(col("shingle"))),
        Literal(nItems), Literal(numBits)).toAggregateExpression())
    val bloom = evalSh.agg(bloomAgg.as("bf")).head().getAs[Array[Byte]]("bf")
    val prefiltered = corpusSh.filter(GraftBridge.column(
      BloomFilterMightContain(Literal(bloom, BinaryType),
        GraftBridge.expression(xxhash64(col("shingle"))))))
    prefiltered.join(broadcast(evalSh), "shingle")
      .groupBy("doc_id")
      .agg(
        countDistinct(col("shingle")).as("n_shared_shingles"),
        countDistinct(col("eval_id")).as("n_eval_docs_hit"),
        min(col("eval_id")).as("first_eval_hit"))
  }

  /** Compression-ratio quality signal (the classic deflate filter —
    * Gopher-family pipelines drop documents whose bytes compress TOO
    * well, boilerplate/repetition, or barely at all, random blobs):
    * per document, raw UTF-8 size, deflated size (JDK zlib, fixed
    * level — deterministic for a given runtime), and their ratio.
    * Narrow per-row work at scan speed; no shuffle.
    *
    * The deflated size has no SQL oracle (DuckDB ships no zlib
    * surface), so the driver-visible entry is [[compressionGate]],
    * pinning the format's own guarantees. */
  def compressionRatio(docs: DataFrame, level: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(level)
        // release the native zlib state at TASK COMPLETION, not iterator
        // exhaustion: a downstream limit()/take() stops consuming early
        // and would strand the native memory until GC (end() is
        // idempotent, so also calling it on drain below is safe)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => deflater.end()))
        val buf = new Array[Byte](1 << 16)
        val mapped = it.map { case (id, text) =>
          val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          deflater.reset()
          deflater.setInput(raw)
          deflater.finish()
          var compressed = 0L
          while (!deflater.finished())
            compressed += deflater.deflate(buf)
          (id, raw.length.toLong, compressed,
            compressed.toDouble / math.max(raw.length, 1))
        }
        // eager release on full drain (local-mode callers outside a
        // task context still free promptly)
        new Iterator[(Long, Long, Long, Double)] {
          def hasNext: Boolean = {
            val h = mapped.hasNext
            if (!h) deflater.end()
            h
          }
          def next(): (Long, Long, Long, Double) = mapped.next()
        }
      }.toDF("doc_id", "raw_bytes", "deflate_bytes", "ratio")
  }

  /** One-row gate over [[compressionRatio]]'s format guarantees:
    * deflate output is non-empty and bounded by raw + 11 + 5·⌈raw/2¹⁶⌉
    * (zlib header + stored-block worst case — a THEOREM of the format,
    * not a tuning), checked for every document. */
  def compressionGate(docs: DataFrame): DataFrame = {
    val r = compressionRatio(docs)
    val worstCase = col("raw_bytes") + lit(11) +
      lit(5) * ceil(col("raw_bytes").cast("double") / 65536.0)
    r.agg(count(lit(1)).as("n_docs"),
      coalesce(bool_and(col("deflate_bytes") > 0), lit(true)).as("nonempty_ok"),
      coalesce(bool_and(col("deflate_bytes") <= worstCase), lit(true))
        .as("bound_ok"))
  }

  /** Quality-decile curriculum assignment: every document labeled with
    * its global quality bucket 1..`buckets` (1 = lowest) — the data-
    * ordering signal curriculum-style pretraining consumes (feed high
    * deciles late, or sample deciles on a schedule). VALUE-based
    * bucketing against exact global quantile thresholds, not rank-based
    * ntile: equal scores always share a bucket, so the label is
    * deterministic under reshuffling and ties (a rank formulation
    * splits ties by arbitrary row order).
    *
    * Scale shape: ONE aggregate computes the (buckets−1) thresholds
    * (Spark's exact `percentile`, bit-equal to the oracle's
    * quantile_cont — proven by q_quantiles), broadcast back over the
    * corpus for a narrow comparison pass. The exact-percentile
    * aggregate concentrates the distinct-score histogram on one
    * reducer — at 100 TB swap in the [[budgetMixSelect]] two-phase
    * histogram + boundary-sliver refinement, which finds the same
    * exact thresholds with a bounded sort; the assignment pass is
    * unchanged. */
  def curriculumDeciles(docs: DataFrame, buckets: Int = 10): DataFrame = {
    val scored = quality(docs).select(col("doc_id"), col("quality_score"))
    val ps = (1 until buckets).map(i => i.toDouble / buckets)
    val thr = scored.agg(
      expr(s"percentile(quality_score, array(${ps.mkString(",")}))").as("__t"))
    val decile = ps.indices
      .map(i => when(col("quality_score") > col("__t").getItem(i), 1).otherwise(0))
      .reduce(_ + _) + lit(1)
    scored.crossJoin(broadcast(thr))
      .select(col("doc_id"), col("quality_score"),
        decile.cast("bigint").as("decile"))
  }

  /** Per-domain (source) mixture weights — the DoReMi-style domain
    * reweighting table a pretraining run consumes: per source, document
    * and token counts, the exact token share, and a temperature-scaled
    * sampling weight share^alpha (alpha < 1 flattens the mixture
    * toward rare domains, the standard multilingual/multi-source
    * rebalancing trick; alpha = 0.5 is the sqrt rule). The weight
    * column is UNNORMALIZED by design: normalizing needs a cross-group
    * sum of doubles, whose accumulation order differs between engines
    * at the last ulp — every emitted value here derives from exact
    * integer totals through one correctly-rounded IEEE chain
    * (÷ then pow), so the oracle matches bit-for-bit. Normalization is
    * one driver-side division by the weight column's sum.
    *
    * Scale shape: one partial+final hash aggregate over the corpus
    * (longs only through the exchange) + one broadcast of the 1-row
    * global total — no sort, no window, nothing driver-side. */
  def domainWeights(docs: DataFrame, alpha: Double = 0.5): DataFrame = {
    val perSource = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(toks).cast("long")).as("n_tokens"))
    val total = perSource.agg(sum(col("n_tokens")).as("__total"))
    val share = col("n_tokens").cast("double") / col("__total").cast("double")
    // sqrt is correctly rounded in IEEE-754 (pow is only ~1 ulp in both
    // engines' libms) — route the default sqrt rule through sqrt so the
    // oracle matches bit-for-bit
    val weight = if (alpha == 0.5) sqrt(share) else pow(share, lit(alpha))
    perSource.crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        share.as("token_share"), weight.as("mix_weight"))
  }

  /** Token-budgeted mixture selection: within each language, keep the
    * highest-quality documents until a per-language token budget is
    * filled (inclusive running total) — the data-mixing step that turns
    * a curated pool into a pretraining mixture with fixed per-source
    * token quotas. Deterministic: ties in quality break by doc_id.
    *
    * Scale shape: one shuffle on `lang` and a per-language sort — the
    * exact formulation. At 100 TB per-language sorts are the cost; the
    * scale path is two-phase: find the quality threshold θ_lang where
    * the budget fills via `approx_percentile` (one agg, no sort), keep
    * everything above θ, and run THIS exact operator only on the
    * boundary sliver quality ≈ θ. Exact top is unchanged; only the
    * boundary is sorted. The sliver refinement composes from this same
    * function, so the exact form is what we pin with the oracle. */
  /** [[budgetMix]] with token accounting supplied by a real TOKENIZER
    * instead of the whitespace proxy: `tokenCounts` is any (doc_id,
    * n_tokens) relation — in the wired query, [[Bpe.encode]]'s
    * n_pieces, so the budget a training run actually consumes (subword
    * tokens) is what the quota meters. Ranking stays quality-ordered
    * (ties to doc_id); only the accounting column changes, so the
    * selection semantics and the scale shape (one lang shuffle + the
    * sliver-refinement path) are [[budgetMix]]'s unchanged. */
  def budgetMixTokenized(docs: DataFrame, tokenCounts: DataFrame,
                         tokensPerLang: Long = 2000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang")
      .orderBy(col("quality_score").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    quality(docs).select(col("doc_id"), col("quality_score"))
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .join(tokenCounts.select(col("doc_id"),
        col("n_tokens").cast("bigint").as("n_tokens")), "doc_id")
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= tokensPerLang)
      .select("doc_id", "lang", "n_tokens", "quality_score", "cum_tokens")
  }

  /** Temperature-scaled mixture weights over sources (the multilingual
    * /multi-corpus sampling rule of Conneau & Lample 2019 and the
    * Pile/T5 mixing recipes): sample source d with probability ∝
    * n_d^α. α = 1/2 — the common "flatten the head, keep the tail
    * audible" point — is the one exponent expressible in EXACT IEEE
    * arithmetic (√ is correctly rounded; ln/exp for general α are
    * not), so each weight is ONE sqrt then floor-quantized to integer
    * micro-units BEFORE any sum: totals and shares are pure integer
    * arithmetic, bit-identical cross-engine.
    *
    * Output per source: raw doc share vs temperature share, both in
    * ppm (floor division), plus the sampling boost vs proportional.
    * Scale shape: one aggregate to O(sources) rows, two broadcast
    * scalars — corpus-size-independent. */
  def temperatureMix(docs: DataFrame): DataFrame = {
    val counts = docs.groupBy("source")
      .agg(count(lit(1)).cast("bigint").as("n_docs"))
      .withColumn("w_micro",
        expr("CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1e6) AS BIGINT)"))
    val tot = counts.agg(sum("n_docs").as("__tn"), sum("w_micro").as("__tw"))
    counts.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("w_micro"),
        expr("(n_docs * 1000000L) div __tn").as("raw_share_ppm"),
        expr("(w_micro * 1000000L) div __tw").as("temp_share_ppm"))
  }

  def budgetMix(docs: DataFrame, tokensPerLang: Long = 2000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang")
      .orderBy(col("quality_score").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    quality(docs).select(col("doc_id"), col("n_tokens"), col("quality_score"))
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= tokensPerLang)
      .select("doc_id", "lang", "n_tokens", "quality_score", "cum_tokens")
  }

  /** The 100 TB form of [[budgetMix]]'s SELECTION: which documents make
    * the mixture, without a per-language total sort.
    *
    * Two-phase sliver refinement: (1) one aggregation builds a bounded
    * per-(lang, quality-bucket) token histogram (≤ langs×`buckets` rows
    * — driver-small at ANY corpus size); the driver walks each
    * language's buckets best-first to find the boundary bucket where
    * the budget crosses. Everything in strictly-better buckets is kept
    * with a plain filter (no sort); only the boundary bucket — a
    * 1/`buckets` sliver — runs the exact windowed cumulative, seeded
    * with the tokens already consumed above it. (2) keep-set equality
    * with the exact operator is EXACT, not approximate: buckets are
    * floor(quality·buckets), monotone in quality, and the exact keep
    * rule is prefix-closed, so bucket order refines global order
    * (PqIndexSpec-style equality is asserted in OperatorsSpec).
    * Emits (doc_id, lang, n_tokens, quality_score) — running totals are
    * the exact form's concern; the selection is what a mixing job
    * materializes. */
  def budgetMixSelect(docs: DataFrame, tokensPerLang: Long = 2000L,
                      buckets: Int = 10000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val scored = quality(docs)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .withColumn("bucket", floor(col("quality_score") * buckets).cast("long"))
    val hist = scored.groupBy("lang", "bucket")
      .agg(sum(col("n_tokens")).as("toks"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // best-first walk per language: boundary = first bucket where the
    // cumulative crosses the budget; offset = tokens consumed above it
    val plans = hist.groupBy(_._1).map { case (lang, rows) =>
      var acc = 0L
      var boundary = Long.MinValue
      var offset = 0L
      val it = rows.sortBy(-_._2).iterator
      while (it.hasNext && boundary == Long.MinValue) {
        val (_, bucket, toks) = it.next()
        if (acc + toks > tokensPerLang) { boundary = bucket; offset = acc }
        else acc += toks
      }
      (lang, boundary, offset)                         // MinValue → keep all
    }.toSeq.toDF("lang", "boundary", "offset")
    val planned = scored.join(broadcast(plans), "lang")
    val keptOutright = planned.filter(col("bucket") > col("boundary"))
    val w = Window.partitionBy("lang")
      .orderBy(col("quality_score").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sliverKept = planned.filter(col("bucket") === col("boundary"))
      .withColumn("cum", sum(col("n_tokens")).over(w) + col("offset"))
      .filter(col("cum") <= tokensPerLang)
    keptOutright.unionByName(sliverKept.drop("cum"))
      .select("doc_id", "lang", "n_tokens", "quality_score")
  }

  /** Sequence packing, concat-then-chunk (the GPT-2/3 pretraining
    * layout): documents are concatenated in deterministic order and the
    * token stream is split into fixed `seqLen`-token context windows;
    * each document reports the window span it lands in. One row per
    * doc: (doc_id, shard, n_tokens, cum_tokens, start_seq, end_seq) —
    * a doc with start_seq < end_seq straddles a window boundary.
    *
    * Scale shape: packing is inherently sequential, so the corpus is
    * sharded (shard = doc_id % shards — engine-portable, deterministic)
    * and each shard packs independently under a per-shard window — a
    * parallel sort per shard, never a global one. `shards` sizes to the
    * cluster; window ids are per-shard (a writer emits shard files).
    *
    * Determinism: pure integer arithmetic (counts, running sums,
    * integer division) — bit-exact across engines and partitionings. */
  def packSequences(docs: DataFrame, seqLen: Int = 512, shards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col("doc_id"), (col("doc_id") % shards).as("shard"),
        size(toks).cast("bigint").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("shard"), col("n_tokens"), col("cum_tokens"),
        expr(s"(cum_tokens - n_tokens) DIV $seqLen").as("start_seq"),
        expr(s"(cum_tokens - 1) DIV $seqLen").as("end_seq"))
  }

  /** Corpus vocabulary build: the `size` most frequent whitespace
    * tokens, ranked (count desc, term asc) with dense consecutive ids —
    * the word-level analog of a tokenizer-training frequency pass.
    *
    * Scale shape: token-keyed count with map-side partial aggregation
    * (integer cells, no document bodies), then top-`size` via Spark's
    * TakeOrderedAndProject (per-partition bounded heaps — no global
    * sort of the vocabulary). The id-assigning window runs AFTER the
    * limit, over `size` rows — single-partition but bounded by the
    * vocabulary size, not the corpus. */
  /** Heaps-law vocabulary-growth curve: cumulative DISTINCT terms
    * after each doc-id decile of the corpus — sublinear growth is the
    * natural-corpus signature; a near-linear curve flags synthetic or
    * unmixed data. Exact and distributed: each term contributes at its
    * FIRST document (min doc_id — one term-keyed aggregate), deciles
    * come from the two-phase [[Ids.ntileRank]], and the cumulative
    * count is a ≤buckets-row triangular join — cumulative-distinct
    * never needs a running set. */
  def vocabGrowth(docs: DataFrame, buckets: Int = 10): DataFrame = {
    val firsts = docs.select(col("doc_id"), explode(toks).as("term"))
      .groupBy("term").agg(min(col("doc_id")).as("first_doc"))
    val bounds = Ids.ntileRank(docs.select(col("doc_id")),
        Seq(col("doc_id")), buckets, "bucket")
      .groupBy("bucket")
      .agg(max(col("doc_id")).as("hi"), count(lit(1)).as("n_docs"))
    val cumDocs = bounds.as("x").join(bounds.as("y"),
        col("y.bucket") <= col("x.bucket"))
      .groupBy(col("x.bucket").as("bucket"), col("x.hi").as("hi"))
      .agg(sum(col("y.n_docs")).as("docs_cum"))
    firsts.crossJoin(broadcast(cumDocs))
      .filter(col("first_doc") <= col("hi"))
      .groupBy(col("bucket"), col("docs_cum"))
      .agg(count(lit(1)).as("vocab_cum"))
      .select(col("bucket").cast("bigint").as("bucket"),
        col("docs_cum"), col("vocab_cum"))
      .orderBy("bucket")
  }

  /** Zipf concentration curve: the token-mass share of the top-k most
    * frequent terms for a k grid — [[vocabGrowth]]'s companion law
    * (a natural corpus concentrates hard: top-100 terms usually carry
    * a large constant share; a flat curve flags shuffled/synthetic
    * text). Ranks come from the two-phase [[Ids.assignIds]] on
    * (count desc, term) — no single-task sort of the vocabulary —
    * shares are exact integer ppm. */
  def zipfShare(docs: DataFrame,
                ks: Seq[Long] = Seq(1L, 10L, 100L, 1000L)): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tf = docs.select(explode(toks).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
    val ranked = Ids.assignIds(tf, Seq(col("n").desc, col("term")), "rnk")
    val tot = tf.agg(sum(col("n")).as("total"))
    ranked.crossJoin(broadcast(ks.toDF("k")))
      .filter(col("rnk") < col("k"))
      .groupBy("k").agg(sum(col("n")).as("top_tokens"))
      .crossJoin(broadcast(tot))
      .select(col("k"), col("top_tokens"),
        expr("(top_tokens * 1000000L) div total").as("share_ppm"))
      .orderBy("k")
  }

  def vocabulary(docs: DataFrame, size: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs.select(explode(toks).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
    tf.orderBy(col("n").desc, col("term").asc).limit(size)
      .withColumn("token_id",
        row_number().over(Window.orderBy(col("n").desc, col("term").asc))
          .cast("bigint"))
  }

  /** PMI collocation mining — adjacent word pairs that co-occur far
    * more than their unigram frequencies predict (phrase/term
    * extraction, the statistical input to phrase-aware tokenization
    * and stop-phrase lists; Church & Hanks 1990). PMI is reported in
    * exact integer micro-units — floor(10⁶ · c(a,b) · N_bigrams /
    * (c(a) · c(b))) — the engine's standard log-free rational form, so
    * the ranking is bit-identical in both engines (log() would only
    * monotonically rescale it).
    *
    * Scale shape: one indexed-transform bigram pass (same extraction
    * as [[bigramFluency]], bodies never shuffled), token/pair-keyed
    * integer counts with map-side partials, unigram counts broadcast
    * (vocabulary-bounded at any corpus size), the corpus total riding
    * a 1-row broadcast. The micro-unit product is exact in longs up
    * to ~3·10⁹ corpus bigrams; past that the identical chain runs in
    * DECIMAL(38,0) (same div semantics both engines). */
  def collocations(docs: DataFrame, minCount: Long = 5L): DataFrame = {
    val pairsOf = expr(
      "transform(slice(__l, 1, size(__l) - 1), " +
        "(x, i) -> named_struct('w1', x, 'w2', element_at(__l, i + 2)))")
    val split0 = docs.select(split(col("text"), " ").as("__l"))
    val pairs = split0.select(explode(pairsOf).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val cab = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
    val nb = cab.agg(sum(col("c_ab")).as("__nb"))
    val uni = split0.select(explode(col("__l")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    cab.filter(col("c_ab") >= minCount)
      .join(broadcast(uni.toDF("w1", "c1")), "w1")
      .join(broadcast(uni.toDF("w2", "c2")), "w2")
      .crossJoin(broadcast(nb))
      .select(col("w1"), col("w2"), col("c_ab"),
        expr("(c_ab * __nb * 1000000) div (c1 * c2)").as("pmi_micro"))
  }

  /** Canonical text normalization — the fold applied before exact
    * dedup so case/punctuation/whitespace variants collapse (the C4 /
    * RefinedWeb-style canonicalization): lowercase, non-alphanumerics
    * to spaces, runs of spaces collapsed, trimmed. Returned as a
    * column expression so dedup composes without re-materializing
    * text. ASCII-safe by corpus contract (the multimodal oracle
    * verified octet_length = length at every SF); a Unicode corpus
    * would add NFC normalization in the same per-row shape. */
  def normalized(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** Per-document normalization digest + size deltas: what a cleanup
    * pass materializes (the digest feeds [[Dedup.exactNormalized]];
    * bodies stay out of the result). Narrow, zero shuffle. */
  def normalize(docs: DataFrame): DataFrame = {
    val norm = normalized(col("text"))
    docs.select(
      col("doc_id"),
      length(col("text")).cast("bigint").as("n_chars"),
      length(norm).cast("bigint").as("n_norm_chars"),
      md5(norm).as("norm_md5"))
  }

  /** Overlapping token-window chunking (the RAG / context-window prep
    * pass): windows of `size` tokens every `stride` tokens, the last
    * window short if the document ends mid-stride. One row per chunk:
    * (doc_id, chunk_idx, n_chunk_tokens, chunk_md5) — the digest stands
    * in for the chunk body (a production writer emits the text column;
    * the digest keeps corpus bodies out of the verify surface).
    *
    * Scale shape: per-row explode of a bounded index range + array
    * slices — narrow, zero shuffle, scan speed; fan-out is
    * ≈ n_tokens/stride rows per document (each row a 16-byte digest,
    * not a body copy). */
  def chunk(docs: DataFrame, size: Int = 32, stride: Int = 16): DataFrame = {
    val n = org.apache.spark.sql.functions.size(toks)
    docs
      .select(col("doc_id"), toks.as("__toks"),
        explode(sequence(lit(0), ((n - 1) / stride).cast("int"))).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx").cast("bigint").as("chunk_idx"),
        slice(col("__toks"), col("chunk_idx") * stride + 1, lit(size)).as("__chunk"))
      .select(col("doc_id"), col("chunk_idx"),
        org.apache.spark.sql.functions.size(col("__chunk"))
          .cast("bigint").as("n_chunk_tokens"),
        md5(concat_ws(" ", col("__chunk"))).as("chunk_md5"))
  }

  /** PII redaction — the scrub pass between crawling and training:
    * URL-ish, email-ish, and phone-shaped spans replaced by typed
    * placeholder tokens, with per-kind match counts and the digest of
    * the redacted text (bodies stay out of the result; a production
    * writer emits the redacted column itself). Replacement order is
    * URL → email → phone, counted on the text each pattern actually
    * sees, so the two engines transform identical intermediates.
    *
    * Scale shape: per-row regex at scan speed, zero shuffle — same
    * narrow contract as [[contentFlags]]; patterns stay in the regex
    * subset Spark and DuckDB interpret identically. */
  def redactPii(docs: DataFrame): DataFrame = {
    val urlRe = "https?://[a-z0-9./_-]+"
    val emailRe = "[a-z0-9._-]+@[a-z0-9._-]+"
    val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
    docs
      .withColumn("__r1", regexp_replace(col("text"), urlRe, "[URL]"))
      .withColumn("__r2", regexp_replace(col("__r1"), emailRe, "[EMAIL]"))
      .withColumn("__r3", regexp_replace(col("__r2"), phoneRe, "[PHONE]"))
      .select(
        col("doc_id"),
        size(expr(s"regexp_extract_all(text, '$urlRe', 0)"))
          .cast("bigint").as("n_urls"),
        size(expr(s"regexp_extract_all(__r1, '$emailRe', 0)"))
          .cast("bigint").as("n_emails"),
        size(expr(s"regexp_extract_all(__r2, '$phoneRe', 0)"))
          .cast("bigint").as("n_phones"),
        md5(col("__r3")).as("redacted_md5"))
  }

  /** Weighted mixture sampling: draw a deterministic UNBIASED sample
    * hitting a target per-language document distribution (the
    * data-mixing counterpart of [[budgetMix]], which ranks by quality
    * under a token budget — this one preserves the within-language
    * distribution by hash-order draw, the way pretraining mixtures
    * resample sources to target proportions). Quota_l = weight_l ×
    * total, rounded; languages absent from the corpus underfill, never
    * substitute.
    *
    * Determinism: the draw order is md5(doc_id) — reproducible,
    * engine-portable, uncorrelated with any data attribute. Scale
    * shape: one broadcast quota join + a per-language window over
    * (lang, md5) pairs — id-sized rows; at extreme per-language
    * cardinality swap the boundary-sliver refinement of
    * [[budgetMixSelect]] (same histogram trick over md5 prefixes). */
  def mixtureSample(docs: DataFrame, weights: Map[String, Double],
                    total: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val quotas = weights.toSeq.map { case (l, w) => (l, math.round(w * total)) }
      .toDF("lang", "quota")
    val w = Window.partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs.select(col("doc_id"), col("lang"))
      .join(broadcast(quotas), "lang")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("quota"))
      .select(col("doc_id"), col("lang"), col("rn").cast("bigint").as("pick_order"))
  }

  /** End-to-end corpus curation — the composed selection a training-
    * data run actually executes over raw documents: keep documents that
    * (a) clear the quality bar, (b) are in the target language, and
    * (c) survive near-dup canonicalization (canonical member only, so
    * one representative per duplicate group). One row per kept doc:
    * (doc_id, n_tokens, quality_score, predicted_lang).
    *
    * Scale shape: [[quality]] and [[langId]] are narrow scan-speed
    * expressions; [[Dedup.dedupPipeline]] is the LSH-candidates →
    * verify → star-contraction path; the three results meet on doc_id
    * equi-joins. Nothing here shuffles document bodies. */
  def curateCorpus(docs: DataFrame, minQuality: Double = 0.42,
                   lang: String = "en", jaccard: Double = 0.5): DataFrame =
    quality(docs).select(col("doc_id"), col("n_tokens"), col("quality_score"))
      .join(langId(docs).select(col("doc_id"), col("predicted_lang")), "doc_id")
      .join(Dedup.dedupPipeline(docs, threshold = jaccard)
        .select(col("doc_id"), col("is_dup")), "doc_id")
      .filter(col("quality_score") >= minQuality &&
        col("predicted_lang") === lang && !col("is_dup"))
      .select("doc_id", "n_tokens", "quality_score", "predicted_lang")

  /** The COMPLETE training-corpus preparation, raw crawl → mixture:
    * (1) quality bar, (2) near-dup canonicalization (one representative
    * per duplicate group, via the LSH→verify→star-contraction
    * pipeline), (3) benchmark decontamination (drop anything sharing a
    * shingle with the eval set), (4) per-language token-budget mixture
    * selection. This is the end-to-end query a pretraining-data run
    * actually executes; every stage is one of this engine's
    * oracle-verified operators composed on doc_id equi-joins.
    *
    * Scale shape inherits from the stages: narrow quality scoring,
    * equi-join-only dedup (no all-pairs), broadcast eval side, and the
    * budget window (swap [[budgetMixSelect]] for the sliver path at
    * full scale — selection-equal by spec). Document bodies feed narrow
    * expressions only and never shuffle. */
  /** 32-hex-digit threshold string for fraction `f` of the md5 space:
    * md5 digests are uniform in [0, 16^32), so `digest < threshold`
    * selects an `f` fraction — deterministically, engine-independently
    * (lowercase-hex strings compare bytewise identically everywhere). */
  private[graft] def hexThreshold(f: Double): String = {
    val sb = new StringBuilder
    var x = f
    for (_ <- 1 to 32) {
      x *= 16
      val d = math.min(15, x.toInt)
      sb.append(java.lang.Integer.toHexString(d))
      x -= d
    }
    sb.toString
  }

  /** Deterministic train/validation/test assignment by content-free id
    * hash — the split every training-data pipeline freezes before any
    * filtering, so membership never drifts as upstream stages change.
    * md5(doc_id) is uniform; comparing the hex digest against fraction
    * thresholds gives an exact, engine-independent, reshuffle-proof
    * split (a `rand()` split is none of those). Narrow per-row
    * expression; nothing shuffles. */
  def splitAssign(docs: DataFrame, trainFrac: Double = 0.8,
                  valFrac: Double = 0.1): DataFrame = {
    val h = md5(col("doc_id").cast("string"))
    docs.select(col("doc_id"),
      when(h < hexThreshold(trainFrac), "train")
        .when(h < hexThreshold(trainFrac + valFrac), "validation")
        .otherwise("test").as("split"))
  }

  /** Leakage-free split — [[splitAssign]]'s deterministic membership
    * contract PLUS the guarantee that content-identical documents
    * (normalized-dup groups, [[Dedup.exactNormalized]]'s key) never
    * straddle splits: a train copy of a test document is exactly the
    * contamination the split exists to prevent, and a per-doc hash
    * split scatters dup groups across splits in proportion to their
    * size. Membership hashes the GROUP representative (min doc_id of
    * the normalized-digest group), so every member inherits one draw.
    * Near-dup-grade grouping composes the same way — feed
    * [[Dedup.dedupPipeline]] component ids in place of the digest
    * (spec-pinned); the digest form is the exact-answer default.
    * Scale shape: one digest-keyed agg + one digest equi-join; text
    * hashes at the scan, bodies never shuffle. */
  def splitAssignLeakFree(docs: DataFrame, trainFrac: Double = 0.8,
                          valFrac: Double = 0.1): DataFrame =
    splitAssignGrouped(docs.select(col("doc_id"),
      md5(normalized(col("text"))).as("group_key")), trainFrac, valFrac)

  /** The grouped core: `groups` is (doc_id, group_key) from ANY
    * duplicate-grouping stage — the normalized digest (the exact
    * wrapper above) or [[Dedup.dedupPipeline]]'s canonical component
    * ids for near-dup-grade leak protection. One draw per group. */
  def splitAssignGrouped(groups: DataFrame, trainFrac: Double = 0.8,
                         valFrac: Double = 0.1): DataFrame = {
    val reps = groups.groupBy("group_key").agg(min("doc_id").as("__rep"))
    val h = md5(col("__rep").cast("string"))
    groups.join(reps, "group_key")
      .select(col("doc_id"),
        when(h < hexThreshold(trainFrac), "train")
          .when(h < hexThreshold(trainFrac + valFrac), "validation")
          .otherwise("test").as("split"))
  }

  /** CCNet-style segment-level dedup (boilerplate removal — Wenzek et
    * al. 2019 §4.1, RefinedWeb line-dedup): cut each document into
    * fixed `window`-word segments, drop every segment whose exact word
    * sequence occurs in ≥ `minDocs` DISTINCT documents (nav chrome,
    * licence blocks, cookie banners — and full-copy duplicates — all
    * land here), and reassemble the survivors in order. CCNet's
    * segment is the newline; this corpus has none, so the segment is a
    * fixed word window (same algorithm, different segmenter).
    *
    * Scale shape: the duplicate census aggregates (h → distinct docs)
    * on md5 CONTENT hashes — segment text never rides that shuffle;
    * text moves once, in the per-document reassembly (one row per
    * segment, the q_text_chunks volume). The boilerplate hash set (a
    * tiny fraction of segments by construction — only cross-document
    * repeats) is the small side of the filter join. Reassembly sorts
    * by segment index inside each group, so the output is
    * reshuffle-proof; a document whose every segment is boilerplate
    * stays in the output with empty clean_text (count columns make the
    * removal auditable). */
  def segmentDedup(docs: DataFrame, window: Int = 20, minDocs: Int = 2): DataFrame = {
    val segs = docs
      .select(col("doc_id"), toks.as("__w"))
      .select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, cast(ceil(size(__w) / $window.0) as int) - 1), " +
            s"i -> array_join(slice(__w, i * $window + 1, $window), ' '))"))
          .as(Seq("pos", "seg_text")))
      .withColumn("h", md5(col("seg_text")))
    val boiler = segs.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("__docs"))
      .filter(col("__docs") >= minDocs)
      .select(col("h"), lit(true).as("__boiler"))
    segs.join(boiler, Seq("h"), "left_outer")
      .groupBy("doc_id")
      .agg(
        array_join(transform(array_sort(collect_list(
          when(col("__boiler").isNull, struct(col("pos"), col("seg_text"))))),
          x => x("seg_text")), " ").as("clean_text"),
        count(lit(1)).as("n_segments"),
        sum(when(col("__boiler").isNotNull, 1L).otherwise(0L)).as("n_removed"))
  }

  /** Exact-substring span dedup at token granularity — the
    * ExactSubstr flavor of Lee et al. 2022 ("Deduplicating Training
    * Data Makes Language Models Better"): find every `k`-token window
    * whose exact content occurs in ≥ `minDocs` DISTINCT documents,
    * merge the flagged windows into maximal covered spans per
    * document, and emit the document with those spans removed plus
    * span-count/token-count audit columns. Unlike [[segmentDedup]]
    * (fixed aligned windows), the windows here SLIDE — a duplicated
    * passage is caught at any offset, which is the property the
    * suffix-array formulation buys; the k-gram census is its
    * shuffle-friendly approximation (granularity k instead of exact
    * maximal repeats).
    *
    * Scale shape: the census aggregates md5 window hashes (text never
    * rides that shuffle); flagged (doc_id, pos) pairs are integers;
    * the per-document interval merge is a narrow sorted-array fold
    * (equal-length intervals make the running-end monotone, so one
    * pass suffices); span removal is a per-row indexed filter against
    * the sorted start list. Documents shorter than k tokens carry no
    * windows and pass through unchanged via the outer join. */
  def substrDedup(docs: DataFrame, k: Int = 8, minDocs: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // 128-bit window key as two seeded xxhash64 longs (16 bytes on the
    // wire, ~10× cheaper than md5; not parity-bearing — the oracle
    // hashes on its own side, and 128 bits keep the false-flag
    // probability negligible at 100 TB window counts)
    val grams = docs.select(col("doc_id"), toks.as("__w"))
      .filter(size(col("__w")) >= k)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size(__w) - $k), " +
          s"i -> concat_ws(' ', slice(__w, i + 1, $k)))"))
        .as(Seq("pos", "g")))
      .select(col("doc_id"), col("pos"),
        xxhash64(col("g")).as("h1"), xxhash64(lit(1), col("g")).as("h2"))
    // distinct-doc census as ONE shuffle via same-partitioning windows
    // (dense_rank over doc_id, then its per-key max) — the grams are
    // computed once and never joined back, unlike a groupBy census +
    // re-join, which would both recompute the explode and shuffle it a
    // second time. Sort-based windows stream skewed keys (a boiler-
    // plate window present in every document) without building lists.
    val w1 = Window.partitionBy("h1", "h2").orderBy("doc_id")
    val w2 = Window.partitionBy("h1", "h2")
    val starts = grams
      .withColumn("__dr", dense_rank().over(w1))
      .withColumn("__nd", max(col("__dr")).over(w2))
      .filter(col("__nd") >= minDocs)
      .groupBy("doc_id")
      .agg(array_sort(collect_list(col("pos"))).as("__starts"))
    docs.join(starts, Seq("doc_id"), "left_outer")
      .withColumn("__s", coalesce(col("__starts"), expr("CAST(array() AS array<int>)")))
      .withColumn("__w", toks)
      .withColumn("__iv", expr(
        // one fold over the sorted starts: running (prevEnd, covered,
        // spans); ends are monotone because every interval is k long
        s"""aggregate(__s, struct(-1 as prevEnd, 0L as covered, 0L as spans),
           |  (acc, s) -> struct(
           |    s + $k - 1 as prevEnd,
           |    acc.covered + greatest(0, (s + $k - 1) - greatest(acc.prevEnd + 1, s) + 1) as covered,
           |    acc.spans + if(s > acc.prevEnd, 1L, 0L) as spans))""".stripMargin))
      .select(col("doc_id"),
        expr(s"""array_join(filter(__w,
                |  (x, i) -> NOT exists(__s, s -> s <= i AND i <= s + $k - 1)), ' ')"""
          .stripMargin).as("clean_text"),
        col("__iv.spans").as("n_dup_spans"),
        col("__iv.covered").cast("bigint").as("dup_tokens"))
  }

  /** Length-bucketed batch assignment — the data-ordering signal for
    * efficient padded-batch training (documents of similar token count
    * batch together, so per-batch padding waste is bounded by
    * `bucketWidth`). bucket = n_tokens/bucketWidth capped at
    * `maxBucket`; batch index = the document's deterministic md5-order
    * rank within its bucket, divided by `batchSize`. All integer
    * arithmetic; the md5 rank makes membership reshuffle-proof.
    *
    * Scale note: row_number within a bucket is inherently sequential
    * per bucket — with a handful of buckets over 100 TB, assign batches
    * by md5-prefix RANGES instead (each range is a batch; same
    * determinism, no global ordering). The bucket label itself is
    * narrow per-row arithmetic at any scale. */
  def lengthBuckets(docs: DataFrame, bucketWidth: Int = 16, maxBucket: Int = 7,
                    batchSize: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("bucket"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs.select(col("doc_id"), size(toks).cast("bigint").as("n_tokens"))
      .withColumn("bucket",
        least(floor(col("n_tokens") / bucketWidth), lit(maxBucket)).cast("bigint"))
      .withColumn("batch_idx",
        floor((row_number().over(w) - 1) / batchSize.toDouble).cast("bigint"))
  }

  /** Target-affinity scoring — DSIR-flavored data selection (Xie et
    * al. 2023) reduced to exact set overlap so it stays
    * integer-deterministic: the fraction of a document's DISTINCT word
    * bigrams that occur anywhere in the `target` corpus. High-affinity
    * documents are "domain-alike" and get upweighted when composing a
    * mixture toward the target distribution (the full DSIR importance
    * weight needs log-likelihood ratios, whose libm `ln` is not
    * cross-engine reproducible — the overlap fraction is the
    * oracle-safe core, one correctly-rounded division per row).
    *
    * Scale shape: bigrams ride as md5 hashes (text never shuffles);
    * the target's distinct-hash set broadcasts (a held-out target
    * corpus is small by definition); the per-document count is one
    * hash-aggregate. Documents with zero bigrams (single-token) have
    * no rows to score and drop out, same as the SQL formulation. */
  def targetAffinity(docs: DataFrame, target: DataFrame): DataFrame = {
    val bigramsOf = expr(
      "transform(slice(__l, 1, size(__l) - 1), " +
        "(x, i) -> concat(x, chr(31), element_at(__l, i + 2)))")
    def bigrams(d: DataFrame): DataFrame =
      d.select(col("doc_id"), split(col("text"), " ").as("__l"))
        .select(col("doc_id"), explode(bigramsOf).as("bg"))
    val docBg = bigrams(docs)
      .select(col("doc_id"), md5(col("bg")).as("h")).distinct()
    val targetSet = bigrams(target)
      .select(md5(col("bg")).as("h")).distinct()
      .withColumn("__hit", lit(true))
    docBg.join(broadcast(targetSet), Seq("h"), "left_outer")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("__hit"), 1L).otherwise(0L)).as("n_matched"))
      .select(col("doc_id"), col("n_bigrams"), col("n_matched"),
        (col("n_matched").cast("double") / col("n_bigrams").cast("double"))
          .as("affinity"))
  }

  /** Hashed n-gram importance weights — the DSIR recipe (Xie et al.
    * 2023, "Data Selection for Language Models via Importance
    * Resampling") with its log-likelihood ratio replaced by a ratio of
    * integer count inner-products so the score is exact cross-engine
    * (libm `ln` is not reproducible; `/` is). Bigrams hash into a FIXED
    * bucket space (first 3 md5 hex chars → 4096 buckets), so the
    * target and background "models" are ≤4096-row count tables no
    * matter the corpus size — that bounded feature space is the core
    * DSIR idea. Per document:
    * `w_num = Σ_b c_doc(b)·(t_b+1)`, `w_den = Σ_b c_doc(b)·(q_b+1)`
    * (add-one smoothing; t = target bucket counts, q = background =
    * whole-corpus bucket counts), and `weight = w_num / w_den` — high
    * weight ⇒ the document's hashed-bigram mass sits where the target
    * distribution is dense relative to the background, the resampling
    * signal. Integer sums end in ONE correctly-rounded division.
    *
    * Scale shape: text never shuffles — bigrams ride as 3-hex-char
    * bucket ids; both models aggregate to ≤4096 rows and broadcast;
    * the doc side is two hash-aggregates ((doc_id, bucket) then
    * doc_id). Zero-bigram (single-token) documents drop, matching
    * [[targetAffinity]]. */
  def dsirWeights(docs: DataFrame, target: DataFrame): DataFrame = {
    val bigramsOf = expr(
      "transform(slice(__l, 1, size(__l) - 1), " +
        "(x, i) -> concat(x, chr(31), element_at(__l, i + 2)))")
    def buckets(d: DataFrame): DataFrame =
      d.select(col("doc_id"), split(col("text"), " ").as("__l"))
        .select(col("doc_id"), explode(bigramsOf).as("bg"))
        .select(col("doc_id"), substring(md5(col("bg")), 1, 3).as("b"))
    val docC = buckets(docs).groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
    val tgtC = buckets(target).groupBy("b").agg(count(lit(1)).as("t"))
    val bgC = buckets(docs).groupBy("b").agg(count(lit(1)).as("q"))
    docC
      .join(broadcast(tgtC), Seq("b"), "left_outer")
      .join(broadcast(bgC), Seq("b"))       // background covers every doc bucket
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_bigrams"),
        sum(col("c") * (coalesce(col("t"), lit(0L)) + 1L)).as("w_num"),
        sum(col("c") * (col("q") + 1L)).as("w_den"))
      .select(col("doc_id"), col("n_bigrams"), col("w_num"), col("w_den"),
        (col("w_num").cast("double") / col("w_den").cast("double")).as("weight"))
  }

  /** Corpus-drift monitor: total-variation distance between two
    * corpora's hashed-bigram distributions — the between-crawl /
    * between-snapshot distribution-shift alarm a continuously-ingesting
    * training pipeline watches. Bigrams hash into the same fixed
    * 4096-bucket space as [[dsirWeights]] (first 3 md5 hex chars), so
    * both "models" are ≤4096-row count tables at ANY corpus size.
    * TV(P,Q) = ½·Σ_b |p_b − q_b| is computed exactly in integers:
    * `tv_num = Σ_b |c1_b·N2 − c2_b·N1|`, `tv = tv_num / (2·N1·N2)` —
    * one correctly-rounded division at the end (cross-engine exact).
    * TV ∈ [0,1]; 0 = identical distributions, 1 = disjoint support.
    *
    * Scale shape: text never shuffles (bigrams ride as 3-hex bucket
    * ids); two ≤4096-row aggregates, a full outer join on the bucket
    * id, a broadcast 1-row totals join. At ≳10¹² bigrams per corpus
    * route the |c1·N2 − c2·N1| products through DECIMAL(38,0) (the
    * int64 headroom runs out near N ≈ 3·10⁹ per side); the shape is
    * unchanged. */
  def corpusDrift(docs: DataFrame, other: DataFrame): DataFrame = {
    val bigramsOf = expr(
      "transform(slice(__l, 1, size(__l) - 1), " +
        "(x, i) -> concat(x, chr(31), element_at(__l, i + 2)))")
    def buckets(d: DataFrame): DataFrame =
      d.select(split(col("text"), " ").as("__l"))
        .select(explode(bigramsOf).as("bg"))
        .select(substring(md5(col("bg")), 1, 3).as("b"))
    val c1 = buckets(docs).groupBy("b").agg(count(lit(1)).as("c1"))
    val c2 = buckets(other).groupBy("b").agg(count(lit(1)).as("c2"))
    // the joined model table is ≤4096 rows by construction — finish on
    // the driver (the bounded-gate idiom) so each corpus is scanned
    // exactly ONCE; referencing the lazy join from both the totals and
    // the TV aggregate would re-run both bigram extractions
    val rows = c1.join(c2, Seq("b"), "full_outer")
      .select(coalesce(col("c1"), lit(0L)).as("c1"),
        coalesce(col("c2"), lit(0L)).as("c2"))
      .collect()
    val n1 = rows.map(_.getLong(0)).sum
    val n2 = rows.map(_.getLong(1)).sum
    val tvNum = rows.map(r => math.abs(r.getLong(0) * n2 - r.getLong(1) * n1)).sum
    val spark = docs.sparkSession
    import spark.implicits._
    // denominator as ONE exact long product then one cast — the
    // oracle's CAST(2*n1*n2 AS DOUBLE) rounding, not 2.0*n1*n2's
    Seq((rows.length.toLong, n1, n2, tvNum,
      tvNum.toDouble / (2L * n1 * n2).toDouble))
      .toDF("n_buckets", "n1", "n2", "tv_num", "tv")
  }

  /** Per-document n-gram novelty — the memorization-risk profile of
    * Lee et al. 2022: for each document, how many of its sliding
    * `k`-token windows (with multiplicity) also occur in ≥ `minDocs`
    * DISTINCT documents, and the complementary novelty fraction.
    * [[substrDedup]] REMOVES shared spans; this SCORES documents by
    * shared mass, the signal used to down-weight near-boilerplate and
    * to audit eval-memorization exposure before training.
    *
    * Scale shape: identical to the [[substrDedup]] census — one
    * shuffle of 16-byte window keys (2× seeded xxhash64; text never
    * rides the exchange), distinct-doc counting via same-partitioning
    * sort windows (streams skewed boilerplate keys without building
    * lists), then a per-doc hash aggregate. Documents shorter than
    * `k` tokens carry no windows and surface with NULL novelty via
    * the outer join. */
  /** Sliding k-token windows as 16-byte hash-pair rows, WITH
    * multiplicity: (doc_id, h1, h2). The census/probe currency of
    * [[novelty]] and the incremental census family. */
  private def windowRows(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"), toks.as("__w"))
      .filter(size(col("__w")) >= k)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(__w) - $k), " +
          s"i -> concat_ws(' ', slice(__w, i + 1, $k)))")).as("g"))
      .select(col("doc_id"),
        xxhash64(col("g")).as("h1"), xxhash64(lit(1), col("g")).as("h2"))

  def novelty(docs: DataFrame, k: Int = 8, minDocs: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = windowRows(docs, k)
    val w1 = Window.partitionBy("h1", "h2").orderBy("doc_id")
    val w2 = Window.partitionBy("h1", "h2")
    val scored = grams
      .withColumn("__dr", dense_rank().over(w1))
      .withColumn("__nd", max(col("__dr")).over(w2))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("__nd") >= minDocs, 1L).otherwise(0L)).as("n_shared"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        // NULL (not NaN) for sub-k docs: the division only runs where
        // the join matched, mirroring the oracle's NULL propagation
        when(col("n_windows").isNotNull,
          (col("n_windows") - col("n_shared")).cast("double") /
            col("n_windows").cast("double")).as("novelty"))
  }

  /** Persistent sliding-window census — the INCREMENTAL form of
    * [[novelty]]'s duplicate evidence, for the production workflow
    * where crawl batches arrive over time and each must be scored
    * against everything already seen (the [[Dedup.buildBandIndex]]
    * contract, at window granularity): (h1, h2, n_docs) with
    * distinct-doc counts per window content. Counts from DISJOINT
    * batches sum, which is what makes [[appendWindowCensus]] exact. */
  def buildWindowCensus(docs: DataFrame, k: Int = 8): DataFrame =
    windowRows(docs, k).groupBy("h1", "h2")
      .agg(count_distinct(col("doc_id")).as("n_docs"))

  /** Fold one new (doc-disjoint) batch into the census — O(batch)
    * new rows against a key-partitioned union-aggregate. At scale,
    * persist the census bucketed on (h1, h2) so the re-aggregate
    * co-locates with zero full re-shuffle of history. */
  def appendWindowCensus(census: DataFrame, batch: DataFrame, k: Int = 8): DataFrame =
    census.unionByName(buildWindowCensus(batch, k))
      .groupBy("h1", "h2").agg(sum(col("n_docs")).as("n_docs"))

  /** Score ONE batch against the accumulated census (which must
    * already include the batch — append first, then score): the
    * incremental [[novelty]]. Per-batch cost is O(batch windows)
    * probed as an equi-join into the census; history never rescans.
    * Contract (same as incremental dedup): a batch's scores equal
    * the one-shot [[novelty]] over all data restricted to the
    * batch's documents — EARLIER batches are not retroactively
    * rescored when later content duplicates them. */
  def noveltyAgainst(batch: DataFrame, census: DataFrame,
                     k: Int = 8, minDocs: Int = 2): DataFrame = {
    val scored = windowRows(batch, k)
      .join(census, Seq("h1", "h2"), "left_outer")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(coalesce(col("n_docs"), lit(0L)) >= minDocs, 1L)
          .otherwise(0L)).as("n_shared"))
    batch.select(col("doc_id")).join(scored, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        when(col("n_windows").isNotNull,
          (col("n_windows") - col("n_shared")).cast("double") /
            col("n_windows").cast("double")).as("novelty"))
  }

  /** Broadcast blocklist screen — the C4-style badword filter: exact
    * token-level occurrence counts against a configured term list,
    * plus the keep verdict (`n_hits <= maxHits`). Emits flags for
    * EVERY document (the filter itself is the caller's one-line
    * `.filter(col("kept"))`) so the rejection rate is auditable — the
    * form every production cleaning pass wants.
    *
    * Scale shape: per-row codegen'd higher-order functions over the
    * split-once token array; zero shuffle, scan speed, O(|terms|) per
    * token. For blocklists too large for a literal array (≫10³
    * terms), switch to an exploded-token broadcast semi-join — same
    * counts, one narrow shuffle of (doc_id, token) pairs; substring
    * (non-token) blocklists want an Aho–Corasick pass instead, which
    * this operator deliberately does not claim. */
  def blocklistFilter(docs: DataFrame, terms: Seq[String],
                      maxHits: Long = 0L): DataFrame = {
    val tlist = array(terms.map(lit): _*)
    docs.select(col("doc_id"),
      size(toks).cast("bigint").as("n_tokens"),
      size(filter(toks, t => array_contains(tlist, t))).cast("bigint")
        .as("n_hits"),
      size(array_intersect(array_distinct(toks), tlist)).cast("bigint")
        .as("n_terms_hit"))
      .withColumn("kept", col("n_hits") <= maxHits)
  }

  /** Generation-loop / periodicity detector — the degenerate-output
    * filter for synthetic or model-written text: the smallest token
    * period `p` such that token[i] == token[i+p] for every aligned
    * position (the KMP border theorem: p = L − fail(L), O(L) per
    * document), the number of full repeats ⌊L/p⌋, and the loop flag
    * (≥ `minRepeats` full cycles of a proper period). Catches "the
    * same sentence over and over" exactly — a PERIOD, which the
    * Gopher-style duplicate-n-gram fractions ([[repetition]]) only
    * approximate from unordered n-gram mass.
    *
    * Scale shape: one narrow `mapPartitions` pass (KMP has no
    * Catalyst primitive — the documented justification bar), integer
    * outputs, zero shuffle; text never leaves its partition. */
  /** Smallest period of a token sequence via the KMP border theorem:
    * p = n − fail(n), O(n). Exposed for the property spec's
    * brute-force cross-check. */
  private[operators] def smallestPeriod(w: Array[String]): Int = {
    val n = w.length
    val fail = new Array[Int](n + 1)
    var k = 0
    var i = 1
    while (i < n) {
      while (k > 0 && w(i) != w(k)) k = fail(k)
      if (w(i) == w(k)) k += 1
      i += 1
      fail(i) = k
    }
    n - fail(n)
  }

  def periodicity(docs: DataFrame, minRepeats: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val w: Array[String] = text.split(" ", -1)
          val n = w.length
          val period = smallestPeriod(w)
          val repeats = if (period == 0) 0L else (n / period).toLong
          (id, n.toLong, period.toLong, repeats,
            period < n && repeats >= minRepeats)
        }
      }.toDF("doc_id", "n_tokens", "period", "n_repeats", "is_loop")
  }

  def prepareCorpus(docs: DataFrame, evalDocs: DataFrame,
                    minQuality: Double = 0.42, jaccard: Double = 0.5,
                    tokensPerLang: Long = 2000L): DataFrame = {
    val q = quality(docs).select(col("doc_id"), col("quality_score"))
    val canon = Dedup.dedupPipeline(docs, threshold = jaccard)
      .select(col("doc_id"), col("is_dup"))
    val contaminated = decontaminate(docs, evalDocs).select(col("doc_id"))
    val keptIds = q.join(canon, "doc_id")
      .join(contaminated, Seq("doc_id"), "left_anti")
      .filter(col("quality_score") >= minQuality && !col("is_dup"))
      .select("doc_id")
    budgetMix(docs.join(keptIds, "doc_id"), tokensPerLang)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-shape statistics over the documents table — the vocabulary
  * and readability profile a training-data pipeline reports next to
  * its quality gates. Tokenization is the corpus convention the other
  * text operators use (whitespace split, empty tokens included
  * symmetrically on both engines); every statistic is exact-integer
  * (counts / ppm / centi-units) with DECIMAL(38,0) wide products. */
object TextShape {

  /** Hapax-legomena profile per language: vocabulary size, the terms
    * appearing exactly once, and the exact ppm hapax share of the
    * vocabulary — the heavy-tail health check (a scraped corpus with a
    * collapsing hapax share is usually template spam). One explode +
    * two map-side-combined groupBys. */
  def hapaxRate(documents: DataFrame): DataFrame = {
    val tf = documents
      .select(col("lang"), explode(split(col("text"), " ")).as("term"))
      .groupBy("lang", "term").agg(count(lit(1)).as("n"))
    tf.groupBy("lang")
      .agg(count(lit(1)).cast("bigint").as("n_terms"),
        sum(expr("CASE WHEN n = 1 THEN 1 ELSE 0 END"))
          .cast("bigint").as("n_hapax"),
        sum(col("n")).cast("bigint").as("n_tokens"))
      .withColumn("hapax_ppm",
        expr("(n_hapax * 1000000L) div n_terms").cast("bigint"))
      .orderBy("lang")
  }

  /** Term burstiness (variance-to-mean ratio over PER-DOCUMENT counts,
    * zeros included): vmr = (D·Σc² − n²) / ((D−1)·n) with D = corpus
    * size, n = the term's total count, Σc² over the docs it appears
    * in — reported in exact ppm via DECIMAL(38,0). High-count LOW-vmr
    * terms are function words; high-vmr ones are topical — the
    * feature behind content-word keyword extraction. Top terms by
    * count, tie-broken. */
  def burstiness(documents: DataFrame, minCount: Long = 50,
                 topK: Int = 20): DataFrame = {
    val docsTotal = documents.agg(count(lit(1)).as("__d"))
    val per = documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("c"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum(col("c")).as("n"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("sc2"))
      .filter(col("n") >= minCount)
    per.crossJoin(broadcast(docsTotal))
      .select(col("term"), col("n").cast("bigint").as("n"),
        col("df").cast("bigint").as("df"),
        expr("""CAST((CAST(__d AS DECIMAL(38,0)) * sc2
               - CAST(n AS DECIMAL(38,0)) * n) * 1000000
               div ((CAST(__d AS DECIMAL(38,0)) - 1) * n) AS BIGINT)""")
          .as("vmr_ppm"))
      .orderBy(col("n").desc, col("term")).limit(topK)
  }

  /** LIX readability per language on corpus totals: words/sentence
    * plus the long-word (≥7 chars) percentage, both as exact integer
    * centi-units — the deterministic integer rendering of the classic
    * index (sentences counted as periods; a zero-sentence corpus
    * clamps the divisor). */
  def lixReadability(documents: DataFrame): DataFrame = {
    documents
      .select(col("lang"),
        expr("size(split(text, ' '))").as("words"),
        expr("length(text) - length(replace(text, '.', ''))").as("periods"),
        expr("size(filter(split(text, ' '), w -> length(w) >= 7))")
          .as("long_words"))
      .groupBy("lang")
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum(col("words")).cast("bigint").as("words"),
        sum(col("periods")).cast("bigint").as("sentences"),
        sum(col("long_words")).cast("bigint").as("long_words"))
      .withColumn("lix_centi", expr(
        """(words * 100L) div (CASE WHEN sentences = 0 THEN 1
           ELSE sentences END)
           + (long_words * 10000L) div words""").cast("bigint"))
      .orderBy("lang")
  }
}

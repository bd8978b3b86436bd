package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-contract validation — the engine-side analog of the
  * reference's DDL constraints (reference
  * `postgres-source/init-scripts/01-init.sql:41-51`: PRIMARY KEY,
  * FOREIGN KEY, UNIQUE, CHECK (status IN …), NOT NULL), which a
  * lakehouse ingest enforces as checks rather than storage-level
  * constraints (SURVEY §1.1). One row per rule: (rule, n_violations) —
  * 0 everywhere means the contract holds.
  *
  * Scale shape: all row-level rules evaluate in ONE scan as k
  * conditional sums (partial-aggregated map-side — adding a rule adds
  * a counter, not a pass); uniqueness is a count-vs-distinct aggregate
  * on the key columns only; referential rules are anti-joins keyed on
  * the FK (the parent side broadcast when dimension-sized). Nothing
  * shuffles full rows.
  */
object Validate {

  /** Row-level rules, each a VIOLATION predicate (true = bad row),
    * evaluated in a single scan. Rule names are emitted as typed
    * literals and counters carry positional internal aliases — no
    * caller-supplied string ever lands inside parsed SQL text (a name
    * containing a quote/backtick would have broken the earlier
    * stack(...) interpolation at runtime). */
  def rowRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "rowRules: at least one rule is required")
    val sums = rules.zipWithIndex.map { case ((_, c), i) =>
      sum(when(c, 1L).otherwise(0L)).as(s"__c$i")
    }
    df.agg(sums.head, sums.tail: _*)
      .select(explode(array(rules.zipWithIndex.map { case ((name, _), i) =>
        struct(lit(name).as("rule"),
          coalesce(col(s"__c$i"), lit(0L)).as("n_violations"))
      }: _*)).as("x"))
      .select(col("x.rule"), col("x.n_violations"))
  }

  /** PK/UNIQUE rule: violations = rows beyond the first per key. */
  def uniqueRule(name: String, df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.agg((count(lit(1)) -
        count_distinct(struct(keyCols.map(col): _*))).as("n_violations"))
      .select(lit(name).as("rule"), col("n_violations").cast("bigint"))

  /** FK rule: child rows whose key has no parent (anti-join; NULL keys
    * count as violations, matching NOT EXISTS semantics). */
  def fkRule(name: String, child: DataFrame, childCol: String,
             parent: DataFrame, parentCol: String): DataFrame =
    child.select(col(childCol))
      .join(parent.select(col(parentCol)),
        col(childCol) === col(parentCol), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("rule"), col("n_violations").cast("bigint"))

  /** A full contract: union of rule results, one row each. */
  def contract(parts: DataFrame*): DataFrame = parts.reduce(_ unionByName _)

  /** Embedding-table contract — the preconditions the ANN/dedup family
    * rests on, checked the same one-scan way: uniform dimensionality,
    * unit L2 norm (within fp tolerance; dot = cosine requires it), no
    * null/NaN components, unique ids. The norm check is the same
    * sequential fold as the scoring path, so it certifies exactly what
    * the operators compute with. */
  def embeddingContract(embeddings: DataFrame, dims: Int = 64,
                        normTol: Double = 1e-3): DataFrame = {
    val v = col("embedding").cast("array<double>")
    val normSq = aggregate(v, lit(0.0), (acc, x) => acc + x * x)
    contract(
      rowRules(embeddings, Seq(
        "dims_uniform" -> (size(v) =!= dims),
        "components_finite" -> (v.isNull ||
          exists(v, x => x.isNull || x.isNaN)),
        "unit_norm" -> (abs(sqrt(normSq) - 1.0) > normTol))),
      uniqueRule("id_unique", embeddings, Seq("vec_id")))
  }

  /** The reference ticket contract over the testdata mapping
    * (lineitem→tickets, part→movies): NOT NULL purchased_at,
    * non-negative cost, the status CHECK domain, composite-PK
    * uniqueness, and the movie FK — `01-init.sql:41-51` re-expressed
    * as checks. */
  def ticketContract(lineitem: DataFrame, part: DataFrame): DataFrame =
    contract(
      rowRules(lineitem, Seq(
        "purchased_at_not_null" -> col("l_shipdate").isNull,
        "cost_non_negative" -> (col("l_extendedprice") < 0),
        "status_domain" -> !col("l_returnflag").isin("A", "N", "R"))),
      uniqueRule("pk_unique", lineitem, Seq("l_orderkey", "l_linenumber")),
      fkRule("fk_movie", lineitem, "l_partkey", part, "p_partkey"))

  /** Dataset reproducibility manifest: per source, the identity a
    * pipeline freezes next to a training run — doc/char totals, id
    * range, and an ORDER-FREE content checksum (XOR of each document's
    * 60-bit md5 prefix: associative+commutative, so reshuffles,
    * repartitions, and re-reads cannot change it, and one flipped
    * document flips it with probability 1−2⁻⁶⁰). Re-run the manifest
    * against a copy to prove bit-identity without comparing bodies —
    * the cheap answer to "is this the same dataset we trained on?".
    * One scan, one narrow aggregate per source. */
  def manifest(docs: DataFrame): DataFrame =
    docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"),
        expr("bit_xor(CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT))")
          .as("content_checksum"))
      .orderBy("source")

  /** Squared-norm histogram of the embedding column per label — the
    * embedding-health profile (un-normalized vectors, collapsed or
    * exploded norms) a retrieval pipeline checks before indexing. The
    * norm² is a DETERMINISTIC LEFT FOLD over the array
    * (`aggregate(embedding, 0, (acc, x) -> acc + x²)` — array order is
    * data, unlike row order, so the double chain is fixed and both
    * engines evaluate it identically), bucketed to exact centi-units.
    * One narrow scan, one partial+final aggregate. */
  def embeddingNormHistogram(embeddings: DataFrame): DataFrame =
    embeddings.select(col("label"),
        expr("""CAST(floor(aggregate(embedding, CAST(0.0 AS DOUBLE),
                (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) * 100)
                AS BIGINT)""").as("norm2_centi"))
      .groupBy("label", "norm2_centi")
      .agg(count(lit(1)).cast("bigint").as("n_vectors"))
      .orderBy("label", "norm2_centi")

  /** Per-DIMENSION profile of the embedding column — the dead/
    * collapsed-dimension screen (a dimension whose values never move
    * carries no information; one stuck at a constant bias skews
    * cosine). Values land in exact integer micro-units (floor), so
    * the per-dimension sums/extremes are order-insensitive integers.
    * Scale shape: posexplode to (dim, micro) then ONE partial+final
    * aggregate keyed on the bounded dimension axis. */
  def embeddingDimProfile(embeddings: DataFrame): DataFrame =
    embeddings
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("dim").cast("bigint").as("dim"),
        expr("CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT)").as("micro"))
      .groupBy("dim")
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum("micro").cast("bigint").as("sum_micro"),
        min("micro").cast("bigint").as("min_micro"),
        max("micro").cast("bigint").as("max_micro"))
      .orderBy("dim")
}

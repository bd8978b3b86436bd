package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic contiguous global-id assignment — the "give every
  * document a stable 0..N-1 id" step a training-data pipeline needs
  * before sharding, packing, or split bookkeeping (the reference keys
  * everything on generator-assigned serial PKs, `gen_data.py:60-75`;
  * at corpus scale ids must be DERIVED from content order instead).
  *
  * The naive form — `row_number() OVER (ORDER BY key)` with no
  * partition clause — funnels every row through ONE window reducer: a
  * non-starter at 100 TB. The scale path here is the classic two-phase
  * rank: range-repartition on the key (Spark's range exchange samples
  * boundaries, so partitions hold disjoint ordered key ranges), take a
  * per-partition `row_number` (each window group IS one bounded
  * partition — ~N/parts rows, never N), then add per-partition prefix
  * offsets computed from a parts-row count table (driver-side,
  * `parts` entries). Output ids equal the global-sort rank exactly,
  * independent of where the sampled range boundaries fall, PROVIDED
  * the sort key is a total order (callers pass a unique tie-break —
  * here md5(id)||id, the engine's standard deterministic shuffle
  * key). No single-reducer stage anywhere.
  */
object Ids {

  /** Assign contiguous ids 0..N-1 in ascending `keys` order (keys must
    * be a total order — include a unique tie-break column). Two-phase:
    * range exchange → per-partition row_number → +prefix offset. */
  def assignIds(df: DataFrame, keys: Seq[Column], idCol: String,
                parts: Int = 32): DataFrame = {
    val ranged = df.repartitionByRange(parts, keys: _*)
      .withColumn("_pid", spark_partition_id())
    // Window partitioned on _pid: the exchange hashes ~parts groups of
    // ~N/parts rows each — bounded per-reducer state, unlike the
    // empty-partition global window.
    val w = Window.partitionBy(col("_pid")).orderBy(keys: _*)
    // materialize ONCE before the offsets collect: re-executing the
    // lineage RESAMPLES the range boundaries (seeds derive from fresh
    // RDD ids per job), and offsets from one sampling joined to ranks
    // from another mis-rank or drop rows — observed on the grouped
    // variant at 15k rows before this checkpoint
    val local = ranged.withColumn("_local", row_number().over(w) - lit(1))
      .localCheckpoint()
    // Prefix offsets: `parts` rows through the driver — O(parts),
    // corpus-size-independent.
    val counts = local.groupBy(col("_pid")).agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, n)) =>
      (pid, acc + n)
    }.tail.zip(counts).map { case ((pid, end), (_, n)) => (pid, end - n) }
    val offsetDf = df.sparkSession.createDataFrame(offsets.toSeq)
      .toDF("_pid", "_offset")
    local.join(broadcast(offsetDf), "_pid")
      .withColumn(idCol, col("_offset") + col("_local"))
      .drop("_pid", "_local", "_offset")
  }

  /** Reference form: the single-reducer global window. Equality with
    * [[assignIds]] is spec-pinned; exists for the spec and for small
    * inputs, never the wired scale path. */
  def assignIdsGlobalWindow(df: DataFrame, keys: Seq[Column],
                            idCol: String): DataFrame =
    df.withColumn(idCol,
      row_number().over(Window.orderBy(keys: _*)) - lit(1))

  /** Exact inclusive prefix sums of `sumCols` in global `keys` order —
    * [[assignIds]]'s two-phase discipline generalized from counting to
    * summing: range exchange on the keys, a per-partition running-sum
    * window (bounded state — each window group is one ~N/parts
    * partition, never the corpus), then per-partition TOTAL offsets
    * (O(parts) rows through the driver) added back. Output equals the
    * single-reducer `SUM() OVER (ORDER BY keys ROWS UNBOUNDED
    * PRECEDING .. CURRENT ROW)` exactly (spec-pinned), independent of
    * where the sampled range boundaries fall; `keys` must be a total
    * order. This is the distributed ECDF/cumulative-distribution
    * primitive — anything shaped "running total over a sorted axis"
    * (CDF counts, cumulative revenue, Lorenz curves, KS statistics)
    * rides it instead of a global window. */
  def prefixSums(df: DataFrame, keys: Seq[Column],
                 sumCols: Seq[String], parts: Int = 32): DataFrame = {
    val ranged = df.repartitionByRange(parts, keys: _*)
      .withColumn("_pid", spark_partition_id())
    val w = Window.partitionBy(col("_pid")).orderBy(keys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // materialize before the offsets collect — re-executed lineage
    // RESAMPLES range boundaries (see assignIds) and the offsets
    // would then disagree with the local sums
    val local = sumCols.foldLeft(ranged) { (d, c) =>
      d.withColumn(s"_run_$c", sum(col(c)).over(w))
    }.localCheckpoint()
    val totals = local.groupBy(col("_pid"))
      .agg(sum(col(sumCols.head)).as(s"_t_${sumCols.head}"),
        sumCols.tail.map(c => sum(col(c)).as(s"_t_$c")): _*)
    val totalRows = totals.collect().sortBy(_.getInt(0))
    // key each offset row by the OBSERVED pid (an empty non-trailing
    // range partition yields no totals row — chaining pid = prev + 1
    // would mislabel every later partition and the inner join on _pid
    // would silently drop their rows); each pid pairs with the
    // cumulative sum of strictly-earlier pids' totals
    val offsets = totalRows.zip(
      totalRows.scanLeft(sumCols.map(_ => 0L)) { (acc, row) =>
        acc.zipWithIndex.map { case (a, i) => a + row.getLong(i + 1) }
      }.init
    ).map { case (row, accs) => Seq(row.getInt(0)) ++ accs }
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
    val offsetDf = df.sparkSession.createDataFrame(
      java.util.Arrays.asList(offsets.map(s => Row.fromSeq(s)): _*),
      StructType(StructField("_pid", IntegerType) +:
        sumCols.map(c => StructField(s"_off_$c", LongType))))
    val joined = local.join(broadcast(offsetDf), "_pid")
    sumCols.foldLeft(joined) { (d, c) =>
      d.withColumn(s"cum_$c", col(s"_off_$c") + col(s"_run_$c"))
        .drop(s"_run_$c", s"_off_$c")
    }.drop("_pid")
  }

  /** Balanced shard assignment — split the corpus into `nShards`
    * output shards with near-equal token mass (the training-data
    * "write N balanced files" step; naive hash sharding leaves the
    * token totals as skewed as the document-length distribution).
    * Striped longest-first: rank docs by token count descending (the
    * two-phase [[assignIds]] rank — no single-reducer window), shard =
    * rank mod nShards. Each stripe hands every shard one doc in
    * size order, so any two shard totals differ by at most one
    * maximal document (spec-pinned) — LPT-grade balance from one rank
    * pass, no driver-side bin state. */
  def balancedShards(documents: DataFrame, nShards: Int = 8): DataFrame = {
    val sized = documents.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_toks"))
    assignIds(sized, Seq(col("n_toks").desc, col("doc_id")), "rank")
      .withColumn("shard", pmod(col("rank"), lit(nShards.toLong)))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("total_tokens"))
  }

  /** Exact NTILE without the single-reducer sort: SQL `NTILE(k)` is a
    * pure function of the global rank — the first `N mod k` buckets
    * take `⌈N/k⌉` rows, the rest `⌊N/k⌋` — so the two-phase
    * [[assignIds]] rank plus one integer-arithmetic bucket formula
    * reproduces the window function's output EXACTLY (equality
    * spec-pinned against the window form), with the range exchange as
    * the only data movement. This is the scale path for the
    * equal-depth scoring family (RFM, concentration deciles): at 10⁹
    * customers the window form sorts them on one task, this form
    * never does.
    *
    * `keys` must be a total order (include a unique tie-break). */
  def ntileRank(df: DataFrame, keys: Seq[Column], k: Int,
                outCol: String): DataFrame = {
    require(k > 0, "ntile needs at least one bucket")
    val ranked = assignIds(df, keys, "__rank")
    val n = ranked.agg(count(lit(1)).as("__n"))
    ranked.crossJoin(broadcast(n))
      .withColumn(outCol, expr(
        s"""CASE WHEN __rank < (__n % $k) * (__n div $k + 1)
           |THEN __rank div (__n div $k + 1) + 1
           |ELSE (__n % $k) + (__rank - (__n % $k) * (__n div $k + 1))
           |     div (__n div $k) + 1 END""".stripMargin).cast("int"))
      .drop("__rank", "__n")
  }

  /** Per-GROUP exact inclusive prefix sums — [[prefixSums]] composed
    * with [[ntileRankGrouped]]'s slice discipline: range exchange on
    * (groups ++ keys) keeps each group's rows in key order across
    * partitions, running sums compute within (group, partition)
    * slices (bounded reducer state even when ONE group spans many
    * partitions — the partitioned-window form instead funnels every
    * row of a group through one task), and per-slice totals —
    * O(groups·parts) rows through the driver — become per-group
    * prefix offsets. Output equals the per-group window form exactly
    * (spec-pinned), independent of sampled range boundaries. */
  /** Broadcast equi-join on `keyCols` with NULL-SAFE equality (`<=>`)
    * — the grouped offset joins must keep rows whose group column is
    * NULL (the window/DuckDB forms treat NULL as a regular partition
    * value; plain `===` would silently drop them). */
  private def nullSafeOffsetJoin(left: DataFrame, right: DataFrame,
                                 keyCols: Seq[String]): DataFrame = {
    val rx = keyCols.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"__r_$c"))
    val cond = keyCols.map(c => col(c) <=> col(s"__r_$c")).reduce(_ && _)
    left.join(broadcast(rx), cond).drop(keyCols.map(c => s"__r_$c"): _*)
  }

  def prefixSumsGrouped(df: DataFrame, groups: Seq[String], keys: Seq[Column],
                        sumCols: Seq[String], parts: Int = 32): DataFrame = {
    val gcols = groups.map(col)
    val ranged = df.repartitionByRange(parts, (gcols ++ keys): _*)
      .withColumn("_pid", spark_partition_id())
    val w = Window.partitionBy((col("_pid") +: gcols): _*).orderBy(keys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sumCols.foldLeft(ranged) { (d, c) =>
      d.withColumn(s"_run_$c", sum(col(c)).over(w))
    }.localCheckpoint()
    val totals = local.groupBy((col("_pid") +: gcols): _*)
      .agg(sum(col(sumCols.head)).as(s"_t_${sumCols.head}"),
        sumCols.tail.map(c => sum(col(c)).as(s"_t_$c")): _*).collect()
    val byGroup = totals.groupBy(r => groups.map(r.getAs[Any]).toSeq)
    val offsetRows = byGroup.toSeq.flatMap { case (g, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("_pid"))
      sorted.scanLeft(sumCols.map(_ => 0L)) { (acc, r) =>
        acc.zipWithIndex.map { case (a, i) =>
          a + r.getLong(1 + groups.size + i) }
      }.init.zip(sorted).map { case (offs, r) =>
        org.apache.spark.sql.Row.fromSeq(
          (r.getAs[Int]("_pid") +: g) ++ offs)
      }
    }
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
    val schema = StructType(
      StructField("_pid", IntegerType) +: groups.map(g => df.schema(g)) ++:
        sumCols.map(c => StructField(s"_off_$c", LongType)))
    val offsetDf = df.sparkSession.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(offsetRows).asJava, schema)
    val joined = nullSafeOffsetJoin(local, offsetDf, "_pid" +: groups)
    sumCols.foldLeft(joined) { (d, c) =>
      d.withColumn(s"cum_$c", col(s"_off_$c") + col(s"_run_$c"))
        .drop(s"_run_$c", s"_off_$c")
    }.drop("_pid")
  }

  /** Per-GROUP exact NTILE without a per-group single-task sort — the
    * grouped twin of [[ntileRank]]: range-exchange on
    * (group ++ keys) keeps each group's rows in range order across
    * partitions, per-partition `row_number` runs within
    * (group, partition) slices (bounded reducer state even for a
    * group that spans many partitions — the partitioned-window form
    * instead sorts EVERY row of a group on one task), and the
    * per-(group, partition) prefix offsets plus per-group totals —
    * O(groups·partitions) rows through the driver — feed the same
    * integer NTILE formula. Window-form equality is spec-pinned. */
  def ntileRankGrouped(df: DataFrame, groups: Seq[String],
                       keys: Seq[Column], k: Int, outCol: String,
                       parts: Int = 32): DataFrame = {
    require(k > 0, "ntile needs at least one bucket")
    val gcols = groups.map(col)
    val ranged = df.repartitionByRange(parts, (gcols ++ keys): _*)
      .withColumn("_pid", spark_partition_id())
    val w = Window.partitionBy((col("_pid") +: gcols): _*).orderBy(keys: _*)
    // materialize ONCE: the offsets collect and the final join must
    // see the SAME range boundaries — re-executing the lineage would
    // resample them, and offsets from one sampling joined to ranks
    // from another drop rows / skew buckets
    val local = ranged.withColumn("_local", row_number().over(w) - lit(1))
      .localCheckpoint()
    // O(groups·parts) rows: per-slice counts → per-group running
    // prefix offsets and totals, joined back via broadcast
    val counts = local.groupBy((col("_pid") +: gcols): _*)
      .agg(count(lit(1)).as("_n")).collect()
    val byGroup = counts.groupBy(r => groups.map(r.getAs[Any]).toSeq)
    val offsetRows = byGroup.toSeq.flatMap { case (g, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("_pid"))
      val total = sorted.map(_.getAs[Long]("_n")).sum
      sorted.scanLeft(0L)(_ + _.getAs[Long]("_n")).zip(sorted).map {
        case (off, r) => org.apache.spark.sql.Row.fromSeq(
          (r.getAs[Int]("_pid") +: g) ++ Seq(off, total))
      }
    }
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("_pid",
        org.apache.spark.sql.types.IntegerType) +:
        groups.map(g => df.schema(g)) :+
        org.apache.spark.sql.types.StructField("_offset",
          org.apache.spark.sql.types.LongType) :+
        org.apache.spark.sql.types.StructField("_gn",
          org.apache.spark.sql.types.LongType))
    val offsetDf = df.sparkSession.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(offsetRows).asJava, schema)
    nullSafeOffsetJoin(local, offsetDf, "_pid" +: groups)
      .withColumn("__rank", col("_offset") + col("_local"))
      .withColumn(outCol, expr(
        s"""CASE WHEN __rank < (_gn % $k) * (_gn div $k + 1)
           |THEN __rank div (_gn div $k + 1) + 1
           |ELSE (_gn % $k) + (__rank - (_gn % $k) * (_gn div $k + 1))
           |     div (_gn div $k) + 1 END""".stripMargin).cast("int"))
      .drop("_pid", "_local", "_offset", "_gn", "__rank")
  }

  /** Driver query: stable corpus ids for `documents`, ordered by the
    * engine's standard deterministic pseudo-random key md5(doc_id)
    * with doc_id as unique tie-break — i.e. a reshuffle-proof random
    * permutation id, the shard-assignment precursor. */
  def documentIds(documents: DataFrame): DataFrame =
    assignIds(documents,
        Seq(md5(col("doc_id").cast("string")), col("doc_id")),
        "assigned_id")
      .select(col("doc_id"), col("assigned_id"))
}

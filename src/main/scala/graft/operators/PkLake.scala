package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Driver-facing lifecycles for PRIMARY-KEY lake tables
  * ([[graft.catalog.PkTables]] — the reference's staging tables are
  * PK tables with `'bucket.num'='4'`, `flink-cdc/sql/tickets-cdc.sql:
  * 23-37`, sunk to Paimon as `'merge-engine'='deduplicate'`,
  * `flink-gen.sh:118-142`). Each returns a census a DuckDB oracle
  * re-derives from the RAW parquet with pure CASE/filter algebra, so
  * the whole upsert → blind delete → predicate delete → revive →
  * compact story is hash-verified end-to-end. */
object PkLake {

  /** PK-table lifecycle census: blind-append upserts across three
    * commits (later commit wins per key), a BLIND full-key equality
    * delete (zero rows read), a PREDICATE delete evaluated over the
    * RESOLVED rows (delta plan → equality-delete files), a REVIVING
    * re-insert (later sequence beats the delete), then a KEY-AWARE
    * `CALL compact` — the census per status hashes identically before
    * and after the compact (content-neutral materialization). */
  def pkTableCensus(orders: DataFrame, workDir: String): DataFrame = {
    val spark = orders.sparkSession
    val cat = "glakepk"
    PartitionedWorkDirs.reset(workDir)
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftLakeCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.path", workDir)
    spark.sql(
      s"""CREATE TABLE $cat.m.orders_pk (
         |  k BIGINT NOT NULL, status STRING, cents BIGINT, pr STRING)
         |PARTITIONED BY (bucket(4, k))
         |TBLPROPERTIES ('versioned'='true', 'primary-key'='k',
         |  'merge-engine'='deduplicate')""".stripMargin)
    val base = orders.select(
      col("o_orderkey").as("k"),
      col("o_orderstatus").as("status"),
      expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"),
      col("o_orderpriority").as("pr"))
    // seq 1: the full base — then blind-append UPSERTS (no reads)
    base.write.mode("append").insertInto(s"$cat.m.orders_pk")
    // seq 2: every %3 key gets a new version
    base.filter(col("k") % 3 === 0)
      .withColumn("status", lit("U2"))
      .withColumn("cents", col("cents") + 1000L)
      .write.mode("append").insertInto(s"$cat.m.orders_pk")
    // seq 3: every %5 key shadows again (beats seq 2 on %15 keys)
    base.filter(col("k") % 5 === 0)
      .withColumn("status", lit("U3"))
      .withColumn("cents", col("cents") + 2000L)
      .write.mode("append").insertInto(s"$cat.m.orders_pk")
    // seq 4: BLIND key delete — one equality-delete row, zero reads
    val kMin = base.agg(min("k")).head().getLong(0)
    spark.sql(
      s"DELETE FROM $cat.m.orders_pk WHERE k = CAST($kMin AS BIGINT)")
    // seq 5: PREDICATE delete over the RESOLVED rows (delta plan)
    spark.sql(s"DELETE FROM $cat.m.orders_pk WHERE k % 7 = 0")
    // seq 6: REVIVE every %35 key (a later sequence beats the delete)
    base.filter(col("k") % 35 === 0)
      .withColumn("status", lit("R4"))
      .withColumn("cents", col("cents") + 3000L)
      .write.mode("append").insertInto(s"$cat.m.orders_pk")
    def census(stage: String): DataFrame =
      spark.table(s"$cat.m.orders_pk")
        .groupBy("status")
        .agg(count(lit(1)).cast("bigint").as("n"),
          sum(col("cents")).cast("bigint").as("cents"))
        .withColumn("stage", lit(stage))
        .select("stage", "status", "n", "cents")
    val pre = census("pre_compact")
    // KEY-AWARE compact: resolves latest-per-key as it rewrites,
    // drops the equality-delete files, stamps the compacted sequence
    // (post-compact scans skip the dedup aggregate entirely)
    // materialize BEFORE the rewrite — a bounded collect: the census
    // is already aggregated to one row per status (≤ a handful)
    val preRows = pre.collect().toSeq
    spark.sql(s"CALL $cat.system.compact('m.orders_pk', 2)")
    val post = census("post_compact")
    spark.createDataFrame(
      spark.sparkContext.parallelize(preRows), pre.schema)
      .unionByName(post)
      .orderBy("stage", "status")
  }

  /** CDC-style `MERGE INTO` a PK table: matched-and-negative DELETE,
    * matched UPDATE (over the RESOLVED row values — one key is
    * shadowed first to prove it), not-matched INSERT — ONE commit of
    * appends + equality deletes, zero data files rewritten. */
  def pkMergeCensus(orders: DataFrame, workDir: String): DataFrame = {
    val spark = orders.sparkSession
    val cat = "glakepkm"
    PartitionedWorkDirs.reset(workDir)
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftLakeCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.path", workDir)
    spark.sql(
      s"""CREATE TABLE $cat.m.orders_pkm (
         |  k BIGINT NOT NULL, status STRING, cents BIGINT)
         |PARTITIONED BY (bucket(4, k))
         |TBLPROPERTIES ('versioned'='true', 'primary-key'='k')""".stripMargin)
    val base = orders.select(
      col("o_orderkey").as("k"),
      col("o_orderstatus").as("status"),
      expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"))
    base.write.mode("append").insertInto(s"$cat.m.orders_pkm")
    // shadow every %4 key first: the MERGE's UPDATE must read the
    // RESOLVED (shadowed) value, not the seq-1 original
    base.filter(col("k") % 4 === 0)
      .withColumn("cents", col("cents") + 10000L)
      .write.mode("append").insertInto(s"$cat.m.orders_pkm")
    // CDC batch: %2 keys matched (delete the %10s, update the rest);
    // negated keys are fresh inserts
    base.filter(col("k") % 2 === 0)
      .select(col("k").as("mk"), col("cents").as("mcents"))
      .unionByName(
        base.filter(col("k") % 9 === 0)
          // -(k+1): always strictly negative (key 0 exists in the
          // fixtures — a bare -k would collide with the matched branch)
          .select((-(col("k") + 1L)).as("mk"), col("cents").as("mcents")))
      .createOrReplaceTempView("pk_cdc_batch")
    spark.sql(
      s"""MERGE INTO $cat.m.orders_pkm t USING pk_cdc_batch s ON t.k = s.mk
         |WHEN MATCHED AND s.mk % 10 = 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET cents = t.cents + 500
         |WHEN NOT MATCHED THEN INSERT (k, status, cents)
         |  VALUES (s.mk, 'NEW', s.mcents)""".stripMargin)
    spark.table(s"$cat.m.orders_pkm")
      .groupBy("status")
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(col("cents")).cast("bigint").as("cents"),
        min(col("k")).cast("bigint").as("min_k"))
      .orderBy("status")
  }

  /** `'sequence.field'` end-to-end (r16 — Paimon's declared version
    * ordering; the reference's CDC order is the WAL/LSN order,
    * `flink-cdc/sql/tickets-cdc.sql:43-64`, which arrival order does
    * NOT preserve under replays): out-of-order upserts resolve by the
    * FIELD, a late replay below a predicate delete's retired field
    * stays dead, a genuinely newer version revives, blind deletes
    * keep arrival revive, and the key-aware compact is content-
    * neutral (pre/post censuses hash identically). */
  def pkSeqFieldCensus(orders: DataFrame, workDir: String): DataFrame = {
    val spark = orders.sparkSession
    val cat = "glakepksf"
    PartitionedWorkDirs.reset(workDir)
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftLakeCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.path", workDir)
    spark.sql(
      s"""CREATE TABLE $cat.m.orders_sf (
         |  k BIGINT NOT NULL, ver BIGINT NOT NULL, status STRING,
         |  cents BIGINT)
         |PARTITIONED BY (bucket(4, k))
         |TBLPROPERTIES ('versioned'='true', 'primary-key'='k',
         |  'sequence.field'='ver')""".stripMargin)
    val base = orders.select(
      col("o_orderkey").as("k"),
      col("o_orderstatus").as("status"),
      expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"))
    def ins(df: DataFrame): Unit =
      df.select("k", "ver", "status", "cents")
        .write.mode("append").insertInto(s"$cat.m.orders_sf")
    // seq 1: everything at version 1
    ins(base.withColumn("ver", lit(1L)))
    // seq 2: %3 keys advance to version 3
    ins(base.filter(col("k") % 3 === 0).withColumn("ver", lit(3L))
      .withColumn("status", lit("V3"))
      .withColumn("cents", col("cents") + 3000L))
    // seq 3: a LATE REPLAY — %2 keys (re)arrive at version 2: it wins
    // over version 1 but must NOT beat the %6 keys' version 3
    ins(base.filter(col("k") % 2 === 0).withColumn("ver", lit(2L))
      .withColumn("status", lit("V2"))
      .withColumn("cents", col("cents") + 2000L))
    // seq 4: predicate delete retires the %7 winners (field captured)
    spark.sql(s"DELETE FROM $cat.m.orders_sf WHERE k % 7 = 0")
    // seq 5: a replay BELOW every retired field — stays dead
    ins(base.filter(col("k") % 7 === 0).withColumn("ver", lit(0L))
      .withColumn("status", lit("DEAD"))
      .withColumn("cents", col("cents") + 50L))
    // seq 6: %21 keys come back ABOVE their retired field — revive
    ins(base.filter(col("k") % 21 === 0).withColumn("ver", lit(9L))
      .withColumn("status", lit("V9"))
      .withColumn("cents", col("cents") + 9000L))
    // seq 7+8: BLIND delete of a key the %7 FIELD delete never touched
    // (a field delete's retired threshold outlives a blind delete —
    // a low-version re-insert only revives where no field threshold
    // stands), then a LOW-version re-insert: blind deletes keep
    // ARRIVAL revive semantics
    val kBr = base.filter(col("k") % 7 =!= 0).agg(min("k"))
      .head().getLong(0)
    spark.sql(
      s"DELETE FROM $cat.m.orders_sf WHERE k = CAST($kBr AS BIGINT)")
    ins(base.filter(col("k") === kBr).withColumn("ver", lit(0L))
      .withColumn("status", lit("BR")))
    def census(stage: String): DataFrame =
      spark.table(s"$cat.m.orders_sf")
        .groupBy("status")
        .agg(count(lit(1)).cast("bigint").as("n"),
          sum(col("cents")).cast("bigint").as("cents"),
          sum(col("ver")).cast("bigint").as("vers"))
        .withColumn("stage", lit(stage))
        .select("stage", "status", "n", "cents", "vers")
    val pre = census("pre_compact")
    val preRows = pre.collect().toSeq // bounded: one row per status
    spark.sql(s"CALL $cat.system.compact('m.orders_sf', 2)")
    val post = census("post_compact")
    spark.createDataFrame(
      spark.sparkContext.parallelize(preRows), pre.schema)
      .unionByName(post)
      .orderBy("stage", "status")
  }

  /** PARTIAL-UPDATE merge engine end-to-end: column fragments arrive
    * in separate upserts (cents-only, then status-only, then a cents
    * revision) and the resolved row is the column-wise latest
    * NON-NULL merge — the Paimon `'merge-engine'='partial-update'`
    * pattern for assembling a wide row from multiple feeds. */
  def pkPartialCensus(orders: DataFrame, workDir: String): DataFrame = {
    val spark = orders.sparkSession
    val cat = "glakepkp"
    PartitionedWorkDirs.reset(workDir)
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftLakeCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.path", workDir)
    spark.sql(
      s"""CREATE TABLE $cat.m.orders_pkp (
         |  k BIGINT NOT NULL, cents BIGINT, status STRING)
         |PARTITIONED BY (bucket(4, k))
         |TBLPROPERTIES ('versioned'='true', 'primary-key'='k',
         |  'merge-engine'='partial-update')""".stripMargin)
    val base = orders.select(
      col("o_orderkey").as("k"),
      expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"),
      col("o_orderstatus").as("status"))
    // fragment feeds: cents-only, then status-only for %2 keys, then
    // a cents revision for %6 keys (its NULL status must not erase)
    base.select(col("k"), col("cents"),
        lit(null).cast("string").as("status"))
      .write.mode("append").insertInto(s"$cat.m.orders_pkp")
    base.filter(col("k") % 2 === 0)
      .select(col("k"), lit(null).cast("long").as("cents"), col("status"))
      .write.mode("append").insertInto(s"$cat.m.orders_pkp")
    base.filter(col("k") % 6 === 0)
      .select(col("k"), (col("cents") + 7L).as("cents"),
        lit(null).cast("string").as("status"))
      .write.mode("append").insertInto(s"$cat.m.orders_pkp")
    spark.table(s"$cat.m.orders_pkp")
      .groupBy(coalesce(col("status"), lit("NONE")).as("status"))
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(col("cents")).cast("bigint").as("cents"),
        count(col("status")).cast("bigint").as("n_status"))
      .orderBy("status")
  }

  /** AGGREGATION merge engine end-to-end: the COMPLETE declared-fold
    * family (`'fields.<col>.aggregate-function'`) — `sum`,
    * `bool_and`, `bool_or`, `product`, `listagg` (deterministic
    * ladder-ordered concat), `first_value`, and the `last_non_null`
    * default — every upsert folds its fragment into the key's running
    * aggregate at read time, the Paimon pre-aggregation pattern
    * (counters/metrics tables ingesting blind appends). */
  def pkAggCensus(orders: DataFrame, workDir: String): DataFrame = {
    val spark = orders.sparkSession
    val cat = "glakepka"
    PartitionedWorkDirs.reset(workDir)
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftLakeCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.path", workDir)
    spark.sql(
      s"""CREATE TABLE $cat.m.orders_pka (
         |  k BIGINT NOT NULL, cents BIGINT, status STRING,
         |  ok BOOLEAN, seen BOOLEAN, fct DOUBLE, tag STRING,
         |  fst STRING)
         |PARTITIONED BY (bucket(4, k))
         |TBLPROPERTIES ('versioned'='true', 'primary-key'='k',
         |  'merge-engine'='aggregation',
         |  'fields.cents.aggregate-function'='sum',
         |  'fields.ok.aggregate-function'='bool_and',
         |  'fields.seen.aggregate-function'='bool_or',
         |  'fields.fct.aggregate-function'='product',
         |  'fields.tag.aggregate-function'='listagg',
         |  'fields.fst.aggregate-function'='first_value')""".stripMargin)
    val base = orders.select(
      col("o_orderkey").as("k"),
      expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"),
      col("o_orderstatus").as("status"))
    def ins(df: DataFrame): Unit =
      df.select("k", "cents", "status", "ok", "seen", "fct", "tag", "fst")
        .write.mode("append").insertInto(s"$cat.m.orders_pka")
    // seq 1: everything — and=true, or=false, ×1, tag 'a', first 'F1'
    ins(base.select(col("k"), col("cents"),
      lit(null).cast("string").as("status"),
      lit(true).as("ok"), lit(false).as("seen"),
      lit(1.0).as("fct"), lit("a").as("tag"), lit("F1").as("fst")))
    // seq 2 (%2 keys): and &= (k%4=0), or |= (k%4=0), ×2, tag 'b'
    ins(base.filter(col("k") % 2 === 0)
      .select(col("k"), lit(10L).as("cents"), col("status"),
        (col("k") % 4 === 0).as("ok"), (col("k") % 4 === 0).as("seen"),
        lit(2.0).as("fct"), lit("b").as("tag"), lit("F2").as("fst")))
    // seq 3 (%3 keys): and &= true, or |= true, ×3, tag 'c'
    ins(base.filter(col("k") % 3 === 0)
      .select(col("k"), lit(100L).as("cents"),
        lit(null).cast("string").as("status"),
        lit(true).as("ok"), lit(true).as("seen"),
        lit(3.0).as("fct"), lit("c").as("tag"), lit("F3").as("fst")))
    spark.table(s"$cat.m.orders_pka")
      .groupBy(col("tag"))
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(col("cents")).cast("bigint").as("cents"),
        count(col("status")).cast("bigint").as("n_status"),
        sum(when(col("ok"), 1L).otherwise(0L)).cast("bigint").as("n_and"),
        sum(when(col("seen"), 1L).otherwise(0L)).cast("bigint").as("n_or"),
        sum(col("fct")).cast("bigint").as("prod_sum"),
        min(col("fst")).as("fst_min"),
        max(col("fst")).as("fst_max"))
      .orderBy("tag")
  }

  /** Minor EQUALITY-DELETE compaction end-to-end
    * (`CALL rewrite_eqdelete_files`): two predicate deletes with a
    * reviving insert between them leave multiple key files per
    * bucket; the rewrite merges each bucket's files to ONE keeping
    * per-key MAX thresholds — the census is identical before and
    * after (the revive survives: its original threshold is preserved
    * per row, never inflated to the merged file's birth sequence). */
  def rewriteEqDeletesCensus(orders: DataFrame, workDir: String): DataFrame = {
    val spark = orders.sparkSession
    val cat = "glakepke"
    PartitionedWorkDirs.reset(workDir)
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftLakeCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.path", workDir)
    spark.sql(
      s"""CREATE TABLE $cat.m.orders_pke (
         |  k BIGINT NOT NULL, status STRING, cents BIGINT)
         |PARTITIONED BY (bucket(4, k))
         |TBLPROPERTIES ('versioned'='true', 'primary-key'='k')""".stripMargin)
    val base = orders.select(
      col("o_orderkey").as("k"),
      col("o_orderstatus").as("status"),
      expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"))
    base.write.mode("append").insertInto(s"$cat.m.orders_pke")    // seq 1
    spark.sql(s"DELETE FROM $cat.m.orders_pke WHERE k % 7 = 0")   // seq 2
    base.filter(col("k") % 91 === 0)                              // seq 3
      .withColumn("status", lit("R"))
      .withColumn("cents", col("cents") + 3000L)
      .write.mode("append").insertInto(s"$cat.m.orders_pke")
    spark.sql(s"DELETE FROM $cat.m.orders_pke WHERE k % 11 = 0")  // seq 4
    def census(stage: String): DataFrame =
      spark.table(s"$cat.m.orders_pke")
        .groupBy("status")
        .agg(count(lit(1)).cast("bigint").as("n"),
          sum(col("cents")).cast("bigint").as("cents"))
        .withColumn("stage", lit(stage))
        .select("stage", "status", "n", "cents")
    // bounded collect: one aggregated row per status
    val preRows = census("pre_rewrite").collect().toSeq
    spark.sql(s"CALL $cat.system.rewrite_eqdelete_files('m.orders_pke')")
    val nEqFiles = graft.catalog.PkTables.currentEqDeleteFileCount(
      java.nio.file.Paths.get(workDir, "m", "orders_pke.parquet")).toLong
    val pre = spark.createDataFrame(
      spark.sparkContext.parallelize(preRows),
      census("x").schema)
    pre.unionByName(census("post_rewrite"))
      .withColumn("n_eq_files", lit(nEqFiles))
      .orderBy("stage", "status")
  }

  /** RESOLVED changelog of a PK table ([[graft.catalog.Catalog
    * .readPkTableChanges]] — the Paimon changelog-producer surface):
    * the keyed diff of two resolved snapshots — updates carry
    * before/after, deletes only before, inserts only after; shadowed
    * intermediate versions never leak. */
  def pkChangesCensus(orders: DataFrame, workDir: String): DataFrame = {
    val spark = orders.sparkSession
    val cat = "glakepkc"
    PartitionedWorkDirs.reset(workDir)
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftLakeCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.path", workDir)
    spark.sql(
      s"""CREATE TABLE $cat.m.orders_pkc (
         |  k BIGINT NOT NULL, status STRING, cents BIGINT)
         |PARTITIONED BY (bucket(4, k))
         |TBLPROPERTIES ('versioned'='true', 'primary-key'='k')""".stripMargin)
    val base = orders.select(
      col("o_orderkey").as("k"),
      col("o_orderstatus").as("status"),
      expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"))
    base.write.mode("append").insertInto(s"$cat.m.orders_pkc")       // v1
    base.filter(col("k") % 3 === 0)
      .withColumn("status", lit("U2"))
      .withColumn("cents", col("cents") + 1000L)
      .write.mode("append").insertInto(s"$cat.m.orders_pkc")         // v2
    spark.sql(s"DELETE FROM $cat.m.orders_pkc WHERE k % 7 = 0")      // v3
    base.filter(col("k") % 9 === 0)
      .select((-(col("k") + 1L)).as("k"), lit("NEW").as("status"),
        col("cents"))
      .write.mode("append").insertInto(s"$cat.m.orders_pkc")         // v4
    graft.catalog.Catalog
      .readPkTableChanges(spark, s"$cat.m.orders_pkc", 1L, 4L)
      .groupBy("op")
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(coalesce(col("before.cents"), lit(0L))).cast("bigint")
          .as("before_cents"),
        sum(coalesce(col("after.cents"), lit(0L))).cast("bigint")
          .as("after_cents"))
      .orderBy("op")
  }

  /** PARTITIONED PK-table lifecycle (r16 — the production CDC shape
    * `PARTITIONED BY (pr, bucket(4, k))`, partition transforms ⊆ key):
    * upserts, a BLIND full-PK delete (both key halves bound), a
    * partition-scoped predicate delete, a revive — censused over the
    * FULL resolved table AND over one identity partition (the
    * steady-state leaf-pruned exchange-free read,
    * [[graft.catalog.PkBucketResolve]]). */
  def pkPartitionedCensus(orders: DataFrame, workDir: String): DataFrame = {
    val spark = orders.sparkSession
    val cat = "glakepkp2"
    PartitionedWorkDirs.reset(workDir)
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftLakeCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.path", workDir)
    spark.sql(
      s"""CREATE TABLE $cat.m.orders_pp (
         |  k BIGINT NOT NULL, status STRING, cents BIGINT,
         |  pr STRING NOT NULL)
         |PARTITIONED BY (pr, bucket(4, k))
         |TBLPROPERTIES ('versioned'='true', 'primary-key'='pr,k')"""
        .stripMargin)
    val base = orders.select(
      col("o_orderkey").as("k"),
      col("o_orderstatus").as("status"),
      expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"),
      col("o_orderpriority").as("pr"))
    base.write.mode("append").insertInto(s"$cat.m.orders_pp")  // seq 1
    base.filter(col("k") % 3 === 0)                            // seq 2
      .withColumn("status", lit("U2"))
      .withColumn("cents", col("cents") + 1000L)
      .write.mode("append").insertInto(s"$cat.m.orders_pp")
    // BLIND full-PK delete: both key halves bound — one key row
    // written into ITS leaf dir, zero rows read
    val kMinU = base.filter(col("pr") === "1-URGENT")
      .agg(min("k")).head().getLong(0)
    spark.sql(s"DELETE FROM $cat.m.orders_pp " +
      s"WHERE pr = '1-URGENT' AND k = CAST($kMinU AS BIGINT)")   // seq 3
    // partition-scoped predicate delete (delta plan)
    spark.sql(s"DELETE FROM $cat.m.orders_pp " +
      "WHERE k % 7 = 0 AND pr LIKE '3%'")                        // seq 4
    base.filter(col("k") % 21 === 0 && col("pr").startsWith("3")) // seq 5
      .withColumn("status", lit("R"))
      .withColumn("cents", col("cents") + 3000L)
      .write.mode("append").insertInto(s"$cat.m.orders_pp")
    def census(stage: String, df: DataFrame): DataFrame =
      df.groupBy("pr", "status")
        .agg(count(lit(1)).cast("bigint").as("n"),
          sum(col("cents")).cast("bigint").as("cents"))
        .withColumn("stage", lit(stage))
        .select("stage", "pr", "status", "n", "cents")
    census("all", spark.table(s"$cat.m.orders_pp"))
      .unionByName(census("urgent",
        spark.table(s"$cat.m.orders_pp")
          .where(col("pr") === "1-URGENT")))
      .orderBy("stage", "pr", "status")
  }

  /** The reference's FULL topology as one lifecycle (r16): a CDC feed
    * ingests as blind upserts into PRIMARY-KEY staging tables (fact
    * `tickets` + dimension `movies` — reference
    * `flink-cdc/sql/tickets-cdc.sql:23-37`), the revenue MV refreshes
    * INCREMENTALLY over the fact table's RESOLVED changelog after
    * every generation (upserts, a predicate delete, a CDC MERGE —
    * reference `revenue-analytics.sql:40-75`), and the report joins
    * the MV with the RESOLVED dimension. The final MV content hashes
    * against a DuckDB full recompute from raw parquet. */
  def pkRevenueMvCensus(orders: DataFrame, workDir: String): DataFrame = {
    val spark = orders.sparkSession
    val cat = "glakervmv"
    PartitionedWorkDirs.reset(workDir)
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftLakeCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.path", workDir)
    spark.sql(
      s"""CREATE TABLE $cat.m.tickets (
         |  k BIGINT NOT NULL, status STRING, cents BIGINT, pr STRING)
         |PARTITIONED BY (bucket(4, k))
         |TBLPROPERTIES ('versioned'='true', 'primary-key'='k')""".stripMargin)
    spark.sql(
      s"""CREATE TABLE $cat.m.movies (
         |  pm STRING NOT NULL, label STRING)
         |PARTITIONED BY (bucket(2, pm))
         |TBLPROPERTIES ('versioned'='true', 'primary-key'='pm')""".stripMargin)
    val base = orders.select(
      col("o_orderkey").as("k"),
      col("o_orderstatus").as("status"),
      expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"),
      col("o_orderpriority").as("pr"))
    // generation 1: the initial snapshots + the MV at source v1
    base.write.mode("append").insertInto(s"$cat.m.tickets")
    base.select(col("pr").as("pm")).distinct()
      .withColumn("label", concat(lit("L-"), col("pm")))
      .write.mode("append").insertInto(s"$cat.m.movies")
    graft.catalog.MaterializedView.create(spark, s"$cat.m.rev_mv",
      s"$cat.m.tickets", Seq("k"), Seq("status", "pr"),
      Seq("cents" -> "sum", "cents" -> "count"), buckets = 4)
    def refresh(): Unit = {
      graft.catalog.MaterializedView.refresh(spark, s"$cat.m.rev_mv")
      ()
    }
    // generation 2: CDC upserts — %3 keys advance; one dimension
    // label upserts (resolution must serve the LATEST label)
    base.filter(col("k") % 3 === 0)
      .withColumn("status", lit("U2"))
      .withColumn("cents", col("cents") + 1000L)
      .write.mode("append").insertInto(s"$cat.m.tickets")
    base.select(col("pr").as("pm")).distinct()
      .filter(col("pm").startsWith("1"))
      .withColumn("label", lit("HOT"))
      .write.mode("append").insertInto(s"$cat.m.movies")
    refresh()
    // generation 3: a CDC tombstone batch (predicate delete)
    spark.sql(s"DELETE FROM $cat.m.tickets WHERE k % 7 = 0")
    refresh()
    // generation 4: a CDC MERGE — matched updates + fresh inserts
    base.filter(col("k") % 10 === 0 && col("k") % 7 =!= 0)
      .select(col("k").as("mk"), col("cents").as("mcents"),
        col("pr").as("mpr"))
      .unionByName(
        base.filter(col("k") % 9 === 0)
          .select((-(col("k") + 1L)).as("mk"), col("cents").as("mcents"),
            col("pr").as("mpr")))
      .createOrReplaceTempView("rvmv_cdc")
    spark.sql(
      s"""MERGE INTO $cat.m.tickets t USING rvmv_cdc s ON t.k = s.mk
         |WHEN MATCHED THEN UPDATE SET cents = t.cents + 500
         |WHEN NOT MATCHED THEN INSERT (k, status, cents, pr)
         |  VALUES (s.mk, 'NEW', s.mcents, s.mpr)""".stripMargin)
    refresh()
    // the report: the incrementally-maintained MV joined with the
    // RESOLVED dimension (both reads resolve latest-per-key)
    spark.table(s"$cat.m.rev_mv")
      .join(spark.table(s"$cat.m.movies"),
        col("pr") === col("pm"))
      .select(col("status"), col("pr"), col("label"),
        col("sum_cents").cast("bigint").as("sum_cents"),
        col("count_cents").cast("bigint").as("count_cents"),
        col("mv_rows").cast("bigint").as("mv_rows"))
      .orderBy("status", "pr")
  }

  /** The reference's MV shape EXACTLY (r17): `tickets JOIN movies ON
    * movie_id GROUP BY movie_id, m.title, …` (reference
    * `revenue-analytics.sql:62-65`) as ONE incrementally-maintained
    * join MV over two PRIMARY-KEY staging tables — dimension
    * attributes live IN the MV key and the view updates from EITHER
    * side ([[graft.catalog.MaterializedView.createJoin]]). Lifecycle:
    * fact upserts (fact-only delta — no table scan), a dim RELABEL
    * (rows move between MV groups), a simultaneous fact-delete +
    * dim-delete range (the Δfact⋈Δdim overlap folds exactly once),
    * and a late dim INSERT attaching previously-dangling fact rows.
    * The final MV content hashes against a DuckDB full recompute from
    * raw parquet. */
  def joinMvCensus(orders: DataFrame, workDir: String): DataFrame = {
    val spark = orders.sparkSession
    val cat = "glakejmv"
    PartitionedWorkDirs.reset(workDir)
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftLakeCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.path", workDir)
    // both staging tables declare the PERSISTED changelog — exactly
    // the reference sink's 'changelog-producer'='input'
    // (flink-gen.sh:140): every refresh below reads the write-once
    // feed files, not a recomputed snapshot diff
    spark.sql(
      s"""CREATE TABLE $cat.m.tickets (
         |  k BIGINT NOT NULL, status STRING, cents BIGINT, pm STRING)
         |PARTITIONED BY (bucket(4, k))
         |TBLPROPERTIES ('versioned'='true', 'primary-key'='k',
         |  'changelog-producer'='input')""".stripMargin)
    spark.sql(
      s"""CREATE TABLE $cat.m.movies (
         |  pm STRING NOT NULL, label STRING, boost BIGINT)
         |PARTITIONED BY (bucket(2, pm))
         |TBLPROPERTIES ('versioned'='true', 'primary-key'='pm',
         |  'changelog-producer'='input')""".stripMargin)
    val base = orders.select(
      col("o_orderkey").as("k"),
      col("o_orderstatus").as("status"),
      expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"),
      col("o_orderpriority").as("pm"))
    // generation 1: all fact rows; every dim row EXCEPT the '4%'
    // priority — those fact rows DANGLE (inner join) until gen 5
    base.write.mode("append").insertInto(s"$cat.m.tickets")
    base.select(col("pm")).distinct()
      .filter(!col("pm").startsWith("4"))
      .withColumn("label", concat(lit("L-"), col("pm")))
      .withColumn("boost", lit(1L))
      .write.mode("append").insertInto(s"$cat.m.movies")
    graft.catalog.MaterializedView.createJoin(spark, s"$cat.m.rev_mv",
      s"$cat.m.tickets", s"$cat.m.movies", factKeys = Seq("k"),
      joinCols = Seq("pm"), groupBy = Seq("pm", "label"),
      aggs = Seq("cents" -> "sum", "cents" -> "count", "cents" -> "min"),
      buckets = 4)
    def refresh(): Unit = {
      graft.catalog.MaterializedView.refresh(spark, s"$cat.m.rev_mv")
      ()
    }
    // generation 2: CDC fact upserts — %3 keys advance (the FACT-ONLY
    // delta path: O(changes), no table scan)
    base.filter(col("k") % 3 === 0)
      .withColumn("status", lit("U2"))
      .withColumn("cents", col("cents") + 1000L)
      .write.mode("append").insertInto(s"$cat.m.tickets")
    refresh()
    // generation 3: the dim RELABELS the '1%' group — every affected
    // fact row moves between (pm, label) MV groups, min included
    spark.sql(
      s"UPDATE $cat.m.movies SET label = 'HOT' WHERE pm LIKE '1%'")
    refresh()
    // generation 4: BOTH sides change in one range — a fact tombstone
    // batch and a dim retirement (rows deleted on the fact side whose
    // dim row ALSO vanished must fold exactly once)
    spark.sql(s"DELETE FROM $cat.m.tickets WHERE k % 7 = 0")
    spark.sql(s"DELETE FROM $cat.m.movies WHERE pm LIKE '5%'")
    refresh()
    // generation 5: the late dim row arrives — dangling rows ATTACH
    base.select(col("pm")).distinct()
      .filter(col("pm").startsWith("4"))
      .withColumn("label", lit("LATE"))
      .withColumn("boost", lit(9L))
      .write.mode("append").insertInto(s"$cat.m.movies")
    refresh()
    spark.table(s"$cat.m.rev_mv")
      .select(col("pm"), col("label"),
        col("sum_cents").cast("bigint").as("sum_cents"),
        col("count_cents").cast("bigint").as("count_cents"),
        col("min_cents").cast("bigint").as("min_cents"),
        col("mv_rows").cast("bigint").as("mv_rows"))
      .orderBy("pm")
  }

  /** `MERGE INTO … WITH SCHEMA EVOLUTION` end-to-end on BOTH versioned
    * lake layouts: the source carries a NEW column — the analyzer
    * evolves the target metadata-only (ADD COLUMN, appended at the
    * END) and the merge populates it; untouched rows read NULL. The
    * CDC schema-drift scenario (reference `flink-gen.sh:58-90`).
    * r16 adds the IDENTITY-partitioned leg with UPDATE + INSERT
    * actions — append-at-end evolution lifted the old UPDATE-only
    * limit (MergeEvolutionSpec). */
  def mergeEvolveCensus(orders: DataFrame, workDir: String): DataFrame = {
    val spark = orders.sparkSession
    val cat = "glakemev"
    PartitionedWorkDirs.reset(workDir)
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftLakeCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.path", workDir)
    spark.sql(
      s"""CREATE TABLE $cat.m.orders_me (
         |  k BIGINT, status STRING, cents BIGINT, pr STRING)
         |PARTITIONED BY (bucket(8, k))
         |TBLPROPERTIES ('versioned'='true')""".stripMargin)
    val base = orders.select(
      col("o_orderkey").as("k"),
      col("o_orderstatus").as("status"),
      expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"),
      col("o_orderpriority").as("pr"))
    base.write.mode("append").insertInto(s"$cat.m.orders_me")
    // the drifted CDC batch: a discount column the table never had
    base.filter(col("k") % 3 === 0)
      .select(col("k").as("mk"), col("cents").as("mcents"),
        (col("k") % 97L).as("discount"), col("pr").as("mpr"))
      .unionByName(
        base.filter(col("k") % 11 === 0)
          .select((-(col("k") + 1L)).as("mk"), col("cents").as("mcents"),
            (col("k") % 97L).as("discount"), col("pr").as("mpr")))
      .createOrReplaceTempView("me_cdc_batch")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.m.orders_me t
         |USING me_cdc_batch s ON t.k = s.mk
         |WHEN MATCHED THEN UPDATE SET cents = t.cents - s.discount,
         |  discount = s.discount
         |WHEN NOT MATCHED THEN INSERT (k, status, cents, pr, discount)
         |  VALUES (s.mk, 'NEW', s.mcents, s.mpr, s.discount)""".stripMargin)
    val bucketCensus = spark.table(s"$cat.m.orders_me")
      .groupBy("pr")
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(col("cents")).cast("bigint").as("cents"),
        sum(coalesce(col("discount"), lit(0L))).cast("bigint")
          .as("discount_total"),
        count(col("discount")).cast("bigint").as("n_discounted"))
      .withColumn("tbl", lit("bucket"))
    // IDENTITY-partitioned leg (r16): the same drift with UPDATE +
    // INSERT actions — rows route to their identity partitions, the
    // evolved column appends past the partition column
    spark.sql(
      s"""CREATE TABLE $cat.m.orders_mei (
         |  k BIGINT, cents BIGINT, pr STRING)
         |PARTITIONED BY (pr)
         |TBLPROPERTIES ('versioned'='true')""".stripMargin)
    base.select("k", "cents", "pr")
      .write.mode("append").insertInto(s"$cat.m.orders_mei")
    base.filter(col("k") % 5 === 0)
      .select(col("k").as("mk"), col("cents").as("mcents"),
        (col("k") % 13L).as("bonus"), col("pr").as("mpr"))
      .unionByName(
        base.filter(col("k") % 9 === 0)
          .select((-(col("k") + 1L)).as("mk"), col("cents").as("mcents"),
            (col("k") % 13L).as("bonus"), col("pr").as("mpr")))
      .createOrReplaceTempView("mei_cdc_batch")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.m.orders_mei t
         |USING mei_cdc_batch s ON t.k = s.mk
         |WHEN MATCHED THEN UPDATE SET bonus = s.bonus
         |WHEN NOT MATCHED THEN INSERT (k, cents, pr, bonus)
         |  VALUES (s.mk, s.mcents, s.mpr, s.bonus)""".stripMargin)
    val idCensus = spark.table(s"$cat.m.orders_mei")
      .groupBy("pr")
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(col("cents")).cast("bigint").as("cents"),
        sum(coalesce(col("bonus"), lit(0L))).cast("bigint")
          .as("discount_total"),
        count(col("bonus")).cast("bigint").as("n_discounted"))
      .withColumn("tbl", lit("identity"))
    bucketCensus.unionByName(idCensus)
      .withColumnRenamed("pr", "o_orderpriority")
      .select("tbl", "o_orderpriority", "n", "cents", "discount_total",
        "n_discounted")
      .orderBy("tbl", "o_orderpriority")
  }
}

/** r15 lake-lifecycle censuses that are not PK-specific. */
object LakeBranches {
  import org.apache.spark.sql.functions._

  /** Branch retention end-to-end: three audits staged on a branch,
    * `CALL expire_branch(keep=1)` drops the middle history (fork
    * marker + head retained, dropped-only files GC'd), the branch
    * stays readable and `fast_forward` still publishes — raw,
    * published, and the dropped count all oracle-derivable. */
  def branchRetentionCensus(documents: org.apache.spark.sql.DataFrame,
                            workDir: String): org.apache.spark.sql.DataFrame = {
    val spark = documents.sparkSession
    val cat = "glakebre"
    PartitionedWorkDirs.reset(workDir)
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftLakeCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.path", workDir)
    spark.sql(
      s"""CREATE TABLE $cat.m.docs_bre (
         |  doc_id BIGINT, lang STRING, n_chars BIGINT, source STRING)
         |PARTITIONED BY (source)
         |TBLPROPERTIES ('versioned'='true')""".stripMargin)
    documents.select(col("doc_id"), col("lang"),
        col("n_chars").cast("long").as("n_chars"), col("source"))
      .write.mode("append").insertInto(s"$cat.m.docs_bre") // s-1
    spark.sql(s"CALL $cat.system.branch('m.docs_bre', 'audit')")
    spark.conf.set("graft.write.branch", "audit")
    try {
      spark.sql(s"DELETE FROM $cat.m.docs_bre WHERE n_chars < 200")   // b-1
      spark.sql(s"DELETE FROM $cat.m.docs_bre WHERE doc_id % 3 = 0")  // b-2
      spark.sql(s"DELETE FROM $cat.m.docs_bre WHERE n_chars > 20000") // b-3
    } finally spark.conf.unset("graft.write.branch")
    spark.catalog.clearCache()
    val dropped = spark.sql(
      s"CALL $cat.system.expire_branch('m.docs_bre', 'audit', 1)")
      .head().getLong(0)
    // publish the (expired, still-intact) branch head onto main
    spark.sql(s"CALL $cat.system.fast_forward('m.docs_bre', 'audit')")
    spark.catalog.clearCache()
    val raw = spark.sql(
      s"""SELECT source, count(*) AS n_raw
         |FROM $cat.m.docs_bre VERSION AS OF 1 GROUP BY 1""".stripMargin)
    val pub = spark.sql(
      s"""SELECT source, count(*) AS n_published,
         |  CAST(sum(n_chars) AS BIGINT) AS chars_published
         |FROM $cat.m.docs_bre GROUP BY 1""".stripMargin)
    raw.join(pub, Seq("source"), "left")
      .select(col("source"),
        col("n_raw").cast("bigint").as("n_raw"),
        coalesce(col("n_published"), lit(0L)).cast("bigint")
          .as("n_published"),
        coalesce(col("chars_published"), lit(0L)).cast("bigint")
          .as("chars_published"),
        lit(dropped).cast("bigint").as("n_dropped"))
      .orderBy("source")
  }
}

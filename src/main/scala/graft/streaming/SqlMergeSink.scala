package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming CDC upsert through the SQL `MERGE INTO` surface — the
  * reference's continuous PK-table maintenance (`INSERT INTO
  * <pk-table> SELECT …`, `tickets-cdc.sql:68-77`) landing in a LAKE
  * CATALOG table via one MERGE text per micro-batch.
  *
  * This is the integration the catalog's row-level write machinery
  * exists for: `foreachBatch` reduces each changelog micro-batch to
  * its latest-per-key frontier (max `(ts_ms, seq)` — the same
  * total order [[graft.cdc.Upsert.applyChangelog]] uses), registers
  * it as a temp view, and issues
  *
  * {{{
  * MERGE INTO <target> t USING <batch> s ON t.pk = s.pk
  * WHEN MATCHED AND s.__op = 'd' THEN DELETE
  * WHEN MATCHED THEN UPDATE SET col = s.col, …
  * WHEN NOT MATCHED AND s.__op <> 'd' THEN INSERT (cols) VALUES (s.cols)
  * }}}
  *
  * Exactly-once without a ledger: unlike an append sink, a MERGE of
  * the same batch is IDEMPOTENT — replaying it after a crash between
  * sink commit and checkpoint commit re-asserts the same final rows
  * (upserts converge, a delete of an absent key matches nothing) — so
  * checkpoint + idempotent merge gives the reference's effective
  * exactly-once (`'execution.checkpointing.mode'='EXACTLY_ONCE'`,
  * tickets-cdc.sql:3) with no extra state.
  *
  * Scale shape: the per-batch reduction is one hash aggregate over
  * the micro-batch (O(batch)); the MERGE write cost is the catalog's
  * group-based copy-on-write by default — the right trade for
  * dimension-sized PK tables — or, with `graft.write.mode =
  * 'merge-on-read'` set when the stream starts, a POSITION-DELTA
  * commit per batch (delete coordinates + appended rows, no data file
  * rewritten — the fact-sized-target shape, r14); either way
  * [[BucketedStateStore]] remains the engine's path for keyed state
  * itself. */
object SqlMergeSink {

  /** Start the stream: `changelog` rows are [[CdcPipeline.CdcRecord]]
    * envelopes (JSON `before`/`after`); `target` is a catalog
    * identifier (`cat.db.table`) that must already exist with
    * `schema`'s columns. */
  def start(spark: SparkSession, changelog: DataFrame, schema: StructType,
            keys: Seq[String], target: String, checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery = {
    require(keys.nonEmpty, "merge sink needs at least one key column")
    val cols = schema.fieldNames.toSeq
    val dataCols = cols.filterNot(keys.contains)
    changelog.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val seqCol =
          if (batch.columns.contains("seq")) col("seq") else lit(0L)
        // latest-per-key frontier of the micro-batch: keys come from
        // `after` for upserts, `before` for deletes; (ts_ms, seq) is
        // the changelog total order
        val decoded = batch.select(col("op"), col("ts_ms"), seqCol.as("__seq"),
            from_json(col("after"), schema).as("a"),
            from_json(col("before"), schema).as("b"))
          .select(Seq(col("op"), col("ts_ms"), col("__seq")) ++
            keys.map(k => coalesce(col(s"a.$k"), col(s"b.$k")).as(k)) ++
            dataCols.map(c => col(s"a.$c").as(c)): _*)
        val latest = decoded
          .groupBy(keys.map(col): _*)
          .agg(max_by(
            struct((Seq("op") ++ dataCols).map(col): _*),
            struct(col("ts_ms"), col("__seq"))).as("x"))
          .select(keys.map(col) ++ Seq(col("x.op").as("__op")) ++
            dataCols.map(c => col(s"x.$c").as(c)): _*)
        // one view name per STREAM (checkpoint lineage), not per JVM —
        // concurrent merge sinks must not clobber each other's batch
        val view = "__merge_src_" + java.security.MessageDigest
          .getInstance("MD5").digest(checkpointDir.getBytes("UTF-8"))
          .take(6).map("%02x".format(_)).mkString
        latest.createOrReplaceTempView(view)
        val onClause = keys.map(k => s"t.$k = s.$k").mkString(" AND ")
        val setClause = (dataCols.map(c => s"$c = s.$c") ++
          Nil).mkString(", ")
        val insertCols = cols.mkString(", ")
        val insertVals = cols.map(c => s"s.$c").mkString(", ")
        val update =
          if (dataCols.nonEmpty) s"WHEN MATCHED THEN UPDATE SET $setClause"
          else "" // key-only tables: a matched upsert is a no-op
        batch.sparkSession.sql(
          s"""MERGE INTO $target t USING $view s ON $onClause
             |WHEN MATCHED AND s.__op = 'd' THEN DELETE
             |$update
             |WHEN NOT MATCHED AND s.__op <> 'd' THEN
             |  INSERT ($insertCols) VALUES ($insertVals)""".stripMargin)
        batch.sparkSession.catalog.dropTempView(view)
        ()
      }
      .start()
  }
}

package graft.sources

import graft.cdc.ChangeEvent
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming CDC sources — the engine's stand-in for the reference's
  * `'connector'='postgres-cdc'` tables
  * (reference `flink-cdc/sql/tickets-cdc.sql:43-64`).
  *
  * Spark has no Postgres logical-decoding source; production topology
  * is Kafka+Debezium (`spark.readStream.format("kafka")` + the same
  * [[jsonEnvelope]] decode). For tests and file-landed changelogs this
  * reads a directory of JSON change records incrementally —
  * `maxFilesPerTrigger` is the incremental-snapshot-parallelism analog
  * (`'scan.incremental.snapshot.enabled'`, tickets-cdc.sql:63).
  */
object CdcSource {

  /** Wire schema of a Debezium-style flat JSON change record. `seq` is
    * the source's total order within a commit timestamp (Postgres LSN /
    * Kafka offset / file row number) — optional on the wire; when
    * absent the upsert layer falls back to a content-hash tie-break
    * (see [[graft.cdc.Upsert.applyChangelog]]). */
  val wireSchema: StructType = StructType(Seq(
    StructField("table", StringType), StructField("op", StringType),
    StructField("ts_ms", LongType), StructField("seq", LongType),
    StructField("before", StringType), StructField("after", StringType)))

  /** Incremental file-based changelog stream: one JSON object per line,
    * `{table, op, ts_ms, [seq], before, after}` with before/after as
    * JSON strings of the row.
    *
    * `seq` is the producer's obligation: Debezium transports carry the
    * LSN ([[fromDebezium]]), Kafka readers should stamp the offset, and
    * file-landing producers should write their row counter (the JSON
    * source exposes no `_metadata.row_index` to recover it after the
    * fact). Without a seq, intra-millisecond order is UNDEFINED and the
    * upsert layer falls back to a deterministic content-hash tie-break
    * (replay-stable, but not producer order — see
    * [[graft.cdc.Upsert.applyChangelog]]). */
  def fromJsonDir(spark: SparkSession, dir: String,
                  maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream
      .schema(wireSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  /** Decode a raw transport frame — anything that delivers the change
    * record as a JSON payload column (Kafka's `value`, Kinesis `data`,
    * a raw-text file) — into the flat wire schema. This is the
    * source-agnostic seam: `spark.readStream.format("kafka")`,
    * `.format("text")`, or a test MemoryStream all plug in here and
    * share every downstream decode/upsert stage. */
  def fromWire(raw: DataFrame, payload: String = "value"): DataFrame =
    raw.select(from_json(col(payload).cast(StringType), wireSchema).as("__r"))
      .select(col("__r.*"))

  /** The nested Debezium envelope, as the reference's
    * `'connector'='postgres-cdc'` tables actually see it on a Kafka
    * topic (reference `flink-cdc/sql/tickets-cdc.sql:43-64`): row
    * images and provenance live under `payload`, the Postgres LSN under
    * `payload.source.lsn`. `before`/`after` are declared StringType so
    * the parser captures the row subtrees as raw JSON — the row schema
    * is a per-table concern that stays downstream in [[jsonEnvelope]]. */
  val debeziumSchema: StructType = StructType(Seq(
    StructField("payload", StructType(Seq(
      StructField("before", StringType),
      StructField("after", StringType),
      StructField("source", StructType(Seq(
        StructField("table", StringType),
        StructField("lsn", LongType),
        StructField("ts_ms", LongType)))),
      StructField("op", StringType),
      StructField("ts_ms", LongType))))))

  /** Decode a verbatim Debezium-JSON frame (the real wire shape a
    * Kafka+Debezium deployment delivers) into the flat wire schema:
    * `payload.source.table → table`, `payload.source.lsn → seq` (the
    * total order [[graft.cdc.Upsert.applyChangelog]] tie-breaks on),
    * snapshot reads (`op='r'`) normalized to inserts, transaction
    * markers and truncates (`op IN ('m','t')` or no payload) dropped.
    * One `from_json` parse per record; everything downstream of this
    * seam ([[jsonEnvelope]], the pipeline, upsert) is shared with the
    * flat-envelope transports. */
  def fromDebezium(raw: DataFrame, payload: String = "value"): DataFrame =
    fromDebeziumStruct(raw.select(
      from_json(col(payload).cast(StringType), debeziumSchema)
        .getField("payload").as("payload")))

  /** The shared decode tail over an ALREADY-PARSED envelope — a
    * DataFrame carrying [[debeziumSchema]]'s `payload` struct column.
    * Serves both the string-payload transports ([[fromDebezium]]) and
    * the structured JSON file source ([[fromDebeziumJsonDir]]), batch
    * or streaming: the flat wire shape, op normalization, and marker
    * dropping are defined ONCE. */
  def fromDebeziumStruct(parsed: DataFrame): DataFrame =
    parsed.select(col("payload").as("__p"))
      .filter(col("__p").isNotNull && col("__p.op").isin("c", "u", "d", "r"))
      .select(
        col("__p.source.table").as("table"),
        when(col("__p.op") === "r", lit("c")).otherwise(col("__p.op")).as("op"),
        col("__p.ts_ms").as("ts_ms"),
        col("__p.source.lsn").as("seq"),
        col("__p.before").as("before"),
        col("__p.after").as("after"))

  /** Incremental stream over a directory of verbatim Debezium-JSON
    * envelope files — the offline stand-in for the Kafka+Debezium
    * topic (reference `flink-cdc/sql/tickets-cdc.sql:43-64`): the JSON
    * file source parses [[debeziumSchema]] directly (`before`/`after`
    * captured as raw JSON subtrees by their StringType declaration —
    * no second parse), `maxFilesPerTrigger` paces the micro-batches,
    * and the decode tail is [[fromDebeziumStruct]], byte-identical to
    * the Kafka-shaped path. Swapping in the real topic is
    * `format("kafka")` + [[fromDebezium]]; everything downstream is
    * unchanged. */
  def fromDebeziumJsonDir(spark: SparkSession, dir: String,
                          maxFilesPerTrigger: Int = 10): DataFrame =
    fromDebeziumStruct(spark.readStream
      .schema(debeziumSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir))

  /** Decode one table's slice of a wire stream into a typed envelope
    * (CDC JSON decode — the Kinesis `'format'='json'` analog,
    * flink-gen.sh:109). Passes the source sequence through when the
    * wire carries one. */
  def jsonEnvelope(wire: DataFrame, table: String, rowSchema: StructType): DataFrame = {
    val seq: Seq[org.apache.spark.sql.Column] =
      if (wire.columns.contains("seq")) Seq(col("seq")) else Seq.empty
    wire.filter(col("table") === table)
      .select(Seq(col("op"), col("ts_ms")) ++ seq ++ Seq(
        from_json(col("before"), rowSchema).as("before"),
        from_json(col("after"), rowSchema).as("after")): _*)
  }

  /** Snapshot-then-stream: the CDC source's initial-snapshot phase as a
    * batch +I load unioned ahead of the incremental stream (SURVEY
    * §2.1). Spark cannot union batch+stream directly, so the snapshot
    * is replayed as the stream's first trigger: write it into the
    * changelog dir as +I records before starting the file stream. */
  def stageSnapshot(rows: DataFrame, changelogDir: String, table: String): Unit = {
    ChangeEvent.snapshot(rows)
      .select(lit(table).as("table"), col("op"), col("ts_ms"),
        lit(null).cast(StringType).as("before"),
        to_json(col("after")).as("after"))
      .write.mode("append").json(changelogDir)
  }
}

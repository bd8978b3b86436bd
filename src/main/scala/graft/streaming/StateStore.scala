package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned parquet table state — the engine's stand-in for a Fluss
  * PK-table's key-value tablet plus its Paimon/Iceberg lake tier
  * (reference `'table.datalake.enabled'='true'`,
  * `flink-cdc/sql/tickets-cdc.sql:35-36`; tiering job `deploy:318-358`).
  *
  * Each commit writes `dir/v=<version>/` then the reader resolves the
  * max committed version — snapshot isolation without a table format
  * dependency. Version = streaming batchId, which makes `foreachBatch`
  * replay after failure idempotent (re-writing the same version is a
  * no-op overwrite): checkpoint + idempotent sink = the effective
  * exactly-once the reference configures
  * (`'execution.checkpointing.mode'='EXACTLY_ONCE'`, tickets-cdc.sql:3).
  */
final class StateStore(spark: SparkSession, dir: String) {
  private val fs = org.apache.hadoop.fs.FileSystem.get(
    new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
  private val base = new org.apache.hadoop.fs.Path(dir)

  def latestVersion: Option[Long] = versions.lastOption

  /** All committed versions, ascending — the snapshot history that
    * time travel navigates. */
  def versions: Seq[Long] =
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq
      .map(_.getPath.getName).filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toLong)
      .sorted

  def read(): Option[DataFrame] =
    latestVersion.map(v => spark.read.parquet(s"$dir/v=$v"))

  /** Time travel by version (the Paimon/Iceberg `VERSION AS OF`
    * feature): read snapshot `version` exactly; None if it was never
    * committed or has been [[expire]]d. */
  def read(version: Long): Option[DataFrame] =
    if (versions.contains(version)) Some(spark.read.parquet(s"$dir/v=$version"))
    else None

  /** Commit wall-clock of a version (the directory's filesystem
    * mtime — stamped by the commit itself, no sidecar metadata). */
  def commitTimeMs(version: Long): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/v=$version")
    if (fs.exists(p)) Some(fs.getFileStatus(p).getModificationTime) else None
  }

  /** Time travel by timestamp (`TIMESTAMP AS OF`): the newest snapshot
    * committed at or before `timestampMs`; None if the store's history
    * starts later. */
  def readAsOf(timestampMs: Long): Option[DataFrame] =
    versions.reverse
      .find(v => commitTimeMs(v).exists(_ <= timestampMs))
      .map(v => spark.read.parquet(s"$dir/v=$v"))

  /** Commit a new version. Overwrite of an existing version (failure
    * replay) is idempotent by construction. */
  def write(df: DataFrame, version: Long): Unit =
    df.write.mode("overwrite").parquet(s"$dir/v=$version")

  /** Drop versions older than the newest `keep` (bounded storage; the
    * reference's Paimon snapshots expire the same way). */
  def expire(keep: Int = 2): Unit = latestVersion.foreach { latest =>
    fs.listStatus(base).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith("v=") &&
        p.getName.stripPrefix("v=").toLong <= latest - keep)
      .foreach(p => fs.delete(p, true))
  }

  /** Compaction (the Paimon/Iceberg small-files rewrite): re-commit the
    * current snapshot as a NEW version with `targetFiles` files —
    * readers keep snapshot isolation throughout (the old version stays
    * readable until [[expire]]), and a failure mid-compact leaves the
    * store untouched because the rewrite lands under the new version
    * directory only. No-op on an empty store. */
  def compact(targetFiles: Int = 1): Unit =
    latestVersion.foreach { v =>
      write(spark.read.parquet(s"$dir/v=$v").coalesce(targetFiles), v + 1)
    }
}

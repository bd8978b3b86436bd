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
/** Minimal read surface of a versioned table — what the change feed
  * and its streaming source need, implemented by BOTH versioned
  * layouts: the flat `v=<n>` directory store ([[StateStore]]) and the
  * partitioned manifest log
  * ([[graft.catalog.ManifestSnapshotReads]]). */
trait SnapshotReads {
  /** Retained snapshot versions, ascending. */
  def versions: Seq[Long]
  def latestVersion: Option[Long] = versions.lastOption
  /** Snapshot `version` as a DataFrame; None if never committed or
    * expired. */
  def read(version: Long): Option[DataFrame]
  /** The snapshot `version` was committed AGAINST, when the layout
    * records it (manifest logs do) — the change feed's exact diff
    * anchor, hole-proof under tag-pinned retention. None = unknown
    * (flat `v=<n>` stores, pre-parent manifests): the feed falls back
    * to the listing predecessor. */
  def parentOf(version: Long): Option[Long] = None
  /** Is `version` a provably CONTENT-IDENTICAL commit over its parent
    * (an `expire`/audit snapshot — added=removed=0 in its recorded
    * summary)? The change feed skips the full-table diff join for
    * these; false = unknown, derive normally. */
  def noopCommit(version: Long): Boolean = false
  /** Is snapshot `version` provably EMPTY (zero data files) from
    * metadata alone? A diff AGAINST an empty state is the initial-load
    * shape (every row of the other side as an insert), so the change
    * feed can emit the resolved read directly — no diff join, no key
    * shuffle. false = unknown, derive normally. */
  def emptyVersion(version: Long): Boolean = false
  /** The snapshot ROW schema, preferably without data IO (manifest
    * logs hold the declared schema as metadata; the flat store falls
    * back to reading its earliest snapshot's parquet footer). */
  def rowSchema: org.apache.spark.sql.types.StructType =
    read(versions.headOption.getOrElse(throw new IllegalArgumentException(
      "no committed snapshots to derive a schema from"))).get.schema
  /** Version `ver`'s feed served from PERSISTED changelog files
    * ([[graft.catalog.ChangelogProducer]] — tables declaring
    * `'changelog-producer'='input'`), producing them on first read.
    * None = no persisted form (derive the diff as usual). */
  def persistedFeed(ver: Long, keys: Seq[String],
                    row: org.apache.spark.sql.types.StructType)
      : Option[DataFrame] = None
  /** ONE-PASS diff `from → to` when the layout can prove the shape
    * (manifest tables whose commit was purely additive —
    * [[graft.catalog.PkTables.versionDiff]] for PK tables,
    * [[graft.catalog.MorDeletes.versionDiffMor]] for plain
    * merge-on-read tables, keyed by the caller's `keys` identity):
    * `op, before, after` rows, one scan + one key shuffle instead of
    * two snapshot resolutions + a full-outer join. None = not
    * provable; the caller derives via the audited two-snapshot
    * diff. */
  def fastDiff(from: Long, to: Long, keys: Seq[String])
      : Option[DataFrame] = None
}

final class StateStore(spark: SparkSession, dir: String)
    extends SnapshotReads {
  private val fs = org.apache.hadoop.fs.FileSystem.get(
    new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
  private val base = new org.apache.hadoop.fs.Path(dir)

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

  /** Commit wall-clock of a version: the explicit timestamp the commit
    * stamped into the version's `_graft_commit` manifest. Filesystem
    * mtime is only the LEGACY fallback (pre-manifest stores): mtime is
    * an attribute of the copy, not the commit — a rsync'd/restored
    * lake or a touched directory silently shifts it, while the
    * manifest's content travels with the data. */
  def commitTimeMs(version: Long): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/v=$version")
    if (!fs.exists(p)) None
    else {
      val m = new org.apache.hadoop.fs.Path(p, StateStore.CommitManifest)
      val manifestText =
        if (fs.exists(m)) {
          val in = fs.open(m)
          try Some(new String(in.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8))
          finally in.close()
        } else None
      Some(StateStore.resolveCommitMs(manifestText,
        fs.getFileStatus(p).getModificationTime))
    }
  }

  /** Time travel by timestamp (`TIMESTAMP AS OF`): the newest snapshot
    * committed at or before `timestampMs`; None if the store's history
    * starts later. */
  def readAsOf(timestampMs: Long): Option[DataFrame] =
    versions.reverse
      .find(v => commitTimeMs(v).exists(_ <= timestampMs))
      .map(v => spark.read.parquet(s"$dir/v=$v"))

  /** Commit a new version. Overwrite of an existing version (failure
    * replay) is idempotent by construction — the replayed commit
    * re-stamps the manifest, so commit time is always that of the LAST
    * successful commit of the version. The manifest lands after the
    * data (a crash between the two leaves a version readable with the
    * mtime fallback, never a stamped-but-absent snapshot), underscore-
    * prefixed so Spark's hidden-file filter keeps it out of scans.
    * Line 2 records the PARENT (the newest version strictly below this
    * one at commit time, this version's own prior parent on an
    * idempotent replay) — the change feed's exact diff anchor, so a
    * tag-pinned retention hole fails loudly on flat stores exactly
    * like it does on manifest logs. */
  def write(df: DataFrame, version: Long): Unit = {
    // resolve the anchor BEFORE the data write creates v=<version>:
    // replay keeps its original parent, a fresh commit anchors to the
    // newest retained predecessor
    val parent = parentOf(version)
      .orElse(versions.filter(_ < version).lastOption)
    df.write.mode("overwrite").parquet(s"$dir/v=$version")
    val m = new org.apache.hadoop.fs.Path(s"$dir/v=$version/${StateStore.CommitManifest}")
    val out = fs.create(m, true)
    try out.write((String.valueOf(System.currentTimeMillis()) +
      parent.fold("")(p => s"\nparent=$p"))
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The recorded commit anchor of `version` (None: pre-parent
    * manifests, mtime-fallback stores, or the store's first commit). */
  override def parentOf(version: Long): Option[Long] = {
    val m = new org.apache.hadoop.fs.Path(
      s"$dir/v=$version/${StateStore.CommitManifest}")
    if (!fs.exists(m)) None
    else {
      val in = fs.open(m)
      val text = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      text.linesIterator.find(_.startsWith("parent="))
        .flatMap(_.stripPrefix("parent=").trim.toLongOption)
    }
  }

  /** Drop versions older than the newest `keep` (bounded storage; the
    * reference's Paimon snapshots expire the same way). */
  def expire(keep: Int = 2): Unit = expire(keep, Set.empty)

  /** [[expire]] with a pinned set: versions in `pinned` (snapshot
    * tags — the Iceberg retention contract) survive regardless of
    * age. `keep ≥ 1` — keep=0 would delete the LATEST snapshot and
    * leave a table with history markers but no current content. */
  def expire(keep: Int, pinned: Set[Long]): Unit = {
    require(keep >= 1, s"expire: keep must be >= 1, got $keep")
    latestVersion.foreach { latest =>
      fs.listStatus(base).toSeq.map(_.getPath)
        .filter { p =>
          p.getName.startsWith("v=") && {
            val v = p.getName.stripPrefix("v=").toLong
            v <= latest - keep && !pinned.contains(v)
          }
        }
        .foreach(p => fs.delete(p, true))
    }
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

  /** Compliance delete ("right to be forgotten"): remove every row
    * with `keyCol` in `keys` from EVERY retained snapshot — unlike an
    * ordinary delete-and-commit, this pierces time travel on purpose
    * (a deleted subject must not be readable via `VERSION AS OF`
    * either; the Delta/Iceberg equivalent is rewriting history files
    * before a VACUUM). Version numbering and each snapshot's stamped
    * commit time are PRESERVED (the purge rewrites data, not history
    * shape), so `readAsOf` resolution is unchanged.
    *
    * Each version rewrites through a sibling temp directory + rename —
    * a crash mid-purge leaves that version either whole or fully
    * rewritten, never torn. Returns the number of rows removed across
    * versions. */
  def purgeKeys(keyCol: String, keys: Seq[Any]): Long = {
    import org.apache.spark.sql.functions.col
    var removed = 0L
    versions.foreach { v =>
      val path = s"$dir/v=$v"
      val before = spark.read.parquet(path)
      val keep = before.filter(!col(keyCol).isin(keys: _*))
      val n = before.count() - keep.count()
      if (n > 0) {
        val stamp = commitTimeMs(v)
        val parent = parentOf(v) // survives the re-stamp below
        val tmp = new org.apache.hadoop.fs.Path(s"$dir/.purge_v=$v")
        fs.delete(tmp, true)
        keep.write.mode("overwrite").parquet(tmp.toString)
        val dst = new org.apache.hadoop.fs.Path(path)
        fs.delete(dst, true)
        fs.rename(tmp, dst)
        // restore the ORIGINAL commit stamp: the purge is not a commit
        stamp.foreach { ms =>
          val m = new org.apache.hadoop.fs.Path(dst, StateStore.CommitManifest)
          val out = fs.create(m, true)
          try out.write((String.valueOf(ms) +
            parent.fold("")(p => s"\nparent=$p"))
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
        }
        removed += n
      }
    }
    removed
  }
}

object StateStore {
  /** Per-version commit-timestamp manifest (epoch ms, plain text),
    * written inside `v=<n>/` so it expires and renames with its
    * snapshot. Shared with [[graft.catalog.GraftLakeCatalog]]'s
    * `TIMESTAMP AS OF` resolution, so SQL text and the Scala
    * [[StateStore#readAsOf]] consult the same clock. */
  val CommitManifest = "_graft_commit"

  /** THE commit clock, in one place: a stamped manifest's millis win;
    * directory mtime is only the legacy fallback (pre-manifest
    * stores). Both the Scala path ([[StateStore#commitTimeMs]]) and
    * the SQL catalog path (`GraftLakeCatalog.commitMsOf`) MUST
    * resolve through this helper — a second hand-rolled copy of the
    * parse/fallback policy is how `TIMESTAMP AS OF` via SQL silently
    * diverges from `readAsOf`. */
  def resolveCommitMs(manifestText: Option[String], dirMtimeMs: => Long): Long =
    // FIRST line only: line 2+ carries the parent pointer
    manifestText.flatMap(_.trim.linesIterator.nextOption())
      .flatMap(_.trim.toLongOption).getOrElse(dirMtimeMs)
}

package graft.catalog

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** [[graft.streaming.SnapshotReads]] over a MANIFEST-versioned
  * partitioned lake table: versions are the `_graft_snapshots/s-<n>`
  * manifests, `read(v)` loads exactly that snapshot's file list (with
  * identity partition values restored via basePath inference and the
  * hidden bucket level dropped), in the declared logical column order.
  * This is what lets the change-feed streaming source
  * ([[org.apache.spark.sql.graft.ChangeFeedSourceProvider]]) tail the
  * partitioned lake layout exactly like the flat `v=<n>` one. */
final class ManifestSnapshotReads(spark: SparkSession, tableDir: Path,
                                  branch: Option[String] = None)
    extends graft.streaming.SnapshotReads {

  require(Snapshots.isVersioned(tableDir),
    s"$tableDir is not a manifest-versioned table")
  branch.foreach(b => require(Snapshots.branchExists(tableDir, b),
    s"$tableDir has no branch '$b' " +
      s"(branches: ${Snapshots.branches(tableDir).mkString(",")})"))

  private val logical: org.apache.spark.sql.types.StructType = {
    val sidecar = tableDir.resolve("_graft_schema.json")
    require(Files.exists(sidecar),
      s"$tableDir has no declared schema sidecar — corrupt table dir")
    org.apache.spark.sql.types.DataType.fromJson(Files.readString(sidecar))
      .asInstanceOf[org.apache.spark.sql.types.StructType]
  }

  private val bucketed: Boolean =
    PartitionSpec.read(tableDir).exists(_.isInstanceOf[PartitionSpec.Bucket])

  // rename evolution: files speak the PHYSICAL names; read with those,
  // alias back to logical (partition columns are never renamed)
  private val renames: Map[String, String] = Evolutions.renames(tableDir)

  // main-log or branch-sub-log views of the same machinery (the
  // branch feed is the WAP audit-as-a-stream surface)
  private def versionsOf: Seq[Long] = branch match {
    case Some(b) => Snapshots.branchVersions(tableDir, b)
    case None => Snapshots.versions(tableDir)
  }
  private def metaOf(v: Long): Option[Snapshots.Snapshot] = branch match {
    case Some(b) => Snapshots.readBranchMeta(tableDir, b, v)
    case None => Snapshots.readMeta(tableDir, v)
  }
  private def snapOf(v: Long): Option[Snapshots.Snapshot] = branch match {
    case Some(b) => Snapshots.readBranch(tableDir, b, v)
    case None => Snapshots.read(tableDir, v)
  }

  override def versions: Seq[Long] = versionsOf

  override def parentOf(version: Long): Option[Long] =
    metaOf(version).flatMap(_.parent)

  /** Audit commits (expire, branch forks) record added=removed=0:
    * provably content-identical — the feed can skip their diff join.
    * (A branch's b-0 fork has parent None, so it still emits as the
    * initial load.) */
  override def noopCommit(version: Long): Boolean =
    metaOf(version).exists(s =>
      s.summary.get("added-data-files").contains(0L) &&
        s.summary.get("removed-data-files").contains(0L) &&
        // a merge-on-read delete commit adds ONLY delete files — it
        // is content-changing (its rows retract in the feed); same
        // for a PK table's equality-delete commits
        s.summary.getOrElse("added-delete-files", 0L) == 0L &&
        s.summary.getOrElse("removed-delete-files", 0L) == 0L &&
        s.summary.getOrElse("added-eqdelete-files", 0L) == 0L &&
        s.summary.getOrElse("removed-eqdelete-files", 0L) == 0L &&
        s.parent.isDefined)

  /** Zero DATA files in the snapshot — provably empty content from
    * the manifest alone (delete/eq-delete files cannot create rows). */
  override def emptyVersion(version: Long): Boolean =
    snapOf(version).exists(s => Snapshots.dataFiles(s.files).isEmpty)

  /** The declared logical schema — zero data IO. */
  override def rowSchema: org.apache.spark.sql.types.StructType = logical

  // PRIMARY-KEY tables resolve latest-per-key in read(v), so every
  // consumer of this surface — the streaming change-feed source, the
  // batch tableChanges range, the incremental MV fold — sees the
  // RESOLVED changelog (Paimon's changelog-producer semantics): a
  // version's feed diffs the resolved states, never the raw appends
  // (which would expose every shadowed key version).
  private lazy val pkDef: Option[PkTables.PkDef] = PkTables.read(tableDir)

  /** Persisted changelog files ([[ChangelogProducer]]) — MAIN-log
    * reads of tables declaring `'changelog-producer'='input'` serve
    * (and on first read produce) the memoized per-version feed;
    * branch feeds and undeclared tables derive as usual. */
  override def persistedFeed(ver: Long, keys: Seq[String],
                             row: org.apache.spark.sql.types.StructType)
      : Option[DataFrame] =
    if (branch.nonEmpty || !pkDef.exists(_.producesChangelog)) None
    else ChangelogProducer.serveOrProduce(spark, tableDir, ver, row,
      () => graft.streaming.ChangeFeed.versionFeed(this, ver, keys, row,
        persisted = false))

  /** ONE-PASS version diff ([[PkTables.versionDiff]] for PK tables,
    * [[MorDeletes.versionDiffMor]] under the caller's key identity
    * otherwise) — one scan + one key shuffle when the commit was
    * purely additive; None falls back to the two-snapshot diff
    * join. */
  override def fastDiff(from: Long, to: Long, keys: Seq[String])
      : Option[DataFrame] =
    (snapOf(from), snapOf(to)) match {
      case (Some(p), Some(v)) =>
        pkDef match {
          // the one-pass PK diff derives identity from pk.keys; a
          // caller diffing a PK table under a DIFFERENT key identity
          // (readTableChanges / the stream source accept arbitrary
          // keys) must fall back to the two-snapshot diff, which
          // honors the caller's keys — otherwise a changed-key row
          // would emit 'u' where the caller-keyed diff emits 'd'+'c'
          case Some(pk) if keys.toSet == pk.keys.toSet =>
            PkTables.versionDiff(spark, tableDir, p, v, pk, logical,
              renames)
          case Some(_) => None
          case None =>
            MorDeletes.versionDiffMor(spark, tableDir, p, v, keys,
              logical, renames)
        }
      case _ => None
    }

  override def read(version: Long): Option[DataFrame] =
    snapOf(version).map { s =>
      if (s.files.isEmpty)
        spark.createDataFrame(
          java.util.List.of[org.apache.spark.sql.Row](), logical)
      else {
        import org.apache.spark.sql.functions.col
        // the shared live-row read ([[MorDeletes.liveRows]]): per-
        // spec-shape union with the explicit physical schema (one
        // parquet read cannot mix directory shapes; inference-typed
        // dir values could coerce across the union), merge-on-read
        // delete files anti-joined away — so the feed diffs LIVE rows
        // per version, and a MoR delete commit emits its rows as
        // retractions like any other delete. PK tables read RESOLVED
        // ([[PkTables.resolvedRows]] — equality deletes applied,
        // latest version per key).
        val raw = pkDef match {
          case Some(pk) => PkTables.resolvedRows(spark, tableDir, s, pk)
          case None => MorDeletes.liveRows(spark, tableDir, s.files)
        }
        val unbucketed =
          if (bucketed) raw.drop(PartitionSpec.BucketDir) else raw
        // ALWAYS project to logical order, rename evolution or not:
        // Spark places partition columns last regardless of the read
        // schema, so after add_partition_field promotes a non-trailing
        // data column the physical order differs per snapshot — and
        // the change-feed source unions versions POSITIONALLY
        unbucketed.select(logical.fields.map(f =>
          col(renames.getOrElse(f.name, f.name)).as(f.name)): _*)
      }
    }
}

object ManifestSnapshotReads {
  /** Whether `dir` is a manifest-versioned partitioned table. */
  def isManifestVersioned(dir: String): Boolean =
    Snapshots.isVersioned(Paths.get(dir))

  def apply(spark: SparkSession, dir: String,
            branch: Option[String] = None): ManifestSnapshotReads =
    new ManifestSnapshotReads(spark, Paths.get(dir), branch)
}

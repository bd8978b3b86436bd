package graft.catalog

import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths}

import scala.jdk.CollectionConverters._

/** A concurrent committer lost the optimistic-concurrency race and the
  * operation's read set changed underneath it (or the retry budget ran
  * out). The operation is safe to re-run: nothing was published. */
final class CommitConflictException(msg: String)
    extends RuntimeException(msg)

/** Manifest-file snapshot log for PARTITIONED lake tables — the
  * Iceberg/Paimon model where a snapshot is a LIST OF DATA FILES, not
  * a directory (reference lake tier: Paimon/Iceberg,
  * `flink-cdc/Dockerfile:8-9`; tiering opt-in
  * `flink-cdc/sql/tickets-cdc.sql:35-36`). The flat-table `v=<n>`
  * directory layout cannot compose with `col=value` partition
  * directories, so versioned partitioned tables decouple versioning
  * from layout:
  *
  *  - data files land in the ordinary hive `col=value` /
  *    `_gbucket=<id>` directories and are IMMUTABLE once committed;
  *  - each commit writes `_graft_snapshots/s-<n>.json` — the
  *    table-relative paths of the files that ARE version `n`, the
  *    commit wall-clock, the operation that produced it with a
  *    files-added/removed summary, and (once the table has been
  *    `analyze`d) the per-file min/max/count stats of its live files,
  *    commit-atomic with the file list itself — so `VERSION AS OF`
  *    scans file-skip and metadata-only aggregates serve ANY retained
  *    snapshot, not just the latest (the Iceberg stats-in-manifest
  *    model);
  *  - the CURRENT table reads the latest manifest's files; `VERSION /
  *    TIMESTAMP AS OF` reads an older manifest; overwritten/deleted
  *    files stay on disk (readable by older snapshots) until
  *    `expire_snapshots` drops the manifests that reference them and
  *    garbage-collects the unreferenced files.
  *
  * Presence of the `_graft_snapshots/` directory is what flips a
  * partitioned table into snapshot semantics (created by `CREATE TABLE
  * ... TBLPROPERTIES ('versioned'='true')`).
  *
  * MULTI-WRITER safety (the reference architecture runs a per-table
  * CDC job AND a tiering/compaction service against the same tables,
  * `deploy:296-311` vs `deploy:318-358`): commits use optimistic
  * concurrency. A committer reads the latest manifest, derives its new
  * file list FROM that base, and publishes `s-(base+1)` with atomic
  * create-if-absent semantics — two writers racing to the same version
  * number produce exactly one winner; the loser re-reads the new
  * latest, re-derives, re-validates its read set (copy-on-write
  * rewrites fail with [[CommitConflictException]] when the files they
  * read changed underneath them — never a silent lost update), and
  * retries. Atomic create-if-absent is a hard link on a POSIX
  * filesystem (`Files.createLink` fails atomically when the target
  * exists — rename() would silently replace); an object-store
  * deployment swaps in a conditional PUT (`If-None-Match: *`). */
private[catalog] object Snapshots {

  val DirName = "_graft_snapshots"
  val Property = "versioned"

  /** Optimistic retry budget: how many times one commit re-derives
    * against a refreshed latest before giving up. Losers back off with
    * jitter (below) so a herd of committers doesn't lock-step into the
    * same next version number until the budget burns out. */
  private val MaxAttempts = 20

  /** `parent` is the snapshot this one was committed AGAINST (None for
    * the initial snapshot and pre-parent manifests): the change feed
    * diffs a version against its RECORDED parent, so a retention hole
    * (expire keeping a pinned older snapshot but dropping the middle)
    * is detected instead of silently diffing against the wrong
    * predecessor. `operation`/`summary` record WHAT produced the
    * snapshot (append/overwrite/delete/rewrite/compact/…) — the audit
    * surface Iceberg exposes per snapshot. `stats` is the commit-atomic
    * per-file min/max/count block (empty until the table is analyzed;
    * keyed by file BASENAME — per-write UUID names make those unique). */
  final case class Snapshot(version: Long, commitMs: Long,
                            files: Seq[String], parent: Option[Long] = None,
                            operation: String = "",
                            summary: Map[String, Long] = Map.empty,
                            stats: Map[String, FileStats.FileStat] = Map.empty)

  private def dir(tableDir: Path): Path = tableDir.resolve(DirName)

  private def manifest(tableDir: Path, v: Long): Path =
    dir(tableDir).resolve(s"s-$v.json")

  def isVersioned(tableDir: Path): Boolean = Files.isDirectory(dir(tableDir))

  /** Create the snapshot log with the empty initial snapshot `s-0`
    * (an empty versioned table is version 0 and readable). */
  def init(tableDir: Path): Unit = {
    Files.createDirectories(dir(tableDir))
    if (!tryPublish(tableDir,
        Snapshot(0L, System.currentTimeMillis(), Seq.empty,
          operation = "create",
          summary = Map("added-data-files" -> 0L,
            "removed-data-files" -> 0L, "total-data-files" -> 0L))))
      throw new CommitConflictException(
        s"$tableDir: snapshot log already initialized (concurrent CREATE)")
  }

  /** Retained snapshot versions, ascending. */
  def versions(tableDir: Path): Seq[Long] = {
    val d = dir(tableDir)
    if (!Files.isDirectory(d)) Seq.empty
    else {
      val s = Files.list(d)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.startsWith("s-") && n.endsWith(".json"))
        .flatMap(n => n.stripPrefix("s-").stripSuffix(".json").toLongOption)
        .toSeq.sorted
      finally s.close()
    }
  }

  def read(tableDir: Path, v: Long): Option[Snapshot] = {
    val f = manifest(tableDir, v)
    if (!Files.exists(f)) None
    else {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = om.readTree(Files.readString(f))
      Some(Snapshot(
        node.get("version").asLong(),
        node.get("commitMs").asLong(),
        Option(node.get("files")).toSeq
          .flatMap(_.elements().asScala.toSeq).map(_.asText()),
        Option(node.get("parent")).filterNot(_.isNull).map(_.asLong()),
        Option(node.get("operation")).fold("")(_.asText()),
        Option(node.get("summary")).fold(Map.empty[String, Long])(
          _.fields().asScala.map(e => e.getKey -> e.getValue.asLong()).toMap),
        Option(node.get("stats")).fold(Map.empty[String, FileStats.FileStat])(
          FileStats.statsFromNode)))
    }
  }

  def latest(tableDir: Path): Option[Snapshot] =
    versions(tableDir).lastOption.flatMap(read(tableDir, _))

  /** Optimistic-concurrency commit; returns the published version.
    *
    *  - `transform` maps the refreshed latest live-file list to the
    *    new one — re-derived on every retry, so a concurrent APPEND to
    *    an unrelated partition merges instead of being lost;
    *  - `validate` inspects the refreshed list FIRST and throws
    *    [[CommitConflictException]] when the operation's read set
    *    changed underneath it (copy-on-write rewrites pass
    *    [[validateReadSet]]; blind appends/overwrites pass nothing);
    *  - `freshStats` supplies commit-atomic per-file stats for the
    *    files this commit ADDS (by-name, evaluated at most once across
    *    retries; [[freshStatsFor]] is a cheap no-op while the table
    *    has never been analyzed). Carried live files keep their
    *    parent entries; dead files' entries drop with them. */
  def commit(tableDir: Path,
             operation: String,
             transform: Seq[String] => Seq[String],
             validate: Seq[String] => Unit = _ => (),
             freshStats: => Map[String, FileStats.FileStat] = Map.empty): Long = {
    lazy val fresh = freshStats // at most one evaluation across retries
    var attempt = 0
    while (true) {
      attempt += 1
      val prev = latest(tableDir)
      val prevFiles = prev.fold(Seq.empty[String])(_.files)
      validate(prevFiles)
      val files = transform(prevFiles)
      val keep = files.map(basename).toSet
      val stats = (prev.fold(Map.empty[String, FileStats.FileStat])(_.stats)
        ++ fresh).view.filterKeys(keep).toMap
      val added = files.diff(prevFiles).size.toLong
      val removed = prevFiles.diff(files).size.toLong
      val s = Snapshot(prev.fold(0L)(_.version + 1L),
        System.currentTimeMillis(), files, prev.map(_.version), operation,
        Map("added-data-files" -> added, "removed-data-files" -> removed,
          "total-data-files" -> files.size.toLong), stats)
      if (tryPublish(tableDir, s)) return s.version
      if (attempt >= MaxAttempts)
        throw new CommitConflictException(
          s"$tableDir: lost the commit race $MaxAttempts times " +
            s"(operation=$operation) — giving up; re-run the operation")
      // jittered linear backoff: desynchronize the losing herd
      Thread.sleep(
        java.util.concurrent.ThreadLocalRandom.current()
          .nextLong(1L, 5L * attempt))
    }
    -1L // unreachable
  }

  /** Blind set-the-file-list commit — rollback/restore semantics where
    * the new list is NOT derived from the concurrent state. */
  def commit(tableDir: Path, files: Seq[String]): Long =
    commit(tableDir, "overwrite", _ => files)

  /** Read-set validation for copy-on-write rewrites (snapshot
    * isolation, the Iceberg default): every file the rewrite READ at
    * its base must still be live in the refreshed latest — a
    * concurrent commit that removed or rewrote one of them conflicts
    * (merging our replacement would resurrect rows it deleted / drop
    * rows it added). Files appended concurrently were never read here
    * and merge cleanly. */
  def validateFilesLive(operation: String, readFiles: Seq[String])(
      current: Seq[String]): Unit = {
    val live = current.toSet
    val missing = readFiles.filterNot(live)
    if (missing.nonEmpty)
      throw new CommitConflictException(
        s"concurrent commit removed ${missing.size} file(s) this " +
          s"$operation read (e.g. ${missing.head}) — " +
          "re-run the operation against the new snapshot")
  }

  def delete(tableDir: Path, v: Long): Unit = {
    Files.deleteIfExists(manifest(tableDir, v)); ()
  }

  /** Every file referenced by ANY retained snapshot — the GC
    * reachability set for expire/vacuum. */
  def referencedFiles(tableDir: Path): Set[String] =
    versions(tableDir).flatMap(read(tableDir, _)).flatMap(_.files).toSet

  /** The distinct partition directories (table-relative) of a file
    * list — the manifest-derived replacement for a filesystem
    * leaf-directory listing. */
  def leafDirsOf(files: Seq[String]): Seq[Path] =
    files.flatMap(f => Option(Paths.get(f).getParent)).distinct

  /** The subset of `files` living under any of the given
    * (table-relative) partition directories. */
  def filesUnder(files: Seq[String], dirs: Seq[Path]): Seq[String] = {
    val set = dirs.map(_.toString).toSet
    files.filter(f => Option(Paths.get(f).getParent).exists(p => set(p.toString)))
  }

  def basename(f: String): String = Paths.get(f).getFileName.toString

  /** The per-file stats governing snapshot `s`: the manifest's
    * commit-atomic embedded block when present (exact for THAT
    * snapshot — the time-travel skipping source), else the
    * current-file-set sidecar (pre-analyze manifests, plain tables). */
  def statsOf(tableDir: Path, s: Snapshot): Map[String, FileStats.FileStat] =
    if (s.stats.nonEmpty) s.stats else FileStats.readFull(tableDir)

  /** A file's partition-directory SHAPE: the ordered column names of
    * its `name=value` path segments. Files written under different
    * partition specs (ADD PARTITION FIELD evolution) have different
    * shapes; one parquet scan cannot mix shapes (Spark's partition
    * inference rejects conflicting directory structures), so scans
    * group by shape and union. */
  def shapeOf(f: String): Seq[String] = {
    val parent = Paths.get(f).getParent
    if (parent == null) Seq.empty
    else parent.iterator().asScala.map(_.toString)
      .filter(_.contains('='))
      .map(s => s.substring(0, s.indexOf('='))).toSeq
  }

  /** Group a live-file list by partition-directory shape, stable
    * order (current-spec shape is whichever sorts with the most
    * segments last — callers mostly care whether there is ONE). */
  def groupByShape(files: Seq[String]): Seq[(Seq[String], Seq[String])] =
    files.groupBy(shapeOf).toSeq.sortBy(_._1.mkString("/"))

  /** Name of the materialized file-path column [[readCurrent]] frames
    * carry — `_metadata` does not survive a union, so per-group reads
    * pin it before unioning (the stats/Bloom builders key on it). */
  val FileCol = "_graft_file"

  /** The declared PHYSICAL read schema of a versioned table (logical
    * sidecar schema with rename evolution applied, plus the hidden
    * bucket column) — the explicit schema every live-file read must
    * pass so a promoted partition column types IDENTICALLY in every
    * shape group (directory inference could otherwise coerce, e.g.
    * `col=00123` to int, and a union would rewrite values). */
  def physicalReadSchema(tableDir: Path):
      org.apache.spark.sql.types.StructType = {
    val sidecar = tableDir.resolve("_graft_schema.json")
    require(Files.exists(sidecar),
      s"$tableDir has no declared schema sidecar — corrupt table dir")
    val logical = org.apache.spark.sql.types.DataType
      .fromJson(Files.readString(sidecar))
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val renames = Evolutions.renames(tableDir)
    val phys = org.apache.spark.sql.types.StructType(logical.fields.map(f =>
      f.copy(name = renames.getOrElse(f.name, f.name))))
    if (PartitionSpec.read(tableDir).exists(_.isInstanceOf[PartitionSpec.Bucket]))
      org.apache.spark.sql.types.StructType(phys.fields :+
        org.apache.spark.sql.types.StructField(PartitionSpec.BucketDir,
          org.apache.spark.sql.types.IntegerType, nullable = true))
    else phys
  }

  /** Read the given (table-relative) live files as one DataFrame in
    * PHYSICAL column names — per-shape parquet reads with the explicit
    * declared schema, unioned by name, `_graft_file` materialized
    * per group. The shared live-file read every stats/maintenance
    * path uses. */
  def readFiles(spark: org.apache.spark.sql.SparkSession, tableDir: Path,
                files: Seq[String]): org.apache.spark.sql.DataFrame = {
    val schema = physicalReadSchema(tableDir)
    groupByShape(files).map { case (_, fs) =>
      spark.read.option("basePath", tableDir.toString)
        .schema(schema)
        .parquet(fs.map(f => tableDir.resolve(f).toString): _*)
        .withColumn(FileCol,
          org.apache.spark.sql.functions.col("_metadata.file_path"))
    }.reduce(_ unionByName _)
  }

  /** Fresh per-file stats for the files a commit ADDS, over the
    * analyzed column set of the latest snapshot — reads ONLY the added
    * files; the empty map (no read at all) when the table has never
    * been analyzed or the added set is empty. Pass as a commit's
    * `freshStats` so DML keeps per-snapshot stats live (the Iceberg
    * writer-records-stats-inline model). */
  def freshStatsFor(spark: org.apache.spark.sql.SparkSession, tableDir: Path,
                    added: Seq[String]): Map[String, FileStats.FileStat] = {
    val cols = latest(tableDir).fold(Seq.empty[String])(
      _.stats.valuesIterator.flatMap(_.cols.keysIterator).toSeq.distinct.sorted)
    if (cols.isEmpty || added.isEmpty) Map.empty
    else FileStats.collectRanges(readFiles(spark, tableDir, added), cols)
  }

  /** The CURRENT (latest-manifest) live files of a versioned table as
    * one DataFrame in PHYSICAL column names. None when the table is
    * not manifest-versioned (callers fall back to the directory read);
    * Some(None) when its latest snapshot is empty. */
  def readCurrent(spark: org.apache.spark.sql.SparkSession,
                  tableDir: Path): Option[Option[org.apache.spark.sql.DataFrame]] =
    if (!isVersioned(tableDir)) None
    else Some(latest(tableDir).filter(_.files.nonEmpty)
      .map(s => readFiles(spark, tableDir, s.files)))

  /** One optimistic publish attempt: serialize, then hard-link into
    * place — atomic create-if-absent on POSIX (two writers racing to
    * the same version number: exactly one link succeeds). Returns
    * false when another writer already published this version. */
  private def tryPublish(tableDir: Path, s: Snapshot): Boolean = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    root.put("version", s.version)
    root.put("commitMs", s.commitMs)
    s.parent.foreach(p => root.put("parent", p))
    if (s.operation.nonEmpty) root.put("operation", s.operation)
    if (s.summary.nonEmpty) {
      val sm = root.putObject("summary")
      s.summary.toSeq.sortBy(_._1).foreach { case (k, v) => sm.put(k, v) }
    }
    val arr = root.putArray("files")
    s.files.sorted.foreach(arr.add)
    if (s.stats.nonEmpty) root.set("stats", FileStats.statsToNode(om, s.stats))
    val target = manifest(tableDir, s.version)
    // per-attempt unique temp name: concurrent losers must not clobber
    // each other's temp files either
    val tmp = target.resolveSibling(
      target.getFileName.toString + "." +
        java.util.UUID.randomUUID().toString.take(8) + ".tmp")
    Files.writeString(tmp, om.writeValueAsString(root))
    try { Files.createLink(target, tmp); true }
    catch { case _: FileAlreadyExistsException => false }
    finally { Files.deleteIfExists(tmp); () }
  }
}

package graft.catalog

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

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
  *    table-relative paths of the files that ARE version `n`, plus the
  *    commit wall-clock;
  *  - the CURRENT table reads the latest manifest's files; `VERSION /
  *    TIMESTAMP AS OF` reads an older manifest; overwritten/deleted
  *    files stay on disk (readable by older snapshots) until
  *    `expire_snapshots` drops the manifests that reference them and
  *    garbage-collects the unreferenced files.
  *
  * Presence of the `_graft_snapshots/` directory is what flips a
  * partitioned table into snapshot semantics (created by `CREATE TABLE
  * ... TBLPROPERTIES ('versioned'='true')`). Manifests are written
  * temp-file + atomic move, so readers never observe a torn manifest;
  * like the rest of the lake layout, the log assumes a single writer
  * (the reference's single Flink job per table). */
private[catalog] object Snapshots {

  val DirName = "_graft_snapshots"
  val Property = "versioned"

  /** `parent` is the snapshot this one was committed AGAINST (None for
    * the initial snapshot and pre-parent manifests): the change feed
    * diffs a version against its RECORDED parent, so a retention hole
    * (expire keeping a pinned older snapshot but dropping the middle)
    * is detected instead of silently diffing against the wrong
    * predecessor. */
  final case class Snapshot(version: Long, commitMs: Long,
                            files: Seq[String], parent: Option[Long] = None)

  private def dir(tableDir: Path): Path = tableDir.resolve(DirName)

  private def manifest(tableDir: Path, v: Long): Path =
    dir(tableDir).resolve(s"s-$v.json")

  def isVersioned(tableDir: Path): Boolean = Files.isDirectory(dir(tableDir))

  /** Create the snapshot log with the empty initial snapshot `s-0`
    * (an empty versioned table is version 0 and readable). */
  def init(tableDir: Path): Unit = {
    Files.createDirectories(dir(tableDir))
    write(tableDir, Snapshot(0L, System.currentTimeMillis(), Seq.empty))
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
        Option(node.get("parent")).filterNot(_.isNull).map(_.asLong())))
    }
  }

  def latest(tableDir: Path): Option[Snapshot] =
    versions(tableDir).lastOption.flatMap(read(tableDir, _))

  /** Commit a new snapshot with the given live-file list; returns its
    * version (latest + 1). The previous latest is recorded as the
    * snapshot's PARENT (the change-feed diff anchor). */
  def commit(tableDir: Path, files: Seq[String]): Long = {
    val prev = versions(tableDir).lastOption
    val v = prev.fold(0L)(_ + 1L)
    write(tableDir, Snapshot(v, System.currentTimeMillis(), files, prev))
    v
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

  /** The CURRENT (latest-manifest) live files of a versioned table as
    * one DataFrame in PHYSICAL column names — per-shape parquet reads
    * with the explicit declared schema, unioned by name (one read
    * cannot mix shapes, and inference-typed partition columns could
    * coerce across the union). None when the table is not
    * manifest-versioned (callers fall back to the directory read);
    * Some(None) when its latest snapshot is empty. */
  def readCurrent(spark: org.apache.spark.sql.SparkSession,
                  tableDir: Path): Option[Option[org.apache.spark.sql.DataFrame]] =
    if (!isVersioned(tableDir)) None
    else Some(latest(tableDir).filter(_.files.nonEmpty).map { s =>
      val schema = physicalReadSchema(tableDir)
      groupByShape(s.files).map { case (_, fs) =>
        spark.read.option("basePath", tableDir.toString)
          .schema(schema)
          .parquet(fs.map(f => tableDir.resolve(f).toString): _*)
          .withColumn(FileCol,
            org.apache.spark.sql.functions.col("_metadata.file_path"))
      }.reduce(_ unionByName _)
    })

  private def write(tableDir: Path, s: Snapshot): Unit = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    root.put("version", s.version)
    root.put("commitMs", s.commitMs)
    s.parent.foreach(p => root.put("parent", p))
    val arr = root.putArray("files")
    s.files.sorted.foreach(arr.add)
    val target = manifest(tableDir, s.version)
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.writeString(tmp, om.writeValueAsString(root))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    ()
  }
}

package graft.catalog

import java.nio.file.{Files, Path, Paths}
import java.util.Collections
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A Spark V2 catalog plugin over a parquet lake directory — the
  * engine's `CREATE CATALOG` equivalent (reference
  * `flink-cdc/sql/tickets-cdc.sql:11-14` `CREATE CATALOG fluss_catalog
  * WITH ('type'='fluss', ...)`; Paimon catalog in the generated
  * init-catalogs.sql).
  *
  * Spark-first shape: Flink's `CREATE CATALOG <name> WITH (...)` DDL
  * maps to configuration — `spark.sql.catalog.<name> =
  * graft.catalog.GraftLakeCatalog` plus `spark.sql.catalog.<name>.path
  * = <lakeRoot>` — after which `<name>.<db>.<table>` resolves anywhere
  * SQL does, cross-catalog joins included, with full parquet
  * pruning/pushdown (tables load through the same V2 ParquetTable the
  * built-in datasource uses).
  *
  * Layout contract: one subdirectory of the root per namespace
  * (database), one `<table>.parquet` file/dir per table. Namespace DDL
  * (CREATE/DROP NAMESPACE) and table drop/rename are filesystem moves;
  * writes land through the ordinary parquet writer against the table
  * location ([[Catalog.registerLakeTables]] covers the session-catalog
  * EXTERNAL-table path for flat scale dirs).
  */
class GraftLakeCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var root: Path = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Paths.get(Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog '$name' requires option spark.sql.catalog.$name.path")))
  }

  override def name(): String = catalogName

  private def nsDir(ns: Array[String]): Path = ns.toSeq match {
    case Seq(db) => root.resolve(db)
    case _ => throw new NoSuchNamespaceException(ns)
  }

  private def tablePath(ident: Identifier): Path =
    nsDir(ident.namespace).resolve(s"${ident.name}.parquet")

  /** Directory-stream helper: `Files.list`/`Files.walk` return streams
    * whose javadoc requires closing — materialize inside, close always
    * (leaked handles accumulate per catalog listing). */
  private def withDirStream[T](s: java.util.stream.Stream[Path])(
      f: Iterator[Path] => T): T =
    try f(s.iterator().asScala) finally s.close()

  // ---- SupportsNamespaces ----

  override def listNamespaces(): Array[Array[String]] =
    withDirStream(Files.list(root)) {
      _.filter(Files.isDirectory(_))
        .map(p => Array(p.getFileName.toString)).toArray
    }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && Files.isDirectory(nsDir(namespace))

  override def loadNamespaceMetadata(namespace: Array[String]): java.util.Map[String, String] =
    if (namespaceExists(namespace))
      Collections.singletonMap(SupportsNamespaces.PROP_LOCATION,
        nsDir(namespace).toString)
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
                               metadata: java.util.Map[String, String]): Unit = {
    Files.createDirectories(nsDir(namespace)); ()
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      s"$catalogName: namespace properties are fixed by the lake layout")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val dir = nsDir(namespace)
    if (!Files.isDirectory(dir)) false
    else {
      val tables = listTables(namespace)
      if (tables.nonEmpty && !cascade)
        throw new IllegalStateException(
          s"namespace ${namespace.mkString(".")} is not empty")
      tables.foreach(dropTable)
      Files.delete(dir)
      true
    }
  }

  // ---- TableCatalog ----

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = nsDir(namespace)
    if (!Files.isDirectory(dir)) throw new NoSuchNamespaceException(namespace)
    withDirStream(Files.list(dir)) {
      _.filter(_.getFileName.toString.endsWith(".parquet"))
        .map(p => Identifier.of(namespace,
          p.getFileName.toString.stripSuffix(".parquet")))
        .toArray
    }
  }

  /** Declared-schema sidecar inside the table directory. The leading
    * underscore keeps it out of Spark's data-file listing (metadata-
    * file convention, like `_SUCCESS`), and it travels with the
    * directory through rename/drop. Present → the table reads with the
    * declared schema (merge-on-read: parquet files missing a declared
    * column yield NULLs); absent → schema is inferred from the files,
    * the original layout contract. */
  private val SchemaSidecar = "_graft_schema.json"

  private def declaredSchema(p: Path): Option[org.apache.spark.sql.types.StructType] = {
    val sidecar = p.resolve(SchemaSidecar)
    if (Files.isDirectory(p) && Files.exists(sidecar))
      Some(org.apache.spark.sql.types.DataType.fromJson(Files.readString(sidecar))
        .asInstanceOf[org.apache.spark.sql.types.StructType])
    else None
  }

  /** Committed snapshot versions of a VERSIONED table directory (the
    * [[graft.streaming.StateStore]] `v=<n>/` layout), ascending; empty
    * for a plain parquet table. Presence of any `v=` subdirectory is
    * what flips a table into snapshot semantics — the default read
    * resolves the LATEST version (snapshot isolation), never the union
    * of all versions a naive recursive listing would produce. */
  private def versionsOf(p: Path): Seq[Long] =
    if (!Files.isDirectory(p)) Seq.empty
    else withDirStream(Files.list(p)) {
      _.filter(Files.isDirectory(_))
        .map(_.getFileName.toString)
        .filter(_.startsWith("v="))
        .flatMap(v => v.stripPrefix("v=").toLongOption)
        .toSeq.sorted
    }

  private def parquetTable(ident: Identifier, dataPath: Path,
                           schema: Option[org.apache.spark.sql.types.StructType]): Table =
    ParquetTable(ident.toString, SparkSession.active,
      CaseInsensitiveStringMap.empty(), Seq(dataPath.toString), schema,
      classOf[ParquetFileFormat])

  override def loadTable(ident: Identifier): Table = {
    val p = tablePath(ident)
    if (!Files.exists(p)) throw new NoSuchTableException(ident)
    val data = versionsOf(p).lastOption.fold(p)(v => p.resolve(s"v=$v"))
    parquetTable(ident, data, declaredSchema(p))
  }

  /** SQL-text time travel, version form: `SELECT … FROM cat.db.t
    * VERSION AS OF <n>` resolves here (Spark's TimeTravelSpec calls
    * this overload). Exactly the [[graft.streaming.StateStore]]
    * `read(version)` semantics, reachable from pure SQL — the surface
    * a sql-client user expects of a Paimon/Iceberg lake table. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val p = tablePath(ident)
    if (!Files.exists(p)) throw new NoSuchTableException(ident)
    val vs = versionsOf(p)
    if (vs.isEmpty) throw new UnsupportedOperationException(
      s"$catalogName: ${ident.toString} is not a versioned table (no v=<n> snapshots)")
    val v = version.toLongOption.getOrElse(throw new IllegalArgumentException(
      s"$catalogName: VERSION AS OF expects a numeric snapshot id, got '$version'"))
    if (!vs.contains(v)) throw new IllegalArgumentException(
      s"$catalogName: ${ident.toString} has no snapshot v=$v " +
        s"(committed: ${vs.mkString(",")} — older snapshots may have been expired)")
    parquetTable(ident, p.resolve(s"v=$v"), declaredSchema(p))
  }

  /** Commit wall-clock of a snapshot: the explicit epoch-ms stamp the
    * commit wrote into the version's `_graft_commit` manifest
    * ([[graft.streaming.StateStore.CommitManifest]]); directory mtime
    * only as the LEGACY fallback for pre-manifest stores — mtime is an
    * attribute of the copy, not the commit (a restored/rsync'd lake or
    * a touched `v=` directory shifts it silently), while the manifest's
    * content travels with the data. Same clock `StateStore.readAsOf`
    * consults, so SQL and Scala answers agree. */
  private def commitMsOf(p: Path, v: Long): Long = {
    val vdir = p.resolve(s"v=$v")
    val manifest = vdir.resolve(graft.streaming.StateStore.CommitManifest)
    // parse/fallback policy lives in ONE place (resolveCommitMs) so
    // the SQL clock cannot drift from the Scala readAsOf clock
    graft.streaming.StateStore.resolveCommitMs(
      if (Files.exists(manifest)) Some(Files.readString(manifest)) else None,
      Files.getLastModifiedTime(vdir).toMillis)
  }

  /** SQL-text time travel, timestamp form: `… TIMESTAMP AS OF <ts>`
    * (Spark passes MICROseconds). Resolves to the newest snapshot
    * committed at or before the timestamp, per [[commitMsOf]]. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val p = tablePath(ident)
    if (!Files.exists(p)) throw new NoSuchTableException(ident)
    val vs = versionsOf(p)
    if (vs.isEmpty) throw new UnsupportedOperationException(
      s"$catalogName: ${ident.toString} is not a versioned table (no v=<n> snapshots)")
    val tsMs = timestampMicros / 1000L
    val v = vs.reverse.find(v => commitMsOf(p, v) <= tsMs)
      .getOrElse(throw new IllegalArgumentException(
        s"$catalogName: ${ident.toString} has no snapshot at or before " +
          s"timestamp ${tsMs}ms (earliest commit: ${commitMsOf(p, vs.head)}ms)"))
    parquetTable(ident, p.resolve(s"v=$v"), declaredSchema(p))
  }

  /** CREATE TABLE / CTAS: the table is a (initially empty) parquet
    * directory at the lake-layout location; the returned V2 ParquetTable
    * is SupportsWrite, so `CREATE TABLE cat.db.t AS SELECT …` and
    * `INSERT INTO cat.db.t` land part files through the ordinary
    * distributed parquet writer (no driver materialization). The
    * declared schema rides along explicitly — an empty directory has
    * nothing to infer from until the CTAS write commits. */
  override def createTable(ident: Identifier,
                           schema: org.apache.spark.sql.types.StructType,
                           partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
                           properties: java.util.Map[String, String]): Table = {
    if (partitions.nonEmpty)
      throw new UnsupportedOperationException(
        s"$catalogName: partitioned lake tables are not supported (layout is one parquet dir per table)")
    val p = tablePath(ident)
    if (Files.exists(p))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        (ident.namespace :+ ident.name).toSeq)
    if (!Files.isDirectory(p.getParent)) throw new NoSuchNamespaceException(ident.namespace)
    Files.createDirectories(p)
    // persist the declared schema: an empty table has nothing to infer
    // from, and ADD COLUMN evolution rewrites this sidecar later
    Files.writeString(p.resolve(SchemaSidecar), schema.json)
    ParquetTable(ident.toString, SparkSession.active,
      CaseInsensitiveStringMap.empty(), Seq(p.toString), Some(schema),
      classOf[ParquetFileFormat])
  }

  override def dropTable(ident: Identifier): Boolean = {
    val p = tablePath(ident)
    if (!Files.exists(p)) false
    else {
      // a parquet "table" may be a single file or a directory of parts
      if (Files.isDirectory(p))
        withDirStream(Files.walk(p))(_.toSeq.reverse.foreach(Files.delete))
      else Files.delete(p)
      true
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = tablePath(oldIdent)
    if (!Files.exists(from)) throw new NoSuchTableException(oldIdent)
    Files.move(from, tablePath(newIdent)); ()
  }

  /** Additive schema evolution only: `ALTER TABLE … ADD COLUMN` rewrites
    * the table's declared read schema (the sidecar); existing parquet
    * files are untouched and read the new column as NULL (merge-on-read,
    * the same read-side semantics `RecoverySpec` pins for evolved
    * snapshots). Everything else — renames, drops, type changes,
    * property changes — stays an explicit unsupported error: those
    * require rewriting data files, which the lake layout declares
    * immutable. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val p = tablePath(ident)
    if (!Files.exists(p)) throw new NoSuchTableException(ident)
    if (!Files.isDirectory(p))
      throw new UnsupportedOperationException(
        s"$catalogName: single-file tables cannot carry a schema sidecar; " +
          "only directory tables support ADD COLUMN")
    val adds = changes.map {
      case a: TableChange.AddColumn => a
      case other => throw new UnsupportedOperationException(
        s"$catalogName: only additive ADD COLUMN evolution is supported " +
          s"(got ${other.getClass.getSimpleName}; data files are immutable)")
    }
    val current = declaredSchema(p).getOrElse(
      loadTable(ident).asInstanceOf[ParquetTable].schema)
    val evolved = adds.foldLeft(current) { (s, a) =>
      if (a.fieldNames.length != 1)
        throw new UnsupportedOperationException(
          s"$catalogName: nested ADD COLUMN is not supported")
      if (!a.isNullable)
        throw new UnsupportedOperationException(
          s"$catalogName: added columns must be nullable " +
            "(pre-evolution rows read as NULL)")
      if (s.fieldNames.exists(_.equalsIgnoreCase(a.fieldNames.head)))
        throw new IllegalArgumentException(
          s"$catalogName: column ${a.fieldNames.head} already exists")
      s.add(a.fieldNames.head, a.dataType, nullable = true)
    }
    Files.writeString(p.resolve(SchemaSidecar), evolved.json)
    loadTable(ident)
  }
}

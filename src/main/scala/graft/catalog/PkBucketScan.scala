package graft.catalog

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, JoinedRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, SupportsReportPartitioning}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** BUCKET-LOCAL (exchange-free) primary-key resolution — the Paimon
  * per-bucket merge read. PK tables REQUIRE their partition transforms
  * ⊆ key, so every version of a key is co-located in ONE `_gbucket=`
  * directory; resolving latest-per-key therefore never needs a
  * table-wide shuffle — each bucket resolves locally. The reference's
  * staging tables are read CONTINUOUSLY by the revenue MV join
  * (reference `flink-cdc/sql/revenue-analytics.sql:62-63` over the
  * `'bucket.num'='4'` tables of `tickets-cdc.sql:23-37`), so the
  * dirty-read cost IS the steady-state cost between compactions — at
  * 100 TB the difference between "shuffle the table" and "no exchange
  * at all".
  *
  * Mechanics: a V2 scan with ONE `HasPartitionKey` input partition per
  * bucket directory, reporting `KeyGroupedPartitioning(bucket(n, key))`
  * through the same catalog `bucket` function the SPJ machinery uses
  * ([[GraftFunctions]] — the writer-identical `pmod(murmur3(k, 42),
  * n)`). The dedup aggregate's `ClusteredDistribution(key)` is then
  * already satisfied: NO shuffle Exchange plans between the scan and
  * the aggregate (and the resolved output keeps the key-grouped
  * partitioning, so a downstream bucket-key join or aggregate skips
  * its exchange too). Each partition reads its bucket's parquet files
  * through Spark's own V2 parquet reader with NATIVE row-index
  * generation (the same source `_metadata.row_index` taps), appending
  * the file's table-relative path and manifest birth sequence as
  * constants — byte-identical coordinates to the V1 coordinate read,
  * so the `(seq, file, pos)` resolution ladder is deterministic across
  * both paths.
  *
  * Pending EQUALITY deletes apply as a scan-local broadcast filter
  * ([[EqDeleteVectorKilled]] — key → max delete threshold; a delete at
  * sequence s kills strictly below s, so the per-key max reproduces
  * the union, the [[LakeProcedures]] `rewrite_eqdelete_files`
  * argument), sized by the same [[MorDeletes.VectorMaxConf]] ceiling
  * as position-delete vectors.
  *
  * Structural gates (anything else falls back to the audited
  * shuffled-aggregate plan, which is correct everywhere):
  * bucket-only partition spec, single directory shape, no key-only
  * pushdown conjuncts (a point lookup keeps its pruned+pushed plan —
  * its post-filter exchange is already tiny), no pending POSITION
  * deletes, eq-delete churn inside the vector ceiling. */
private[catalog] object PkBucketResolve {

  /** Kill switch (bench A/B; default on). */
  val EnabledConf = "graft.pk.bucket-local.enabled"

  /** One data file of one bucket: absolute path + size (for the full-
    * file read), the table-relative path (the coordinate/file-key
    * convention of the V1 read), and its manifest birth sequence —
    * resolved at PLANNING, so the executor needs no broadcast lookup. */
  final case class PkFile(absPath: String, size: Long, relPath: String,
                          seq: Long) extends Serializable

  final class BucketPartition(val id: Int, val files: Array[PkFile])
      extends InputPartition
      with org.apache.spark.sql.connector.read.HasPartitionKey {
    override def partitionKey(): InternalRow = InternalRow(id)
  }

  /** The exchange-free BASE plan for a dirty PK full-table read:
    * outputs `selCols ++ (pos, file, seq)` with equality deletes
    * already applied. None when any structural gate fails. */
  def tryBase(spark: SparkSession, tableDir: Path, tableName: String,
              snapFiles: Seq[String], seqs: Map[String, Long],
              spec: Seq[PartitionSpec.Field], selCols: Seq[String],
              eqDels: Seq[String], pk: PkTables.PkDef,
              snapStats: Map[String, FileStats.FileStat],
              delField: Option[StructField],
              table: org.apache.spark.sql.connector.catalog.Table,
              catalog: Option[org.apache.spark.sql.connector.catalog.CatalogPlugin])
      : Option[LogicalPlan] = {
    if (spark.conf.get(EnabledConf, "true") != "true") return None
    val bucket = spec match {
      case Seq(b: PartitionSpec.Bucket) => b
      case _ => return None
    }
    val funCatalog = catalog match {
      case Some(f: org.apache.spark.sql.connector.catalog.FunctionCatalog) =>
        f
      case _ => return None
    }
    val dataF = Snapshots.dataFiles(snapFiles)
    if (dataF.isEmpty) return None // slow path builds the empty frame
    val pat = ("^" + java.util.regex.Pattern.quote(
      PartitionSpec.BucketDir) + "=(\\d+)/[^/]+$").r
    val byBucket = scala.collection.mutable.Map
      .empty[Int, scala.collection.mutable.ArrayBuffer[PkFile]]
    dataF.foreach { f =>
      f match {
        case pat(id) =>
          val abs = tableDir.resolve(f)
          byBucket.getOrElseUpdate(id.toInt,
            scala.collection.mutable.ArrayBuffer.empty) +=
            PkFile(abs.toString, Files.size(abs), f,
              seqs.getOrElse(Snapshots.basename(f), 0L))
        case _ => return None // evolved/foreign shape
      }
    }
    val phys = Snapshots.physicalReadSchema(tableDir)
    if (!selCols.forall(c => phys.fieldNames.contains(c))) return None
    if (!phys.fieldNames.contains(bucket.col)) return None
    // equality deletes → bounded broadcast vector, or bail
    val keySchema = PkTables.keyFileSchema(tableDir, pk.keys)
    val eqVec =
      if (eqDels.isEmpty) None
      else eqVectorFor(spark, tableDir, eqDels, keySchema, seqs,
          delField) match {
        case None => return None // over ceiling: keep the join plan
        case some => some
      }

    val selFields = selCols.map(c => phys(phys.fieldIndex(c)))
    val readDataSchema = StructType(selFields :+
      org.apache.spark.sql.GraftReadBridge.RowIndexTempField)
    val outSchema = StructType(selFields :+
      StructField(MorDeletes.PosKeyCol, LongType, nullable = false) :+
      StructField(MorDeletes.FileKeyCol, StringType, nullable = false) :+
      StructField(PkTables.SeqCol, LongType, nullable = false))
    val factory = org.apache.spark.sql.GraftReadBridge
      .parquetReaderFactory(spark, phys, readDataSchema)
    val buckets = byBucket.toSeq.sortBy(_._1)
      .map { case (id, fs) => (id, fs.sortBy(_.relPath).toArray) }
    val rowsUpper = {
      val perFile = dataF.map(f =>
        snapStats.get(Snapshots.basename(f)).flatMap(_.rows))
      if (perFile.forall(_.isDefined)) Some(perFile.flatten.sum) else None
    }
    val scan = new PkBucketResolveScan(tableName, outSchema, buckets,
      factory, bucket, rowsUpper)
    val output = org.apache.spark.sql.GraftReadBridge.toAttributes(outSchema)
    // the same catalyst transform the SPJ rule would stamp: resolved
    // through the catalog's own bucket function, against this output
    val rel0 = org.apache.spark.sql.GraftReadBridge.scanRelation(
      table, catalog, scan, output, None)
    val transform = org.apache.spark.sql.GraftReadBridge.toCatalystTransform(
      Expressions.bucket(bucket.n, bucket.col), rel0, funCatalog)
    val rel = transform.fold(rel0: LogicalPlan)(t =>
      rel0.copy(keyGroupedPartitioning = Some(Seq(t))))
    Some(eqVec.fold(rel) { case (keyTypes, bc) =>
      val byName = output.map(a => a.name -> a).toMap
      val keyStruct = org.apache.spark.sql.catalyst.expressions
        .CreateStruct(keySchema.fieldNames.map(byName(_)).toSeq)
      org.apache.spark.sql.catalyst.plans.logical.Filter(
        org.apache.spark.sql.catalyst.expressions.Not(
          EqDeleteVectorKilled(bc, keyTypes, keyStruct,
            byName(PkTables.SeqCol),
            delField.map(f => byName(f.name)))), rel)
    })
  }

  /** The scan-local equality-delete filter over an ALREADY-BUILT data
    * plan (the V1 coordinate read of the audited fallback path) —
    * point lookups and other pushed-read shapes then apply their
    * (bucket-pruned) eq churn as a broadcast vector instead of a join
    * operator, exactly like position-delete vectors. None when the
    * churn exceeds the shared ceiling (callers keep the anti-join). */
  def eqVectorFilter(spark: SparkSession, tableDir: Path,
                     eqDels: Seq[String], keySchema: StructType,
                     seqs: Map[String, Long],
                     delField: Option[StructField],
                     attrOf: String => org.apache.spark.sql.catalyst
                       .expressions.Attribute)
      : Option[Expression] =
    eqVectorFor(spark, tableDir, eqDels, keySchema, seqs, delField)
      .map { case (keyTypes, bc) =>
        org.apache.spark.sql.catalyst.expressions.Not(
          EqDeleteVectorKilled(bc, keyTypes,
            org.apache.spark.sql.catalyst.expressions.CreateStruct(
              keySchema.fieldNames.toSeq.map(attrOf)),
            attrOf(PkTables.SeqCol),
            delField.map(f => attrOf(f.name))))
      }

  // (appId, ceiling, tableDir, eq-file set) → per-key threshold
  // broadcast, None cached for over-ceiling sets — the vectorFor
  // caching model. Slots per key: (blind max seq | null, field value |
  // null, that field delete's seq | null) — the two delete families of
  // [[PkTables.eqKillCond]].
  private val eqVecCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String,
        Option[(Seq[DataType], org.apache.spark.broadcast.Broadcast[
          java.util.HashMap[UnsafeRow, Array[AnyRef]]])]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String,
            Option[(Seq[DataType], org.apache.spark.broadcast.Broadcast[
              java.util.HashMap[UnsafeRow, Array[AnyRef]]])]]): Boolean =
        size() > 8
    })

  /** Driver-built `key → max(delete threshold)` broadcast over the
    * pending equality-delete files, bounded by the shared vector
    * ceiling (`limit(max+1)` — never an unbounded collect). None =
    * over ceiling / vectors disabled (the caller keeps the join plan);
    * the None outcome caches like the position-vector cache. */
  private def eqVectorFor(spark: SparkSession, tableDir: Path,
                          eqDels: Seq[String], keySchema: StructType,
                          seqs: Map[String, Long],
                          delField: Option[StructField])
      : Option[(Seq[DataType], org.apache.spark.broadcast.Broadcast[
        java.util.HashMap[UnsafeRow, Array[AnyRef]]])] = {
    val max = spark.conf.get(MorDeletes.VectorMaxConf,
      MorDeletes.VectorMaxDefault.toString).toLong
    if (max <= 0L || max >= Int.MaxValue.toLong) return None
    // the ceiling is part of the key: lowering the conf must route
    // new plans to the join path even when a larger vector was built
    val key = spark.sparkContext.applicationId + "\u0000" + max +
      "\u0000" + tableDir.toString + "\u0000" +
      eqDels.sorted.mkString("\u0000")
    val cached = eqVecCache.get(key)
    if (cached != null) return cached
    val bcSeq = PkTables.seqBroadcastFor(spark, tableDir, seqs)
    // RAW rows (keys, field?, seq), ceiling-bounded; the driver folds
    // the two families per key (blind max; lex-max (field, seq) pair)
    val rows = PkTables.readEqDeletes(spark, tableDir, eqDels,
        keySchema, bcSeq, delField)
      .limit(max.toInt + 1)
      .queryExecution.executedPlan.executeCollect()
    val built =
      if (rows.length > max) None
      else {
        val keyTypes = keySchema.fields.map(_.dataType).toSeq
        val proj = UnsafeProjection.create(keyTypes.toArray)
        val m = new java.util.HashMap[UnsafeRow, Array[AnyRef]](
          rows.length * 2)
        val n = keyTypes.length
        val fieldType = delField.map(_.dataType)
        val fieldIdx = n // DelFieldCol right after the keys when present
        val seqIdx = if (delField.isDefined) n + 1 else n
        rows.foreach { r =>
          val k = proj(r).copy()
          var slots = m.get(k)
          if (slots == null) { slots = new Array[AnyRef](3); m.put(k, slots); () }
          val dseq = r.getLong(seqIdx)
          val fv = fieldType.flatMap(t =>
            if (r.isNullAt(fieldIdx)) None else Some(r.get(fieldIdx, t)))
          fv match {
            case None => // blind family: max seq
              if (slots(0) == null ||
                  slots(0).asInstanceOf[java.lang.Long].longValue() < dseq)
                slots(0) = java.lang.Long.valueOf(dseq)
            case Some(v) => // field family: lex-max (field, seq)
              val less = slots(1) == null || {
                val c = EqDeleteVectorKilled.cmp(slots(1), v)
                c < 0 || (c == 0 &&
                  slots(2).asInstanceOf[java.lang.Long].longValue() < dseq)
              }
              if (less) {
                slots(1) = v.asInstanceOf[AnyRef]
                slots(2) = java.lang.Long.valueOf(dseq)
              }
          }
        }
        Some((keyTypes, spark.sparkContext.broadcast(m)))
      }
    eqVecCache.put(key, built)
    built
  }
}

/** The per-bucket keyed scan: one input partition per `_gbucket` dir,
  * key-grouped on the writer-identical `bucket(n, key)` transform. */
private[catalog] final class PkBucketResolveScan(
    tableName: String,
    outSchema: StructType,
    buckets: Seq[(Int, Array[PkBucketResolve.PkFile])],
    factory: org.apache.spark.sql.execution.datasources.v2.parquet
      .ParquetPartitionReaderFactory,
    bucket: PartitionSpec.Bucket,
    rowsUpperBound: Option[Long])
    extends Scan with Batch with SupportsReportPartitioning
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  override def readSchema(): StructType = outSchema
  override def description(): String =
    s"$tableName(pk-bucket-resolve:${buckets.size} buckets," +
      s"${buckets.map(_._2.length).sum} files)"
  override def toBatch: Batch = this

  /** Real statistics (file bytes summed at planning; manifest row
    * counts when every file carries one — an UPPER bound pre-dedup,
    * all the V2 contract promises): without them the relation reports
    * `defaultSizeInBytes` and a SMALL resolved side never broadcasts
    * in downstream joins. */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(
          buckets.iterator.flatMap(_._2.iterator).map(_.size).sum)
      override def numRows(): java.util.OptionalLong =
        rowsUpperBound.fold(java.util.OptionalLong.empty())(
          java.util.OptionalLong.of)
    }

  override def planInputPartitions(): Array[InputPartition] =
    buckets.map { case (id, fs) =>
      new PkBucketResolve.BucketPartition(id, fs): InputPartition
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new PkBucketReaderFactory(factory)

  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    new org.apache.spark.sql.connector.read.partitioning
      .KeyGroupedPartitioning(
        Array(Expressions.bucket(bucket.n, bucket.col)), buckets.size)
}

/** Reads a bucket's files sequentially through the V2 parquet row
  * reader (native row-index generation), appending each file's
  * (table-relative path, birth sequence) as per-file constants — the
  * output layout is `[selCols…, pos, file, seq]`. */
private[catalog] final class PkBucketReaderFactory(
    inner: org.apache.spark.sql.execution.datasources.v2.parquet
      .ParquetPartitionReaderFactory)
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = {
    val bp = p.asInstanceOf[PkBucketResolve.BucketPartition]
    new PartitionReader[InternalRow] {
      private var i = 0
      private var cur: PartitionReader[InternalRow] = null
      private val joined = new JoinedRow
      private var suffix: GenericInternalRow = null

      override def next(): Boolean = {
        while (true) {
          if (cur == null) {
            if (i >= bp.files.length) return false
            val f = bp.files(i); i += 1
            cur = org.apache.spark.sql.GraftReadBridge.buildRowReader(
              inner, org.apache.spark.sql.GraftReadBridge
                .partitionedFile(f.absPath, f.size))
            suffix = new GenericInternalRow(Array[Any](
              UTF8String.fromString(f.relPath),
              java.lang.Long.valueOf(f.seq)))
          }
          if (cur.next()) return true
          cur.close(); cur = null
        }
        false
      }

      override def get(): InternalRow = joined(cur.get(), suffix)

      override def close(): Unit = {
        if (cur != null) { cur.close(); cur = null }
      }
    }
  }
}

/** Scan-local equality-delete application — the broadcast form of
  * [[PkTables.eqKillCond]]. Per key the vector holds the two delete
  * families' thresholds: a row is KILLED iff
  *  - the BLIND family holds a seq strictly above the row's birth
  *    sequence (per-key max ≡ the union of blind delete files), or
  *  - the FIELD family holds a lex-greater `(field, seq)` pair with a
  *    DIFFERENT commit seq (the same-commit exclusion — a field-
  *    lowering update never eats its own insert).
  * Codegen'd like [[DeleteVectorContains]], so the filter rides inside
  * the scan's whole-stage span with no join operator and no
  * broadcast-threshold dependence. */
private[catalog] final case class EqDeleteVectorKilled(
    vectors: org.apache.spark.broadcast.Broadcast[
      java.util.HashMap[UnsafeRow, Array[AnyRef]]],
    keyTypes: Seq[DataType],
    keyStruct: Expression,
    seqExpr: Expression,
    fieldExpr: Option[Expression])
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.Predicate {

  override def children: Seq[Expression] =
    Seq(keyStruct, seqExpr) ++ fieldExpr.toSeq
  override def nullable: Boolean = false
  override def foldable: Boolean = false

  @transient private lazy val proj =
    UnsafeProjection.create(keyTypes.toArray)

  def killed(key: InternalRow, seq: Long, field: AnyRef): Boolean = {
    val slots = vectors.value.get(proj(key))
    if (slots == null) return false
    if (slots(0) != null &&
        seq < slots(0).asInstanceOf[java.lang.Long].longValue()) return true
    if (slots(1) == null || field == null) return false
    val ds = slots(2).asInstanceOf[java.lang.Long].longValue()
    if (seq == ds) return false
    val c = EqDeleteVectorKilled.cmp(field, slots(1))
    c < 0 || (c == 0 && seq < ds)
  }

  override def eval(input: InternalRow): Any = {
    val k = keyStruct.eval(input)
    if (k == null) false
    else killed(k.asInstanceOf[InternalRow],
      seqExpr.eval(input).asInstanceOf[Long],
      fieldExpr.map(_.eval(input).asInstanceOf[AnyRef]).orNull)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val ref = ctx.addReferenceObj("eqDeleteVector", this)
    val k = keyStruct.genCode(ctx)
    val s = seqExpr.genCode(ctx)
    fieldExpr match {
      case None =>
        ev.copy(
          code = code"""
            ${k.code}
            ${s.code}
            boolean ${ev.value} = !${k.isNull} && !${s.isNull} &&
              $ref.killed(${k.value}, ${s.value}, null);""",
          isNull = org.apache.spark.sql.catalyst.expressions.codegen
            .FalseLiteral)
      case Some(fe) =>
        val f = fe.genCode(ctx)
        ev.copy(
          code = code"""
            ${k.code}
            ${s.code}
            ${f.code}
            boolean ${ev.value} = !${k.isNull} && !${s.isNull} &&
              $ref.killed(${k.value}, ${s.value},
                ${f.isNull} ? null : (Object) ${f.value});""",
          isNull = org.apache.spark.sql.catalyst.expressions.codegen
            .FalseLiteral)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(keyStruct = newChildren(0), seqExpr = newChildren(1),
      fieldExpr = if (newChildren.length > 2) Some(newChildren(2)) else None)
}

private[catalog] object EqDeleteVectorKilled {
  /** Catalyst-internal atomic values are mutually Comparable within a
    * column's type (Long, Int, UTF8String, Decimal, Double — with the
    * catalyst NaN-greatest convention via j.l.Double.compareTo). */
  def cmp(a: AnyRef, b: AnyRef): Int =
    a.asInstanceOf[java.lang.Comparable[AnyRef]].compareTo(b)
}

package org.apache.spark.sql

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, FunctionCatalog, Table}
import org.apache.spark.sql.connector.read.{PartitionReader, Scan}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.{ParquetFileFormat, ParquetOptions}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetPartitionReaderFactory
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.util.SerializableConfiguration

/** `private[sql]` surface the bucket-local PRIMARY-KEY read
  * ([[graft.catalog]]'s `PkBucketResolve`) needs: the V2 parquet
  * per-file row reader (with native parquet row-index generation),
  * hand-constructed scan relations carrying key-grouped partitioning,
  * and the V2→Catalyst transform translation the optimizer's own
  * `V2ScanPartitioningAndOrdering` rule uses. */
object GraftReadBridge {

  /** The column name parquet readers recognize as "generate the row
    * index here" — the native source `_metadata.row_index` taps. */
  val RowIndexTempName: String =
    org.apache.spark.sql.execution.datasources.parquet
      .ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME

  /** NULLABLE, or the vectorized reader rejects it as "required column
    * missing in data file" before the row-index generator ever sees
    * it (the generator always fills it — nullability is declaration
    * only). */
  val RowIndexTempField: StructField =
    StructField(RowIndexTempName, LongType, nullable = true)

  /** A serializable per-file parquet ROW reader factory: no pushed
    * filters (callers re-filter above), no partition columns. Built
    * through a real [[org.apache.spark.sql.execution.datasources.v2
    * .parquet.ParquetScan]] so `createReaderFactory` performs ALL the
    * hadoop-conf plumbing (read-support class, requested-schema JSON,
    * timezone/case/int96 flags) exactly as a planned scan would — the
    * readers honor vectorized decoding internally and fill declared
    * columns missing from a file with nulls, the same read semantics
    * as the V1 explicit-schema path. */
  def parquetReaderFactory(spark: SparkSession, dataSchema: StructType,
                           readDataSchema: StructType)
      : ParquetPartitionReaderFactory = {
    val hconf = spark.sessionState.newHadoopConfWithOptions(Map.empty)
    val emptyIndex = new org.apache.spark.sql.execution.datasources
      .InMemoryFileIndex(spark, Nil, Map.empty, Some(dataSchema))
    val scan = org.apache.spark.sql.execution.datasources.v2.parquet
      .ParquetScan(spark, hconf, emptyIndex, dataSchema, readDataSchema,
        new StructType(), Array.empty,
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          java.util.Map.of()),
        None, Nil, Nil, Array.empty)
    scan.createReaderFactory().asInstanceOf[ParquetPartitionReaderFactory]
  }

  def buildRowReader(factory: ParquetPartitionReaderFactory,
                     file: PartitionedFile)
      : PartitionReader[InternalRow] = factory.buildReader(file)

  def partitionedFile(absPath: String, size: Long): PartitionedFile =
    PartitionedFile(InternalRow.empty,
      org.apache.spark.paths.SparkPath.fromPathString(absPath),
      0L, size, Array.empty, 0L, size, Map.empty)

  def toAttributes(schema: StructType): Seq[AttributeReference] =
    org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema)

  /** A scan relation with EXPLICIT key-grouped partitioning — what the
    * optimizer's `V2ScanPartitioningAndOrdering` rule would have
    * stamped had the scan planned through normal V2 pushdown (a rule
    * that already ran by the time the merge-on-read rewrite fires). */
  def scanRelation(table: Table, catalog: Option[CatalogPlugin],
                   scan: Scan, output: Seq[AttributeReference],
                   keyGroupedPartitioning: Option[Seq[Expression]])
      : DataSourceV2ScanRelation = {
    val rel = DataSourceV2Relation(
      table, output, catalog, None,
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of()))
    DataSourceV2ScanRelation(rel, scan, output, keyGroupedPartitioning)
  }

  /** V2 transform → Catalyst [[Expression]] (a `TransformExpression`
    * bound through the table's FunctionCatalog), resolved against
    * `plan`'s output — byte-compatible with what the SPJ machinery
    * produces, so two bucket-local reads stay join-compatible. */
  def toCatalystTransform(
      t: org.apache.spark.sql.connector.expressions.Expression,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      funCatalog: FunctionCatalog): Option[Expression] =
    org.apache.spark.sql.catalyst.expressions.V2ExpressionUtils
      .toCatalystOpt(t, plan, Some(funCatalog))
}

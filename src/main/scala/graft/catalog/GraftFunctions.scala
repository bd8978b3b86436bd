package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Murmur3Hash}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** The catalog's V2 `bucket` function — the missing piece that lets
  * Spark REASON about the hidden bucket layout: the optimizer's
  * `V2ScanPartitioningAndOrdering` rule resolves a scan-reported
  * `KeyGroupedPartitioning(bucket(n, col))` by loading `bucket` from
  * the table's [[org.apache.spark.sql.connector.catalog.FunctionCatalog]]
  * (the Iceberg model), and storage-partitioned join compatibility
  * compares the bound functions' `canonicalName`s.
  *
  * The bound function computes EXACTLY the writer's bucket id —
  * `pmod(murmur3_hash(value, seed 42), n)`, the same Catalyst
  * [[Murmur3Hash]] the partitioned writer and the pruning paths use —
  * so any runtime evaluation of the transform (partially-clustered
  * SPJ, missing-key padding) agrees with the directory layout. */
private[catalog] object GraftFunctions {

  val BucketName = "bucket"

  object BucketUnbound extends UnboundFunction {
    override def name(): String = BucketName
    override def description(): String =
      "bucket(n, col): the writer's pmod(murmur3(col), n) partition id"
    override def bind(inputType: StructType): BoundFunction = {
      if (inputType.fields.length != 2)
        throw new UnsupportedOperationException(
          s"$BucketName expects (numBuckets INT, value), got $inputType")
      new BucketBound(inputType.fields(1).dataType)
    }
  }

  /** Bound for one value type; the first argument is the literal
    * bucket count. Evaluation delegates to the SAME Catalyst
    * Murmur3Hash the writer projected through, via a bound reference
    * against the (n, value) input row. */
  final class BucketBound(valueType: DataType)
      extends ScalarFunction[java.lang.Integer] {
    private val hash = Murmur3Hash(
      Seq(BoundReference(1, valueType, nullable = true)), 42)
    override def inputTypes(): Array[DataType] =
      Array(IntegerType, valueType)
    override def resultType(): DataType = IntegerType
    override def name(): String = BucketName
    // SPJ compatibility key: two scans cluster-compatibly iff their
    // bound functions share this name (and arguments) — one constant
    // for every value type, like Iceberg's "iceberg.bucket"
    override def canonicalName(): String = s"graft.$BucketName"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): java.lang.Integer = {
      val n = input.getInt(0)
      val h = hash.eval(input).asInstanceOf[Int]
      java.lang.Math.floorMod(h, n)
    }
  }
}

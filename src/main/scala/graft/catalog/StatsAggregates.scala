package graft.catalog

import java.nio.file.Path

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Metadata-only aggregates — `SELECT count(*), min(c), max(c),
  * count(c) FROM t` answered from the [[FileStats]] sidecar without
  * touching ONE data file: the V2 `SupportsPushDownAggregates`
  * complete-pushdown surface (the Iceberg `MIN/MAX/COUNT from
  * manifests` model). At 100 TB a row count or column extent becomes
  * an O(files) driver fold over the sidecar instead of a full scan —
  * the difference between milliseconds and a cluster-hour.
  *
  * Served ONLY when the answer is provably exact:
  *  - no pushed filters, no grouping (a WHERE or GROUP BY falls back
  *    to the ordinary scan);
  *  - every CURRENT data file is listed in the sidecar with the
  *    referenced column present (a file appended after `CALL analyze`
  *    bails the whole pushdown — stale stats degrade to a real scan,
  *    never to a wrong answer), and stale sidecar entries for files
  *    that no longer exist are ignored;
  *  - `COUNT(*)` needs per-file row counts, `COUNT(c)` per-file
  *    non-null counts (both recorded by r10+ `analyze`; pre-r10
  *    sidecars serve only MIN/MAX);
  *  - MIN/MAX fold per-file extremes under Catalyst's own interpreted
  *    ordering for the column's LOGICAL type, so NaN placement,
  *    UTF8 byte order, and widened types match what a real scan's
  *    aggregate would return bit-for-bit.
  *
  * `COUNT(DISTINCT …)`, SUM, AVG, and anything else are not exactly
  * derivable from ranges — never served. */
private[catalog] object StatsAggregates {

  /** The single result row (schema + values) for `agg` served purely
    * from the sidecar, or None when any exactness condition fails —
    * the caller then leaves the aggregation to Spark over a real
    * scan. */
  def serve(tableDir: Path, dataDir: Path, logical: StructType,
            phys: String => String, agg: Aggregation):
      Option[(StructType, InternalRow)] =
    serveFiles(tableDir,
      DeletableTable.listDataFiles(dataDir).map(_.getFileName.toString),
      logical, phys, agg)

  /** [[serve]] over an EXPLICIT current-file basename list — the
    * partitioned layouts (hive walk or snapshot manifest) feed their
    * own file lists here; basenames are globally unique by the
    * writers' naming. `statsOverride` carries a snapshot manifest's
    * commit-atomic per-file stats ([[Snapshots.statsOf]]) so
    * `VERSION AS OF` aggregates serve from the stats of THAT snapshot,
    * not the current-file-set sidecar. */
  def serveFiles(tableDir: Path, current: Seq[String], logical: StructType,
                 phys: String => String, agg: Aggregation,
                 statsOverride: Option[Map[String, FileStats.FileStat]] = None):
      Option[(StructType, InternalRow)] = {
    if (agg.groupByExpressions.nonEmpty) return None
    val full = statsOverride.getOrElse(FileStats.readFull(tableDir))
    if (full.isEmpty) return None
    // exactly the CURRENT files, every one listed — else bail
    val entries = current.map(full.get)
    if (entries.exists(_.isEmpty)) return None
    val stats = entries.flatten
    val served = agg.aggregateExpressions.toSeq.map(serveOne(stats, logical, phys, _))
    if (served.exists(_.isEmpty)) return None
    val fields = served.flatten
    Some((StructType(fields.map(_._1)),
      InternalRow.fromSeq(fields.map(_._2))))
  }

  private def serveOne(stats: Seq[FileStats.FileStat], logical: StructType,
                       phys: String => String, fn: AggregateFunc):
      Option[(StructField, Any)] = fn match {
    case _: CountStar =>
      val rows = stats.map(_.rows)
      if (rows.exists(_.isEmpty)) None
      else Some((StructField("count_star", LongType, nullable = false),
        rows.flatten.sum))
    case c: Count if !c.isDistinct =>
      column(c.column, logical).flatMap { case (name, _) =>
        val nn = stats.map(_.cols.get(phys(name)))
        if (nn.exists(s => s.isEmpty || s.get.nonNull.isEmpty)) None
        else Some((StructField(s"count_$name", LongType, nullable = false),
          nn.flatten.flatMap(_.nonNull).sum))
      }
    case m: Min =>
      column(m.column, logical).flatMap { case (name, dt) =>
        extreme(stats, phys(name), dt, isMin = true).map(v =>
          (StructField(s"min_$name", dt, nullable = true), v))
      }
    case m: Max =>
      column(m.column, logical).flatMap { case (name, dt) =>
        extreme(stats, phys(name), dt, isMin = false).map(v =>
          (StructField(s"max_$name", dt, nullable = true), v))
      }
    case _ => None
  }

  /** A single-name column reference with its LOGICAL field type. */
  private def column(e: org.apache.spark.sql.connector.expressions.Expression,
                     logical: StructType): Option[(String, DataType)] = e match {
    case r: NamedReference if r.fieldNames().length == 1 =>
      val name = r.fieldNames()(0)
      logical.fields.find(_.name.equalsIgnoreCase(name))
        .map(f => (f.name, f.dataType))
    case _ => None
  }

  /** Fold the per-file extremes (Catalyst internal values, interpreted
    * ordering — the same comparator a real scan's Min/Max would use).
    * Some(null) = every file's column all-NULL (SQL answer NULL);
    * None = some file lacks the column's entry, or a value fails to
    * reconstruct → bail. */
  private def extreme(stats: Seq[FileStats.FileStat], physName: String,
                      dt: DataType, isMin: Boolean): Option[Any] = {
    val perFile = stats.map(_.cols.get(physName))
    if (perFile.exists(_.isEmpty)) return None
    val bounds = perFile.flatten.map(st => if (isMin) st.mn else st.mx)
    val present = bounds.flatten
    if (present.isEmpty) return Some(null) // all files all-NULL
    val internal = present.map(internalValue(_, dt))
    if (internal.exists(_.isEmpty)) return None
    val ord = org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(dt)
    Some(internal.flatten.reduce((a, b) =>
      if ((ord.compare(a, b) <= 0) == isMin) a else b))
  }

  /** Sidecar scalar (BigDecimal / String) → the Catalyst internal
    * value of the column's LOGICAL type. Exact conversions only —
    * anything lossy or unparseable reports None and the pushdown
    * bails. Temporal encodings are already the internal numerics. */
  private def internalValue(v: Any, dt: DataType): Option[Any] = {
    def num: Option[java.math.BigDecimal] = v match {
      case b: java.math.BigDecimal => Some(b)
      case _ => None
    }
    try dt match {
      case ByteType => num.map(_.byteValueExact())
      case ShortType => num.map(_.shortValueExact())
      case IntegerType | DateType => num.map(_.intValueExact())
      case LongType | TimestampType | TimestampNTZType =>
        num.map(_.longValueExact())
      case FloatType => v match {
        case b: java.math.BigDecimal => Some(b.floatValue())
        case s: String => Some(java.lang.Float.parseFloat(s))
        case _ => None
      }
      case DoubleType => v match {
        case b: java.math.BigDecimal => Some(b.doubleValue())
        case s: String => Some(java.lang.Double.parseDouble(s))
        case _ => None
      }
      case d: DecimalType => num.flatMap { b =>
        val dec = org.apache.spark.sql.types.Decimal(b)
        if (dec.changePrecision(d.precision, d.scale)) Some(dec) else None
      }
      case StringType => v match {
        case s: String => Some(UTF8String.fromString(s))
        case _ => None
      }
      case _ => None
    } catch { case _: ArithmeticException | _: NumberFormatException => None }
  }
}

package graft.catalog

import java.nio.file.Path

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, In, Literal, Murmur3Hash}
import org.apache.spark.sql.types._

/** Partition-directory pruning for the partitioned lake tables' DML —
  * which `col=value` leaf directories can possibly hold a row
  * matching a pushed condition:
  *
  *  - `identity(col)` prunes on `=` / `IN`: a leaf whose path segment
  *    for the column encodes a DIFFERENT value than the literal (the
  *    exact hive escaping the writer used) provably holds no match;
  *    the NULL partition (`__HIVE_DEFAULT_PARTITION__`) never matches
  *    an equality.
  *  - `bucket(n, col)` prunes HIDDEN-partition style (the Iceberg
  *    model): the literal's bucket id is `pmod(murmur3(v), n)` —
  *    evaluated on the driver with the SAME [[Murmur3Hash]] expression
  *    the writer used, so a key equality keeps only the one
  *    `_gbucket=<id>` subtree.
  *
  * Same conservative contract as [[FileStats]]/[[BloomIndex]]: only
  * provable exclusion prunes; unencodable literals, non-partition
  * columns, and unrecognized shapes contribute nothing. */
private[catalog] object PartitionPruning {

  /** Split the table's leaf partition directories (as table-relative
    * paths) into (candidates, carried) under the conjunctive
    * `filters`; None when nothing can be carried. */
  def split(tableDir: Path, spec: Seq[PartitionSpec.Field],
            filters: Seq[Expression]): Option[(Seq[Path], Seq[Path])] =
    splitLeaves(PartitionedWrite.leafPartitionDirs(tableDir), spec, filters)

  /** Same split over an EXPLICIT leaf-directory list — versioned
    * partitioned tables derive their leaves from the snapshot
    * manifest's file list ([[Snapshots.leafDirsOf]]), not from a
    * filesystem listing that would include directories holding only
    * dead (unreferenced) files. */
  def splitLeaves(leaves: Seq[Path], spec: Seq[PartitionSpec.Field],
                  filters: Seq[Expression]): Option[(Seq[Path], Seq[Path])] = {
    if (filters.isEmpty || spec.isEmpty || leaves.isEmpty) return None
    val (kept, carried) = leaves.partition { rel =>
      val values = segmentValues(rel)
      !filters.exists(excludes(_, spec, values))
    }
    if (carried.isEmpty) None else Some((kept, carried))
  }

  /** The `name -> raw value string` map of a leaf dir's path segments
    * (hive-unescaped; NULL partition kept as the marker string). */
  private def segmentValues(rel: Path): Map[String, String] =
    rel.iterator().asScala.flatMap { seg =>
      val s = seg.toString
      val i = s.indexOf('=')
      if (i <= 0) None
      else Some(
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .unescapePathName(s.substring(0, i)) ->
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .unescapePathName(s.substring(i + 1)))
    }.toMap

  private val NullMarker =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.DEFAULT_PARTITION_NAME

  /** True when `filter` provably matches NO row of a leaf with the
    * given segment values. */
  private def excludes(filter: Expression, spec: Seq[PartitionSpec.Field],
                       values: Map[String, String]): Boolean = filter match {
    case And(l, r) =>
      excludes(l, spec, values) || excludes(r, spec, values)
    case EqualTo(a: AttributeReference, l: Literal) =>
      excludesEq(a.name, l, spec, values)
    case EqualTo(l: Literal, a: AttributeReference) =>
      excludesEq(a.name, l, spec, values)
    case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      vs.forall(v => excludesEq(a.name, v.asInstanceOf[Literal], spec, values))
    case _ => false
  }

  private def excludesEq(colName: String, lit: Literal,
                         spec: Seq[PartitionSpec.Field],
                         values: Map[String, String]): Boolean = {
    if (lit.value == null) return false // null-equality never pushed as matchable
    spec.exists {
      case PartitionSpec.Identity(c) if c.equalsIgnoreCase(colName) =>
        values.get(c).exists { dirVal =>
          if (dirVal == NullMarker) true // NULL partition: no equality matches
          else encoded(lit).exists(_ != dirVal)
        }
      case PartitionSpec.Bucket(c, n) if c.equalsIgnoreCase(colName) =>
        values.get(PartitionSpec.BucketDir).exists { dirVal =>
          val id = Murmur3Hash(Seq(lit), 42).eval(null).asInstanceOf[Int]
          val want = java.lang.Math.floorMod(id, n).toString
          dirVal != NullMarker && dirVal != want
        }
      case _ => false
    }
  }

  /** The literal's partition-directory value string — EXACTLY the
    * writer's `Cast(col, string)` rendering for the types where that
    * rendering is unambiguous. None (never prunes) otherwise. */
  private def encoded(lit: Literal): Option[String] = (lit.value, lit.dataType) match {
    case (v: org.apache.spark.unsafe.types.UTF8String, StringType) =>
      Some(v.toString)
    case (v: Byte, ByteType) => Some(v.toString)
    case (v: Short, ShortType) => Some(v.toString)
    case (v: Int, IntegerType) => Some(v.toString)
    case (v: Long, LongType) => Some(v.toString)
    case (v: Boolean, BooleanType) => Some(v.toString)
    case (v: Int, DateType) =>
      Some(java.time.LocalDate.ofEpochDay(v.toLong).toString)
    case _ => None
  }
}

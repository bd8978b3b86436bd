package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the lake-side file-clustering
  * step that makes multi-dimensional min/max pruning work at 100 TB
  * (Paimon/Iceberg/Delta expose it as `zorder by`; the reference's
  * lake tier `README.md:81-93` inherits the same need once both
  * `movie_id` and `purchased_at` predicates hit the tiered files).
  *
  * A single-column sort clusters one predicate dimension and scatters
  * every other; interleaving the bits of two dimensions gives files
  * whose (x, y) bounding boxes are COMPACT, so a scan with predicates
  * on either or both dimensions prunes most files by footer min/max
  * stats alone. Codes are pure integer bit-arithmetic (the classic
  * parallel-prefix bit spread), identical in Spark and the SQL
  * oracle, and the layout itself is one range exchange on the code —
  * exactly the shuffle a sorted write costs anyway, no extra pass.
  */
object Layout {

  /** (shift, mask) ladder of the 16→32-bit interleave spread;
    * written once, folded into both the Column and the SQL form. */
  private val ladder = Seq(
    8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL, 2 -> 0x33333333L, 1 -> 0x55555555L)

  /** Spread the low 16 bits of `c` to even bit positions 0,2,..,30. */
  def spread16(c: Column): Column =
    ladder.foldLeft(c.bitwiseAND(lit(0xFFFFL))) { case (v, (sh, mask)) =>
      v.bitwiseOR(shiftleft(v, sh)).bitwiseAND(lit(mask))
    }

  /** 32-bit Morton code: x on even bits, y on odd. */
  def mortonCode(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** The same spread as a SQL text fragment over the expression `e` —
    * one ladder definition serving both engines. */
  def spreadSql(e: String): String =
    ladder.foldLeft(s"($e & 65535)") { case (v, (sh, mask)) =>
      s"((($v) | (($v) << $sh)) & $mask)"
    }

  def mortonSql(x: String, y: String): String =
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"

  /** Cluster `df` into `parts` files in Morton order of the two int
    * dims — the write-side layout op: one range exchange on the code,
    * sorted within each output file so footer min/max stats are tight
    * on BOTH dimensions. */
  def zorderLayout(df: DataFrame, x: Column, y: Column,
                   parts: Int): DataFrame = {
    val coded = df.withColumn("_z", mortonCode(x, y))
    coded.repartitionByRange(parts, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }

  /** Driver query: Morton codes for `orders` over the two predicate
    * dimensions a lake scan actually filters on — customer and order
    * day (low 16 bits each; at full scale the dims are first
    * range-bucketed to 16 bits, the standard z-order prologue). */
  def ordersZorder(orders: DataFrame): DataFrame = {
    val x = col("o_custkey").bitwiseAND(lit(0xFFFFL))
    // NTZ fixture timestamps read under the UTC session TZ: the cast
    // is value-identity, matching the oracle's epoch().
    val y = expr("unix_seconds(CAST(o_orderdate AS TIMESTAMP)) div 86400")
      .bitwiseAND(lit(0xFFFFL))
    orders.select(col("o_orderkey"), x.as("zx"), y.as("zy"),
      mortonCode(x, y).as("zcode"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: left rows matched to right rows whose
  * interval `[startCol, endCol)` contains the left timestamp, with an
  * additional equi-key.
  *
  * Spark plans a raw inequality join as BroadcastNestedLoop — O(|L|·|R|)
  * and a cluster-killer at scale. This implementation buckets time into
  * fixed bins: each right interval explodes into the bins it overlaps,
  * the join becomes an EQUI-join on (key, bin) — hash-partitionable,
  * AQE-skew-splittable — and the exact containment predicate refines
  * the candidates. Bin width trades replication (long intervals span
  * more bins) against candidate selectivity; pick ≈ the median interval
  * length.
  */
object RangeJoin {

  def containsJoin(left: DataFrame, right: DataFrame, key: String,
                   tsCol: String, startCol: String, endCol: String,
                   binSeconds: Long): DataFrame = {
    val bin = (c: org.apache.spark.sql.Column) =>
      floor(unix_timestamp(c) / binSeconds).cast("long")
    val leftB = left.withColumn("__bin", bin(col(tsCol)))
    val rightB = right.withColumn("__bin",
      explode(sequence(bin(col(startCol)), bin(col(endCol)))))
    leftB.join(rightB, Seq(key, "__bin"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bin")
  }
}

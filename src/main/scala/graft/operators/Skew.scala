package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew-mitigation for joins — the salting pattern for the cases
  * AQE's runtime skew-join split can't reach (streaming micro-batches,
  * non-shuffle-join plans, or a build side too large to broadcast).
  *
  * `saltedJoin(big, small, key, n)`: the big side gets a deterministic
  * salt in [0, n) per row (hash of the whole row — content-stable, no
  * RNG state), the small side is replicated n ways, and the join key
  * becomes (key, salt) — a hot key's rows spread over n reducers
  * instead of one. Result is exactly the plain join's multiset.
  */
object Skew {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salt: Int = 8): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col).toSeq: _*)), lit(salt)).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}

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

  /** Break-even-guarded entry — the family discipline the ANN side
    * established (probe, then pick the plan; `Similarity.adaptiveTopK`,
    * `PqIndex.adaptiveTopK`): ONE aggregate probes the big side's key
    * histogram, and only when the heaviest key carries at least
    * `skewFraction` of the rows (a key that would pin a whole reducer)
    * does the join pay salting's small-side replication; otherwise the
    * plain equi-join runs and Catalyst/AQE keep their usual freedoms.
    * Both branches return the plain join's exact multiset, so callers
    * (and the driver oracle) never see which branch ran.
    *
    * The probe is the first narrow half of [[graft.operators.EventOps
    * .keySkewProfile]]'s report: per-key counts, max vs total — one
    * partial+final agg over just the key column. */
  def adaptiveJoin(big: DataFrame, small: DataFrame, key: String,
                   salt: Int = 8, skewFraction: Double = 0.05): DataFrame = {
    val probe = big.groupBy(col(key)).agg(count(lit(1)).as("__c"))
      .agg(max(col("__c")).as("__max"), sum(col("__c")).as("__n"))
      .select((col("__max").cast("double") / col("__n").cast("double"))
        .as("__frac"))
      .head()
    val skewed = !probe.isNullAt(0) && probe.getDouble(0) >= skewFraction
    if (skewed) saltedJoin(big, small, key, salt)
    else big.join(small, Seq(key))
  }
}

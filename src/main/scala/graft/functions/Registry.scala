package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL registration of the engine's native expressions, so the
  * `spark.sql` entry point (reference EP1) reaches them too:
  *
  * {{{
  *   graft.functions.Registry.register(spark)
  *   spark.sql("SELECT graft_dot(a.v, b.v) FROM ...")
  * }}}
  */
object Registry {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_dot",
      exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_word_shingles",
      exprs => WordShingles(exprs(0),
        exprs(1).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("graft_simhash",
      exprs => SimHash64(exprs(0),
        if (exprs.length > 1) exprs(1).eval().asInstanceOf[Int] else 60), "built-in")
    reg.createOrReplaceTempFunction("graft_winnow",
      exprs => WinnowFingerprints(exprs(0),
        exprs(1).eval().asInstanceOf[Int],
        exprs(2).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("graft_hyperplane_buckets",
      exprs => HyperplaneBuckets(exprs(0),
        exprs(1).eval().asInstanceOf[Int],
        exprs(2).eval().asInstanceOf[Int],
        exprs(3).eval().asInstanceOf[Int]), "built-in")
  }
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** SQL registration of the engine's native expressions, so the
  * `spark.sql` entry point (reference EP1) reaches them too:
  *
  * {{{
  *   graft.functions.Registry.register(spark)
  *   spark.sql("SELECT graft_dot(a.v, b.v) FROM ...")
  * }}}
  */
object Registry {

  /** Config-style arguments (shingle width, bit count, table/plane
    * counts) parameterize expression CONSTRUCTION, so they must be
    * foldable literals — a column reference here would silently bind to
    * its registration-time sample under the old blind `.eval()`. Reject
    * it with an error naming the function and position instead. */
  private def intArg(fn: String, exprs: Seq[Expression], pos: Int,
                     default: => Option[Int] = None): Int =
    if (pos >= exprs.length)
      default.getOrElse(throw new IllegalArgumentException(
        s"$fn: missing required integer argument #${pos + 1}"))
    else exprs(pos) match {
      case lit: Literal if lit.value != null =>
        lit.value.asInstanceOf[Number].intValue()
      case e if e.foldable && e.eval() != null =>
        e.eval().asInstanceOf[Number].intValue()
      case other => throw new IllegalArgumentException(
        s"$fn: argument #${pos + 1} must be an integer literal " +
          s"(got non-constant expression: ${other.sql})")
    }

  /** The native-expression builders, named — the single source of
    * truth shared by the runtime [[register]] path and the config-time
    * [[graft.GraftExtensions]] injection path
    * (`spark.sql.extensions=graft.GraftExtensions`), so the two entry
    * points cannot drift. */
  private[graft] val expressionBuilders
      : Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" ->
      ((exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))),
    "graft_word_shingles" ->
      ((exprs: Seq[Expression]) => WordShingles(exprs(0),
        intArg("graft_word_shingles", exprs, 1))),
    "graft_simhash" ->
      ((exprs: Seq[Expression]) => SimHash64(exprs(0),
        intArg("graft_simhash", exprs, 1, default = Some(60)))),
    "graft_winnow" ->
      ((exprs: Seq[Expression]) => WinnowFingerprints(exprs(0),
        intArg("graft_winnow", exprs, 1),
        intArg("graft_winnow", exprs, 2))),
    "graft_hyperplane_buckets" ->
      ((exprs: Seq[Expression]) => HyperplaneBuckets(exprs(0),
        intArg("graft_hyperplane_buckets", exprs, 1),
        intArg("graft_hyperplane_buckets", exprs, 2),
        intArg("graft_hyperplane_buckets", exprs, 3))),
    "graft_pq_adc" ->
      ((exprs: Seq[Expression]) => PqAdc(exprs(0), exprs(1),
        intArg("graft_pq_adc", exprs, 2, default = Some(16)),
        intArg("graft_pq_adc", exprs, 3, default = Some(16)))))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    expressionBuilders.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
    // The two engine UDAFs, for the SQL entry point (reference EP1 is a
    // SQL client): capacity k rides as a trailing literal argument —
    // a registered UDAF is construction-fixed, so config arrives as
    // data (see TopKSqlAggregator / HeavyHittersSqlAggregator).
    spark.udf.register("graft_topk", TopKAggregator.topKSql)
    spark.udf.register("graft_heavy_hitters", HeavyHitters.summarySql)
    spark.udf.register("graft_quantile", QuantileSketchAgg.quantileSql)
  }
}

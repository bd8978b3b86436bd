package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Config-time registration of the engine's native Catalyst
  * expressions — the `SparkSessionExtensions` entry point, so a plain
  * Spark deployment picks the functions up from configuration alone:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions …
  *   spark.sql("SELECT graft_simhash(text, 60) FROM docs")
  * }}}
  *
  * This is the deployment-grade twin of the runtime
  * [[graft.functions.Registry.register]] call (reference analog: the
  * reference's SQL surface is configured entirely through session DDL
  * and `SET` statements, `flink-cdc/sql/tickets-cdc.sql:2-18` — a
  * user switching to this engine configures it the same way, through
  * conf, without calling Scala first). Both paths share one builder
  * table ([[graft.functions.Registry.expressionBuilders]]), so the
  * SQL surface cannot drift between them.
  *
  * Only the six native expressions inject here: the three UDAFs
  * (`graft_topk`, `graft_heavy_hitters`, `graft_quantile`) are typed
  * `Aggregator`s whose SQL registration needs a live session's
  * encoder machinery (`spark.udf.register`), which the extension hook
  * predates — they stay on the Registry path, and
  * `Registry.register(spark)` remains idempotent on top of an
  * extension-configured session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.Registry.expressionBuilders.foreach {
      case (name, builder) =>
        ext.injectFunction((
          FunctionIdentifier(name),
          new ExpressionInfo("graft", name),
          builder))
    }
  }
}

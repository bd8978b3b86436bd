package graft.functions

import org.apache.spark.sql.SparkSession
import graft.SparkSpec

/** The `spark.sql.extensions=graft.GraftExtensions` path: a session
  * configured purely through conf (no Scala `Registry.register` call)
  * must resolve the native SQL functions, and resolve them to the SAME
  * expressions as the runtime-registered path. */
class ExtensionsSpec extends SparkSpec {

  /** Build a brand-new session object over the shared SparkContext
    * with the extensions applied the way `spark.sql.extensions` does
    * it: the class is instantiated by REFLECTION from its name (the
    * deployment contract — public no-arg constructor, function type)
    * and handed to the session builder. The conf string itself is a
    * STATIC conf read from the SparkContext at context creation, so it
    * cannot be exercised on the suite's shared context — reflection +
    * withExtensions covers every line the conf path runs except
    * Spark's own conf lookup. */
  private def withExtensionSession[A](f: SparkSession => A): A = {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = Class.forName("graft.GraftExtensions")
        .getDeclaredConstructor().newInstance()
        .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
      val s = SparkSession.builder()
        .master("local[4]")
        .withExtensions(ext)
        .getOrCreate()
      f(s)
    } finally {
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }

  test("conf-injected functions resolve without Registry.register") {
    withExtensionSession { s =>
      val dot = s.sql(
        "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .collect().head.getDouble(0)
      assert(dot == 11.0)
      val sh = s.sql(
        "SELECT graft_simhash('the quick brown fox jumps', 60) AS h")
        .collect().head.getLong(0)
      // same text through the runtime-registered path on the shared
      // session must yield the identical signature
      Registry.register(spark)
      val ref = spark.sql(
        "SELECT graft_simhash('the quick brown fox jumps', 60) AS h")
        .collect().head.getLong(0)
      assert(sh == ref)
    }
  }

  test("all six expression builders are injected") {
    withExtensionSession { s =>
      Registry.expressionBuilders.foreach { case (name, _) =>
        assert(s.catalog.functionExists(name), s"missing: $name")
      }
    }
  }

  test("config args still reject non-literal expressions via conf path") {
    withExtensionSession { s =>
      val e = intercept[Exception] {
        s.sql("SELECT graft_word_shingles('a b c d', length('xx') + n) " +
          "FROM (SELECT 3 AS n)").collect()
      }
      assert(e.getMessage.contains("graft_word_shingles") ||
        e.getMessage.contains("argument"))
    }
  }
}

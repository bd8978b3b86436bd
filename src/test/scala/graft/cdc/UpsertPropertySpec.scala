package graft.cdc

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck property tests for the latest-by-key materializer — the
  * algebraic laws the whole CDC staging path rests on (SURVEY §5.3):
  *
  *  - permutation invariance (replay determinism): any arrival order of
  *    the same changelog materializes the same state — the Structured
  *    Streaming correctness argument for the staging tables;
  *  - idempotence: re-materializing a materialized state is a no-op;
  *  - incremental-apply (semigroup) law: folding batch boundaries into
  *    the changelog changes nothing — materializing (A ∪ B) equals
  *    materializing (materialize(A) ∪ B), which is exactly why
  *    per-micro-batch upserts converge to the batch answer.
  *
  * Generators deliberately collide keys AND full (ts, seq) orderings so
  * the content-hash tie-break is exercised, not avoided.
  */
object UpsertPropertySpec extends Properties("Upsert.latestByKey") {

  private lazy val spark = graft.SparkSpec.session
  import scala.jdk.CollectionConverters._

  private val schema = org.apache.spark.sql.types.StructType.fromDDL(
    "k BIGINT, ts BIGINT, seq BIGINT, v STRING")

  private def df(rows: List[(Long, Long, Long, String)]) =
    spark.createDataFrame(
      rows.map(r => org.apache.spark.sql.Row(r._1, r._2, r._3, r._4)).asJava,
      schema)

  /** Deterministic total order: event time, then producer seq, then a
    * content tie-break (matches the engine's upsert contract). */
  private def latest(rows: List[(Long, Long, Long, String)]): Set[Seq[Any]] = {
    val out = Upsert.latestByKey(
      df(rows).withColumn("__h",
        org.apache.spark.sql.functions.xxhash64(
          org.apache.spark.sql.functions.col("v"))),
      keys = Seq("k"), ord = Seq("ts", "seq", "__h"))
    out.drop("__h").collect().map(_.toSeq).toSet
  }

  private val row: Gen[(Long, Long, Long, String)] = for {
    k <- Gen.choose(1L, 5L)                       // few keys → many collisions
    ts <- Gen.choose(0L, 3L)                      // colliding event times
    seq <- Gen.choose(0L, 2L)                     // colliding producer seqs
    v <- Gen.oneOf("a", "b", "c", "d")
  } yield (k, ts, seq, v)

  private val changelog: Gen[List[(Long, Long, Long, String)]] =
    Gen.listOfN(12, row)

  property("replay determinism: any permutation materializes the same state") =
    Prop.forAllNoShrink(changelog) { rows =>
      rows.isEmpty || {
        val base = latest(rows)
        val shuffled = new scala.util.Random(rows.hashCode).shuffle(rows)
        latest(shuffled) == base
      }
    }

  property("idempotence: re-materializing is a no-op") =
    Prop.forAllNoShrink(changelog) { rows =>
      rows.isEmpty || {
        val once = latest(rows)
        latest(once.toList.map(s =>
          (s(0).asInstanceOf[Long], s(1).asInstanceOf[Long],
            s(2).asInstanceOf[Long], s(3).asInstanceOf[String]))) == once
      }
    }

  property("incremental apply: batch boundaries do not change the state") =
    Prop.forAllNoShrink(changelog, Gen.choose(0, 12)) { (rows, cut) =>
      rows.isEmpty || {
        val (a, b) = rows.splitAt(math.min(cut, rows.length))
        val whole = latest(rows)
        val staged = latest(a).toList.map(s =>
          (s(0).asInstanceOf[Long], s(1).asInstanceOf[Long],
            s(2).asInstanceOf[Long], s(3).asInstanceOf[String])) ++ b
        latest(staged) == whole
      }
    }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("bucketedJoin: matching buckets -> zero exchange; rows equal plain join") {
    val facts = (0L until 2000L).map(i => (i, i % 97, s"p$i")).toDF("id", "k", "payload")
    val dims = (0L until 97L).map(i => (i, s"d$i")).toDF("dk", "name")
    val dir = tmp("graft-bkt-spec")
    Bucketing.writeBucketed(facts, "bkt_spec_facts", s"$dir/f", "k", 4)
    Bucketing.writeBucketed(dims, "bkt_spec_dims", s"$dir/d", "dk", 4)
    // force the join shape the contract is about: a broadcast would
    // hide the exchange question entirely
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "bkt_spec_facts", "bkt_spec_dims", "k", "dk")
      val p = plan(joined)
      assert(p.contains("SortMergeJoin"), s"expected SMJ: $p")
      assert(!p.linesIterator.exists(_.trim.matches("""\(\d+\) Exchange.*""")),
        "co-located bucketed join must not shuffle:\n" +
          p.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
      val got = joined.select($"id", $"k", $"name").collect()
        .map(_.toSeq).sortBy(_.toString).toSeq
      val want = facts.join(dims, $"k" === $"dk")
        .select($"id", $"k", $"name").collect()
        .map(_.toSeq).sortBy(_.toString).toSeq
      assert(got == want && got.size == 2000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("bucketed groupBy on the bucket key: no exchange before the aggregate") {
    val facts = (0L until 1000L).map(i => (i, i % 31, i.toDouble)).toDF("id", "k", "v")
    val dir = tmp("graft-bkt-agg")
    Bucketing.writeBucketed(facts, "bkt_spec_agg", s"$dir/f", "k", 4)
    val agg = spark.table("bkt_spec_agg").groupBy("k")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
    val p = plan(agg)
    assert(!p.linesIterator.exists(_.trim.matches("""\(\d+\) Exchange.*""")),
      "aggregate on the bucket key must not shuffle:\n" + p)
    assert(agg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      == (0L until 31L).map(k => k -> (1000L / 31L + (if (k < 1000 % 31) 1 else 0))).toMap)
  }

  test("segmentRevenueBucketed: end-to-end equals the unbucketed aggregate") {
    val orders = (0L until 500L)
      .map(i => (i, i % 40, 10.25 * ((i % 7) + 1)))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val customer = (0L until 40L)
      .map(i => (i, s"c$i", Seq("AUTO", "HOME", "RETAIL")((i % 3).toInt)))
      .toDF("c_custkey", "c_name", "c_mktsegment")
    val dir = tmp("graft-bkt-e2e")
    val got = Bucketing.segmentRevenueBucketed(orders, customer, dir)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val want = orders.join(customer, $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment".as("mktsegment"))
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n_orders"),
        org.apache.spark.sql.functions.countDistinct($"c_custkey").as("n_customers"),
        org.apache.spark.sql.functions.sum($"o_totalprice".cast(
          org.apache.spark.sql.types.DecimalType(18, 2))).cast("double").as("revenue"))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(got == want && got.size == 3)
    // re-layout is idempotent: a second run over the same tables/paths
    // replaces the registration and files without error
    val again = Bucketing.segmentRevenueBucketed(orders, customer, dir)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(again == want)
  }
}

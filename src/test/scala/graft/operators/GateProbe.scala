package graft.operators

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Scratch probe (test scope): stage-level timing of nearDupRecallGate. */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.tuned(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    // warm
    Dedup.nearDupRecallGate(e, threshold = 0.4, bar = 0.95).collect()
    (1 to 2).foreach { i =>
      spark.catalog.clearCache(); System.gc()
      time(s"full gate #$i") {
        Dedup.nearDupRecallGate(e, threshold = 0.4, bar = 0.95).collect() }
    }
    spark.catalog.clearCache(); System.gc()
    val qids = time("qids") {
      val q = e.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
        .limit(200).select(col("vec_id"))
      q.count(); q
    }
    val sampled = e.join(broadcast(qids), "vec_id")
    val exactPairs = time("thresholdPairsFor (eager construction)") {
      Similarity.thresholdPairsFor(sampled, e, 0.4)
        .select(least(col("query_id"), col("cand_id")).as("a"),
          greatest(col("query_id"), col("cand_id")).as("b"))
        .distinct()
    }
    val rows = time("exactPairs collect") { exactPairs.collect() }
    println(s"[probe] exact pairs: ${rows.length}")
    val ids = exactPairs.select(col("a").as("vec_id"))
      .union(exactPairs.select(col("b").as("vec_id"))).distinct()
    time("pb collect") {
      Similarity.lshBuckets(e.join(broadcast(ids), "vec_id"),
        tables = 24, planes = 3).collect() }
    spark.stop()
  }
}

package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch measurement main (test scope, not shipped): pair-recall of
  * [[Dedup.semanticNearDup]] vs the exact sampled scan, across the
  * soft-assignment knob, at both driver SFs. */
object SemanticProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.tuned(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (tau <- Seq(0.4); sf <- Seq("0.001", "0.01", "0.1")) {
      spark.catalog.clearCache()
      System.gc()
      val emb = graft.sources.Tables.load(spark, s"/root/testdata/sf$sf", "embeddings")
      val qids = emb.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
        .limit(200).select("vec_id")
      val exact = Similarity.thresholdPairsFor(
          emb.join(broadcast(qids), "vec_id"), emb, tau)
        .select(least(col("query_id"), col("cand_id")).as("a"),
          greatest(col("query_id"), col("cand_id")).as("b"))
        .distinct().cache()
      val tot = exact.count()
      for (m <- Seq(4, 6, 8)) {
        val t0 = System.nanoTime()
        val pairs = Dedup.semanticNearDup(emb, threshold = tau, assignments = m)
        val nPairs = pairs.count()
        val matched = exact.join(pairs.select("a", "b"), Seq("a", "b"), "left_semi").count()
        println(f"PROBE sf=$sf m=$m recall=${matched.toDouble / tot}%.4f " +
          f"pairs=$nPairs exactSampled=$tot (${(System.nanoTime() - t0) / 1e9}%.1fs)")
      }
      exact.unpersist()
    }
    spark.stop()
  }
}

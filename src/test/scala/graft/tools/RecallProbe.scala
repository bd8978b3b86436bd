package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch measurement main (test scope, not shipped): run the ANN
  * recall-gate queries end-to-end at both driver SFs and time them. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.tuned(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    for (sf <- Seq("0.01", "0.1")) {
      spark.catalog.clearCache()
      System.gc()
      val emb = graft.sources.Tables.load(spark, s"/root/testdata/sf$sf", "embeddings")
      val qids = emb.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
        .limit(200).select("vec_id")
      val exact = graft.operators.Similarity.bruteForceTopKFor(
          emb.join(broadcast(qids), "vec_id"), emb, 5)
        .select("query_id", "neighbor_id")
      for ((name, ap) <- Seq(
          "ivf" -> graft.operators.IvfIndex.topK(emb, k = 5),
          "ivfpq" -> graft.operators.PqIndex.topK(emb, k = 5),
          "lsh" -> graft.operators.Similarity.lshTopK(emb, k = 5))) {
        val t0 = System.nanoTime()
        val apq = ap.select("query_id", "neighbor_id")
          .join(broadcast(qids.withColumnRenamed("vec_id", "query_id")), "query_id")
        val m = exact.join(apq, Seq("query_id", "neighbor_id"), "left_semi").count()
        val tot = exact.count()
        println(f"PROBE sf=$sf $name recall=${m.toDouble / tot}%.4f (${(System.nanoTime() - t0) / 1e9}%.1fs)")
      }
    }
    spark.stop()
  }
}

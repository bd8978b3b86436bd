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
    for (sf <- Seq("0.01", "0.1");
         q <- Seq("q_ann_ivf_recall", "q_ann_lsh_recall", "q_ann_ivf", "q_ann_lsh")) {
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.rawOps(q)(spark, s"/root/testdata/sf$sf")
      val out =
        if (q.endsWith("recall")) rows.collect().toSeq.mkString(" ")
        else { rows.write.format("noop").mode("overwrite").save(); "noop" }
      println(f"GATE sf=$sf $q%-18s ${(System.nanoTime() - t0) / 1e9}%6.2fs  $out")
    }
    spark.stop()
  }
}

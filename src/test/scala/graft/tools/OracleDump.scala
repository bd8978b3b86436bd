package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch (test scope, not shipped): dump a pinned-oracle query's
  * sf0.01 output as VALUES lines, for regenerating the hash-pinned
  * oracles (BpeEncodeOracle / UnigramEncodeOracle / SemanticOracle)
  * after an intentional trainer/encoder change. */
object OracleDump {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q_unigram_encode"
    val spark = graft.GraftSession.tuned(SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
    val cols = df.columns
    df.collect().foreach { r =>
      val cells = cols.indices.map { i =>
        r.get(i) match {
          case s: String => "'" + s + "'"
          case x => String.valueOf(x)
        }
      }
      println("VALUESROW (" + cells.mkString(",") + "),")
    }
    spark.stop()
  }
}

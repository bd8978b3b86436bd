package graft

import org.apache.spark.sql.SparkSession

/** Manual plan-audit runner (not a test): prints formatted plans of
  * the round's new queries at a given SF dir. */
object PlanAuditManual {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 32)
      .appName("plan-audit").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("q_min_cost_supplier", "q_theil_sen", "q_survival")) {
      println(s"===== $q =====")
      SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: is bloom_filter_agg/might_contain SQL-visible in this build? */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.tuned(SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val r = spark.sql(
        """WITH b AS (SELECT bloom_filter_agg(xxhash64(x), 100, 800) AS bf
          |           FROM VALUES ('a'), ('b') t(x))
          |SELECT might_contain(bf, xxhash64('a')) AS ha,
          |       might_contain(bf, xxhash64('zzz')) AS hz FROM b""".stripMargin)
      println("BLOOMPROBE " + r.collect().mkString(","))
    } catch { case e: Throwable => println("BLOOMPROBE FAILED: " + e.getMessage.take(200)) }
    spark.stop()
  }
}

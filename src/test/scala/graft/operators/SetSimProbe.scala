package graft.operators

import org.apache.spark.sql.{SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe (test scope): prefix-cut selectivity of setSimJoin. */
object SetSimProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.tuned(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val n = 3; val threshold = 0.5
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val nDocs = docs.count()
    println(s"[probe] docs: $nDocs")
    // mirror setSimJoin internals
    val m = Dedup.getClass.getDeclaredMethods.find(_.getName == "shingleKeys").get
    m.setAccessible(true)
    val sh = m.invoke(Dedup, docs, Int.box(n)).asInstanceOf[org.apache.spark.sql.DataFrame]
    sh.persist()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val freq = sh.groupBy("s1", "s2").agg(count(lit(1)).as("df"))
    println("[probe] shingle rows: " + sh.count())
    println("[probe] distinct shingles: " + freq.count())
    // df distribution of shingles
    freq.select(expr("percentile(df, array(0.5, 0.9, 0.99, 0.999, 1.0))").as("p"))
      .collect().foreach(r => println("[probe] df pctile 50/90/99/99.9/max: " + r.getSeq[Double](0).mkString(",")))
    val ranked = sh.join(freq, Seq("s1", "s2"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("s1"), col("s2"))))
      .join(sizes, "doc_id")
    val prefix = ranked
      .filter(col("rnk") <= col("sz") - ceil(col("sz") * threshold) + 1)
      .select("doc_id", "s1", "s2", "sz").persist()
    println("[probe] prefix rows: " + prefix.count())
    // posting-list sizes within prefixes (what the join squares)
    prefix.groupBy("s1", "s2").agg(count(lit(1)).as("pl"))
      .select(expr("percentile(pl, array(0.5, 0.99, 1.0))").as("p"), lit(1))
      .groupBy(lit(1)).agg(first("p").as("p"), count(lit(1)))
      .collect().foreach(r => println("[probe] prefix posting 50/99/max: " + r.getSeq[Double](1)))
    val cand = prefix.as("x").join(prefix.as("y"),
        col("x.s1") === col("y.s1") && col("x.s2") === col("y.s2") &&
        col("x.doc_id") < col("y.doc_id") &&
        least(col("x.sz"), col("y.sz")).cast("double") >=
          greatest(col("x.sz"), col("y.sz")) * threshold)
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
    val candRaw = time("candidate join count (pre-distinct)") { cand.count() }
    println(s"[probe] raw candidate rows: $candRaw")
    val candDistinct = time("candidate distinct count") { cand.distinct().count() }
    println(s"[probe] distinct candidate pairs: $candDistinct")
    val verified = time("full setSimJoin") {
      Dedup.setSimJoin(docs, n, threshold).count() }
    println(s"[probe] verified pairs: $verified")
    spark.stop()
  }
}

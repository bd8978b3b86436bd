package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for named rawOps to plans/<tag>/ —
  * the optimization rounds' plan-evidence artifacts
  * (`plans/r17/<query>_before.txt` / `_after.txt`). For lifecycle
  * queries (which execute their commits inside the rawOp call) the
  * dumped plan is the returned census read — the steady-state plan the
  * lifecycle proves. Diagnostic only — not part of the driver
  * contract. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val suffix = args(1) // e.g. "before" | "after"
    val outDir = java.nio.file.Paths.get(
      sys.env.getOrElse("GRAFT_PLANS_DIR", "plans/r17"))
    java.nio.file.Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val df = SparkEntry.rawOps(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        outDir.resolve(s"${n}_$suffix.txt"), txt)
      println(s"[plandump] wrote ${n}_$suffix.txt")
    }
    spark.stop()
  }
}

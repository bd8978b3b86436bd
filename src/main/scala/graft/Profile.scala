package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.concurrent.TrieMap

/** Measurement harness (optimization guide §1): run named rawOps with a
  * job listener so wall-clock decomposes into Spark jobs (with call
  * sites) and the GAPS between them (driver-side planning/commit work).
  * Writes a per-job trace to /tmp/profile_jobs.txt. Diagnostic only —
  * not part of the driver contract. */
object Profile {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = new java.io.PrintWriter(
      sys.env.getOrElse("GRAFT_PROFILE_OUT", "/tmp/profile_jobs.txt"))
    @volatile var q0 = System.nanoTime()
    @volatile var lastEnd = 0.0
    val starts = TrieMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val execId = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
          .getOrElse("-")
        // first graft frame across ALL stage submission stacks —
        // attributes the job to the operator that launched it (AQE
        // sub-stage jobs often only carry Spark-internal frames)
        val fromStack = js.stageInfos.iterator.flatMap(si =>
          si.details.linesIterator.map(_.trim)
            .find(l => l.contains("graft.") && !l.contains("Profile")))
          .toSeq.headOption
        val desc = s"exec=$execId ${fromStack.getOrElse("")}"
        starts(js.jobId) = (System.nanoTime(), desc)
      }
      override def onOtherEvent(
          event: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        event match {
          case e: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            val t = (System.nanoTime() - q0) / 1e9
            out.synchronized { out.println(
              f"sqlexec ${e.executionId}%4d START t=$t%8.3f  ${e.description.linesIterator.nextOption().getOrElse("")}") }
          case e: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionEnd =>
            val t = (System.nanoTime() - q0) / 1e9
            out.synchronized { out.println(
              f"sqlexec ${e.executionId}%4d END   t=$t%8.3f") }
          case _ => ()
        }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        starts.remove(je.jobId).foreach { case (t0, desc) =>
          val s = (t0 - q0) / 1e9
          val e = (System.nanoTime() - q0) / 1e9
          val gap = s - lastEnd
          lastEnd = math.max(lastEnd, e)
          out.synchronized {
            out.println(f"job ${je.jobId}%4d  start=$s%8.3f  dur=${e - s}%7.3f  gap=$gap%7.3f  $desc")
          }
          out.flush()
        }
      }
    })
    // warmup dir: a sibling sf0.001 of the measured dir when present
    // (portable), else the measured dir itself — overridable
    val warmDir = sys.env.getOrElse("GRAFT_PROFILE_WARM_DIR", {
      val sib = java.nio.file.Paths.get(sfDir).resolveSibling("sf0.001")
      if (java.nio.file.Files.isDirectory(sib)) sib.toString else sfDir
    })
    names.foreach { n =>
      val fn = SparkEntry.rawOps(n)
      try fn(spark, warmDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        out.println(s"[$n] warmup failed: ${e.getMessage}") }
      // two measured runs: run 1 pays residual JIT/codegen (observed
      // 63 s cold vs 8.9 s warm on the MV lifecycle); run 2's trace is
      // the one that matches the bench's confirmed-min methodology
      (1 to 2).foreach { r =>
        spark.catalog.clearCache()
        System.gc()
        Thread.sleep(200) // let the async listener bus drain
        out.synchronized { out.println(s"=== $n run$r (dir=$sfDir) ===") }
        q0 = System.nanoTime(); lastEnd = 0.0
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        out.synchronized { out.println(f"=== $n run$r total ${(System.nanoTime() - q0) / 1e9}%.2f s ===") }
        out.flush()
      }
    }
    out.close()
    spark.stop()
  }
}

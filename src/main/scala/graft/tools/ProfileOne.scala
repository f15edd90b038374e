package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: per-stage cost breakdown of ONE catalog query — stage id,
  * executor run/CPU time, records and shuffle bytes in/out, plus the first
  * line of the stage's detail site so the stage maps back to an operator.
  * Runs untimed warm-ups like Bench, then one profiled execution.
  *
  * `runMain graft.tools.ProfileOne q174_pagerank [sfDir] [warmups]`
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: ProfileOne <query> [sfDir] [warmups]"))
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val warmups = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (t <- graft.core.Tables.all)
      try graft.core.Tables.load(spark, dir, t).count()
      catch { case _: Throwable => }
    def run(): Unit = graft.SparkEntry.queries(name)(spark, dir)
      .write.format("noop").mode("overwrite").save()
    for (_ <- 1 to warmups) run()
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[
      SparkListenerStageCompleted]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stages.add(sc)
    })
    val t0 = System.nanoTime()
    run()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    val st = stages.toArray(Array.empty[SparkListenerStageCompleted])
      .sortBy(_.stageInfo.stageId)
    var totRun = 0L; var totCpu = 0L
    println(f"== $name wall=$wall%.3f s, ${st.length} stages ==")
    println("stage tasks   run_ms   cpu_ms    in_rec  shuf_r_rec  shuf_w_rec  shuf_w_MB  site")
    for (s <- st) {
      val si = s.stageInfo
      val m = si.taskMetrics
      val site = si.details.linesIterator.find(l =>
          l.contains("graft") && !l.contains("ProfileOne"))
        .getOrElse(si.name).trim.take(90)
      totRun += m.executorRunTime; totCpu += m.executorCpuTime / 1000000
      println(f"${si.stageId}%5d ${si.numTasks}%5d ${m.executorRunTime}%8d " +
        f"${m.executorCpuTime / 1000000}%8d ${m.inputMetrics.recordsRead}%9d " +
        f"${m.shuffleReadMetrics.recordsRead}%11d " +
        f"${m.shuffleWriteMetrics.recordsWritten}%11d " +
        f"${m.shuffleWriteMetrics.bytesWritten / 1e6}%10.2f  $site")
    }
    println(f"== totals: run=${totRun / 1e3}%.2f s cpu=${totCpu / 1e3}%.2f s ==")
    spark.stop()
  }
}

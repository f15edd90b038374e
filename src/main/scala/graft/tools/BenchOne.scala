package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time ONE catalog query exactly the way Bench does (warmup
  * table counts + q01, then noop-sink materialization), repeated N times —
  * isolates a query's bench cost from whole-suite effects.
  * `runMain graft.tools.BenchOne q61_pii_redact [sfDir] [reps]`
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: BenchOne <query> [sfDir] [reps]"))
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (t <- graft.core.Tables.all)
      try graft.core.Tables.load(spark, dir, t).count()
      catch { case _: Throwable => }
    try graft.SparkEntry.queries("q01_pricing_summary")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages.add((si.stageId,
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          si.taskMetrics.executorRunTime))
      }
    })
    for (r <- 1 to reps) {
      stages.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let listener drain
      val st = stages.toArray(Array.empty[(Int, Long, Long)])
      val stageWall = st.map(_._2).sum / 1e3
      val exec = st.map(_._3).sum / 1e3
      println(f"rep=$r elapsed=$wall%.3f stages=${st.length} " +
        f"stageWall=$stageWall%.2f execRun=$exec%.2f " +
        f"driverGap=${wall - stageWall}%.2f")
    }
    spark.stop()
  }
}

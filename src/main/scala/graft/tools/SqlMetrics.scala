package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.util.QueryExecutionListener

/** Dev tool: run ONE catalog query and print the EXECUTED plan tree with
  * per-operator SQL metrics (rows, time) — locates which operator burns
  * the CPU that stage-level metrics only bound.
  * `runMain graft.tools.SqlMetrics <query> [sfDir] [warmups]`
  */
object SqlMetrics {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: SqlMetrics <query> [sfDir] [warmups]"))
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val warmups = args.lift(2).map(_.toInt).getOrElse(1)
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
    @volatile var last: org.apache.spark.sql.execution.QueryExecution = null
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit = last = qe
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    })
    val t0 = System.nanoTime()
    run()
    println(f"wall ${(System.nanoTime() - t0) / 1e9}%.3f s")
    Thread.sleep(1000)
    println("planning phases (ms): " + last.tracker.phases.map {
      case (k, v) => s"$k=${v.durationMs}" }.mkString(" "))
    val rules = last.tracker.topRulesByTime(8).map { case (r, s) =>
      f"${r.split('.').last}=${s.totalTimeNs / 1e6}%.0f" }.mkString(" ")
    println("top rules (ms): " + rules)
    def walk(p: SparkPlan, depth: Int): Unit = {
      val interesting = p.metrics.toSeq
        .filter { case (_, m) => m.value > 0 }
        .sortBy(_._1)
        .map { case (k, m) => s"$k=${m.value}" }
        .mkString(" ")
      println(("  " * depth) + p.nodeName + "  " + interesting.take(220))
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1)
        case q: QueryStageExec => walk(q.plan, depth + 1)
        case _ => p.children.foreach(walk(_, depth + 1))
      }
      p.subqueries.foreach { sq => println(("  " * depth) + "SUBQUERY:");
        walk(sq, depth + 1) }
    }
    walk(last.executedPlan, 0)
    spark.stop()
  }
}

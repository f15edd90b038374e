package graft.tools

import java.nio.file.{Files, Paths}

import graft.SparkEntry
import graft.core.GraftSession

/** Dev tool: dump `.explain("formatted")` for named catalog queries to
  * files — the r17 optimization round's before/after plan evidence
  * (`plans/r17/<query>_<tag>.txt`).
  *
  * `runMain graft.tools.PlanDump <tag> <outDir> q174_pagerank,q186_...`
  * (query list `all` dumps the whole catalog).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse(
      sys.error("usage: PlanDump <tag> <outDir> <q1,q2,...|all> [sfDir]"))
    val outDir = args(1)
    val names: Seq[String] =
      if (args(2) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(2).split(",").toSeq
    val dir = args.lift(3).getOrElse("/root/testdata/sf0.01")
    Files.createDirectories(Paths.get(outDir))
    val spark = GraftSession.local(8)
    for (name <- names) {
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), plan)
        println(s"[plandump] $name -> ${name}_$tag.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan (and timed row count) of any
  * catalog query — `runMain graft.tools.ExplainQuery q51_simhash_neardup
  * [sfDir]`. The loop that keeps plans honest: every operator gets its
  * `.explain("formatted")` read before it ships.
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: ExplainQuery <queryName> [sfDir]"))
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.Queries.queries(name)(spark, dir)
    df.explain("formatted")
    // run twice: first includes codegen/janino compile + scan-cache cold
    // start, second is the steady-state cost a repeated query pays
    for (pass <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = graft.Queries.queries(name)(spark, dir).collect().length
      println(f"pass=$pass rows=$n elapsed=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}

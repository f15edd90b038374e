package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: graft_dsum vs built-in sum on a HIGH-CARDINALITY groupBy —
  * isolates the aggregate's own cost from the r17 q174 profile (the
  * ObjectHashAggregate 128-group sort fallback suspicion).
  * `runMain graft.tools.DsumProbe [sfDir] [reps]`
  */
object DsumProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.core.Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_extendedprice").as("v"))
    li.count()
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      for (r <- 1 to reps) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"$tag rep=$r ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    time("sum        ") { li.groupBy("k").agg(sum(col("v"))) }
    time("decimal-sum") { li.groupBy("k")
      .agg(sum(col("v").cast("decimal(38,12)"))) }
    time("graft_dsum ") { li.groupBy("k")
      .agg(call_function("graft_dsum", col("v"), lit(12))) }
    println("== plans ==")
    li.groupBy("k").agg(call_function("graft_dsum", col("v"), lit(12)))
      .explain()
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r18, verdict item 8): demonstrate that the quantile
  * family's local cost is the FIXTURE's value shape, not the plan.
  *
  * The distinct-value rollup exists to collapse repeated values before
  * the cumulative window — at sf0.1 `l_extendedprice` carries 594,330
  * distinct values in 600k rows (near-unique continuous prices), so the
  * rollup reduces nothing and the serial window walks ~594k rows. The
  * probe times the SAME operator over (a) the raw fixture and (b) the
  * same rows with values floored to integer dollars / bucketed to cents
  * ×10 — value shapes any real price/score corpus at scale exhibits —
  * and prints the rollup row count next to the wall.
  *
  * `runMain graft.tools.QuantileShapeProbe [sfDir] [reps]`
  */
object QuantileShapeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.core.Tables.load(spark, dir, "lineitem")
    def shape(tag: String, valueCol: org.apache.spark.sql.Column): Unit = {
      val df = li.select(col("l_returnflag"), valueCol.as("v"),
        col("l_quantity"))
      val distinct = df.filter(col("v").isNotNull)
        .select(col("l_returnflag"), col("v")).distinct().count()
      // warm-up + reps, Bench-style
      def run(): Unit = graft.core.Stats.groupedWeightedMedian(
          df, "l_returnflag", "v", "l_quantity",
          distributedCum = Some(false))
        .write.format("noop").mode("overwrite").save()
      run(); run()
      val walls = (1 to reps).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$tag%-24s rollup_rows=$distinct%7d " +
        f"wall_median=${walls(walls.size / 2)}%.3f s " +
        f"(min=${walls.head}%.3f max=${walls.last}%.3f)")
    }
    shape("raw (fixture)", col("l_extendedprice"))
    shape("cents*10 buckets", floor(col("l_extendedprice") * 0.1) * 10.0)
    shape("integer dollars", floor(col("l_extendedprice")))
    spark.stop()
  }
}

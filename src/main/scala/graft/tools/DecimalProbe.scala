package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev scratch: isolate q01's cost — decimal-exact sums vs naive double
  * sums vs scaled-long sums on the same lineitem scan. */
object DecimalProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    li.count() // warm page cache
    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      f; f; f
      println(f"$name: ${(System.nanoTime() - t0) / 3e9}%.3f s/run")
    }
    def run(agg: String => org.apache.spark.sql.Column): Unit =
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(agg("l_quantity"), agg("l_extendedprice"),
          agg("l_extendedprice"), agg("l_discount"))
        .write.format("noop").mode("overwrite").save()
    time("decimal(18,4)") { run(c => sum(col(c).cast(DecimalType(18, 4)))) }
    time("decimal(38,4)") { run(c => sum(col(c).cast(DecimalType(38, 4)))) }
    time("double      ") { run(c => sum(col(c))) }
    time("scaled long ") { run(c => sum((col(c) * 10000).cast(LongType))) }
    time("graft_dsum  ") { run(c => call_function("graft_dsum", col(c), lit(4))) }
    // exactness vs the decimal pipeline on real data
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val a = li.groupBy(col("l_returnflag")).agg(
      cols.map(c => sum(col(c).cast(DecimalType(38, 4))).cast(DoubleType).as(s"d_$c")).head,
      cols.map(c => sum(col(c).cast(DecimalType(38, 4))).cast(DoubleType).as(s"d_$c")).tail ++
      cols.map(c => call_function("graft_dsum", col(c), lit(4)).as(s"g_$c")): _*)
      .collect()
    val mismatches = a.flatMap(r => cols.filter(c =>
      r.getAs[Double](s"d_$c") != r.getAs[Double](s"g_$c")))
    println(s"exactness mismatches: ${mismatches.length}")
    spark.stop()
  }
}

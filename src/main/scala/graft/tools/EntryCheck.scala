package graft.tools

import graft.SparkEntry
import graft.core.GraftSession

/** Dev scratch: drive SparkEntry.entry exactly as the driver's smoke does
  * (rows > 0 on sf0.001). */
object EntryCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"entry rows=${rows.length}")
    df.show(10, false)
    require(rows.nonEmpty, "driver smoke would FAIL: entry returned 0 rows")
    spark.stop()
  }
}

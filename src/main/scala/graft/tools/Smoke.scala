package graft.tools

import graft.core.{GraftSession, Tables}

/** Dev scratch: print schemas + sanity counts. Not part of the library API. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    for (t <- Tables.all) {
      val df = Tables.load(spark, dir, t)
      println(s"== $t count=${df.count()}")
      df.printSchema()
    }
    val ev = Tables.events(spark, dir)
    ev.select("ts", "ts_sec", "ts_t").show(3, false)
    spark.stop()
  }
}

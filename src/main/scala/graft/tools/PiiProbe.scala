package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: isolate q61 cost — card build vs scan vs redact vs join. */
object PiiProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    val card = graft.core.Tables.load(spark, dir, "customer")
      .select(col("c_custkey"),
        concat(lit("reach "), col("c_name"), lit(" <"),
          lower(regexp_replace(col("c_name"), "#", ".")), lit("@"),
          lower(col("c_mktsegment")), lit(".example.com> tel "),
          (lit(10) + pmod(col("c_nationkey"), lit(25))).cast("string"), lit("-"),
          lpad(pmod(col("c_custkey"), lit(1000)).cast("string"), 3, "0"), lit("-"),
          lpad(pmod(col("c_custkey") * 31, lit(1000)).cast("string"), 3, "0"), lit("-"),
          lpad(pmod(col("c_custkey") * 7919, lit(10000)).cast("string"), 4, "0"),
          lit(" host 10.0."), pmod(col("c_custkey"), lit(256)).cast("string"),
          lit("."), pmod(col("c_nationkey"), lit(256)).cast("string")).as("txt"))
    time("card only")(card.agg(sum(length(col("txt")))).collect()(0).getLong(0))
    time("scan")(graft.operators.Pii.scan(card, "c_custkey", "txt")
      .agg(sum(col("pii_total"))).collect()(0).getLong(0))
    time("redact")(graft.operators.Pii.redact(card, "c_custkey", "txt")
      .agg(sum(length(col("redacted")))).collect()(0).getLong(0))
    time("scan+redact join") {
      val s = graft.operators.Pii.scan(card, "c_custkey", "txt")
      val r = graft.operators.Pii.redact(card, "c_custkey", "txt")
      s.join(r, Seq("c_custkey")).count()
    }
    time("full q61")(graft.Queries8.catalog.find(_._1 == "q61_pii_redact").get
      ._2.fn(spark, dir).count())
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic (r13): mechanical baseline for the q195 watch item —
  * candidate/pair volumes of the containment join as a function of the
  * CURRENT documents.parquet, so an r14 wall-time drift can be split into
  * "input distribution moved" vs "plan/code moved" without guesswork. */
object PairStatsDev {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master("local[16]")
        .config("spark.sql.shuffle.partitions", 16)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val n = 4; val t = 0.35
    val tk = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"), explode(call_function("graft_shingle_hash",
        col("w"), lit(n))).as("h"))
    tk.cache()
    val sizes = tk.groupBy("doc_id").agg(count(lit(1)).as("n"))
    println("== doc gram-set sizes ==")
    sizes.agg(count(lit(1)).as("docs"), min("n"), expr("percentile(n, 0.5)"),
      expr("percentile(n, 0.9)"), max("n"), sum("n")).show(false)
    val dfreq = tk.groupBy("h").agg(count(lit(1)).as("df"))
    println("== gram df distribution ==")
    dfreq.agg(count(lit(1)).as("distinct_grams"), expr("percentile(df, 0.5)"),
      expr("percentile(df, 0.99)"), max("df")).show(false)
    val prefixLen = sizes.select(col("doc_id"),
      (floor((lit(1.0) - lit(t)) * col("n") + lit(1e-9)) + 1).as("p"))
    println("== prefix rows total ==")
    prefixLen.agg(sum("p")).show(false)
    // candidate pairs exactly as containmentJoin builds them
    val kept = tk.join(dfreq, "h")
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df").asc, col("h").asc)
    val prefix = kept.withColumn("rk", row_number().over(wDoc))
      .join(sizes, "doc_id")
      .filter(col("rk") <= floor((lit(1.0) - lit(t)) * col("n") + lit(1e-9)) + 1)
      .select(col("doc_id").as("id_a"), col("h"))
    val candRows = prefix.join(tk.select(col("h"),
        col("doc_id").as("id_b")), "h")
      .filter(col("id_a") =!= col("id_b"))
    println(s"== candidate rows (pre-distinct): ${candRows.count()}")
    println(s"== candidate pairs (distinct): " +
      s"${candRows.select("id_a", "id_b").distinct().count()}")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe for the LSH margin-mining scale knob: times
  * [[graft.operators.Similarity.marginMiningLsh]] at a given `planes`
  * and reports the candidate-pair count — the evidence that raising
  * `planes` with log₂(corpus) holds per-bucket occupancy (and therefore
  * cost) flat as the data grows.
  * `runMain graft.tools.MarginProbe <sfDir> <planes> [reps]` */
object MarginProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val planes = args.lift(1).map(_.toInt).getOrElse(8)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    emb.count() // warm scan
    // candidate count: the bucket-join size before scoring
    val b = graft.operators.Similarity.lshBuckets(
      emb.filter(col("label").isin(0, 1)), "vec_id", "embedding",
      planes, 42, 64)
      .join(emb.select(col("vec_id"), col("label")), "vec_id")
    val s = b.filter(col("label") === 0).select(col("bucket"), col("vec_id").as("s"))
    val t = b.filter(col("label") === 1).select(col("bucket"), col("vec_id").as("t"))
    val nCand = s.join(t, "bucket").count()
    def run(): Double = {
      val t0 = System.nanoTime()
      graft.operators.Similarity.marginMiningLsh(emb, "vec_id", "embedding",
          "label", 0, 1, kNeigh = 4, topK = 50, planes = planes)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warm-up (Bench convention)
    val ts = (1 to reps).map { _ => System.gc(); run() }.sorted
    println(f"dir=$dir planes=$planes candidates=$nCand " +
      f"median=${ts(ts.size / 2)}%.3f min=${ts.head}%.3f max=${ts.last}%.3f")
    spark.stop()
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located joins — the storage-level answer
  * to the one shuffle Catalyst cannot remove: a big⋈big equi-join on a
  * key neither side is partitioned by. Writing both sides bucketed (and
  * sorted) on the join key pins rows to hash buckets at WRITE time, so
  * every later join or aggregation on that key plans with zero Exchange —
  * at 100 TB that converts the nightly fact⋈fact join from a full
  * two-sided shuffle into a metadata lookup. The reference engine has no
  * equivalent (single-node, no joins); this is Spark-native capability
  * the engine exposes for its own tables.
  *
  * The trade: bucketed layout costs one shuffle-by-key at write time and
  * fixes the bucket count, so it pays off for keys joined or aggregated
  * repeatedly (user_id, doc content-hash), not ad-hoc exploration.
  * Bucket-pruning on point lookups is a further read-side win.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted external parquet table registered
    * under `name` at `path`. `overwrite` drops any previous registration
    * (the catalog entry, not just the files — stale bucketing metadata is
    * worse than none, since Spark would trust it and skip a needed
    * shuffle).
    */
  def writeBucketed(df: DataFrame, name: String, path: String,
      keyCol: String, buckets: Int): Unit = {
    require(buckets > 0, "buckets must be positive")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    df.write
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .option("path", path)
      .mode(SaveMode.Overwrite)
      .saveAsTable(name)
  }

  /** Read a bucketed table back WITH its bucketing metadata (a plain
    * `spark.read.parquet(path)` would see the same rows but lose the
    * layout guarantee and re-shuffle on join). */
  def readBucketed(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}

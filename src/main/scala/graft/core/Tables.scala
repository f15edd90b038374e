package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All loads are plain `spark.read.parquet` so Catalyst gets full pushdown:
  * column pruning and predicate pushdown reach the parquet scan, row-group
  * min/max stats give block skipping (the Spark-native equivalent of the
  * reference's zone maps, /root/reference/src/lib/table_block_io.go:110-182).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Plain `spark.read.parquet` — measured choice: a blanket "spread
    * under-split tables" repartition here was tried and REGRESSED the
    * bench ~40% (at this data size the added exchange + 32-task stage
    * overhead dwarfs the scan-stage parallelism it buys; queries whose
    * scan compute IS heavy enough spread locally — see
    * Dedup.minhashBands). */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events with `ts` normalized: raw file stores TIMESTAMP(NANOS) which we
    * read as a long (nanosAsLong); expose both epoch-second `ts_sec` (the
    * sybil time-column convention — int64 unix seconds,
    * /root/reference/src/lib/record.go:12) and a proper timestamp `ts_t`.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "events")
    // integer floor-div keeps this exact (double division would round at
    // 2^53); matches DuckDB `epoch_ns(ts) // 1000000000` in the oracle SQL
    val tsSec = expr("ts div 1000000000")
    df.withColumn("ts_sec", tsSec)
      .withColumn("ts_t", timestamp_seconds(tsSec))
  }
}

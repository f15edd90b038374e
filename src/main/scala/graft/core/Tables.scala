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
    * Dedup.minhashBands).
    *
    * r17: the resolved relation is memoized PER SESSION AND PATH —
    * `spark.read.parquet` re-lists the directory and re-reads parquet
    * footers on every call, which the bench pays per query
    * CONSTRUCTION (measured in the r17 driver-gap audit: construction,
    * not execution). The memo reuses the logical relation only — no
    * data is cached; the driver tables are read-only inputs, and
    * sessions die with their WeakHashMap key. Reusing one relation
    * object also makes plan-fragment canonicalization exact for the
    * bounded PlanCache. */
  /** r18 (ADVICE): values hold the memoized DataFrame through a
    * SoftReference — a cached DataFrame strongly references its
    * SparkSession (the WeakHashMap KEY), so strong values would pin
    * every entry forever (the classic WeakHashMap value-refs-key
    * pitfall). Soft values break that pin the moment the heap wants the
    * space: cleared ref ⇒ the session becomes weakly reachable ⇒ the
    * entry goes too. A cleared entry just re-reads the footer — the memo
    * is a metadata cache, never a correctness dependency. */
  private val relCache =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[
        String, java.lang.ref.SoftReference[DataFrame]]]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = relCache.synchronized {
      var m = relCache.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[
          String, java.lang.ref.SoftReference[DataFrame]]()
        relCache.put(spark, m)
      }
      m
    }
    val path = s"$dir/$name.parquet"
    val hit = Option(perSession.get(path)).flatMap(r => Option(r.get))
    hit.getOrElse {
      val df = spark.read.parquet(path)
      perSession.put(path, new java.lang.ref.SoftReference(df))
      df
    }
  }

  /** events with `ts` normalized to EPOCH NANOSECONDS (long) regardless of
    * the file's physical type — the generator has shipped both
    * TIMESTAMP(NANOS) (which Spark reads as a long already) and
    * micro-precision TIMESTAMP/TIMESTAMP_NTZ (which convert exactly via
    * `unix_micros · 1000`; the session timezone is pinned UTC so the NTZ
    * cast is wall-clock-identity). Downstream code and the DuckDB oracles
    * (`epoch_ns(ts)`) both see the same nano longs either way. Also
    * exposes epoch-second `ts_sec` (the sybil time-column convention —
    * int64 unix seconds, /root/reference/src/lib/record.go:12) and a
    * proper timestamp `ts_t`.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = load(spark, dir, "events")
    val df = raw.schema("ts").dataType match {
      case LongType => raw
      case TimestampType =>
        raw.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case _: TimestampNTZType =>
        raw.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case other => throw new IllegalArgumentException(
        s"events.ts: unsupported physical type $other")
    }
    // integer floor-div keeps this exact (double division would round at
    // 2^53); matches DuckDB `epoch_ns(ts) // 1000000000` in the oracle SQL
    val tsSec = expr("ts div 1000000000")
    df.withColumn("ts_sec", tsSec)
      .withColumn("ts_t", timestamp_seconds(tsSec))
  }
}

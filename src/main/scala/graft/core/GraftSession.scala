package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Local test harness runs `local[32]` in one JVM; the same settings are
  * what we would ship for a multi-executor cluster (AQE on, modest shuffle
  * partition count that AQE coalesces/expands at runtime).
  */
object GraftSession {

  /** Apply graft's standard config to any builder (used by mains/tests). */
  def configure(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // events.parquet is written with TIMESTAMP(NANOS); Spark has no nanos
      // timestamp type — read as long (nanoseconds since epoch) and convert
      // explicitly where needed.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      // TypedImperativeAggregates (graft_dsum, hist/tdigest/HLL states)
      // run under ObjectHashAggregateExec, whose in-memory map flips to
      // a SORT-BASED fallback after 128 (!) distinct groups per task —
      // the r17 q174 profile showed numTasksFallBacked=32 on every
      // partial dsum aggregation (421k groups), i.e. the catalog's
      // high-cardinality decimal sums were silently sort-aggregating.
      // 256k entries of (key + fixed 32-byte dsum buffer + map overhead)
      // is ~32 MB per task — a sane hash-agg budget at ANY scale; tasks
      // past it still fall back gracefully, so this is a threshold fix,
      // not a memory bet.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "262144")
      // native expressions (graft_dot with codegen)
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.ui.enabled", "false")

  /** `maxTaskFailures > 1` enables local-mode task retry (the
    * `local[N,F]` master form) — a cluster has this by default
    * (spark.task.maxFailures=4); local mode fails the job on the first
    * task error unless asked. The chaos/recovery specs need one retry. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
      maxTaskFailures: Int = 1): SparkSession = {
    val master =
      if (maxTaskFailures > 1) s"local[$cores,$maxTaskFailures]"
      else s"local[$cores]"
    val s = configure(
      SparkSession
        .builder()
        .master(master)
        .appName("graft")
        .config("spark.sql.shuffle.partitions", cores.toString)
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

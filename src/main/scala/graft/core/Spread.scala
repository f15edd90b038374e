package graft.core

import org.apache.spark.sql.DataFrame

/** Guarded round-robin spread for CPU-dense work sitting directly on a
  * NARROW source (guide §2.5 "input skew: one huge unsplittable file").
  *
  * The driver tables ship as single-row-group parquet, so every scan is
  * one task; operators whose per-row kernels are expensive (tokenize +
  * shingle/minhash/winnow hashing, per-token md5, banded Levenshtein)
  * would otherwise run single-threaded until their first exchange. The
  * spread pays one exchange of the narrow rows to buy the session's full
  * parallelism — the bootstrapMeans/minhashBands pattern, shared.
  *
  * Scale behavior: at real scale inputs carry thousands of row groups,
  * `getNumPartitions * 2 >= cores` holds, and this is the identity — the
  * repartition only fires for scans narrower than half the session's
  * parallelism. Round-robin repartition is deterministic under retry
  * (sort-before-repartition, SPARK-23207) and every caller's downstream
  * is row-order independent.
  */
object Spread {
  def narrow(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < cores) df.repartition(cores) else df
  }
}

package graft.core

import org.apache.spark.sql.DataFrame

/** Guarded round-robin spread for CPU-dense work sitting directly on a
  * NARROW source (guide §2.5 "input skew: one huge unsplittable file").
  *
  * The driver tables ship as single-row-group parquet, so every scan is
  * one task; operators whose per-row kernels are expensive (tokenize +
  * shingle/minhash/winnow hashing, per-token md5, banded Levenshtein)
  * would otherwise run single-threaded until their first exchange. The
  * spread pays one exchange of the narrow rows to buy parallelism — the
  * bootstrapMeans/minhashBands pattern, shared.
  *
  * r18 changes, both from the r17 verdict:
  *
  *  - The scan width comes from the LOGICAL plan's leaf file-size stats
  *    (`sizeInBytes / filesMaxPartitionBytes`), not `df.rdd`
  *    .getNumPartitions — materializing the RDD forced a full physical
  *    planning pass per invocation at query-CONSTRUCTION time (the
  *    ADVICE item), paid again for every rep of every wrapped operator.
  *  - The spread TARGET scales with the input
  *    (`min(cores, inputBytes / bytesPerTask)`) instead of jumping to
  *    full parallelism: r17 spread kilobyte candidate frames over 32
  *    partitions, and the per-task fixed cost (scheduling + 32-way
  *    cached reads in every downstream stage) made q85/q195 SLOWER at 32
  *    cores than at 8 in the same round. 64 KB of text per task keeps a
  *    heavy kernel busy ~100 ms — small enough to spread real corpora,
  *    large enough that a 25-doc fixture stays on a few tasks.
  *
  * Scale behavior unchanged: at real scale inputs carry thousands of row
  * groups, the estimated scan width exceeds `cores / 2`, and this is the
  * identity — as it is for unknown (non-file) leaf sizes, which report
  * the `defaultSizeInBytes` sentinel. Round-robin repartition is
  * deterministic under retry (sort-before-repartition, SPARK-23207) and
  * every caller's downstream is row-order independent.
  */
object Spread {
  def narrow(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val cores = spark.sparkContext.defaultParallelism
    val conf = spark.sessionState.conf
    val sentinel = BigInt(conf.defaultSizeInBytes)
    val leafSizes =
      try df.queryExecution.optimizedPlan.collectLeaves()
        .map(_.stats.sizeInBytes)
      catch { case _: Throwable => return df }
    // non-file leaves (in-memory relations, RDD-backed frames) report the
    // sentinel, not a measurement — treat as "wide enough", the behavior
    // real inputs get
    if (leafSizes.isEmpty || leafSizes.exists(_ >= sentinel)) return df
    val bytes = leafSizes.sum
    val scanParts =
      ((bytes + conf.filesMaxPartitionBytes - 1) /
        conf.filesMaxPartitionBytes).toInt.max(1)
    if (scanParts * 2 >= cores) return df
    val perTask = BigInt(spark.conf
      .getOption("spark.graft.spread.bytesPerTask")
      .map(_.trim.toLong).getOrElse(65536L))
    val target = (((bytes + perTask - 1) / perTask).max(1)
      .min(BigInt(cores))).toInt
    if (target <= scanParts) df else df.repartition(target)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed total-order ranking.
  *
  * `row_number() OVER (ORDER BY …)` with no PARTITION BY collapses the
  * whole dataset into ONE window task — the classic driver-shaped
  * bottleneck that works at 60k rows and dies at 100 TB. The scalable
  * form is the two-phase rank every shuffle-sort engine uses internally:
  * range-partition on the sort key, rank locally per partition, then add
  * each partition's global offset (the running sum of preceding
  * partitions' row counts — a |partitions|-row window, not a |rows|-row
  * one).
  */
object Ranking {

  /** Global 1-based `row_number` by `sortCols` (must be a total order —
    * include a unique tiebreak column, or ranks become nondeterministic).
    *
    * Phase 1 range-partitions and ranks within each range;
    * phase 2 computes per-partition counts (|partitions| rows), turns
    * them into exclusive prefix offsets with a tiny single-task window,
    * and broadcast-joins them back. The input is scanned twice (once for
    * counts, once for output) — at scale, cache/checkpoint the ranked
    * intermediate if the upstream is expensive.
    */
  def globalRowNumber(df: DataFrame, sortCols: Seq[Column],
      outCol: String = "rn", partitions: Int = 0): DataFrame = {
    // the checkpoint pins the SAMPLED range partitioning: the offsets
    // branch and the output branch both consume `ranged`, and while
    // ReuseExchange normally makes that one shuffle, a recomputation
    // would re-SAMPLE different boundaries and silently corrupt ranks —
    // correctness must not hinge on an optimizer rule. Executor-local by
    // default; reliable under spark.graft.checkpointDir (Checkpoints).
    val ranged = graft.core.Checkpoints.pin(
      (if (partitions > 0) df.repartitionByRange(partitions, sortCols: _*)
       else df.repartitionByRange(sortCols: _*))
        .withColumn("__pid", spark_partition_id()))
    // local rank: the window's hash shuffle on __pid keeps each range
    // together; order within is re-established by sortCols
    val local = ranged.withColumn("__lrn",
      row_number().over(Window.partitionBy(col("__pid")).orderBy(sortCols: _*)))
    val offsets = local.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off",
        coalesce(sum(col("__cnt")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offsets), "__pid")
      .withColumn(outCol, col("__off") + col("__lrn"))
      .drop("__pid", "__lrn", "__off")
  }
}

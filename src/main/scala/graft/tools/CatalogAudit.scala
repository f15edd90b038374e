package graft.tools

import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

import graft.SparkEntry
import graft.core.GraftSession

/** Catalog-wide plan audit: walks EVERY catalog query's physical plan and
  * flags the three structural scale-killers —
  *
  *  - `CartesianProductExec` / `BroadcastNestedLoopJoinExec` (all-pairs
  *    shapes; legitimate only when one side is a bounded probe/model
  *    frame),
  *  - `WindowExec` with an EMPTY partition spec (single-task window over
  *    the whole input — fine over stage-bounded rollups, fatal over raw
  *    corpus rows),
  *  - global `SortExec` that does not feed a limit (full-sort output).
  *
  * The per-query PlanSpec assertions pin the load-bearing cases; this
  * sweep is the safety net that new catalog entries cannot dodge.
  * `runMain graft.tools.CatalogAudit [sfDir]` prints one line per flagged
  * query; exit code 0 always (a reviewing tool, not a gate — some flags
  * are deliberate and documented where they occur).
  */
object CatalogAudit {
  /** Size below which a join side / window input counts as a bounded
    * model frame rather than data (64 MB at the audited SF — scalar
    * totals, deciles, boundaries, sketch matrices sit far under it; a
    * corpus-sized frame sits far over). */
  private val BoundedBytes = BigInt(64L * 1024 * 1024)

  /** Hand-audited exceptions: (cartesian, partitionlessWindow) node
    * counts whose inputs are bounded BY CONSTRUCTION but whose
    * post-aggregation stats are unknown to the estimator (unknown counts
    * as big — the loud default). Every entry names why it is safe:
    *
    *  - q111/q151: [[graft.operators.Ranking.globalRowNumber]]'s offset
    *    window runs over the |partitions|-row count table (plus q151's
    *    per-bucket batch-start window over the bucket rollup).
    *  - q145/q79: cum windows over ≤10 decile / distinct-band rows.
    *  - q90/q170/q171/q186: running windows over bucket/score/stage
    *    rollups (thousands of rows at most; q186's is 5 stage rows).
    *  - q113/q142/q150/q162: BroadcastNestedLoopJoin against one-row
    *    scalar frames (CMS matrices, priority threshold, NB priors,
    *    sketch audit row) whose post-agg size the estimator can't see.
    */
  private val Allowlist: Map[String, (Int, Int)] = Map(
    "q111_sorted_neighborhood" -> (0, 2),
    "q151_length_batches" -> (0, 2),
    "q145_reliability_curve" -> (0, 3),
    "q79_score_deciles" -> (0, 1),
    "q90_cumulative_users" -> (0, 1),
    "q170_survival" -> (0, 1),
    "q171_token_budget" -> (0, 1),
    "q186_curation_waterfall" -> (0, 1),
    "q113_cms_estimates" -> (1, 0),
    //  - q191: the |slices| × topWords grid cross join — both sides are
    //    bounded tables (per-slice totals, the top-F word list).
    "q191_burrows_delta" -> (1, 0),
    "q142_priority_sample" -> (1, 0),
    "q150_nb_classifier" -> (1, 0),
    "q162_join_estimate" -> (2, 0))

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    // AQE wraps the physical plan in an AdaptiveSparkPlanExec whose
    // children are not populated until execution — the walk would see
    // only the opaque root. The audit inspects the static plan.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    var flagged = 0
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan
        def collect(p: SparkPlan): Seq[SparkPlan] =
          p +: (p.children ++ p.subqueries).flatMap(collect)
        val nodes = collect(plan)
        // logical-stats size estimate for a physical subtree (bytes);
        // MaxValue when unknown — unknown counts as big (loud default)
        def estBytes(p: SparkPlan): BigInt =
          p.logicalLink.map(_.stats.sizeInBytes).getOrElse(
            BigInt(Long.MaxValue))
        // a pair/nested-loop shape is fine iff one side is model-sized:
        // query vectors, scalar totals, sketch matrices, probe sets
        val bigCart = nodes.count {
          case j: CartesianProductExec =>
            j.children.forall(c => estBytes(c) > BoundedBytes)
          case j: BroadcastNestedLoopJoinExec =>
            j.children.forall(c => estBytes(c) > BoundedBytes)
          case _ => false
        }
        // a partitionless window is fine iff its input is a bounded
        // rollup (deciles, top-k boundaries, bucket tables)
        val bigWin = nodes.count {
          case w: WindowExec if w.partitionSpec.isEmpty =>
            estBytes(w.child) > BoundedBytes
          case _ => false
        }
        val globalSorts = nodes.count {
          case s: SortExec => s.global
          case _ => false
        }
        val topk = nodes.exists(
          _.getClass.getSimpleName.startsWith("TakeOrdered"))
        val unlimitedSort = if (topk) 0 else globalSorts
        val allowed = Allowlist.getOrElse(name, (0, 0))
        if (bigCart > allowed._1 || bigWin > allowed._2)
          { flagged += 1
            println(f"AUDIT $name%-28s unboundedCartesian=$bigCart " +
              s"unboundedPartitionlessWindows=$bigWin " +
              s"globalSorts=$unlimitedSort (allowed=$allowed)") }
      } catch {
        case e: Throwable =>
          flagged += 1
          println(s"AUDIT $name ERROR ${e.getMessage.take(100)}")
      }
    }
    println(s"AUDIT done: $flagged flagged of ${SparkEntry.queries.size}")
    spark.stop()
  }
}

package graft.tools

import graft.SparkEntry
import graft.core.GraftSession

/** Dev scratch: dump formatted physical plans for representative queries
  * and grep them for the properties that matter at scale — parquet filter
  * pushdown, pruned read schemas, broadcast joins where a side is small,
  * whole-stage codegen coverage.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val interesting = Seq(
      "q01_pricing_summary", // scan + agg: pushdown/prune + partial agg
      "q08_int_filters",     // filters: PushedFilters must be non-empty
      "q12_samples",         // top-k: TakeOrderedAndProject, no full sort
      "q17_join_broadcast",  // small dim: BroadcastHashJoin expected
      "q18_join_shipping",   // 3-way: broadcast dim + shuffle fact join
      "q27_join_star",       // star: all dims broadcast
      "q33_ann_bruteforce",  // query vector broadcast, single pass
      "q36_minhash_pairs")   // band join: shuffle on (band, mh) only
    for (name <- interesting) {
      println(s"\n========== $name ==========")
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString()
      println(plan.linesIterator.take(60).mkString("\n"))
      // note: plan strings truncate long filter lists with "..." — match any
      // non-empty list start
      val pushed = "PushedFilters: \\[(?!\\])".r.findAllIn(plan).toSeq
      val bhj = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
      val smj = plan.linesIterator.count(_.contains("SortMergeJoin"))
      val topk = plan.contains("TakeOrderedAndProject")
      println(s"--- summary: pushedFilters=${pushed.size} broadcastJoins=$bhj " +
        s"sortMergeJoins=$smj takeOrdered=$topk")
    }
    spark.stop()
  }
}

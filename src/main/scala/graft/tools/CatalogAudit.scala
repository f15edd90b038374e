package graft.tools

import org.apache.spark.sql.SparkSession
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
  *  - global `SortExec` over KNOWN-big RAW (non-derived) input that does
  *    not feed a limit — the full-table sort; bounded rollup sorts,
  *    derived-result gate orderings, and top-k are fine.
  *
  * The per-query PlanSpec assertions pin the load-bearing cases; this
  * sweep is the safety net that new catalog entries cannot dodge: it runs
  * as a test gate ([[graft.CatalogAuditSpec]]) that fails on any
  * non-allowlisted finding. `runMain graft.tools.CatalogAudit [sfDir]`
  * prints the same findings for interactive review (exit 0 always).
  */
object CatalogAudit {
  /** Size below which a join side / window input counts as a bounded
    * model frame rather than data (64 MB at the audited SF — scalar
    * totals, deciles, boundaries, sketch matrices sit far under it; a
    * corpus-sized frame sits far over). */
  private val BoundedBytes = BigInt(64L * 1024 * 1024)

  /** Hand-audited exceptions: (cartesian, partitionlessWindow,
    * unlimitedGlobalSort) node counts whose inputs are bounded BY
    * CONSTRUCTION but whose post-aggregation stats are unknown to the
    * estimator (unknown counts as big — the loud default). Every entry
    * names why it is safe:
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
  private val Allowlist: Map[String, (Int, Int, Int)] = Map(
    "q111_sorted_neighborhood" -> (0, 2, 0),
    "q151_length_batches" -> (0, 2, 0),
    //  - q233/q234/q239: politeSchedule's r16 mega-host de-skew branch
    //    embeds Ranking.globalRowNumber, whose offset windows run over
    //    the |partitions|-row per-range count table (the q111/q151
    //    shape, same 2-window signature) — never over URL rows; the
    //    per-host window on the normal branch stays host-partitioned.
    "q233_polite_schedule" -> (0, 2, 0),
    "q234_crawl_roundtrip" -> (0, 2, 0),
    "q239_polite_skew_scale" -> (0, 2, 0),
    "q145_reliability_curve" -> (0, 3, 0),
    "q79_score_deciles" -> (0, 1, 0),
    "q90_cumulative_users" -> (0, 1, 0),
    "q170_survival" -> (0, 1, 0),
    "q171_token_budget" -> (0, 1, 0),
    "q186_curation_waterfall" -> (0, 1, 0),
    //  - q60: the gate ordering sorts the pinned connected-components
    //    label front (one row per node, bounded by doc count). The pin
    //    makes its logical leaf an InMemoryRelation, which hides the
    //    groupBy that bounds it from the derived-result exclusion, and
    //    the pre-materialization estimate is the LSH join-product guess.
    "q60_dup_clusters" -> (0, 0, 1),
    "q113_cms_estimates" -> (1, 0, 0),
    //  - q191: the |slices| × topWords grid cross join — both sides are
    //    bounded tables (per-slice totals, the top-F word list).
    "q191_burrows_delta" -> (1, 0, 0),
    "q142_priority_sample" -> (1, 0, 0),
    //  - q205: the isotonic minimax lattice's (j ≤ k) pair and span
    //    theta joins run on the PlanCache-pinned ≤12-row bin rollup
    //    (one row per equal-width score bin by construction); the pin's
    //    InMemoryRelation leaf hides the bounding groupBy from the
    //    estimator, as in q60/q150.
    "q205_isotonic_fit" -> (2, 0, 0),
    //  - q150: TWO one-row scalar broadcasts — the totals frame (now
    //    derived from the PlanCache-pinned vocabulary rollup, whose
    //    cached-leaf stats the estimator can't size) and the priors row.
    "q150_nb_classifier" -> (2, 0, 0),
    "q162_join_estimate" -> (2, 0, 0))

  /** One audited query: observed counts vs allowlisted counts, plus any
    * plan-construction error. `ok` iff within allowance and error-free. */
  final case class Finding(name: String, bigCart: Int, bigWin: Int,
      bigSort: Int, allowed: (Int, Int, Int), error: Option[String]) {
    def ok: Boolean = error.isEmpty && bigCart <= allowed._1 &&
      bigWin <= allowed._2 && bigSort <= allowed._3
    override def toString: String =
      if (error.isDefined) s"$name ERROR ${error.get.take(100)}"
      else f"$name%-28s unboundedCartesian=$bigCart " +
        s"unboundedPartitionlessWindows=$bigWin " +
        s"unboundedUnlimitedSorts=$bigSort (allowed=$allowed)"
  }

  /** Audit one plan-producing query body against its allowance. */
  def auditOne(name: String, spark: SparkSession, dir: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
      : Finding = {
    val allowed = Allowlist.getOrElse(name, (0, 0, 0))
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
      // rollup (deciles, top-k boundaries, bucket tables). A spec made
      // of only FOLDABLE expressions (a constant group key, e.g. the
      // ungrouped descending-cum helper's lit(1)) is physically the
      // same single task and counts the same.
      val bigWin = nodes.count {
        case w: WindowExec
            if w.partitionSpec.isEmpty || w.partitionSpec.forall(_.foldable) =>
          estBytes(w.child) > BoundedBytes
        case _ => false
      }
      // a global sort flags only on a KNOWN-big input — the opposite
      // default from the shapes above, deliberately: every catalog query
      // ends in a deterministic ORDER BY of its (usually aggregate)
      // result for the oracle compare, and post-aggregation stats are
      // unknown to the estimator, so a loud-unknown default would flag
      // the entire catalog for its gate ordering. What this still
      // catches is the real killer: a global sort directly over
      // scan/join-sized data, whose size the estimator DOES know
      // (leaves carry file sizes, joins multiply them). Top-k never
      // reaches here (orderBy+limit compiles to TakeOrdered).
      // The size is read off the sort's OWN logical link (logical Sort
      // output = input size): its physical child is the range exchange,
      // which carries no link. A further restriction keeps join-estimate
      // inflation out: sorts above an Aggregate or Join are exempt.
      // Aggregates genuinely bound their output; join outputs are NOT
      // genuinely bounded, but their size estimates are multiplied-out
      // guesses with no relation to the actual candidate sets the
      // catalog's equi-joins produce, so flagging on them is pure noise
      // — a sort above a join is accepted as gate ordering here and the
      // join's own fan-out is what the per-query PlanSpec assertions
      // and the cartesian check review. Window does NOT exempt: a
      // window preserves cardinality, so sorting its output is exactly
      // as big as sorting its input.
      val sentinel = BigInt(spark.sessionState.conf.defaultSizeInBytes)
      val bigSort = nodes.count {
        case s: SortExec if s.global =>
          s.logicalLink.exists { l =>
            import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
            val derived = l.children.exists(_.collectFirst {
              case _: Aggregate => (); case _: Join => ()
            }.isDefined)
            val e = l.stats.sizeInBytes
            !derived && e > BoundedBytes && e < sentinel
          }
        case _ => false
      }
      Finding(name, bigCart, bigWin, bigSort, allowed, None)
    } catch {
      case e: Throwable =>
        Finding(name, 0, 0, 0, allowed,
          Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
    }
  }

  /** Audit the whole catalog (sorted by name). AQE must be disabled by
    * the caller: an AdaptiveSparkPlanExec root hides its children until
    * execution, so the walk would see only the opaque root. */
  def auditAll(spark: SparkSession, dir: String): Seq[Finding] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      auditOne(name, spark, dir, fn)
    }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val findings = auditAll(spark, dir)
    findings.filterNot(_.ok).foreach(f => println(s"AUDIT $f"))
    println(
      s"AUDIT done: ${findings.count(!_.ok)} flagged of ${findings.size}")
    spark.stop()
  }
}

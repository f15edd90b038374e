package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join strategies for the shapes Spark's planner cannot fix on its own.
  *
  * AQE's skew-join splitting only kicks in for sort-merge joins after a
  * shuffle stage has materialized skewed blocks, and it cannot help when a
  * single join KEY (not just a partition) is hot — every row for that key
  * still lands in one task. [[saltedJoin]] is the classic escape hatch:
  * scatter the fact side across `salts` sub-keys and replicate the
  * dimension side to every sub-key, so a hot key's rows spread over
  * `salts` tasks. Replication is per-DIMENSION-row, so the technique fits
  * when the dimension side is too big to broadcast outright but small
  * enough to copy `salts` times through one shuffle (the usual mid-size
  * dimension at 100 TB: too big for `broadcast()`, way smaller than the
  * fact table).
  */
object Joins {

  /** Inner equi-join `fact ⋈ dim` on `factKey = dimKey`, salted against
    * fact-side key skew.
    *
    * The fact row's salt is derived from a hash of ALL its columns — any
    * deterministic per-row spreading works because the dim side replicates
    * to every salt value, so each (key, salt) sub-join sees the complete
    * dim partition for that key. Correctness does not depend on the salt
    * distribution, only the skew relief does.
    *
    * One shuffle each side on (key, salt); output is exactly the rows of
    * the unsalted join (the salt column never escapes).
    */
  /** The scattered (fact) side of a salted join: a deterministic
    * per-row salt from a hash of ALL columns. Shared by [[saltedJoin]]
    * and [[graft.operators.Linkage.fsLink]]. */
  private[operators] def saltFact(fact: DataFrame, salts: Int): DataFrame =
    fact.withColumn("__salt",
      pmod(hash(fact.columns.map(col).toSeq: _*), lit(salts)))

  /** The replicated (dim) side: every row copied to every salt value.
    * sequence() is per-row codegen; the explode multiplies the dim side
    * BEFORE its shuffle so each replica lands directly on its
    * (key, salt) reducer — no second redistribution. */
  private[operators] def replicateDim(dim: DataFrame, salts: Int): DataFrame =
    dim.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))

  /** Join-strategy policy for the ×salts-replicated dim side (r18,
    * guide §3.1 "pick the strategy deliberately").
    *
    * r17 pinned `shuffle_hash` unconditionally — right for the regime the
    * salt machinery exists for (a dim too big to broadcast: left to its
    * size estimates the planner collected a 1.2M-row replicated dim to
    * the driver and built it per run), but measurably wrong when the dim
    * is genuinely tiny (q197's ~400-row registry: the pinned two-sided
    * exchange ran 2.07× slower than the broadcast the planner would have
    * chosen — a broadcast join has no skew problem to begin with, so
    * nothing is lost). The guard: estimate the replicated dim as
    * `salts ×` the dim plan's size estimate and pin `shuffle_hash` only
    * ABOVE `spark.sql.autoBroadcastJoinThreshold`; below it the planner
    * keeps its choice (broadcast). Estimation errors past the threshold
    * only re-select the designed salted-shuffle plan, never an OOM-risk
    * broadcast — the conservative direction. */
  private[operators] def replicateDimHinted(dim: DataFrame,
      salts: Int): DataFrame = {
    val replicated = replicateDim(dim, salts)
    val threshold =
      dim.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    val est =
      try dim.queryExecution.optimizedPlan.stats.sizeInBytes * salts
      catch { case _: Throwable => BigInt(Long.MaxValue) }
    if (threshold > 0 && est <= BigInt(threshold)) replicated
    else replicated.hint("shuffle_hash")
  }

  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, salts: Int = 8): DataFrame = {
    require(salts >= 1, s"saltedJoin: salts must be >= 1, got $salts")
    val f = saltFact(fact, salts)
    // the operator EXISTS for the shuffle regime — the SHUFFLE_HASH hint
    // pins the designed plan when the replicated dim is past the
    // broadcast threshold: both sides exchange on (key, salt) — the
    // salts spread the hot key — and the dim side (the smaller by
    // contract) hash-builds per partition with no sort on either side.
    // Below the threshold the planner broadcasts, which is strictly
    // better (no skew problem, no dim exchange) — see replicateDimHinted.
    val d = replicateDimHinted(dim, salts)
    f.join(d, f(factKey) === d(dimKey) && f("__salt") === d("__salt"))
      .drop("__salt")
  }

  /** Join-size estimation without the join: sketch both relations' join
    * keys into Count-Min matrices and take the sketch inner product
    * ([[graft.functions.CmsSketch.innerProductExpr]]) — the planner
    * probe that answers "how big would `A ⋈ B` on this key be?" from
    * two `depth·width` matrices. The estimate is one-sided
    * (`est ≥ exact`); the output reports it next to the EXACT join size
    * (one aggregation — the audit this operator exists to avoid at
    * scale) with the overestimate ratio.
    *
    * Output: one row `(exact_pairs, cms_est, overestimate)`.
    *
    * Scale: each side reduces map-side into per-partition matrices — the
    * shuffle carries `partitions · depth · width` longs, never keys. The
    * exact audit column is the only part that aggregates per-key; drop
    * it in production use (it is here so the estimate is verifiable).
    */
  def cmsJoinSizeEstimate(left: DataFrame, leftKey: Column,
      right: DataFrame, rightKey: Column,
      depth: Int = 4, width: Int = 512): DataFrame = {
    import graft.functions.CmsSketch
    val a = left.select(leftKey.cast("string").as("item"))
      .agg(CmsSketch.sketch(col("item"), depth, width).as("ma"))
    val b = right.select(rightKey.cast("string").as("item"))
      .agg(CmsSketch.sketch(col("item"), depth, width).as("mb"))
    val ca = left.select(leftKey.cast("string").as("k"))
      .groupBy("k").agg(count(lit(1)).as("ca"))
    val cb = right.select(rightKey.cast("string").as("k"))
      .groupBy("k").agg(count(lit(1)).as("cb"))
    val exact = ca.join(cb, "k")
      .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("exact_pairs"))
    a.crossJoin(broadcast(b))
      .select(CmsSketch.innerProductExpr(col("ma"), col("mb"), depth, width)
        .as("cms_est"))
      .crossJoin(broadcast(exact))
      .select(col("exact_pairs"), col("cms_est"),
        when(col("exact_pairs") > 0,
          col("cms_est").cast("double") / col("exact_pairs").cast("double"))
          .as("overestimate"))
  }
}

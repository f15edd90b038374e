package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage — match rows of two registries that describe the same
  * real-world entity despite field noise (the entity-resolution stage a
  * pipeline runs when two crawls/feeds overlap without a shared key).
  *
  * Fellegi–Sunter shape, integer-weighted: candidate pairs come from
  * equi-join BLOCKING (never the cross product), each configured field
  * comparison contributes an agreement or disagreement weight, and pairs
  * at or above the decision threshold come back scored. Classic F-S
  * derives the weights from m/u probabilities via EM; here they are
  * caller-supplied integers, which keeps every score an exact BIGINT the
  * SQL oracle reproduces — the decision structure (block → compare →
  * weight → threshold) is the algorithm's load-bearing part.
  */
object Linkage {

  /** One field comparison: `pred` evaluates on the joined pair frame
    * (columns of `a` keep their names, columns of `b` are suffixed
    * `_b`), contributing `agree` when true and `disagree` when false.
    */
  final case class FieldRule(name: String, pred: Column,
      agree: Int, disagree: Int)

  /** Blocked, weighted linkage of `a` (left, id `idA`) to `b` (right, id
    * `idB`). `blockCols` must exist on both sides (the b-side suffixed
    * copies are matched automatically). Emits one row per candidate pair
    * with per-rule agreement flags, the total score, and `is_match` at
    * `threshold`.
    *
    * Scale: the blocking equi-join is THE cost — a shuffle on the block
    * key — and the block KEY'S CARDINALITY is the caller's scale
    * contract: a key with a FIXED number of possible values (city,
    * segment, balance century) gives per-block occupancy that grows
    * linearly with the corpus, hence candidate pairs that grow
    * QUADRATICALLY — and the wall clock hides it while idle cores
    * absorb the extra work (r11 measured a CPU exponent of 2.2 on a
    * 550-block key whose wall exponent read 1.2). Pick keys whose
    * cardinality grows with the data (near-unique normalized fields,
    * fine-grained numeric units), union several fsLink passes for
    * recall, or switch to the sorted-neighborhood window
    * (Dedup.sortedNeighborhood, q111) when no such key exists — its
    * pair count is O(n·window) by construction. A skewed block (one
    * giant city/segment) is the classic within-key failure.
    * `salts > 1` applies [[Joins.saltedJoin]]'s scatter to it:
    * the `a` side spreads each block over `salts` sub-keys by row hash
    * and the `b` side replicates to every sub-key, so a hot block's
    * pairs land on `salts` tasks instead of one — output identical to
    * the unsalted join by construction (each sub-join sees the complete
    * b partition for its block). Tightening the blocking remains the
    * better fix when the data allows it; salting is the engine-side
    * relief when it does not. Comparisons are scan-side expressions on
    * the joined pairs; no state, no driver collection.
    */
  def fsLink(a: DataFrame, idA: String, b: DataFrame, idB: String,
      blockCols: Seq[String], rules: Seq[FieldRule],
      threshold: Int, salts: Int = 1): DataFrame = {
    require(blockCols.nonEmpty, "fsLink: at least one blocking column")
    require(rules.nonEmpty, "fsLink: at least one field rule")
    require(rules.map(_.name).distinct.size == rules.size,
      "fsLink: duplicate rule names")
    require(salts >= 1, s"fsLink: salts must be >= 1, got $salts")
    val bSuffixed = b.toDF(b.columns.map(c =>
      if (blockCols.contains(c)) c else c + "_b").toIndexedSeq: _*)
    // size-guarded shuffle_hash on the replicated side, shared with
    // Joins.saltedJoin (r18): past the broadcast threshold the hint pins
    // the designed salted-shuffle plan (a broadcast of a LARGE ×salts dim
    // defeats the salting and pays a driver-side build); under it the
    // planner's broadcast is strictly better — r17's unconditional pin
    // made q197's ~400-row registry 2.07× slower for no skew benefit.
    val joined = if (salts == 1) a.join(bSuffixed, blockCols)
    else Joins.saltFact(a, salts)
      .join(Joins.replicateDimHinted(bSuffixed, salts),
        blockCols :+ "__salt")
      .drop("__salt")
    val flagged = rules.foldLeft(joined)((d, r) =>
      d.withColumn(s"agree_${r.name}", r.pred))
    val score = rules.map(r =>
      when(col(s"agree_${r.name}"), lit(r.agree.toLong))
        .otherwise(lit(r.disagree.toLong))).reduce(_ + _)
    flagged
      .withColumn("score", score)
      .withColumn("is_match", col("score") >= threshold)
      .select((col(idA).as("id_a") +: col(s"${idB}_b").as("id_b") +:
        rules.map(r => col(s"agree_${r.name}"))) :+
        col("score") :+ col("is_match"): _*)
  }
}

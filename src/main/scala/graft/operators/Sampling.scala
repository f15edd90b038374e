package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic sampling for corpus mixing/downsampling.
  *
  * A training pipeline needs samples that are (a) reproducible across
  * runs, engines, and re-partitionings, and (b) stratified — different
  * keep-rates per source/language implement the mixture weights. Spark's
  * `df.sample` is seed-stable only for a fixed partitioning, so we hash
  * the ROW ID instead: membership is a pure function of the row, immune
  * to shuffle/split changes, and the same predicate replays anywhere
  * (including the DuckDB oracle).
  */
object Sampling {

  /** `md5(salt ‖ id) mod 10000` — a uniform basis-point bucket in
    * [0, 10000), identical in any engine with md5 (the first 8 hex chars
    * fit a long exactly). */
  def hashBucket(idCol: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), idCol.cast("string"))), 1, 8), 16, 10)
      .cast(LongType) % 10000L

  /** Stratified deterministic sample: keep a row iff its hash bucket falls
    * below the stratum's threshold (in basis points: 10000 = keep all,
    * 2500 = keep 25%). Adds `sample_weight` = 10000/threshold for unbiased
    * re-weighting of downstream aggregates.
    *
    * Thresholds are integers (not double rates) so the cutoff — and the
    * weight, one IEEE division of two exact ints — is bit-identical across
    * engines. Scale: a narrow filter over the scan, no shuffle at all;
    * pushes into the scan as a deterministic predicate.
    */
  def stratifiedHashSample(df: DataFrame, idCol: String, stratumCol: String,
      thresholdsBp: Map[String, Int], defaultBp: Int,
      salt: String): DataFrame = {
    require((defaultBp +: thresholdsBp.values.toSeq).forall(t => t >= 0 && t <= 10000),
      "thresholds are basis points in [0, 10000]")
    val threshold = thresholdsBp.toSeq.sortBy(_._1).foldLeft(lit(defaultBp)) {
      case (acc, (k, bp)) => when(col(stratumCol) === k, lit(bp)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), salt) < threshold.cast(LongType))
      .withColumn("sample_weight",
        lit(10000.0) / threshold.cast("double"))
  }
}

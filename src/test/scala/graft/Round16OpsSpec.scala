package graft

import org.apache.spark.sql.functions._

import graft.core.Stats
import graft.operators.Curation

/** Round-16 hardening: the descending distributed prefix-sum path under
  * the score-band / token-budget curation cuts.
  */
class Round16OpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq

  test("exactScoreBands: continuous scores, distributed == serial") {
    val rnd = new scala.util.Random(42)
    // ~5000 DISTINCT double scores — the regime where the old
    // partitionless Window.orderBy would serialize the rollup into one
    // task (rollup ≈ row count)
    val df = (1L to 5000L).map(i => (i, rnd.nextDouble() * 100.0))
      .toDF("id", "score")
    val serial = canon(Curation.exactScoreBands(df, "id", "score",
      buckets = 10, distributedCum = Some(false)))
    val dist = canon(Curation.exactScoreBands(df, "id", "score",
      buckets = 10, distributedCum = Some(true)))
    assert(dist === serial)
    // every bucket populated and sized ~n/buckets (unique scores -> no
    // tie mass shifting boundaries)
    val sizes = Curation.exactScoreBands(df, "id", "score", buckets = 10,
        distributedCum = Some(true))
      .groupBy("bucket").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.keySet === (0L to 9L).toSet)
    assert(sizes.values.forall(c => c === 500L))
  }

  test("exactScoreBands: auto-probe selects the distributed path on a " +
      "high-cardinality rollup") {
    val rnd = new scala.util.Random(7)
    val df = (1L to 4000L).map(i => (i, rnd.nextDouble()))
      .toDF("id", "score")
    val rollup = df.groupBy($"score").agg(count(lit(1)).as("__c"))
    spark.conf.set("spark.graft.cum.probeMinInputBytes", "0")
    try {
      // default threshold (4M) -> serial even when probed
      assert(!Stats.resolvedCumSumsDesc(rollup, "score", Seq("__c"), None)._2)
      spark.conf.set("spark.graft.cum.serialMaxDistinct", "100")
      try {
        assert(Stats.resolvedCumSumsDesc(rollup, "score", Seq("__c"), None)._2)
        // and the auto-selected distributed end-to-end run still matches
        // the pinned serial one
        val serial = canon(Curation.exactScoreBands(df, "id", "score",
          buckets = 7, distributedCum = Some(false)))
        assert(canon(Curation.exactScoreBands(df, "id", "score",
          buckets = 7)) === serial)
      } finally spark.conf.unset("spark.graft.cum.serialMaxDistinct")
    } finally spark.conf.unset("spark.graft.cum.probeMinInputBytes")
  }

  test("tokenBudgetThreshold: continuous scores, distributed == serial, " +
      "group-atomic greedy cut preserved") {
    val rnd = new scala.util.Random(99)
    val docs = (1L to 3000L)
      .map(i => (i, rnd.nextDouble() * 10.0, 10L + (i % 7)))
      .toDF("id", "score", "tk")
    for (budget <- Seq(0L, 5000L, 20000L, Long.MaxValue)) {
      val serial = canon(Curation.tokenBudgetThreshold(docs, col("score"),
        col("tk"), budget, distributedCum = Some(false)))
      val dist = canon(Curation.tokenBudgetThreshold(docs, col("score"),
        col("tk"), budget, distributedCum = Some(true)))
      assert(dist === serial, s"budget $budget")
    }
    // exact greedy semantics on a hand-checkable fixture (ties admitted
    // atomically, first overflowing group excluded)
    val tiny = Seq((1L, 3.0, 10L), (2L, 3.0, 10L), (3L, 2.0, 10L),
      (4L, 1.0, 10L)).toDF("id", "score", "tk")
    val r = Curation.tokenBudgetThreshold(tiny, col("score"), col("tk"), 25L,
      distributedCum = Some(true)).head()
    assert(r.getDouble(0) === 3.0 && r.getLong(1) === 2L &&
      r.getLong(2) === 20L)
  }
}

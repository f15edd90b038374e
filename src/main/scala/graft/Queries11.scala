package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Stats, Tables}
import graft.operators.Similarity

/** Catalog entries: round-6 additions II — hard-negative mining, pivot
  * crosstab, grouped exact median, RANGE window frames.
  */
object Queries11 {

  private def t(name: String)(implicit env: (SparkSession, String)): DataFrame =
    if (name == "events") Tables.events(env._1, env._2)
    else Tables.load(env._1, env._2, name)

  private def q(name: String, sql: String = null)(
      body: (SparkSession, String) => DataFrame): (String, QueryDef) =
    name -> QueryDef(body, Option(sql))

  /** Hard negatives for contrastive training: top-8 most-similar
    * DIFFERENT-label vectors per query. Exact cosine over the in-order
    * `graft_dot` folds — the oracle replicates the fold, so similarity
    * AND ranking hash-check. */
  val q81HardNegatives: (String, QueryDef) = q(
    "q81_hard_negatives", {
      def dotRaw(a: String, b: String): String =
        s"list_reduce(list_transform(generate_series(1, 64), i -> " +
          s"CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"
      s"""WITH qs AS (
         |  SELECT vec_id AS qid, embedding AS qv, label AS qlabel
         |  FROM embeddings WHERE vec_id BETWEEN 200 AND 207),
         |scored AS (
         |  SELECT q.qid, e.vec_id, e.label,
         |    ${dotRaw("e.embedding", "q.qv")} /
         |    (SQRT(${dotRaw("e.embedding", "e.embedding")}) *
         |     SQRT(${dotRaw("q.qv", "q.qv")})) AS sim
         |  FROM embeddings e JOIN qs q ON e.label <> q.qlabel),
         |ranked AS (
         |  SELECT qid, vec_id, label, sim,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rk
         |  FROM scored)
         |SELECT qid, vec_id, label, sim FROM ranked WHERE rk <= 8
         |ORDER BY qid, sim DESC, vec_id""".stripMargin
    }) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    Similarity.hardNegatives(t("embeddings"), "vec_id", "embedding", "label",
        queryIds = (200L to 207L), k = 8)
      .orderBy(col("qid"), col("sim").desc, col("vec_id"))
  }

  /** Event-type crosstab via PIVOT: per user cohort, one column per event
    * type. Pivot values are declared (no discovery scan); the oracle is
    * the portable conditional-aggregation form. */
  val q82Pivot: (String, QueryDef) = q(
    "q82_pivot",
    """SELECT user_id % 16 AS cohort,
      |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
      |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
      |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
      |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
      |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
      |FROM events GROUP BY cohort ORDER BY cohort""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val types = Seq("click", "error", "purchase", "signup", "view")
    t("events")
      .groupBy(pmod(col("user_id"), lit(16)).as("cohort"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
      .orderBy(col("cohort"))
  }

  /** Exact per-source lower median of document length — grouped median
    * with the distinct-value-window trick (no per-row window, no
    * interpolation floats). */
  val q83GroupedMedian: (String, QueryDef) = q(
    "q83_grouped_median",
    """WITH g AS (
      |  SELECT source, n_chars, COUNT(*) AS c
      |  FROM documents GROUP BY source, n_chars),
      |cum AS (
      |  SELECT source, n_chars, c,
      |    SUM(c) OVER (PARTITION BY source ORDER BY n_chars
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm,
      |    SUM(c) OVER (PARTITION BY source) AS n
      |  FROM g)
      |SELECT source, CAST(MAX(n) AS BIGINT) AS n, MIN(n_chars) AS median
      |FROM cum WHERE cm * 2 >= n GROUP BY source ORDER BY source""".stripMargin) {
    (s, dir) =>
      implicit val env: (SparkSession, String) = (s, dir)
      Stats.groupedMedian(t("documents"), "source", "n_chars",
          distributedCum = Some(false))
        .orderBy(col("source"))
  }

  /** Trailing-hour event density via a RANGE window frame (value-based
    * bounds — ROWS frames cover q72): count of same-type events in the
    * preceding 3600 s, integer-exact. */
  val q84RangeFrame: (String, QueryDef) = q(
    "q84_range_frame",
    """WITH e AS (
      |  SELECT event_id, event_type, epoch_ns(ts) // 1000000000 AS s
      |  FROM events)
      |SELECT event_id, event_type, s,
      |  COUNT(*) OVER (PARTITION BY event_type ORDER BY s
      |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS n_trailing_1h
      |FROM e ORDER BY event_id""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    t("events")
      .select(col("event_id"), col("event_type"), col("ts_sec").as("s"))
      .withColumn("n_trailing_1h", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("s"))
          .rangeBetween(-3600L, 0L)))
      .orderBy(col("event_id"))
  }

  val catalog: Seq[(String, QueryDef)] = Seq(
    q81HardNegatives, q82Pivot, q83GroupedMedian, q84RangeFrame)
}

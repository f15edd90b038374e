package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Catalog entries: round-13 additions (continued) — cross-source
  * duplication matrix, robust trend, seasonality profile.
  */
object Queries19 {

  private def t(name: String)(implicit env: (SparkSession, String)): DataFrame =
    Tables.load(env._1, env._2, name)

  private def q(name: String, sql: String = null)(
      body: (SparkSession, String) => DataFrame): (String, QueryDef) =
    name -> QueryDef(body, Option(sql))

  /** Cross-source duplication matrix
    * ([[graft.operators.Dedup.crossSourceDupMatrix]]): distinct shared
    * 3-grams for every source pair with the overlap coefficient — which
    * feeds re-crawl each other. */
  val q182CrossSourceMatrix: (String, QueryDef) = q(
    "q182_cross_source_matrix",
    """WITH w AS (SELECT source, string_split(text, ' ') AS tk
      |           FROM documents),
      |g AS (
      |  SELECT DISTINCT source, md5(array_to_string(tk[i:i+2], ' ')) AS h
      |  FROM (SELECT source, tk, unnest(generate_series(1, len(tk) - 2))
      |          AS i
      |        FROM w WHERE len(tk) >= 3)),
      |sz AS (SELECT source, COUNT(*) AS n FROM g GROUP BY source),
      |p AS (
      |  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared
      |  FROM g a JOIN g b ON a.h = b.h AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT src_a, src_b, n_shared, sa.n AS n_a, sb.n AS n_b,
      |  CAST(n_shared AS DOUBLE) / CAST(LEAST(sa.n, sb.n) AS DOUBLE)
      |    AS overlap
      |FROM p
      |JOIN sz sa ON sa.source = src_a
      |JOIN sz sb ON sb.source = src_b
      |ORDER BY src_a, src_b""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.operators.Dedup.crossSourceDupMatrix(t("documents"), "source",
        "text", n = 3)
      .orderBy(col("src_a"), col("src_b"))
  }

  /** Theil–Sen robust daily trend ([[graft.core.Stats.theilSenTrend]]):
    * median pairwise slope of per-day event counts — the outlier-immune
    * complement of q125's least-squares trend. */
  val q183TheilSen: (String, QueryDef) = q(
    "q183_theil_sen",
    """WITH r AS (
      |  SELECT event_type,
      |    (epoch_ns(ts) // 1000000000) // 86400 AS day, COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |s AS (
      |  SELECT a.event_type AS g,
      |    CAST(b.cnt - a.cnt AS DOUBLE) / CAST(b.day - a.day AS DOUBLE)
      |      AS s
      |  FROM r a JOIN r b
      |    ON a.event_type = b.event_type AND a.day < b.day),
      |rk AS (
      |  SELECT g, s, ROW_NUMBER() OVER (PARTITION BY g ORDER BY s) AS rk,
      |    COUNT(*) OVER (PARTITION BY g) AS n
      |  FROM s),
      |m AS (SELECT g, n, s FROM rk WHERE rk = (n + 1) // 2
      |      OR rk = n // 2 + 1)
      |SELECT g AS event_type, CAST(MIN(n) AS BIGINT) AS n_slopes,
      |  (MIN(s) + MAX(s)) / 2.0 AS theil_sen_slope
      |FROM m GROUP BY g ORDER BY event_type""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val roll = Tables.events(s, dir)
      .select(col("event_type"), expr("ts_sec div 86400").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("cnt"))
    graft.core.Stats.theilSenTrend(roll, "event_type", "day", "cnt")
      .orderBy(col("event_type"))
  }

  /** Hour-of-week seasonality
    * ([[graft.operators.Events.hourOfWeekProfile]]): per (event_type,
    * hour-of-week) count, exact mean value, and lift against the flat
    * profile — the diurnal fingerprint behind q97's anomaly monitor. */
  val q184Seasonality: (String, QueryDef) = q(
    "q184_seasonality",
    """WITH e AS (
      |  SELECT event_type, epoch_ns(ts) // 1000000000 AS s, value
      |  FROM events),
      |p AS (
      |  SELECT event_type, (s // 3600) % 168 AS how, COUNT(*) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sv
      |  FROM e GROUP BY 1, 2),
      |tt AS (SELECT event_type, COUNT(*) AS ntot FROM e GROUP BY 1)
      |SELECT p.event_type AS event_type, how, n,
      |  sv / CAST(n AS DOUBLE) AS mean_value,
      |  CAST(168 * n AS DOUBLE) / CAST(ntot AS DOUBLE) AS lift
      |FROM p JOIN tt ON tt.event_type = p.event_type
      |ORDER BY event_type, how""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.operators.Events.hourOfWeekProfile(Tables.events(s, dir),
        "event_type", col("ts_sec"), col("value"))
      .orderBy(col("event_type"), col("how"))
  }

  val catalog: Seq[(String, QueryDef)] =
    Seq(q182CrossSourceMatrix, q183TheilSen, q184Seasonality)
}

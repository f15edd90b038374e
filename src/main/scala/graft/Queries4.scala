package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Stats, Tables}
import graft.functions.LogHist
import graft.operators.TextAnalysis

/** Catalog entries for SimHash, log-scaled histograms, and the ICC
  * statistic. */
object Queries4 {

  /** DuckDB twin of [[TextAnalysis.simhash]] (16 bits). */
  private val simhashSql: String = {
    val bitTerms = (0 until 16).map { b =>
      s"""CASE WHEN list_reduce(list_transform(hs,
         |  h -> CASE WHEN (h >> $b) % 2 = 1 THEN 1 ELSE -1 END),
         |  (x, y) -> x + y) > 0 THEN ${1L << b} ELSE 0 END""".stripMargin
    }.mkString(" +\n")
    s"""WITH h AS (
       |  SELECT doc_id,
       |    list_transform(list_distinct(string_split(text, ' ')),
       |      t -> CAST('0x' || substring(md5(t), 1, 15) AS BIGINT)) AS hs
       |  FROM documents)
       |SELECT doc_id, $bitTerms AS simhash
       |FROM h ORDER BY doc_id LIMIT 100""".stripMargin
  }

  val q43Simhash: (String, QueryDef) = "q43_simhash" -> QueryDef(
    (s: SparkSession, dir: String) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.simhash(col("text"), 16).as("simhash"))
        .orderBy(col("doc_id"))
        .limit(100),
    Some(simhashSql))

  /** Log-scaled histogram. The log-bucket layout is deterministic, but
    * cross-engine log()/pow() are not guaranteed bit-identical — so the
    * oracle gets the EXACT integer bucket thresholds precomputed (driver-
    * side, with the production double math) as SQL literals, and replicates
    * the cumulative walk on them. mean/stddev ROUND(,6) as in q45. */
  val q44LogHist: (String, QueryDef) = "q44_loghist" -> QueryDef(
    (s: SparkSession, dir: String) => {
      val ev = Tables.events(s, dir)
      val h = LogHist.logHist(
        (col("value") * 100).cast("long"), lit(1L), 1L, 49002L)
      ev.groupBy(col("event_type"))
        .agg(h.as("h"))
        .selectExpr("event_type", "h.count AS cnt", "ROUND(h.mean, 6) AS mean",
          "h.percentiles[50] AS p50_cents", "ROUND(h.stddev, 6) AS stddev")
        .orderBy(col("event_type"))
    },
    Some {
      // integer thresholds of the log buckets over [1, 490020], computed
      // with the same doubles the aggregator uses (LogHist.bucketOf/lowOf)
      val th = LogHist.bucketThresholds(1L, 49002L, 16)
      val tLit = th.map(_._1).mkString("[", ",", "]")
      val lLit = th.map(_._2).mkString("[", ",", "]")
      s"""WITH v AS (
         |  SELECT event_type, CAST(trunc(value * 100) AS BIGINT) AS cents
         |  FROM events),
         |kept AS (
         |  SELECT event_type, cents,
         |    ($lLit)[len(list_filter($tLit, t -> t <= cents))] AS low
         |  FROM v WHERE cents >= 1 AND cents <= 490020),
         |bk AS (
         |  SELECT event_type, low, COUNT(*) AS c FROM kept GROUP BY 1, 2),
         |cum AS (
         |  SELECT event_type, low, c,
         |    SUM(c) OVER (PARTITION BY event_type ORDER BY low) AS cm,
         |    SUM(c) OVER (PARTITION BY event_type) AS tot
         |  FROM bk),
         |p50 AS (
         |  SELECT event_type, MIN(low) AS p50_cents FROM cum
         |  WHERE 100 * cm >= 50 * tot GROUP BY 1),
         |m AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt,
         |    CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS mean
         |  FROM kept GROUP BY 1),
         |sd AS (
         |  SELECT b.event_type,
         |    SQRT(SUM((b.low - m.mean) * (b.low - m.mean) *
         |      (b.c / CAST(m.cnt AS DOUBLE)))) AS sdv
         |  FROM bk b JOIN m ON b.event_type = m.event_type
         |  GROUP BY 1, m.cnt, m.mean)
         |SELECT m.event_type, m.cnt, ROUND(m.mean, 6) AS mean,
         |  p50.p50_cents, ROUND(sd.sdv, 6) AS stddev
         |FROM m JOIN p50 ON m.event_type = p50.event_type
         |JOIN sd ON m.event_type = sd.event_type
         |ORDER BY m.event_type""".stripMargin
    })

  /** ICC (one-way ANOVA) of value across event types — exact decimal sums
    * at both levels, so bit-deterministic vs the oracle. */
  val q45Icc: (String, QueryDef) = "q45_icc" -> QueryDef(
    (s: SparkSession, dir: String) =>
      Stats.icc(Tables.events(s, dir), "event_type", "value"),
    Some("""WITH g AS (
       |  SELECT event_type, COUNT(*) AS n_g,
       |    CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_g,
       |    CAST(SUM(CAST(value*value AS DECIMAL(38,8))) AS DOUBLE) AS sumsq_g
       |  FROM events WHERE value IS NOT NULL GROUP BY event_type),
       |t AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n_g) AS BIGINT) AS n,
       |    CAST(SUM(CAST(sum_g AS DECIMAL(38,10))) AS DOUBLE) AS sum_all,
       |    CAST(SUM(CAST(sumsq_g - sum_g*sum_g/n_g AS DECIMAL(38,10))) AS DOUBLE) AS ssw,
       |    CAST(SUM(CAST(sum_g*sum_g/n_g AS DECIMAL(38,10))) AS DOUBLE) AS sum_sq_over_n
       |  FROM g)
       |SELECT k, n,
       |  ROUND((sum_sq_over_n - sum_all*sum_all/n)/(k-1), 6) AS msb,
       |  ROUND(ssw/(n-k), 6) AS msw,
       |  ROUND(((sum_sq_over_n - sum_all*sum_all/n)/(k-1)) /
       |  (((sum_sq_over_n - sum_all*sum_all/n)/(k-1)) + ssw/(n-k)), 6) AS icc
       |FROM t""".stripMargin))

  val catalog: Seq[(String, QueryDef)] = Seq(q43Simhash, q44LogHist, q45Icc)
}

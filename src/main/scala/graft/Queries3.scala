package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables
import graft.dsl.{AggOp, SybilQuery}

/** Catalog entries that run THROUGH the sybil DSL (graft.dsl.SybilQuery) so
  * the driver's oracle gate exercises the DSL compiler itself, not just
  * hand-built DataFrames. Oracle SQL mirrors the DSL's exact output columns
  * (Count = weighted count, Samples = raw rows — printer.go:109-151).
  */
object Queries3 {

  /** DSL: group count + time series, sybil default ordering ($COUNT desc). */
  val dslTimeSeries: (String, QueryDef) = "q39_dsl_timeseries" -> QueryDef(
    (s: SparkSession, dir: String) =>
      SybilQuery()
        .groupBy("event_type")
        .timeSeries("ts_sec", 600)
        .limitTo(100)
        .run(Tables.events(s, dir)),
    Some("""SELECT ((epoch_ns(ts) // 1000000000) // 600) * 600 AS time_bucket,
       |event_type,
       |CAST(COUNT(*) AS BIGINT) AS Count, COUNT(*) AS Samples
       |FROM events GROUP BY time_bucket, event_type
       |ORDER BY Count DESC, time_bucket, event_type LIMIT 100""".stripMargin))

  /** DSL: filtered avg with sybil missing-value semantics. */
  val dslAvg: (String, QueryDef) = "q40_dsl_avg" -> QueryDef(
    (s: SparkSession, dir: String) =>
      SybilQuery()
        .groupBy("event_type")
        .aggregate("value")
        .withOp(AggOp.AvgOp)
        .intFilterGt("user_id", 10)
        .strFilterNeq("event_type", "error")
        .limitTo(10)
        .run(Tables.events(s, dir)),
    Some("""SELECT event_type,
       |CAST(COUNT(*) AS BIGINT) AS Count, COUNT(*) AS Samples,
       |CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)/COUNT(*) AS value_avg
       |FROM events WHERE user_id > 10 AND event_type <> 'error'
       |GROUP BY event_type
       |ORDER BY Count DESC, event_type LIMIT 10""".stripMargin))

  /** DSL: samples mode (newest matching records). */
  val dslSamples: (String, QueryDef) = "q41_dsl_samples" -> QueryDef(
    (s: SparkSession, dir: String) =>
      SybilQuery()
        .takeSamples("event_id", "user_id", "event_type", "ts_sec")
        .timeColumn("ts_sec")
        .strFilterRe("event_type", "^(view|click)$")
        .limitTo(25)
        .run(Tables.events(s, dir)),
    Some("""SELECT event_id, user_id, event_type,
       |epoch_ns(ts) // 1000000000 AS ts_sec
       |FROM events WHERE regexp_matches(event_type, '^(view|click)$')
       |ORDER BY ts_sec DESC, event_id, user_id, event_type LIMIT 25""".stripMargin))

  /** DSL: histogram op. The bucket layout IS deterministic given the
    * BasicHist spec (width = ceil(range/1000) from the GLOBAL extents,
    * low = floor((v-min)/width)*width+min, p50 = lowest bucket low whose
    * cumulative weight reaches 50%), so the oracle replicates the walk in
    * SQL. mean/stddev are ROUND(,6) on both sides (the q45 convention —
    * double accumulation order differs across engines). */
  val dslHist: (String, QueryDef) = "q42_dsl_hist" -> QueryDef(
    (s: SparkSession, dir: String) => {
      val r = SybilQuery()
        .groupBy("event_type")
        .aggregate("user_id")
        .withOp(AggOp.HistOp)
        .limitTo(10)
        .run(Tables.events(s, dir))
      // flatten the struct for a stable parquet schema
      r.selectExpr("event_type", "Count", "ROUND(user_id_hist.mean, 6) AS mean",
        "user_id_hist.percentiles[50] AS p50",
        "ROUND(user_id_hist.stddev, 6) AS stddev")
    },
    Some("""WITH par AS (
       |  SELECT MIN(user_id) AS mn,
       |    GREATEST(1, (MAX(user_id) - MIN(user_id) + 999) // 1000) AS bw
       |  FROM events),
       |bk AS (
       |  SELECT event_type, ((user_id - mn) // bw) * bw + mn AS low,
       |    COUNT(*) AS c
       |  FROM events, par GROUP BY 1, 2),
       |cum AS (
       |  SELECT event_type, low, c,
       |    SUM(c) OVER (PARTITION BY event_type ORDER BY low) AS cm,
       |    SUM(c) OVER (PARTITION BY event_type) AS tot
       |  FROM bk),
       |p50 AS (
       |  SELECT event_type, MIN(low) AS p50 FROM cum
       |  WHERE 100 * cm >= 50 * tot GROUP BY 1),
       |m AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS Count,
       |    CAST(SUM(user_id) AS DOUBLE) / COUNT(*) AS mean
       |  FROM events GROUP BY 1),
       |sd AS (
       |  SELECT b.event_type,
       |    SQRT(SUM((b.low - m.mean) * (b.low - m.mean) *
       |      (b.c / CAST(m.Count AS DOUBLE)))) AS sdv
       |  FROM bk b JOIN m ON b.event_type = m.event_type
       |  GROUP BY 1, m.Count)
       |SELECT m.event_type, m.Count, ROUND(m.mean, 6) AS mean, p50.p50,
       |  ROUND(sd.sdv, 6) AS stddev
       |FROM m JOIN p50 ON m.event_type = p50.event_type
       |JOIN sd ON m.event_type = sd.event_type
       |ORDER BY m.Count DESC, m.event_type LIMIT 10""".stripMargin))

  val catalog: Seq[(String, QueryDef)] = Seq(dslTimeSeries, dslAvg, dslSamples, dslHist)
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Decontam, Events, Sampling, TextAnalysis}

/** Catalog entries: event-stream analytics (sessionization, funnels) and
  * corpus-hygiene operators (deterministic sampling, decontamination,
  * repetition signals, boilerplate detection) — the round-5 additions to
  * the training-data-pipeline surface.
  */
object Queries7 {

  /** Gap sessionization of the events stream ([[Events.sessionize]]):
    * 30-minute inactivity splits, one row per session. The cumulative-sum
    * session id and every output column are exact integers, so the window
    * SQL twin must agree bit-for-bit.
    */
  val q54Sessionize: (String, QueryDef) = "q54_sessionize" -> QueryDef(
    (s: SparkSession, dir: String) =>
      Events.sessionize(Tables.events(s, dir), "user_id", "ts_sec",
          "event_id", gapSecs = 1800L)
        .orderBy(col("user_id"), col("session_idx")),
    Some(
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ns(ts) // 1000000000 AS s FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, s,
        |    CASE WHEN s - LAG(s) OVER (PARTITION BY user_id ORDER BY s, event_id) IS NULL
        |           OR s - LAG(s) OVER (PARTITION BY user_id ORDER BY s, event_id) > 1800
        |         THEN 1 ELSE 0 END AS ns
        |  FROM e),
        |sess AS (
        |  SELECT user_id, s,
        |    CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY s, event_id
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS BIGINT) AS session_idx
        |  FROM flagged)
        |SELECT user_id, session_idx, MIN(s) AS session_start,
        |  MAX(s) AS session_end, COUNT(*) AS n_events,
        |  MAX(s) - MIN(s) AS duration_secs
        |FROM sess GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin))

  /** Ordered funnel view → click → purchase with a 24 h per-step window
    * ([[Events.funnel]]). Counts are exact ints; the oracle replicates the
    * frontier-join staging.
    */
  val q55Funnel: (String, QueryDef) = "q55_funnel" -> QueryDef(
    (s: SparkSession, dir: String) =>
      Events.funnel(Tables.events(s, dir), "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"),
          stepWindow = Some(86400L * 1000000000L))
        .orderBy(col("step")),
    Some(
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ns(ts) AS t FROM events),
        |s0 AS (SELECT user_id, MIN(t) AS t FROM e
        |       WHERE event_type = 'view' GROUP BY 1),
        |s1 AS (SELECT e.user_id, MIN(e.t) AS t FROM e JOIN s0 USING (user_id)
        |       WHERE event_type = 'click' AND e.t > s0.t
        |         AND e.t <= s0.t + 86400000000000 GROUP BY 1),
        |s2 AS (SELECT e.user_id, MIN(e.t) AS t FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'purchase' AND e.t > s1.t
        |         AND e.t <= s1.t + 86400000000000 GROUP BY 1)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
        |    COUNT(*) AS users FROM s0
        |  UNION ALL SELECT 2, 'click', COUNT(*) FROM s1
        |  UNION ALL SELECT 3, 'purchase', COUNT(*) FROM s2)
        |ORDER BY step""".stripMargin))

  /** Deterministic stratified hash sample of the documents corpus
    * ([[Sampling.stratifiedHashSample]]): md5-bucket membership — stable
    * across engines, partitionings, and runs — with per-language keep
    * rates (downsample en to 25%, keep zh fully, 50% otherwise) and exact
    * re-weighting factors.
    */
  val q56HashSample: (String, QueryDef) = "q56_hash_sample" -> QueryDef(
    (s: SparkSession, dir: String) =>
      Sampling.stratifiedHashSample(Tables.load(s, dir, "documents"),
          "doc_id", "lang", Map("en" -> 2500, "zh" -> 10000),
          defaultBp = 5000, salt = "mix1")
        .select(col("doc_id"), col("lang"), col("sample_weight"))
        .orderBy(col("doc_id")),
    Some(
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST('0x' || substring(md5('mix1' || CAST(doc_id AS VARCHAR)), 1, 8)
        |         AS BIGINT) % 10000 AS bucket,
        |    CASE WHEN lang = 'en' THEN 2500 WHEN lang = 'zh' THEN 10000
        |         ELSE 5000 END AS thr
        |  FROM documents)
        |SELECT doc_id, lang, 10000.0 / CAST(thr AS DOUBLE) AS sample_weight
        |FROM t WHERE bucket < thr ORDER BY doc_id""".stripMargin))

  /** Benchmark decontamination ([[Decontam.overlapWithBenchmark]]): count
    * distinct 3-gram overlaps between each corpus document and an eval
    * set (docs with id ≡ 0 mod 50). Spark joins on fused FNV-64 n-gram
    * hashes (never materializing the strings, benchmark side broadcast);
    * the oracle counts the same overlaps from string n-grams — equality is
    * the no-collision/no-loss check.
    */
  val q57Decontam: (String, QueryDef) = "q57_decontam" -> QueryDef(
    (s: SparkSession, dir: String) => {
      val docs = Tables.load(s, dir, "documents")
      Decontam.overlapWithBenchmark(docs,
          docs.filter(pmod(col("doc_id"), lit(50)) === 0),
          "doc_id", "text", n = 3)
        .orderBy(col("doc_id"))
    },
    Some(
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |ng AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, len(w) - 2),
        |    i -> array_to_string(w[i:i+2], ' ')))) AS ng
        |  FROM w),
        |bng AS (SELECT DISTINCT ng FROM ng WHERE doc_id % 50 = 0)
        |SELECT n.doc_id, COUNT(*) AS overlap_ngrams
        |FROM ng n JOIN bng USING (ng)
        |WHERE n.doc_id % 50 <> 0
        |GROUP BY n.doc_id ORDER BY doc_id""".stripMargin))

  /** Gopher-style repetition signals ([[TextAnalysis.repetitionSignals]]):
    * duplicate-word fraction and top-bigram fraction per document. Both
    * fractions are one IEEE division of exact ints — bit-identical
    * cross-engine with no rounding convention.
    */
  val q58Repetition: (String, QueryDef) = "q58_repetition" -> QueryDef(
    (s: SparkSession, dir: String) =>
      TextAnalysis.repetitionSignals(Tables.load(s, dir, "documents"),
          "doc_id", "text")
        .orderBy(col("doc_id")),
    Some(
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |ws AS (
        |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(len(list_distinct(w)) AS BIGINT) AS nd
        |  FROM w),
        |bg AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 1),
        |    i -> array_to_string(w[i:i+1], ' '))) AS bg
        |  FROM w),
        |bc AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY 1, 2),
        |bs AS (SELECT doc_id, MAX(c) AS top, CAST(SUM(c) AS BIGINT) AS tot
        |       FROM bc GROUP BY 1)
        |SELECT ws.doc_id, n_words,
        |  CAST(n_words - nd AS DOUBLE) / n_words AS dup_word_frac,
        |  COALESCE(CAST(top AS DOUBLE) / tot, 0.0) AS top_bigram_frac
        |FROM ws LEFT JOIN bs USING (doc_id)
        |ORDER BY doc_id""".stripMargin))

  /** Cross-document boilerplate 3-grams ([[Decontam.boilerplateNgrams]]):
    * n-grams present in ≥ 5 distinct documents, by document frequency.
    */
  val q59Boilerplate: (String, QueryDef) = "q59_boilerplate" -> QueryDef(
    (s: SparkSession, dir: String) =>
      Decontam.boilerplateNgrams(Tables.load(s, dir, "documents"),
          "text", n = 3, minDocs = 5L)
        .orderBy(col("doc_freq").desc, col("ngram"))
        .limit(100),
    Some(
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |ng AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, len(w) - 2),
        |    i -> array_to_string(w[i:i+2], ' ')))) AS ngram
        |  FROM w)
        |SELECT ngram, COUNT(*) AS doc_freq FROM ng GROUP BY 1
        |HAVING COUNT(*) >= 5
        |ORDER BY doc_freq DESC, ngram LIMIT 100""".stripMargin))

  val catalog: Seq[(String, QueryDef)] = Seq(
    q54Sessionize, q55Funnel, q56HashSample, q57Decontam, q58Repetition,
    q59Boilerplate)
}

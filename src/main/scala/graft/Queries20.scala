package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Curation, Dedup, TextAnalysis}

/** Catalog entries: round-13 additions (continued) — the Gopher rule
  * bundle and the end-to-end curation waterfall.
  */
object Queries20 {

  private def t(name: String)(implicit env: (SparkSession, String)): DataFrame =
    Tables.load(env._1, env._2, name)

  private def q(name: String, sql: String = null)(
      body: (SparkSession, String) => DataFrame): (String, QueryDef) =
    name -> QueryDef(body, Option(sql))

  /** The Gopher metric CTEs, shared by q185 (full report) and q186 (the
    * waterfall's quality stage). `from` is the corpus CTE name. */
  private def gopherSql(from: String): String =
    s"""gb AS (SELECT doc_id, string_split(text, ' ') AS tk FROM $from),
       |gm AS (
       |  SELECT doc_id,
       |    CAST(len(tk) AS BIGINT) AS n_words,
       |    CAST(list_aggregate(list_transform(tk, w -> length(w)), 'sum')
       |        AS DOUBLE) / CAST(len(tk) AS DOUBLE) AS mean_word_len,
       |    CAST(len(list_filter(list_distinct(tk), w -> list_contains(
       |      ['the','a','of','to','and','in','is','that'], w))) AS BIGINT)
       |      AS n_stopwords,
       |    CAST(len(list_filter(tk, w -> regexp_matches(w, '[A-Za-z]')))
       |      AS BIGINT) AS n_alpha
       |  FROM gb),
       |tb AS (
       |  SELECT doc_id, MAX(c) AS top FROM (
       |    SELECT doc_id, g, COUNT(*) AS c FROM (
       |      SELECT doc_id, unnest(list_transform(
       |        generate_series(1, len(tk) - 1),
       |        i -> tk[i] || ' ' || tk[i + 1])) AS g
       |      FROM gb WHERE len(tk) >= 2)
       |    GROUP BY doc_id, g)
       |  GROUP BY doc_id),
       |gr AS (
       |  SELECT gm.doc_id, n_words, mean_word_len, n_stopwords,
       |    CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE)
       |      AS alpha_word_frac,
       |    CASE WHEN n_words >= 2 THEN
       |      CAST(COALESCE(top, 0) AS DOUBLE) / CAST(n_words - 1 AS DOUBLE)
       |    ELSE 0.0 END AS top_bigram_frac
       |  FROM gm LEFT JOIN tb ON tb.doc_id = gm.doc_id),
       |gk AS (
       |  SELECT *,
       |    n_words >= 5 AND n_words <= 100000 AS pass_words,
       |    mean_word_len >= 2.0 AND mean_word_len <= 10.0 AS pass_word_len,
       |    n_stopwords >= 2 AS pass_stopwords,
       |    alpha_word_frac >= 0.8 AS pass_alpha,
       |    top_bigram_frac <= 0.2 AS pass_repetition
       |  FROM gr)""".stripMargin

  /** Gopher rule report ([[TextAnalysis.gopherRules]], Rae et al. §A1.1):
    * per-doc metrics, one boolean per rule, conjunctive keep — the report
    * that shows WHICH rule kills a document. */
  val q185GopherRules: (String, QueryDef) = q(
    "q185_gopher_rules",
    s"""WITH ${gopherSql("documents")}
       |SELECT doc_id, n_words, mean_word_len, n_stopwords,
       |  alpha_word_frac, top_bigram_frac,
       |  pass_words, pass_word_len, pass_stopwords, pass_alpha,
       |  pass_repetition,
       |  pass_words AND pass_word_len AND pass_stopwords AND pass_alpha
       |    AND pass_repetition AS keep
       |FROM gk ORDER BY doc_id""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    TextAnalysis.gopherRules(t("documents"), "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** Curation waterfall ([[Curation.waterfall]]): language routing →
    * Gopher quality → containment dedup (drop docs ≥ 60% contained in
    * another) → benchmark decontamination, with per-stage doc counts,
    * token mass, and retention — the corpus build's summary page, every
    * stage the composition of already-oracled operators. */
  val q186Waterfall: (String, QueryDef) = q(
    "q186_curation_waterfall",
    s"""WITH corpus AS (
       |  SELECT doc_id, lang, text FROM documents WHERE doc_id % 50 <> 0),
       |${gopherSql("corpus")},
       |toks AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
       |  FROM corpus),
       |cw AS (SELECT doc_id, string_split(text, ' ') AS tk FROM corpus),
       |cg AS (
       |  SELECT DISTINCT doc_id, md5(array_to_string(tk[i:i+2], ' ')) AS h
       |  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2))
       |          AS i
       |        FROM cw WHERE len(tk) >= 3)),
       |cdf AS (SELECT h, COUNT(*) AS df FROM cg GROUP BY h),
       |ck AS (SELECT doc_id, h FROM cg JOIN cdf USING (h) WHERE df <= 50),
       |csz AS (SELECT doc_id, COUNT(*) AS n FROM ck GROUP BY doc_id),
       |cpair AS (
       |  SELECT a.doc_id AS id_a, COUNT(*) AS n_common, MIN(sa.n) AS n_a
       |  FROM ck a JOIN ck b ON a.h = b.h AND a.doc_id <> b.doc_id
       |  JOIN csz sa ON sa.doc_id = a.doc_id
       |  GROUP BY a.doc_id, b.doc_id),
       |cont AS (
       |  SELECT DISTINCT id_a AS doc_id FROM cpair
       |  WHERE CAST(n_common AS DOUBLE) / CAST(n_a AS DOUBLE) >= 0.6),
       |bgrams AS (
       |  SELECT DISTINCT md5(array_to_string(tk[i:i+2], ' ')) AS h
       |  FROM (SELECT tk, unnest(generate_series(1, len(tk) - 2)) AS i
       |        FROM (SELECT string_split(text, ' ') AS tk FROM documents
       |              WHERE doc_id % 50 = 0))),
       |ctm AS (SELECT DISTINCT doc_id FROM cg JOIN bgrams USING (h)),
       |flags AS (
       |  SELECT c.doc_id, toks.tokens,
       |    (c.lang = 'en') AS s_lang,
       |    (gk.pass_words AND gk.pass_word_len AND gk.pass_stopwords
       |      AND gk.pass_alpha AND gk.pass_repetition) AS s_quality,
       |    (ct.doc_id IS NULL) AS s_uncontained,
       |    (cm.doc_id IS NULL) AS s_decontam
       |  FROM corpus c
       |  JOIN toks ON toks.doc_id = c.doc_id
       |  JOIN gk ON gk.doc_id = c.doc_id
       |  LEFT JOIN cont ct ON ct.doc_id = c.doc_id
       |  LEFT JOIN ctm cm ON cm.doc_id = c.doc_id),
       |agg AS (
       |  SELECT COUNT(*) AS n0, CAST(SUM(tokens) AS BIGINT) AS t0,
       |    CAST(SUM(CASE WHEN s_lang THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |    CAST(SUM(CASE WHEN s_lang THEN tokens ELSE 0 END) AS BIGINT)
       |      AS t1,
       |    CAST(SUM(CASE WHEN s_lang AND s_quality THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n2,
       |    CAST(SUM(CASE WHEN s_lang AND s_quality THEN tokens ELSE 0 END)
       |      AS BIGINT) AS t2,
       |    CAST(SUM(CASE WHEN s_lang AND s_quality AND s_uncontained
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n3,
       |    CAST(SUM(CASE WHEN s_lang AND s_quality AND s_uncontained
       |      THEN tokens ELSE 0 END) AS BIGINT) AS t3,
       |    CAST(SUM(CASE WHEN s_lang AND s_quality AND s_uncontained
       |      AND s_decontam THEN 1 ELSE 0 END) AS BIGINT) AS n4,
       |    CAST(SUM(CASE WHEN s_lang AND s_quality AND s_uncontained
       |      AND s_decontam THEN tokens ELSE 0 END) AS BIGINT) AS t4
       |  FROM flags),
       |st AS (
       |  SELECT CAST(0 AS BIGINT) AS stage, 'input' AS stage_name,
       |    n0 AS n_docs, t0 AS n_tokens FROM agg
       |  UNION ALL SELECT 1, 's_lang', n1, t1 FROM agg
       |  UNION ALL SELECT 2, 's_quality', n2, t2 FROM agg
       |  UNION ALL SELECT 3, 's_uncontained', n3, t3 FROM agg
       |  UNION ALL SELECT 4, 's_decontam', n4, t4 FROM agg)
       |SELECT stage, stage_name, n_docs, n_tokens,
       |  CASE WHEN LAG(n_docs) OVER (ORDER BY stage) > 0 THEN
       |    CAST(n_docs AS DOUBLE) /
       |      CAST(LAG(n_docs) OVER (ORDER BY stage) AS DOUBLE)
       |  END AS retention
       |FROM st ORDER BY stage""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val docs = t("documents")
    val corpus = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0)
    val gopher = TextAnalysis.gopherRules(corpus, "doc_id", "text")
      .select(col("doc_id"), col("keep").as("s_quality"))
    // set-complete (uncapped, unsorted) pair frame: the purge set must
    // never silently truncate, and this consumer only feeds a distinct
    // semi-join — no report ordering needed
    val contained = Dedup.containmentPairsAll(corpus, "doc_id", "text",
        n = 3, maxDf = 50L, minContainment = 0.6)
      .select(col("id_a").as("doc_id")).distinct()
      .withColumn("__cont", lit(true))
    val benchGrams = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
      .select(split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(explode(call_function("graft_shingle_hash",
        col("tk"), lit(3))).as("h"))
      .distinct()
    val corpusGrams = corpus
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"), explode(call_function("graft_shingle_hash",
        col("tk"), lit(3))).as("h"))
    val contaminated = corpusGrams.join(benchGrams, "h")
      .select(col("doc_id")).distinct().withColumn("__ctm", lit(true))
    val enriched = corpus
      .select(col("doc_id"), (col("lang") === "en").as("s_lang"),
        size(split(col("text"), " ")).cast("long").as("tokens"))
      .join(gopher, "doc_id")
      .join(contained, Seq("doc_id"), "left")
      .join(contaminated, Seq("doc_id"), "left")
      .select(col("doc_id"), col("tokens"), col("s_lang"),
        col("s_quality"), col("__cont").isNull.as("s_uncontained"),
        col("__ctm").isNull.as("s_decontam"))
    Curation.waterfall(enriched, col("tokens"),
        Seq("s_lang", "s_quality", "s_uncontained", "s_decontam"))
      .orderBy(col("stage"))
  }

  val catalog: Seq[(String, QueryDef)] =
    Seq(q185GopherRules, q186Waterfall)
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Sampling, TextAnalysis}

/** Catalog entries: round-10 additions — pairwise corpus-overlap report,
  * DSIR-style domain-relevance selection, vocabulary-coverage (OOV) audit,
  * and bounded-size priority sampling.
  */
object Queries15 {

  private def t(name: String)(implicit env: (SparkSession, String)): DataFrame =
    Tables.load(env._1, env._2, name)

  private def q(name: String, sql: String = null)(
      body: (SparkSession, String) => DataFrame): (String, QueryDef) =
    name -> QueryDef(body, Option(sql))

  /** Pairwise corpus-overlap report ([[TextAnalysis.corpusOverlap]]):
    * for every pair of sources, exact bigram-vocabulary sizes, shared
    * bigrams, vocabulary Jaccard, and byte-identical shared documents —
    * the before-you-merge audit for combining crawls. Bigrams (n = 2)
    * because this corpus shares one unigram vocabulary: phrase-level
    * overlap is what actually separates the sources. All integers exact;
    * `vocab_jaccard` is the single IEEE division. */
  val q139CorpusOverlap: (String, QueryDef) = q(
    "q139_corpus_overlap",
    """WITH d AS (SELECT source, string_split(text, ' ') AS w, text
      |           FROM documents),
      |tok AS (
      |  SELECT DISTINCT source AS g, token FROM (
      |    SELECT source, unnest(list_transform(
      |      generate_series(1, len(w) - 1),
      |      i -> array_to_string(w[i:i+1], ' '))) AS token
      |    FROM d WHERE len(w) >= 2)),
      |sizes AS (SELECT g, COUNT(*) AS vocab FROM tok GROUP BY g),
      |vc AS (
      |  SELECT a.g AS ga, b.g AS gb, COUNT(*) AS vocab_common
      |  FROM tok a JOIN tok b ON a.token = b.token AND a.g < b.g
      |  GROUP BY 1, 2),
      |ch AS (SELECT DISTINCT source AS g, md5(text) AS h FROM d),
      |cc AS (
      |  SELECT a.g AS ga, b.g AS gb, COUNT(*) AS content_common
      |  FROM ch a JOIN ch b ON a.h = b.h AND a.g < b.g
      |  GROUP BY 1, 2)
      |SELECT x.g AS src_a, y.g AS src_b,
      |  CAST(x.vocab AS BIGINT) AS vocab_a,
      |  CAST(y.vocab AS BIGINT) AS vocab_b,
      |  CAST(COALESCE(vc.vocab_common, 0) AS BIGINT) AS vocab_common,
      |  CAST(COALESCE(vc.vocab_common, 0) AS DOUBLE) /
      |    CAST(x.vocab + y.vocab - COALESCE(vc.vocab_common, 0) AS DOUBLE)
      |    AS vocab_jaccard,
      |  CAST(COALESCE(cc.content_common, 0) AS BIGINT) AS content_common
      |FROM sizes x JOIN sizes y ON x.g < y.g
      |LEFT JOIN vc ON vc.ga = x.g AND vc.gb = y.g
      |LEFT JOIN cc ON cc.ga = x.g AND cc.gb = y.g
      |ORDER BY src_a, src_b""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    TextAnalysis.corpusOverlap(t("documents"), "source", "text", n = 2)
      .orderBy(col("src_a"), col("src_b"))
  }

  /** Domain-relevance selection ([[TextAnalysis.domainRelevance]]): rank
    * the non-src0 corpus by how much its vocabulary leans toward src0 —
    * the log-free exact form of DSIR importance weighting (per-token
    * integer cross-difference of document-frequency rates, summed). Top
    * 40 by score with id tiebreak; every value an exact integer. */
  val q140DomainRelevance: (String, QueryDef) = q(
    "q140_domain_relevance",
    """WITH tok AS (
      |  SELECT DISTINCT doc_id, is_t, token FROM (
      |    SELECT doc_id, (source = 'src0') AS is_t,
      |      unnest(string_split(text, ' ')) AS token
      |    FROM documents)),
      |df AS (
      |  SELECT token,
      |    CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS df_t,
      |    CAST(SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS df_r
      |  FROM tok GROUP BY token),
      |tot AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_t,
      |    CAST(SUM(CASE WHEN source = 'src0' THEN 0 ELSE 1 END) AS BIGINT)
      |      AS n_r
      |  FROM documents)
      |SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
      |  CAST(SUM(df.df_t * tot.n_r - df.df_r * tot.n_t) AS BIGINT) AS score
      |FROM tok t JOIN df USING (token) CROSS JOIN tot
      |WHERE NOT t.is_t
      |GROUP BY t.doc_id
      |ORDER BY score DESC, t.doc_id LIMIT 40""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    TextAnalysis.domainRelevance(t("documents"), "doc_id", "text",
        col("source") === "src0")
      .orderBy(col("score").desc, col("doc_id").asc).limit(40)
  }

  /** Vocabulary-coverage audit ([[TextAnalysis.vocabCoverage]]): build
    * the top-20 token vocabulary (count desc, token tiebreak — the cut is
    * deterministic) and report per source the occurrence totals, OOV
    * occurrences, and OOV fraction — the tokenizer-coverage check run
    * before committing a vocab to a corpus mix. Counts exact; `oov_frac`
    * one IEEE division. */
  val q141VocabCoverage: (String, QueryDef) = q(
    "q141_vocab_coverage",
    """WITH occ AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |vocab AS (
      |  SELECT token FROM (
      |    SELECT token, COUNT(*) AS cnt FROM occ GROUP BY token
      |    ORDER BY cnt DESC, token LIMIT 20))
      |SELECT occ.source,
      |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |  CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_oov,
      |  CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS DOUBLE) /
      |    CAST(COUNT(*) AS DOUBLE) AS oov_frac
      |FROM occ LEFT JOIN vocab v ON occ.token = v.token
      |GROUP BY occ.source ORDER BY occ.source""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    TextAnalysis.vocabCoverage(t("documents"), "source", "text",
        vocabSize = 20)
      .orderBy(col("source"))
  }

  /** Priority sampling ([[Sampling.prioritySample]]): a 60-row weighted
    * sample of orders (weight = total price in cents) with
    * Duffield–Lund–Thorup estimator weights. The priority is ONE IEEE
    * division of two exact integers (`w·2³² / (md5bucket+1)`) and the
    * cents weight is `floor(price·100)` — floor of the same IEEE product
    * in both engines (a double→int CAST would round differently across
    * engines) — so sample membership, order, and estimator weights all
    * hash-match. */
  val q142PrioritySample: (String, QueryDef) = q(
    "q142_priority_sample",
    """WITH s AS (
      |  SELECT o_orderkey,
      |    CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS w,
      |    CAST('0x' || substring(md5('prio1' || CAST(o_orderkey AS VARCHAR)),
      |         1, 8) AS BIGINT) AS b
      |  FROM orders),
      |p AS (
      |  SELECT o_orderkey, w,
      |    CAST(w * 4294967296 AS DOUBLE) / CAST(b + 1 AS DOUBLE) AS q,
      |    ROW_NUMBER() OVER (ORDER BY
      |      CAST(w * 4294967296 AS DOUBLE) / CAST(b + 1 AS DOUBLE) DESC,
      |      o_orderkey) AS rn
      |  FROM s),
      |tau AS (
      |  SELECT COALESCE(MAX(CASE WHEN rn = 61 THEN q END), 0.0) AS tau
      |  FROM p)
      |SELECT o_orderkey, w AS weight, q AS priority,
      |  GREATEST(CAST(w AS DOUBLE), tau.tau) AS est_weight
      |FROM p CROSS JOIN tau
      |WHERE rn <= 60
      |ORDER BY priority DESC, o_orderkey""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    Sampling.prioritySample(t("orders"), "o_orderkey",
      floor(col("o_totalprice") * lit(100)), n = 60, salt = "prio1")
  }

  /** Per-source priority sampling ([[Sampling.prioritySamplePerGroup]]):
    * exactly 5 weighted docs per source with per-group DLT thresholds and
    * estimator weights — the balanced per-domain draw. `n_chars` is
    * already an exact integer weight; the oracle replays the identical
    * priority (one exact-int IEEE division) through a per-source window,
    * with the rank-(n+1) τ as a MAX-CASE (absent rank ⇒ census group,
    * τ = 0). */
  val q143GroupPrioritySample: (String, QueryDef) = q(
    "q143_group_priority_sample",
    """WITH s AS (
      |  SELECT source, doc_id, n_chars AS w,
      |    CAST('0x' || substring(md5('prio2' || CAST(doc_id AS VARCHAR)),
      |         1, 8) AS BIGINT) AS b
      |  FROM documents),
      |p AS (
      |  SELECT source, doc_id, w,
      |    CAST(w * 4294967296 AS DOUBLE) / CAST(b + 1 AS DOUBLE) AS q,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY
      |      CAST(w * 4294967296 AS DOUBLE) / CAST(b + 1 AS DOUBLE) DESC,
      |      doc_id) AS rn
      |  FROM s),
      |tau AS (
      |  SELECT source, COALESCE(MAX(CASE WHEN rn = 6 THEN q END), 0.0) AS tau
      |  FROM p WHERE rn <= 6 GROUP BY source)
      |SELECT p.source, p.doc_id, p.w AS weight, p.q AS priority,
      |  GREATEST(CAST(p.w AS DOUBLE), tau.tau) AS est_weight
      |FROM p JOIN tau USING (source)
      |WHERE p.rn <= 5
      |ORDER BY p.source, p.q DESC, p.doc_id""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    Sampling.prioritySamplePerGroup(t("documents"), "source", "doc_id",
      col("n_chars"), n = 5, salt = "prio2")
  }

  /** Exact filter-calibration AUC ([[graft.core.Stats.groupedAuc]]): per
    * source, how well document length separates English docs — the
    * tie-corrected Mann–Whitney rank-sum over the distinct-value rollup,
    * exact integers end-to-end, one final IEEE division. The oracle
    * replays the identical doubled-rank arithmetic; single-class groups
    * are NULL in both engines. */
  val q144FilterAuc: (String, QueryDef) = q(
    "q144_filter_auc",
    """WITH r AS (
      |  SELECT source, n_chars AS s, COUNT(*) AS c,
      |    SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS p
      |  FROM documents GROUP BY 1, 2),
      |cw AS (
      |  SELECT source, s, c, p,
      |    SUM(c) OVER (PARTITION BY source ORDER BY s) AS cum
      |  FROM r)
      |SELECT source,
      |  CAST(SUM(p) AS BIGINT) AS n_pos,
      |  CAST(SUM(c) - SUM(p) AS BIGINT) AS n_neg,
      |  CASE WHEN SUM(p) > 0 AND SUM(c) - SUM(p) > 0 THEN
      |    CAST(SUM(p * (2 * (cum - c) + c + 1)) - SUM(p) * (SUM(p) + 1)
      |         AS DOUBLE) /
      |    CAST(2 * SUM(p) * (SUM(c) - SUM(p)) AS DOUBLE)
      |  ELSE NULL END AS auc
      |FROM cw GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.core.Stats.groupedAuc(t("documents"), "source", "n_chars",
        col("lang") === "en")
      .orderBy(col("source"))
  }

  /** Precision/recall reliability curve over exact score deciles
    * ([[graft.operators.Curation.exactScoreBands]] + q144's label): per
    * decile of n_chars (bucket 0 = highest scores), the empirical
    * positive rate, plus cumulative-from-the-top precision and recall —
    * the threshold-sweep companion to q144's single-number AUC, telling
    * you WHERE to put the filter cutoff. Counts exact; each rate is one
    * IEEE division of exact integers; the cum windows run over ≤ 10
    * decile rows, never documents. */
  val q145ReliabilityCurve: (String, QueryDef) = q(
    "q145_reliability_curve",
    """WITH g AS (SELECT n_chars, COUNT(*) AS c FROM documents GROUP BY n_chars),
      |cum AS (
      |  SELECT n_chars,
      |    COALESCE(SUM(c) OVER (ORDER BY n_chars DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS higher,
      |    SUM(c) OVER () AS total
      |  FROM g),
      |b AS (
      |  SELECT d.doc_id, CAST((10 * cum.higher) // cum.total AS BIGINT)
      |      AS bucket,
      |    CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS pos
      |  FROM documents d JOIN cum USING (n_chars)),
      |per AS (
      |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(pos) AS BIGINT) AS n_pos
      |  FROM b GROUP BY bucket)
      |SELECT bucket, n, n_pos,
      |  CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS pos_rate,
      |  CAST(SUM(n_pos) OVER (ORDER BY bucket) AS DOUBLE) /
      |    CAST(SUM(n) OVER (ORDER BY bucket) AS DOUBLE) AS cum_precision,
      |  CAST(SUM(n_pos) OVER (ORDER BY bucket) AS DOUBLE) /
      |    CAST(SUM(n_pos) OVER () AS DOUBLE) AS cum_recall
      |FROM per ORDER BY bucket""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    import org.apache.spark.sql.expressions.Window
    val docs = t("documents")
    // bounded integer score: pin serial, skip the resolveCum probe
    val bands = graft.operators.Curation.exactScoreBands(
      docs.select(col("doc_id"), col("n_chars")), "doc_id", "n_chars",
      buckets = 10, distributedCum = Some(false))
    val per = bands
      .join(docs.select(col("doc_id"),
        when(col("lang") === "en", 1L).otherwise(0L).as("pos")), Seq("doc_id"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"))
    val wCum = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    per.select(col("bucket"), col("n"), col("n_pos"),
        (col("n_pos").cast("double") / col("n").cast("double"))
          .as("pos_rate"),
        (sum(col("n_pos")).over(wCum).cast("double") /
          sum(col("n")).over(wCum).cast("double")).as("cum_precision"),
        (sum(col("n_pos")).over(wCum).cast("double") /
          sum(col("n_pos")).over(wAll).cast("double")).as("cum_recall"))
      .orderBy(col("bucket"))
  }

  /** Corpus snapshot diff ([[graft.operators.Curation.snapshotDiff]]):
    * synthesize two snapshot views of the documents table in-plan — the
    * "old" snapshot drops ids ≡ 0 (mod 7), the "new" one drops ids ≡ 0
    * (mod 10) and edits the text of ids ≡ 0 (mod 5) — then report how
    * much moved, per status. The diff itself is hash-only: one
    * full-outer equi-join of (id, md5) frames. */
  val q146SnapshotDiff: (String, QueryDef) = q(
    "q146_snapshot_diff",
    """WITH old AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0),
      |new AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
      |  FROM documents WHERE doc_id % 10 <> 0),
      |d AS (
      |  SELECT COALESCE(old.doc_id, new.doc_id) AS id,
      |    CASE WHEN old.doc_id IS NULL THEN 'added'
      |         WHEN new.doc_id IS NULL THEN 'removed'
      |         WHEN md5(old.text) = md5(new.text) THEN 'unchanged'
      |         ELSE 'changed' END AS status
      |  FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id)
      |SELECT status, CAST(COUNT(*) AS BIGINT) AS n
      |FROM d GROUP BY status ORDER BY status""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val docs = t("documents")
    val oldSnap = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
      .select(col("doc_id"), col("text"))
    val newSnap = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(5)) === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text")).as("text"))
    graft.operators.Curation.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
      .orderBy(col("status"))
  }

  /** Compression-ratio quality signal
    * ([[TextAnalysis.compressionRatio]], native `graft_deflate_len`):
    * per-document DEFLATE ratio. DEFLATE output is implementation-defined
    * and DuckDB has no compressor, so the catalog output is the exact byte
    * length plus a *hash-stateable bound assertion*: the ratio is a
    * deterministic function of the data, and the query emits
    * `ratio_in_bounds = 1` iff `0.25 < deflate/raw <= 1.1` (natural text
    * compresses but never pathologically; DEFLATE expansion is capped near
    * raw+5/16KiB). The oracle states the exact lengths and the literal
    * `1` — a broken or drifting compressor flips flags and fails the hash
    * gate. The signal's finer properties stay spec-verified (exact lengths
    * on known streams, determinism, repetitive < natural < noise
    * ordering). */
  val q147CompressionRatio: (String, QueryDef) = q(
    "q147_compression_ratio",
    """SELECT doc_id, source, CAST(strlen(text) AS BIGINT) AS raw_len,
      |  CAST(1 AS BIGINT) AS ratio_in_bounds
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    t("documents")
      .select(col("doc_id"), col("source"),
        octet_length(col("text")).cast("long").as("raw_len"),
        TextAnalysis.compressionRatio(col("text")).as("ratio"))
      .select(col("doc_id"), col("source"), col("raw_len"),
        when(col("ratio") > 0.25 && col("ratio") <= 1.1, 1L)
          .otherwise(0L).as("ratio_in_bounds"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic Poisson bootstrap
    * ([[graft.core.Stats.bootstrapMeans]]): 40 replicate means of
    * l_extendedprice (in cents) — the sampling distribution behind an
    * error bar, computed in one pass with md5-replayable draws. The
    * oracle regenerates the identical replicate fan-out, buckets, pinned
    * Poisson thresholds, and exact integer sums; each mean is one IEEE
    * division. */
  val q148Bootstrap: (String, QueryDef) = q(
    "q148_bootstrap_means",
    """WITH r AS (SELECT unnest(generate_series(0, 39)) AS rep),
      |e AS (
      |  SELECT r.rep,
      |    CAST(FLOOR(l.l_extendedprice * 100) AS BIGINT) AS v,
      |    CAST('0x' || substring(md5(
      |      'boot1' || '|' || (l.l_orderkey || '-' || l.l_linenumber)
      |        || '#' || CAST(r.rep // 8 AS VARCHAR)),
      |      (r.rep % 8) * 4 + 1, 4) AS BIGINT) AS b
      |  FROM lineitem l CROSS JOIN r),
      |d AS (
      |  SELECT rep, v,
      |    CASE WHEN b < 24109 THEN 0 WHEN b < 48219 THEN 1
      |         WHEN b < 60273 THEN 2 WHEN b < 64292 THEN 3
      |         WHEN b < 65296 THEN 4 ELSE 5 END AS c
      |  FROM e)
      |SELECT rep, CAST(SUM(c) AS BIGINT) AS n_drawn,
      |  CASE WHEN SUM(c) > 0 THEN
      |    CAST(SUM(c * v) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
      |  ELSE NULL END AS mean
      |FROM d GROUP BY rep ORDER BY rep""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.core.Stats.bootstrapMeans(t("lineitem"),
        concat(col("l_orderkey"), lit("-"), col("l_linenumber")),
        floor(col("l_extendedprice") * lit(100)),
        reps = 40, salt = "boot1")
      .orderBy(col("rep"))
  }

  val catalog: Seq[(String, QueryDef)] =
    Seq(q139CorpusOverlap, q140DomainRelevance, q141VocabCoverage,
      q142PrioritySample, q143GroupPrioritySample, q144FilterAuc,
      q145ReliabilityCurve, q146SnapshotDiff, q147CompressionRatio,
      q148Bootstrap)
}

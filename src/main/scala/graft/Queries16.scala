package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.TextAnalysis

/** Catalog entries: round-11 additions — collocation mining and further
  * training-data-pipeline audits.
  */
object Queries16 {

  private def t(name: String)(implicit env: (SparkSession, String)): DataFrame =
    Tables.load(env._1, env._2, name)

  private def q(name: String, sql: String = null)(
      body: (SparkSession, String) => DataFrame): (String, QueryDef) =
    name -> QueryDef(body, Option(sql))

  /** Collocation mining ([[TextAnalysis.pmiCollocations]]): top adjacent
    * token pairs by PMI-lift `p(ab)/(p(a)p(b))`. Lift, not `log(lift)`,
    * so every arithmetic step is one IEEE division/multiply and the score
    * hash-checks bit-for-bit (log is monotone — same ranking). */
  val q149PmiCollocations: (String, QueryDef) = q(
    "q149_pmi_collocations",
    """WITH w AS (SELECT string_split(text, ' ') AS tk FROM documents),
      |u AS (SELECT unnest(tk) AS t FROM w),
      |c1 AS (SELECT t, COUNT(*) AS c FROM u GROUP BY t),
      |nt AS (SELECT COUNT(*) AS n_tok FROM u),
      |bg AS (
      |  SELECT x.w1 AS w1, x.w2 AS w2 FROM (
      |    SELECT unnest(list_transform(generate_series(1, len(tk) - 1),
      |      i -> struct_pack(w1 := tk[i], w2 := tk[i+1]))) AS x
      |    FROM w WHERE len(tk) >= 2)),
      |c2 AS (SELECT w1, w2, COUNT(*) AS n_pair FROM bg GROUP BY w1, w2),
      |nb AS (SELECT COUNT(*) AS n_bg FROM bg)
      |SELECT w1, w2, n_pair,
      |  (CAST(n_pair AS DOUBLE) / n_bg) /
      |    ((CAST(a.c AS DOUBLE) / n_tok) * (CAST(b.c AS DOUBLE) / n_tok))
      |    AS lift
      |FROM c2 JOIN c1 a ON c2.w1 = a.t JOIN c1 b ON c2.w2 = b.t
      |CROSS JOIN nt CROSS JOIN nb
      |WHERE n_pair >= 5
      |ORDER BY lift DESC, w1, w2 LIMIT 50""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    TextAnalysis.pmiCollocations(t("documents"), "text",
      minCount = 5L, topK = 50)
  }

  /** Weak-label Naive Bayes classifier ([[Classifier.naiveBayesScore]]):
    * train a fasttext-style token classifier on the `lang = 'en'` weak
    * label and score every document with its smoothed log-odds, all in
    * one plan. Scores fold in token order and round to 6 decimals (the
    * q75/q108 determinism discipline), so the per-doc output hash-checks.
    */
  val q150NbClassifier: (String, QueryDef) = q(
    "q150_nb_classifier",
    """WITH base AS (
      |  SELECT doc_id, lang = 'en' AS is_pos, string_split(text, ' ') AS tk
      |  FROM documents WHERE len(string_split(text, ' ')) >= 1),
      |toks AS (
      |  SELECT doc_id, is_pos, x.pos AS pos, x.t AS t FROM (
      |    SELECT doc_id, is_pos, unnest(list_transform(
      |      generate_series(1, len(tk)),
      |      i -> struct_pack(pos := i, t := tk[i]))) AS x
      |    FROM base)),
      |counts AS (
      |  SELECT t,
      |    CAST(SUM(CASE WHEN is_pos THEN 1 ELSE 0 END) AS BIGINT) AS c_pos,
      |    CAST(SUM(CASE WHEN NOT is_pos THEN 1 ELSE 0 END) AS BIGINT) AS c_neg
      |  FROM toks GROUP BY t),
      |totals AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN is_pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
      |    CAST(SUM(CASE WHEN NOT is_pos THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
      |    COUNT(DISTINCT t) AS v
      |  FROM toks),
      |priors AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN is_pos THEN 1 ELSE 0 END) AS BIGINT) AS d_pos,
      |    CAST(SUM(CASE WHEN NOT is_pos THEN 1 ELSE 0 END) AS BIGINT) AS d_neg
      |  FROM base),
      |model AS (
      |  SELECT t,
      |    ln(CAST(c_pos + 1 AS DOUBLE) / (n_pos + v)) -
      |      ln(CAST(c_neg + 1 AS DOUBLE) / (n_neg + v)) AS lr
      |  FROM counts CROSS JOIN totals),
      |agg AS (
      |  SELECT doc_id, is_pos, COUNT(*) AS n_tokens,
      |    list_reduce(list(lr ORDER BY pos), (x, y) -> x + y) AS s
      |  FROM toks JOIN model USING (t) GROUP BY doc_id, is_pos)
      |SELECT doc_id, is_pos, n_tokens,
      |  ROUND(ln(CAST(d_pos AS DOUBLE) / d_neg) + s, 6) AS score,
      |  ROUND(ln(CAST(d_pos AS DOUBLE) / d_neg) + s, 6) > 0 AS pred
      |FROM agg CROSS JOIN priors ORDER BY doc_id""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.operators.Classifier.naiveBayesScore(
        t("documents"), "doc_id", "text", col("lang") === "en")
      .orderBy(col("doc_id"))
  }

  /** Length-bucketed batch shaping ([[Sampling.lengthBucketBatches]]):
    * token-length buckets of width 32, deterministic md5 shuffle, batches
    * of 16, per-batch padding-waste report. The oracle uses the naive
    * per-bucket window; the Spark plan is the two-phase range-partition
    * rank (same result, no single-task window). */
  val q151LengthBatches: (String, QueryDef) = q(
    "q151_length_batches",
    """WITH base AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS len
      |  FROM documents),
      |b AS (
      |  SELECT doc_id, len, len // 32 AS bucket,
      |    md5('pack8:' || CAST(doc_id AS VARCHAR)) AS k
      |  FROM base),
      |r AS (
      |  SELECT bucket, len,
      |    ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY k, doc_id) AS rn
      |  FROM b),
      |g AS (
      |  SELECT bucket, (rn - 1) // 16 AS batch,
      |    COUNT(*) AS n_seqs, MAX(len) AS max_len,
      |    CAST(SUM(len) AS BIGINT) AS sum_len
      |  FROM r GROUP BY 1, 2)
      |SELECT bucket, batch, n_seqs, max_len, sum_len,
      |  CAST(n_seqs * max_len - sum_len AS BIGINT) AS pad_tokens,
      |  CASE WHEN n_seqs * max_len > 0 THEN
      |    CAST(n_seqs * max_len - sum_len AS DOUBLE) / (n_seqs * max_len)
      |  ELSE 0.0 END AS pad_frac
      |FROM g ORDER BY bucket, batch""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.operators.Sampling.lengthBucketBatches(
        t("documents"), "doc_id",
        size(split(col("text"), " ")), bucketWidth = 32, batchSize = 16,
        salt = "pack8")
      .orderBy(col("bucket"), col("batch"))
  }

  /** Winnowing substring-copy report ([[Dedup.winnowPairs]], the MOSS
    * algorithm): per-window minimum gram hashes select position-robust
    * fingerprints; pairs sharing fingerprints rank by count with the
    * overlap coefficient. k=3, w=4: any shared run of ≥ 6 tokens is
    * guaranteed to produce a common fingerprint. */
  val q152WinnowPairs: (String, QueryDef) = q(
    "q152_winnow_pairs",
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3),
      |h AS (
      |  SELECT doc_id, list_transform(generate_series(1, len(tk) - 2),
      |    i -> md5('win:' || array_to_string(tk[i:i+2], ' '))) AS hs
      |  FROM d),
      |fp AS (
      |  SELECT DISTINCT doc_id, fp FROM (
      |    SELECT doc_id, unnest(list_transform(
      |      generate_series(1, greatest(len(hs) - 3, 1)),
      |      j -> list_min(hs[j:j+3]))) AS fp
      |    FROM h)),
      |dfreq AS (SELECT fp, COUNT(*) AS df FROM fp GROUP BY fp),
      |kept AS (
      |  SELECT f.doc_id, f.fp FROM fp f JOIN dfreq USING (fp)
      |  WHERE df <= 20),
      |sizes AS (SELECT doc_id, COUNT(*) AS n_fp FROM kept GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
      |  FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
      |SELECT id_a, id_b, n_shared,
      |  CAST(n_shared AS DOUBLE) / least(sa.n_fp, sb.n_fp) AS overlap
      |FROM pairs
      |JOIN sizes sa ON sa.doc_id = id_a
      |JOIN sizes sb ON sb.doc_id = id_b
      |ORDER BY n_shared DESC, id_a, id_b LIMIT 100""".stripMargin) {
    (s, dir) =>
      implicit val env: (SparkSession, String) = (s, dir)
      graft.operators.Dedup.winnowPairs(t("documents"), "doc_id", "text",
        k = 3, w = 4, maxDf = 20L, minShared = 2L, topK = 100)
  }

  /** Per-source bootstrap CI ([[graft.core.Stats.bootstrapGroupCi]]):
    * deterministic Poisson bootstrap of each source's mean doc length,
    * 95% percentile CI from the sorted replicate means — the
    * quality-monitoring form ("did source X's length distribution move
    * beyond its own sampling noise?"). Draws batch through the native
    * `graft_boot_counts`; the oracle replays them from the same md5
    * quads. */
  val q153BootstrapCi: (String, QueryDef) = q(
    "q153_bootstrap_ci",
    """WITH r AS (SELECT unnest(generate_series(0, 39)) AS rep),
      |e AS (
      |  SELECT d.source, r.rep, d.n_chars AS v,
      |    CAST('0x' || substring(md5(
      |      'bsrc' || '|' || CAST(d.doc_id AS VARCHAR)
      |        || '#' || CAST(r.rep // 8 AS VARCHAR)),
      |      (r.rep % 8) * 4 + 1, 4) AS BIGINT) AS b
      |  FROM documents d CROSS JOIN r),
      |d2 AS (
      |  SELECT source, rep, v,
      |    CASE WHEN b < 24109 THEN 0 WHEN b < 48219 THEN 1
      |         WHEN b < 60273 THEN 2 WHEN b < 64292 THEN 3
      |         WHEN b < 65296 THEN 4 ELSE 5 END AS c
      |  FROM e),
      |m AS (
      |  SELECT source, rep, CAST(SUM(c) AS BIGINT) AS n_drawn,
      |    CASE WHEN SUM(c) > 0 THEN
      |      CAST(SUM(c * v) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
      |    ELSE NULL END AS mean
      |  FROM d2 GROUP BY 1, 2),
      |ranked AS (
      |  SELECT source, mean,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY mean) AS rk,
      |    COUNT(mean) OVER (PARTITION BY source) AS n_reps
      |  FROM m WHERE mean IS NOT NULL),
      |ci AS (
      |  SELECT source, MAX(n_reps) AS n_reps,
      |    CASE WHEN MAX(n_reps) > 38 THEN
      |      MAX(CASE WHEN rk = 2 THEN mean END) END AS ci_lo,
      |    CASE WHEN MAX(n_reps) > 38 THEN
      |      MAX(CASE WHEN rk = 39 THEN mean END) END AS ci_hi
      |  FROM ranked GROUP BY source),
      |pt AS (
      |  SELECT source,
      |    CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE) /
      |      CAST(COUNT(*) AS DOUBLE) AS mean_est
      |  FROM documents GROUP BY source)
      |SELECT ci.source AS grp, n_reps, mean_est, ci_lo, ci_hi
      |FROM ci JOIN pt USING (source) ORDER BY grp""".stripMargin) {
    (s, dir) =>
      implicit val env: (SparkSession, String) = (s, dir)
      graft.core.Stats.bootstrapGroupCi(t("documents"), col("source"),
          col("doc_id"), col("n_chars"), reps = 40, salt = "bsrc")
        .orderBy(col("grp"))
  }

  /** Unicode-script composition per language label
    * ([[TextAnalysis.scriptMix]]): the router-audit signal — a `zh` slice
    * that is mostly Latin, or an `en` slice growing CJK, is mislabeled.
    * Char-class counts use `\x{…}` ranges that Java regex and RE2 parse
    * identically; fractions are exact counts with one division each. */
  val q154ScriptMix: (String, QueryDef) = q(
    "q154_script_mix",
    """WITH p AS (
      |  SELECT lang, length(text) AS n_chars,
      |    len(regexp_extract_all(text, '[A-Za-z]')) AS c_latin,
      |    len(regexp_extract_all(text, '[\x{00C0}-\x{024F}]')) AS c_acc,
      |    len(regexp_extract_all(text, '[\x{4E00}-\x{9FFF}]')) AS c_cjk,
      |    len(regexp_extract_all(text, '[\x{0400}-\x{04FF}]')) AS c_cyr,
      |    len(regexp_extract_all(text, '[0-9]')) AS c_dig,
      |    len(regexp_extract_all(text, '[ ]')) AS c_sp
      |  FROM documents),
      |g AS (
      |  SELECT lang, COUNT(*) AS n_docs,
      |    CAST(SUM(n_chars) AS BIGINT) AS n_chars,
      |    CAST(SUM(c_latin) AS BIGINT) AS s_latin,
      |    CAST(SUM(c_acc) AS BIGINT) AS s_acc,
      |    CAST(SUM(c_cjk) AS BIGINT) AS s_cjk,
      |    CAST(SUM(c_cyr) AS BIGINT) AS s_cyr,
      |    CAST(SUM(c_dig) AS BIGINT) AS s_dig,
      |    CAST(SUM(c_sp) AS BIGINT) AS s_sp,
      |    CAST(SUM(n_chars - c_latin - c_acc - c_cjk - c_cyr - c_dig - c_sp)
      |      AS BIGINT) AS s_other
      |  FROM p GROUP BY lang)
      |SELECT lang, n_docs, n_chars,
      |  CASE WHEN n_chars > 0 THEN
      |    CAST(s_latin AS DOUBLE) / CAST(n_chars AS DOUBLE) ELSE 0.0 END
      |    AS latin_frac,
      |  CASE WHEN n_chars > 0 THEN
      |    CAST(s_acc AS DOUBLE) / CAST(n_chars AS DOUBLE) ELSE 0.0 END
      |    AS accented_frac,
      |  CASE WHEN n_chars > 0 THEN
      |    CAST(s_cjk AS DOUBLE) / CAST(n_chars AS DOUBLE) ELSE 0.0 END
      |    AS cjk_frac,
      |  CASE WHEN n_chars > 0 THEN
      |    CAST(s_cyr AS DOUBLE) / CAST(n_chars AS DOUBLE) ELSE 0.0 END
      |    AS cyrillic_frac,
      |  CASE WHEN n_chars > 0 THEN
      |    CAST(s_dig AS DOUBLE) / CAST(n_chars AS DOUBLE) ELSE 0.0 END
      |    AS digit_frac,
      |  CASE WHEN n_chars > 0 THEN
      |    CAST(s_sp AS DOUBLE) / CAST(n_chars AS DOUBLE) ELSE 0.0 END
      |    AS space_frac,
      |  CASE WHEN n_chars > 0 THEN
      |    CAST(s_other AS DOUBLE) / CAST(n_chars AS DOUBLE) ELSE 0.0 END
      |    AS other_frac
      |FROM g ORDER BY lang""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    TextAnalysis.scriptMix(t("documents"), "lang", "text")
      .orderBy(col("lang"))
  }

  /** Corpus self-similarity probe ([[TextAnalysis.selfSimilarity]]):
    * deterministic 100-doc sample, all pairwise bigram Jaccards, exact
    * mean via decimal accumulation — the bounded-cost diversity gauge
    * (O(scan) + O(k²) at any corpus size). */
  val q155SelfSimilarity: (String, QueryDef) = q(
    "q155_self_similarity",
    """WITH s0 AS (
      |  SELECT doc_id AS id,
      |    md5('selfsim:' || CAST(doc_id AS VARCHAR)) AS key,
      |    string_split(text, ' ') AS tk
      |  FROM documents
      |  WHERE len(string_split(text, ' ')) >= 2),
      |s AS (SELECT id, tk FROM s0 ORDER BY key, id LIMIT 100),
      |g AS (
      |  SELECT id, list_distinct(list_transform(
      |    generate_series(1, greatest(len(tk) - 1, 0)),
      |    i -> array_to_string(tk[i:i+1], ' '))) AS gs
      |  FROM s),
      |p AS (
      |  SELECT len(list_filter(a.gs, x -> list_contains(b.gs, x))) AS i,
      |    len(a.gs) + len(b.gs) AS ab
      |  FROM g a JOIN g b ON a.id < b.id),
      |j AS (
      |  SELECT CASE WHEN ab - i > 0 THEN
      |    CAST(i AS DOUBLE) / CAST(ab - i AS DOUBLE) ELSE 0.0 END AS j
      |  FROM p)
      |SELECT COUNT(*) AS n_pairs,
      |  CAST(SUM(CAST(j AS DECIMAL(38, 9))) AS DOUBLE) /
      |    CAST(COUNT(*) AS DOUBLE) AS mean_jaccard,
      |  MIN(j) AS min_jaccard, MAX(j) AS max_jaccard
      |FROM j""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    TextAnalysis.selfSimilarity(t("documents"), "doc_id", "text",
      k = 100, n = 2, salt = "selfsim")
  }

  /** Epoch planner ([[Sampling.epochPlan]]): the repeat-data audit — a
    * 2M-token budget at temperature 3/4 against per-source token counts;
    * epochs implied, 4-epoch cap, forfeited token mass. Tight budget on
    * a small corpus makes several sources exceed the cap, so the flag
    * path is exercised. */
  val q156EpochPlan: (String, QueryDef) = q(
    "q156_epoch_plan",
    """WITH g AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT)
      |      AS tokens
      |  FROM documents GROUP BY source),
      |w AS (
      |  SELECT *, SQRT(SQRT(CAST(tokens AS DOUBLE))) *
      |    SQRT(CAST(tokens AS DOUBLE)) AS wr FROM g),
      |d AS (
      |  SELECT CAST(SUM(CAST(CAST(wr AS VARCHAR) AS DECIMAL(38,9))) AS DOUBLE) AS den
      |  FROM w),
      |t AS (
      |  SELECT source, n_docs, tokens, (wr / den) AS weight,
      |    CAST(FLOOR((wr / den) * 2000000.0) AS BIGINT) AS target_tokens
      |  FROM w CROSS JOIN d)
      |SELECT source, n_docs, tokens, weight, target_tokens,
      |  CASE WHEN tokens > 0 THEN
      |    CAST(target_tokens AS DOUBLE) / CAST(tokens AS DOUBLE) END
      |    AS epochs,
      |  COALESCE(CASE WHEN tokens > 0 THEN
      |    CAST(target_tokens AS DOUBLE) / CAST(tokens AS DOUBLE) END > 4.0,
      |    FALSE) AS over_cap,
      |  LEAST(target_tokens, tokens * 4) AS granted_tokens,
      |  target_tokens - LEAST(target_tokens, tokens * 4) AS deficit_tokens
      |FROM t ORDER BY source""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.operators.Sampling.epochPlan(t("documents"), "source",
        size(split(col("text"), " ")), budgetTokens = 2000000L,
        temperatureQuarters = 3, maxEpochs = 4)
      .orderBy(col("source"))
  }

  /** The BPE learner's oracle, generated per merge level: each level
    * recounts weighted adjacent symbol pairs, picks the argmax
    * deterministically, and applies it with the SAME `replace` call the
    * engine uses (identical left-to-right non-overlap semantics), so the
    * data-dependent iteration itself is hash-checked. */
  private def bpeOracleSql(merges: Int): String = {
    val base =
      """WITH wd AS (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY w),
        |w0 AS MATERIALIZED (
        |  SELECT freq, chr(1) || array_to_string(
        |    list_transform(generate_series(1, length(w)), i -> w[i])
        |      || ['</w>'], chr(1)) || chr(1) AS s
        |  FROM wd)""".stripMargin
    val levels = (1 to merges).map { i =>
      s"""p$i AS (
         |  SELECT arr[j] AS a, arr[j + 1] AS b,
         |    CAST(SUM(freq) AS BIGINT) AS cnt
         |  FROM (
         |    SELECT freq, string_split(s, chr(1)) AS arr,
         |      unnest(generate_series(2, len(string_split(s, chr(1))) - 2))
         |        AS j
         |    FROM w${i - 1})
         |  GROUP BY 1, 2),
         |t$i AS (SELECT a, b, cnt FROM p$i ORDER BY cnt DESC, a, b LIMIT 1),
         |w$i AS MATERIALIZED (
         |  SELECT freq, replace(s,
         |    chr(1) || (SELECT a FROM t$i) || chr(1) ||
         |      (SELECT b FROM t$i) || chr(1),
         |    chr(1) || (SELECT a || b FROM t$i) || chr(1)) AS s
         |  FROM w${i - 1})""".stripMargin
    }.mkString(",\n", ",\n", "")
    val union = (1 to merges).map(i =>
      s"SELECT $i AS rank, a AS lhs, b AS rhs, cnt AS pair_count FROM t$i")
      .mkString("\nUNION ALL ")
    s"$base$levels\n$union\nORDER BY rank"
  }

  /** BPE merge learning ([[graft.operators.Bpe.learnMerges]]): 8 merges
    * trained on the word-frequency dictionary. The oracle replays the
    * full iterative learner — pair counts, deterministic argmax, and the
    * engine's exact `replace` merge — level by level. */
  val q157BpeMerges: (String, QueryDef) = q(
    "q157_bpe_merges", bpeOracleSql(8)) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.operators.Bpe.learnMerges(t("documents"), "text", merges = 8)
  }

  /** Content-defined chunk dedup ([[Dedup.cdcChunkDedup]]): boundaries
    * from token hashes (`md5 quad % 8 == 0`), so chunk identity survives
    * insertions that shift positions — the CDC upgrade of q76's fixed
    * stride. Per-doc dup-chunk report, every count exact. */
  val q158CdcDedup: (String, QueryDef) = q(
    "q158_cdc_dedup",
    """WITH tk AS (
      |  SELECT doc_id, x.pos AS pos, x.t AS t FROM (
      |    SELECT doc_id, unnest(list_transform(
      |      generate_series(1, len(w)),
      |      i -> struct_pack(pos := i, t := w[i]))) AS x
      |    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))),
      |m AS (
      |  SELECT doc_id, pos, t,
      |    CASE WHEN CAST('0x' || substring(md5(t), 1, 4) AS BIGINT) % 8 = 0
      |      THEN 1 ELSE 0 END AS mk
      |  FROM tk),
      |c AS (
      |  SELECT doc_id, pos, t,
      |    COALESCE(SUM(mk) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk
      |  FROM m),
      |ch AS (
      |  SELECT doc_id, chunk,
      |    md5(string_agg(t, ' ' ORDER BY pos)) AS h
      |  FROM c GROUP BY doc_id, chunk),
      |f AS (SELECT h, COUNT(*) AS fr FROM ch GROUP BY h)
      |SELECT ch.doc_id, COUNT(*) AS n_chunks,
      |  CAST(SUM(CASE WHEN f.fr > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_dup_chunks,
      |  CAST(SUM(CASE WHEN f.fr > 1 THEN 1 ELSE 0 END) AS DOUBLE) /
      |    CAST(COUNT(*) AS DOUBLE) AS dup_frac
      |FROM ch JOIN f USING (h)
      |GROUP BY ch.doc_id ORDER BY ch.doc_id""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.operators.Dedup.cdcChunkDedup(t("documents"), "doc_id", "text",
        avgTokens = 8)
      .orderBy(col("doc_id"))
  }

  /** Label geometry ([[graft.operators.Similarity.labelCentroidCosines]]):
    * pairwise centroid-direction cosines — which embedding classes are
    * confusable. Exact-integer micro-unit sums (q136 float discipline),
    * dim-ordered folds, one sqrt/division finish. */
  val q159LabelGeometry: (String, QueryDef) = q(
    "q159_label_geometry",
    """WITH e AS (
      |  SELECT label, dim, CAST(embedding[dim] AS DOUBLE) AS x
      |  FROM (SELECT label, unnest(generate_series(1, len(embedding)))
      |          AS dim, embedding
      |        FROM embeddings)),
      |s AS (
      |  SELECT label, dim,
      |    CAST(SUM(CAST(FLOOR(x * 1000000.0) AS HUGEINT)) AS DOUBLE) AS sv
      |  FROM e GROUP BY label, dim),
      |n AS (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label),
      |v AS (
      |  SELECT label, list(sv ORDER BY dim) AS vec FROM s GROUP BY label),
      |p AS (
      |  SELECT a.label AS label_a, b.label AS label_b,
      |    na.n AS n_a, nb.n AS n_b,
      |    list_reduce(list_transform(generate_series(1, len(a.vec)),
      |      i -> a.vec[i] * b.vec[i]), (x, y) -> x + y) AS dot,
      |    list_reduce(list_transform(a.vec, x -> x * x),
      |      (x, y) -> x + y) AS na2,
      |    list_reduce(list_transform(b.vec, x -> x * x),
      |      (x, y) -> x + y) AS nb2
      |  FROM v a JOIN v b ON a.label < b.label
      |  JOIN n na ON na.label = a.label
      |  JOIN n nb ON nb.label = b.label)
      |SELECT label_a, label_b, n_a, n_b,
      |  CASE WHEN na2 > 0 AND nb2 > 0 THEN
      |    dot / (sqrt(na2) * sqrt(nb2)) END AS centroid_cos
      |FROM p ORDER BY label_a, label_b""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.operators.Similarity.labelCentroidCosines(
        t("embeddings"), "label", "embedding")
      .orderBy(col("label_a"), col("label_b"))
  }

  /** Normalized near-exact dedup ([[Dedup.normalizedDedup]]): duplicate
    * groups on the case/accent/punctuation/whitespace-insensitive key,
    * flagging the groups raw-byte dedup cannot see. This corpus has no
    * byte-identical docs, so the entry simulates the classic re-crawl
    * scenario in-plan (the q138 snapshot pattern): every 10th document
    * re-ingested UPPERCASED with extra spacing — invisible to exact
    * dedup, caught by the normalized key. */
  val q160NormalizedDedup: (String, QueryDef) = q(
    "q160_normalized_dedup",
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, upper(text) || '  '
      |  FROM documents WHERE doc_id % 10 = 0),
      |k AS (
      |  SELECT doc_id, md5(text) AS raw,
      |    md5(trim(regexp_replace(regexp_replace(
      |      translate(lower(text),
      |        'áàâäãåéèêëíìîïóòôöõúùûüñçý',
      |        'aaaaaaeeeeiiiiooooouuuuncy'),
      |      '[.,!?;:()\-]', '', 'g'), '[ \t\n\r]+', ' ', 'g'))) AS key_hash
      |  FROM corpus)
      |SELECT key_hash, MIN(doc_id) AS keep_id,
      |  COUNT(*) AS n_docs,
      |  COUNT(DISTINCT raw) AS n_raw_variants,
      |  COUNT(DISTINCT raw) > 1 AS near_exact_only
      |FROM k GROUP BY key_hash HAVING COUNT(*) > 1
      |ORDER BY key_hash""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val base = t("documents")
    val recrawl = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(upper(col("text")), lit("  ")).as("text"))
    graft.operators.Dedup.normalizedDedup(
        base.select(col("doc_id"), col("text")).unionAll(recrawl),
        "doc_id", "text")
      .orderBy(col("key_hash"))
  }

  /** Per-source data card ([[graft.operators.Curation.dataCard]]):
    * volume, shape, within-source duplication, and language mix
    * (majority share + Gini–Simpson diversity) in one row per source —
    * the report a corpus slice ships with. */
  val q161DataCard: (String, QueryDef) = q(
    "q161_data_card",
    """WITH base AS (
      |  SELECT source, lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS t,
      |    CAST(length(text) AS BIGINT) AS c,
      |    md5(text) AS h
      |  FROM documents),
      |vol AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(t) AS BIGINT) AS n_tokens,
      |    CAST(SUM(c) AS BIGINT) AS n_chars,
      |    CAST(SUM(CASE WHEN t < 50 THEN 1 ELSE 0 END) AS BIGINT) AS short
      |  FROM base GROUP BY source),
      |lc AS (
      |  SELECT source, lang, COUNT(*) AS lcnt
      |  FROM base GROUP BY source, lang),
      |lg AS (
      |  SELECT source, COUNT(*) AS n_langs,
      |    CAST(SUM(lcnt * lcnt) AS BIGINT) AS sumc2
      |  FROM lc GROUP BY source),
      |top AS (
      |  SELECT source, lang AS top_lang, lcnt AS topc FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY lcnt DESC, lang ASC) AS rn FROM lc)
      |  WHERE rn = 1),
      |dup AS (
      |  SELECT source,
      |    CAST(SUM(CASE WHEN dc > 1 THEN dc ELSE 0 END) AS BIGINT) AS dupd
      |  FROM (SELECT source, h, COUNT(*) AS dc FROM base GROUP BY source, h)
      |  GROUP BY source)
      |SELECT vol.source AS source, n_docs, n_tokens, n_chars,
      |  CAST(n_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE) AS tokens_per_doc,
      |  CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS chars_per_token,
      |  CAST(short AS DOUBLE) / CAST(n_docs AS DOUBLE) AS short_doc_frac,
      |  CAST(dupd AS DOUBLE) / CAST(n_docs AS DOUBLE) AS exact_dup_frac,
      |  n_langs, top_lang,
      |  CAST(topc AS DOUBLE) / CAST(n_docs AS DOUBLE) AS top_lang_frac,
      |  1.0 - CAST(sumc2 AS DOUBLE) /
      |    (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE)) AS lang_simpson
      |FROM vol
      |JOIN lg ON lg.source = vol.source
      |JOIN top ON top.source = vol.source
      |JOIN dup ON dup.source = vol.source
      |ORDER BY source""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.operators.Curation.dataCard(t("documents"), "source", "lang",
        "text", shortTokens = 50)
      .orderBy(col("source"))
  }

  /** CMS join-size estimation ([[graft.operators.Joins.cmsJoinSizeEstimate]]):
    * predict |first-half ⋈ second-half| of the event log on `user_id`
    * from two 4×512 Count-Min matrices (sketch inner product, one-sided
    * ≥), reported against the exact join size. The planner-probe shape:
    * matrices shuffle, keys don't. */
  val q162JoinEstimate: (String, QueryDef) = q(
    "q162_join_estimate",
    """WITH st AS (
      |  SELECT (MIN(event_id) + MAX(event_id)) // 2 AS mid FROM events),
      |e AS (
      |  SELECT CASE WHEN event_id < mid THEN 0 ELSE 1 END AS side,
      |    CAST(user_id AS VARCHAR) AS item
      |  FROM events CROSS JOIN st),
      |r AS (SELECT unnest(generate_series(0, 3)) AS r),
      |bu AS (
      |  SELECT side, r.r AS r,
      |    CAST('0x' || substring(md5(CAST(r.r AS VARCHAR) || ':' || item),
      |      1, 8) AS BIGINT) % 512 AS b
      |  FROM e CROSS JOIN r),
      |m AS (SELECT side, r, b, COUNT(*) AS c FROM bu GROUP BY 1, 2, 3),
      |ip AS (
      |  SELECT a.r AS r, CAST(SUM(a.c * b.c) AS BIGINT) AS p
      |  FROM m a JOIN m b ON a.r = b.r AND a.b = b.b
      |  WHERE a.side = 0 AND b.side = 1
      |  GROUP BY a.r),
      |est AS (SELECT MIN(p) AS cms_est FROM ip),
      |ex AS (
      |  SELECT CAST(COALESCE(SUM(ca * cb), 0) AS BIGINT) AS exact_pairs
      |  FROM (
      |    SELECT item,
      |      CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |      CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
      |    FROM e GROUP BY item)
      |  WHERE ca > 0 AND cb > 0)
      |SELECT exact_pairs, cms_est,
      |  CASE WHEN exact_pairs > 0 THEN
      |    CAST(cms_est AS DOUBLE) / CAST(exact_pairs AS DOUBLE) END
      |    AS overestimate
      |FROM ex CROSS JOIN est""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val ev = Tables.events(s, dir)
    val st = ev.agg(expr("(min(event_id) + max(event_id)) div 2").as("__mid"))
    val sided = ev.crossJoin(broadcast(st))
    graft.operators.Joins.cmsJoinSizeEstimate(
      sided.filter(col("event_id") < col("__mid")), col("user_id"),
      sided.filter(col("event_id") >= col("__mid")), col("user_id"),
      depth = 4, width = 512)
  }

  /** Span-excision decontamination
    * ([[graft.operators.Decontam.exciseBenchmarkSpans]]): tokens covered
    * by a benchmark 3-gram are removed, the rest of the document
    * survives — the surgical alternative to q57's doc-level verdict.
    * Benchmark = every 50th doc (the q57 convention); train side
    * excludes it. */
  val q163DecontamExcise: (String, QueryDef) = q(
    "q163_decontam_excise",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS tk
      |           FROM documents),
      |bg AS (
      |  SELECT DISTINCT array_to_string(tk[i:i+2], ' ') AS g FROM (
      |    SELECT tk, unnest(generate_series(1, len(tk) - 2)) AS i
      |    FROM w WHERE doc_id % 50 = 0)),
      |cg AS (
      |  SELECT doc_id, i, array_to_string(tk[i:i+2], ' ') AS g FROM (
      |    SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) AS i
      |    FROM w WHERE doc_id % 50 <> 0)),
      |st AS (
      |  SELECT doc_id, list(i ORDER BY i) AS ss
      |  FROM cg JOIN bg USING (g) GROUP BY doc_id),
      |x AS (
      |  SELECT w.doc_id, tk, COALESCE(ss, []) AS ss
      |  FROM w LEFT JOIN st USING (doc_id)
      |  WHERE doc_id % 50 <> 0)
      |SELECT doc_id,
      |  -- COALESCE: DuckDB's array_to_string([]) is NULL, but a fully
      |  -- excised doc must come back as '' (the engine's concat_ws
      |  -- convention) — first triggered at sf0.1, where 8 docs lose
      |  -- every token
      |  COALESCE(array_to_string(list_filter(tk, (x, j) ->
      |    len(list_filter(ss, s -> s <= j AND j <= s + 2)) = 0), ' '), '')
      |    AS cleaned,
      |  CAST(len(tk) AS BIGINT) AS n_tokens,
      |  CAST(len(list_filter(tk, (x, j) ->
      |    len(list_filter(ss, s -> s <= j AND j <= s + 2)) > 0))
      |    AS BIGINT) AS n_removed,
      |  CAST(len(ss) AS BIGINT) AS n_matches
      |FROM x ORDER BY doc_id""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val docs = t("documents")
    graft.operators.Decontam.exciseBenchmarkSpans(
        docs.filter(pmod(col("doc_id"), lit(50)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(50)) === 0),
        "doc_id", "text", n = 3)
      .orderBy(col("doc_id"))
  }

  /** Per-doc TF-IDF keywords ([[TextAnalysis.tfidfKeywords]]): top-3
    * terms per document by smoothed tf-idf, 6-decimal-rounded scores,
    * term-tie-broken ranks — the per-document tagging complement of
    * q53's group-level distinctive terms. */
  val q164TfidfKeywords: (String, QueryDef) = q(
    "q164_tfidf_keywords",
    """WITH tf AS (
      |  SELECT doc_id, t AS term, COUNT(*) AS tf FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS t
      |    FROM documents)
      |  GROUP BY 1, 2),
      |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
      |n AS (SELECT COUNT(*) AS nd FROM documents),
      |sc AS (
      |  SELECT doc_id, term, tf,
      |    ROUND(tf * ln(CAST(nd + 1 AS DOUBLE) / (df + 1)), 6) AS score
      |  FROM tf JOIN df USING (term) CROSS JOIN n),
      |r AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
      |    ORDER BY score DESC, term ASC) AS rank FROM sc)
      |SELECT doc_id, term, tf, score, rank
      |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin) {
    (s, dir) =>
      implicit val env: (SparkSession, String) = (s, dir)
      TextAnalysis.tfidfKeywords(t("documents"), "doc_id", "text", topK = 3)
        .orderBy(col("doc_id"), col("rank"))
  }

  /** Quantile normalization ([[graft.core.Stats.quantileNormalize]]):
    * the exact per-source ECDF table for doc length — the map that puts
    * incomparable per-source score scales on one uniform [0,1] axis
    * before mixing. Distinct-value rollup + one cum window, auto
    * serial/distributed. */
  val q165QuantileNormalize: (String, QueryDef) = q(
    "q165_quantile_normalize",
    """WITH r AS (
      |  SELECT source, n_chars AS v, COUNT(*) AS c
      |  FROM documents GROUP BY 1, 2),
      |c AS (
      |  SELECT source, v,
      |    CAST(SUM(c) OVER (PARTITION BY source ORDER BY v) AS BIGINT)
      |      AS n_le,
      |    CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS n
      |  FROM r)
      |SELECT source, v, n_le, n,
      |  CAST(n_le AS DOUBLE) / CAST(n AS DOUBLE) AS ecdf
      |FROM c ORDER BY source, v""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.core.Stats.quantileNormalize(
        t("documents").select(col("source"), col("n_chars").as("v")),
        "source", "v")
      .orderBy(col("source"), col("v"))
  }

  /** Multi-probe LSH ANN ([[graft.operators.Similarity.annMultiProbe]]):
    * one signature per indexed vector, each query probes its own bucket
    * plus the 3 smallest-margin bit flips — multi-table recall at 1×
    * index cost. The oracle replays the hyperplane literals, the probe
    * ranking, and the candidate join. */
  val q166AnnMultiProbe: (String, QueryDef) = q(
    "q166_ann_multiprobe", {
      import graft.operators.Similarity.planeWeight
      def dotSql(a: String, b: String): String =
        s"list_reduce(list_transform(generate_series(1, 64), " +
          s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), " +
          "(x, y) -> x + y)"
      def projSql(p: Int): String = {
        val w = (0 until 64).map(d =>
          java.lang.Double.toString(planeWeight(42, p, d)))
          .mkString("[", ",", "]")
        s"list_reduce(list_transform(generate_series(1, 64), " +
          s"i -> CAST(embedding[i] AS DOUBLE) * ($w)[i]), (a, b) -> a + b)"
      }
      val bucketSql = (0 until 8).map(p =>
        s"(CASE WHEN ${projSql(p)} > 0 THEN ${1L << p} ELSE 0 END)")
        .mkString(" + ")
      val qprojSelects = (0 until 8).map(p =>
        s"SELECT vec_id AS qid, $p AS p, ${projSql(p)} AS prj " +
          "FROM embeddings WHERE vec_id IN (0,1,2,3,4,5,6,7)")
        .mkString("\nUNION ALL\n")
      s"""WITH sigs AS (
         |  SELECT vec_id, CAST($bucketSql AS BIGINT) AS bucket
         |  FROM embeddings),
         |qb AS (SELECT vec_id AS qid, bucket AS b0 FROM sigs
         |       WHERE vec_id IN (0,1,2,3,4,5,6,7)),
         |qp AS (
         |$qprojSelects
         |),
         |rankp AS (
         |  SELECT qid, p,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY abs(prj), p) AS rk
         |  FROM qp),
         |probes AS (
         |  SELECT qid, b0 AS bucket FROM qb
         |  UNION ALL
         |  SELECT r.qid, xor(b.b0, CAST(1 AS BIGINT) << r.p) AS bucket
         |  FROM rankp r JOIN qb b ON b.qid = r.qid WHERE r.rk <= 3),
         |cand AS (
         |  SELECT DISTINCT pr.qid, s.vec_id
         |  FROM sigs s JOIN probes pr
         |    ON s.bucket = pr.bucket AND s.vec_id <> pr.qid),
         |scored AS (
         |  SELECT c.qid, c.vec_id,
         |    ${dotSql("e.embedding", "qe.embedding")} /
         |    (SQRT(${dotSql("e.embedding", "e.embedding")}) *
         |     SQRT(${dotSql("qe.embedding", "qe.embedding")})) AS sim
         |  FROM cand c
         |  JOIN embeddings e ON e.vec_id = c.vec_id
         |  JOIN embeddings qe ON qe.vec_id = c.qid),
         |ranked AS (
         |  SELECT qid, vec_id, sim,
         |    ROW_NUMBER() OVER (PARTITION BY qid
         |      ORDER BY sim DESC, vec_id) AS rk
         |  FROM scored)
         |SELECT qid, vec_id, sim FROM ranked WHERE rk <= 10
         |ORDER BY qid, sim DESC, vec_id""".stripMargin
    }) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.operators.Similarity.annMultiProbe(
        t("embeddings"), "vec_id", "embedding",
        queryIds = Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L), k = 10,
        planes = 8, seed = 42, dims = 64, probes = 3)
      .orderBy(col("qid"), col("sim").desc, col("vec_id"))
  }

  /** Recency-weighted engagement
    * ([[graft.operators.Events.decayedScore]]): per-user value decayed by
    * exact power-of-two half-life factors (no `exp`, hash-exact), decimal
    * accumulation, top 100 — the churned-heavy-user detector. */
  val q167DecayedScore: (String, QueryDef) = q(
    "q167_decayed_score",
    """WITH e AS (
      |  SELECT user_id, value, epoch_ns(ts) // 1000000000 AS s
      |  FROM events),
      |mx AS (SELECT MAX(s) AS tmax FROM e),
      |w AS (
      |  SELECT user_id, value,
      |    value / CAST(1 << CAST(LEAST((tmax - s) // 604800, 62) AS INTEGER)
      |      AS DOUBLE) AS wv
      |  FROM e CROSS JOIN mx)
      |SELECT user_id,
      |  CAST(SUM(CAST(wv AS DECIMAL(38, 9))) AS DOUBLE) AS decayed_score,
      |  CAST(SUM(CAST(value AS DECIMAL(38, 4))) AS DOUBLE) AS raw_sum,
      |  COUNT(*) AS n_events
      |FROM w GROUP BY user_id
      |ORDER BY decayed_score DESC, user_id LIMIT 100""".stripMargin) {
    (s, dir) =>
      implicit val env: (SparkSession, String) = (s, dir)
      graft.operators.Events.decayedScore(
        Tables.events(s, dir), "user_id", "ts_sec", "value",
        halfLifeSec = 604800L, topK = 100)
  }

  /** Rank-biased overlap ([[graft.core.Stats.rankBiasedOverlap]]):
    * top-weighted agreement between the char-length and token-count
    * rankings at depth 50, p = 1/2 — power-of-two weights embedded as
    * build-time literals so both engines read identical doubles. */
  val q168Rbo: (String, QueryDef) = q(
    "q168_rank_overlap", {
      val k = 50
      val c = new Array[Double](k + 1)
      for (m <- k to 1 by -1)
        c(m) = (if (m + 1 <= k) c(m + 1) else 0.0) +
          math.pow(2.0, -(m - 1)) / m
      val cLits = (1 to k).map(m => java.lang.Double.toString(c(m)))
        .mkString("[", ",", "]")
      s"""WITH ta AS (
         |  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS ra
         |  FROM (SELECT doc_id, n_chars AS s FROM documents
         |        ORDER BY s DESC, doc_id LIMIT $k)),
         |tb AS (
         |  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS rb
         |  FROM (SELECT doc_id,
         |          CAST(len(string_split(text, ' ')) AS BIGINT) AS s
         |        FROM documents ORDER BY s DESC, doc_id LIMIT $k)),
         |j AS (
         |  SELECT GREATEST(ra, rb) AS m FROM ta JOIN tb USING (doc_id))
         |SELECT
         |  ROUND(0.5 * COALESCE(CAST(SUM(CAST(($cLits)[m]
         |    AS DECIMAL(38, 12))) AS DOUBLE), 0.0), 9) AS rbo,
         |  COUNT(*) AS overlap_at_k, CAST($k AS BIGINT) AS k
         |FROM j""".stripMargin
    }) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.core.Stats.rankBiasedOverlap(t("documents"), "doc_id",
      col("n_chars"), size(split(col("text"), " ")).cast("long"), k = 50)
  }

  val catalog: Seq[(String, QueryDef)] =
    Seq(q149PmiCollocations, q150NbClassifier, q151LengthBatches,
      q152WinnowPairs, q153BootstrapCi, q154ScriptMix, q155SelfSimilarity,
      q156EpochPlan, q157BpeMerges, q158CdcDedup, q159LabelGeometry,
      q160NormalizedDedup, q161DataCard, q162JoinEstimate,
      q163DecontamExcise, q164TfidfKeywords, q165QuantileNormalize,
      q166AnnMultiProbe, q167DecayedScore, q168Rbo, q169Burstiness,
      q170Survival, q171TokenBudget, q172Kwic)

  /** KWIC audit surface ([[TextAnalysis.keywordInContext]]): every
    * occurrence of 'table' with ±3 tokens of edge-clamped context,
    * first 200 by (doc, position). */
  lazy val q172Kwic: (String, QueryDef) = q(
    "q172_kwic",
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |o AS (
      |  SELECT doc_id, tk, i - 1 AS pos FROM (
      |    SELECT doc_id, tk, unnest(generate_series(1, len(tk))) AS i
      |    FROM t)
      |  WHERE tk[i] = 'table')
      |SELECT doc_id, CAST(pos AS INT) AS pos,
      |  array_to_string(tk[greatest(pos + 1 - 3, 1):
      |    least(pos + 1 + 3, len(tk))], ' ') AS context
      |FROM o ORDER BY doc_id, pos LIMIT 200""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    TextAnalysis.keywordInContext(t("documents"), "doc_id", "text",
      term = "table", window = 3, topK = 200)
  }

  /** Token-budget threshold
    * ([[graft.operators.Curation.tokenBudgetThreshold]]): the exact
    * score cut a 300k-token budget implies on the length-scored corpus —
    * distinct-score rollup + one cum window, whole groups admitted. */
  lazy val q171TokenBudget: (String, QueryDef) = q(
    "q171_token_budget",
    """WITH r AS (
      |  SELECT n_chars AS s,
      |    CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT)
      |      AS gt,
      |    COUNT(*) AS gn
      |  FROM documents GROUP BY n_chars),
      |c AS (
      |  SELECT s, gn,
      |    CAST(SUM(gt) OVER (ORDER BY s DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum
      |  FROM r)
      |SELECT MIN(s) AS threshold,
      |  CAST(COALESCE(SUM(gn), 0) AS BIGINT) AS n_docs_kept,
      |  COALESCE(MAX(cum), 0) AS tokens_kept,
      |  CAST(300000 AS BIGINT) AS budget
      |FROM c WHERE cum <= 300000""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    // bounded integer score: pin serial, skip the resolveCum probe
    graft.operators.Curation.tokenBudgetThreshold(t("documents"),
      col("n_chars"), size(split(col("text"), " ")),
      budgetTokens = 300000L, distributedCum = Some(false))
  }

  /** Kaplan–Meier time-to-conversion
    * ([[graft.operators.Events.survivalCurve]]): signup → first purchase,
    * hour buckets, censoring at the corpus horizon; the running product
    * folds the assembled curve in time order — hash-exact. */
  lazy val q170Survival: (String, QueryDef) = q(
    "q170_survival",
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_ns(ts) // 1000000000 AS s
      |  FROM events),
      |fs AS (
      |  SELECT user_id, MIN(s) AS fs FROM e
      |  WHERE event_type = 'signup' GROUP BY 1),
      |cv AS (
      |  SELECT e.user_id, MIN(CASE WHEN s >= fs THEN s END) AS fp
      |  FROM e JOIN fs USING (user_id)
      |  WHERE event_type = 'purchase' GROUP BY e.user_id),
      |hz AS (SELECT MAX(s) AS tmax FROM e),
      |co AS (
      |  SELECT fs.user_id,
      |    CASE WHEN fp IS NOT NULL THEN (fp - fs) // 3600 END AS t,
      |    (tmax - fs) // 3600 AS c
      |  FROM fs LEFT JOIN cv USING (user_id) CROSS JOIN hz),
      |n AS (SELECT COUNT(*) AS nn FROM co),
      |ev AS (SELECT t, COUNT(*) AS d FROM co WHERE t IS NOT NULL
      |       GROUP BY t),
      |ce AS (SELECT c AS t, COUNT(*) AS cens FROM co WHERE t IS NULL
      |       GROUP BY c),
      |tl AS (
      |  SELECT COALESCE(ev.t, ce.t) AS t, COALESCE(d, 0) AS d,
      |    COALESCE(cens, 0) AS cens
      |  FROM ev FULL OUTER JOIN ce ON ev.t = ce.t),
      |cu AS (
      |  SELECT t, d,
      |    COALESCE(SUM(d + cens) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS dep
      |  FROM tl),
      |cf AS (
      |  SELECT t, CAST(nn - dep AS BIGINT) AS n_risk,
      |    CAST(d AS BIGINT) AS n_events,
      |    1.0 - CAST(d AS DOUBLE) / CAST(nn - dep AS DOUBLE) AS f
      |  FROM cu CROSS JOIN n WHERE d > 0),
      |lst AS (
      |  SELECT list(struct_pack(t := t, n_risk := n_risk,
      |    n_events := n_events, f := f) ORDER BY t) AS cvl FROM cf)
      |SELECT x.t AS t, x.n_risk AS n_risk, x.n_events AS n_events,
      |  x.survival AS survival
      |FROM (
      |  SELECT unnest(list_transform(generate_series(1, len(cvl)),
      |    i -> struct_pack(t := cvl[i].t, n_risk := cvl[i].n_risk,
      |      n_events := cvl[i].n_events,
      |      survival := list_reduce(list_transform(cvl[1:i], x -> x.f),
      |        (a, b) -> a * b)))) AS x
      |  FROM lst WHERE len(cvl) > 0)
      |ORDER BY t""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.operators.Events.survivalCurve(
        Tables.events(s, dir), "user_id", "ts_sec", "event_type",
        startType = "signup", eventType = "purchase", bucketSec = 3600L)
      .orderBy(col("t"))
  }

  /** Per-user burstiness ([[graft.operators.Events.burstiness]]):
    * `(σ−μ)/(σ+μ)` over inter-event gaps — scripted-client vs organic
    * cadence. Exact integer gap sums; the float finish mirrors the
    * oracle op-for-op. */
  lazy val q169Burstiness: (String, QueryDef) = q(
    "q169_burstiness",
    """WITH t AS (
      |  SELECT user_id, epoch_ns(ts) // 1000000000 AS s FROM events),
      |g AS (
      |  SELECT user_id,
      |    s - LAG(s) OVER (PARTITION BY user_id ORDER BY s) AS gp
      |  FROM t),
      |a AS (
      |  SELECT user_id, COUNT(*) AS n_gaps,
      |    CAST(SUM(gp) AS BIGINT) AS sg,
      |    CAST(SUM(gp * gp) AS BIGINT) AS s2
      |  FROM g WHERE gp IS NOT NULL
      |  GROUP BY user_id HAVING COUNT(*) >= 5),
      |b AS (
      |  SELECT user_id, n_gaps,
      |    CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean_gap,
      |    SQRT(GREATEST(CAST(s2 AS DOUBLE) / CAST(n_gaps AS DOUBLE) -
      |      (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)) *
      |      (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)), 0.0)) AS sd_gap
      |  FROM a)
      |SELECT user_id, n_gaps, mean_gap, sd_gap,
      |  CASE WHEN sd_gap + mean_gap > 0 THEN
      |    (sd_gap - mean_gap) / (sd_gap + mean_gap) ELSE 0.0 END
      |    AS burstiness
      |FROM b ORDER BY burstiness DESC, user_id LIMIT 100""".stripMargin) {
    (s, dir) =>
      implicit val env: (SparkSession, String) = (s, dir)
      graft.operators.Events.burstiness(
        Tables.events(s, dir), "user_id", "ts_sec", minGaps = 5L,
        topK = 100)
  }
}

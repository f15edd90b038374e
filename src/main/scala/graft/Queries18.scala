package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Dedup, Similarity}

/** Catalog entries: round-13 additions — exact duplicated-span reporting,
  * clustering quality, asymmetric containment, and margin-based bitext
  * mining.
  */
object Queries18 {

  private def t(name: String)(implicit env: (SparkSession, String)): DataFrame =
    Tables.load(env._1, env._2, name)

  private def q(name: String, sql: String = null)(
      body: (SparkSession, String) => DataFrame): (String, QueryDef) =
    name -> QueryDef(body, Option(sql))

  /** Exact duplicated-span report ([[Dedup.dupSpans]]): positions whose
    * 5-gram repeats anywhere in the corpus, merged into maximal spans per
    * document — the k-gram-resolution form of suffix-array substring
    * dedup (Lee et al.). Integer-only span algebra; the lag-window merge
    * is exact because fixed-k interval ends are monotone in their
    * starts. */
  val q178DupSpans: (String, QueryDef) = q(
    "q178_dup_spans",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS tk
      |           FROM documents),
      |g AS (
      |  SELECT doc_id, len(tk) AS n_tokens, i - 1 AS pos,
      |    md5(array_to_string(tk[i:i+4], ' ')) AS h
      |  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 4))
      |          AS i
      |        FROM w WHERE len(tk) >= 5)),
      |df AS (SELECT h, COUNT(*) AS df FROM g GROUP BY h),
      |ds AS (SELECT doc_id, n_tokens, pos FROM g JOIN df USING (h)
      |       WHERE df >= 2),
      |sp AS (
      |  SELECT doc_id, n_tokens, pos,
      |    CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
      |      <= 4 THEN 0 ELSE 1 END AS nw
      |  FROM ds),
      |sp2 AS (
      |  SELECT doc_id, n_tokens, pos,
      |    SUM(nw) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span
      |  FROM sp),
      |spans AS (
      |  SELECT doc_id, MIN(n_tokens) AS n_tokens, span,
      |    MAX(pos) - MIN(pos) + 5 AS len
      |  FROM sp2 GROUP BY doc_id, span)
      |SELECT doc_id, CAST(MIN(n_tokens) AS BIGINT) AS n_tokens,
      |  COUNT(*) AS n_spans,
      |  CAST(SUM(len) AS BIGINT) AS dup_tokens,
      |  CAST(MAX(len) AS BIGINT) AS longest_span,
      |  CAST(SUM(len) AS DOUBLE) / CAST(MIN(n_tokens) AS DOUBLE) AS dup_frac
      |FROM spans GROUP BY doc_id ORDER BY doc_id""".stripMargin) {
    (s, dir) =>
      implicit val env: (SparkSession, String) = (s, dir)
      Dedup.dupSpans(t("documents"), "doc_id", "text", k = 5, minDf = 2L)
        .orderBy(col("doc_id"))
  }

  /** Centroid silhouette ([[Similarity.centroidSilhouette]]): per-cluster
    * separation quality against the 8 seed centroids — `(b − a) /
    * max(a, b)` from the nearest and second-nearest centroid distances,
    * exact-decimal distance folds (the q175 discipline). */
  val q179Silhouette: (String, QueryDef) = q(
    "q179_silhouette", {
      val d2 =
        "CAST(list_reduce(list_transform(generate_series(1, 64), " +
          "i -> CAST(CAST((CAST(a.embedding[i] AS DOUBLE) - " +
          "CAST(c.embedding[i] AS DOUBLE)) * " +
          "(CAST(a.embedding[i] AS DOUBLE) - " +
          "CAST(c.embedding[i] AS DOUBLE)) AS VARCHAR) " +
          "AS DECIMAL(38,12))), (x, y) -> x + y) AS DOUBLE)"
      s"""WITH pc AS (
         |  SELECT a.vec_id AS id, c.vec_id AS cid, $d2 AS d2
         |  FROM embeddings a JOIN embeddings c ON c.vec_id < 8),
         |r AS (
         |  SELECT id, cid, d2,
         |    ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2, cid) AS rk
         |  FROM pc),
         |ab AS (
         |  SELECT a.id, a.cid AS cluster, sqrt(a.d2) AS da, sqrt(b.d2) AS db
         |  FROM r a JOIN r b ON a.id = b.id AND a.rk = 1 AND b.rk = 2),
         |sil AS (
         |  SELECT cluster,
         |    CASE WHEN greatest(da, db) > 0 THEN
         |      (db - da) / greatest(da, db) ELSE 0.0 END AS s
         |  FROM ab)
         |SELECT cluster, COUNT(*) AS n,
         |  CAST(SUM(CAST(CAST(s AS VARCHAR) AS DECIMAL(38,12))) AS DOUBLE) /
         |    CAST(COUNT(*) AS DOUBLE) AS mean_silhouette,
         |  MIN(s) AS min_silhouette, MAX(s) AS max_silhouette
         |FROM sil GROUP BY cluster ORDER BY cluster""".stripMargin
    }) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    Similarity.centroidSilhouette(t("embeddings"), "vec_id", "embedding",
        nClusters = 8)
      .orderBy(col("cluster"))
  }

  /** Directional containment ([[Dedup.containmentPairs]]): 3-gram
    * containment `|A∩B|/|A|` over df-capped hashed grams — the
    * quote-inside-article relation Jaccard misses. */
  val q180Containment: (String, QueryDef) = q(
    "q180_containment",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS tk
      |           FROM documents),
      |g AS (
      |  SELECT DISTINCT doc_id, md5(array_to_string(tk[i:i+2], ' ')) AS h
      |  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2))
      |          AS i
      |        FROM w WHERE len(tk) >= 3)),
      |df AS (SELECT h, COUNT(*) AS df FROM g GROUP BY h),
      |k AS (SELECT doc_id, h FROM g JOIN df USING (h) WHERE df <= 50),
      |sz AS (SELECT doc_id, COUNT(*) AS n FROM k GROUP BY doc_id),
      |it AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      |  FROM k a JOIN k b ON a.h = b.h AND a.doc_id <> b.doc_id
      |  GROUP BY 1, 2)
      |SELECT id_a, id_b, n_common, sa.n AS n_a, sb.n AS n_b,
      |  CAST(n_common AS DOUBLE) / CAST(sa.n AS DOUBLE) AS containment
      |FROM it
      |JOIN sz sa ON sa.doc_id = id_a
      |JOIN sz sb ON sb.doc_id = id_b
      |WHERE CAST(n_common AS DOUBLE) / CAST(sa.n AS DOUBLE) >= 0.2
      |ORDER BY containment DESC, id_a, id_b LIMIT 100""".stripMargin) {
    (s, dir) =>
      implicit val env: (SparkSession, String) = (s, dir)
      Dedup.containmentPairs(t("documents"), "doc_id", "text",
        n = 3, maxDf = 50L, minContainment = 0.2, topK = 100)
  }

  /** Margin-based bitext mining ([[Similarity.marginMining]]): label-0 ×
    * label-1 pairs ranked by the Artetxe ratio margin (cosine discounted
    * by each side's top-4 neighborhood mean) — hub vectors demoted,
    * genuine cross-shard matches promoted. All folds exact-decimal. */
  val q181MarginMining: (String, QueryDef) = q(
    "q181_margin_mining", {
      def fold(term: String): String =
        "CAST(list_reduce(list_transform(generate_series(1, 64), " +
          s"i -> CAST(CAST($term AS VARCHAR) AS DECIMAL(38,12))), " +
          "(x, y) -> x + y) AS DOUBLE)"
      val dot = fold("CAST(s.embedding[i] AS DOUBLE) * " +
        "CAST(t.embedding[i] AS DOUBLE)")
      val sq = fold("CAST(embedding[i] AS DOUBLE) * " +
        "CAST(embedding[i] AS DOUBLE)")
      s"""WITH s AS (SELECT vec_id, embedding FROM embeddings
         |           WHERE label = 0),
         |t AS (SELECT vec_id, embedding FROM embeddings WHERE label = 1),
         |nm AS (
         |  SELECT vec_id, sqrt($sq) AS nrm
         |  FROM embeddings WHERE label IN (0, 1)),
         |cs AS (
         |  SELECT s.vec_id AS s_id, t.vec_id AS t_id,
         |    $dot / (ns.nrm * nt.nrm) AS cos
         |  FROM s JOIN t ON TRUE
         |  JOIN nm ns ON ns.vec_id = s.vec_id
         |  JOIN nm nt ON nt.vec_id = t.vec_id),
         |f AS (
         |  SELECT *,
         |    ROW_NUMBER() OVER (PARTITION BY s_id ORDER BY cos DESC, t_id)
         |      AS rs,
         |    ROW_NUMBER() OVER (PARTITION BY t_id ORDER BY cos DESC, s_id)
         |      AS rt
         |  FROM cs),
         |rx AS (
         |  SELECT s_id,
         |    CAST(SUM(CAST(CAST(cos AS VARCHAR) AS DECIMAL(38,12)))
         |      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS rx
         |  FROM f WHERE rs <= 4 GROUP BY s_id),
         |ry AS (
         |  SELECT t_id,
         |    CAST(SUM(CAST(CAST(cos AS VARCHAR) AS DECIMAL(38,12)))
         |      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS ry
         |  FROM f WHERE rt <= 4 GROUP BY t_id)
         |SELECT c.s_id AS s_id, c.t_id AS t_id, c.cos AS cos,
         |  c.cos / ((rx + ry) * 0.5) AS margin
         |FROM cs c
         |JOIN rx ON rx.s_id = c.s_id
         |JOIN ry ON ry.t_id = c.t_id
         |ORDER BY margin DESC, s_id, t_id LIMIT 50""".stripMargin
    }) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    Similarity.marginMining(t("embeddings"), "vec_id", "embedding",
      "label", srcLabel = 0, tgtLabel = 1, kNeigh = 4, topK = 50)
  }

  val catalog: Seq[(String, QueryDef)] =
    Seq(q178DupSpans, q179Silhouette, q180Containment, q181MarginMining)
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Dedup, Events, Similarity}

/** Catalog entries: round-13 additions (continued) — exponential
  * smoothing and label-noise auditing.
  */
object Queries22 {

  private def t(name: String)(implicit env: (SparkSession, String)): DataFrame =
    Tables.load(env._1, env._2, name)

  private def q(name: String, sql: String = null)(
      body: (SparkSession, String) => DataFrame): (String, QueryDef) =
    name -> QueryDef(body, Option(sql))

  /** Halving EWMA ([[Events.ewmaLevel]]): α = ½ exponential smoothing of
    * daily counts per event type — every step one IEEE add plus an exact
    * halving, hash-deterministic end to end. Non-associative recurrence
    * ⇒ recursive-CTE oracle (the q187 rule). */
  val q192Ewma: (String, QueryDef) = q(
    "q192_ewma_level",
    """WITH RECURSIVE e AS (
      |  SELECT event_type,
      |    (epoch_ns(ts) // 1000000000) // 86400 AS b
      |  FROM events),
      |bc0 AS (SELECT event_type, b, COUNT(*) AS c FROM e GROUP BY 1, 2),
      |bc AS (
      |  SELECT event_type, b, CAST(c AS BIGINT) AS c,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY b) AS rn
      |  FROM bc0),
      |g AS (
      |  SELECT event_type, COUNT(*) AS n_buckets,
      |    CAST(SUM(c) AS BIGINT) AS total
      |  FROM bc0 GROUP BY event_type),
      |walk AS (
      |  SELECT event_type, CAST(0 AS BIGINT) AS rn,
      |    CAST(0.0 AS DOUBLE) AS s, FALSE AS init,
      |    CAST(0 AS BIGINT) AS last
      |  FROM g
      |  UNION ALL
      |  SELECT w.event_type, w.rn + 1,
      |    CASE WHEN w.init THEN (w.s + CAST(bc.c AS DOUBLE)) / 2.0
      |         ELSE CAST(bc.c AS DOUBLE) END,
      |    TRUE, bc.c
      |  FROM walk w
      |  JOIN bc ON bc.event_type = w.event_type AND bc.rn = w.rn + 1)
      |SELECT g.event_type AS event_type, g.n_buckets, g.total,
      |  w.s AS ewma_level, w.last AS last_count,
      |  CASE WHEN w.s > 0 THEN CAST(w.last AS DOUBLE) / w.s END
      |    AS last_over_level
      |FROM g JOIN walk w
      |  ON w.event_type = g.event_type AND w.rn = g.n_buckets
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    Events.ewmaLevel(Tables.events(s, dir), "event_type", col("ts_sec"),
        bucketSec = 86400L)
      .orderBy(col("event_type"))
  }

  /** kNN label consistency ([[Similarity.labelConsistency]]): for 24
    * probe vectors, the share of their 8 exact nearest neighbors with
    * the same label — the label-noise review queue. Exact-decimal
    * cosine folds (a raw double fold could flip a near-tie neighbor
    * cross-engine). */
  val q193LabelConsistency: (String, QueryDef) = q(
    "q193_label_consistency", {
      def fold(term: String): String =
        "CAST(list_reduce(list_transform(generate_series(1, 64), " +
          s"i -> CAST(CAST($term AS VARCHAR) AS DECIMAL(38,12))), " +
          "(x, y) -> x + y) AS DOUBLE)"
      val sq = fold("CAST(embedding[i] AS DOUBLE) * " +
        "CAST(embedding[i] AS DOUBLE)")
      val dot = fold("CAST(e.embedding[i] AS DOUBLE) * " +
        "CAST(p.pe[i] AS DOUBLE)")
      val ids = (0 until 24).mkString(",")
      s"""WITH nm AS (
         |  SELECT vec_id, sqrt($sq) AS nrm FROM embeddings),
         |p AS (SELECT vec_id AS pid, label AS plbl, embedding AS pe
         |      FROM embeddings WHERE vec_id IN ($ids)),
         |cs AS (
         |  SELECT p.pid, p.plbl, e.vec_id AS nid, e.label AS nlbl,
         |    $dot / (np.nrm * ne.nrm) AS c
         |  FROM embeddings e CROSS JOIN p
         |  JOIN nm np ON np.vec_id = p.pid
         |  JOIN nm ne ON ne.vec_id = e.vec_id
         |  WHERE e.vec_id <> p.pid),
         |r AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY pid
         |    ORDER BY c DESC, nid) AS rk
         |  FROM cs)
         |SELECT pid AS probe_id, plbl AS probe_label,
         |  COUNT(*) AS k_found,
         |  CAST(SUM(CASE WHEN nlbl = plbl THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_same_label,
         |  CAST(SUM(CASE WHEN nlbl = plbl THEN 1 ELSE 0 END) AS DOUBLE) /
         |    CAST(COUNT(*) AS DOUBLE) AS consistency
         |FROM r WHERE rk <= 8 GROUP BY 1, 2
         |ORDER BY probe_id""".stripMargin
    }) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    Similarity.labelConsistency(t("embeddings"), "vec_id", "embedding",
        "label", probeIds = (0L until 24L).toSeq, k = 8)
      .orderBy(col("probe_id"))
  }

  /** LSH candidate recall ([[Similarity.lshCandidateRecall]]): the ANN
    * index review as a query — per probe, how many of the exact top-10
    * neighbors the multi-probe bucket front end even surfaces. The
    * oracle replays BOTH pipelines: the q166 signature/margin-flip
    * candidate CTEs and the q193 exact-decimal top-k. */
  val q194LshRecall: (String, QueryDef) = q(
    "q194_lsh_recall", {
      import graft.operators.Similarity.planeWeight
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
      def fold(term: String): String =
        "CAST(list_reduce(list_transform(generate_series(1, 64), " +
          s"i -> CAST(CAST($term AS VARCHAR) AS DECIMAL(38,12))), " +
          "(x, y) -> x + y) AS DOUBLE)"
      val sq = fold("CAST(embedding[i] AS DOUBLE) * " +
        "CAST(embedding[i] AS DOUBLE)")
      val dot = fold("CAST(e.embedding[i] AS DOUBLE) * " +
        "CAST(p2.pe[i] AS DOUBLE)")
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
         |  SELECT DISTINCT pr.qid, s.vec_id AS nid
         |  FROM sigs s JOIN probes pr
         |    ON s.bucket = pr.bucket AND s.vec_id <> pr.qid),
         |nm AS (SELECT vec_id, sqrt($sq) AS nrm FROM embeddings),
         |p2 AS (SELECT vec_id AS pid, embedding AS pe FROM embeddings
         |       WHERE vec_id IN (0,1,2,3,4,5,6,7)),
         |cs AS (
         |  SELECT p2.pid, e.vec_id AS nid, $dot / (np.nrm * ne.nrm) AS c
         |  FROM embeddings e CROSS JOIN p2
         |  JOIN nm np ON np.vec_id = p2.pid
         |  JOIN nm ne ON ne.vec_id = e.vec_id
         |  WHERE e.vec_id <> p2.pid),
         |ek AS (
         |  SELECT pid AS qid, nid FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY pid
         |      ORDER BY c DESC, nid) AS rk
         |    FROM cs)
         |  WHERE rk <= 10),
         |cc AS (SELECT qid, COUNT(*) AS n_candidates FROM cand
         |       GROUP BY qid),
         |j AS (
         |  SELECT ek.qid,
         |    CASE WHEN cand.nid IS NOT NULL THEN 1 ELSE 0 END AS hit
         |  FROM ek LEFT JOIN cand
         |    ON cand.qid = ek.qid AND cand.nid = ek.nid)
         |SELECT j.qid AS qid, COALESCE(cc.n_candidates, 0) AS n_candidates,
         |  COUNT(*) AS k_found, CAST(SUM(hit) AS BIGINT) AS hits,
         |  CAST(SUM(hit) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
         |FROM j LEFT JOIN cc ON cc.qid = j.qid
         |GROUP BY j.qid, cc.n_candidates ORDER BY qid""".stripMargin
    }) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    Similarity.lshCandidateRecall(t("embeddings"), "vec_id", "embedding",
        queryIds = (0L until 8L).toSeq, k = 10, planes = 8, seed = 42,
        dims = 64, probes = 3)
      .orderBy(col("qid"))
  }

  /** Exact asymmetric containment self-join below threshold 0.5
    * ([[Dedup.containmentJoin]]) — the low-threshold dedup gap: the
    * rarest-first asymmetric prefix must lose NOTHING, so the oracle IS
    * the brute-force all-pairs containment join. */
  val q195ContainmentJoin: (String, QueryDef) = q(
    "q195_containment_join",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |tk AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    generate_series(1, len(w) - 3),
      |    i -> array_to_string(w[i:i+3], ' '))) AS tk
      |  FROM w WHERE len(w) >= 4),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    CAST(len(list_intersect(a.tk, b.tk)) AS BIGINT) AS n_common,
      |    CAST(len(a.tk) AS BIGINT) AS n_a
      |  FROM tk a JOIN tk b ON a.doc_id <> b.doc_id)
      |SELECT id_a, id_b, n_common, n_a,
      |  CAST(n_common AS DOUBLE) / CAST(n_a AS DOUBLE) AS containment
      |FROM pairs WHERE CAST(n_common AS DOUBLE) / CAST(n_a AS DOUBLE) >= 0.35
      |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    Dedup.containmentJoin(t("documents"), "doc_id", "text",
        n = 4, minContainment = 0.35)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** `-distinct-limit` early-exit distinct sample
    * ([[graft.operators.Sampling.distinctSample]], sybil
    * aggregate.go:19): the catalog pins `n` >= the fixture's distinct
    * count, where the scan-order-dependent sample becomes the complete
    * (deterministic) distinct set — the early-exit behavior itself is
    * listener-asserted in Round16OpsSpec. */
  val q196DistinctLimit: (String, QueryDef) = q(
    "q196_distinct_limit",
    """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
      |ORDER BY c_mktsegment, c_nationkey""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.dsl.SybilQuery()
      .distinct("c_mktsegment", "c_nationkey")
      .distinctLimitTo(100000)
      .run(t("customer"))
      .orderBy(col("c_mktsegment"), col("c_nationkey"))
  }

  val catalog: Seq[(String, QueryDef)] =
    Seq(q192Ewma, q193LabelConsistency, q194LshRecall, q195ContainmentJoin,
      q196DistinctLimit)
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Curation, Dedup, Pii, Sampling, Similarity, TextAnalysis}

/** Catalog entries: round-6 model/curation additions — Lloyd k-means
  * codebook training for IVF, per-source quota caps, edit-distance verify
  * on LSH candidates, and canonical text normalization.
  */
object Queries9 {

  private def t(name: String)(implicit env: (SparkSession, String)): DataFrame =
    if (name == "events") Tables.events(env._1, env._2)
    else Tables.load(env._1, env._2, name)

  private def q(name: String, sql: String = null)(
      body: (SparkSession, String) => DataFrame): (String, QueryDef) =
    name -> QueryDef(body, Option(sql))

  /** In-order double fold of the 64-dim dot product — the SQL twin of the
    * native `graft_dotw` (same add order → bit-identical). */
  private def kmDot(e: String, c: String): String =
    s"list_reduce(list_transform(generate_series(1, 64), i -> " +
      s"CAST($e[i] AS DOUBLE) * $c[i]), (x, y) -> x + y)"

  /** Nearest-centroid assignment CTE (argmax dot, smallest cid on ties). */
  private def kmAssign(a: String, c: String): String =
    s"""$a AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT e.vec_id, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${kmDot("e.embedding", "c.cv")} DESC, c.cid) AS rk
       |    FROM embeddings e CROSS JOIN $c c) WHERE rk = 1)""".stripMargin

  /** Centroid update CTE: per-dimension mean via exact DECIMAL(38,9) sums
    * (the dsum convention), empty clusters keep the previous centroid. */
  private def kmUpdate(cNext: String, a: String, cPrev: String): String =
    s"""m$cNext AS (
       |  SELECT a.cid, d.i AS dim,
       |    CAST(SUM(CAST(CAST(e.embedding[d.i] AS DOUBLE) AS DECIMAL(38,9))) AS DOUBLE)
       |      / COUNT(*) AS m
       |  FROM $a a JOIN embeddings e USING (vec_id)
       |  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) d
       |  GROUP BY a.cid, d.i),
       |$cNext AS (
       |  SELECT c.cid, COALESCE(n.cv, c.cv) AS cv
       |  FROM $cPrev c LEFT JOIN (
       |    SELECT cid, list(m ORDER BY dim) AS cv FROM m$cNext GROUP BY cid) n
       |  USING (cid))""".stripMargin

  /** Lloyd k-means: 2 full iterations (assign → exact-decimal mean) from
    * the seeded codebook, then the final assignment — every arithmetic
    * step (in-order dot folds, decimal sums, one IEEE division per mean)
    * is replicated in the oracle, so the trained model itself is
    * hash-checked, not just smoke-tested. */
  val q64Kmeans: (String, QueryDef) = q(
    "q64_kmeans",
    s"""WITH c0 AS (
       |  SELECT vec_id AS cid,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
       |  FROM embeddings WHERE vec_id < 8),
       |${kmAssign("a0", "c0")},
       |${kmUpdate("c1", "a0", "c0")},
       |${kmAssign("a1", "c1")},
       |${kmUpdate("c2", "a1", "c1")},
       |${kmAssign("a2", "c2")}
       |SELECT vec_id, cid AS cluster FROM a2 ORDER BY vec_id""".stripMargin) {
    (s, dir) =>
      implicit val env: (SparkSession, String) = (s, dir)
      Similarity.kmeansAssign(t("embeddings"), "vec_id", "embedding",
          nClusters = 8, iters = 2)
        .orderBy(col("vec_id"))
  }

  /** Per-source quota cap: keep the 20 longest docs per source (doc_id
    * tiebreak) — the anti-domination retention rule. */
  val q65SourceCap: (String, QueryDef) = q(
    "q65_source_cap",
    """SELECT doc_id, source, n_chars FROM (
      |  SELECT doc_id, source, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY n_chars DESC, doc_id) AS rk
      |  FROM documents) WHERE rk <= 20 ORDER BY doc_id""".stripMargin) {
    (s, dir) =>
      implicit val env: (SparkSession, String) = (s, dir)
      Sampling.quotaCap(
          t("documents").select(col("doc_id"), col("source"), col("n_chars")),
          "source", Seq(col("n_chars").desc, col("doc_id").asc), k = 20)
        .orderBy(col("doc_id"))
  }

  /** Character-level verify on the same LSH candidate pairs the Jaccard
    * verify (q37) consumes: exact Levenshtein distance, integers only. */
  val q66EditDistance: (String, QueryDef) = q(
    "q66_edit_distance",
    s"""WITH ${Queries8.pairsSql}
       |SELECT p.d1, p.d2, levenshtein(x.text, y.text) AS edit_dist
       |FROM pairs p
       |JOIN documents x ON x.doc_id = p.d1
       |JOIN documents y ON y.doc_id = p.d2
       |WHERE levenshtein(x.text, y.text) <= 400
       |ORDER BY p.d1, p.d2""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    Dedup.editDistanceVerify(t("documents"),
        Dedup.lshCandidates(
          Dedup.minhashBands(t("documents"), "doc_id", "text"), "doc_id"),
        "doc_id", "text", maxDist = 400)
      .orderBy(col("d1"), col("d2"))
  }

  /** Canonical normalization (lowercase, ASCII-punctuation strip,
    * whitespace collapse) — the projection that runs before any hashing
    * dedup; checked byte-for-byte. */
  val q67Normalize: (String, QueryDef) = q(
    "q67_normalize",
    """SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(lower(text),
      |    '[^a-z0-9 ]', ' ', 'g'), '  +', ' ', 'g')) AS norm_text
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    t("documents")
      .select(col("doc_id"),
        TextAnalysis.normalizeText(col("text")).as("norm_text"))
      .orderBy(col("doc_id"))
  }

  /** IVF ANN with a TRAINED codebook — [[q64Kmeans]]'s Lloyd pass feeding
    * q52's probe-limited search: one k-means iteration refines the seeded
    * centroids, then assignment/probing/rescoring run exactly as in q52.
    * The oracle chains the Lloyd CTEs into the search CTEs — the entire
    * train→index→search pipeline is hash-checked end-to-end. */
  val q68IvfTrained: (String, QueryDef) = q(
    "q68_ann_ivf_trained", {
      def dotRaw(a: String, b: String): String =
        s"list_reduce(list_transform(generate_series(1, 64), i -> " +
          s"CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"
      s"""WITH c0 AS (
         |  SELECT vec_id AS cid,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
         |  FROM embeddings WHERE vec_id < 8),
         |${kmAssign("a0", "c0")},
         |${kmUpdate("c1", "a0", "c0")},
         |${kmAssign("assigned", "c1")},
         |probes AS (
         |  SELECT vec_id AS qid, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${kmDot("e.embedding", "c.cv")} DESC, c.cid) AS rk
         |    FROM embeddings e CROSS JOIN c1 c
         |    WHERE e.vec_id BETWEEN 100 AND 107) WHERE rk <= 3),
         |cand AS (
         |  SELECT p.qid, a.vec_id FROM assigned a JOIN probes p
         |    ON a.cid = p.cid AND a.vec_id <> p.qid),
         |scored AS (
         |  SELECT c.qid, c.vec_id,
         |    ${dotRaw("e.embedding", "qe.embedding")} /
         |    (SQRT(${dotRaw("e.embedding", "e.embedding")}) *
         |     SQRT(${dotRaw("qe.embedding", "qe.embedding")})) AS sim
         |  FROM cand c
         |  JOIN embeddings e ON e.vec_id = c.vec_id
         |  JOIN embeddings qe ON qe.vec_id = c.qid),
         |ranked AS (
         |  SELECT qid, vec_id, sim,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rk
         |  FROM scored)
         |SELECT qid, vec_id, sim FROM ranked WHERE rk <= 10
         |ORDER BY qid, sim DESC, vec_id""".stripMargin
    }) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    Similarity.ivfTopK(t("embeddings"), "vec_id", "embedding",
        queryIds = (100L to 107L), k = 10, nClusters = 8, nProbe = 3,
        trainIters = 1)
      .orderBy(col("qid"), col("sim").desc, col("vec_id"))
  }

  /** The composed curation pipeline: normalization-hash dup ranking, token
    * stats, PII counts, and the keep/drop verdict in one query — every
    * signal and the verdict itself hash-checked. */
  val q69CurationReport: (String, QueryDef) = q(
    "q69_curation_report",
    s"""WITH b AS (
       |  SELECT doc_id,
       |    md5(trim(regexp_replace(regexp_replace(lower(text),
       |      '[^a-z0-9 ]', ' ', 'g'), '  +', ' ', 'g'))) AS fp,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
       |      / len(string_split(text, ' ')) AS ttr,
       |    CAST(len(regexp_extract_all(text, '${Pii.EmailRe}'))
       |      + len(regexp_extract_all(text, '${Pii.PhoneRe}'))
       |      + len(regexp_extract_all(text, '${Pii.Ipv4Re}')) AS BIGINT)
       |      AS pii_total
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, n_tokens, ttr, pii_total,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS BIGINT)
       |      AS dup_rank
       |  FROM b)
       |SELECT doc_id, n_tokens, ttr, pii_total, dup_rank,
       |  (dup_rank = 1 AND n_tokens >= 5 AND ttr >= 0.3 AND pii_total = 0)
       |    AS keep_doc
       |FROM r ORDER BY doc_id""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    Curation.report(t("documents"), "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** Event-type transition matrix (lag over the per-user timeline, then a
    * tiny |types|² aggregation) — the Markov view of the event log. */
  val q70Transitions: (String, QueryDef) = q(
    "q70_event_transitions",
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    epoch_ns(ts) // 1000000000 AS s FROM events),
      |p AS (
      |  SELECT event_type,
      |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY s, event_id)
      |      AS prev_type,
      |    s - LAG(s) OVER (PARTITION BY user_id ORDER BY s, event_id) AS gap
      |  FROM e)
      |SELECT prev_type, event_type AS next_type, COUNT(*) AS n,
      |  MIN(gap) AS min_gap, MAX(gap) AS max_gap
      |FROM p WHERE prev_type IS NOT NULL
      |GROUP BY prev_type, next_type ORDER BY prev_type, next_type""".stripMargin) {
    (s, dir) =>
      implicit val env: (SparkSession, String) = (s, dir)
      graft.operators.Events.transitions(t("events"), "user_id", "ts_sec",
          "event_id", "event_type")
        .orderBy(col("prev_type"), col("next_type"))
  }

  /** CUBE over (returnflag, linestatus): all four grouping combinations in
    * one pass — extends the reference's single-dimension TOTAL row (q15
    * rollup) to the full lattice, exact decimal sums throughout. */
  val q71Cube: (String, QueryDef) = q(
    "q71_cube",
    """SELECT COALESCE(l_returnflag, 'ALL') AS flag,
      |  COALESCE(l_linestatus, 'ALL') AS status,
      |  COUNT(*) AS cnt,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY flag, status""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    t("lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"),
        call_function("graft_dsum", col("l_quantity"), lit(4)).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("cnt"), col("sum_qty"))
      .orderBy(col("flag"), col("status"))
  }

  /** Moving average over tumbling time buckets: per-type event counts,
    * then a 3-bucket ROWS frame — window-frame coverage over the q07-style
    * time series. Integer sums, one IEEE division per row. */
  val q72MovingAvg: (String, QueryDef) = q(
    "q72_moving_avg",
    """WITH b AS (
      |  SELECT event_type, (epoch_ns(ts) // 1000000000) // 3600 AS bucket,
      |    COUNT(*) AS cnt
      |  FROM events GROUP BY event_type, bucket)
      |SELECT event_type, bucket, cnt,
      |  AVG(cnt) OVER (PARTITION BY event_type ORDER BY bucket
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ma3
      |FROM b ORDER BY event_type, bucket""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("bucket"))
      .rowsBetween(-2, 0)
    t("events")
      .groupBy(col("event_type"), expr("ts_sec div 3600").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("ma3", avg(col("cnt")).over(w))
      .orderBy(col("event_type"), col("bucket"))
  }

  /** Weight-proportional sampling with pure-integer membership: keep docs
    * with probability n_chars/1000, Horvitz-Thompson weight attached. */
  val q73WeightedSample: (String, QueryDef) = q(
    "q73_weighted_sample",
    """SELECT doc_id, n_chars,
      |  GREATEST(1.0, 1000.0 / CAST(n_chars AS DOUBLE)) AS sample_weight
      |FROM documents
      |WHERE (CAST('0x' || substring(md5('ws1' || CAST(doc_id AS VARCHAR)), 1, 8)
      |       AS BIGINT) % 10000) * 1000 < 10000 * n_chars
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    Sampling.weightedHashSample(
        t("documents").select(col("doc_id"), col("n_chars")),
        "doc_id", col("n_chars"), maxWeight = 1000L, salt = "ws1")
      .orderBy(col("doc_id"))
  }

  /** Embedding near-dup with the LSH bucket as the computed blocking key
    * (q34's blocked pairs without its prebuilt `label`): the oracle
    * recomputes every sign bit from the same plane-weight literals (q47's
    * convention) and the same in-order cosine folds. */
  val q74LshNearDup: (String, QueryDef) = q(
    "q74_lsh_neardup", {
      def projSql(p: Int, e: String): String = {
        val w = (0 until 64).map(d => java.lang.Double.toString(
          Similarity.planeWeight(42, p, d))).mkString("[", ",", "]")
        s"list_reduce(list_transform(generate_series(1, 64), i -> " +
          s"CAST($e[i] AS DOUBLE) * ($w)[i]), (a, b) -> a + b)"
      }
      def dotRaw(x: String, y: String): String =
        s"list_reduce(list_transform(generate_series(1, 64), i -> " +
          s"CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)), (a, b) -> a + b)"
      val bucket = (0 until 8).map(p =>
        s"(CASE WHEN ${projSql(p, "embedding")} > 0 THEN ${1L << p} ELSE 0 END)")
        .mkString(" + ")
      val cosSql = s"${dotRaw("a.embedding", "c.embedding")} / " +
        s"(SQRT(${dotRaw("a.embedding", "a.embedding")}) * " +
        s"SQRT(${dotRaw("c.embedding", "c.embedding")}))"
      s"""WITH b AS (
         |  SELECT vec_id, embedding, CAST($bucket AS BIGINT) AS bucket
         |  FROM embeddings)
         |SELECT a.vec_id AS id1, c.vec_id AS id2, $cosSql AS cos
         |FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
         |WHERE $cosSql >= 0.2
         |ORDER BY id1, id2""".stripMargin
    }) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    Similarity.lshNearDupPairs(t("embeddings"), "vec_id", "embedding",
        minCos = 0.2, planes = 8, seed = 42, dims = 64)
      .orderBy(col("id1"), col("id2"))
  }

  /** Cluster-quality report ([[Similarity.clusterQuality]]) over the SAME
    * trained codebook as q64 (2 Lloyd iterations): per cluster, size and
    * total / mean member→centroid similarity — cosine-space inertia. The
    * oracle chains q64's Lloyd CTEs and recomputes the winning dot per
    * member; totals ride the exact-decimal convention, the mean is one
    * IEEE division — all hash-checked. */
  val q126ClusterQuality: (String, QueryDef) = q(
    "q126_cluster_quality",
    s"""WITH c0 AS (
       |  SELECT vec_id AS cid,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
       |  FROM embeddings WHERE vec_id < 8),
       |${kmAssign("a0", "c0")},
       |${kmUpdate("c1", "a0", "c0")},
       |${kmAssign("a1", "c1")},
       |${kmUpdate("c2", "a1", "c1")},
       |${kmAssign("a2", "c2")}
       |SELECT a.cid AS cluster, COUNT(*) AS n,
       |  CAST(SUM(CAST(${kmDot("e.embedding", "c.cv")} AS DECIMAL(38,6)))
       |    AS DOUBLE) AS total_sim,
       |  CAST(SUM(CAST(${kmDot("e.embedding", "c.cv")} AS DECIMAL(38,6)))
       |    AS DOUBLE) / COUNT(*) AS mean_sim
       |FROM a2 a JOIN embeddings e USING (vec_id) JOIN c2 c ON a.cid = c.cid
       |GROUP BY a.cid ORDER BY cluster""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    Similarity.clusterQuality(t("embeddings"), "vec_id", "embedding",
        nClusters = 8, iters = 2)
      .orderBy(col("cluster"))
  }

  val catalog: Seq[(String, QueryDef)] = Seq(
    q64Kmeans, q65SourceCap, q66EditDistance, q67Normalize, q68IvfTrained,
    q69CurationReport, q70Transitions, q71Cube, q72MovingAvg,
    q73WeightedSample, q74LshNearDup, q126ClusterQuality)
}

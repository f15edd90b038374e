package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Events, Graph}

/** Catalog entries: round-13 additions (continued) — changepoint
  * detection, session sequence export, triangle counting.
  */
object Queries21 {

  private def t(name: String)(implicit env: (SparkSession, String)): DataFrame =
    Tables.load(env._1, env._2, name)

  private def q(name: String, sql: String = null)(
      body: (SparkSession, String) => DataFrame): (String, QueryDef) =
    name -> QueryDef(body, Option(sql))

  /** Exact-integer CUSUM changepoint scan ([[Events.cusumChangepoint]]):
    * per event type, the one-sided CUSUM against the type's own flat
    * baseline over day buckets, all in integers scaled by the bucket
    * count — no fractional mean, hash-exact by construction. The CUSUM
    * recurrence is NOT associative (`max(0, ·)` clamps), and DuckDB's
    * `list_reduce` batches as if folds were associative (measured wrong
    * totals, the non-associative cousin of the q175 ULP finding) — so
    * the oracle walks the buckets with a RECURSIVE CTE, the genuinely
    * sequential form. */
  val q187Cusum: (String, QueryDef) = q(
    "q187_cusum_changepoint",
    """WITH RECURSIVE e AS (
      |  SELECT event_type,
      |    (epoch_ns(ts) // 1000000000) // 86400 AS b
      |  FROM events),
      |obs AS (SELECT event_type, b, COUNT(*) AS c FROM e GROUP BY 1, 2),
      |spans AS (
      |  SELECT event_type, MIN(b) AS lo, MAX(b) AS hi FROM obs GROUP BY 1),
      |allb AS (
      |  SELECT event_type, unnest(generate_series(lo, hi)) AS b FROM spans),
      |bc0 AS (
      |  SELECT a.event_type, a.b, CAST(COALESCE(o.c, 0) AS BIGINT) AS c
      |  FROM allb a LEFT JOIN obs o
      |    ON o.event_type = a.event_type AND o.b = a.b),
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
      |    CAST(0 AS BIGINT) AS su, CAST(0 AS BIGINT) AS mu,
      |    CAST(-1 AS BIGINT) AS fu, CAST(0 AS BIGINT) AS sd,
      |    CAST(0 AS BIGINT) AS md, CAST(-1 AS BIGINT) AS fd
      |  FROM g
      |  UNION ALL
      |  SELECT w.event_type, w.rn + 1,
      |    GREATEST(0, w.su + (bc.c * g.n_buckets - g.total)),
      |    GREATEST(w.mu, GREATEST(0, w.su + (bc.c * g.n_buckets - g.total))),
      |    CASE WHEN w.fu >= 0 THEN w.fu
      |      WHEN GREATEST(0, w.su + (bc.c * g.n_buckets - g.total)) >
      |        2 * g.total THEN bc.b ELSE -1 END,
      |    GREATEST(0, w.sd + (g.total - bc.c * g.n_buckets)),
      |    GREATEST(w.md, GREATEST(0, w.sd + (g.total - bc.c * g.n_buckets))),
      |    CASE WHEN w.fd >= 0 THEN w.fd
      |      WHEN GREATEST(0, w.sd + (g.total - bc.c * g.n_buckets)) >
      |        2 * g.total THEN bc.b ELSE -1 END
      |  FROM walk w
      |  JOIN bc ON bc.event_type = w.event_type AND bc.rn = w.rn + 1
      |  JOIN g ON g.event_type = w.event_type)
      |SELECT g.event_type AS event_type, g.n_buckets, g.total,
      |  w.mu AS max_cusum_up, NULLIF(w.fu, -1) AS up_changepoint,
      |  w.md AS max_cusum_down, NULLIF(w.fd, -1) AS down_changepoint
      |FROM g JOIN walk w
      |  ON w.event_type = g.event_type AND w.rn = g.n_buckets
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    Events.cusumChangepoint(Tables.events(s, dir), "event_type",
        col("ts_sec"), bucketSec = 86400L, h = 2L)
      .orderBy(col("event_type"))
  }

  /** Session sequence export ([[Events.sessionSequences]]): the ordered
    * `view>click>…` string per 30-minute-gap session, largest sessions
    * first — the next-action training rows an event log becomes. */
  val q188SessionSequences: (String, QueryDef) = q(
    "q188_session_sequences",
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    epoch_ns(ts) // 1000000000 AS s
      |  FROM events),
      |t AS (
      |  SELECT *, CASE WHEN
      |      LAG(s) OVER (PARTITION BY user_id ORDER BY s, event_id)
      |        IS NULL
      |      OR s - LAG(s) OVER (PARTITION BY user_id ORDER BY s, event_id)
      |        > 1800
      |    THEN 1 ELSE 0 END AS nw
      |  FROM e),
      |t2 AS (
      |  SELECT *, CAST(SUM(nw) OVER (PARTITION BY user_id
      |    ORDER BY s, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS sid
      |  FROM t),
      |g AS (
      |  SELECT user_id, sid AS session_idx, COUNT(*) AS n_events,
      |    CAST(MAX(s) - MIN(s) AS BIGINT) AS duration_secs,
      |    string_agg(event_type, '>' ORDER BY s, event_id) AS sequence
      |  FROM t2 GROUP BY 1, 2)
      |SELECT user_id, session_idx, n_events, duration_secs, sequence
      |FROM g ORDER BY n_events DESC, user_id, session_idx
      |LIMIT 100""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    Events.sessionSequences(Tables.events(s, dir), "user_id", "ts_sec",
      "event_id", "event_type", gapSecs = 1800L, topK = 100)
  }

  /** Triangle counting ([[Graph.triangleCounts]]) over the co-purchase
    * graph (parts sharing ≥ 4 customers): per-part triangle
    * participation, top 100 — the community-density audit next to
    * q174's PageRank and q60's components. */
  val q189Triangles: (String, QueryDef) = q(
    "q189_triangles",
    """WITH cp AS (
      |  SELECT DISTINCT o_custkey AS c, l_partkey AS p
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      |e AS (
      |  SELECT a.p AS x, b.p AS y
      |  FROM cp a JOIN cp b ON a.c = b.c AND a.p < b.p
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 4),
      |tri AS (
      |  SELECT e1.x AS x, e1.y AS y, e2.y AS z
      |  FROM e e1
      |  JOIN e e2 ON e2.x = e1.y
      |  JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y),
      |n AS (SELECT unnest([x, y, z]) AS node FROM tri)
      |SELECT node, COUNT(*) AS n_triangles
      |FROM n GROUP BY node
      |ORDER BY n_triangles DESC, node LIMIT 100""".stripMargin) {
    (s, dir) =>
      implicit val env: (SparkSession, String) = (s, dir)
      val cp = t("orders")
        .join(t("lineitem"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
        .distinct()
      val e = cp.toDF("c", "pa")
        .join(cp.toDF("c2", "pb"),
          col("c") === col("c2") && col("pa") < col("pb"))
        .groupBy(col("pa"), col("pb"))
        .agg(count(lit(1)).as("__sh"))
        .filter(col("__sh") >= 4)
        .select(col("pa").as("src"), col("pb").as("dst"))
      Graph.triangleCounts(e, "src", "dst")
        .orderBy(col("n_triangles").desc, col("node")).limit(100)
  }

  /** The q157 BPE level CTEs, regenerated here carrying the WORD column
    * through every merge level so the segmented dictionary can join back
    * onto the corpus. */
  private def bpeSegmentOracleSql(merges: Int): String = {
    val base =
      """WITH wd AS (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY w),
        |w0 AS MATERIALIZED (
        |  SELECT w, freq, chr(1) || array_to_string(
        |    list_transform(generate_series(1, length(w)), i -> w[i]) ||
        |    ['</w>'], chr(1)) || chr(1) AS s
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
         |  SELECT w, freq, replace(s,
         |    chr(1) || (SELECT a FROM t$i) || chr(1) ||
         |      (SELECT b FROM t$i) || chr(1),
         |    chr(1) || (SELECT a || b FROM t$i) || chr(1)) AS s
         |  FROM w${i - 1})""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"""$base$levels,
       |seg AS (
       |  SELECT w,
       |    CAST(len(string_split(s, chr(1))) - 2 AS BIGINT) AS pieces
       |  FROM w$merges),
       |cw AS (SELECT lang, unnest(string_split(text, ' ')) AS w
       |       FROM documents)
       |SELECT lang, COUNT(*) AS n_words,
       |  CAST(SUM(pieces) AS BIGINT) AS n_pieces,
       |  CAST(SUM(pieces) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
       |    AS pieces_per_word
       |FROM cw JOIN seg USING (w)
       |GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** Tokenizer fertility per language
    * ([[graft.operators.Bpe.learnMerges]] →
    * [[graft.operators.Bpe.segmentStats]]): train 8 merges on the corpus
    * word dictionary, segment every language slice with them, report
    * pieces-per-word — the "which slice does my tokenizer hurt" audit.
    * The oracle replays the full data-dependent learner (q157) AND the
    * segmentation join. */
  val q190BpeFertility: (String, QueryDef) = q(
    "q190_bpe_fertility", bpeSegmentOracleSql(8)) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val docs = t("documents")
    val merges = graft.operators.Bpe.learnMerges(docs, "text", merges = 8)
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    graft.operators.Bpe.segmentStats(docs, "lang", "text", merges)
      .orderBy(col("lang"))
  }

  /** Burrows' Delta stylometry
    * ([[graft.operators.TextAnalysis.burrowsDelta]]): pairwise style
    * distance between sources over the top-20 function-word rates —
    * `|z_a − z_b|` collapses to `|f_a − f_b|/σ_w` so every term is exact
    * ratios + two IEEE ops; decimal-exact moments and means. */
  val q191BurrowsDelta: (String, QueryDef) = q(
    "q191_burrows_delta",
    """WITH toks AS (
      |  SELECT source AS src, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |counts AS (SELECT src, w, COUNT(*) AS c FROM toks GROUP BY 1, 2),
      |totals AS (SELECT src, CAST(SUM(c) AS BIGINT) AS t FROM counts
      |           GROUP BY src),
      |top AS (
      |  SELECT w FROM (
      |    SELECT w, CAST(SUM(c) AS BIGINT) AS cw FROM counts GROUP BY w)
      |  ORDER BY cw DESC, w LIMIT 20),
      |grid AS (
      |  SELECT totals.src, top.w,
      |    CAST(COALESCE(c, 0) AS DOUBLE) / CAST(t AS DOUBLE) AS f
      |  FROM totals CROSS JOIN top
      |  LEFT JOIN counts ON counts.src = totals.src AND counts.w = top.w),
      |nn AS (SELECT COUNT(*) AS ns FROM totals),
      |sig AS (
      |  SELECT w, SQRT(GREATEST(0.0,
      |    CAST(SUM(CAST(CAST(f * f AS VARCHAR) AS DECIMAL(38,12)))
      |      AS DOUBLE) / CAST(ns AS DOUBLE) -
      |    (CAST(SUM(CAST(CAST(f AS VARCHAR) AS DECIMAL(38,12)))
      |      AS DOUBLE) / CAST(ns AS DOUBLE)) *
      |    (CAST(SUM(CAST(CAST(f AS VARCHAR) AS DECIMAL(38,12)))
      |      AS DOUBLE) / CAST(ns AS DOUBLE)))) AS sig
      |  FROM grid CROSS JOIN nn GROUP BY w, ns),
      |pairs AS (
      |  SELECT a.src AS src_a, b.src AS src_b,
      |    CASE WHEN sig > 0 THEN abs(a.f - b.f) / sig ELSE 0.0 END AS dz
      |  FROM grid a
      |  JOIN grid b ON a.w = b.w AND a.src < b.src
      |  JOIN sig ON sig.w = a.w)
      |SELECT src_a, src_b, COUNT(*) AS n_words,
      |  CAST(SUM(CAST(CAST(dz AS VARCHAR) AS DECIMAL(38,12))) AS DOUBLE) /
      |    CAST(COUNT(*) AS DOUBLE) AS delta
      |FROM pairs GROUP BY 1, 2
      |ORDER BY src_a, src_b""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.operators.TextAnalysis.burrowsDelta(t("documents"), "source",
        "text", topWords = 20)
      .orderBy(col("src_a"), col("src_b"))
  }

  val catalog: Seq[(String, QueryDef)] =
    Seq(q187Cusum, q188SessionSequences, q189Triangles, q190BpeFertility,
      q191BurrowsDelta)
}

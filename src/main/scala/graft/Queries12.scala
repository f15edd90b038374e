package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Dedup, Similarity, TextAnalysis}
import graft.sources.Bucketing

/** Catalog entries: round-7 additions — prefix-filtered exact set-similarity
  * join, z-order layout keys, char-entropy quality, semantic dedup, exact
  * heavy hitters.
  */
object Queries12 {

  private def t(name: String)(implicit env: (SparkSession, String)): DataFrame =
    if (name == "events") Tables.events(env._1, env._2)
    else Tables.load(env._1, env._2, name)

  private def q(name: String, sql: String = null)(
      body: (SparkSession, String) => DataFrame): (String, QueryDef) =
    name -> QueryDef(body, Option(sql))

  /** Exact Jaccard self-join via prefix filtering ([[Dedup.setSimJoin]]) —
    * the AllPairs/PPJoin candidate scheme. The oracle IS the brute-force
    * all-pairs join: the prefix filter must lose nothing. */
  val q85SetSimJoin: (String, QueryDef) = q(
    "q85_setsim_join",
    """WITH w AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |tk AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    generate_series(1, len(w) - 2),
      |    i -> array_to_string(w[i:i+2], ' '))) AS tk
      |  FROM w),
      |pairs AS (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2,
      |    CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE) /
      |      (len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk))) AS jaccard
      |  FROM tk a JOIN tk b ON a.doc_id < b.doc_id
      |  WHERE len(a.tk) > 0 AND len(b.tk) > 0)
      |SELECT d1, d2, jaccard FROM pairs WHERE jaccard >= 0.6
      |ORDER BY d1, d2""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    Dedup.setSimJoin(t("documents"), "doc_id", "text", minJaccard = 0.6,
        shingle = 3)
      .orderBy(col("d1"), col("d2"))
  }

  /** Z-order (Morton) key distribution over two bounded dimensions
    * ([[Bucketing.zorder2]]): the multi-dimensional clustering key for
    * layout-level data skipping, verified bit-for-bit against the
    * oracle's integer interleave. */
  val q86Zorder: (String, QueryDef) = q(
    "q86_zorder",
    """WITH z AS (
      |  SELECT CAST(list_sum(list_transform(generate_series(0, 7), i ->
      |    ((((l_partkey % 256) >> i) & 1) << (2*i)) +
      |    ((((l_suppkey % 256) >> i) & 1) << (2*i + 1)))) AS BIGINT) AS zv
      |  FROM lineitem)
      |SELECT zv, COUNT(*) AS n FROM z GROUP BY zv ORDER BY zv""".stripMargin) {
    (s, dir) =>
      implicit val env: (SparkSession, String) = (s, dir)
      t("lineitem")
        .select(Bucketing.zorder2(pmod(col("l_partkey"), lit(256)),
          pmod(col("l_suppkey"), lit(256)), bits = 8).as("zv"))
        .groupBy(col("zv")).agg(count(lit(1)).as("n"))
        .orderBy(col("zv"))
  }

  /** Per-document character entropy ([[TextAnalysis.charEntropy]], native
    * one-pass expression). Terms accumulate in code-point order — the
    * oracle folds a sorted character list in the same order; ROUND(.,6)
    * absorbs the log2 ulp (q45 convention). */
  val q87CharEntropy: (String, QueryDef) = q(
    "q87_char_entropy",
    """WITH ch AS (
      |  SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
      |cc AS (
      |  SELECT doc_id, c, CAST(COUNT(*) AS DOUBLE) AS cnt
      |  FROM ch GROUP BY 1, 2),
      |tot AS (
      |  SELECT doc_id, SUM(cnt) AS n,
      |    list_sort(list(struct_pack(c := c, cnt := cnt))) AS l
      |  FROM cc GROUP BY 1)
      |SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
      |  ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |    list_transform(l, s -> -(s.cnt / n) * log2(s.cnt / n))),
      |    (a, b) -> a + b), 6) AS entropy
      |FROM tot ORDER BY doc_id""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    t("documents")
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
        round(TextAnalysis.charEntropy(col("text")), 6).as("entropy"))
      .orderBy(col("doc_id"))
  }

  /** Semantic dedup verdict ([[Similarity.semanticDedup]]): cluster
    * assignment + within-cluster cosine drop rule, every stage replicated
    * in the oracle (assignment = q52's argmax CTE; pairs = exact cosine
    * folds; verdict = EXISTS). */
  val q88SemanticDedup: (String, QueryDef) = q(
    "q88_semantic_dedup", {
      def dotSql(a: String, b: String): String =
        s"list_reduce(list_transform(generate_series(1, 64), i -> " +
          s"CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"
      s"""WITH cents AS (
         |  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 16),
         |sims AS (
         |  SELECT e.vec_id, c.cid, ${dotSql("e.embedding", "c.cv")} AS sim
         |  FROM embeddings e CROSS JOIN cents c),
         |assigned AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rk
         |    FROM sims) WHERE rk = 1),
         |drops AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM assigned a JOIN assigned b
         |    ON a.cid = b.cid AND a.vec_id < b.vec_id
         |  JOIN embeddings ea ON ea.vec_id = a.vec_id
         |  JOIN embeddings eb ON eb.vec_id = b.vec_id
         |  WHERE ${dotSql("ea.embedding", "eb.embedding")} /
         |    (SQRT(${dotSql("ea.embedding", "ea.embedding")}) *
         |     SQRT(${dotSql("eb.embedding", "eb.embedding")})) >= 0.92)
         |SELECT a.vec_id, a.cid AS cluster,
         |  CAST(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS dropped
         |FROM assigned a LEFT JOIN drops d ON d.vec_id = a.vec_id
         |ORDER BY a.vec_id""".stripMargin
    }) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    Similarity.semanticDedup(t("embeddings"), "vec_id", "embedding",
        nClusters = 16, minCos = 0.92)
      .orderBy(col("vec_id"))
  }

  /** Exact top-10 tokens per language ([[TextAnalysis.heavyHitters]],
    * two-phase skew-safe top-k). The Misra-Gries sketch
    * ([[graft.functions.FreqSketch]]) is the bounded-memory sibling,
    * spec-verified by its error bound rather than a value hash. */
  val q89HeavyHitters: (String, QueryDef) = q(
    "q89_heavy_hitters",
    """WITH tk AS (
      |  SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents),
      |c AS (SELECT lang, token, COUNT(*) AS cnt FROM tk GROUP BY 1, 2),
      |r AS (
      |  SELECT lang, token, cnt,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS rk
      |  FROM c)
      |SELECT lang, token, cnt FROM r WHERE rk <= 10
      |ORDER BY lang, cnt DESC, token""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    TextAnalysis.heavyHitters(t("documents"), "lang", "text", k = 10)
      .orderBy(col("lang"), col("cnt").desc, col("token"))
  }

  /** Hourly cumulative distinct users via the first-seen rewrite
    * ([[graft.operators.Events.cumulativeDistinct]]) — no running
    * distinct state; the window runs over buckets, not rows. */
  val q90CumulativeDistinct: (String, QueryDef) = q(
    "q90_cumulative_users",
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) // 1000000000 AS s FROM events),
      |fs AS (
      |  SELECT user_id, MIN((s // 3600) * 3600) AS bucket
      |  FROM e GROUP BY 1),
      |nb AS (SELECT bucket, COUNT(*) AS new_users FROM fs GROUP BY 1)
      |SELECT bucket, new_users,
      |  CAST(SUM(new_users) OVER (ORDER BY bucket
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
      |FROM nb ORDER BY bucket""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.operators.Events.cumulativeDistinct(t("events"), "user_id", "ts_sec",
        bucketSecs = 3600L)
      .orderBy(col("bucket"))
  }

  /** Cohort retention triangle ([[graft.operators.Events.cohortRetention]]):
    * first-seen day cohorts × active days, distinct users per cell. */
  val q91CohortRetention: (String, QueryDef) = q(
    "q91_cohort_retention",
    """WITH e AS (
      |  SELECT user_id,
      |    ((epoch_ns(ts) // 1000000000) // 86400) * 86400 AS bucket
      |  FROM events),
      |c AS (SELECT user_id, MIN(bucket) AS cohort FROM e GROUP BY 1)
      |SELECT c.cohort, e.bucket, COUNT(DISTINCT e.user_id) AS active_users
      |FROM e JOIN c USING (user_id) GROUP BY 1, 2
      |ORDER BY cohort, bucket""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.operators.Events.cohortRetention(t("events"), "user_id", "ts_sec",
        bucketSecs = 86400L)
      .orderBy(col("cohort"), col("bucket"))
  }

  /** Key-skew diagnostic over the events user key
    * ([[graft.core.Stats.keySkew]]): exact counts and shares, no
    * transcendental sums. */
  val q92KeySkew: (String, QueryDef) = q(
    "q92_key_skew",
    """WITH c AS (SELECT user_id, COUNT(*) AS c FROM events GROUP BY 1),
      |t AS (SELECT CAST(SUM(c) AS BIGINT) AS n_rows, COUNT(*) AS n_keys,
      |             MAX(c) AS max_cnt FROM c),
      |k AS (SELECT CAST(SUM(c) AS BIGINT) AS topk_cnt FROM (
      |  SELECT c FROM c ORDER BY c DESC, user_id LIMIT 10))
      |SELECT n_rows, n_keys, max_cnt, topk_cnt,
      |  CAST(max_cnt AS DOUBLE) / n_rows AS top1_share,
      |  CAST(topk_cnt AS DOUBLE) / n_rows AS topk_share
      |FROM t, k""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.core.Stats.keySkew(t("events"), "user_id", k = 10)
  }

  /** Last-touch attribution ([[graft.operators.Events
    * .lastTouchAttribution]]): purchases credited to the same user's most
    * recent click within 24 h — the backward as-of join composed with a
    * window filter; oracle via DuckDB's native ASOF JOIN. */
  val q93Attribution: (String, QueryDef) = q(
    "q93_attribution",
    """WITH tch AS (
      |  SELECT user_id, epoch_ns(ts) // 1000000000 AS touch_ts,
      |    MAX(event_id) AS touch_id
      |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      |cv AS (
      |  SELECT event_id AS conv_id, user_id,
      |    epoch_ns(ts) // 1000000000 AS conv_ts
      |  FROM events WHERE event_type = 'purchase')
      |SELECT conv_id, cv.user_id, conv_ts, touch_id,
      |  conv_ts - touch_ts AS touch_gap
      |FROM cv ASOF JOIN tch
      |  ON cv.user_id = tch.user_id AND cv.conv_ts >= tch.touch_ts
      |WHERE conv_ts - touch_ts <= 86400
      |ORDER BY conv_id""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.operators.Events.lastTouchAttribution(t("events"), "user_id",
        "ts_sec", "event_id", "event_type", convType = "purchase",
        touchType = "click", windowSec = 86400L)
      .orderBy(col("conv_id"))
  }

  /** Multimodal metadata decode, oracle-checked: WAV headers are
    * synthesized IN-PLAN from arithmetic fields
    * ([[graft.operators.Multimodal.synthWavHeader]]), then pushed through
    * the REAL byte parser (`graft_audio_meta` — little-endian RIFF chunk
    * walk). The oracle states the same fields as plain arithmetic, so the
    * whole encode→parse round trip is hash-checked; a byte-order or
    * chunk-walk bug would break the match. */
  val q94AudioMeta: (String, QueryDef) = q(
    "q94_audio_meta",
    """SELECT doc_id,
      |  CAST(1 + doc_id % 2 AS INT) AS channels,
      |  CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate,
      |  CAST(8 + (doc_id % 3) * 8 AS INT) AS bits,
      |  CAST(((doc_id % 1000) * 1024 + 64) * 1000 //
      |    ((8000 + (doc_id % 8) * 1000) *
      |     ((1 + doc_id % 2) * (8 + (doc_id % 3) * 8) // 8)) AS BIGINT)
      |    AS duration_ms
      |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin) {
    (s, dir) =>
      implicit val env: (SparkSession, String) = (s, dir)
      import graft.operators.Multimodal
      val d = col("doc_id")
      val withPayload = t("documents").filter(d < 200)
        .select(d, Multimodal.synthWavHeader(
          lit(1L) + d % 2, lit(8000L) + (d % 8) * 1000,
          lit(8L) + (d % 3) * 8, (d % 1000) * 1024 + 64).as("payload"))
      Multimodal.decodeAudioMeta(withPayload)
        .select(d, col("decoded_audio.channels").as("channels"),
          col("decoded_audio.sample_rate").as("sample_rate"),
          col("decoded_audio.bits").as("bits"),
          col("decoded_audio.duration_ms").as("duration_ms"))
        .orderBy(d)
  }

  /** [[q94AudioMeta]]'s round trip for the IMAGE parser: in-plan PNG
    * headers (big-endian IHDR dims) through `graft_image_dims`. */
  val q95ImageDims: (String, QueryDef) = q(
    "q95_image_dims",
    """SELECT doc_id,
      |  CAST(100 + doc_id % 512 AS INT) AS width,
      |  CAST(100 + (doc_id * 7) % 512 AS INT) AS height
      |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin) {
    (s, dir) =>
      implicit val env: (SparkSession, String) = (s, dir)
      import graft.operators.Multimodal
      val d = col("doc_id")
      val withPayload = t("documents").filter(d < 200)
        .select(d, Multimodal.synthPngHeader(
          lit(100L) + d % 512, lit(100L) + (d * 7) % 512).as("payload"))
      Multimodal.decodeDims(withPayload)
        .select(d, col("decoded_dims.width").as("width"),
          col("decoded_dims.height").as("height"))
        .orderBy(d)
  }

  /** [[q94AudioMeta]]'s round trip for the VIDEO parser: in-plan MP4
    * ftyp+moov(mvhd+trak/tkhd) through the `graft_video_meta` box walk —
    * timescale/duration arithmetic, track count, 16.16 dims. */
  val q96VideoMeta: (String, QueryDef) = q(
    "q96_video_meta",
    """SELECT doc_id,
      |  CAST(600 + (doc_id % 10) * 100 AS INT) AS timescale,
      |  CAST(((doc_id % 500) * 6000) * 1000 //
      |    (600 + (doc_id % 10) * 100) AS BIGINT) AS duration_ms,
      |  CAST(1 AS INT) AS n_tracks,
      |  CAST(320 + (doc_id % 16) * 8 AS INT) AS width,
      |  CAST(240 + (doc_id % 9) * 16 AS INT) AS height
      |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin) {
    (s, dir) =>
      implicit val env: (SparkSession, String) = (s, dir)
      import graft.operators.Multimodal
      val d = col("doc_id")
      val withPayload = t("documents").filter(d < 200)
        .select(d, Multimodal.synthMp4Header(
          lit(600L) + (d % 10) * 100, (d % 500) * 6000,
          lit(320L) + (d % 16) * 8, lit(240L) + (d % 9) * 16).as("payload"))
      Multimodal.decodeVideoMeta(withPayload)
        .select(d, col("decoded_video.timescale").as("timescale"),
          col("decoded_video.duration_ms").as("duration_ms"),
          col("decoded_video.n_tracks").as("n_tracks"),
          col("decoded_video.width").as("width"),
          col("decoded_video.height").as("height"))
        .orderBy(d)
  }

  /** Trailing-window rate anomalies
    * ([[graft.operators.Events.rateAnomalies]]): hourly per-type counts
    * z-scored against the previous 6 buckets. Window sums are exact ints;
    * the z formula is fixed IEEE ops (sqrt is correctly rounded), so no
    * rounding convention is needed. */
  val q97RateAnomaly: (String, QueryDef) = q(
    "q97_rate_anomaly",
    """WITH sp AS (
      |  SELECT event_type,
      |    ((epoch_ns(ts) // 1000000000) // 3600) * 3600 AS bucket,
      |    COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |spans AS (
      |  SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
      |  FROM sp GROUP BY 1),
      |dense AS (
      |  SELECT spans.event_type, t.b AS bucket
      |  FROM spans, UNNEST(generate_series(lo, hi, 3600)) AS t(b)),
      |c AS (
      |  SELECT d.event_type, d.bucket, COALESCE(sp.cnt, 0) AS cnt
      |  FROM dense d LEFT JOIN sp
      |    ON sp.event_type = d.event_type AND sp.bucket = d.bucket),
      |w AS (
      |  SELECT event_type, bucket, cnt,
      |    COUNT(*) OVER win AS k, SUM(cnt) OVER win AS s,
      |    SUM(cnt * cnt) OVER win AS ss
      |  FROM c WINDOW win AS (PARTITION BY event_type ORDER BY bucket
      |    ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)),
      |v AS (
      |  SELECT event_type, bucket, cnt, CAST(s AS DOUBLE) / 6 AS m,
      |    (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / 6) / 6 AS var
      |  FROM w WHERE k = 6)
      |SELECT event_type, bucket, cnt,
      |  CASE WHEN var > 0 THEN (CAST(cnt AS DOUBLE) - m) / sqrt(var)
      |       ELSE 0.0 END AS z,
      |  CAST(CASE WHEN var > 0 THEN
      |         CASE WHEN abs((CAST(cnt AS DOUBLE) - m) / sqrt(var)) > 2.0
      |              THEN 1 ELSE 0 END
      |       ELSE CASE WHEN CAST(cnt AS DOUBLE) <> m THEN 1 ELSE 0 END
      |  END AS BIGINT) AS anomaly
      |FROM v ORDER BY event_type, bucket""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.operators.Events.rateAnomalies(t("events"), "event_type", "ts_sec",
        bucketSecs = 3600L, lookback = 6, zThreshold = 2.0)
      .orderBy(col("event_type"), col("bucket"))
  }

  /** Hopping (sliding) windows via Spark's native `window(ts, len, hop)`:
    * hour-long windows every 15 min — each event lands in exactly 4
    * overlapping windows (the smoothing the reference's tumbling-only
    * time series can't express). The oracle replicates the epoch-aligned
    * window-start arithmetic with an explicit 0..3 expansion. */
  val q98HoppingWindow: (String, QueryDef) = q(
    "q98_hopping_window",
    """WITH e AS (
      |  SELECT event_type, epoch_ns(ts) // 1000000000 AS s FROM events),
      |h AS (
      |  SELECT event_type, (s // 900) * 900 - ks.k * 900 AS w_start
      |  FROM e CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) ks)
      |SELECT w_start, event_type, COUNT(*) AS cnt
      |FROM h GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin) {
    (s, dir) =>
      implicit val env: (SparkSession, String) = (s, dir)
      t("events")
        .select(col("event_type"), timestamp_seconds(col("ts_sec")).as("__ts"))
        .groupBy(window(col("__ts"), "3600 seconds", "900 seconds"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").cast("long").as("w_start"),
          col("event_type"), col("cnt"))
        .orderBy(col("w_start"), col("event_type"))
  }

  /** Explicit GROUPING SETS (completing the ROLLUP/CUBE lattice family,
    * q15/q71): the three-level {(rf,ls), (rf), ()} sets with exact
    * decimal sums; sentinel 'ALL' labels sidestep cross-engine NULL
    * ordering (the q15 convention). */
  val q99GroupingSets: (String, QueryDef) = q(
    "q99_grouping_sets",
    """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
      |  COALESCE(l_linestatus, 'ALL') AS ls, COUNT(*) AS cnt,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
      |  (l_returnflag), ())
      |ORDER BY rf, ls""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    t("lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"),
        call_function("graft_dsum", col("l_quantity"), lit(4)).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("cnt"), col("sum_qty"))
      .orderBy(col("rf"), col("ls"))
  }

  /** The dedup funnel — the headline corpus-curation report: raw docs →
    * unique content (exact) → near-dup pairs (MinHash-LSH + exact Jaccard
    * ≥ 0.6) → docs surviving single-pass near-dedup. Every stage is the
    * production operator; the oracle rebuilds the identical funnel from
    * the proven q35-q37 CTE family. */
  val q100DedupFunnel: (String, QueryDef) = q(
    "q100_dedup_funnel",
    s"""WITH ${Queries8.pairsSql},
       |shset AS (SELECT doc_id, list_distinct(sh) AS shd FROM s),
       |verified AS (
       |  SELECT d1, d2 FROM pairs
       |  JOIN shset x ON x.doc_id = d1 JOIN shset y ON y.doc_id = d2
       |  WHERE CAST(len(list_intersect(x.shd, y.shd)) AS DOUBLE) /
       |    len(list_distinct(list_concat(x.shd, y.shd))) >= 0.6)
       |SELECT 'a_raw_docs' AS stage, COUNT(*) AS value FROM documents
       |UNION ALL
       |SELECT 'b_unique_content', COUNT(DISTINCT md5(text)) FROM documents
       |UNION ALL
       |SELECT 'c_near_dup_pairs', COUNT(*) FROM verified
       |UNION ALL
       |SELECT 'd_after_near_dedup',
       |  (SELECT COUNT(*) FROM documents) -
       |  (SELECT COUNT(DISTINCT d2) FROM verified)
       |ORDER BY stage""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val docs = t("documents")
    val verified = Dedup.jaccardVerify(docs,
      Dedup.lshCandidates(Dedup.minhashBands(docs, "doc_id", "text"), "doc_id"),
      "doc_id", "text", threshold = 0.6)
    def row(stage: String, df: DataFrame): DataFrame =
      df.select(lit(stage).as("stage"), col("value"))
    row("a_raw_docs", docs.agg(count(lit(1)).as("value")))
      .unionByName(row("b_unique_content",
        Dedup.exactDedup(docs, "doc_id", "text").agg(count(lit(1)).as("value"))))
      .unionByName(row("c_near_dup_pairs",
        verified.agg(count(lit(1)).as("value"))))
      .unionByName(row("d_after_near_dedup",
        Dedup.nearDedup(docs, "doc_id", "text", threshold = 0.6)
          .agg(count(lit(1)).as("value"))))
      .orderBy(col("stage"))
  }

  /** Sliding-window RAG chunking ([[TextAnalysis.chunkForRag]]): 32-token
    * windows advancing 24 (8-token overlap), byte-for-byte chunk text. */
  val q101RagChunks: (String, QueryDef) = q(
    "q101_rag_chunks",
    """WITH w AS (
      |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |c AS (
      |  SELECT doc_id, t.k AS chunk_idx,
      |    tk[t.k * 24 + 1 : t.k * 24 + 32] AS ctk
      |  FROM w, UNNEST(generate_series(0, GREATEST(0,
      |    CAST(ceil((len(tk) - 32) / 24.0) AS INT)))) AS t(k))
      |SELECT doc_id, chunk_idx, array_to_string(ctk, ' ') AS chunk_text,
      |  CAST(len(ctk) AS BIGINT) AS n_tokens
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    TextAnalysis.chunkForRag(t("documents"), "doc_id", "text",
        size = 32, overlap = 8)
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** One-scan Pearson correlation MATRIX
    * ([[graft.core.Stats.pearsonMatrix]]): all pairwise moments of three
    * lineitem measures in a single aggregation, exact int128 sums. */
  val q102CorrMatrix: (String, QueryDef) = q(
    "q102_corr_matrix",
    """WITH m AS (
      |  SELECT COUNT(*) AS n,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS s_q,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS s_e,
      |    CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) AS s_d,
      |    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,12))) AS DOUBLE) AS ss_q,
      |    CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,12))) AS DOUBLE) AS ss_e,
      |    CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(38,12))) AS DOUBLE) AS ss_d,
      |    CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,12))) AS DOUBLE) AS sp_qe,
      |    CAST(SUM(CAST(l_quantity * l_discount AS DECIMAL(38,12))) AS DOUBLE) AS sp_qd,
      |    CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,12))) AS DOUBLE) AS sp_ed
      |  FROM lineitem
      |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
      |    AND l_discount IS NOT NULL)
      |SELECT x, y, ROUND((n * sp - sx * sy) /
      |  (SQRT(n * ssx - sx * sx) * SQRT(n * ssy - sy * sy)), 6) AS corr_xy
      |FROM (
      |  SELECT 'l_quantity' AS x, 'l_extendedprice' AS y,
      |    sp_qe AS sp, s_q AS sx, s_e AS sy, ss_q AS ssx, ss_e AS ssy, n FROM m
      |  UNION ALL SELECT 'l_quantity', 'l_discount',
      |    sp_qd, s_q, s_d, ss_q, ss_d, n FROM m
      |  UNION ALL SELECT 'l_extendedprice', 'l_discount',
      |    sp_ed, s_e, s_d, ss_e, ss_d, n FROM m)
      |ORDER BY x, y""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.core.Stats.pearsonMatrix(t("lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount"))
      .orderBy(col("x"), col("y"))
  }

  /** Exact weighted median per group
    * ([[graft.core.Stats.groupedWeightedMedian]]): quantity-weighted
    * lower median of extended price per return flag. */
  val q103WeightedMedian: (String, QueryDef) = q(
    "q103_weighted_median",
    """WITH g AS (
      |  SELECT l_returnflag, l_extendedprice,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1, 2),
      |cum AS (
      |  SELECT l_returnflag, l_extendedprice, c,
      |    SUM(c) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm,
      |    SUM(c) OVER (PARTITION BY l_returnflag) AS n
      |  FROM g)
      |SELECT l_returnflag, CAST(MAX(n) AS BIGINT) AS total_weight,
      |  MIN(l_extendedprice) AS median
      |FROM cum WHERE cm * 2 >= n GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.core.Stats.groupedWeightedMedian(t("lineitem"), "l_returnflag",
        "l_extendedprice", "l_quantity", distributedCum = Some(false))
      .orderBy(col("l_returnflag"))
  }

  /** Period-over-period deltas: daily per-type counts with the previous
    * period's count and the relative change — lag over the bucket axis
    * (thousands of rows, not events); change is one IEEE division. */
  val q104PeriodDelta: (String, QueryDef) = q(
    "q104_period_delta",
    """WITH c AS (
      |  SELECT event_type,
      |    ((epoch_ns(ts) // 1000000000) // 86400) * 86400 AS bucket,
      |    COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |l AS (
      |  SELECT event_type, bucket, cnt,
      |    LAG(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS prev
      |  FROM c)
      |SELECT event_type, bucket, cnt, prev,
      |  (CAST(cnt AS DOUBLE) - prev) / prev AS rel_change
      |FROM l WHERE prev IS NOT NULL
      |ORDER BY event_type, bucket""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("bucket"))
    t("events")
      .select(col("event_type"),
        (expr("cast(ts_sec as bigint) div 86400") * 86400).as("bucket"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("prev", lag(col("cnt"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("event_type"), col("bucket"), col("cnt"), col("prev"),
        ((col("cnt").cast("double") - col("prev")) / col("prev"))
          .as("rel_change"))
      .orderBy(col("event_type"), col("bucket"))
  }

  /** Product-quantization ANN ([[Similarity.pqTopK]]): seeded per-subspace
    * codebooks, 8-code encoding, ADC lookup-table scoring, exact-cosine
    * rerank — encode→LUT→ADC→rerank ALL replicated in the oracle (dynamic
    * subspace slicing via a lateral series, ordered list folds for the
    * fixed-order ADC sum), so the whole PQ pipeline is hash-checked. */
  val q105PqAnn: (String, QueryDef) = q(
    "q105_pq_ann", {
      def dotSub(a: String, b: String): String =
        s"list_reduce(list_transform(generate_series(1, 8), i -> " +
          s"CAST($a[ss.s * 8 + i] AS DOUBLE) * CAST($b[ss.s * 8 + i] AS DOUBLE)), " +
          s"(x, y) -> x + y)"
      def dotFull(a: String, b: String): String =
        s"list_reduce(list_transform(generate_series(1, 64), i -> " +
          s"CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"
      s"""WITH ss AS (SELECT unnest(generate_series(0, 7)) AS s),
         |cd AS (
         |  SELECT e.vec_id, ss.s, c.vec_id AS cid,
         |    ${dotSub("e.embedding", "c.embedding")} AS d
         |  FROM embeddings e CROSS JOIN ss
         |  JOIN embeddings c ON c.vec_id < 16),
         |codes AS (
         |  SELECT vec_id, s, cid AS code FROM (
         |    SELECT vec_id, s, cid,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d DESC, cid) AS rk
         |    FROM cd) WHERE rk = 1),
         |lut AS (
         |  SELECT q.vec_id AS qid, ss.s, c.vec_id AS cid,
         |    ${dotSub("q.embedding", "c.embedding")} AS val
         |  FROM embeddings q CROSS JOIN ss
         |  JOIN embeddings c ON c.vec_id < 16
         |  WHERE q.vec_id BETWEEN 100 AND 103),
         |adc AS (
         |  SELECT l.qid, co.vec_id,
         |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |      list(l.val ORDER BY l.s)), (x, y) -> x + y) AS adc
         |  FROM codes co JOIN lut l ON l.s = co.s AND l.cid = co.code
         |  WHERE co.vec_id <> l.qid
         |  GROUP BY l.qid, co.vec_id),
         |cands AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT qid, vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc DESC, vec_id) AS rk
         |    FROM adc) WHERE rk <= 50),
         |scored AS (
         |  SELECT ca.qid, ca.vec_id,
         |    ${dotFull("e.embedding", "qe.embedding")} /
         |    (SQRT(${dotFull("e.embedding", "e.embedding")}) *
         |     SQRT(${dotFull("qe.embedding", "qe.embedding")})) AS sim
         |  FROM cands ca
         |  JOIN embeddings e ON e.vec_id = ca.vec_id
         |  JOIN embeddings qe ON qe.vec_id = ca.qid)
         |SELECT qid, vec_id, sim FROM (
         |  SELECT qid, vec_id, sim,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rk
         |  FROM scored) WHERE rk <= 10
         |ORDER BY qid, sim DESC, vec_id""".stripMargin
    }) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    Similarity.pqTopK(t("embeddings"), "vec_id", "embedding",
        queryIds = (100L to 103L), kNN = 10, m = 8, k = 16, rerank = 50)
      .orderBy(col("qid"), col("sim").desc, col("vec_id"))
  }

  /** IVF + PQ composed ([[Similarity.ivfPqTopK]]) — the production ANN
    * serving stack: coarse probes bound the candidate set, PQ codes bound
    * bytes per candidate, ADC scores, exact cosine reranks. The oracle
    * chains q52's probe CTEs with q105's code/LUT CTEs — every stage of
    * the composition is hash-checked end-to-end. */
  val q106IvfPq: (String, QueryDef) = q(
    "q106_ivf_pq", {
      def dotSub(a: String, b: String): String =
        s"list_reduce(list_transform(generate_series(1, 8), i -> " +
          s"CAST($a[ss.s * 8 + i] AS DOUBLE) * CAST($b[ss.s * 8 + i] AS DOUBLE)), " +
          s"(x, y) -> x + y)"
      def dotFull(a: String, b: String): String =
        s"list_reduce(list_transform(generate_series(1, 64), i -> " +
          s"CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"
      s"""WITH ss AS (SELECT unnest(generate_series(0, 7)) AS s),
         |cents AS (
         |  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 16),
         |sims AS (
         |  SELECT e.vec_id, c.cid, ${dotFull("e.embedding", "c.cv")} AS sim
         |  FROM embeddings e CROSS JOIN cents c),
         |assigned AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rk
         |    FROM sims) WHERE rk = 1),
         |probes AS (
         |  SELECT vec_id AS qid, cid FROM (
         |    SELECT vec_id, cid,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rk
         |    FROM sims WHERE vec_id BETWEEN 100 AND 103) WHERE rk <= 4),
         |cd AS (
         |  SELECT e.vec_id, ss.s, c.vec_id AS cid,
         |    ${dotSub("e.embedding", "c.embedding")} AS d
         |  FROM embeddings e CROSS JOIN ss
         |  JOIN embeddings c ON c.vec_id < 16),
         |codes AS (
         |  SELECT vec_id, s, cid AS code FROM (
         |    SELECT vec_id, s, cid,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d DESC, cid) AS rk
         |    FROM cd) WHERE rk = 1),
         |lut AS (
         |  SELECT q.vec_id AS qid, ss.s, c.vec_id AS cid,
         |    ${dotSub("q.embedding", "c.embedding")} AS val
         |  FROM embeddings q CROSS JOIN ss
         |  JOIN embeddings c ON c.vec_id < 16
         |  WHERE q.vec_id BETWEEN 100 AND 103),
         |adc AS (
         |  SELECT l.qid, co.vec_id,
         |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |      list(l.val ORDER BY l.s)), (x, y) -> x + y) AS adc
         |  FROM codes co
         |  JOIN lut l ON l.s = co.s AND l.cid = co.code
         |  JOIN assigned a ON a.vec_id = co.vec_id
         |  JOIN probes p ON p.qid = l.qid AND p.cid = a.cid
         |  WHERE co.vec_id <> l.qid
         |  GROUP BY l.qid, co.vec_id),
         |cands AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT qid, vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc DESC, vec_id) AS rk
         |    FROM adc) WHERE rk <= 50),
         |scored AS (
         |  SELECT ca.qid, ca.vec_id,
         |    ${dotFull("e.embedding", "qe.embedding")} /
         |    (SQRT(${dotFull("e.embedding", "e.embedding")}) *
         |     SQRT(${dotFull("qe.embedding", "qe.embedding")})) AS sim
         |  FROM cands ca
         |  JOIN embeddings e ON e.vec_id = ca.vec_id
         |  JOIN embeddings qe ON qe.vec_id = ca.qid)
         |SELECT qid, vec_id, sim FROM (
         |  SELECT qid, vec_id, sim,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rk
         |  FROM scored) WHERE rk <= 10
         |ORDER BY qid, sim DESC, vec_id""".stripMargin
    }) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    Similarity.ivfPqTopK(t("embeddings"), "vec_id", "embedding",
        queryIds = (100L to 103L), kNN = 10, nClusters = 16, nProbe = 4,
        m = 8, k = 16, rerank = 50)
      .orderBy(col("qid"), col("sim").desc, col("vec_id"))
  }

  val catalog: Seq[(String, QueryDef)] = Seq(
    q85SetSimJoin, q86Zorder, q87CharEntropy, q88SemanticDedup, q89HeavyHitters,
    q90CumulativeDistinct, q91CohortRetention, q92KeySkew, q93Attribution,
    q94AudioMeta, q95ImageDims, q96VideoMeta, q97RateAnomaly, q98HoppingWindow,
    q99GroupingSets, q100DedupFunnel, q101RagChunks, q102CorrMatrix,
    q103WeightedMedian, q104PeriodDelta, q105PqAnn, q106IvfPq)
}

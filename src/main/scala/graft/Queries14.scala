package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Stats, Tables}
import graft.operators.{Dedup, Sampling}

/** Catalog entries: round-9 additions — substring-window dedup coverage,
  * temperature-scaled source mixture weights, two-period distribution
  * drift.
  */
object Queries14 {

  private def t(name: String)(implicit env: (SparkSession, String)): DataFrame =
    if (name == "events") Tables.events(env._1, env._2)
    else Tables.load(env._1, env._2, name)

  private def q(name: String, sql: String = null)(
      body: (SparkSession, String) => DataFrame): (String, QueryDef) =
    name -> QueryDef(body, Option(sql))

  /** Substring-window dedup coverage ([[Dedup.windowDedup]]): per source,
    * how much of the corpus is covered by 8-token windows that occur more
    * than once anywhere, thinned 2× by the content-defined (winnowing)
    * sampler. The oracle replays the identical window walk in SQL — same
    * positions (`generate_series` and `sequence` are both inclusive),
    * same 1-based k-element list slices, same md5, same first-hex-digit
    * selection — so the duplicate verdicts match hash-for-hash; the only
    * floating-point output is one exact-integer division per source. */
  val q129WindowDedup: (String, QueryDef) = q(
    "q129_window_dedup",
    """WITH d AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS tk
      |  FROM documents),
      |w AS (
      |  SELECT doc_id, h FROM (
      |    SELECT doc_id,
      |      md5(array_to_string(tk[p + 1 : p + 8], ' ')) AS h
      |    FROM (SELECT doc_id,
      |            unnest(generate_series(0, len(tk) - 8, 1)) AS p, tk
      |          FROM d WHERE len(tk) >= 8))
      |  WHERE (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) % 2 = 0),
      |c AS (SELECT h, COUNT(*) AS c FROM w GROUP BY h),
      |pd AS (
      |  SELECT w.doc_id, COUNT(*) AS n_windows,
      |    CAST(SUM(CASE WHEN c.c > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_dup_windows
      |  FROM w JOIN c USING (h) GROUP BY w.doc_id)
      |SELECT d.source,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(COALESCE(SUM(pd.n_windows), 0) AS BIGINT) AS n_windows,
      |  CAST(COALESCE(SUM(pd.n_dup_windows), 0) AS BIGINT) AS n_dup_windows,
      |  CASE WHEN COALESCE(SUM(pd.n_windows), 0) > 0
      |    THEN CAST(SUM(pd.n_dup_windows) AS DOUBLE) / SUM(pd.n_windows)
      |    ELSE 0.0 END AS dup_frac
      |FROM d LEFT JOIN pd USING (doc_id)
      |GROUP BY d.source ORDER BY d.source""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val perDoc = Dedup.windowDedup(t("documents"), "doc_id", "text",
      windowTokens = 8, sampleMod = 2, keepCols = Seq("source"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_windows")).as("n_windows"),
        sum(col("n_dup_windows")).as("n_dup_windows"))
      .withColumn("dup_frac",
        when(col("n_windows") > 0,
          col("n_dup_windows").cast("double") / col("n_windows"))
          .otherwise(lit(0.0)))
      .orderBy(col("source"))
  }

  /** Temperature-scaled mixture weights ([[Sampling.mixtureWeights]]):
    * per-source α = ¾ sampling weights over whitespace-token totals and
    * their shares of a 1M-token budget. The oracle mirrors the exact
    * float composition — `SQRT(SQRT(x)) * SQRT(x)` (each op correctly
    * rounded, hence bit-identical cross-engine; `POWER(x, 0.75)` would
    * not be), DECIMAL-accumulated denominator, division-then-multiply
    * order pinned by parentheses. */
  val q130MixtureWeights: (String, QueryDef) = q(
    "q130_mixture_weights",
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
      |  FROM w)
      |SELECT source, n_docs, tokens,
      |  (wr / den) AS weight,
      |  CAST(FLOOR((wr / den) * 1000000.0) AS BIGINT) AS target_tokens
      |FROM w CROSS JOIN d ORDER BY source""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    Sampling.mixtureWeights(t("documents"), "source",
        size(split(col("text"), " ")), budgetTokens = 1000000L,
        temperatureQuarters = 3)
      .orderBy(col("source"))
  }

  /** Two-period distribution drift ([[Stats.driftReport]]): the `events`
    * value distribution, first half of the time range vs second, on one
    * 20-bin global grid, with the total-variation distance as a constant
    * column. The oracle pins the identical float compositions: the same
    * `((v - vmin) / (vmax - vmin)) * 20` bin walk, exact-integer share
    * divisions, and a DECIMAL-accumulated TVD (PSI's `ln` is deliberately
    * absent — not ULP-stable across engines). */
  val q131DriftReport: (String, QueryDef) = q(
    "q131_drift_report",
    """WITH e AS (
      |  SELECT epoch_ns(ts) // 1000000000 AS t, value AS v FROM events),
      |st AS (
      |  SELECT MIN(t) AS tmin, MAX(t) AS tmax,
      |         MIN(v) AS vmin, MAX(v) AS vmax FROM e),
      |b AS (
      |  SELECT CASE WHEN t < (tmin + tmax) // 2 THEN 'a' ELSE 'b' END AS p,
      |    CASE WHEN vmax = vmin THEN 0
      |      ELSE LEAST(CAST(19 AS BIGINT),
      |        CAST(FLOOR(((v - vmin) / (vmax - vmin)) * 20.0) AS BIGINT))
      |    END AS bin
      |  FROM e CROSS JOIN st),
      |g AS (
      |  SELECT bin,
      |    CAST(SUM(CASE WHEN p = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
      |    CAST(SUM(CASE WHEN p = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
      |  FROM b GROUP BY bin),
      |tot AS (
      |  SELECT CAST(SUM(cnt_a) AS BIGINT) AS ta,
      |         CAST(SUM(cnt_b) AS BIGINT) AS tb FROM g),
      |fr AS (
      |  SELECT bin, cnt_a, cnt_b,
      |    CASE WHEN ta > 0 THEN CAST(cnt_a AS DOUBLE) / ta ELSE 0.0 END
      |      AS frac_a,
      |    CASE WHEN tb > 0 THEN CAST(cnt_b AS DOUBLE) / tb ELSE 0.0 END
      |      AS frac_b
      |  FROM g CROSS JOIN tot),
      |f2 AS (SELECT *, ABS(frac_a - frac_b) AS abs_diff FROM fr),
      |tvd AS (
      |  SELECT CASE WHEN MAX(ta) > 0 AND MAX(tb) > 0 THEN
      |      ((CAST(SUM(ABS(CAST(cnt_a AS HUGEINT) * tb -
      |                     CAST(cnt_b AS HUGEINT) * ta)) AS DOUBLE)
      |        / MAX(ta)) / MAX(tb)) * 0.5
      |    ELSE 0.5 END AS tvd
      |  FROM g CROSS JOIN tot)
      |SELECT bin, cnt_a, cnt_b, frac_a, frac_b, abs_diff, tvd
      |FROM f2 CROSS JOIN tvd ORDER BY bin""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    Stats.driftReport(t("events"), "value", "ts_sec", bins = 20)
  }

  /** Mixture DRAW ([[Sampling.mixtureWeights]] composed with the
    * [[Sampling.hashBucket]] membership predicate): q130's α = ¾ weights
    * become per-source basis-point keep thresholds
    * (`⌊(target/tokens)·10⁴⌋`, capped at 100%), the sample is drawn by
    * the engine-portable md5 bucket, and the Horvitz-Thompson token
    * estimate lands next to the target — the end-to-end "compute the
    * mixture, then actually draw it" pipeline with its own calibration
    * readout. Every float step is the q130/q127 composition already
    * proven bit-stable (sqrt-composed power, DECIMAL denominator, pinned
    * multiply/divide order, exact-int HT scaling). */
  val q132MixtureDraw: (String, QueryDef) = q(
    "q132_mixture_draw",
    """WITH g AS (
      |  SELECT source,
      |    CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT)
      |      AS tokens
      |  FROM documents GROUP BY source),
      |w AS (
      |  SELECT *, SQRT(SQRT(CAST(tokens AS DOUBLE))) *
      |    SQRT(CAST(tokens AS DOUBLE)) AS wr FROM g),
      |d AS (
      |  SELECT CAST(SUM(CAST(CAST(wr AS VARCHAR) AS DECIMAL(38,9))) AS DOUBLE) AS den
      |  FROM w),
      |th AS (
      |  SELECT source,
      |    CAST(FLOOR((wr / den) * 10000.0) AS BIGINT) AS target_tokens,
      |    LEAST(CAST(10000 AS BIGINT),
      |      CAST(FLOOR((((wr / den) * 10000.0) / CAST(tokens AS DOUBLE))
      |        * 10000.0) AS BIGINT)) AS bp
      |  FROM w CROSS JOIN d),
      |s AS (
      |  SELECT d2.source, th.bp, th.target_tokens,
      |    CAST(len(string_split(d2.text, ' ')) AS BIGINT) AS tok,
      |    CAST('0x' || substring(md5('mix2' || CAST(d2.doc_id AS VARCHAR)),
      |      1, 8) AS BIGINT) % 10000 AS bucket
      |  FROM documents d2 JOIN th ON d2.source = th.source)
      |SELECT source, MAX(bp) AS bp, MAX(target_tokens) AS target_tokens,
      |  CAST(SUM(CASE WHEN bucket < bp THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_sampled,
      |  CAST(SUM(CASE WHEN bucket < bp THEN tok ELSE 0 END) AS BIGINT)
      |    AS sampled_tokens,
      |  CASE WHEN MAX(bp) > 0 THEN
      |    (CAST(SUM(CASE WHEN bucket < bp THEN tok ELSE 0 END) AS DOUBLE)
      |      * 10000.0) / MAX(bp)
      |  ELSE 0.0 END AS est_tokens
      |FROM s GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val docs = t("documents")
    val budget = 10000L
    val mw = Sampling.mixtureWeights(docs, "source",
      size(split(col("text"), " ")), budget, temperatureQuarters = 3)
    val th = mw.select(col("source"), col("target_tokens"),
      least(lit(10000L),
        floor(((col("weight") * lit(budget.toDouble)) /
          col("tokens").cast("double")) * lit(10000.0)).cast("long"))
        .as("bp"))
    docs.select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("tok"))
      .join(broadcast(th), "source")
      .withColumn("bucket", Sampling.hashBucket(col("doc_id"), "mix2"))
      .groupBy(col("source"))
      .agg(max(col("bp")).as("bp"),
        max(col("target_tokens")).as("target_tokens"),
        sum(when(col("bucket") < col("bp"), 1L).otherwise(0L))
          .as("n_sampled"),
        sum(when(col("bucket") < col("bp"), col("tok")).otherwise(0L))
          .as("sampled_tokens"))
      .withColumn("est_tokens",
        when(col("bp") > 0,
          (col("sampled_tokens").cast("double") * lit(10000.0)) / col("bp"))
          .otherwise(lit(0.0)))
      .orderBy(col("source"))
  }

  /** Split-leakage AUDIT ([[Sampling.splitLeakageAudit]]): near-dup pairs
    * (the proven q35-q37 LSH candidate CTE, confirmed at exact shingle
    * Jaccard ≥ 0.6) that straddle two splits of a NAIVE id-hash
    * assignment — the baseline hygiene failure that q116's content keys
    * and q121's cluster keys exist to prevent (their own leakage is zero
    * by construction; spec-asserted). Jaccard is a ratio of the same two
    * ints on both engines, so the ≥ 0.6 verdicts — and the audit rows —
    * match exactly. */
  val q133SplitLeakage: (String, QueryDef) = q(
    "q133_split_leakage",
    s"""WITH ${Queries8.pairsSql},
       |shs AS (SELECT doc_id, list_distinct(sh) AS sh FROM s),
       |v AS (
       |  SELECT p.d1, p.d2
       |  FROM pairs p JOIN shs x ON p.d1 = x.doc_id
       |    JOIN shs y ON p.d2 = y.doc_id
       |  WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) /
       |    len(list_distinct(list_concat(x.sh, y.sh))) >= 0.6),
       |sp AS (
       |  SELECT doc_id,
       |    CASE WHEN CAST('0x' || substring(md5('naive:' ||
       |        CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 80
       |      THEN 'train'
       |    WHEN CAST('0x' || substring(md5('naive:' ||
       |        CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 90
       |      THEN 'val'
       |    ELSE 'test' END AS split
       |  FROM documents),
       |x AS (
       |  SELECT LEAST(a.split, b.split) AS split_a,
       |    GREATEST(a.split, b.split) AS split_b, v.d1, v.d2
       |  FROM v JOIN sp a ON v.d1 = a.doc_id JOIN sp b ON v.d2 = b.doc_id
       |  WHERE a.split <> b.split),
       |e AS (SELECT split_a, split_b, unnest([d1, d2]) AS doc FROM x)
       |SELECT split_a, split_b,
       |  CAST(COUNT(*) / 2 AS BIGINT) AS n_pairs,
       |  CAST(COUNT(DISTINCT doc) AS BIGINT) AS n_docs
       |FROM e GROUP BY split_a, split_b
       |ORDER BY split_a, split_b""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val docs = t("documents")
    val splits = docs.select(col("doc_id"),
      Sampling.pctSplit(col("doc_id").cast("string"), "naive", 80, 10)
        .as("split"))
    Sampling.splitLeakageAudit(docs, "doc_id", "text", splits)
      .orderBy(col("split_a"), col("split_b"))
  }

  /** Per-source Gini concentration of document length
    * ([[Stats.groupedGini]]): the corpus-balance readout next to q130's
    * mixture weights. The oracle replays the identical pairwise-difference
    * identity over the same distinct-value window — every intermediate is
    * exact integer (HUGEINT vs decimal(38,0)); the one float step is the
    * final division of the two exact integers, correctly rounded on both
    * engines. */
  val q134Gini: (String, QueryDef) = q(
    "q134_gini",
    """WITH g AS (
      |  SELECT source, n_chars AS v, CAST(COUNT(*) AS HUGEINT) AS c
      |  FROM documents GROUP BY source, n_chars),
      |cum AS (
      |  SELECT source, v, c,
      |    SUM(c) OVER w - c AS nlt,
      |    SUM(c * v) OVER w - c * v AS slt,
      |    SUM(c) OVER (PARTITION BY source) AS n,
      |    SUM(c * v) OVER (PARTITION BY source) AS s
      |  FROM g
      |  WINDOW w AS (PARTITION BY source ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT source,
      |  CAST(MAX(n) AS BIGINT) AS n,
      |  CAST(MAX(s) AS BIGINT) AS total,
      |  CASE WHEN MAX(n) > 1 AND MAX(s) > 0 THEN
      |    CAST(SUM(c * (v * nlt - slt)) AS DOUBLE) /
      |      CAST(MAX(n) * MAX(s) AS DOUBLE)
      |  ELSE 0.0 END AS gini
      |FROM cum GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    Stats.groupedGini(t("documents"), "source", "n_chars",
        distributedCum = Some(false))
      .orderBy(col("source"))
  }

  /** Exact two-sample Kolmogorov–Smirnov drift per event type
    * ([[Stats.ksDrift]]): the bin-free companion to q131's gridded TVD,
    * over the same early/late midpoint split. The sup CDF gap is attained
    * at a data value, so the oracle replays the identical distinct-value
    * window; the max numerator `|cumA·n_b − cumB·n_a|` is exact integer
    * on both engines (HUGEINT vs decimal(38,0)), divided once. */
  val q135KsDrift: (String, QueryDef) = q(
    "q135_ks_drift",
    """WITH ev AS (
      |  SELECT event_type, value,
      |    epoch_ns(ts) // 1000000000 AS ts_sec
      |  FROM events WHERE value IS NOT NULL),
      |st AS (SELECT (MIN(ts_sec) + MAX(ts_sec)) // 2 AS mid FROM ev),
      |e AS (
      |  SELECT event_type, value AS v,
      |    CASE WHEN ts_sec < mid THEN 1 ELSE 0 END AS ia
      |  FROM ev CROSS JOIN st),
      |r AS (
      |  SELECT event_type, v,
      |    CAST(SUM(ia) AS HUGEINT) AS ca,
      |    CAST(SUM(1 - ia) AS HUGEINT) AS cb
      |  FROM e GROUP BY event_type, v),
      |cum AS (
      |  SELECT event_type, v,
      |    SUM(ca) OVER w AS cca, SUM(cb) OVER w AS ccb,
      |    SUM(ca) OVER (PARTITION BY event_type) AS na,
      |    SUM(cb) OVER (PARTITION BY event_type) AS nb
      |  FROM r
      |  WINDOW w AS (PARTITION BY event_type ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT event_type,
      |  CAST(MAX(na) AS BIGINT) AS n_a,
      |  CAST(MAX(nb) AS BIGINT) AS n_b,
      |  CASE WHEN MAX(na) > 0 AND MAX(nb) > 0 THEN
      |    CAST(MAX(ABS(cca * nb - ccb * na)) AS DOUBLE) /
      |      CAST(MAX(na) * MAX(nb) AS DOUBLE)
      |  ELSE 1.0 END AS ks
      |FROM cum GROUP BY event_type ORDER BY event_type""".stripMargin) {
    (s, dir) =>
      implicit val env: (SparkSession, String) = (s, dir)
      Stats.ksDrift(t("events"), "event_type", "value", "ts_sec",
          distributedCum = Some(false))
        .orderBy(col("event_type"))
  }

  /** Embedding-centroid drift per label
    * ([[graft.operators.Similarity.embeddingDrift]]): cosine between each
    * label's early-half and late-half centroid sum-vectors. The oracle
    * mirrors the float discipline step for step — exact micro-unit
    * component sums (`⌊x·10⁶⌋`, floor being convention-free where
    * double→DECIMAL rounding is not), one cast to double per
    * (label, dim), then q33's proven left-fold list arithmetic for dot
    * and norms. */
  val q136EmbeddingDrift: (String, QueryDef) = q(
    "q136_embedding_drift",
    """WITH st AS (
      |  SELECT (MIN(vec_id) + MAX(vec_id)) // 2 AS mid FROM embeddings),
      |b AS (
      |  SELECT label, CASE WHEN vec_id < mid THEN 1 ELSE 0 END AS ia,
      |    embedding
      |  FROM embeddings CROSS JOIN st),
      |n AS (
      |  SELECT label, CAST(SUM(ia) AS BIGINT) AS n_a,
      |    CAST(SUM(1 - ia) AS BIGINT) AS n_b
      |  FROM b GROUP BY label),
      |e AS (
      |  SELECT label, ia, dim,
      |    CAST(embedding[dim] AS DOUBLE) AS x
      |  FROM (SELECT label, ia,
      |          unnest(generate_series(1, len(embedding))) AS dim, embedding
      |        FROM b)),
      |s AS (
      |  SELECT label, dim,
      |    CAST(SUM(CASE WHEN ia = 1
      |      THEN CAST(FLOOR(x * 1000000.0) AS HUGEINT)
      |      ELSE CAST(0 AS HUGEINT) END) AS DOUBLE) AS sa,
      |    CAST(SUM(CASE WHEN ia = 0
      |      THEN CAST(FLOOR(x * 1000000.0) AS HUGEINT)
      |      ELSE CAST(0 AS HUGEINT) END) AS DOUBLE) AS sb
      |  FROM e GROUP BY label, dim),
      |v AS (
      |  SELECT label, list(sa ORDER BY dim) AS va, list(sb ORDER BY dim) AS vb
      |  FROM s GROUP BY label),
      |d AS (
      |  SELECT label,
      |    list_reduce(list_transform(generate_series(1, len(va)),
      |      i -> va[i] * vb[i]), (x, y) -> x + y) AS dot,
      |    list_reduce(list_transform(va, x -> x * x), (x, y) -> x + y) AS na2,
      |    list_reduce(list_transform(vb, x -> x * x), (x, y) -> x + y) AS nb2
      |  FROM v)
      |SELECT d.label, n.n_a, n.n_b,
      |  CASE WHEN n.n_a > 0 AND n.n_b > 0 AND d.na2 > 0 AND d.nb2 > 0
      |    THEN d.dot / (SQRT(d.na2) * SQRT(d.nb2))
      |    ELSE NULL END AS centroid_cos
      |FROM d JOIN n USING (label) ORDER BY label""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.operators.Similarity.embeddingDrift(
        t("embeddings"), "vec_id", "embedding", "label")
      .orderBy(col("label"))
  }

  /** Image resize-to-fit ([[graft.operators.Multimodal.resizeImages]]):
    * the q95 synthesized payloads squeezed into a 256 px box. The ENGINE
    * does the full binary round-trip — synthesize header → parse dims →
    * integer scale → re-synthesize → re-parse the RESIZED payload for
    * the output dims; the oracle computes the same integer dimension
    * math from the q95 dim formulas (floor of an exact double ratio,
    * identical on both engines). */
  val q137ImageResize: (String, QueryDef) = q(
    "q137_image_resize",
    """WITH d AS (
      |  SELECT doc_id,
      |    CAST(100 + doc_id % 512 AS BIGINT) AS w,
      |    CAST(100 + (doc_id * 7) % 512 AS BIGINT) AS h
      |  FROM documents WHERE doc_id < 200),
      |r AS (
      |  SELECT doc_id, w, h, GREATEST(w, h) AS m,
      |    GREATEST(w, h) > 256 AS resized
      |  FROM d)
      |SELECT doc_id,
      |  CAST(CASE WHEN resized
      |    THEN GREATEST(1, CAST(FLOOR((w * 256) / CAST(m AS DOUBLE))
      |      AS BIGINT))
      |    ELSE w END AS INT) AS width,
      |  CAST(CASE WHEN resized
      |    THEN GREATEST(1, CAST(FLOOR((h * 256) / CAST(m AS DOUBLE))
      |      AS BIGINT))
      |    ELSE h END AS INT) AS height,
      |  resized
      |FROM r ORDER BY doc_id""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    import graft.operators.Multimodal
    val d = col("doc_id")
    val withPayload = t("documents").filter(d < 200)
      .select(d, Multimodal.synthPngHeader(
        lit(100L) + d % 512, lit(100L) + (d * 7) % 512).as("payload"))
    Multimodal.decodeDims(Multimodal.resizeImages(withPayload, maxDim = 256))
      .select(d, col("decoded_dims.width").as("width"),
        col("decoded_dims.height").as("height"), col("resized"))
      .orderBy(d)
  }

  /** Cross-corpus near-dup check
    * ([[graft.operators.Dedup.crossCorpusNearDups]]): odd doc_ids as the
    * incoming crawl, even doc_ids as the standing corpus — which new
    * docs near-duplicate an existing one. Reuses the proven q35-q37
    * CTE family for signatures/bands; the candidate join is new×old
    * (both orders preserved, unlike the self-join's `d1 < d2`), and the
    * Jaccard verdicts are ratios of the same two ints on both engines. */
  val q138CrossCorpus: (String, QueryDef) = q(
    "q138_cross_corpus_dups",
    s"""WITH ${Queries8.pairsSql},
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.mh = b.mh
       |  WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0),
       |shs AS (SELECT doc_id, list_distinct(sh) AS sh FROM s),
       |v AS (
       |  SELECT c.d1 AS new_id, c.d2 AS old_id,
       |    CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) /
       |      len(list_distinct(list_concat(x.sh, y.sh))) AS jaccard
       |  FROM cand c JOIN shs x ON c.d1 = x.doc_id
       |    JOIN shs y ON c.d2 = y.doc_id)
       |SELECT new_id, old_id, jaccard FROM v WHERE jaccard >= 0.6
       |ORDER BY new_id, old_id""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val docs = t("documents")
    Dedup.crossCorpusNearDups(
        docs.filter(col("doc_id") % 2 === 1),
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
      .orderBy(col("new_id"), col("old_id"))
  }

  val catalog: Seq[(String, QueryDef)] =
    Seq(q129WindowDedup, q130MixtureWeights, q131DriftReport, q132MixtureDraw,
      q133SplitLeakage, q134Gini, q135KsDrift, q136EmbeddingDrift,
      q137ImageResize, q138CrossCorpus)
}

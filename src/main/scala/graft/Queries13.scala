package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Stats, Tables}
import graft.operators.{Dedup, Joins, TextAnalysis}

/** Catalog entries: round-8 additions — skew-salted join, BM25 ranking,
  * inverted index, MAD outlier report, sorted-neighborhood dedup (over the
  * distributed two-phase rank), MinHash estimator calibration.
  */
object Queries13 {

  private def t(name: String)(implicit env: (SparkSession, String)): DataFrame =
    if (name == "events") Tables.events(env._1, env._2)
    else Tables.load(env._1, env._2, name)

  private def q(name: String, sql: String = null)(
      body: (SparkSession, String) => DataFrame): (String, QueryDef) =
    name -> QueryDef(body, Option(sql))

  private def dsumSql(e: String, scale: Int = 4): String =
    s"CAST(SUM(CAST($e AS DECIMAL(38,$scale))) AS DOUBLE)"

  /** Skew-salted fact⋈dim join ([[Joins.saltedJoin]]): revenue per order
    * priority through an 8-way salted join of lineitem against orders.
    * The oracle is the PLAIN join — salting must be invisible in the
    * result (the whole point of the escape hatch: same answer, hot keys
    * spread over `salts` tasks instead of one straggler). */
  val q107SaltedJoin: (String, QueryDef) = q(
    "q107_salted_join",
    s"""SELECT o_orderpriority,
       |${dsumSql("l_extendedprice*(1-l_discount)", 6)} AS revenue,
       |COUNT(*) AS n_items
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) {
    (s, dir) =>
      implicit val env: (SparkSession, String) = (s, dir)
      Joins.saltedJoin(t("lineitem"), t("orders"), "l_orderkey", "o_orderkey",
          salts = 8)
        .groupBy(col("o_orderpriority"))
        .agg(
          call_function("graft_dsum",
            col("l_extendedprice") * (lit(1) - col("l_discount")), lit(6))
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("o_orderpriority"))
  }

  /** BM25 relevance ranking ([[TextAnalysis.bm25]]) for a 3-term query,
    * top 20 docs. ln-based idf → rounded to 6 decimals on both sides
    * (the established convention for log-family scores, cf. q87). */
  val q108Bm25: (String, QueryDef) = q(
    "q108_bm25",
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |dl AS (SELECT doc_id, len(tk) AS dl FROM d),
      |corpus AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
      |tf AS (
      |  -- explicit JOIN, not a comma join: DuckDB's planner materialized
      |  -- the d x dl cross product before the filter at sf0.1 (a 60 GB
      |  -- spill); semantically identical
      |  SELECT d.doc_id, dl.dl, u.term, COUNT(*) AS tf
      |  FROM d JOIN dl ON d.doc_id = dl.doc_id, unnest(d.tk) AS u(term)
      |  WHERE u.term IN ('spark', 'join', 'window')
      |  GROUP BY d.doc_id, dl.dl, u.term),
      |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
      |scored AS (
      |  SELECT tf.doc_id,
      |    ln(1.0 + (c.n_docs - f.df + 0.5) / (f.df + 0.5)) *
      |      (tf.tf * 2.2) /
      |      (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / c.avgdl)) AS s
      |  FROM tf, dfreq f, corpus c WHERE tf.term = f.term)
      |SELECT doc_id, ROUND(SUM(s), 6) AS score
      |FROM scored GROUP BY doc_id
      |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    TextAnalysis.bm25(t("documents"), "doc_id", "text",
        Seq("spark", "join", "window"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
  }

  /** Inverted index head ([[TextAnalysis.invertedIndex]]): per term, df,
    * total tf, and the first 20 posting doc ids (ascending, comma-joined).
    * Top 100 terms by document frequency. */
  val q109InvertedIndex: (String, QueryDef) = q(
    "q109_inverted_index",
    """WITH tf AS (
      |  SELECT u.term, doc_id, COUNT(*) AS tf
      |  FROM documents, unnest(string_split(text, ' ')) AS u(term)
      |  GROUP BY u.term, doc_id)
      |SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf,
      |  array_to_string((list(doc_id ORDER BY doc_id))[1:20], ',') AS postings
      |FROM tf GROUP BY term HAVING COUNT(*) >= 5
      |ORDER BY df DESC, term LIMIT 100""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    TextAnalysis.invertedIndex(t("documents"), "doc_id", "text",
        minDf = 5, postingsCap = 20)
      .orderBy(col("df").desc, col("term"))
      .limit(100)
  }

  /** Robust outlier report ([[Stats.madOutliers]]): per return flag, the
    * lower median and MAD of extended price and the count of rows beyond
    * 3 MAD. Lower medians are data values — no interpolation, no
    * rounding convention needed anywhere in the query. */
  val q110MadOutliers: (String, QueryDef) = q(
    "q110_mad_outliers",
    """WITH g AS (
      |  SELECT l_returnflag AS grp, l_extendedprice AS v, COUNT(*) AS c
      |  FROM lineitem GROUP BY 1, 2),
      |cum AS (
      |  SELECT grp, v, c,
      |    SUM(c) OVER (PARTITION BY grp ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm,
      |    SUM(c) OVER (PARTITION BY grp) AS n FROM g),
      |med AS (
      |  SELECT grp, MIN(v) AS median FROM cum WHERE cm * 2 >= n GROUP BY grp),
      |dev AS (
      |  SELECT l.l_returnflag AS grp, ABS(l.l_extendedprice - m.median) AS d,
      |    m.median
      |  FROM lineitem l JOIN med m ON l.l_returnflag = m.grp),
      |gd AS (SELECT grp, d, COUNT(*) AS c FROM dev GROUP BY 1, 2),
      |cumd AS (
      |  SELECT grp, d, c,
      |    SUM(c) OVER (PARTITION BY grp ORDER BY d
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm,
      |    SUM(c) OVER (PARTITION BY grp) AS n FROM gd),
      |mad AS (SELECT grp, MIN(d) AS mad FROM cumd WHERE cm * 2 >= n GROUP BY grp)
      |SELECT dev.grp AS l_returnflag, COUNT(*) AS n, ANY_VALUE(dev.median) AS median,
      |  ANY_VALUE(mad.mad) AS mad,
      |  CAST(SUM(CASE WHEN dev.d > 3.0 * mad.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM dev JOIN mad ON dev.grp = mad.grp
      |GROUP BY dev.grp ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    Stats.madOutliers(t("lineitem"), "l_returnflag", "l_extendedprice",
        k = 3.0, distributedCum = Some(false))
      .orderBy(col("l_returnflag"))
  }

  /** Sorted-neighborhood near-dup pass ([[Dedup.sortedNeighborhood]],
    * window 3 over the text sort order, exact Jaccard ≥ 0.4). The oracle
    * replays the rank with a SQL window — the distributed two-phase rank
    * ([[graft.operators.Ranking.globalRowNumber]]) must agree with
    * `row_number() OVER (ORDER BY …)` exactly. */
  val q111SortedNeighborhood: (String, QueryDef) = q(
    "q111_sorted_neighborhood",
    """WITH r AS (
      |  SELECT doc_id, text,
      |    ROW_NUMBER() OVER (ORDER BY text, doc_id) AS rn
      |  FROM documents),
      |cand AS (
      |  SELECT LEAST(a.doc_id, b.doc_id) AS d1,
      |    GREATEST(a.doc_id, b.doc_id) AS d2
      |  FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 3),
      |sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    generate_series(1, len(string_split(text, ' ')) - 2),
      |    i -> array_to_string((string_split(text, ' '))[i:i+2], ' '))) AS sh
      |  FROM documents),
      |j AS (
      |  SELECT c.d1, c.d2,
      |    CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) /
      |      len(list_distinct(list_concat(x.sh, y.sh))) AS jaccard
      |  FROM cand c JOIN sh x ON c.d1 = x.doc_id JOIN sh y ON c.d2 = y.doc_id)
      |SELECT d1, d2, jaccard FROM j WHERE jaccard >= 0.4
      |ORDER BY d1, d2""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    Dedup.sortedNeighborhood(t("documents"), "doc_id", "text",
        window = 3, threshold = 0.4)
      .orderBy(col("d1"), col("d2"))
  }

  /** MinHash estimator calibration ([[Dedup.minhashEstimateVsExact]]):
    * for every band-collision candidate pair, the signature-estimated
    * Jaccard next to the exact shingle Jaccard. Both are integer ratios —
    * engine-exact. */
  val q112MinhashCalibration: (String, QueryDef) = q(
    "q112_minhash_calibration",
    """WITH s AS (
      |  SELECT doc_id,
      |    list_transform(range(1, len(string_split(text,' '))-1),
      |      i -> array_to_string((string_split(text,' '))[i:i+2], ' ')) AS sh
      |  FROM documents WHERE len(string_split(text,' ')) >= 3),
      |sig AS (
      |  SELECT doc_id,
      |    list_min(list_transform(sh, x -> md5('1:' || x))) AS mh1,
      |    list_min(list_transform(sh, x -> md5('2:' || x))) AS mh2,
      |    list_min(list_transform(sh, x -> md5('3:' || x))) AS mh3,
      |    list_min(list_transform(sh, x -> md5('4:' || x))) AS mh4
      |  FROM s),
      |bands AS (
      |  SELECT doc_id, 1 AS band, mh1 || mh2 AS mh FROM sig
      |  UNION ALL
      |  SELECT doc_id, 2 AS band, mh3 || mh4 AS mh FROM sig),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id),
      |est AS (
      |  SELECT c.d1, c.d2,
      |    ((CASE WHEN x.mh1 = y.mh1 THEN 1 ELSE 0 END) +
      |     (CASE WHEN x.mh2 = y.mh2 THEN 1 ELSE 0 END) +
      |     (CASE WHEN x.mh3 = y.mh3 THEN 1 ELSE 0 END) +
      |     (CASE WHEN x.mh4 = y.mh4 THEN 1 ELSE 0 END)) / 4.0 AS est_jaccard
      |  FROM cand c JOIN sig x ON c.d1 = x.doc_id JOIN sig y ON c.d2 = y.doc_id),
      |shd AS (
      |  SELECT doc_id, list_distinct(sh) AS sh FROM s),
      |ex AS (
      |  SELECT c.d1, c.d2,
      |    CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) /
      |      len(list_distinct(list_concat(x.sh, y.sh))) AS jaccard
      |  FROM cand c JOIN shd x ON c.d1 = x.doc_id JOIN shd y ON c.d2 = y.doc_id)
      |SELECT est.d1, est.d2, est.est_jaccard, ex.jaccard
      |FROM est JOIN ex ON est.d1 = ex.d1 AND est.d2 = ex.d2
      |ORDER BY est.d1, est.d2""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    Dedup.minhashEstimateVsExact(t("documents"), "doc_id", "text",
        bands = 2, rows = 2)
      .orderBy(col("d1"), col("d2"))
  }

  /** Count-Min sketch point estimates ([[graft.functions.CmsSketch]],
    * depth 3 × width 512) for the 15 most frequent tokens, next to their
    * exact counts. The oracle rebuilds the identical counter matrix in
    * SQL (counter(r,b) = Σ cnt over terms hashing to b in row r — the
    * md5-bucket convention of q56), so `cms_est` is hash-checked, not
    * just bounded: the mergeable matrix aggregation must agree with the
    * closed-form definition exactly. est ≥ exact always; the synthetic
    * vocabulary (~10² terms ≪ 512 buckets) makes most rows collision-free.
    */
  val q113CmsEstimates: (String, QueryDef) = q(
    "q113_cms_estimates",
    """WITH tok AS (
      |  SELECT unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY term),
      |bk AS (
      |  SELECT term, cnt, r,
      |    CAST('0x' || substring(md5(CAST(r AS VARCHAR) || ':' || term), 1, 8)
      |      AS BIGINT) % 512 AS b
      |  FROM tf CROSS JOIN (SELECT unnest([0, 1, 2]) AS r)),
      |counters AS (SELECT r, b, SUM(cnt) AS s FROM bk GROUP BY r, b),
      |top AS (SELECT term, cnt FROM tf ORDER BY cnt DESC, term LIMIT 15),
      |est AS (
      |  SELECT bk.term, CAST(MIN(c.s) AS BIGINT) AS cms_est
      |  FROM bk JOIN counters c ON bk.r = c.r AND bk.b = c.b
      |  JOIN top t ON bk.term = t.term GROUP BY bk.term)
      |SELECT t.term, t.cnt AS exact_cnt, e.cms_est
      |FROM top t JOIN est e ON t.term = e.term
      |ORDER BY exact_cnt DESC, t.term""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val depth = 3; val width = 512
    val toks = t("documents")
      .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
    val cms = toks.agg(
      graft.functions.CmsSketch.sketch(col("term"), depth, width).as("m"))
    val top = toks.groupBy("term").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("term")).limit(15)
    top.crossJoin(broadcast(cms))
      .select(col("term"), col("exact_cnt"),
        graft.functions.CmsSketch.estimateExpr(col("m"), col("term"),
          depth, width).as("cms_est"))
      .orderBy(col("exact_cnt").desc, col("term"))
  }

  /** Winsorized means ([[Stats.winsorize]]): per return flag, extended
    * price clipped to the exact lower p05/p95, raw vs winsorized mean.
    * Quantiles are data values (lower-quantile crossing rule); means are
    * exact-decimal sums / count — everything engine-exact, no rounding. */
  val q114Winsorize: (String, QueryDef) = q(
    "q114_winsorize",
    s"""WITH g AS (
       |  SELECT l_returnflag AS grp, l_extendedprice AS v, COUNT(*) AS c
       |  FROM lineitem GROUP BY 1, 2),
       |cum AS (
       |  SELECT grp, v, c,
       |    SUM(c) OVER (PARTITION BY grp ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm,
       |    SUM(c) OVER (PARTITION BY grp) AS n FROM g),
       |th AS (
       |  SELECT grp,
       |    MIN(CASE WHEN cm * 100 >= n * 5 THEN v END) AS p_lo,
       |    MIN(CASE WHEN cm * 100 >= n * 95 THEN v END) AS p_hi
       |  FROM cum GROUP BY grp)
       |SELECT l.l_returnflag, COUNT(*) AS n,
       |  ANY_VALUE(t.p_lo) AS p_lo, ANY_VALUE(t.p_hi) AS p_hi,
       |  ${dsumSql("l.l_extendedprice")} / COUNT(*) AS raw_mean,
       |  ${dsumSql("LEAST(GREATEST(l.l_extendedprice, t.p_lo), t.p_hi)")}
       |    / COUNT(*) AS winsorized_mean
       |FROM lineitem l JOIN th t ON l.l_returnflag = t.grp
       |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin) {
    (s, dir) =>
      implicit val env: (SparkSession, String) = (s, dir)
      Stats.winsorize(t("lineitem"), "l_returnflag", "l_extendedprice",
          distributedCum = Some(false))
        .orderBy(col("l_returnflag"))
  }

  /** Exact equi-depth histogram ([[Stats.equidepthHist]]): 8 equal-count
    * buckets of quantity per return flag — tie-heavy discrete data, so
    * bucket-skipping and tie-mass placement are both exercised. The
    * complement of the equal-width hist family (q16/q42/q44/q48). */
  val q115EquidepthHist: (String, QueryDef) = q(
    "q115_equidepth_hist",
    """WITH g AS (
      |  SELECT l_returnflag AS grp, l_quantity AS v, COUNT(*) AS c
      |  FROM lineitem GROUP BY 1, 2),
      |cum AS (
      |  SELECT grp, v, c,
      |    SUM(c) OVER (PARTITION BY grp ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm,
      |    SUM(c) OVER (PARTITION BY grp) AS n FROM g)
      |SELECT grp AS l_returnflag, CAST(((cm - c) * 8) // n + 1 AS BIGINT) AS bucket,
      |  MAX(v) AS hi_edge, CAST(SUM(c) AS BIGINT) AS cnt
      |FROM cum GROUP BY 1, 2
      |ORDER BY l_returnflag, bucket""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    Stats.equidepthHist(t("lineitem"), "l_returnflag", "l_quantity", 8,
        distributedCum = Some(false))
      .orderBy(col("l_returnflag"), col("bucket"))
  }

  /** Leakage-free train/val/test split
    * ([[graft.operators.Sampling.dedupAwareSplit]]): the split keys on
    * the content hash, so exact duplicates co-assign. Summarized as
    * (split, lang) counts — stable under the doc-count while still
    * pinning every assignment (the count moves if ANY doc flips split).
    */
  val q116DedupSplit: (String, QueryDef) = q(
    "q116_dedup_split",
    """WITH s AS (
      |  SELECT doc_id, lang,
      |    CASE
      |      WHEN CAST('0x' || substring(md5('split:' || md5(text)), 1, 8)
      |        AS BIGINT) % 100 < 80 THEN 'train'
      |      WHEN CAST('0x' || substring(md5('split:' || md5(text)), 1, 8)
      |        AS BIGINT) % 100 < 90 THEN 'val'
      |      ELSE 'test' END AS split
      |  FROM documents)
      |SELECT split, lang, COUNT(*) AS n_docs
      |FROM s GROUP BY split, lang ORDER BY split, lang""".stripMargin) {
    (s, dir) =>
      implicit val env: (SparkSession, String) = (s, dir)
      graft.operators.Sampling.dedupAwareSplit(t("documents"), "doc_id", "text")
        .join(t("documents").select(col("doc_id"), col("lang")), "doc_id")
        .groupBy(col("split"), col("lang")).agg(count(lit(1)).as("n_docs"))
        .orderBy(col("split"), col("lang"))
  }

  /** Column profile audit ([[Stats.columnProfile]]): one-pass per-column
    * row/non-null/exact-distinct counts and extents over lineitem —
    * numeric and string columns in one long-format report. */
  val q117ColumnProfile: (String, QueryDef) = q(
    "q117_column_profile",
    """SELECT 'l_quantity' AS col_name, COUNT(*) AS n_rows,
      |  COUNT(l_quantity) AS n_nonnull, COUNT(DISTINCT l_quantity) AS n_distinct,
      |  CAST(MIN(l_quantity) AS DOUBLE) AS min_num,
      |  CAST(MAX(l_quantity) AS DOUBLE) AS max_num,
      |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
      |FROM lineitem
      |UNION ALL
      |SELECT 'l_extendedprice', COUNT(*), COUNT(l_extendedprice),
      |  COUNT(DISTINCT l_extendedprice), CAST(MIN(l_extendedprice) AS DOUBLE),
      |  CAST(MAX(l_extendedprice) AS DOUBLE), NULL, NULL FROM lineitem
      |UNION ALL
      |SELECT 'l_discount', COUNT(*), COUNT(l_discount),
      |  COUNT(DISTINCT l_discount), CAST(MIN(l_discount) AS DOUBLE),
      |  CAST(MAX(l_discount) AS DOUBLE), NULL, NULL FROM lineitem
      |UNION ALL
      |SELECT 'l_returnflag', COUNT(*), COUNT(l_returnflag),
      |  COUNT(DISTINCT l_returnflag), NULL, NULL,
      |  MIN(l_returnflag), MAX(l_returnflag) FROM lineitem
      |UNION ALL
      |SELECT 'l_linestatus', COUNT(*), COUNT(l_linestatus),
      |  COUNT(DISTINCT l_linestatus), NULL, NULL,
      |  MIN(l_linestatus), MAX(l_linestatus) FROM lineitem
      |ORDER BY col_name""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    Stats.columnProfile(t("lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount"),
        Seq("l_returnflag", "l_linestatus"))
      .orderBy(col("col_name"))
  }

  /** Exact sliding-window distinct users
    * ([[graft.operators.Events.slidingDistinct]]): trailing 4-hour
    * distinct count at hourly grain — COUNT(DISTINCT) OVER RANGE
    * semantics via pair fan-out, no running-set state. */
  val q118SlidingDistinct: (String, QueryDef) = q(
    "q118_sliding_distinct",
    """WITH p AS (
      |  SELECT DISTINCT user_id,
      |    (epoch_ns(ts) // 1000000000 // 3600) * 3600 AS b
      |  FROM events),
      |mx AS (SELECT MAX(b) AS maxb FROM p),
      |f AS (
      |  SELECT user_id, b + 3600 * u.i AS bucket
      |  FROM p CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) u)
      |SELECT bucket, COUNT(DISTINCT user_id) AS n_users
      |FROM f, mx WHERE bucket <= mx.maxb
      |GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.operators.Events.slidingDistinct(t("events"), "user_id", "ts_sec",
        bucketSecs = 3600L, windowBuckets = 4)
      .orderBy(col("bucket"))
  }

  /** Unicode NFC normalization (native `graft_nfc`,
    * expressions/UnicodeNorm.scala): the corpus is ASCII, so decomposed
    * sequences are synthesized IN-PLAN (the q94-q96 pattern) — combining
    * acute U+0301 after 'e' on even docs, precomposed U+00E9 on odd docs
    * — then normalized. NFC makes both byte-identical, which is the
    * whole point: content hashes and dedup keys must not distinguish
    * canonically-equal text. Byte lengths (engine-portable, unlike
    * grapheme-counting `length`) and the normalized string itself are
    * hash-checked against DuckDB's `nfc_normalize`. */
  val q119UnicodeNfc: (String, QueryDef) = q(
    "q119_unicode_nfc",
    """WITH s AS (
      |  SELECT doc_id,
      |    substring(text, 1, 10) ||
      |      CASE WHEN doc_id % 2 = 0 THEN 'e' || chr(769) ELSE chr(233) END
      |      || ' caf' ||
      |      CASE WHEN doc_id % 3 = 0 THEN 'e' || chr(769) ELSE chr(233) END
      |    AS raw FROM documents)
      |SELECT doc_id, strlen(raw) AS raw_bytes,
      |  strlen(nfc_normalize(raw)) AS nfc_bytes,
      |  nfc_normalize(raw) AS normalized,
      |  CAST(raw != nfc_normalize(raw) AS INT) AS changed
      |FROM s ORDER BY doc_id LIMIT 200""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    // escapes make the intent tool-proof: even/div3 docs get the
    // DECOMPOSED form (e + combining acute U+0301), the rest the
    // precomposed U+00E9; NFC maps the former onto the latter
    val raw = concat(substring(col("text"), 1, 10),
      when(col("doc_id") % 2 === 0, lit("e\u0301")).otherwise(lit("\u00e9")),
      lit(" caf"),
      when(col("doc_id") % 3 === 0, lit("e\u0301")).otherwise(lit("\u00e9")))
    val nfc = call_function("graft_nfc", col("raw"))
    t("documents").select(col("doc_id"), raw.as("raw"))
      .select(col("doc_id"), octet_length(col("raw")).as("raw_bytes"),
        octet_length(nfc).as("nfc_bytes"), nfc.as("normalized"),
        (col("raw") =!= nfc).cast("int").as("changed"))
      .orderBy(col("doc_id")).limit(200)
  }

  /** Per-document n-gram novelty
    * ([[graft.operators.Decontam.ngramNovelty]]): fraction of each doc's
    * distinct trigrams that are corpus-common (df > 5) — the doc-level
    * rollup of the q59 boilerplate report; high `common_frac` flags
    * templated docs. */
  val q120NgramNovelty: (String, QueryDef) = q(
    "q120_ngram_novelty",
    """WITH w AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |ng AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    generate_series(1, len(w) - 2),
      |    i -> array_to_string(w[i:i+2], ' ')))) AS g
      |  FROM w),
      |dfq AS (SELECT g, COUNT(*) AS df FROM ng GROUP BY g)
      |SELECT ng.doc_id, COUNT(*) AS n_grams,
      |  CAST(SUM(CASE WHEN dfq.df > 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
      |  CAST(SUM(CASE WHEN dfq.df > 5 THEN 1 ELSE 0 END) AS DOUBLE) /
      |    COUNT(*) AS common_frac
      |FROM ng JOIN dfq ON ng.g = dfq.g
      |GROUP BY ng.doc_id ORDER BY ng.doc_id LIMIT 300""".stripMargin) {
    (s, dir) =>
      implicit val env: (SparkSession, String) = (s, dir)
      graft.operators.Decontam.ngramNovelty(t("documents"), "doc_id", "text",
          n = 3, commonDf = 5L)
        .orderBy(col("doc_id")).limit(300)
  }

  /** Cluster-aware split ([[graft.operators.Sampling.clusterAwareSplit]]):
    * q116 upgraded from exact-dup to NEAR-dup hygiene — the split keys on
    * the doc's LSH connected-component representative, so a paraphrase
    * cluster never straddles train/eval. The oracle rebuilds the
    * component labels with q60's recursive CTE and replays the md5
    * bucket; every (doc, cluster_key, split) row is hash-checked. */
  val q121ClusterSplit: (String, QueryDef) = q(
    "q121_cluster_split",
    s"""WITH RECURSIVE ${Queries8.pairsSql},
       |edges AS (
       |  SELECT d1 AS a, d2 AS b FROM pairs
       |  UNION ALL SELECT d2, d1 FROM pairs),
       |r AS (
       |  SELECT a AS id, a AS lbl FROM edges
       |  UNION
       |  SELECT e.b, r.lbl FROM r JOIN edges e ON e.a = r.id),
       |cc AS (SELECT id, MIN(lbl) AS cluster_id FROM r GROUP BY id),
       |keyed AS (
       |  SELECT d.doc_id,
       |    COALESCE(CAST(cc.cluster_id AS VARCHAR), md5(d.text)) AS cluster_key
       |  FROM documents d LEFT JOIN cc ON d.doc_id = cc.id)
       |SELECT doc_id, cluster_key,
       |  CASE
       |    WHEN CAST('0x' || substring(md5('csplit:' || cluster_key), 1, 8)
       |      AS BIGINT) % 100 < 80
       |      THEN 'train'
       |    WHEN CAST('0x' || substring(md5('csplit:' || cluster_key), 1, 8)
       |      AS BIGINT) % 100 < 90
       |      THEN 'val'
       |    ELSE 'test' END AS split
       |FROM keyed ORDER BY doc_id""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.operators.Sampling.clusterAwareSplit(t("documents"), "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** FULL OUTER join accounting: a customer subset (nation < 13) against
    * per-customer order rollups — rows surviving only on the left
    * (customers with no orders), only on the right (orders whose customer
    * is filtered out), and matched, each side exactly counted. Rounds out
    * the join family (broadcast/shuffle/star/semi/anti/as-of/interval/
    * salted) with the outer shape; at scale it is the same single
    * shuffle as the inner join — null-extension is free. */
  val q122OuterJoin: (String, QueryDef) = q(
    "q122_outer_join",
    s"""WITH c AS (
       |  SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey < 13),
       |o AS (
       |  SELECT o_custkey, COUNT(*) AS n_orders,
       |    ${dsumSql("o_totalprice")} AS revenue
       |  FROM orders WHERE o_totalprice > 150000 GROUP BY o_custkey)
       |SELECT
       |  CASE WHEN o.o_custkey IS NULL THEN 'customer_only'
       |       WHEN c.c_custkey IS NULL THEN 'order_only'
       |       ELSE 'both' END AS side,
       |  COUNT(*) AS n_rows,
       |  CAST(COALESCE(SUM(o.n_orders), 0) AS BIGINT) AS n_orders
       |FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey
       |GROUP BY 1 ORDER BY side""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val c = t("customer").filter(col("c_nationkey") < 13)
      .select(col("c_custkey"), col("c_nationkey"))
    val o = t("orders").filter(col("o_totalprice") > 150000)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        call_function("graft_dsum", col("o_totalprice"), lit(4)).as("revenue"))
    c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
      .select(
        when(col("o_custkey").isNull, "customer_only")
          .when(col("c_custkey").isNull, "order_only")
          .otherwise("both").as("side"),
        col("n_orders"))
      .groupBy(col("side"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(col("n_orders")), lit(0L)).as("n_orders"))
      .orderBy(col("side"))
  }

  /** INTERSECT / EXCEPT set operations (§2.7 completeness next to UNION
    * q30): urgent-order customers vs low-priority-order customers. Spark
    * plans both as aggregates/joins on the key — one shuffle each. */
  val q123SetOps: (String, QueryDef) = q(
    "q123_set_ops",
    """SELECT 'except' AS op, COUNT(*) AS n FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |  EXCEPT
      |  SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW') t
      |UNION ALL
      |SELECT 'intersect', COUNT(*) FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |  INTERSECT
      |  SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW') t
      |ORDER BY op""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val urgent = t("orders").filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    val low = t("orders").filter(col("o_orderpriority") === "5-LOW")
      .select(col("o_custkey"))
    urgent.except(low).agg(count(lit(1)).as("n"))
      .select(lit("except").as("op"), col("n"))
      .unionByName(urgent.intersect(low).agg(count(lit(1)).as("n"))
        .select(lit("intersect").as("op"), col("n")))
      .orderBy(col("op"))
  }

  /** Top event paths ([[graft.operators.Events.topPaths]]): every 3-step
    * run of consecutive events per user, counted corpus-wide — k-step
    * sequential patterns generalizing the k=2 transition matrix (q70). */
  val q124EventPaths: (String, QueryDef) = q(
    "q124_event_paths",
    """WITH e AS (
      |  SELECT user_id, event_type, event_id,
      |    epoch_ns(ts) // 1000000000 AS s
      |  FROM events),
      |lagged AS (
      |  SELECT event_type,
      |    LAG(event_type, 2) OVER (PARTITION BY user_id ORDER BY s, event_id) AS p1,
      |    LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY s, event_id) AS p2
      |  FROM e)
      |SELECT p1 || '>' || p2 || '>' || event_type AS path, COUNT(*) AS n
      |FROM lagged WHERE p1 IS NOT NULL
      |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.operators.Events.topPaths(t("events"), "user_id", "ts_sec",
        "event_type", "event_id", k = 3, topN = 20)
      .orderBy(col("n").desc, col("path"))
  }

  /** Per-series OLS trend ([[Stats.groupedTrend]]): slope/intercept of
    * daily event counts per type, in the tie-proof EXACT form (integer
    * numerators + denominator — integer-valued series make the rounded
    * quotients land on exact ROUND ties that engines break differently;
    * the rational itself is engine-exact). */
  val q125Trend: (String, QueryDef) = q(
    "q125_trend",
    """WITH daily AS (
      |  SELECT event_type,
      |    epoch_ns(ts) // 1000000000 // 86400 AS day,
      |    COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    CAST(SUM(CAST(day AS DECIMAL(38,0))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(cnt AS DECIMAL(38,0))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(day * cnt AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
      |    CAST(SUM(CAST(day * day AS DECIMAL(38,0))) AS DOUBLE) AS sxx
      |  FROM daily GROUP BY 1)
      |SELECT event_type, n,
      |  n * sxy - sx * sy AS slope_num,
      |  sy * sxx - sx * sxy AS intercept_num,
      |  n * sxx - sx * sx AS denom
      |FROM m ORDER BY event_type""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val daily = t("events")
      .groupBy(col("event_type"),
        (col("ts_sec").cast("long") / 86400L).cast("long").as("day"))
      .agg(count(lit(1)).as("cnt"))
    Stats.groupedTrend(daily, "event_type", "day", "cnt", exact = true)
      .orderBy(col("event_type"))
  }

  /** Sampling calibration: per order priority, the EXACT row count and
    * revenue next to the Horvitz-Thompson estimates from a 5% md5-hash
    * sample ([[graft.operators.Sampling.hashBucket]] convention, so the
    * sampled set is identical in any engine). The measurement that
    * justifies sample-based dashboards at 100 TB: run once, read the
    * relative error, choose the rate. Estimates are exact-integer /
    * exact-decimal arithmetic — engine-exact without rounding.
    */
  val q127SampleCalibration: (String, QueryDef) = q(
    "q127_sample_calibration",
    s"""WITH s AS (
       |  SELECT o_orderpriority, o_totalprice,
       |    CAST('0x' || substring(md5('cal:' || CAST(o_orderkey AS VARCHAR)),
       |      1, 8) AS BIGINT) % 10000 < 500 AS picked
       |  FROM orders)
       |SELECT o_orderpriority,
       |  COUNT(*) AS n_exact,
       |  ${dsumSql("o_totalprice")} AS rev_exact,
       |  CAST(SUM(CASE WHEN picked THEN 1 ELSE 0 END) * 20 AS BIGINT) AS n_est,
       |  CAST(SUM(CASE WHEN picked
       |    THEN CAST(o_totalprice AS DECIMAL(38,4)) END) AS DOUBLE) * 20
       |    AS rev_est
       |FROM s GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) {
    (s, dir) =>
      implicit val env: (SparkSession, String) = (s, dir)
      val picked = graft.operators.Sampling
        .hashBucket(col("o_orderkey"), "cal:") < 500L
      t("orders")
        .select(col("o_orderpriority"), col("o_totalprice"),
          picked.as("picked"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_exact"),
          call_function("graft_dsum", col("o_totalprice"), lit(4))
            .as("rev_exact"),
          (sum(when(col("picked"), 1L).otherwise(0L)) * 20).as("n_est"),
          (call_function("graft_dsum",
            when(col("picked"), col("o_totalprice")), lit(4)) * 20)
            .as("rev_est"))
        .orderBy(col("o_orderpriority"))
  }

  /** Histogram-resolution calibration: the bucketed hist p50 (q42's
    * sketch, bucket-resolution answer) next to the EXACT lower median and
    * the bucket width that bounds their gap — the third calibration
    * report (q112 minhash, q127 sampling): measure the sketch against
    * ground truth once, then trust it at the scale where exact medians
    * are unaffordable per query. */
  val q128HistCalibration: (String, QueryDef) = q(
    "q128_hist_calibration",
    """WITH par AS (
      |  SELECT MIN(user_id) AS mn,
      |    GREATEST(1, (MAX(user_id) - MIN(user_id) + 999) // 1000) AS bw
      |  FROM events),
      |bk AS (
      |  SELECT event_type, ((user_id - mn) // bw) * bw + mn AS low,
      |    COUNT(*) AS c
      |  FROM events, par GROUP BY 1, 2),
      |cum AS (
      |  SELECT event_type, low, c,
      |    SUM(c) OVER (PARTITION BY event_type ORDER BY low) AS cm,
      |    SUM(c) OVER (PARTITION BY event_type) AS tot
      |  FROM bk),
      |hist AS (
      |  SELECT event_type, MIN(low) AS hist_p50 FROM cum
      |  WHERE 100 * cm >= 50 * tot GROUP BY 1),
      |g AS (
      |  SELECT event_type, user_id AS v, COUNT(*) AS c
      |  FROM events GROUP BY 1, 2),
      |cume AS (
      |  SELECT event_type, v, c,
      |    SUM(c) OVER (PARTITION BY event_type ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm,
      |    SUM(c) OVER (PARTITION BY event_type) AS n FROM g),
      |ex AS (
      |  SELECT event_type, MIN(v) AS exact_p50 FROM cume
      |  WHERE cm * 2 >= n GROUP BY 1)
      |SELECT h.event_type, h.hist_p50, ex.exact_p50,
      |  ABS(h.hist_p50 - ex.exact_p50) AS err, par.bw AS bucket_width
      |FROM hist h JOIN ex ON h.event_type = ex.event_type CROSS JOIN par
      |ORDER BY h.event_type""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    import graft.dsl.{AggOp, SybilQuery}
    val ev = t("events")
    val hist = SybilQuery().groupBy("event_type").aggregate("user_id")
      .withOp(AggOp.HistOp).limitTo(100).run(ev)
      .selectExpr("event_type", "user_id_hist.percentiles[50] AS hist_p50")
    val exact = Stats.groupedMedian(ev, "event_type", "user_id",
        distributedCum = Some(false))
      .select(col("event_type"), col("median").as("exact_p50"))
    val par = ev.agg(greatest(lit(1L),
      expr("(CAST(MAX(user_id) - MIN(user_id) AS BIGINT) + 999) DIV 1000"))
      .as("bucket_width"))
    hist.join(exact, "event_type").crossJoin(broadcast(par))
      .select(col("event_type"), col("hist_p50"), col("exact_p50"),
        abs(col("hist_p50") - col("exact_p50")).as("err"),
        col("bucket_width"))
      .orderBy(col("event_type"))
  }

  val catalog: Seq[(String, QueryDef)] = Seq(
    q107SaltedJoin, q108Bm25, q109InvertedIndex, q110MadOutliers,
    q111SortedNeighborhood, q112MinhashCalibration, q113CmsEstimates,
    q114Winsorize, q115EquidepthHist, q116DedupSplit, q117ColumnProfile,
    q118SlidingDistinct, q119UnicodeNfc, q120NgramNovelty, q121ClusterSplit,
    q122OuterJoin, q123SetOps, q124EventPaths, q125Trend,
    q127SampleCalibration, q128HistCalibration)
}

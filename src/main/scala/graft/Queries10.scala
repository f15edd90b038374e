package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Curation, Decontam, Dedup, Events, LanguageModel}

/** Catalog entries: round-6 pipeline additions — corpus-trained bigram LM
  * scoring, global chunk dedup, bucketed interval join, Bloom-prefiltered
  * decontamination, and exact score-band bucketing.
  */
object Queries10 {

  private def t(name: String)(implicit env: (SparkSession, String)): DataFrame =
    if (name == "events") Tables.events(env._1, env._2)
    else Tables.load(env._1, env._2, name)

  private def q(name: String, sql: String = null)(
      body: (SparkSession, String) => DataFrame): (String, QueryDef) =
    name -> QueryDef(body, Option(sql))

  /** Bigram LM train + score: every arithmetic step is one IEEE op (count
    * division, in-order fold, final division), so the trained model AND
    * the per-document scores hash-check bit-for-bit. */
  val q75BigramLm: (String, QueryDef) = q(
    "q75_bigram_lm",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |bg AS (
      |  SELECT doc_id, x.pos AS pos, x.w1 AS w1, x.w2 AS w2 FROM (
      |    SELECT doc_id, unnest(list_transform(generate_series(1, len(tk) - 1),
      |      i -> struct_pack(pos := i, w1 := tk[i], w2 := tk[i+1]))) AS x
      |    FROM w)),
      |c2 AS (SELECT w1, w2, COUNT(*) AS n2 FROM bg GROUP BY w1, w2),
      |c1 AS (SELECT w1, COUNT(*) AS n1 FROM bg GROUP BY w1),
      |lp AS (
      |  SELECT b.doc_id, b.pos, CAST(n2 AS DOUBLE) / n1 AS p
      |  FROM bg b JOIN c2 USING (w1, w2) JOIN c1 USING (w1)),
      |agg AS (
      |  SELECT doc_id, list_reduce(list(p ORDER BY pos), (x, y) -> x + y) AS s,
      |    COUNT(*) AS n_bigrams, MIN(p) AS min_p
      |  FROM lp GROUP BY doc_id)
      |SELECT doc_id, n_bigrams, s / n_bigrams AS avg_p, min_p
      |FROM agg ORDER BY doc_id""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    LanguageModel.bigramScore(t("documents"), "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** Corpus-global first-occurrence chunk dedup (3-token chunks) — the
    * exact-substring dedup pass; cleaned text, kept/dropped counts all
    * hash-checked. */
  val q76ChunkDedup: (String, QueryDef) = q(
    "q76_chunk_dedup",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |ch AS (
      |  SELECT doc_id, x.pos AS pos, x.chunk AS chunk FROM (
      |    SELECT doc_id, unnest(list_transform(
      |      generate_series(0, CAST(ceil(len(tk) / 3.0) AS INTEGER) - 1),
      |      i -> struct_pack(pos := i,
      |        chunk := array_to_string(tk[(3*i+1):(3*i+3)], ' ')))) AS x
      |    FROM w)),
      |k AS (
      |  SELECT doc_id, pos, chunk,
      |    ROW_NUMBER() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rk
      |  FROM ch),
      |rb AS (
      |  SELECT doc_id, string_agg(chunk, ' ' ORDER BY pos) AS cleaned,
      |    COUNT(*) AS n_kept
      |  FROM k WHERE rk = 1 GROUP BY doc_id),
      |tot AS (SELECT doc_id, COUNT(*) AS n_chunks FROM ch GROUP BY doc_id)
      |SELECT t.doc_id, COALESCE(rb.cleaned, '') AS cleaned,
      |  COALESCE(rb.n_kept, 0) AS n_kept,
      |  t.n_chunks - COALESCE(rb.n_kept, 0) AS n_dropped
      |FROM tot t LEFT JOIN rb USING (doc_id) ORDER BY doc_id""".stripMargin) {
    (s, dir) =>
      implicit val env: (SparkSession, String) = (s, dir)
      Dedup.chunkDedupGlobal(t("documents"), "doc_id", "text", chunkTokens = 3)
        .orderBy(col("doc_id"))
  }

  /** Bucketed interval self-join on the event log: same-user pairs ≤ 60 s
    * apart, aggregated to the type-pair co-occurrence matrix. The oracle
    * runs the naive theta join; the Spark plan is the 2-bucket equi-join
    * (same result, no nested loop). */
  val q77IntervalJoin: (String, QueryDef) = q(
    "q77_interval_join",
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    epoch_ns(ts) // 1000000000 AS s FROM events)
      |SELECT a.event_type AS t1, c.event_type AS t2, COUNT(*) AS n_pairs,
      |  MIN(c.s - a.s) AS min_gap, MAX(c.s - a.s) AS max_gap
      |FROM e a JOIN e c ON a.user_id = c.user_id
      |  AND c.s - a.s BETWEEN 0 AND 60
      |  AND (a.s < c.s OR (a.s = c.s AND a.event_id < c.event_id))
      |GROUP BY t1, t2 ORDER BY t1, t2""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    Events.intervalPairs(t("events"), "user_id", "ts_sec", "event_id",
        "event_type", windowSec = 60L)
      .orderBy(col("t1"), col("t2"))
  }

  /** Decontamination through the Bloom-prefilter + shuffle-join path (the
    * benchmark-too-big-to-broadcast regime). The Bloom only prunes; the
    * exact verify join makes the output identical to the exact-set
    * formulation, so the same string-n-gram oracle hash-checks it.
    * 4-grams and a %40 benchmark split keep it distinct from q57. */
  val q78BloomDecontam: (String, QueryDef) = q(
    "q78_bloom_decontam",
    """WITH w AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |ng AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    generate_series(1, len(w) - 3),
      |    i -> array_to_string(w[i:i+3], ' ')))) AS ng
      |  FROM w),
      |bng AS (SELECT DISTINCT ng FROM ng WHERE doc_id % 40 = 0)
      |SELECT n.doc_id, COUNT(*) AS overlap_ngrams
      |FROM ng n JOIN bng USING (ng)
      |WHERE n.doc_id % 40 <> 0
      |GROUP BY n.doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val docs = t("documents")
    Decontam.overlapViaBloom(docs,
        docs.filter(pmod(col("doc_id"), lit(40)) === 0),
        "doc_id", "text", n = 4)
      .orderBy(col("doc_id"))
  }

  /** Exact length deciles without a global row sort: the cutoff window
    * runs over distinct score values only; ties share a bucket. */
  val q79ScoreDeciles: (String, QueryDef) = q(
    "q79_score_deciles",
    """WITH g AS (SELECT n_chars, COUNT(*) AS c FROM documents GROUP BY n_chars),
      |cum AS (
      |  SELECT n_chars,
      |    COALESCE(SUM(c) OVER (ORDER BY n_chars DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS higher,
      |    SUM(c) OVER () AS total
      |  FROM g)
      |SELECT d.doc_id, d.n_chars,
      |  CAST((10 * cum.higher) // cum.total AS BIGINT) AS bucket
      |FROM documents d JOIN cum USING (n_chars) ORDER BY doc_id""".stripMargin) {
    (s, dir) =>
      implicit val env: (SparkSession, String) = (s, dir)
      // n_chars is a bounded integer score: pin the serial regime and
      // skip resolveCum's probe jobs (the catalog-entry setting its
      // scaladoc prescribes)
      Curation.exactScoreBands(
          t("documents").select(col("doc_id"), col("n_chars")),
          "doc_id", "n_chars", buckets = 10,
          distributedCum = Some(false))
        .select(col("doc_id"), col("n_chars"), col("bucket"))
        .orderBy(col("doc_id"))
  }

  /** Exact per-group Pearson correlation from decimal moment sums — the
    * order-independent form of `corr` (whose double accumulator is
    * merge-order-dependent and could never hash-check). */
  val q80Correlation: (String, QueryDef) = q(
    "q80_correlation",
    """WITH s AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
      |    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,12))) AS DOUBLE) AS syy
      |  FROM lineitem
      |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
      |  GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  ROUND((n * sxy - sx * sy) /
      |    (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 6) AS corr_xy
      |FROM s ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.core.Stats.pearson(t("lineitem"), "l_returnflag",
        "l_quantity", "l_extendedprice")
      .orderBy(col("l_returnflag"))
  }

  val catalog: Seq[(String, QueryDef)] = Seq(
    q75BigramLm, q76ChunkDedup, q77IntervalJoin, q78BloomDecontam,
    q79ScoreDeciles, q80Correlation)
}

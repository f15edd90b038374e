package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Linkage, Sampling, Similarity}

/** Catalog entries: round-10 additions — the skew tooling anchored on a
  * deliberately hot-keyed fixture, with the UNSALTED / one-phase SQL as
  * the oracle (the q107 convention: the salted plan must be output-
  * identical to the plain formulation by construction, so the plain
  * formulation judges it).
  */
object Queries23 {

  private def t(name: String)(implicit env: (SparkSession, String)): DataFrame =
    Tables.load(env._1, env._2, name)

  private def q(name: String, sql: String = null)(
      body: (SparkSession, String) => DataFrame): (String, QueryDef) =
    name -> QueryDef(body, Option(sql))

  /** Skewed-block record linkage ([[Linkage.fsLink]] with `salts = 8`):
    * 90% of the customer registry collapses into ONE synthetic 'HOT'
    * block (the giant-city blocking failure), matched against a small
    * re-import registry (every 37th customer, q177's dirty-copy
    * convention). The salted path scatters the hot block's pairs over 8
    * sub-keys; the oracle is the UNSALTED join — identical output is the
    * whole point of salting. PlanSpec asserts the plan actually salts. */
  val q197SkewedLinkage: (String, QueryDef) = q(
    "q197_skewed_linkage",
    """WITH a AS (
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal,
      |    CASE WHEN c_custkey % 10 <> 0 THEN 'HOT'
      |         ELSE 'C' || CAST(c_custkey % 7 AS VARCHAR) END AS block
      |  FROM customer),
      |b AS (
      |  SELECT c_custkey + 900000 AS id_b,
      |    upper(c_name) AS name_b,
      |    CASE WHEN c_custkey % 3 = 0 THEN c_nationkey + 1
      |         ELSE c_nationkey END AS nation_b,
      |    CAST(FLOOR(c_acctbal) AS BIGINT) AS bal_b,
      |    CASE WHEN c_custkey % 10 <> 0 THEN 'HOT'
      |         ELSE 'C' || CAST(c_custkey % 7 AS VARCHAR) END AS block
      |  FROM customer WHERE c_custkey % 37 = 0),
      |pairs AS (
      |  SELECT a.c_custkey AS id_a, b.id_b,
      |    upper(a.c_name) = b.name_b AS agree_name,
      |    a.c_nationkey = b.nation_b AS agree_nation,
      |    abs(a.c_acctbal - CAST(b.bal_b AS DOUBLE)) < 100.0 AS agree_bal
      |  FROM a JOIN b USING (block)),
      |scored AS (
      |  SELECT *,
      |    (CASE WHEN agree_name THEN 5 ELSE -3 END) +
      |    (CASE WHEN agree_nation THEN 3 ELSE -2 END) +
      |    (CASE WHEN agree_bal THEN 2 ELSE -2 END) AS score
      |  FROM pairs)
      |SELECT id_a, id_b, agree_name, agree_nation, agree_bal,
      |  CAST(score AS BIGINT) AS score, score >= 6 AS is_match
      |FROM scored
      |ORDER BY score DESC, id_a, id_b LIMIT 200""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val cust = t("customer")
    val block = when(col("c_custkey") % 10 =!= 0, lit("HOT"))
      .otherwise(concat(lit("C"), (col("c_custkey") % 7).cast("string")))
    val a = cust.select(col("c_custkey"), col("c_name"),
      col("c_nationkey"), col("c_acctbal"), block.as("block"))
    val b = cust.filter(col("c_custkey") % 37 === 0).select(
      (col("c_custkey") + 900000L).as("reg_id"),
      upper(col("c_name")).as("name"),
      when(col("c_custkey") % 3 === 0, col("c_nationkey") + 1)
        .otherwise(col("c_nationkey")).as("nation"),
      floor(col("c_acctbal")).cast("long").as("bal"),
      block.as("block"))
    Linkage.fsLink(a, "c_custkey", b, "reg_id",
        blockCols = Seq("block"),
        rules = Seq(
          Linkage.FieldRule("name",
            upper(col("c_name")) === col("name_b"), 5, -3),
          Linkage.FieldRule("nation",
            col("c_nationkey") === col("nation_b"), 3, -2),
          Linkage.FieldRule("bal",
            abs(col("c_acctbal") - col("bal_b").cast("double")) < 100.0,
            2, -2)),
        threshold = 6, salts = 8)
      .orderBy(col("score").desc, col("id_a"), col("id_b")).limit(200)
  }

  /** Hot-key top-k cap ([[Sampling.quotaCapTwoPhase]]): 90% of lineitem
    * lands on one synthetic key; the two-phase cap pre-tops each of 32
    * salt buckets so no single task sorts the hot key's full row set,
    * then the exact window runs over ≤ 32·k survivors. The oracle is the
    * plain one-phase window — the two phases are output-identical by the
    * subset argument in the operator's scaladoc. */
  val q198SkewQuotaCap: (String, QueryDef) = q(
    "q198_skew_quota_cap",
    """WITH k AS (
      |  SELECT CASE WHEN l_partkey % 10 < 9 THEN 'HOT'
      |              ELSE 'C' || CAST(l_partkey % 10 AS VARCHAR) END AS grp,
      |    l_orderkey, l_linenumber, l_extendedprice
      |  FROM lineitem),
      |r AS (
      |  SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY grp
      |    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk
      |  FROM k)
      |SELECT grp, l_orderkey, l_linenumber, l_extendedprice
      |FROM r WHERE rk <= 50
      |ORDER BY grp, l_extendedprice DESC, l_orderkey, l_linenumber"""
      .stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val keyed = t("lineitem").select(
      when(col("l_partkey") % 10 < 9, lit("HOT"))
        .otherwise(concat(lit("C"), (col("l_partkey") % 10).cast("string")))
        .as("grp"),
      col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    Sampling.quotaCapTwoPhase(keyed, "grp",
        Seq(col("l_extendedprice").desc, col("l_orderkey").asc,
          col("l_linenumber").asc),
        k = 50, saltCol = col("l_orderkey") * 10 + col("l_linenumber"),
        buckets = 32)
      .orderBy(col("grp"), col("l_extendedprice").desc, col("l_orderkey"),
        col("l_linenumber"))
  }

  /** Real pixel kernel round trip ([[graft.expressions.GraftSynthPpm]] →
    * [[graft.expressions.GraftPpmPhash]] / [[graft.expressions.GraftPpmResize]]):
    * gradient P6 rasters synthesized in-plan, decoded and perceptually
    * hashed by the exact-integer 8×8 box-filter kernels, plus a
    * box-filter downscale to 10×9 re-decoded for its grayscale checksum.
    * The oracle replays every pixel: the gradient value, the grid
    * partition `i = x·G // W`, the cross-multiplied ahash/dhash bit
    * decisions (bit 63 reconstructed through HUGEINT-free signed halves),
    * and the resize floor means — a byte-order, floor, or bit-index bug
    * anywhere in the kernels breaks the hash match. */
  val q199PpmPhash: (String, QueryDef) = q(
    "q199_ppm_phash",
    """WITH p AS (
      |  SELECT doc_id, 16 + doc_id % 41 AS w, 12 + (doc_id*5) % 29 AS h,
      |         1 + doc_id % 7 AS a, 1 + doc_id % 11 AS b
      |  FROM documents WHERE doc_id < 150),
      |xs AS (SELECT p.*, unnest(generate_series(0, w-1)) AS x FROM p),
      |px AS (SELECT doc_id, w, h, a, b, x,
      |         unnest(generate_series(0, h-1)) AS y FROM xs),
      |v AS (SELECT doc_id, w, h, x, y, (x*a + y*b) % 256 AS v,
      |        (x*8)//w AS ci, (y*8)//h AS cj FROM px),
      |cells AS (SELECT doc_id, ci, cj, SUM(v) AS cs, COUNT(*) AS ca
      |          FROM v GROUP BY 1, 2, 3),
      |tot AS (SELECT doc_id, w, h, SUM(v) AS ts, w*h AS ta
      |        FROM v GROUP BY doc_id, w, h),
      |ahp AS (SELECT c.doc_id,
      |  SUM(CASE WHEN c.cj*8+c.ci < 32 AND c.cs * t.ta >= t.ts * c.ca
      |      THEN CAST(POWER(2, c.cj*8 + c.ci) AS BIGINT) ELSE 0 END) AS lo,
      |  SUM(CASE WHEN c.cj*8+c.ci >= 32 AND c.cs * t.ta >= t.ts * c.ca
      |      THEN CAST(POWER(2, c.cj*8 + c.ci - 32) AS BIGINT) ELSE 0 END)
      |    AS hi
      |  FROM cells c JOIN tot t USING (doc_id) GROUP BY c.doc_id),
      |ah AS (SELECT doc_id,
      |  (CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
      |    * 4294967296 + lo AS ahash FROM ahp),
      |dh AS (SELECT l.doc_id,
      |  SUM(CASE WHEN r.cs * l.ca > l.cs * r.ca
      |      THEN CAST(POWER(2, l.cj*7 + l.ci) AS BIGINT) ELSE 0 END)
      |    AS dhash
      |  FROM cells l JOIN cells r ON r.doc_id = l.doc_id AND r.cj = l.cj
      |    AND r.ci = l.ci + 1
      |  WHERE l.ci < 7 GROUP BY l.doc_id),
      |rcell AS (SELECT doc_id, (x*10)//w AS u, (y*9)//h AS rv,
      |    SUM(v) AS cs, COUNT(*) AS ca FROM v GROUP BY 1, 2, 3),
      |rz AS (SELECT doc_id, SUM(cs // ca) AS rz_total FROM rcell
      |       GROUP BY doc_id)
      |SELECT t.doc_id, CAST(t.w AS INT) AS width, CAST(t.h AS INT) AS height,
      |  CAST(t.ts AS BIGINT) AS gray_total, CAST(ah.ahash AS BIGINT) AS ahash,
      |  CAST(dh.dhash AS BIGINT) AS dhash,
      |  CAST(rz.rz_total AS BIGINT) AS rz_total
      |FROM tot t JOIN ah USING (doc_id) JOIN dh USING (doc_id)
      |  JOIN rz USING (doc_id)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val payload = call_function("graft_synth_ppm",
      lit(16L) + d % 41, lit(12L) + (d * 5) % 29,
      lit(1L) + d % 7, lit(1L) + d % 11)
    t("documents").filter(d < 150)
      .select(d,
        call_function("graft_ppm_phash", payload).as("ph"),
        call_function("graft_ppm_phash",
          call_function("graft_ppm_resize", payload, lit(10L), lit(9L)))
          .as("rz"))
      .select(d, col("ph.width").as("width"), col("ph.height").as("height"),
        col("ph.gray_total").as("gray_total"), col("ph.ahash").as("ahash"),
        col("ph.dhash").as("dhash"), col("rz.gray_total").as("rz_total"))
      .orderBy(d)
  }

  /** Margin mining, production form ([[Similarity.marginMiningLsh]]):
    * candidates from shared random-hyperplane LSH buckets instead of the
    * |S|·|T| cross product (q181 is the exact audit ceiling; its own
    * scaladoc names this path). The oracle embeds the deterministic
    * plane-weight literals (q47 convention), replays the bucket join,
    * the in-order cosine folds, and the decimal neighborhood means. */
  val q200MarginLsh: (String, QueryDef) = q(
    "q200_margin_mining_lsh", {
      def projSql(p: Int): String = {
        val w = (0 until 64).map(d => java.lang.Double.toString(
          graft.operators.Similarity.planeWeight(42, p, d)))
          .mkString("[", ",", "]")
        s"list_reduce(list_transform(generate_series(1, 64), " +
          s"i -> CAST(embedding[i] AS DOUBLE) * ($w)[i]), (a, b) -> a + b)"
      }
      val bucket = (0 until 8).map(p =>
        s"(CASE WHEN ${projSql(p)} > 0 THEN ${1L << p} ELSE 0 END)")
        .mkString(" + ")
      val dot =
        """list_reduce(list_transform(list_zip(s.embedding, t.embedding),
          |p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)"""
          .stripMargin
      def sq(side: String): String =
        s"SQRT(list_reduce(list_transform($side.embedding, " +
          "x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (x,y) -> x+y))"
      s"""WITH b AS (
         |  SELECT vec_id, label, embedding, CAST($bucket AS BIGINT) AS bk
         |  FROM embeddings WHERE label IN (0, 1)),
         |s AS (SELECT vec_id, embedding, bk FROM b WHERE label = 0),
         |t AS (SELECT vec_id, embedding, bk FROM b WHERE label = 1),
         |cs AS (
         |  SELECT s.vec_id AS s_id, t.vec_id AS t_id,
         |    $dot / (${sq("s")} * ${sq("t")}) AS cos
         |  FROM s JOIN t ON s.bk = t.bk),
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
         |  CASE WHEN (rx + ry) > 0
         |    THEN c.cos / ((rx + ry) * 0.5) END AS margin
         |FROM cs c
         |JOIN rx ON rx.s_id = c.s_id
         |JOIN ry ON ry.t_id = c.t_id
         |ORDER BY margin DESC, s_id, t_id LIMIT 50""".stripMargin
    }) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.operators.Similarity.marginMiningLsh(t("embeddings"), "vec_id",
      "embedding", "label", srcLabel = 0, tgtLabel = 1, kNeigh = 4,
      topK = 50, planes = 8, seed = 42, dims = 64)
  }

  /** Perceptual-hash near-dup pairs ([[graft.operators.Dedup.hammingNearDupPairs]]
    * over `graft_ppm_phash` ahashes): the raster kernels composed into
    * the dedup machinery — triplets of identical synthesized images must
    * surface at hamming 0 through the pigeonhole band join (plus whatever
    * near-misses distinct gradients produce). The oracle replays the
    * per-pixel hash (q199 convention) and brute-forces ALL pairs — the
    * banding must lose nothing. */
  val q201PhashNearDup: (String, QueryDef) = q(
    "q201_phash_neardup",
    """WITH p AS (
      |  SELECT doc_id, doc_id // 3 AS g FROM documents WHERE doc_id < 240),
      |pp AS (
      |  SELECT doc_id, 16 + g % 37 AS w, 12 + (g*5) % 23 AS h,
      |         1 + g % 7 AS a, 1 + g % 11 AS b
      |  FROM p),
      |xs AS (SELECT pp.*, unnest(generate_series(0, w-1)) AS x FROM pp),
      |px AS (SELECT doc_id, w, h, a, b, x,
      |         unnest(generate_series(0, h-1)) AS y FROM xs),
      |v AS (SELECT doc_id, w, h, x, y, (x*a + y*b) % 256 AS v,
      |        (x*8)//w AS ci, (y*8)//h AS cj FROM px),
      |cells AS (SELECT doc_id, ci, cj, SUM(v) AS cs, COUNT(*) AS ca
      |          FROM v GROUP BY 1, 2, 3),
      |tot AS (SELECT doc_id, SUM(v) AS ts, w*h AS ta
      |        FROM v GROUP BY doc_id, w, h),
      |ahp AS (SELECT c.doc_id,
      |  SUM(CASE WHEN c.cj*8+c.ci < 32 AND c.cs * t.ta >= t.ts * c.ca
      |      THEN CAST(POWER(2, c.cj*8 + c.ci) AS BIGINT) ELSE 0 END) AS lo,
      |  SUM(CASE WHEN c.cj*8+c.ci >= 32 AND c.cs * t.ta >= t.ts * c.ca
      |      THEN CAST(POWER(2, c.cj*8 + c.ci - 32) AS BIGINT) ELSE 0 END)
      |    AS hi
      |  FROM cells c JOIN tot t USING (doc_id) GROUP BY c.doc_id),
      |ah AS (SELECT doc_id, CAST(
      |  (CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
      |    * 4294967296 + lo AS BIGINT) AS ahash FROM ahp)
      |SELECT a.doc_id AS d1, b.doc_id AS d2,
      |  CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) AS hamming
      |FROM ah a JOIN ah b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.ahash, b.ahash)) <= 3
      |ORDER BY d1, d2""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val g = expr("doc_id DIV 3")
    val payload = call_function("graft_synth_ppm",
      lit(16L) + g % 37, lit(12L) + (g * 5) % 23,
      lit(1L) + g % 7, lit(1L) + g % 11)
    val hashed = t("documents").filter(d < 240)
      .select(d, call_function("graft_ppm_phash", payload)
        .getField("ahash").as("h"))
    graft.operators.Dedup.hammingNearDupPairs(hashed, "doc_id", "h",
        bits = 64, maxHamming = 3)
      .orderBy(col("d1"), col("d2"))
  }

  /** Missing-fails-filters 3VL, catalog-anchored: sybil's rule that a
    * NULL column value fails EVERY filter — including negated ones
    * (filter.go:172-174,200-202; no null-rescue for neq) — previously
    * spec-only (DslSpec + DslFuzzSpec). Nulls are manufactured in-plan
    * (`nullif(lang, 'en')` — the fixture is null-free) so the 218 'en'
    * docs must vanish under `lang2 neq 'de'` in BOTH engines. */
  val q202Dsl3vl: (String, QueryDef) = q(
    "q202_dsl_3vl_filters",
    """SELECT source,
      |  CAST(COUNT(*) AS BIGINT) AS Count, COUNT(*) AS Samples
      |FROM (SELECT source, nullif(lang, 'en') AS lang2 FROM documents)
      |WHERE lang2 <> 'de'
      |GROUP BY source
      |ORDER BY Count DESC, source LIMIT 100""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.dsl.SybilQuery()
      .groupBy("source")
      .strFilterNeq("lang2", "de")
      .limitTo(100)
      .run(t("documents")
        .withColumn("lang2", nullif(col("lang"), lit("en"))))
  }

  /** Time-filter bucket alignment, catalog-anchored (filter.go:86-95;
    * previously spec-only): an int filter on the TIME column of a
    * time-series query is floored to the bucket boundary — the DSL
    * rewrites `ts_sec > 1704100000` to `> 1704099600` under 600 s
    * buckets, and the oracle states the FLOORED literal (the raw one
    * would disagree on the 400 s of straddle rows — exactly the
    * semantic this anchors). */
  val q203DslTimeAlign: (String, QueryDef) = q(
    "q203_dsl_time_align",
    """SELECT ((epoch_ns(ts) // 1000000000) // 600) * 600 AS time_bucket,
      |  event_type,
      |  CAST(COUNT(*) AS BIGINT) AS Count, COUNT(*) AS Samples
      |FROM events
      |WHERE (epoch_ns(ts) // 1000000000) > 1704099600
      |GROUP BY time_bucket, event_type
      |ORDER BY Count DESC, time_bucket, event_type LIMIT 100"""
      .stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.dsl.SybilQuery()
      .groupBy("event_type")
      .timeSeries("ts_sec", 600)
      .intFilterGt("ts_sec", 1704100000L) // NOT bucket-aligned on purpose
      .limitTo(100)
      .run(Tables.events(s, dir))
  }

  /** Multiple agg columns in one DSL query (previously spec-only): one
    * `-int value2,user_id -op avg` pass produces BOTH per-column
    * averages, each over its own POPULATED denominator
    * (aggregate.go:246-259), plus the shared Count/Samples — sybil's
    * multi-column aggregate surface. Nulls are manufactured in-plan
    * (the fixture is null-free) so value2's denominator genuinely
    * differs from Count — exactly the per-column-denominator semantic
    * this anchors. */
  val q204DslMultiAgg: (String, QueryDef) = q(
    "q204_dsl_multi_agg",
    """SELECT event_type,
      |  CAST(COUNT(*) AS BIGINT) AS Count, COUNT(*) AS Samples,
      |  CAST(SUM(CAST(value2 AS DECIMAL(38,6))) AS DOUBLE)
      |    / COUNT(value2) AS value2_avg,
      |  CAST(SUM(CAST(user_id AS DECIMAL(38,6))) AS DOUBLE)
      |    / COUNT(user_id) AS user_id_avg
      |FROM (SELECT event_type, user_id,
      |        CASE WHEN user_id % 7 = 0 THEN NULL ELSE value END AS value2
      |      FROM events)
      |GROUP BY event_type
      |ORDER BY Count DESC, event_type LIMIT 100""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.dsl.SybilQuery()
      .groupBy("event_type")
      .aggregate("value2", "user_id")
      .withOp(graft.dsl.AggOp.AvgOp)
      .limitTo(100)
      .run(Tables.events(s, dir).withColumn("value2",
        when(col("user_id") % 7 === 0, lit(null)).otherwise(col("value"))))
  }

  /** Isotonic calibration curve ([[graft.core.Stats.isotonicCalibration]]):
    * the monotone PAV fit of P(lang = 'en') against document length over
    * 12 equal-width n_chars bins — the map a filtering pipeline applies
    * between a raw quality score and a probability threshold (q144 AUC
    * diagnoses this score; q145 plots it; this CORRECTS it). The oracle
    * replays the max-min closed form: identical integer bin ids from the
    * same extents, every candidate span mean one IEEE division of exact
    * integer sums, min/max picking among identical doubles. */
  val q205IsotonicFit: (String, QueryDef) = q(
    "q205_isotonic_fit",
    """WITH src AS (
      |  SELECT CAST(n_chars AS BIGINT) AS s,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |  FROM documents WHERE n_chars IS NOT NULL),
      |ext AS (SELECT MIN(s) AS lo, MAX(s) AS hi FROM src),
      |b AS (
      |  SELECT ((s - lo) * 12) // (hi - lo + 1) AS bin,
      |    COUNT(*) AS n, SUM(y) AS n_pos
      |  FROM src CROSS JOIN ext GROUP BY 1),
      |a AS (
      |  SELECT j.bin AS j, k.bin AS k,
      |    CAST(SUM(m.n_pos) AS DOUBLE) / CAST(SUM(m.n) AS DOUBLE) AS a
      |  FROM b j JOIN b k ON j.bin <= k.bin
      |  JOIN b m ON m.bin >= j.bin AND m.bin <= k.bin
      |  GROUP BY 1, 2),
      |f AS (
      |  SELECT i, MAX(m) AS fitted FROM (
      |    SELECT a.j AS j, i.bin AS i, MIN(a.a) AS m
      |    FROM a JOIN b i ON a.j <= i.bin AND a.k >= i.bin
      |    GROUP BY 1, 2)
      |  GROUP BY 1)
      |SELECT b.bin AS bin, CAST(b.n AS BIGINT) AS n,
      |  CAST(b.n_pos AS BIGINT) AS n_pos,
      |  CAST(b.n_pos AS DOUBLE) / CAST(b.n AS DOUBLE) AS emp_rate,
      |  f.fitted AS fitted
      |FROM b JOIN f ON b.bin = f.i ORDER BY bin""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.core.Stats.isotonicCalibration(t("documents"),
        col("n_chars"), col("lang") === "en", bins = 12)
      .orderBy(col("bin"))
  }

  /** WAV PCM decode round trip ([[graft.expressions.WavPcm]] — the audio
    * twin of q199's pixel kernels): synthesize a mono 16-bit sawtooth
    * per document, decode the exact stream statistics an audio-curation
    * pass filters on (peak / loudness bases / zero crossings), block-mean
    * decimate 4×, and re-decode. The oracle replays the synthesis formula
    * arithmetically (generate_series + one lag window per signal) —
    * every value an exact integer, the container never parsed in SQL. */
  val q206WavPcm: (String, QueryDef) = q(
    "q206_wav_pcm",
    """WITH p AS (
      |  SELECT doc_id, 64 + (doc_id * 7) % 193 AS n,
      |    251 + (doc_id * 37) % 997 AS a, (doc_id * 13) % 4096 AS b
      |  FROM documents WHERE doc_id < 150),
      |s AS (
      |  SELECT doc_id, n, i, ((i * a + b) % 65536) - 32768 AS v
      |  FROM (SELECT p.*, unnest(generate_series(0, CAST(n - 1 AS BIGINT)))
      |          AS i FROM p)),
      |sl AS (
      |  SELECT doc_id, n, i, v,
      |    LAG(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
      |  FROM s),
      |st AS (
      |  SELECT doc_id, COUNT(*) AS n_samples, MAX(ABS(v)) AS peak,
      |    SUM(ABS(v)) AS sum_abs, SUM(v * v) AS sum_sq,
      |    SUM(CASE WHEN pv IS NOT NULL AND ((v < 0) <> (pv < 0))
      |        THEN 1 ELSE 0 END) AS zero_crossings
      |  FROM sl GROUP BY doc_id),
      |d AS (
      |  SELECT doc_id, i // 4 AS j, SUM(v) // 4 AS dv
      |  FROM s WHERE i // 4 < n // 4 GROUP BY doc_id, i // 4),
      |dl AS (
      |  SELECT doc_id, j, dv,
      |    LAG(dv) OVER (PARTITION BY doc_id ORDER BY j) AS pdv
      |  FROM d),
      |dst AS (
      |  SELECT doc_id, COUNT(*) AS d_n, MAX(ABS(dv)) AS d_peak,
      |    SUM(CASE WHEN pdv IS NOT NULL AND ((dv < 0) <> (pdv < 0))
      |        THEN 1 ELSE 0 END) AS d_zc
      |  FROM dl GROUP BY doc_id)
      |SELECT st.doc_id AS doc_id,
      |  CAST(n_samples AS BIGINT) AS n_samples,
      |  CAST(peak AS BIGINT) AS peak,
      |  CAST(sum_abs AS BIGINT) AS sum_abs,
      |  CAST(sum_sq AS BIGINT) AS sum_sq,
      |  CAST(zero_crossings AS BIGINT) AS zero_crossings,
      |  CAST(d_n AS BIGINT) AS d_n, CAST(d_peak AS BIGINT) AS d_peak,
      |  CAST(d_zc AS BIGINT) AS d_zc
      |FROM st JOIN dst ON st.doc_id = dst.doc_id
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val payload = call_function("graft_synth_wav",
      lit(64L) + (d * 7) % 193, lit(8000L),
      lit(251L) + (d * 37) % 997, (d * 13) % 4096)
    t("documents").filter(d < 150)
      .select(d,
        call_function("graft_wav_pcm_stats", payload).as("st"),
        call_function("graft_wav_pcm_stats",
          call_function("graft_wav_decimate", payload, lit(4L))).as("dst"))
      .select(d,
        col("st.n_samples").as("n_samples"), col("st.peak").as("peak"),
        col("st.sum_abs").as("sum_abs"), col("st.sum_sq").as("sum_sq"),
        col("st.zero_crossings").as("zero_crossings"),
        col("dst.n_samples").as("d_n"), col("dst.peak").as("d_peak"),
        col("dst.zero_crossings").as("d_zc"))
      .orderBy(d)
  }

  /** URL canonicalization + dedup ([[graft.expressions.UrlCanon]]): six
    * cosmetic variants of each synthesized page URL — uppercase
    * scheme/host, explicit default port, tracking params, fragment,
    * trailing slash, and r11's percent-encoding games (unreserved
    * octets encoded `%61`→`a`, a retained reserved triplet written in
    * lowercase hex `%3d`→`%3D`) — collapse onto one canonical dedup key
    * (the C4/CCNet URL-level dedup the crawl pipeline runs before any
    * content pass). The oracle rebuilds the canonical form directly
    * from the generating parts (the q206 convention — replay the
    * formula, never the parse): five variants fold into the bare page
    * key, the real `?a=1` query survives as its own key with the
    * tracking params stripped. */
  val q207UrlCanon: (String, QueryDef) = q(
    "q207_url_canon_dedup",
    """WITH p AS (
      |  SELECT doc_id, doc_id // 6 AS g, doc_id % 6 AS v
      |  FROM documents WHERE doc_id < 300),
      |c AS (
      |  SELECT doc_id,
      |    'http://ex' || CAST(g % 7 AS VARCHAR) || '.test' ||
      |    '/p' || CAST(g % 13 AS VARCHAR) || '/pa%3Dge' || CAST(g AS VARCHAR)
      |    || CASE WHEN v = 3 THEN '?a=1' ELSE '' END AS canon
      |  FROM p)
      |SELECT canon, CAST(COUNT(*) AS BIGINT) AS n_variants,
      |  CAST(MIN(doc_id) AS BIGINT) AS keep_id
      |FROM c GROUP BY canon ORDER BY canon""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val g = expr("doc_id div 6")
    val v = d % 6
    val host = concat(lit("ex"), (g % 7).cast("string"), lit(".test"))
    // the canonical path piece is "pa%3Dge" (a RETAINED reserved
    // triplet); variants re-spell it with lowercase hex (v=1), an
    // encoded unreserved 'e' (v=2), and an encoded unreserved 'a' (v=4)
    val pathAs = (piece: String) => concat(lit("/p"),
      (g % 13).cast("string"), lit("/" + piece), g.cast("string"))
    val path = pathAs("pa%3Dge")
    val raw = concat(
      when(v === 1, concat(lit("HTTP://"), upper(host)))
        .otherwise(concat(lit("http://"), host)),
      // r12: the default port is written zero-padded (":080") — leading
      // zeros carry no port semantics, so the canon must strip them
      // BEFORE the default-port compare for this variant to fold
      when(v === 2, lit(":080")).otherwise(lit("")),
      when(v === 1, pathAs("pa%3dge"))
        .when(v === 2, pathAs("pa%3Dg%65"))
        .when(v === 4, pathAs("p%61%3Dge"))
        .otherwise(path),
      when(v === 3, lit("?a=1&utm_source=x&utm_campaign=y"))
        .when(v === 4, lit("#frag"))
        .when(v === 5, lit("/"))
        .otherwise(lit("")))
    t("documents").filter(d < 300)
      .select(d, call_function("graft_canon_url", raw).as("canon"))
      .groupBy(col("canon"))
      .agg(count(lit(1)).as("n_variants"), min(d).as("keep_id"))
      .orderBy(col("canon"))
  }

  /** Unigram-tokenizer seed vocabulary ([[graft.operators.Unigram]] —
    * the SentencePiece family next to q157's BPE): every 1..4-gram
    * substring of every corpus word counted by word frequency, all
    * single characters force-kept (the coverage guarantee), top
    * multi-character pieces filling the remaining slots under the
    * (count desc, piece asc) total order. This is the trainer's exact
    * SQL-replayable stage — the Viterbi EM rounds on top of it are
    * spec-verified against an in-memory reference (no SQL engine can
    * replay the DP), the q32 exact-companion convention. */
  val q208UnigramSeed: (String, QueryDef) = q(
    "q208_unigram_seed",
    """WITH w AS (
      |  SELECT w, COUNT(*) AS freq FROM (
      |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE length(w) > 0 GROUP BY w),
      |xs AS (SELECT w, freq, unnest(generate_series(1, length(w))) AS i
      |       FROM w),
      |ps AS (SELECT substr(w, CAST(i AS INT), CAST(j - i + 1 AS INT))
      |         AS piece, freq
      |       FROM (SELECT w, freq, i,
      |               unnest(generate_series(i, least(i + 3, length(w))))
      |                 AS j
      |             FROM xs)),
      |c AS (SELECT piece, SUM(freq) AS cnt FROM ps GROUP BY piece),
      |ch AS (SELECT piece, cnt FROM c WHERE length(piece) = 1),
      |mu AS (SELECT piece, cnt FROM c WHERE length(piece) > 1
      |       QUALIFY ROW_NUMBER() OVER (ORDER BY cnt DESC, piece)
      |         <= 150 - (SELECT COUNT(*) FROM ch))
      |SELECT piece, CAST(cnt AS BIGINT) AS cnt
      |FROM (SELECT * FROM ch UNION ALL SELECT * FROM mu)
      |ORDER BY piece""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.operators.Unigram.seedVocab(t("documents"), "text",
        maxLen = 4, vocabSize = 150)
      .orderBy(col("piece"))
  }

  val catalog: Seq[(String, QueryDef)] =
    Seq(q197SkewedLinkage, q198SkewQuotaCap, q199PpmPhash, q200MarginLsh,
      q201PhashNearDup, q202Dsl3vl, q203DslTimeAlign, q204DslMultiAgg,
      q205IsotonicFit, q206WavPcm, q207UrlCanon, q208UnigramSeed)
}

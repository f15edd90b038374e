package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Graph, Linkage, Sampling, Similarity}

/** Catalog entries: round-12 additions — importance resampling, link
  * analysis, projection audits, leakage-safe temporal splits, and record
  * linkage.
  */
object Queries17 {

  private def t(name: String)(implicit env: (SparkSession, String)): DataFrame =
    Tables.load(env._1, env._2, name)

  private def q(name: String, sql: String = null)(
      body: (SparkSession, String) => DataFrame): (String, QueryDef) =
    name -> QueryDef(body, Option(sql))

  /** DSIR importance weights ([[Sampling.dsirWeights]]): rank documents
    * by how target-like (lang = 'en') their hashed-unigram profile is
    * relative to the whole corpus — the data-selection score that
    * upsamples toward a quality slice. Linear likelihood ratio with
    * add-one smoothing: integer-exact numerators, three IEEE ops, no
    * `ln` (the q75 discipline). */
  val q173DsirWeights: (String, QueryDef) = q(
    "q173_dsir_weights",
    """WITH toks AS (
      |  SELECT doc_id, tgt,
      |    CAST('0x' || substring(md5('dsir:' || t), 1, 8) AS BIGINT) % 256
      |      AS b
      |  FROM (SELECT doc_id, lang = 'en' AS tgt,
      |          unnest(string_split(text, ' ')) AS t
      |        FROM documents)),
      |dc AS (SELECT doc_id, b, COUNT(*) AS c FROM toks GROUP BY 1, 2),
      |rf AS (SELECT b, COUNT(*) AS r FROM toks GROUP BY b),
      |tf AS (SELECT b, COUNT(*) AS tf FROM toks WHERE tgt GROUP BY b),
      |tot AS (
      |  SELECT COUNT(*) AS rr,
      |    CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS tt
      |  FROM toks),
      |sc AS (
      |  SELECT doc_id,
      |    CAST(SUM(c) AS BIGINT) AS n_tokens,
      |    CAST(SUM(c * (COALESCE(tf, 0) + 1)) AS BIGINT) AS num,
      |    CAST(SUM(c * (r + 1)) AS BIGINT) AS den
      |  FROM dc JOIN rf USING (b) LEFT JOIN tf USING (b)
      |  GROUP BY doc_id)
      |SELECT doc_id, n_tokens, num, den,
      |  (CAST(num AS DOUBLE) / CAST(tt + 256 AS DOUBLE)) /
      |  (CAST(den AS DOUBLE) / CAST(rr + 256 AS DOUBLE)) AS score
      |FROM sc CROSS JOIN tot
      |ORDER BY score DESC, doc_id LIMIT 100""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    Sampling.dsirWeights(t("documents"), "doc_id", "text",
      col("lang") === "en", buckets = 256, salt = "dsir", topK = 100)
  }

  /** The PageRank oracle, generated per iteration: seed ranks, then each
    * round recomputes per-edge shares, the exact DECIMAL inflow sum, and
    * the damping update — the same plan the engine runs, unrolled. */
  private def pageRankOracleSql(iterations: Int): String = {
    val base =
      """WITH e AS (
        |  SELECT DISTINCT o_custkey AS src, 1000000 + l_partkey AS dst
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |  UNION ALL
        |  SELECT DISTINCT 1000000 + l_partkey AS src,
        |    2000000 + l_suppkey AS dst
        |  FROM lineitem),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |nn AS (SELECT COUNT(*) AS n FROM nodes),
        |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
        |r0 AS (SELECT node, 1.0 / CAST(n AS DOUBLE) AS rank
        |       FROM nodes CROSS JOIN nn)""".stripMargin
    val rounds = (1 to iterations).map { i =>
      s"""c$i AS (
         |  SELECT e.dst AS node, r.rank / CAST(d.deg AS DOUBLE) AS c
         |  FROM e JOIN r${i - 1} r ON r.node = e.src
         |  JOIN deg d ON d.src = e.src),
         |s$i AS (
         |  SELECT node, CAST(SUM(CAST(CAST(c AS VARCHAR) AS DECIMAL(38,12)))
         |    AS DOUBLE) AS s
         |  FROM c$i GROUP BY node),
         |r$i AS (
         |  SELECT nodes.node,
         |    (1.0 - 0.85) / CAST(n AS DOUBLE) + 0.85 * COALESCE(s, 0.0)
         |      AS rank
         |  FROM nodes CROSS JOIN nn
         |  LEFT JOIN s$i ON s$i.node = nodes.node)""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"""$base$rounds
       |SELECT node, rank FROM r$iterations
       |ORDER BY rank DESC, node LIMIT 50""".stripMargin
  }

  /** Fixed-iteration PageRank ([[Graph.pageRank]]) over the two-hop
    * procurement graph (customer → part → supplier): 3 rounds, d = 0.85,
    * top 50 authorities. The oracle replays every round exactly —
    * per-edge IEEE shares, DECIMAL(38,12) inflow accumulation, literal
    * damping arithmetic. */
  val q174PageRank: (String, QueryDef) = q(
    "q174_pagerank", pageRankOracleSql(3)) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val li = t("lineitem")
    val custPart = t("orders")
      .join(li, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("src"),
        (lit(1000000L) + col("l_partkey")).as("dst"))
      .distinct()
    val partSupp = li
      .select((lit(1000000L) + col("l_partkey")).as("src"),
        (lit(2000000L) + col("l_suppkey")).as("dst"))
      .distinct()
    Graph.pageRank(custPart.unionAll(partSupp), "src", "dst",
        iterations = 3, damping = 0.85)
      .orderBy(col("rank").desc, col("node")).limit(50)
  }

  /** The JL oracle: 16 projection folds per probe row from the SAME
    * hyperplane literals the engine uses, each per-element term rounded
    * into DECIMAL(38,12) and summed EXACTLY (order-free — DuckDB's
    * `list_reduce` is not a strict left fold over computed double lists,
    * so a raw double fold would drift a ULP; decimal accumulation
    * sidesteps the fold order entirely, mirroring `graft_dsum`), then
    * the identical left-associated pair arithmetic. The term cast goes
    * THROUGH VARCHAR: Spark (and `graft_dsum`) round a double's shortest
    * decimal repr into the decimal, DuckDB's direct cast rounds the
    * exact binary value — for full-precision products at scale 12 the
    * two disagree about once per ~10⁴ terms, and `CAST(CAST(x AS
    * VARCHAR) AS DECIMAL)` reproduces the repr-based rounding exactly. */
  private def jlOracleSql(probeN: Int, outDims: Int, seed: Int,
      dims: Int): String = {
    def projSql(p: Int): String = {
      val w = (0 until dims).map(d =>
        java.lang.Double.toString(Similarity.planeWeight(seed, p, d)))
        .mkString("[", ",", "]")
      s"CAST(list_reduce(list_transform(generate_series(1, $dims), " +
        s"i -> CAST(CAST(CAST(embedding[i] AS DOUBLE) * " +
        s"(CAST($w AS DOUBLE[]))[i] AS VARCHAR) AS DECIMAL(38,12))), " +
        "(x, y) -> x + y) AS DOUBLE)"
    }
    val projCols = (0 until outDims).map(p => s"${projSql(p)} AS y$p")
      .mkString(",\n    ")
    val ids = (0 until probeN).mkString(",")
    val d2p = (0 until outDims).map(p =>
      s"(a.y$p - b.y$p) * (a.y$p - b.y$p)").mkString(" + ")
    s"""WITH p AS (
       |  SELECT vec_id, embedding,
       |    $projCols
       |  FROM embeddings WHERE vec_id IN ($ids)),
       |d AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |    CAST(list_reduce(list_transform(generate_series(1, $dims),
       |      i -> CAST(CAST((CAST(a.embedding[i] AS DOUBLE) -
       |                 CAST(b.embedding[i] AS DOUBLE)) *
       |                (CAST(a.embedding[i] AS DOUBLE) -
       |                 CAST(b.embedding[i] AS DOUBLE))
       |           AS VARCHAR) AS DECIMAL(38,12))),
       |      (s, t) -> s + t) AS DOUBLE) AS d2_orig,
       |    ($d2p) * (3.0 / $outDims) AS d2_proj
       |  FROM p a JOIN p b ON a.vec_id < b.vec_id)
       |SELECT id_a, id_b, d2_orig, d2_proj,
       |  CASE WHEN d2_orig > 0 THEN d2_proj / d2_orig END AS ratio
       |FROM d ORDER BY id_a, id_b""".stripMargin
  }

  /** Johnson–Lindenstrauss distortion audit ([[Similarity.jlDistortion]]):
    * 64 → 16 dims over a 24-vector probe set (276 pairs), unbiased
    * `(3/k)`-scaled squared-distance ratios — the acceptance gauge for a
    * cheap projected ANN index. */
  val q175JlDistortion: (String, QueryDef) = q(
    "q175_jl_distortion", jlOracleSql(24, 16, 7, 64)) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    Similarity.jlDistortion(t("embeddings"), "vec_id", "embedding",
        probeIds = (0L until 24L).toSeq, outDims = 16, seed = 7, dims = 64)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Purged temporal split ([[Sampling.purgedTemporalSplit]]): 60% span
    * cut, 5% embargo, users active inside the embargo purged from test —
    * per-event-type counts plus the resolved boundaries. */
  val q176PurgedSplit: (String, QueryDef) = q(
    "q176_purged_split",
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_ns(ts) // 1000000000 AS s
      |  FROM events),
      |b AS (
      |  SELECT MIN(s) + ((MAX(s) - MIN(s)) * 60) // 100 AS t1,
      |         MIN(s) + ((MAX(s) - MIN(s)) * 65) // 100 AS t2
      |  FROM e),
      |z AS (
      |  SELECT user_id, event_type, t1, t2,
      |    CASE WHEN s <= t1 THEN 'train'
      |         WHEN s < t2 THEN 'embargo' ELSE 'test' END AS zone
      |  FROM e CROSS JOIN b),
      |p AS (SELECT DISTINCT user_id, TRUE AS pu FROM z
      |      WHERE zone = 'embargo'),
      |j AS (SELECT z.*, COALESCE(pu, FALSE) AS purged
      |      FROM z LEFT JOIN p USING (user_id))
      |SELECT event_type,
      |  CAST(SUM(CASE WHEN zone = 'train' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_train,
      |  CAST(SUM(CASE WHEN zone = 'embargo' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_embargo,
      |  CAST(SUM(CASE WHEN zone = 'test' AND NOT purged THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_test,
      |  CAST(SUM(CASE WHEN zone = 'test' AND purged THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_test_purged,
      |  MIN(t1) AS t_cut, MIN(t2) AS t_test_start
      |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin) {
    (s, dir) =>
      implicit val env: (SparkSession, String) = (s, dir)
      Sampling.purgedTemporalSplit(Tables.events(s, dir), "user_id",
          col("ts_sec"), "event_type",
          trainPctOfSpan = 60, embargoPctOfSpan = 5)
        .orderBy(col("event_type"))
  }

  /** Record linkage ([[Linkage.fsLink]]): match the customer registry to
    * a simulated dirty re-import (uppercased names with a legal suffix,
    * truncated balances, a third of the nation codes bumped — the q160
    * re-crawl convention). Blocking on (segment, balance UNIT) — r11
    * re-block: the original balance-CENTURY key had ~550 possible blocks
    * total, so occupancy grew with the corpus and candidate pairs grew
    * quadratically (measured: executor-CPU exponent 2.2 at sf1→sf3,
    * masked in wall time by idle cores). Unit granularity keeps every
    * true match (b's balance is floor(a's), so both land in the same
    * unit block) with ~100× fewer pairs per row; see Linkage.fsLink's
    * scaladoc for the bounded-cardinality caveat and the
    * sorted-neighborhood escape (q111). Integer Fellegi–Sunter weights;
    * `true_match` is the hidden key the score is judged against. */
  val q177RecordLinkage: (String, QueryDef) = q(
    "q177_record_linkage",
    """WITH a AS (
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
      |    c_mktsegment || ':' ||
      |      CAST(CAST(FLOOR(c_acctbal) AS BIGINT) AS VARCHAR)
      |      AS block
      |  FROM customer),
      |b AS (
      |  SELECT c_custkey + 500000 AS id_b,
      |    upper(c_name) || ' INC' AS name_b,
      |    CASE WHEN c_custkey % 3 = 0 THEN c_nationkey + 1
      |         ELSE c_nationkey END AS nation_b,
      |    CAST(FLOOR(c_acctbal) AS BIGINT) AS bal_b,
      |    c_mktsegment || ':' ||
      |      CAST(CAST(FLOOR(c_acctbal) AS BIGINT) AS VARCHAR) AS block
      |  FROM customer),
      |pairs AS (
      |  SELECT a.c_custkey AS id_a, b.id_b,
      |    upper(a.c_name) = regexp_replace(b.name_b, ' INC$', '')
      |      AS agree_name,
      |    a.c_nationkey = b.nation_b AS agree_nation,
      |    abs(a.c_acctbal - CAST(b.bal_b AS DOUBLE)) < 1.0 AS agree_bal
      |  FROM a JOIN b USING (block)),
      |scored AS (
      |  SELECT *,
      |    (CASE WHEN agree_name THEN 5 ELSE -3 END) +
      |    (CASE WHEN agree_nation THEN 3 ELSE -2 END) +
      |    (CASE WHEN agree_bal THEN 2 ELSE -2 END) AS score
      |  FROM pairs)
      |SELECT id_a, id_b, agree_name, agree_nation, agree_bal,
      |  CAST(score AS BIGINT) AS score, score >= 6 AS is_match,
      |  id_b = id_a + 500000 AS true_match
      |FROM scored
      |ORDER BY score DESC, id_a, id_b LIMIT 200""".stripMargin) {
    (s, dir) =>
      implicit val env: (SparkSession, String) = (s, dir)
      val cust = t("customer")
      val blockA = concat(col("c_mktsegment"), lit(":"),
        floor(col("c_acctbal")).cast("long").cast("string"))
      val a = cust.select(col("c_custkey"), col("c_name"),
        col("c_nationkey"), col("c_acctbal"), blockA.as("block"))
      val balB = floor(col("c_acctbal")).cast("long")
      val b = cust.select(
        (col("c_custkey") + 500000L).as("reg_id"),
        concat(upper(col("c_name")), lit(" INC")).as("name"),
        when(col("c_custkey") % 3 === 0, col("c_nationkey") + 1)
          .otherwise(col("c_nationkey")).as("nation"),
        balB.as("bal"),
        concat(col("c_mktsegment"), lit(":"),
          balB.cast("string")).as("block"))
      Linkage.fsLink(a, "c_custkey", b, "reg_id",
          blockCols = Seq("block"),
          rules = Seq(
            Linkage.FieldRule("name",
              upper(col("c_name")) ===
                regexp_replace(col("name_b"), " INC$", ""), 5, -3),
            Linkage.FieldRule("nation",
              col("c_nationkey") === col("nation_b"), 3, -2),
            Linkage.FieldRule("bal",
              abs(col("c_acctbal") - col("bal_b").cast("double")) < 1.0,
              2, -2)),
          threshold = 6)
        .withColumn("true_match", col("id_b") === col("id_a") + 500000L)
        .select(col("id_a"), col("id_b"), col("agree_name"),
          col("agree_nation"), col("agree_bal"), col("score"),
          col("is_match"), col("true_match"))
        .orderBy(col("score").desc, col("id_a"), col("id_b")).limit(200)
  }

  val catalog: Seq[(String, QueryDef)] =
    Seq(q173DsirWeights, q174PageRank, q175JlDistortion, q176PurgedSplit,
      q177RecordLinkage)
}

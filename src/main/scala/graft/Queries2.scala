package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.core.Tables

/** Catalog expansion: percentiles, window functions, the full join-shape
  * family (semi/anti/union/distinct), similarity search over embeddings,
  * and MinHash/Jaccard near-dup detection.
  *
  * Scale notes (100 TB thinking): the similarity/minhash queries are all
  * blocked — the self-joins key on a band signature or a coarse partition
  * (label), never a cross join; candidate generation is O(collisions), not
  * O(n²). Window queries partition by a high-cardinality key (user_id) so
  * state per partition stays tiny.
  */
object Queries2 {

  private def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(38, scale))).cast(DoubleType)

  private def dsumSql(e: String, scale: Int = 4): String =
    s"CAST(SUM(CAST($e AS DECIMAL(38,$scale))) AS DOUBLE)"

  private def t(name: String)(implicit env: (SparkSession, String)): DataFrame =
    if (name == "events") Tables.events(env._1, env._2)
    else Tables.load(env._1, env._2, name)

  private def q(name: String, sql: String = null)(
      body: (SparkSession, String) => DataFrame): (String, QueryDef) =
    name -> QueryDef(body, Option(sql))

  // ---- sybil percentiles (hist GetPercentiles analog; exact interpolated) --

  val q25Percentile: (String, QueryDef) = q(
    "q25_percentile",
    """SELECT event_type,
      |quantile_cont(value, 0.25) AS p25,
      |quantile_cont(value, 0.50) AS p50,
      |quantile_cont(value, 0.90) AS p90
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    t("events").groupBy(col("event_type"))
      .agg(
        expr("percentile(value, 0.25)").as("p25"),
        expr("percentile(value, 0.50)").as("p50"),
        expr("percentile(value, 0.90)").as("p90"))
      .orderBy(col("event_type"))
  }

  // ---- window functions: first-k-per-key (sessionization building block) --

  val q26Window: (String, QueryDef) = q(
    "q26_window_firstk",
    s"""SELECT event_type, COUNT(*) AS cnt, ${dsumSql("value")} AS sum_value
       |FROM (
       |  SELECT event_type, value,
       |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
       |  FROM events)
       |WHERE rn <= 3 GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t("events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
      .orderBy(col("event_type"))
  }

  // ---- join shapes -------------------------------------------------------

  /** TPC-H Q5 shape: star join through region→nation→supplier with the
    * dims broadcast; only lineitem×orders shuffles. */
  val q27JoinStar: (String, QueryDef) = q(
    "q27_join_star",
    s"""SELECT n_name, COUNT(*) AS cnt,
       |${dsumSql("l_extendedprice*(1-l_discount)", 6)} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE o_orderstatus <> 'P'
       |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    t("lineitem")
      .join(t("orders").filter(col("o_orderstatus") =!= "P"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t("supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t("nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t("region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("cnt"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"))
      .orderBy(col("n_name"))
  }

  /** Semi join (EXISTS) — TPC-H Q4 shape. */
  val q28SemiJoin: (String, QueryDef) = q(
    "q28_semi_join",
    """SELECT o_orderpriority, COUNT(*) AS cnt FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    t("orders")
      .join(t("lineitem").filter(col("l_quantity") > 45),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("o_orderpriority"))
  }

  /** Anti join (NOT EXISTS): customers without orders. */
  val q29AntiJoin: (String, QueryDef) = q(
    "q29_anti_join",
    """SELECT c_mktsegment, COUNT(*) AS cnt FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    t("customer")
      .join(t("orders").filter(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("c_mktsegment"))
  }

  /** UNION ALL of filtered branches (sybil's implicit block union). */
  val q30Union: (String, QueryDef) = q(
    "q30_union",
    s"""SELECT src, COUNT(*) AS cnt, ${dsumSql("value")} AS sum_value FROM (
       |  SELECT 'hi' AS src, value FROM events WHERE value > 400
       |  UNION ALL
       |  SELECT 'lo' AS src, value FROM events WHERE value < 10
       |) GROUP BY src ORDER BY src""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val ev = t("events")
    ev.filter(col("value") > 400).select(lit("hi").as("src"), col("value"))
      .unionAll(ev.filter(col("value") < 10).select(lit("lo").as("src"), col("value")))
      .groupBy(col("src"))
      .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
      .orderBy(col("src"))
  }

  /** SELECT DISTINCT (dedup as a relational op). */
  val q31DistinctRows: (String, QueryDef) = q(
    "q31_distinct_rows",
    """SELECT DISTINCT event_type, user_id % 10 AS u_mod FROM events
      |ORDER BY event_type, u_mod""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    t("events")
      .select(col("event_type"), (col("user_id") % 10).as("u_mod"))
      .distinct()
      .orderBy(col("event_type"), col("u_mod"))
  }

  /** Approximate count-distinct (HLL, sybil `-op distinct` — printer.go HLL
    * path). The sketch estimate is engine-specific, so the catalog output is
    * the exact count plus a *hash-stateable bound assertion*: the HLL
    * estimate is a deterministic function of the data, and the query emits
    * `approx_within_tol = 1` iff `abs(est/exact - 1) <= 0.1`. The oracle
    * states the same exact counts and the literal `1` — a drifting or
    * broken sketch flips the flag and fails the hash gate. */
  val q32ApproxDistinct: (String, QueryDef) = q(
    "q32_approx_distinct",
    """SELECT event_type,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
      |  CAST(1 AS BIGINT) AS approx_within_tol
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    t("events").groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"),
        hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("approx_users"))
      .select(col("event_type"), col("exact_users"),
        // an all-null group has exact 0: the ratio would be null/NaN and
        // the flag would falsely fail — an empty set's estimate must
        // simply be 0
        when(col("exact_users") === 0L,
            when(col("approx_users") === 0.0, 1L).otherwise(0L))
          .when(abs(col("approx_users") /
            col("exact_users").cast("double") - 1.0) <= 0.1, 1L)
          .otherwise(0L).as("approx_within_tol"))
      .orderBy(col("event_type"))
  }

  // ---- similarity search over embeddings ---------------------------------

  private val dotSql =
    """list_reduce(list_transform(list_zip(a.embedding, b.embedding),
      |p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)""".stripMargin

  /** Brute-force cosine top-k against one query vector (ANN baseline).
    * Query side is a 1-row broadcast; scan side streams — at scale this is
    * one pass over the table, no shuffle. */
  val q33AnnBrute: (String, QueryDef) = q(
    "q33_ann_bruteforce",
    s"""WITH qv AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
       |SELECT b.vec_id,
       |$dotSql /
       | (SQRT(list_reduce(list_transform(a.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (x,y) -> x+y)) *
       |  SQRT(list_reduce(list_transform(b.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (x,y) -> x+y))) AS sim
       |FROM qv a, embeddings b
       |WHERE b.vec_id <> 0
       |ORDER BY sim DESC, b.vec_id LIMIT 10""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.operators.Similarity.cosineTopK(
      t("embeddings"), "vec_id", "embedding", queryId = 0, k = 10)
  }

  /** Embedding near-dup pairs, blocked by `label` (a coarse IVF-style
    * partition): only intra-bucket pairs are scored → candidate generation
    * is a per-bucket self-join, not O(n²). */
  val q34EmbeddingPairs: (String, QueryDef) = q(
    "q34_embedding_dup_pairs",
    s"""SELECT a.vec_id AS id1, b.vec_id AS id2,
       |$dotSql AS dot
       |FROM embeddings a JOIN embeddings b
       |  ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE $dotSql > 0.25
       |ORDER BY id1, id2""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.operators.Similarity.blockedPairs(
      t("embeddings"), "vec_id", "embedding", "label", minDot = 0.25)
      .orderBy(col("id1"), col("id2"))
  }

  // ---- MinHash / Jaccard near-dup detection ------------------------------

  private val shinglesSql =
    "list_transform(range(1, len(string_split(text,' '))-1), i -> array_to_string((string_split(text,' '))[i:i+2], ' '))"

  /** Per-document MinHash signature, k=4 hash functions (md5 with a seed
    * prefix — identical hex in both engines; lexicographic min). */
  val q35Minhash: (String, QueryDef) = q(
    "q35_minhash_signature",
    s"""WITH s AS (
       |  SELECT doc_id, $shinglesSql AS sh FROM documents
       |  WHERE len(string_split(text,' ')) >= 3)
       |SELECT doc_id,
       |  list_min(list_transform(sh, x -> md5('1:' || x))) AS mh1,
       |  list_min(list_transform(sh, x -> md5('2:' || x))) AS mh2,
       |  list_min(list_transform(sh, x -> md5('3:' || x))) AS mh3,
       |  list_min(list_transform(sh, x -> md5('4:' || x))) AS mh4
       |FROM s ORDER BY doc_id LIMIT 100""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    // all 4 seed minima in ONE fused pass (graft_minhash); the array is
    // split into columns only after the limit, so neither the shingles nor
    // the hashes are ever recomputed per seed (CollapseProject would inline
    // a per-column formulation 4x)
    t("documents")
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"),
        call_function("graft_minhash", split(col("text"), " "), lit(4)).as("mha"))
      .orderBy(col("doc_id"))
      .limit(100)
      .select(col("doc_id"),
        element_at(col("mha"), 1).as("mh1"), element_at(col("mha"), 2).as("mh2"),
        element_at(col("mha"), 3).as("mh3"), element_at(col("mha"), 4).as("mh4"))
  }

  /** Shared CTE text for signature-based SQL (sig → 4 minhashes/doc). */
  private val sigSql =
    s"""s AS (
       |  SELECT doc_id, $shinglesSql AS sh FROM documents
       |  WHERE len(string_split(text,' ')) >= 3),
       |sig AS (
       |  SELECT doc_id,
       |    list_min(list_transform(sh, x -> md5('1:' || x))) AS mh1,
       |    list_min(list_transform(sh, x -> md5('2:' || x))) AS mh2,
       |    list_min(list_transform(sh, x -> md5('3:' || x))) AS mh3,
       |    list_min(list_transform(sh, x -> md5('4:' || x))) AS mh4
       |  FROM s),
       |bands AS (
       |  SELECT doc_id, 1 AS band, mh1 || mh2 AS mh FROM sig
       |  UNION ALL SELECT doc_id, 2, mh3 || mh4 FROM sig),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id)""".stripMargin

  /** LSH candidate pairs: 4 bands of 1 hash — docs sharing any band bucket.
    * A single shuffle join on (band, minhash); never a cross join. */
  val q36MinhashPairs: (String, QueryDef) = q(
    "q36_minhash_pairs",
    s"""WITH $sigSql
       |SELECT d1, d2 FROM pairs ORDER BY d1, d2""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    graft.operators.Dedup.lshCandidates(
      graft.operators.Dedup.minhashBands(t("documents"), "doc_id", "text"), "doc_id")
      .orderBy(col("d1"), col("d2"))
  }

  /** Exact n-gram Jaccard, verified ONLY on the LSH candidate pairs — the
    * scalable two-stage near-dup pipeline (candidate generation is
    * O(band collisions); the O(shingles) set intersection runs per
    * candidate, not per document pair). |A∩B| and |A∪B| are integers, so
    * the division is engine-deterministic. */
  val q37Jaccard: (String, QueryDef) = q(
    "q37_ngram_jaccard",
    s"""WITH $sigSql,
       |shset AS (
       |  SELECT doc_id, list_distinct(sh) AS shd FROM s)
       |SELECT d1, d2,
       |  CAST(len(list_intersect(x.shd, y.shd)) AS DOUBLE) /
       |  len(list_distinct(list_concat(x.shd, y.shd))) AS jaccard
       |FROM pairs JOIN shset x ON x.doc_id = d1 JOIN shset y ON y.doc_id = d2
       |ORDER BY jaccard DESC, d1, d2 LIMIT 200""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    import graft.operators.Dedup
    val docs = t("documents")
    Dedup.jaccardVerify(docs,
        Dedup.lshCandidates(Dedup.minhashBands(docs, "doc_id", "text"), "doc_id"),
        "doc_id", "text", threshold = 0.0)
      .orderBy(col("jaccard").desc, col("d1"), col("d2"))
      .limit(200)
  }

  /** Document fingerprint: canonical hash of the sorted distinct vocabulary
    * (rolling-hash-style content fingerprint, engine-identical md5). */
  val q38Fingerprint: (String, QueryDef) = q(
    "q38_fingerprint",
    """SELECT doc_id,
      |md5(array_to_string(list_sort(list_distinct(string_split(text,' '))), ' ')) AS fp
      |FROM documents ORDER BY doc_id LIMIT 50""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    t("documents")
      .select(col("doc_id"),
        md5(concat_ws(" ", array_sort(array_distinct(split(col("text"), " "))))).as("fp"))
      .orderBy(col("doc_id"))
      .limit(50)
  }

  val catalog: Seq[(String, QueryDef)] = Seq(
    q25Percentile, q26Window, q27JoinStar, q28SemiJoin, q29AntiJoin,
    q30Union, q31DistinctRows, q32ApproxDistinct, q33AnnBrute,
    q34EmbeddingPairs, q35Minhash, q36MinhashPairs, q37Jaccard, q38Fingerprint)
}

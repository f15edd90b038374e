package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Linkage, Sampling}

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

  val catalog: Seq[(String, QueryDef)] =
    Seq(q197SkewedLinkage, q198SkewQuotaCap)
}

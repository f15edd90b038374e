package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.core.Tables

/** One catalog entry: the Spark implementation and (when SQL-expressible)
  * the DuckDB oracle equivalent the driver hash-compares against.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** The operator catalog. Every operator from SURVEY.md §2 (sybil's query
  * surface: scan → conjunctive filters → group-by → {count, weighted count,
  * avg, sum, min/max, stddev, hist, percentiles, count-distinct} →
  * time-bucket → sort/limit, plus samples/str-replace), joins, and the
  * training-data-pipeline extensions (dedup, similarity search, text
  * analysis) is exercised by at least one entry here.
  *
  * Determinism rules (the driver compares results against DuckDB by value
  * hash, so floating point must be bit-identical):
  *  - sums of doubles go through exact DECIMAL accumulation, then one final
  *    cast to double (same nearest-double in both engines);
  *  - averages are `exact-sum-as-double / count` (one IEEE division);
  *  - every query ends in a total ORDER BY over a deterministic key.
  */
object Queries {

  /** Exact sum of a double expression: cast each value to decimal (fixed
    * rounding), sum exactly, convert once to double. Order-independent —
    * safe under any partitioning/merge order, unlike naive double sums.
    */
  /** The native int128 exact-decimal sum (expressions/DecimalSum.scala):
    * bit-identical to `CAST(SUM(CAST(c AS DECIMAL(38,scale))) AS DOUBLE)`
    * — same shortest-repr HALF_UP scaling per value, same nearest-double
    * final conversion (property-tested in ExpressionsSpec) — at ~3.5x the
    * throughput of the BigDecimal-backed decimal aggregation buffer. */
  private def dsum(c: Column, scale: Int = 4): Column =
    call_function("graft_dsum", c, lit(scale))

  /** SQL twin of [[dsum]]. */
  private def dsumSql(e: String, scale: Int = 4): String =
    s"CAST(SUM(CAST($e AS DECIMAL(38,$scale))) AS DOUBLE)"

  private def t(name: String)(implicit env: (SparkSession, String)): DataFrame =
    if (name == "events") Tables.events(env._1, env._2)
    else Tables.load(env._1, env._2, name)

  private def q(name: String, sql: String = null)(
      body: (SparkSession, String) => DataFrame): (String, QueryDef) =
    name -> QueryDef(body, Option(sql))

  // ---------------------------------------------------------------------
  // Sybil-parity aggregation surface (SURVEY.md §2.4, §2.5, §2.6)
  // ---------------------------------------------------------------------

  /** TPC-H Q1-shaped pricing summary; the flagship scan→filter→group→agg. */
  val q1PricingSummary: (String, QueryDef) = q(
    "q01_pricing_summary",
    s"""SELECT l_returnflag, l_linestatus,
       |${dsumSql("l_quantity")} AS sum_qty,
       |${dsumSql("l_extendedprice")} AS sum_base_price,
       |${dsumSql("l_extendedprice*(1-l_discount)", 6)} AS sum_disc_price,
       |${dsumSql("l_extendedprice*(1-l_discount)*(1+l_tax)", 6)} AS sum_charge,
       |${dsumSql("l_quantity")}/COUNT(*) AS avg_qty,
       |${dsumSql("l_discount")}/COUNT(*) AS avg_disc,
       |COUNT(*) AS count_order
       |FROM lineitem
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    t("lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("sum_charge"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_discount")) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Plain group count (sybil `-op count`). */
  val q2Count: (String, QueryDef) = q(
    "q02_group_count",
    """SELECT event_type, COUNT(*) AS cnt
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    t("events").groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("event_type"))
  }

  /** Weighted count + samples + weighted avg (sybil `-weight-col`,
    * /root/reference/src/lib/aggregate.go:68,100-102). */
  val q3Weighted: (String, QueryDef) = q(
    "q03_weighted_avg",
    s"""SELECT l_returnflag,
       |${dsumSql("l_quantity")} AS weighted_count,
       |COUNT(*) AS samples,
       |${dsumSql("l_extendedprice*l_quantity", 6)}/${dsumSql("l_quantity")} AS weighted_avg
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    t("lineitem").groupBy(col("l_returnflag"))
      .agg(
        dsum(col("l_quantity")).as("weighted_count"),
        count(lit(1)).as("samples"),
        (dsum(col("l_extendedprice") * col("l_quantity"), 6) / dsum(col("l_quantity"))).as("weighted_avg"))
      .orderBy(col("l_returnflag"))
  }

  /** avg (sybil `-op avg`). */
  val q4Avg: (String, QueryDef) = q(
    "q04_avg",
    s"""SELECT event_type, ${dsumSql("value")}/COUNT(*) AS avg_value, COUNT(*) AS cnt
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    t("events").groupBy(col("event_type"))
      .agg((dsum(col("value")) / count(lit(1))).as("avg_value"), count(lit(1)).as("cnt"))
      .orderBy(col("event_type"))
  }

  /** min / max extents (drives hist bucket setup in the reference,
    * table_column_info.go). */
  val q5MinMax: (String, QueryDef) = q(
    "q05_minmax",
    """SELECT event_type, MIN(value) AS min_v, MAX(value) AS max_v,
      |MIN(user_id) AS min_u, MAX(user_id) AS max_u
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    t("events").groupBy(col("event_type"))
      .agg(min(col("value")).as("min_v"), max(col("value")).as("max_v"),
        min(col("user_id")).as("min_u"), max(col("user_id")).as("max_u"))
      .orderBy(col("event_type"))
  }

  /** Population stddev from exact sums (deterministic across engines). */
  val q6Stddev: (String, QueryDef) = q(
    "q06_stddev",
    s"""SELECT event_type,
       |SQRT(${dsumSql("value*value", 8)}/COUNT(*) -
       |(${dsumSql("value")}/COUNT(*))*(${dsumSql("value")}/COUNT(*))) AS stddev_value
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val n = count(lit(1))
    val mean = dsum(col("value")) / n
    t("events").groupBy(col("event_type"))
      .agg(sqrt(dsum(col("value") * col("value"), 8) / n - mean * mean).as("stddev_value"))
      .orderBy(col("event_type"))
  }

  /** Time-bucketed group-by — sybil `-time -time-bucket 300`
    * (aggregate.go:145-183): integer floor of epoch seconds. */
  val q7TimeBucket: (String, QueryDef) = q(
    "q07_time_bucket",
    s"""SELECT ((epoch_ns(ts) // 1000000000) // 300) * 300 AS bucket, event_type,
       |COUNT(*) AS cnt, ${dsumSql("value")} AS sum_value
       |FROM events GROUP BY bucket, event_type ORDER BY bucket, event_type""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    t("events")
      .groupBy((expr("ts_sec div 300") * 300).as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
      .orderBy(col("bucket"), col("event_type"))
  }

  // ---------------------------------------------------------------------
  // Filter surface (SURVEY.md §2.2): int gt/lt/eq/neq, str eq/neq/re/nre,
  // set in/nin, conjunction-only composition.
  // ---------------------------------------------------------------------

  val q8IntFilters: (String, QueryDef) = q(
    "q08_int_filters",
    s"""SELECT event_type, COUNT(*) AS cnt, ${dsumSql("value")} AS sum_value
       |FROM events
       |WHERE value > 100 AND user_id < 100 AND user_id <> 13 AND event_id >= 5
       |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    t("events")
      .filter(col("value") > 100 && col("user_id") < 100 &&
        col("user_id") =!= 13 && col("event_id") >= 5)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
      .orderBy(col("event_type"))
  }

  val q9StrFilters: (String, QueryDef) = q(
    "q09_str_filters",
    """SELECT event_type, COUNT(*) AS cnt
      |FROM events
      |WHERE regexp_matches(event_type, '^(purchase|signup|view)$')
      |  AND event_type <> 'view' AND NOT regexp_matches(event_type, 'up$')
      |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    t("events")
      .filter(col("event_type").rlike("^(purchase|signup|view)$") &&
        col("event_type") =!= "view" && !col("event_type").rlike("up$"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("event_type"))
  }

  /** set in/nin — array membership (sybil SetFilter, filter.go:252-285). */
  val q10SetFilter: (String, QueryDef) = q(
    "q10_set_filter",
    """SELECT lang, COUNT(*) AS cnt
      |FROM documents
      |WHERE list_contains(string_split(text, ' '), 'spark')
      |  AND NOT list_contains(string_split(text, ' '), 'flink')
      |GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val toks = split(col("text"), " ")
    t("documents")
      .filter(array_contains(toks, "spark") && !array_contains(toks, "flink"))
      .groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("lang"))
  }

  /** str-replace pre-transform (sybil `str-replace`, table_query.go:34-51). */
  val q11StrReplace: (String, QueryDef) = q(
    "q11_str_replace",
    """SELECT regexp_replace(event_type, '[aeiou]', '*', 'g') AS masked, COUNT(*) AS cnt
      |FROM events GROUP BY masked ORDER BY masked""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    t("events")
      .groupBy(regexp_replace(col("event_type"), "[aeiou]", "*").as("masked"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("masked"))
  }

  // ---------------------------------------------------------------------
  // Samples / top-k / distinct / TOTAL row (SURVEY.md §2.4, §2.6, §2.7)
  // ---------------------------------------------------------------------

  /** `-samples`: raw matched records, newest first, limited. */
  val q12Samples: (String, QueryDef) = q(
    "q12_samples",
    """SELECT event_id, user_id, value, epoch_ns(ts) // 1000000000 AS ts_sec
      |FROM events WHERE event_type = 'purchase'
      |ORDER BY ts_sec DESC, event_id LIMIT 20""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    t("events").filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("value"), col("ts_sec"))
      .orderBy(col("ts_sec").desc, col("event_id"))
      .limit(20)
  }

  /** Exact top-k by count (sybil sorts by `$COUNT` desc + limit). */
  val q13TopK: (String, QueryDef) = q(
    "q13_topk",
    """SELECT user_id, COUNT(*) AS cnt FROM events
      |GROUP BY user_id ORDER BY cnt DESC, user_id LIMIT 10""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    t("events").groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("user_id"))
      .limit(10)
  }

  /** Exact count-distinct (sybil `-op distinct` exact mode for oracle). */
  val q14Distinct: (String, QueryDef) = q(
    "q14_distinct",
    """SELECT event_type, COUNT(DISTINCT user_id) AS users
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    t("events").groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("users"))
      .orderBy(col("event_type"))
  }

  /** Cumulative TOTAL row alongside per-group rows (aggregate.go:422-428). */
  val q15Total: (String, QueryDef) = q(
    "q15_total_row",
    s"""SELECT COALESCE(l_returnflag, 'TOTAL') AS flag, COUNT(*) AS cnt,
       |${dsumSql("l_quantity")} AS sum_qty
       |FROM lineitem GROUP BY ROLLUP(l_returnflag) ORDER BY flag""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    t("lineitem").rollup(col("l_returnflag"))
      .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("TOTAL")).as("flag"),
        col("cnt"), col("sum_qty"))
      .orderBy(col("flag"))
  }

  /** Fixed-width histogram buckets (sybil BasicHist bucket counts,
    * hist_basic.go — width derived from column extent / NUM_BUCKETS; here a
    * width-7 bucketing of l_quantity∈[1,50]). */
  val q16Hist: (String, QueryDef) = q(
    "q16_hist_buckets",
    """SELECT CAST(FLOOR((l_quantity - 1.0)/7.0) AS BIGINT) AS bucket,
      |COUNT(*) AS cnt
      |FROM lineitem GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    t("lineitem")
      .groupBy(floor((col("l_quantity") - 1.0) / 7.0).cast("long").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("bucket"))
  }

  // ---------------------------------------------------------------------
  // Joins (north-star extension; sybil itself has none — README.md:32)
  // ---------------------------------------------------------------------

  /** Fact ⋈ small dim — broadcast join, no shuffle of the fact table. */
  val q17JoinBroadcast: (String, QueryDef) = q(
    "q17_join_broadcast",
    s"""SELECT p_brand, COUNT(*) AS cnt,
       |${dsumSql("l_extendedprice")} AS revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    t("lineitem").join(broadcast(t("part")), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("cnt"), dsum(col("l_extendedprice")).as("revenue"))
      .orderBy(col("p_brand"))
  }

  /** 3-way join, TPC-H Q3 shape: shuffle join on the two big tables,
    * broadcast of the filtered dim. */
  val q18JoinShipping: (String, QueryDef) = q(
    "q18_join_shipping",
    s"""SELECT o_orderkey,
       |${dsumSql("l_extendedprice*(1-l_discount)", 6)} AS revenue,
       |CAST(o_orderdate AS DATE) AS odate
       |FROM customer JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |GROUP BY o_orderkey, odate
       |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val cust = t("customer").filter(col("c_mktsegment") === "BUILDING")
    t("lineitem")
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate").cast("date").as("odate"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Scalar extraction from a JSON-ish string column (sybil ingests nested
    * JSON by flattening; at query time we extract with a regex — identical
    * `regexp_extract` semantics in both engines). */
  val q19Json: (String, QueryDef) = q(
    "q19_json_extract",
    """SELECT CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) % 10 AS k_mod,
      |COUNT(*) AS cnt FROM events GROUP BY k_mod ORDER BY k_mod""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    t("events")
      .groupBy((regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("long") % 10).as("k_mod"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("k_mod"))
  }

  // ---------------------------------------------------------------------
  // Training-data pipeline: dedup / text analysis / similarity
  // ---------------------------------------------------------------------

  /** Exact dedup accounting: md5 content hash (identical hex in both
    * engines), total vs distinct, per source. */
  val q20DedupExact: (String, QueryDef) = q(
    "q20_dedup_exact",
    """SELECT source, COUNT(*) AS total, COUNT(DISTINCT md5(text)) AS uniq,
      |COUNT(*) - COUNT(DISTINCT md5(text)) AS dups
      |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    t("documents").groupBy(col("source"))
      .agg(count(lit(1)).as("total"),
        countDistinct(md5(col("text"))).as("uniq"),
        (count(lit(1)) - countDistinct(md5(col("text")))).as("dups"))
      .orderBy(col("source"))
  }

  /** Token counting per language (whitespace tokenizer). */
  val q21TokenCount: (String, QueryDef) = q(
    "q21_token_count",
    """SELECT lang, COUNT(*) AS docs,
      |CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS tokens
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    t("documents").groupBy(col("lang"))
      .agg(count(lit(1)).as("docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("tokens"))
      .orderBy(col("lang"))
  }

  /** Quality scoring: chars-per-token ratio per language. */
  val q22Quality: (String, QueryDef) = q(
    "q22_quality_score",
    """SELECT lang,
      |CAST(SUM(CAST(n_chars AS DECIMAL(38,0))) AS DOUBLE) /
      |CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS chars_per_token
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    t("documents").groupBy(col("lang"))
      .agg((sum(col("n_chars").cast(DecimalType(38, 0))).cast(DoubleType) /
        sum(size(split(col("text"), " ")).cast("long"))).as("chars_per_token"))
      .orderBy(col("lang"))
  }

  /** n-gram-free language-ID heuristic: stopword hit → en-like. */
  val q23LangId: (String, QueryDef) = q(
    "q23_lang_id",
    """SELECT lang,
      |CASE WHEN text LIKE '% the %' THEN 'en_like' ELSE 'other' END AS guess,
      |COUNT(*) AS cnt
      |FROM documents GROUP BY lang, guess ORDER BY lang, guess""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    t("documents")
      .groupBy(col("lang"),
        when(col("text").contains(" the "), "en_like").otherwise("other").as("guess"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("lang"), col("guess"))
  }

  /** Vocabulary size per document (distinct-token fingerprint input). */
  val q24Vocab: (String, QueryDef) = q(
    "q24_vocab_size",
    """SELECT doc_id,
      |CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS uniq_tokens
      |FROM documents ORDER BY doc_id LIMIT 50""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    t("documents")
      .select(col("doc_id"),
        size(array_distinct(split(col("text"), " "))).cast("long").as("uniq_tokens"))
      .orderBy(col("doc_id"))
      .limit(50)
  }

  val catalog: Seq[(String, QueryDef)] = Seq(
    q1PricingSummary, q2Count, q3Weighted, q4Avg, q5MinMax, q6Stddev,
    q7TimeBucket, q8IntFilters, q9StrFilters, q10SetFilter, q11StrReplace,
    q12Samples, q13TopK, q14Distinct, q15Total, q16Hist,
    q17JoinBroadcast, q18JoinShipping, q19Json,
    q20DedupExact, q21TokenCount, q22Quality, q23LangId, q24Vocab) ++
    Queries2.catalog ++ Queries3.catalog ++ Queries4.catalog ++ Queries5.catalog ++
    Queries6.catalog ++ Queries7.catalog ++ Queries8.catalog ++
    Queries9.catalog ++ Queries10.catalog ++ Queries11.catalog ++
    Queries12.catalog ++ Queries13.catalog ++ Queries14.catalog ++
    Queries15.catalog ++ Queries16.catalog ++ Queries17.catalog ++
    Queries18.catalog ++ Queries19.catalog ++ Queries20.catalog ++
    Queries21.catalog ++ Queries22.catalog ++ Queries23.catalog ++
    Queries24.catalog ++ Queries25.catalog ++ Queries26.catalog ++
    Queries27.catalog ++ Queries28.catalog ++ Queries29.catalog ++
    Queries30.catalog ++ Queries31.catalog

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map { case (n, d) => n -> d.fn }.toMap

  def oracleSql: Map[String, String] =
    catalog.collect { case (n, QueryDef(_, Some(sql))) => n -> sql }.toMap
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Decontam, Dedup, Pii, Sampling}

/** Catalog entries: round-6 corpus-pipeline additions — exact duplicate
  * clusters (connected components over LSH candidates), PII scan/redaction,
  * sequence packing into token-budget bins, and cross-document boilerplate
  * unit removal.
  */
object Queries8 {

  private def t(name: String)(implicit env: (SparkSession, String)): DataFrame =
    if (name == "events") Tables.events(env._1, env._2)
    else Tables.load(env._1, env._2, name)

  private def q(name: String, sql: String = null)(
      body: (SparkSession, String) => DataFrame): (String, QueryDef) =
    name -> QueryDef(body, Option(sql))

  /** Same minhash-banding CTE as Queries2.sigSql (the q35/q36/q37 family)
    * — the candidate-pair front end the clustering consumes. */
  private val shinglesSql =
    "list_transform(range(1, len(string_split(text,' '))-1), i -> array_to_string((string_split(text,' '))[i:i+2], ' '))"
  private[graft] val pairsSql =
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

  /** Duplicate clusters: connected components (min-label fixpoint) over the
    * LSH candidate-pair graph — the exact transitive closure whose
    * single-pass approximation `nearDedup` documents. The oracle computes
    * the same closure with a recursive CTE; exact equality of every
    * (node, min-reachable-id) pair is the convergence check.
    */
  val q60DupClusters: (String, QueryDef) = q(
    "q60_dup_clusters",
    s"""WITH RECURSIVE $pairsSql,
       |edges AS (
       |  SELECT d1 AS a, d2 AS b FROM pairs
       |  UNION ALL SELECT d2, d1 FROM pairs),
       |r AS (
       |  SELECT a AS id, a AS lbl FROM edges
       |  UNION
       |  SELECT e.b, r.lbl FROM r JOIN edges e ON e.a = r.id)
       |SELECT id AS doc_id, MIN(lbl) AS cluster_id
       |FROM r GROUP BY id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    Dedup.connectedComponents(
        Dedup.lshCandidates(
          Dedup.minhashBands(t("documents"), "doc_id", "text"), "doc_id"))
      .select(col("id").as("doc_id"), col("cluster_id"))
      .orderBy(col("doc_id"))
  }

  /** PII scan + redaction over a synthesized contact card per customer
    * (the corpus tables carry no raw PII, so the card — email, a TPC-H
    * style `CC-NNN-NNN-NNNN` phone, an IP — is derived deterministically
    * from customer keys in BOTH engines). Counts AND the redacted string
    * must match the oracle byte-for-byte, which pins the regex semantics
    * to the Java∩RE2 common subset the operator promises. */
  val q61Pii: (String, QueryDef) = q(
    "q61_pii_redact",
    """WITH card AS (
      |  SELECT c_custkey,
      |    'reach ' || c_name || ' <' || lower(replace(c_name, '#', '.')) ||
      |    '@' || lower(c_mktsegment) || '.example.com> tel ' ||
      |    (10 + c_nationkey % 25) || '-' ||
      |    lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-' ||
      |    lpad(CAST((c_custkey * 31) % 1000 AS VARCHAR), 3, '0') || '-' ||
      |    lpad(CAST((c_custkey * 7919) % 10000 AS VARCHAR), 4, '0') ||
      |    ' host 10.0.' || (c_custkey % 256) || '.' || (c_nationkey % 256)
      |      AS txt
      |  FROM customer)
      |SELECT c_custkey,
      |  len(regexp_extract_all(txt, '[A-Za-z0-9._%+#-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
      |  len(regexp_extract_all(txt, '\b[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}\b')) AS n_phone,
      |  len(regexp_extract_all(txt, '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS n_ipv4,
      |  regexp_replace(regexp_replace(regexp_replace(txt,
      |    '[A-Za-z0-9._%+#-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |    '\b[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g'),
      |    '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g') AS redacted
      |FROM card ORDER BY c_custkey LIMIT 200""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val card = t("customer").select(col("c_custkey"),
      concat(lit("reach "), col("c_name"), lit(" <"),
        lower(regexp_replace(col("c_name"), "#", ".")), lit("@"),
        lower(col("c_mktsegment")), lit(".example.com> tel "),
        (lit(10) + pmod(col("c_nationkey"), lit(25))).cast("string"), lit("-"),
        lpad(pmod(col("c_custkey"), lit(1000)).cast("string"), 3, "0"), lit("-"),
        lpad(pmod(col("c_custkey") * 31, lit(1000)).cast("string"), 3, "0"), lit("-"),
        lpad(pmod(col("c_custkey") * 7919, lit(10000)).cast("string"), 4, "0"),
        lit(" host 10.0."), pmod(col("c_custkey"), lit(256)).cast("string"),
        lit("."), pmod(col("c_nationkey"), lit(256)).cast("string")).as("txt"))
    // the regex projection is row-wise, so it commutes with ORDER BY
    // c_custkey LIMIT 200: take the 200 cheap rows first (TakeOrdered on
    // the narrow card), THEN scan+redact only those in one projection
    Pii.annotate(card.orderBy(col("c_custkey")).limit(200), "c_custkey", "txt")
      .select(col("c_custkey"), col("n_email"), col("n_phone"), col("n_ipv4"),
        col("redacted"))
      .orderBy(col("c_custkey"))
  }

  /** Sequence packing: documents → fixed 512-token training bins in
    * concatenation order, sharded over 8 independent pack partitions (a
    * global order would serialize into one window task). Every output is
    * an exact integer. */
  val q62Packing: (String, QueryDef) = q(
    "q62_seq_packing",
    """WITH t AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    doc_id % 8 AS pack_part
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, n_tokens, pack_part,
      |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY pack_part ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS st
      |  FROM t)
      |SELECT doc_id, n_tokens, pack_part, st // 512 AS bin, st % 512 AS bin_offset
      |FROM s ORDER BY doc_id""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    Sampling.packSequences(t("documents"), "doc_id",
        size(split(col("text"), " ")), budget = 512L, parts = 8)
      .orderBy(col("doc_id"))
  }

  /** Boilerplate unit removal: drop every "unit" (word, with the corpus's
    * space separator standing in for lines) present in ≥ 60% of documents
    * and reassemble each document in order — rewrite semantics (cleaned
    * text + kept/removed counts) checked byte-for-byte. */
  val q63RemoveCommon: (String, QueryDef) = q(
    "q63_remove_boilerplate",
    """WITH u AS (
      |  SELECT doc_id,
      |    unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos,
      |    unnest(string_split(text, ' ')) AS unit
      |  FROM documents),
      |total AS (SELECT COUNT(*) AS n FROM documents),
      |common AS (
      |  SELECT unit FROM (
      |    SELECT unit, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, unit FROM u)
      |    GROUP BY unit) d, total
      |  WHERE d.df >= total.n * 0.6),
      |kept AS (
      |  SELECT u.* FROM u ANTI JOIN common USING (unit)),
      |rebuilt AS (
      |  SELECT doc_id, array_to_string(list(unit ORDER BY pos), ' ') AS cleaned,
      |    COUNT(*) AS n_kept
      |  FROM kept GROUP BY doc_id)
      |SELECT d.doc_id,
      |  COALESCE(rebuilt.cleaned, '') AS cleaned,
      |  COALESCE(rebuilt.n_kept, 0) AS n_kept,
      |  CAST(len(string_split(d.text, ' ')) AS BIGINT)
      |    - COALESCE(rebuilt.n_kept, 0) AS n_removed
      |FROM documents d LEFT JOIN rebuilt USING (doc_id)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    Decontam.removeCommonUnits(t("documents"), "doc_id", "text",
        sep = " ", minDocFrac = 0.6)
      .orderBy(col("doc_id"))
  }

  val catalog: Seq[(String, QueryDef)] = Seq(
    q60DupClusters, q61Pii, q62Packing, q63RemoveCommon)
}

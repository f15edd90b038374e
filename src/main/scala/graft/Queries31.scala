package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Catalog entries: round-17 — the index tier's production shape
  * composed END TO END ([[graft.operators.Crawl.buildIndex]] →
  * [[graft.operators.Crawl.collapseRevisits]] → filter →
  * [[graft.operators.Crawl.fetchRecords]] →
  * [[graft.operators.Crawl.cleanCorpus]], one plan — q249), and the
  * gzip-member storage coordinates made load-bearing (a multi-member
  * `.warc.gz` indexed by its OWN compressed offsets round-trips
  * member-sliced replay hash-identically to the plain path — q250). */
object Queries31 {

  private def t(name: String)(implicit env: (SparkSession, String)): DataFrame =
    Tables.load(env._1, env._2, name)

  private def q(name: String, sql: String = null)(
      body: (SparkSession, String) => DataFrame): (String, QueryDef) =
    name -> QueryDef(body, Option(sql))

  /** The index tier's FULL production shape in ONE plan — the chain a
    * real archive-backed corpus runs: two crawl generations (originals
    * + ISO 28500 §6.7.2 `identical-payload-digest` revisit records
    * carrying the engine's own sha-256 label, plus ORPHAN revisits
    * whose digest matches nothing) → [[graft.operators.Crawl
    * .buildIndex]] (responses AND revisits — the r17 revisit rows) →
    * [[graft.operators.Crawl.collapseRevisits]] (each re-captured
    * page folds onto its original: the bytes are fetched ONCE, from
    * the original's location; orphan groups surface with null status)
    * → the index-side filter (`status = 200` — which is exactly what
    * drops the loud orphans) → [[graft.operators.Crawl.fetchRecords]]
    * with `sliceCol` (each capture's slice = a standalone one-record
    * archive) → [[graft.operators.Crawl.cleanCorpus]] over the slices
    * (every 5th page is a link farm the funnel must drop AFTER being
    * fetched) → capture history joined back. The oracle replays the
    * whole thing arithmetically: kept pages only, with their
    * capture counts and first/last timestamps. */
  val q249IndexPipeline: (String, QueryDef) = q(
    "q249_index_pipeline",
    """WITH p AS (
      |  SELECT doc_id AS d, lpad(CAST(doc_id AS VARCHAR), 7, '0') AS d7
      |  FROM documents WHERE doc_id < 240 AND doc_id % 5 <> 0),
      |t AS (
      |  SELECT d, d7, 'pipeline page ' || d7 ||
      |    ' carries plenty of prose words to keep' AS txt
      |  FROM p)
      |SELECT 'http://ex.test/i' || d7 AS url, CAST(200 AS INT) AS status,
      |  txt AS text, CAST(strlen(txt) AS BIGINT) AS text_bytes,
      |  CAST(CASE WHEN d % 2 = 0 THEN 2 ELSE 1 END AS BIGINT)
      |    AS n_captures,
      |  CAST(CASE WHEN d % 2 = 0 THEN 1 ELSE 0 END AS BIGINT)
      |    AS n_revisits,
      |  '2026010100000' || CAST(d % 10 AS VARCHAR) AS first_ts,
      |  CASE WHEN d % 2 = 0 THEN '2026020100000' || CAST(d % 10 AS VARCHAR)
      |       ELSE '2026010100000' || CAST(d % 10 AS VARCHAR) END AS last_ts
      |FROM t ORDER BY url""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val d7 = lpad(d.cast("string"), 7, "0")
    val uri = concat(lit("http://ex.test/i"), d7)
    val proseHtml = concat(lit("<html><body><p>pipeline page "), d7,
      lit(" carries plenty of prose words to keep</p></body></html>"))
    val farmHtml = lit("<div>" +
      ("<a href=\"/u\">wordy link text</a> " * 8) + "</div>")
    val html = when(d % 5 === 0, farmHtml).otherwise(proseHtml)
    val http = concat(
      lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"), html)
    val sec = (d % 10).cast("string")
    val rec1 = concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Date: " +
        "2026-01-01T00:00:0"), sec,
      lit("Z\r\nWARC-Target-URI: <"), uri,
      lit(">\r\nContent-Type: application/http; msgtype=response" +
        "\r\nContent-Length: "), length(http).cast("string"),
      lit("\r\n\r\n"), http, lit("\r\n\r\n"))
    // generation 2: a revisit record per even doc — no body, the
    // original's sha-256 in WARC-Payload-Digest (the engine label)
    def revisit(digest: Column): Column = concat(
      lit("WARC/1.0\r\nWARC-Type: revisit\r\nWARC-Date: " +
        "2026-02-01T00:00:0"), sec,
      lit("Z\r\nWARC-Target-URI: <"), uri,
      lit(">\r\nWARC-Payload-Digest: sha-256:"), digest,
      lit("\r\nContent-Length: 0\r\n\r\n\r\n\r\n"))
    val docs = t("documents").filter(d < 240)
    val recs1 = docs.select(
      concat(lit("g1w"), (d % 4).cast("string")).as("filename"),
      floor(d / 4).cast("long").as("rnk"), rec1.as("rec"))
    val recs2 = docs.filter(d % 2 === 0).select(
      concat(lit("g2w"), (d % 4).cast("string")).as("filename"),
      floor(d / 4).cast("long").as("rnk"),
      revisit(sha2(html.cast("binary"), 256)).as("rec"))
    // orphan revisits (every 7th doc): digest matches NO original — the
    // group must surface loudly from collapseRevisits and die at the
    // status filter, never silently earlier
    val recs3 = docs.filter(d % 7 === 0).select(
      concat(lit("g2w"), (d % 4).cast("string")).as("filename"),
      (floor(d / 4) + 1000L).cast("long").as("rnk"),
      revisit(concat(lit("beef"), d.cast("string"))).as("rec"))
    val archives = recs1.unionAll(recs2).unionAll(recs3)
      .groupBy(col("filename"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("rnk"), col("rec")))),
        x => x.getField("rec")), "").as("p"))
      .select(col("filename"), col("p").cast("binary").as("payload"))
    val collapsed = graft.operators.Crawl.collapseRevisits(
      graft.operators.Crawl.buildIndex(archives))
    // the index-side selection: successful originals only (drops the
    // loud orphan groups, whose status is null)
    val picked = collapsed.filter(col("status") === 200)
    val fetched = graft.operators.Crawl.fetchRecords(
      picked.select(col("filename"), col("offset"), col("length")),
      archives, sliceCol = "rec_bytes")
    val curated = graft.operators.Crawl.cleanCorpus(
      fetched.select(col("rec_bytes")), payloadCol = "rec_bytes")
    curated
      .join(picked.select(col("url"), col("n_captures"),
        col("n_revisits"), col("first_ts"), col("last_ts")), Seq("url"))
      .select(col("url"), col("status"), col("text"), col("text_bytes"),
        col("n_captures"), col("n_revisits"), col("first_ts"),
        col("last_ts"))
      .orderBy(col("url"))
  }

  /** Gzip member offsets made LOAD-BEARING ([[graft.expressions
    * .WarcKernel]]'s member walk + [[graft.operators.Crawl
    * .buildIndex]]'s storage coordinates): every document becomes one
    * WARC record, `graft_gzip` packs each record as its own RFC 1952
    * member (the CommonCrawl `.warc.gz` convention), members
    * concatenate into 5 compressed archives, and buildIndex indexes
    * the COMPRESSED files by their own member offsets — coordinates no
    * engine can predict arithmetically, so the oracle checks the
    * round-trip's OUTPUT: the odd-second selection replayed through
    * [[graft.operators.Crawl.fetchRecords]] (each member slice is
    * itself a complete gzip stream) must parse to exactly the planted
    * pages, re-verify its index digests, and equal the plain-WARC
    * path's replay row for row (`same_as_plain` — computed in-plan by
    * running BOTH paths and joining). */
  val q250GzMemberRoundtrip: (String, QueryDef) = q(
    "q250_gz_member_roundtrip",
    """WITH p AS (
      |  SELECT doc_id AS d, lpad(CAST(doc_id AS VARCHAR), 7, '0') AS d7
      |  FROM documents WHERE doc_id < 300 AND doc_id % 2 = 1)
      |SELECT 'http://ex.test/z' || d7 AS url, CAST(200 AS INT) AS status,
      |  '<html><body><p>gz member page ' || d7 ||
      |    ' keeps words</p></body></html>' AS html,
      |  TRUE AS digest_ok, TRUE AS same_as_plain
      |FROM p ORDER BY url""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val d7 = lpad(d.cast("string"), 7, "0")
    val uri = concat(lit("http://ex.test/z"), d7)
    val html = concat(lit("<html><body><p>gz member page "), d7,
      lit(" keeps words</p></body></html>"))
    val http = concat(
      lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"), html)
    val rec = concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Date: " +
        "2026-01-01T00:00:0"), (d % 10).cast("string"),
      lit("Z\r\nWARC-Target-URI: <"), uri,
      lit(">\r\nContent-Type: application/http; msgtype=response" +
        "\r\nContent-Length: "), length(http).cast("string"),
      lit("\r\n\r\n"), http, lit("\r\n\r\n"))
    val docs = t("documents").filter(d < 300)
      .select(d, concat(lit("w"), (d % 5).cast("string")).as("filename"),
        floor(d / 5).cast("long").as("rnk"),
        rec.cast("binary").as("recb"))
    // binary concat in rank order — shared by both packings
    def packed(c: Column): Column = aggregate(
      transform(array_sort(collect_list(struct(col("rnk"), c.as("m")))),
        x => x.getField("m")),
      lit(Array.emptyByteArray),
      (acc, x) => concat(acc, x))
    val plainArch = docs.groupBy(col("filename"))
      .agg(packed(col("recb")).as("payload"))
    val gzArch = docs.groupBy(col("filename"))
      .agg(packed(call_function("graft_gzip", col("recb")))
        .as("payload"))
    def replay(arch: DataFrame): DataFrame = {
      val picked = graft.operators.Crawl.buildIndex(arch)
        .filter(substring(col("ts"), 14, 1)
          .isin("1", "3", "5", "7", "9"))
      graft.operators.Crawl.fetchRecords(
          picked.select(col("filename"), col("offset"), col("length")),
          arch)
        .join(picked, Seq("filename", "offset", "length"))
        .select(col("warc_rec.uri").as("url"),
          col("warc_rec.status").as("status"),
          col("warc_rec.body").cast("string").as("html"),
          (sha2(col("warc_rec.body"), 256) === col("digest"))
            .as("digest_ok"))
    }
    val plainOut = replay(plainArch)
      .select(col("url"), col("html").as("__html_plain"),
        col("digest_ok").as("__ok_plain"))
    replay(gzArch)
      .join(plainOut, Seq("url"))
      .select(col("url"), col("status"), col("html"), col("digest_ok"),
        (col("html") === col("__html_plain") && col("__ok_plain"))
          .as("same_as_plain"))
      .orderBy(col("url"))
  }

  val catalog: Seq[(String, QueryDef)] = Seq(q249IndexPipeline,
    q250GzMemberRoundtrip)
}

package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Catalog entries: round-16 — the selective-replay loop closed
  * ([[graft.operators.Crawl.fetchRecords]]: cdxj ranges → record
  * slices → `graft_warc_parse`, one plan), CDX revisit-record dedup
  * ([[graft.operators.Crawl.collapseRevisits]] — the CommonCrawl
  * `warc/revisit` capture-history fold), and the mixed-UTC-offset
  * recrawl fix (recrawlSchedule compares instants, not strings). */
object Queries30 {

  private def t(name: String)(implicit env: (SparkSession, String)): DataFrame =
    Tables.load(env._1, env._2, name)

  private def q(name: String, sql: String = null)(
      body: (SparkSession, String) => DataFrame): (String, QueryDef) =
    name -> QueryDef(body, Option(sql))

  /** Selective replay end to end ([[graft.operators.Crawl.fetchRecords]]):
    * per file `w{0..4}.warc.gz` an archive is synthesized IN-PLAN as the
    * byte-concatenation of fixed-width WARC records (fixed-width doc ids
    * + bodies ⇒ every record is the same length L, so record k's offset
    * is `k·L` — arithmetic the oracle can replay); the index selects
    * every 3rd document, fetchPlan's 1 MiB gap cap coalesces each file's
    * whole selection into ONE range SPANNING the unselected records in
    * the gaps, and fetchRecords must slice out and parse EXACTLY the
    * selected captures — never the gap records it read past. The oracle
    * rebuilds the same record string (CHR(13)||CHR(10) framing) and
    * replays url/status/body + the offset arithmetic; a slicing bug of
    * even one byte kills the parse (loud null) and the hash. */
  val q243SelectiveReplay: (String, QueryDef) = q(
    "q243_selective_replay",
    """WITH nlc AS (SELECT chr(13) || chr(10) AS nl),
      |p AS (
      |  SELECT doc_id AS d, lpad(CAST(doc_id AS VARCHAR), 7, '0') AS d7
      |  FROM documents WHERE doc_id < 300),
      |b AS (
      |  SELECT d, 'http://ex.test/p' || d7 AS url,
      |    '<html><body><p>records for page ' || d7 ||
      |      ' with density kept fine</p></body></html>' AS html
      |  FROM p),
      |r AS (
      |  SELECT d, url, html,
      |    'HTTP/1.1 200 OK' || nl || 'Content-Type: text/html' ||
      |      nl || nl || html AS http
      |  FROM b, nlc),
      |w AS (
      |  SELECT d, url, html,
      |    'WARC/1.0' || nl || 'WARC-Type: response' || nl ||
      |      'WARC-Target-URI: <' || url || '>' || nl ||
      |      'Content-Type: application/http; msgtype=response' || nl ||
      |      'Content-Length: ' || CAST(length(http) AS VARCHAR) ||
      |      nl || nl || http || nl || nl AS rec
      |  FROM r, nlc)
      |SELECT 'w' || CAST(d % 5 AS VARCHAR) || '.warc.gz' AS filename,
      |  CAST((d // 5) * length(rec) AS BIGINT) AS "offset",
      |  CAST(length(rec) AS BIGINT) AS length,
      |  url, CAST(200 AS INT) AS status, html
      |FROM w WHERE d % 3 = 0
      |ORDER BY filename, "offset"""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val d7 = lpad(d.cast("string"), 7, "0")
    val uri = concat(lit("http://ex.test/p"), d7)
    val html = concat(lit("<html><body><p>records for page "), d7,
      lit(" with density kept fine</p></body></html>"))
    val http = concat(
      lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"), html)
    val rec = Queries27.resp(uri, http)
    val docs = t("documents").filter(d < 300)
      .select(d, concat(lit("w"), (d % 5).cast("string"),
        lit(".warc.gz")).as("filename"),
        floor(d / 5).cast("long").as("rnk"), rec.as("rec"))
    // archives: each file = its records concatenated in rank order
    // (ASCII bodies: char length == byte length, string concat == bytes)
    val archives = docs.groupBy(col("filename"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("rnk"), col("rec")))),
        x => x.getField("rec")), "").as("p"))
      .select(col("filename"), col("p").cast("binary").as("payload"))
    // the index: every 3rd doc — fixed-width records make the offset
    // arithmetic (rank × L) exact in both engines
    val index = docs.filter(d % 3 === 0)
      .select(col("filename"),
        (col("rnk") * length(col("rec"))).cast("long").as("offset"),
        length(col("rec")).cast("long").as("length"))
    graft.operators.Crawl.fetchRecords(index, archives)
      .select(col("filename"), col("offset"), col("length"),
        col("warc_rec.uri").as("url"),
        col("warc_rec.status").as("status"),
        col("warc_rec.body").cast("string").as("html"))
      .orderBy(col("filename"), col("offset"))
  }

  /** CDX revisit-record dedup
    * ([[graft.operators.Crawl.collapseRevisits]]): per doc an original
    * capture, plus two `warc/revisit` re-captures on the same digest for
    * every 3rd doc, plus an ORPHAN revisit group (a digest whose
    * original fell outside the slice) for every 7th — which must
    * surface with null location, never vanish. The urlkey is computed
    * by `graft_surt` from a NOISY respelling carrying an explicit port
    * (`:8080` on every 4th doc must RETAIN as `host:8080)`, `:80` on
    * the rest must fold — the r15 advice item, oracle-load-bearing).
    * Oracle replays every group arithmetically — no grouping, just the
    * planted shape. */
  val q244RevisitCollapse: (String, QueryDef) = q(
    "q244_revisit_collapse",
    """WITH p AS (
      |  SELECT doc_id AS d, doc_id % 7 AS h,
      |    CASE WHEN doc_id % 4 = 0 THEN ':8080' ELSE '' END AS pk
      |  FROM documents WHERE doc_id < 300),
      |main AS (
      |  SELECT 'org,ex' || CAST(h AS VARCHAR) || pk || ')/r' ||
      |      CAST(d AS VARCHAR) AS urlkey,
      |    'sha1:d' || CAST(d AS VARCHAR) AS digest,
      |    CAST(CASE WHEN d % 3 = 0 THEN 3 ELSE 1 END AS BIGINT)
      |      AS n_captures,
      |    CAST(CASE WHEN d % 3 = 0 THEN 2 ELSE 0 END AS BIGINT)
      |      AS n_revisits,
      |    '20260101000000' AS first_ts,
      |    CASE WHEN d % 3 = 0 THEN '20260201000000'
      |         ELSE '20260101000000' END AS last_ts,
      |    '20260101000000' AS orig_ts,
      |    'http://ex' || CAST(h AS VARCHAR) || '.org' || pk || '/r' ||
      |      CAST(d AS VARCHAR) AS url,
      |    CAST(200 AS INT) AS status,
      |    CAST(100 + d % 50 AS BIGINT) AS length,
      |    CAST(d * 300 AS BIGINT) AS "offset",
      |    'w' || CAST(d % 5 AS VARCHAR) || '.warc.gz' AS filename
      |  FROM p),
      |orph AS (
      |  SELECT 'org,ex' || CAST(h AS VARCHAR) || pk || ')/r' ||
      |      CAST(d AS VARCHAR) AS urlkey,
      |    'sha1:orphan' || CAST(d AS VARCHAR) AS digest,
      |    CAST(1 AS BIGINT) AS n_captures, CAST(1 AS BIGINT) AS n_revisits,
      |    '20260301000000' AS first_ts, '20260301000000' AS last_ts,
      |    CAST(NULL AS VARCHAR) AS orig_ts, CAST(NULL AS VARCHAR) AS url,
      |    CAST(NULL AS INT) AS status, CAST(NULL AS BIGINT) AS length,
      |    CAST(NULL AS BIGINT) AS "offset",
      |    CAST(NULL AS VARCHAR) AS filename
      |  FROM p WHERE d % 7 = 0)
      |SELECT * FROM (SELECT * FROM main UNION ALL SELECT * FROM orph)
      |ORDER BY urlkey, digest""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val ds = d.cast("string")
    val h = (d % 7).cast("string")
    // noisy respellings the SURT fold must collapse — and the NON-default
    // port must survive the fold as a distinct origin
    val portNoisy = when(d % 4 === 0, lit(":8080")).otherwise(lit(":80"))
    val portKept = when(d % 4 === 0, lit(":8080")).otherwise(lit(""))
    val noisy = concat(lit("HTTP://WWW.EX"), h, lit(".ORG"), portNoisy,
      lit("/r"), ds)
    val url = concat(lit("http://ex"), h, lit(".org"), portKept,
      lit("/r"), ds)
    val docs = t("documents").filter(d < 300)
      .select(d, call_function("graft_surt", noisy).as("urlkey"),
        url.as("url"))
    def cap(src: DataFrame, ts: String, mime: Column, digest: Column,
        status: Column, len: Column, off: Column,
        file: Column): DataFrame =
      src.select(col("urlkey"), lit(ts).as("ts"), col("url"),
        mime.as("mime"), status.cast("int").as("status"),
        digest.as("digest"), len.cast("long").as("length"),
        off.cast("long").as("offset"), file.as("filename"))
    val dg = concat(lit("sha1:d"), ds)
    val file = concat(lit("w"), (d % 5).cast("string"), lit(".warc.gz"))
    val rvFile = concat(lit("rv"), (d % 5).cast("string"), lit(".warc.gz"))
    val every3 = docs.filter(d % 3 === 0)
    val originals = cap(docs, "20260101000000", lit("text/html"), dg,
      lit(200), lit(100) + d % 50, d * 300, file)
    val revisits = cap(every3, "20260115000000", lit("warc/revisit"), dg,
      lit(200), lit(30), d * 300 + 200, rvFile)
      .unionAll(cap(every3, "20260201000000", lit("warc/revisit"), dg,
        lit(200), lit(30), d * 300 + 230, rvFile))
    val orphans = cap(docs.filter(d % 7 === 0), "20260301000000",
      lit("warc/revisit"), concat(lit("sha1:orphan"), ds), lit(200),
      lit(30), d * 300 + 260, rvFile)
    graft.operators.Crawl
      .collapseRevisits(originals.unionAll(revisits).unionAll(orphans))
      .orderBy(col("urlkey"), col("digest"))
  }

  /** Mixed-UTC-offset recrawl verdicts
    * ([[graft.operators.Crawl.recrawlSchedule]] after the r16 fix):
    * W3C datetime permits numeric offsets, and both flip directions are
    * planted — a `+09:00` lastmod that sorts lexicographically AFTER
    * the stored `Z` crawl time yet is chronologically EARLIER (must
    * SKIP), and a `Z` lastmod sorting BEFORE a `+09:00` crawl time yet
    * chronologically NEWER (must REFRESH) — plus the reduced-
    * granularity `2026-01` form that exercises the documented
    * lexicographic fallback. The oracle hardcodes the expected verdict
    * per case (independent ground truth, not a re-derivation). */
  val q245RecrawlMixedOffset: (String, QueryDef) = q(
    "q245_recrawl_mixed_offset",
    """WITH p AS (
      |  SELECT doc_id AS d, doc_id % 7 AS h, doc_id % 6 AS v
      |  FROM documents WHERE doc_id < 300),
      |e AS (
      |  SELECT d, v,
      |    'http://ex' || CAST(h AS VARCHAR) || '.test/t' ||
      |      CAST(d AS VARCHAR) AS url,
      |    CASE v WHEN 0 THEN '2026-01-10T00:00:00Z'
      |           WHEN 1 THEN '2026-01-02T01:00:00+09:00'
      |           WHEN 2 THEN '2026-01-01T23:30:00Z'
      |           WHEN 3 THEN CAST(NULL AS VARCHAR)
      |           WHEN 4 THEN '2026-02-01T00:00:00+00:00'
      |           ELSE '2026-01' END AS lastmod,
      |    CASE WHEN v = 0 THEN CAST(NULL AS VARCHAR)
      |         WHEN v = 1 THEN '2026-01-01T23:00:00Z'
      |         WHEN v = 2 THEN '2026-01-02T08:00:00+09:00'
      |         ELSE '2026-01-05T00:00:00Z' END AS last_crawled,
      |    CASE v WHEN 0 THEN 'new'
      |           WHEN 1 THEN 'skip'
      |           WHEN 2 THEN 'refresh'
      |           WHEN 3 THEN 'skip'
      |           WHEN 4 THEN 'refresh'
      |           ELSE 'skip' END AS action
      |  FROM p)
      |SELECT url, lastmod, last_crawled, action
      |FROM e ORDER BY url""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val h = (d % 7).cast("string")
    val v = d % 6
    val url = concat(lit("http://ex"), h, lit(".test/t"), d.cast("string"))
    val base = t("documents").filter(d < 300).select(d, v.as("v"),
      url.as("url"))
    val entries = base.select(col("url"),
      when(col("v") === 0, lit("2026-01-10T00:00:00Z"))
        .when(col("v") === 1, lit("2026-01-02T01:00:00+09:00"))
        .when(col("v") === 2, lit("2026-01-01T23:30:00Z"))
        .when(col("v") === 4, lit("2026-02-01T00:00:00+00:00"))
        .when(col("v") === 5, lit("2026-01"))
        .as("lastmod"))
    val corpus = base.filter(col("v") =!= 0).select(col("url"),
      when(col("v") === 1, lit("2026-01-01T23:00:00Z"))
        .when(col("v") === 2, lit("2026-01-02T08:00:00+09:00"))
        .otherwise(lit("2026-01-05T00:00:00Z")).as("last_crawled"))
    graft.operators.Crawl.recrawlSchedule(entries, broadcast(corpus))
      .select(col("url"), col("lastmod"), col("last_crawled"),
        col("action"))
      .orderBy(col("url"))
  }

  /** Dedup-then-replay — the two r16 index operators COMPOSED the way a
    * production pipeline runs them: a CDX slice with `warc/revisit`
    * re-captures (every 2nd selected doc, pointing at tiny revisit
    * records that must never be fetched) is collapsed on
    * `(urlkey, digest)` ([[graft.operators.Crawl.collapseRevisits]] —
    * dedup means fetching the bytes ONCE, from the original's
    * location), and the surviving original locations feed
    * [[graft.operators.Crawl.fetchRecords]] against q243-style
    * fixed-width in-plan archives; the parsed pages carry their
    * capture-history columns (`n_revisits`, `first_ts`/`last_ts`)
    * through the join back. One plan: collapse (one hash agg) →
    * fetchPlan window → range slices → parse → equi-join. Oracle
    * replays everything arithmetically. */
  val q246DedupReplay: (String, QueryDef) = q(
    "q246_dedup_replay",
    """WITH nlc AS (SELECT chr(13) || chr(10) AS nl),
      |p AS (
      |  SELECT doc_id AS d, lpad(CAST(doc_id AS VARCHAR), 7, '0') AS d7
      |  FROM documents WHERE doc_id < 300),
      |b AS (
      |  SELECT d, 'http://ex.test/q' || d7 AS url,
      |    '<html><body><p>replay page ' || d7 ||
      |      ' carries enough words</p></body></html>' AS html
      |  FROM p),
      |r AS (
      |  SELECT d, url, html,
      |    'HTTP/1.1 200 OK' || nl || 'Content-Type: text/html' ||
      |      nl || nl || html AS http
      |  FROM b, nlc),
      |w AS (
      |  SELECT d, url, html,
      |    'WARC/1.0' || nl || 'WARC-Type: response' || nl ||
      |      'WARC-Target-URI: <' || url || '>' || nl ||
      |      'Content-Type: application/http; msgtype=response' || nl ||
      |      'Content-Length: ' || CAST(length(http) AS VARCHAR) ||
      |      nl || nl || http || nl || nl AS rec
      |  FROM r, nlc)
      |SELECT url, CAST(200 AS INT) AS status, html,
      |  CAST(CASE WHEN d % 2 = 0 THEN 2 ELSE 0 END AS BIGINT)
      |    AS n_revisits,
      |  '20260101000000' AS first_ts,
      |  CASE WHEN d % 2 = 0 THEN '20260301000000'
      |       ELSE '20260101000000' END AS last_ts,
      |  'w' || CAST(d % 5 AS VARCHAR) || '.warc.gz' AS filename,
      |  CAST((d // 5) * length(rec) AS BIGINT) AS "offset"
      |FROM w WHERE d % 3 = 0
      |ORDER BY url""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val d7 = lpad(d.cast("string"), 7, "0")
    val uri = concat(lit("http://ex.test/q"), d7)
    val html = concat(lit("<html><body><p>replay page "), d7,
      lit(" carries enough words</p></body></html>"))
    val http = concat(
      lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"), html)
    val rec = Queries27.resp(uri, http)
    val docs = t("documents").filter(d < 300)
      .select(d, concat(lit("w"), (d % 5).cast("string"),
        lit(".warc.gz")).as("filename"),
        floor(d / 5).cast("long").as("rnk"), rec.as("rec"), uri.as("u"))
    val archives = docs.groupBy(col("filename"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("rnk"), col("rec")))),
        x => x.getField("rec")), "").as("p"))
      .select(col("filename"), col("p").cast("binary").as("payload"))
    // the index SLICE: every 3rd doc's original capture + (every 2nd of
    // those) two warc/revisit re-captures pointing at tiny revisit
    // records in rv*.warc.gz — locations that must never be fetched
    val sel = docs.filter(d % 3 === 0)
    def capCols(ts: String, mime: Column, len: Column, off: Column,
        file: Column) = Seq(
      call_function("graft_surt", col("u")).as("urlkey"),
      lit(ts).as("ts"), col("u").as("url"), mime.as("mime"),
      lit(200).as("status"),
      concat(lit("sha1:q"), d.cast("string")).as("digest"),
      len.cast("long").as("length"), off.cast("long").as("offset"),
      file.as("filename"))
    val originals = sel.select(capCols("20260101000000",
      lit("text/html"), length(col("rec")),
      col("rnk") * length(col("rec")), col("filename")): _*)
    val rv = concat(lit("rv"), (d % 5).cast("string"), lit(".warc.gz"))
    val revisits = sel.filter(d % 2 === 0)
      .select(capCols("20260201000000", lit("warc/revisit"), lit(10),
        d * 7, rv): _*)
      .unionAll(sel.filter(d % 2 === 0)
        .select(capCols("20260301000000", lit("warc/revisit"), lit(10),
          d * 7 + 20, rv): _*))
    val collapsed = graft.operators.Crawl
      .collapseRevisits(originals.unionAll(revisits))
    val fetched = graft.operators.Crawl.fetchRecords(
      collapsed.select(col("filename"), col("offset"), col("length")),
      archives)
    fetched
      .join(collapsed.select(col("filename"), col("offset"),
        col("n_revisits"), col("first_ts"), col("last_ts")),
        Seq("filename", "offset"))
      .select(col("warc_rec.uri").as("url"),
        col("warc_rec.status").as("status"),
        col("warc_rec.body").cast("string").as("html"),
        col("n_revisits"), col("first_ts"), col("last_ts"),
        col("filename"), col("offset"))
      .orderBy(col("url"))
  }

  /** Index the crawl's OWN archives, then replay from that index — the
    * write side closed ([[graft.operators.Crawl.buildIndex]]): per-file
    * fixed-width archives (now carrying `WARC-Date`) are indexed
    * in-plan (urlkey via `graft_surt`, ts from the date's digits,
    * digest = SHA-256 of the body, offset/length from the parser's own
    * record extents), the index filters on its ts digit (odd seconds —
    * every 2nd capture, so ranges span the skipped records), and
    * [[graft.operators.Crawl.fetchRecords]] replays the selection —
    * with `digest_ok` recomputing the slice's hash against the index's
    * digest, so a one-byte slicing error kills BOTH the html hash and
    * the boolean. The oracle rebuilds records with CHR framing and
    * DuckDB's own sha256. */
  val q247IndexRoundtrip: (String, QueryDef) = q(
    "q247_index_roundtrip",
    """WITH nlc AS (SELECT chr(13) || chr(10) AS nl),
      |p AS (
      |  SELECT doc_id AS d, lpad(CAST(doc_id AS VARCHAR), 7, '0') AS d7
      |  FROM documents WHERE doc_id < 300),
      |b AS (
      |  SELECT d, d7, 'http://ex.test/x' || d7 AS url,
      |    '<html><body><p>indexed page ' || d7 ||
      |      ' has its own words</p></body></html>' AS html
      |  FROM p),
      |r AS (
      |  SELECT d, d7, url, html,
      |    'HTTP/1.1 200 OK' || nl || 'Content-Type: text/html' ||
      |      nl || nl || html AS http
      |  FROM b, nlc),
      |w AS (
      |  SELECT d, d7, url, html,
      |    'WARC/1.0' || nl || 'WARC-Type: response' || nl ||
      |      'WARC-Date: 2026-01-01T00:00:0' || CAST(d % 10 AS VARCHAR) ||
      |      'Z' || nl ||
      |      'WARC-Target-URI: <' || url || '>' || nl ||
      |      'Content-Type: application/http; msgtype=response' || nl ||
      |      'Content-Length: ' || CAST(length(http) AS VARCHAR) ||
      |      nl || nl || http || nl || nl AS rec
      |  FROM r, nlc)
      |SELECT 'test,ex)/x' || d7 AS urlkey,
      |  '2026010100000' || CAST(d % 10 AS VARCHAR) AS ts,
      |  url, 'text/html' AS mime, CAST(200 AS INT) AS status,
      |  sha256(html) AS digest,
      |  CAST(length(rec) AS BIGINT) AS length,
      |  CAST((d // 5) * length(rec) AS BIGINT) AS "offset",
      |  'w' || CAST(d % 5 AS VARCHAR) || '.warc.gz' AS filename,
      |  html, TRUE AS digest_ok
      |FROM w WHERE d % 2 = 1
      |ORDER BY urlkey""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val d7 = lpad(d.cast("string"), 7, "0")
    val uri = concat(lit("http://ex.test/x"), d7)
    val html = concat(lit("<html><body><p>indexed page "), d7,
      lit(" has its own words</p></body></html>"))
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
      .select(d, concat(lit("w"), (d % 5).cast("string"),
        lit(".warc.gz")).as("filename"),
        floor(d / 5).cast("long").as("rnk"), rec.as("rec"))
    val archives = docs.groupBy(col("filename"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("rnk"), col("rec")))),
        x => x.getField("rec")), "").as("p"))
      .select(col("filename"), col("p").cast("binary").as("payload"))
    val index = graft.operators.Crawl.buildIndex(archives)
    // the selection: odd capture seconds — every 2nd doc, so each
    // coalesced range spans the skipped even-second records
    val picked = index.filter(substring(col("ts"), 14, 1)
      .isin("1", "3", "5", "7", "9"))
    graft.operators.Crawl.fetchRecords(
        picked.select(col("filename"), col("offset"), col("length")),
        archives)
      .join(picked, Seq("filename", "offset", "length"))
      .select(col("urlkey"), col("ts"),
        col("warc_rec.uri").as("url"), col("mime"), col("status"),
        col("digest"), col("length"), col("offset"), col("filename"),
        col("warc_rec.body").cast("string").as("html"),
        (sha2(col("warc_rec.body"), 256) === col("digest"))
          .as("digest_ok"))
      .orderBy(col("urlkey"))
  }

  /** The index tier's DECADE INSTRUMENT — q224's convention applied to
    * the write side: the `doc_id` cap REMOVED (work grows with the
    * corpus), every document becomes one fixed-width WARC record in one
    * of 7 archives, [[graft.operators.Crawl.buildIndex]] indexes them
    * (parse + surt + sha-256 per record — the full write-side kernel
    * chain), the odd-second half of the captures is selected, and
    * [[graft.operators.Crawl.fetchPlan]] coalesces it under a 400-byte
    * gap cap (≈ one skipped record — both engines compute the SAME
    * record length, so the coalescing replays exactly); the output is
    * the 7-row per-file rollup, so ScaleBench prices the whole chain
    * across ScaleGen decades with a tiny result. Oracle: DuckDB
    * rebuilds the records, windows the same algorithm (the q242
    * convention), and rolls up. */
  val q248IndexScale: (String, QueryDef) = q(
    "q248_index_scale",
    """WITH nlc AS (SELECT chr(13) || chr(10) AS nl),
      |p AS (
      |  SELECT doc_id AS d, lpad(CAST(doc_id AS VARCHAR), 9, '0') AS d9
      |  FROM documents),
      |b AS (
      |  SELECT d, d9, 'http://ex.test/s' || d9 AS url,
      |    '<html><body><p>scale page ' || d9 ||
      |      ' words for indexing</p></body></html>' AS html
      |  FROM p),
      |r AS (
      |  SELECT d, d9, url, html,
      |    'HTTP/1.1 200 OK' || nl || 'Content-Type: text/html' ||
      |      nl || nl || html AS http
      |  FROM b, nlc),
      |w AS (
      |  SELECT d,
      |    'WARC/1.0' || nl || 'WARC-Type: response' || nl ||
      |      'WARC-Date: 2026-01-01T00:00:0' || CAST(d % 10 AS VARCHAR) ||
      |      'Z' || nl ||
      |      'WARC-Target-URI: <' || url || '>' || nl ||
      |      'Content-Type: application/http; msgtype=response' || nl ||
      |      'Content-Length: ' || CAST(length(http) AS VARCHAR) ||
      |      nl || nl || http || nl || nl AS rec
      |  FROM r, nlc),
      |idx AS (
      |  SELECT 'w' || CAST(d % 7 AS VARCHAR) AS filename,
      |    CAST((d // 7) * length(rec) AS BIGINT) AS off,
      |    CAST(length(rec) AS BIGINT) AS len
      |  FROM w WHERE d % 10 IN (1, 3, 5, 9)),
      |win AS (
      |  SELECT *,
      |    MAX(off + len) OVER (PARTITION BY filename ORDER BY off, len
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
      |  FROM idx),
      |brk AS (
      |  SELECT *, CASE WHEN prev_end IS NULL OR off > prev_end + 400
      |    THEN 1 ELSE 0 END AS b FROM win),
      |grp AS (
      |  SELECT *, SUM(b) OVER (PARTITION BY filename ORDER BY off, len
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
      |  FROM brk),
      |rng AS (
      |  SELECT filename, MIN(off) AS start, MAX(off + len) AS e,
      |    COUNT(*) AS nr, SUM(len) AS pb
      |  FROM grp GROUP BY filename, g)
      |SELECT filename, CAST(COUNT(*) AS BIGINT) AS n_ranges,
      |  CAST(SUM(nr) AS BIGINT) AS n_records,
      |  CAST(SUM(pb) AS BIGINT) AS payload_bytes,
      |  CAST(SUM(e - start - pb) AS BIGINT) AS gap_bytes
      |FROM rng GROUP BY filename ORDER BY filename""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val d9 = lpad(d.cast("string"), 9, "0")
    val uri = concat(lit("http://ex.test/s"), d9)
    val html = concat(lit("<html><body><p>scale page "), d9,
      lit(" words for indexing</p></body></html>"))
    val http = concat(
      lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"), html)
    val rec = concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Date: " +
        "2026-01-01T00:00:0"), (d % 10).cast("string"),
      lit("Z\r\nWARC-Target-URI: <"), uri,
      lit(">\r\nContent-Type: application/http; msgtype=response" +
        "\r\nContent-Length: "), length(http).cast("string"),
      lit("\r\n\r\n"), http, lit("\r\n\r\n"))
    val archives = t("documents")
      .select(concat(lit("w"), (d % 7).cast("string")).as("filename"),
        floor(d / 7).cast("long").as("rnk"), rec.as("rec"))
      .groupBy(col("filename"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("rnk"), col("rec")))),
        x => x.getField("rec")), "").as("p"))
      .select(col("filename"), col("p").cast("binary").as("payload"))
    val picked = graft.operators.Crawl.buildIndex(archives)
      .filter(substring(col("ts"), 14, 1).isin("1", "3", "5", "9"))
    graft.operators.Crawl.fetchPlan(picked, maxGapBytes = 400L)
      .groupBy(col("filename"))
      .agg(count(lit(1)).as("n_ranges"),
        sum(col("n_records")).as("n_records"),
        sum(col("payload_bytes")).as("payload_bytes"),
        sum(col("gap_bytes")).as("gap_bytes"))
      .orderBy(col("filename"))
  }

  val catalog: Seq[(String, QueryDef)] = Seq(q243SelectiveReplay,
    q244RevisitCollapse, q245RecrawlMixedOffset, q246DedupReplay,
    q247IndexRoundtrip, q248IndexScale)
}

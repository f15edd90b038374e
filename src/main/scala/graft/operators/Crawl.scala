package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The end-to-end crawl ingest: one declarative plan from raw WARC bytes
  * to a curated text corpus, composing the r13 kernels in their
  * production order —
  *
  *   WARC records (`graft_warc_parse`) → HTTP status/mime gate →
  *   charset repair (`graft_charset_fix`, the HTML5 rule) →
  *   HTML extraction (`graft_html_extract`) →
  *   boilerplate filter (link density + minimum text) →
  *   canonical URL (`graft_canon_url`).
  *
  * Every stage is a scan-side codegen projection or a pushdown-friendly
  * filter: the whole pipeline is ONE stage per input split — no shuffle
  * until whatever the caller does next (dedup, quality, tokenize). At
  * 100 TB this is the pass that runs exactly once per archive at the
  * feature-extraction position; its outputs (`url, status, mime, charset,
  * text` + signals) are what every downstream operator reads.
  */
object Crawl {

  /** Output + internal column names [[cleanCorpus]] writes (lowercase;
    * the collision check is case-insensitive like Spark's resolver). */
  private val Reserved: Set[String] = Set(
    "url", "status", "mime", "charset", "text", "text_bytes",
    "link_density", "n_links", "last_modified", "etag",
    "warc_rec", "__html", "__e", "__cand", "__keep")

  /** The [[cleanCorpus]] funnel per RECORD, unfiltered — every record of
    * every archive, with the funnel's computed columns attached and a
    * `__keep` verdict instead of a filter, so ONE archive scan can feed
    * BOTH the kept-page corpus and a status-verdict dim
    * ([[mergeGeneration]]'s one-pass requirement: the WARC parse is the
    * generation's dominant kernel cost, it must run once). The decode
    * kernels (charset guess/fix, HTML extract) are guarded by the
    * candidate gate (`when(__cand, …)`), and URL canonicalization by the
    * response gate (every response needs a `url` — [[mergeGeneration]]'s
    * verdicts cover 404/3xx/304 rows, none of them candidates), so
    * non-response records pay the header walk only and non-candidate
    * responses add just the canon kernel — exactly the rows
    * cleanCorpus's filter used to prune before computing them.
    * cleanCorpus == this → filter(__keep) → select, shared semantics by
    * construction. */
  private def annotatedRecords(warcs: DataFrame, payloadCol: String,
      maxLinkDensity: Double, minTextBytes: Long): DataFrame = {
    require(maxLinkDensity >= 0.0 && maxLinkDensity <= 1.0,
      s"cleanCorpus: maxLinkDensity must be in [0,1], got $maxLinkDensity")
    require(minTextBytes >= 1L,
      s"cleanCorpus: minTextBytes must be >= 1, got $minTextBytes")
    val clash = warcs.columns.filter(c => c != payloadCol &&
      Reserved.contains(c.toLowerCase(java.util.Locale.ROOT)))
    require(clash.isEmpty,
      s"cleanCorpus: input columns ${clash.mkString(", ")} collide with " +
        "reserved output/internal names (" +
        Reserved.toSeq.sorted.mkString(", ") + "); rename them upstream")
    // rec_type compares ASCII case-insensitively (ISO 28500 field names
    // and values are case-preserving in the wild: 'Response' happens) —
    // this is the SAME comparison CrawlAuditKernel.audit uses, so the
    // audit's `kept` == cleanCorpus's row count stays an invariant
    val cand = lower(col("warc_rec.rec_type")) === "response" &&
      col("warc_rec.status") === 200 &&
      col("warc_rec.mime").startsWith("text/html")
    val page = Multimodal.warcRecords(warcs, payloadCol)
      .drop(payloadCol)
      .withColumn("__cand", cand)
      .withColumn("charset", when(col("__cand"),
        call_function("graft_charset_guess", col("warc_rec.body"))))
      .withColumn("__html", when(col("__cand"),
        call_function("graft_charset_fix", col("warc_rec.body"))))
      .withColumn("__e", when(col("__cand"),
        call_function("graft_html_extract", col("__html"))))
    val ld = HtmlExtract.linkDensity(col("__e"))
    page
      .withColumn("url",
        when(lower(col("warc_rec.rec_type")) === "response",
          call_function("graft_canon_url", col("warc_rec.uri"))))
      .withColumn("__keep", col("__cand") &&
        col("__e.text_bytes") >= minTextBytes && ld <= maxLinkDensity)
  }

  /** Raw archives → curated page rows. Keeps HTTP 200 HTML responses
    * whose extracted text clears `minTextBytes` and is not link-dominated
    * (`maxLinkDensity`). Output columns: `url` (canonicalized), `status`,
    * `mime`, `charset` (detected), `text`, `text_bytes`, `link_density`,
    * `n_links`, `last_modified`, `etag` (the response's RFC 9110 §8.8
    * freshness validators, verbatim — so this operator's output IS the
    * corpus frame [[recrawlScheduleHttp]] consumes, no second parse of
    * the archives), plus the caller's non-payload columns. Those output
    * names (and the internals `warc_rec`/`__html`/`__e`) are RESERVED:
    * a caller column with any of these names would be silently
    * overwritten, so the operator fails fast instead. */
  def cleanCorpus(warcs: DataFrame, payloadCol: String = "payload",
      maxLinkDensity: Double = 0.5, minTextBytes: Long = 50L): DataFrame = {
    val ld = HtmlExtract.linkDensity(col("__e"))
    annotatedRecords(warcs, payloadCol, maxLinkDensity, minTextBytes)
      .filter(col("__keep"))
      .select(col("*"), col("warc_rec.status").as("status"),
        col("warc_rec.mime").as("mime"),
        col("__e.text").as("text"),
        col("__e.text_bytes").as("text_bytes"),
        ld.as("link_density"),
        col("__e.n_links").as("n_links"),
        col("warc_rec.last_modified").as("last_modified"),
        col("warc_rec.etag").as("etag"))
      .drop("warc_rec", "__html", "__e", "__cand", "__keep")
  }

  /** Redirect edges — the OTHER frontier feed: a 3xx response's
    * `Location` header is a crawl edge exactly like an outlink, and a
    * frontier that ignores it never discovers moved content. One row per
    * redirect record: `from_url` (the canonical record URI), `to_url`
    * (the canonical RESOLVED target — `Location` is routinely relative,
    * RFC 9110 §10.2.2, so `graft_resolve_url` anchors it on the record
    * URI), and `status` (301/302/303/307/308 …). Rows whose target
    * cannot be canonicalized (no usable base, malformed authority) are
    * dropped — compose with [[auditCorpus]]-style counting upstream if
    * loss accounting is needed. Pure scan-side projection + filter:
    * single-stage per split, streaming-transparent, shuffle-free. */
  def redirectEdges(warcs: DataFrame,
      payloadCol: String = "payload"): DataFrame = {
    val recs = Multimodal.warcRecords(warcs, payloadCol).drop(payloadCol)
    recs
      .filter(col("warc_rec.status").between(300, 399) &&
        col("warc_rec.location").isNotNull)
      .withColumn("from_url",
        call_function("graft_canon_url", col("warc_rec.uri")))
      .withColumn("to_url",
        call_function("graft_canon_url",
          call_function("graft_resolve_url", col("warc_rec.uri"),
            col("warc_rec.location"))))
      .withColumn("status", col("warc_rec.status"))
      .filter(col("from_url").isNotNull && col("to_url").isNotNull)
      .drop("warc_rec")
  }

  /** Frontier expansion as ONE operator — the incremental-crawl query
    * every piece of this tier exists for: crawled pages → outlinks
    * (resolved against each page's own URL, since real hrefs are
    * relative) → canonical keys → per-host robots filter → anti-join
    * against the standing corpus → dedup with ref counts. Inputs:
    * `pages(urlCol, htmlCol + carry-through)`, a `robots(host, robots)`
    * dim (one row per host — BROADCAST side at any scale: there are
    * orders of magnitude fewer hosts than edges; a host with NO row is
    * treated as publishing no robots.txt, i.e. everything allowed, per
    * RFC 9309 §2.3.1.1 — robotsDim need not be complete), and a
    * `corpus(canonical url)` key set. The corpus anti-join carries NO
    * forced broadcast hint: a standing 100 TB corpus's key set does not
    * fit a broadcast, so AQE picks the strategy from runtime sizes
    * (broadcast while the corpus is small, shuffle anti-join — bucket it
    * upstream for co-location — once it isn't; a hard `broadcast()`
    * would leave no way to do that). Output:
    * `(url, n_refs)` — new, fetchable, deduplicated frontier URLs.
    * Shuffle budget: the final canon-key rollup (plus the corpus
    * anti-join once the corpus outgrows a broadcast); everything before
    * it is scan-side codegen plus broadcast equi-joins (the q223 plan,
    * verified by `.explain`). */
  def frontier(pages: DataFrame, urlCol: String, htmlCol: String,
      robotsDim: DataFrame, corpus: DataFrame,
      agent: String = "graftbot"): DataFrame = {
    require(corpus.columns.length == 1,
      "frontier: corpus must be a single canonical-url key column")
    frontierAllowed(pages, urlCol, htmlCol, robotsDim, agent)
      .join(corpus.toDF("url"), Seq("url"), "left_anti")
      .groupBy(col("url"))
      .agg(count(lit(1)).as("n_refs"))
  }

  /** [[frontier]] with REDIRECT AWARENESS — closes the moved-page seam:
    * plain frontier() anti-joins the standing corpus on the outlink's own
    * canon key, so a URL whose redirect chain terminates at an
    * already-crawled page re-enters the frontier as "new" (and a crawler
    * that fetches it burns a request to learn what it already knew).
    * This variant maps every allowed candidate through
    * [[resolveRedirectChains]]' `from_url → final_url` BEFORE the
    * corpus anti-join and the ref-count rollup, so:
    *
    *  - a moved URL whose target is already crawled disappears from the
    *    frontier (the anti-join sees the final location);
    *  - a moved URL whose target is NEW surfaces AS the final target —
    *    the URL worth fetching — with refs from both its old and new
    *    names rolled up together.
    *
    * `redirects` is [[resolveRedirectChains]] output (or any frame with
    * `from_url`/`final_url`); unresolved rows (null `final_url` — cycles,
    * over-cap chains) are ignored, leaving those candidates on their own
    * key (LOUDLY unresolved upstream, unchanged here). The redirect join
    * AND the corpus anti-join are plain equi-joins, NOT forced
    * broadcasts: both frames scale with the corpus (every 3xx page; the
    * whole standing key set), so AQE picks broadcast only when it
    * genuinely fits and a bucketed shuffle join remains reachable at
    * 100 TB. Everything else is the q223 plan shape. */
  def frontierResolved(pages: DataFrame, urlCol: String, htmlCol: String,
      robotsDim: DataFrame, corpus: DataFrame, redirects: DataFrame,
      agent: String = "graftbot"): DataFrame = {
    val rcols = redirects.columns.map(_.toLowerCase(java.util.Locale.ROOT))
    require(rcols.contains("from_url") && rcols.contains("final_url"),
      "frontierResolved: redirects must carry (from_url, final_url) — " +
        "resolveRedirectChains output")
    require(corpus.columns.length == 1,
      "frontierResolved: corpus must be a single canonical-url key column")
    val moved = redirects
      .filter(col("final_url").isNotNull)
      .select(col("from_url").as("url"), col("final_url"))
    // candidate generation + robots gate on the ORIGINAL url (the fetch
    // the crawler would issue first); then map through the chain and
    // gate AGAIN on the FINAL location — a redirect into a disallowed
    // path (or onto another host whose robots forbid it) must not put a
    // robots-forbidden URL into the frontier, and RFC 9309 applies to
    // every request of the chain, not just the first
    val allowed = frontierAllowed(pages, urlCol, htmlCol, robotsDim, agent)
    allowed
      .join(moved, Seq("url"), "left")
      .select(coalesce(col("final_url"), col("url")).as("url"),
        col("final_url").isNotNull.as("__moved"))
      .withColumn("__host", expr("parse_url(url, 'HOST')"))
      .withColumn("__pq", concat(expr("parse_url(url, 'PATH')"),
        coalesce(concat(lit("?"), expr("parse_url(url, 'QUERY')")),
          lit(""))))
      .join(broadcast(robotsDim.select(col("host").as("__host"),
        col("robots").as("__robots"))), Seq("__host"), "left")
      .filter(!col("__moved") || col("__robots").isNull ||
        call_function("graft_robots_allowed", col("__robots"),
          lit(agent), col("__pq")))
      .select(col("url"))
      .join(corpus.toDF("url"), Seq("url"), "left_anti")
      .groupBy(col("url"))
      .agg(count(lit(1)).as("n_refs"))
  }

  /** Shared candidate pipeline of [[frontier]]/[[frontierResolved]]:
    * outlinks → RFC 3986 resolution → canon keys → per-host robots gate.
    * One column out: `url` (canonical, robots-allowed, pre-dedup). */
  private def frontierAllowed(pages: DataFrame, urlCol: String,
      htmlCol: String, robotsDim: DataFrame, agent: String): DataFrame = {
    require(robotsDim.columns.toSeq.map(_.toLowerCase(java.util.Locale.ROOT))
      .sorted == Seq("host", "robots"),
      "frontier: robotsDim must have exactly (host, robots) columns")
    val links = HtmlExtract.resolvedOutlinks(pages, htmlCol, urlCol)
      .select(call_function("graft_canon_url", col("href")).as("url"))
      .filter(col("url").isNotNull)
      .withColumn("host", expr("parse_url(url, 'HOST')"))
      .withColumn("__path_q", concat(expr("parse_url(url, 'PATH')"),
        coalesce(concat(lit("?"), expr("parse_url(url, 'QUERY')")),
          lit(""))))
    // LEFT join: a host with no robots row means no robots.txt was
    // published, and the crawling convention (RFC 9309 §2.3.1.1: a 404
    // on /robots.txt) is that EVERYTHING is allowed — an inner join
    // would silently drop every URL on such hosts from the frontier
    links
      .join(broadcast(robotsDim), Seq("host"), "left")
      .filter(col("robots").isNull ||
        call_function("graft_robots_allowed", col("robots"),
          lit(agent), col("__path_q")))
      .select(col("url"))
  }

  /** Per-URL polite fetch schedule — [[auditCorpus]]'s q228 budget
    * companion at URL granularity: serialize each host's fetches
    * `Crawl-delay` seconds apart (1 s default when unset or when the
    * host has no robotsDim row at all — never hammer), hosts in
    * parallel. Hosts below `deskewHostUrls` URLs rank in one window
    * partitioned BY HOST (the natural parallelism unit — no global
    * sort) over a broadcast robots dim; a MEGA host above the threshold
    * would make that window one sorted task holding the host's entire
    * URL set (a 10⁷-URL host at production scale = one task), so its
    * rows instead rank via the two-pass range-partition + offset
    * pattern ([[Ranking.globalRowNumber]] over `(host, url)` — the
    * host's sort spreads across range partitions, and a per-host base
    * offset restores 1-based slots). Both paths produce IDENTICAL
    * slots (row_number by url within host); the threshold only picks
    * the plan shape, so correctness never depends on it. The split is
    * DATA-DEPENDENT and decided eagerly: one cheap probe (the map-side-
    * combined per-host rollup, `limit(1)`) checks whether ANY host
    * trips the threshold — when none does (the common schedule), the
    * plan is exactly the pre-split single window with zero extra
    * operators, so balanced schedules never pay the two-pass machinery
    * (its pins and range sample are construction-time jobs).
    *
    * Caller contract: this operator is NOT a pure plan builder — it
    * runs ONE Spark job at construction (the probe; spec-pinned), and
    * when the de-skew branch engages it additionally pins the
    * |hosts|-sized mega-host set ([[graft.core.Checkpoints.pin]]) so
    * the probe, the left_anti and the left_semi all read ONE
    * materialized host set — an unpinned rollup over a
    * non-deterministic source could route a host into both branches
    * (duplicate slots) or neither (dropped rows), and would re-run the
    * `urls` scan once per consumer. `Checkpoints.release` on the
    * returned frame frees that pin once consumed. STREAMING inputs
    * always take the single-window path (the probe and the two-pass
    * rank are batch jobs; a streaming mega host needs an upstream
    * repartition instead). Output adds
    * `slot` (1-based fetch index within the host, ordered by URL for
    * determinism) and `offset_s` (= `(slot−1) × delay` — the earliest
    * polite start relative to the host's first fetch). */
  def politeSchedule(urls: DataFrame, robotsDim: DataFrame,
      agent: String = "graftbot",
      deskewHostUrls: Long = 1L << 20): DataFrame = {
    require(robotsDim.columns.toSeq.map(_.toLowerCase(java.util.Locale.ROOT))
      .sorted == Seq("host", "robots"),
      "politeSchedule: robotsDim must have exactly (host, robots) columns")
    require(deskewHostUrls >= 1L,
      s"politeSchedule: deskewHostUrls must be >= 1, got $deskewHostUrls")
    // LEFT join (the frontier convention): a host absent from robotsDim
    // published no robots.txt — its URLs still get scheduled, at the
    // polite 1 s default (null delay → the coalesce below), rather than
    // silently vanishing from the schedule
    val withDelay = urls.join(broadcast(robotsDim), Seq("host"), "left")
      .withColumn("crawl_delay",
        call_function("graft_robots_delay", col("robots"), lit(agent)))
      .drop("robots")
    // mega-host detection: one map-side-combined rollup to |hosts| rows
    // (the robotsDim scale — broadcastable by the same argument)
    val mega0 = withDelay.groupBy(col("host"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= deskewHostUrls)
      .select(col("host"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host")).orderBy(col("url"))
    // one cheap eager probe picks the plan: the max of the per-host
    // rollup in ONE job (map-side partial aggregation ships one row
    // per host per partition; a limit(1)-style probe would run
    // several incremental jobs on the common no-mega schedule, since
    // proving the filtered rollup EMPTY scans everything anyway)
    val hasMega = deskewHostUrls != Long.MaxValue &&
      !withDelay.isStreaming && {
        val top = withDelay.groupBy(col("host"))
          .agg(count(lit(1)).as("__n")).agg(max(col("__n"))).collect()
        top.nonEmpty && !top(0).isNullAt(0) &&
          top(0).getLong(0) >= deskewHostUrls
      }
    val slotted =
      if (!hasMega) withDelay.withColumn("slot", row_number().over(w))
      else {
        // PIN the host set before fanning it into two join subtrees:
        // both branches must read ONE materialized rollup (see the
        // caller contract above), and the pin also stops the urls scan
        // re-running once per consumer
        val mega = graft.core.Checkpoints.pin(mega0)
        val normal = withDelay
          .join(broadcast(mega), Seq("host"), "left_anti")
          .withColumn("slot", row_number().over(w))
        val ranked = Ranking.globalRowNumber(
          withDelay.join(broadcast(mega), Seq("host"), "left_semi"),
          Seq(col("host"), col("url")), "__grn")
        // per-host base = min global rank − 1 (hosts dim-sized rollup)
        val base = ranked.groupBy(col("host"))
          .agg(min(col("__grn")).as("__base"))
        val deskewed = ranked.join(broadcast(base), Seq("host"))
          .withColumn("slot",
            (col("__grn") - col("__base") + 1L).cast("int"))
          .drop("__grn", "__base")
        normal.unionByName(deskewed)
      }
    slotted
      .withColumn("offset_s", (col("slot") - 1).cast("double") *
        coalesce(col("crawl_delay"), lit(1.0)))
  }

  /** Sitemap-index recursion over a PRE-FETCHED set — `sitemapindex`
    * files point at child sitemaps, which point at children or at URL
    * sets; a crawl that stops at depth 1 misses most of a large site's
    * inventory (the 50k-URL/file protocol cap forces big sites to
    * index). Inputs: `fetched(url, payload)` — the sitemap files already
    * pulled, keyed by canonical URL (`graft_canon_url` form — the
    * contract the frontier/corpus tier keys everything by; a ledger
    * keyed by RAW locs also works, because each level's frontier
    * advances on BOTH the canonical and the publisher's raw child loc)
    * — and `roots` (a single column of root sitemap URLs in the same
    * key form as `fetched.url`). Expands breadth-first to `maxDepth`
    * levels: each level joins the current frontier against `fetched`
    * (broadcast the frontier — it is orders of magnitude smaller than
    * the fetched corpus), parses, emits `kind='url'` entries with their
    * depth, and feeds `kind='sitemap'` locs to the next level. Output:
    * `(url, loc, lastmod, changefreq, priority, depth)` — `url` is the
    * CANONICAL form (`graft_canon_url`, the key the frontier and corpus
    * join on; loud NULL when the loc is relative or malformed) and
    * `loc` is the publisher's raw string verbatim. A child loc absent
    * from `fetched` simply contributes nothing at the next level (fetch
    * gaps are visible by anti-joining the returned sitemap locs — the
    * audit composes, it is not silently swallowed here: THIS operator
    * never drops a parsed entry). Depth× joins, each a plain equi-join;
    * maxDepth is small by protocol (indexes of indexes are rare past
    * 2–3 levels). */
  def expandSitemaps(fetched: DataFrame, roots: DataFrame,
      maxDepth: Int = 3): DataFrame = {
    require(maxDepth >= 1 && maxDepth <= 8,
      s"expandSitemaps: maxDepth must be in [1,8], got $maxDepth")
    require(roots.columns.length == 1,
      "expandSitemaps: roots must be a single url column")
    // select by NAME, not position — a caller passing (payload, url)
    // would otherwise be silently mislabeled (the frontier()/
    // politeSchedule() validation convention)
    require(fetched.columns.toSeq.map(_.toLowerCase(java.util.Locale.ROOT))
      .sorted == Seq("payload", "url"),
      "expandSitemaps: fetched must have exactly (url, payload) columns")
    val f = fetched.select(col("url"), col("payload"))
    var frontier = roots.toDF("url")
    var out: DataFrame = null
    for (depth <- 1 to maxDepth) {
      val parsed = broadcast(frontier.distinct())
        .join(f, Seq("url"))
        .select(explode(call_function("graft_sitemap_parse",
          col("payload"))).as("e"))
        .select(col("e.kind").as("kind"),
          call_function("graft_canon_url", col("e.loc")).as("url"),
          col("e.loc").as("loc"), col("e.lastmod").as("lastmod"),
          col("e.changefreq").as("changefreq"),
          col("e.priority").as("priority"))
      val urls = parsed.filter(col("kind") === "url")
        .select(col("url"), col("loc"), col("lastmod"), col("changefreq"),
          col("priority"), lit(depth).as("depth"))
      out = if (out == null) urls else out.unionAll(urls)
      // next level advances on BOTH keys — the canonical fold AND the
      // publisher's raw loc — so a fetch ledger keyed either way joins;
      // the two collapse in the per-level distinct, and a key absent
      // from `fetched` contributes nothing (the documented gap rule)
      val sm = parsed.filter(col("kind") === "sitemap")
      frontier = sm.filter(col("url").isNotNull).select(col("url"))
        .unionAll(sm.filter(col("loc").isNotNull)
          .select(col("loc").as("url")))
    }
    out
  }

  /** Recrawl scheduling from sitemap freshness — the decision query an
    * incremental crawl runs after [[graft.expressions.SitemapKernel
    * sitemap ingestion]]: which published URLs are worth fetching?
    * Inputs: `entries(url, lastmod)` (canonical URL + the sitemap's
    * W3C-datetime string, null when unpublished) and
    * `corpus(url, last_crawled)` (the standing corpus's fetch times,
    * same string form). Verdicts, one row per entry:
    *
    *  - `new` — not in the corpus at all;
    *  - `refresh` — in the corpus and `lastmod` strictly newer than
    *    `last_crawled`, compared as INSTANTS when BOTH sides are full
    *    TZD-bearing W3C datetimes (`yyyy-MM-ddTHH:mm[:ss[.f…]]` + `Z`
    *    or `±hh:mm`, parsed with EXPLICIT patterns — fractional
    *    seconds are stripped first, so sub-second-only differences
    *    compare equal → skip, conservative): W3C datetime permits
    *    numeric UTC offsets, and `2026-01-02T01:00:00+09:00` sorts
    *    lexicographically AFTER `2026-01-01T23:00:00Z` yet is
    *    chronologically EARLIER — a mixed-offset sitemap would flip
    *    verdicts under a string compare. Every other form — reduced
    *    W3C granularity (`2026`, `2026-01`, `2026-01-02`) AND
    *    offset-less datetimes (non-W3C: the profile requires a TZD on
    *    any time-bearing form) — falls back to the lexicographic rule,
    *    which is exact for same-granularity forms and prefix-wise
    *    conservative across granularities, and — unlike parsing such
    *    forms with cast semantics — never depends on
    *    `spark.sql.session.timeZone` (a date-only lastmod must not
    *    flip verdicts ±14h with the session; spec-pinned under a
    *    non-UTC session);
    *  - `skip` — in the corpus with no newer signal (null lastmod
    *    included: absence of evidence is not staleness).
    *
    * Plan shape: one left equi-join on the canonical key (broadcast
    * when the corpus side fits, bucketed upstream when it doesn't) and
    * a projection — no other shuffle. */
  def recrawlSchedule(entries: DataFrame, corpus: DataFrame): DataFrame = {
    require(corpus.columns.length == 2,
      "recrawlSchedule: corpus must be (url, last_crawled)")
    val c = corpus.toDF("url", "last_crawled")
    // instant compare first; null (either side not a full TZD-bearing
    // W3C datetime) falls back to the lexicographic compare rather
    // than silently skipping. EXPLICIT patterns, not cast semantics:
    // try_to_timestamp without a format accepts reduced forms like
    // '2026-01' as session-timezone midnight, making verdicts depend
    // on spark.sql.session.timeZone — the patterns reject them into
    // the tz-independent string rule instead
    def w3cInstant(s: Column): Column = {
      val noFrac = regexp_replace(s, "\\.[0-9]+", "")
      coalesce(
        try_to_timestamp(noFrac, lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        try_to_timestamp(noFrac, lit("yyyy-MM-dd'T'HH:mmXXX")))
    }
    val newer = coalesce(
      w3cInstant(col("lastmod")) > w3cInstant(col("last_crawled")),
      col("lastmod") > col("last_crawled"))
    entries.join(c, Seq("url"), "left")
      .withColumn("action",
        when(col("last_crawled").isNull, lit("new"))
          .when(col("lastmod").isNotNull && newer, lit("refresh"))
          .otherwise(lit("skip")))
  }

  /** Recrawl scheduling with HTTP FRESHNESS SIGNALS — [[recrawlSchedule]]
    * upgraded with the validators [[graft.expressions.WarcKernel]]
    * surfaces from the stored copy's response headers (RFC 9110 §8.8):
    * `Last-Modified` and `ETag`. Inputs: `entries(url, lastmod)` as
    * before, and `corpus(url, last_crawled, last_modified, etag)` — the
    * standing corpus's fetch time (W3C/ISO datetime string), plus the
    * stored response's validators verbatim (null when the server sent
    * none). Verdicts, one row per entry:
    *
    *  - `new` — not in the corpus;
    *  - `refresh` — the sitemap's `lastmod` is STRICTLY newer than the
    *    stored copy's best freshness instant, which PREFERS the server's
    *    own `Last-Modified` over our crawl time when both exist (the
    *    server's statement about the CONTENT beats our statement about
    *    the FETCH: a copy crawled in January whose server stamped it
    *    March is not stale against a February sitemap claim);
    *  - `skip` — everything else (null/unparseable lastmod included:
    *    absence of evidence is not staleness).
    *
    * Instants compare as TIMESTAMPS, not strings — IMF-fixdate
    * (`Tue, 03 Mar 2026 10:00:00 GMT`) does not order lexicographically,
    * so the kernel's string-verbatim contract ends here:
    * `try_to_timestamp` parses both forms (malformed → null → that
    * signal simply doesn't participate, never a throw mid-plan).
    *
    * Also emits `validator` — the conditional-request token the fetcher
    * should send: `etag` (If-None-Match, RFC 9110 §13.1.2's preferred
    * validator) when the stored copy has one, else `last_modified`
    * (If-Modified-Since), else `none` (unconditional GET). Plan shape
    * unchanged from recrawlSchedule: ONE left equi-join + projections. */
  def recrawlScheduleHttp(entries: DataFrame, corpus: DataFrame): DataFrame = {
    require(corpus.columns.length == 4,
      "recrawlScheduleHttp: corpus must be (url, last_crawled, " +
        "last_modified, etag)")
    val c = corpus.toDF("url", "last_crawled", "last_modified", "etag")
    // IMF-fixdate: Spark's parser rejects 'E' (day-of-week) in PARSING
    // patterns, so strip the redundant fixed "Tue, " prefix — and turn
    // the trailing "GMT" into an EXPLICIT "+0000" offset the pattern's
    // `Z` consumes: a quoted 'GMT' literal would parse the wall clock in
    // the SESSION time zone, skewing the instant by the session offset
    // against TZ-bearing sitemap lastmod strings (GraftSession pins UTC,
    // but a library operator must not depend on that)
    val imfValue = regexp_replace(
      regexp_replace(col("last_modified"), lit("^[A-Za-z]{3}, "), lit("")),
      lit(" GMT$"), lit(" +0000"))
    val storedFresh = coalesce(
      try_to_timestamp(imfValue, lit("dd MMM yyyy HH:mm:ss Z")),
      try_to_timestamp(col("last_crawled")))
    entries.join(c, Seq("url"), "left")
      .withColumn("action",
        when(col("last_crawled").isNull, lit("new"))
          .when(col("lastmod").isNotNull &&
            try_to_timestamp(col("lastmod")) > storedFresh, lit("refresh"))
          .otherwise(lit("skip")))
      .withColumn("validator",
        when(col("etag").isNotNull, lit("etag"))
          .when(col("last_modified").isNotNull, lit("last_modified"))
          .otherwise(lit("none")))
  }

  /** Multi-hop redirect resolution over [[redirectEdges]] output — the
    * step that turns raw 3xx edges into the mapping a crawler actually
    * needs (`from_url` → the TERMINAL `final_url`), since real moves
    * chain (http→https→www→path). POINTER DOUBLING, not per-hop
    * iteration: each round composes the partial map with itself
    * (`f ← f∘f` via an equi-join on `cur = src`), so `maxHops` hops
    * cost ⌈log₂ maxHops⌉ shuffle joins — at 100 TB that is 3–4 joins
    * for the 8–16 hop cap instead of 8–16, and every join is a plain
    * key equi-join AQE can plan. Duplicate out-edges per source (the
    * same URL re-crawled) collapse deterministically to `min(to_url)`
    * first. Output: `from_url, final_url, hops, resolved` — a cycle
    * (`a→b→a`) or a chain longer than `maxHops` reports
    * `resolved=false` with null final/hops (LOUD, like every kernel:
    * an unresolved redirect is a fact, not a silent drop). */
  def resolveRedirectChains(edges0: DataFrame,
      maxHops: Int = 8): DataFrame = {
    require(maxHops >= 1 && maxHops <= 64,
      s"resolveRedirectChains: maxHops must be in [1,64], got $maxHops")
    // PIN the deduped edge map and each doubling round
    // ([[graft.core.Checkpoints.pin]], the connectedComponents
    // discipline): without it, `f ← f∘f` doubles the PLAN each round —
    // round k re-executes the base edge scan 2^k times (the r15 q237
    // decade sweep read expCPU 1.54 on exactly that recomputation; at
    // 100 TB it would be 2^⌈log₂ maxHops⌉ redundant passes over the
    // edge corpus). Pin lifecycle, also the connectedComponents rules:
    // superseded rounds release eagerly, EVERY intermediate pin (edges
    // included) releases in the finally — on failure paths too — and
    // the returned frame is ITSELF a pin whose storage the caller may
    // Checkpoints.release once consumers are done.
    val edges = graft.core.Checkpoints.pin(edges0.groupBy(col("from_url"))
      .agg(min(col("to_url")).as("to_url")))
    var pinned: DataFrame = null
    try {
      var f = edges.select(col("from_url").as("src"),
        col("to_url").as("cur"), lit(1L).as("hops"))
      var span = 1L
      while (span < maxHops) {
        val g = f.select(col("src").as("g_src"), col("cur").as("g_cur"),
          col("hops").as("g_hops"))
        val next = graft.core.Checkpoints.pin(
          f.join(g, f("cur") === g("g_src"), "left")
            .select(col("src"), coalesce(col("g_cur"), col("cur")).as("cur"),
              (col("hops") + coalesce(col("g_hops"), lit(0L))).as("hops")))
        if (pinned != null) graft.core.Checkpoints.release(pinned)
        pinned = next
        f = next
        span *= 2
      }
      // terminal = cur is not itself a redirect source
      val dom = edges.select(col("from_url").as("d_src"))
      graft.core.Checkpoints.pin(
        f.join(dom, f("cur") === dom("d_src"), "left")
          .withColumn("resolved",
            col("d_src").isNull && col("hops") <= maxHops)
          .select(col("src").as("from_url"),
            when(col("resolved"), col("cur")).as("final_url"),
            when(col("resolved"), col("hops")).as("hops"),
            col("resolved")))
    } finally {
      graft.core.Checkpoints.release(edges)
      if (pinned != null) graft.core.Checkpoints.release(pinned)
    }
  }

  /** Coalesced range-fetch plan over a CDXJ index selection — the step
    * that turns "query the index, not the archives" into actual I/O: a
    * selective pipeline filters the per-crawl index
    * (`graft_cdxj_parse`) down to the captures it wants, and this
    * operator groups them into the byte ranges a fetcher issues —
    * adjacent captures in the same WARC file whose gap is at most
    * `maxGapBytes` merge into ONE range request (reading a small gap is
    * cheaper than a second round trip; the object-store GET economics).
    * Input: any frame with `filename`, `offset`, `length` (bigints, the
    * index fields). Output, one row per range: `filename, start, end,
    * n_records, payload_bytes, gap_bytes` — `end` exclusive,
    * `payload_bytes` the sum of record lengths, `gap_bytes` the dead
    * bytes the coalescing chose to read (`end−start−payload` when
    * records don't overlap). Rows with null filename/offset/length are
    * EXCLUDED and counted via the caller's audit (loud upstream, a
    * malformed index line never silently plans a bogus range).
    *
    * RANGE-SIZE CAP: `maxRangeBytes` (default 1 GiB — generous; real
    * fetchers also cap per-GET size) bounds each coalesced range: a
    * densely-selected file must not coalesce into one archive-sized
    * GET (nor, in [[fetchRecords]], one archive-sized in-plan row).
    * The cap splits a gap-group at fixed `maxRangeBytes` grid
    * boundaries relative to the group's start — the window-expressible
    * variant of the greedy rule, which is inherently prefix-sequential
    * — so every range's byte span is < `maxRangeBytes` + one record's
    * length (a record straddling a grid boundary extends its range by
    * its own length; a single record longer than the cap stays one
    * range — a record cannot be split). Splitting never changes WHICH
    * records are fetched, only how many GETs carry them.
    *
    * Plan shape: one window PARTITIONED BY FILENAME (the natural unit —
    * a crawl's index spans tens of thousands of WARC files, so
    * parallelism is wide and no partition exceeds one file's captures)
    * ordered by offset; gap-break flag → running group id → grid
    * sub-id (same window frame — no extra shuffle or sort) → one
    * aggregation. No global sort, no self-join. */
  def fetchPlan(index: DataFrame, maxGapBytes: Long = 1L << 20,
      maxRangeBytes: Long = 1L << 30): DataFrame =
    rangeGroups(index, maxGapBytes, maxRangeBytes, "fetchPlan")
      .groupBy(col("filename"), col("__grp"), col("__sub"))
      .agg(min(col("offset")).as("start"),
        max(col("offset") + col("length")).as("end"),
        count(lit(1)).as("n_records"),
        sum(col("length")).as("payload_bytes"))
      .withColumn("gap_bytes",
        col("end") - col("start") - col("payload_bytes"))
      .drop("__grp", "__sub")

  /** Shared gap-coalescing core of [[fetchPlan]]/[[fetchRecords]]: the
    * per-file offset window, running-max `__prev_end`, break flag,
    * running group id `__grp`, and the range-size-cap grid sub-id
    * `__sub` (the gap-group's start rides the same running frame via
    * `last(ignoreNulls)` — every group starts at a break row, whose
    * offset IS the group minimum) — one coalesced range per
    * (filename, __grp, __sub). */
  private def rangeGroups(index: DataFrame, maxGapBytes: Long,
      maxRangeBytes: Long, op: String): DataFrame = {
    require(maxGapBytes >= 0L,
      s"$op: maxGapBytes must be >= 0, got $maxGapBytes")
    require(maxRangeBytes >= 1L,
      s"$op: maxRangeBytes must be >= 1, got $maxRangeBytes")
    val cols = index.columns.map(_.toLowerCase(java.util.Locale.ROOT))
    require(Seq("filename", "offset", "length").forall(cols.contains),
      s"$op: index must carry (filename, offset, length) — " +
        "graft_cdxj_parse output")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("filename")).orderBy(col("offset"), col("length"))
    val running = w.rowsBetween(org.apache.spark.sql.expressions.Window
      .unboundedPreceding, 0)
    index
      .filter(col("filename").isNotNull && col("offset").isNotNull &&
        col("length").isNotNull)
      .withColumn("__prev_end",
        max(col("offset") + col("length")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, -1)))
      .withColumn("__break",
        when(col("__prev_end").isNull ||
          col("offset") > col("__prev_end") + maxGapBytes, 1L)
          .otherwise(0L))
      .withColumn("__grp", sum(col("__break")).over(running))
      .withColumn("__gstart", last(
        when(col("__break") === 1L, col("offset")), ignoreNulls = true)
        .over(running))
      // integral `div`, never float division: offsets are bigints and a
      // double quotient would lose exactness past 2^53
      .withColumn("__sub",
        expr(s"(offset - __gstart) div ${maxRangeBytes}L"))
      .drop("__prev_end", "__break", "__gstart")
  }

  /** Selective replay: coalesced ranges → the records themselves — the
    * step that makes the index tier LOAD-BEARING instead of adjacent.
    * [[fetchPlan]] emits the byte ranges a fetcher issues; this operator
    * consumes them against the archive bytes and hands each selected
    * capture to `graft_warc_parse`, so the production shape
    * `cdxj → filter → fetchPlan → range-read → parse → cleanCorpus`
    * runs as ONE plan. Inputs: `index` as in fetchPlan, and
    * `archives(filename, <payloadCol>)` — one row per WARC file. In
    * production the range-read is the fetcher's object-store GET; here
    * the archive payload stands in for it, and the record extraction
    * mirrors the real shape exactly: slice the RANGE first (one
    * `substr` per coalesced range — the simulated GET), then slice each
    * member record out of the range by `(offset − start, length)` —
    * gap bytes between selected captures (whole unselected records, by
    * the index's record-aligned offsets) are read but never parsed.
    *
    * Output: one row per selected capture — `filename, offset, length,
    * warc_rec` (the parse's struct: rec_type/uri/status/mime/location/
    * validators/body), plus — when `sliceCol` is set — the capture's
    * RAW slice bytes under that name: a member slice is a complete
    * standalone record (plain or one gzip member run, the kernel's
    * re-slice contract), so the slice column feeds [[cleanCorpus]] /
    * [[mergeGeneration]] directly as a one-record archive — the
    * production composition `index → replay → curate` without a second
    * byte source. A slice that fails to parse yields a null
    * `warc_rec` (the loud-null kernel rule — a corrupt or misaligned
    * index entry surfaces, never vanishes). Join index metadata back on
    * `(filename, offset)` when the capture's urlkey/ts/digest are
    * needed downstream.
    *
    * Plan shape: fetchPlan's per-file window, one `collect_list` of
    * `(offset, length)` members per range (bounded by the range's
    * record count — ranges never span a file, the gap cap bounds dead
    * bytes, and `maxRangeBytes` bounds each range's span — and hence
    * the in-plan row holding its bytes — at cap + one record; see
    * [[fetchPlan]]), ONE equi-join on filename against the archives, then
    * a per-member explode + slice + parse — all scan-side codegen after
    * the join. Offsets are validated against Spark's 2 GiB binary-value
    * ceiling (`raise_error` past it — an in-plan payload cannot index
    * beyond Int range; at production scale the ranges feed a real
    * range-GET fetcher instead and no such limit exists). */
  def fetchRecords(index: DataFrame, archives: DataFrame,
      maxGapBytes: Long = 1L << 20,
      payloadCol: String = "payload",
      maxRangeBytes: Long = 1L << 30,
      sliceCol: String = null): DataFrame = {
    val acols = archives.columns.map(_.toLowerCase(java.util.Locale.ROOT))
    require(acols.length == 2 && acols.contains("filename") &&
      acols.contains(payloadCol.toLowerCase(java.util.Locale.ROOT)),
      s"fetchRecords: archives must have exactly (filename, $payloadCol)")
    val ranges = rangeGroups(index, maxGapBytes, maxRangeBytes,
        "fetchRecords")
      .groupBy(col("filename"), col("__grp"), col("__sub"))
      .agg(min(col("offset")).as("start"),
        max(col("offset") + col("length")).as("end"),
        collect_list(struct(col("offset"), col("length"))).as("__members"))
    val guard = when(col("end") > lit(Int.MaxValue.toLong),
      raise_error(concat(lit("fetchRecords: range end past the 2 GiB " +
        "in-plan payload ceiling in "), col("filename"),
        lit(" — feed fetchPlan to a range-GET fetcher instead"))))
      .otherwise(col("end"))
    val sliced = ranges
      .withColumn("end", guard)
      .join(archives.select(col("filename"),
        col(payloadCol).as("__payload")), Seq("filename"))
      // the simulated range GET: one slice per coalesced range
      .withColumn("__range", col("__payload").substr(
        (col("start") + 1L).cast("int"),
        (col("end") - col("start")).cast("int")))
      .select(col("filename"), col("start"),
        explode(col("__members")).as("__m"), col("__range"))
      .select(col("filename"),
        col("__m.offset").as("offset"),
        col("__m.length").as("length"),
        col("__range").substr(
          (col("__m.offset") - col("start") + 1L).cast("int"),
          col("__m.length").cast("int")).as("__slice"))
      .withColumn("__recs",
        call_function("graft_warc_parse", col("__slice")))
      // one capture = one record slice; a parse that yields anything
      // else (corrupt bytes, misaligned offsets) lands as null — loud
      .withColumn("warc_rec",
        when(size(col("__recs")) === 1, element_at(col("__recs"), 1)))
      .drop("__recs")
    if (sliceCol == null) sliced.drop("__slice")
    else sliced.withColumnRenamed("__slice", sliceCol)
  }

  /** CDX index GENERATION — the write side of the index tier: turn a
    * crawl's own archives into the cdxj-shaped frame every index-side
    * operator consumes, so the loop `crawl → buildIndex →
    * collapseRevisits / fetchPlan / fetchRecords` runs without an
    * external indexer. One row per `response` OR `revisit` record with
    * a usable target URI: `urlkey` (`graft_surt` of the record URI —
    * the external sort key), `ts` (the first 14 digits of `WARC-Date`,
    * the CDX timestamp convention; null when the record carries no
    * date — LOUD, the caller filters), `url` (verbatim), `mime`
    * (responses: the HTTP `Content-Type`; revisits: the literal
    * `warc/revisit` — the CDX convention [[collapseRevisits]] keys its
    * revisit test on), `status`, `digest` — for a response the SHA-256
    * hex of the BODY (this engine's documented digest; CommonCrawl
    * writes base-32 SHA-1, but the digest's only contract here is
    * payload equality for [[collapseRevisits]], and SHA-256 is the
    * hash both this engine and the oracle compute identically); for a
    * `revisit` record (ISO 28500 §6.7.2 `identical-payload-digest`)
    * the record's own `WARC-Payload-Digest` value with a `sha-256:` /
    * `sha256:` label stripped, so archives whose revisit records were
    * written against this engine's digests land in the SAME
    * `(urlkey, digest)` group as their original (a foreign-labelled or
    * absent digest stays verbatim/null — LOUD, the group simply won't
    * collapse) — `length`/`offset` (the
    * record's STORAGE extent — re-sliceable by [[fetchRecords]] by
    * construction), `filename` (the caller's archive-name column).
    *
    * Offsets address the STORED bytes (the kernel's
    * `member_offset`/`member_length`): for plain WARC the record's own
    * extent in the payload; for `.warc.gz` the gzip MEMBER run holding
    * the record (compressed coordinates — the CommonCrawl CDX
    * convention, one member per record, tracked by the kernel's own
    * RFC 1952 member walk), so a compressed archive's index rows are
    * exactly what a range-GET fetcher (or [[fetchRecords]], whose
    * member slices are themselves complete gzip streams the parse
    * kernel inflates) can serve. A record whose storage packing is
    * misaligned — e.g. a whole-file SINGLE-member gzip holding many
    * records, which no range GET can slice per record — gets null
    * offset/length, LOUDLY ([[fetchPlan]] excludes null-extent rows;
    * re-pack such archives one member per record). Plan shape: pure
    * scan-side projection (parse + surt + sha2, all codegen) — no
    * shuffle at all; at 100 TB this is the one pass that makes every
    * later query an index query. */
  def buildIndex(archives: DataFrame, payloadCol: String = "payload",
      filenameCol: String = "filename"): DataFrame = {
    val cols = archives.columns.map(_.toLowerCase(java.util.Locale.ROOT))
    require(cols.contains(filenameCol.toLowerCase(java.util.Locale.ROOT)) &&
      cols.contains(payloadCol.toLowerCase(java.util.Locale.ROOT)),
      s"buildIndex: archives must carry ($filenameCol, $payloadCol)")
    val rt = lower(col("warc_rec.rec_type"))
    Multimodal.warcRecords(archives, payloadCol)
      .filter(rt.isin("response", "revisit") &&
        col("warc_rec.uri").isNotNull)
      .select(
        call_function("graft_surt", col("warc_rec.uri")).as("urlkey"),
        substring(regexp_replace(col("warc_rec.date"),
          "[^0-9]", ""), 1, 14).as("ts"),
        col("warc_rec.uri").as("url"),
        when(rt === "revisit", lit("warc/revisit"))
          .otherwise(col("warc_rec.mime")).as("mime"),
        col("warc_rec.status").as("status"),
        when(rt === "revisit",
          regexp_replace(col("warc_rec.payload_digest"),
            "(?i)^sha-?256:", ""))
          .otherwise(sha2(col("warc_rec.body"), 256)).as("digest"),
        col("warc_rec.member_length").as("length"),
        col("warc_rec.member_offset").as("offset"),
        col(filenameCol).as("filename"))
  }

  /** CDX capture-history collapse — the index-side dedup primitive over
    * `(urlkey, digest)`: CommonCrawl marks an unchanged re-capture as a
    * `warc/revisit` record carrying the ORIGINAL capture's payload
    * digest (the WARC revisit convention, ISO 28500 §6.7.2 profile
    * `identical-payload-digest`), so the archive stores the bytes once
    * while the index records every capture time. This operator folds
    * each `(urlkey, digest)` group onto its original capture, KEEPING
    * the capture timestamps:
    *
    * one row per group — `urlkey, digest, n_captures` (originals +
    * revisits), `n_revisits`, `first_ts`/`last_ts` (over ALL captures),
    * and the EARLIEST original's `ts, url, status, length, offset,
    * filename` (the payload location a [[fetchPlan]] selection should
    * read — dedup means fetching the bytes once). A group with NO
    * original (the revisit's target fell outside the index slice)
    * keeps null location columns — LOUD, `n_revisits == n_captures`
    * identifies it; it is never silently dropped. Rows whose mime is
    * null count as originals (absent metadata is not a revisit claim).
    * A DATELESS original (null `ts` — buildIndex's loud-null rule)
    * never shadows a dated one: the earliest pick orders nulls LAST,
    * so `orig_ts` is null only when the group's every original is
    * dateless (and the location columns then still point at one of
    * them — a real capture, just undated).
    *
    * Plan shape: ONE hash aggregation on `(urlkey, digest)` — the
    * original's fields ride a `min(when(original, struct(ts, …)))`
    * (struct min orders by ts first), so there is no join at all;
    * map-side partial aggregation ships one row per group per
    * partition. */
  def collapseRevisits(index: DataFrame): DataFrame = {
    val cols = index.columns.map(_.toLowerCase(java.util.Locale.ROOT))
    require(Seq("urlkey", "ts", "url", "mime", "status", "digest",
      "length", "offset", "filename").forall(cols.contains),
      "collapseRevisits: index must be graft_cdxj_parse-shaped")
    val isRevisit = col("mime") === "warc/revisit"
    index.groupBy(col("urlkey"), col("digest"))
      .agg(
        count(lit(1)).as("n_captures"),
        sum(when(isRevisit, 1L).otherwise(0L)).as("n_revisits"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"),
        // nulls-LAST original pick: Spark's struct min orders a null
        // first field FIRST, so without the sentinel a dateless
        // original (buildIndex emits null ts loudly) would shadow a
        // dated one in the same group — the sentinel sorts past any
        // real 14-digit ts and the struct's own `ts` field restores
        // the null on output when only dateless originals exist
        min(when(!coalesce(isRevisit, lit(false)),
          struct(coalesce(col("ts"), lit("99999999999999")).as("__k"),
            col("ts"), col("url"), col("status"), col("length"),
            col("offset"), col("filename")))).as("__o"))
      .select(col("urlkey"), col("digest"), col("n_captures"),
        col("n_revisits"), col("first_ts"), col("last_ts"),
        col("__o.ts").as("orig_ts"), col("__o.url").as("url"),
        col("__o.status").as("status"), col("__o.length").as("length"),
        col("__o.offset").as("offset"),
        col("__o.filename").as("filename"))
  }

  /** Generation merge — the step q234's round trip approximated with a
    * UNION: fold one crawl generation's fetch results into the standing
    * corpus with real HTTP revalidation semantics (RFC 9110), so
    * `corpus₁ = mergeGeneration(corpus₀, fetched, t₁)` is the actual
    * incremental-crawl state transition:
    *
    *  - `200` kept by the [[cleanCorpus]] funnel → UPSERT (the new page
    *    replaces the old row; brand-new URLs insert);
    *  - `200` dropped by the funnel (gated mime / too small / link farm)
    *    → REMOVE — the server's current truth is "not a keepable page",
    *    and keeping the stale copy would freeze rot into the corpus;
    *  - `304 Not Modified` → TOUCH — the validator round trip confirmed
    *    the copy, so it stays verbatim with `last_crawled` = this
    *    generation's stamp (the whole point of sending If-None-Match);
    *  - `404`/`410` → REMOVE (gone is a fact, 410 doubly so);
    *  - `3xx` → REMOVE under the OLD key — the content moved; its new
    *    location enters through [[redirectEdges]] → [[frontierResolved]]
    *    on its own merits, never by silently re-keying here;
    *  - any other status (`5xx`, `429`, …) → RETAIN unchanged — a server
    *    hiccup must not delete corpus (the fetch simply didn't advance
    *    this URL's state);
    *  - corpus URLs not in this generation's fetch → RETAIN.
    *
    * A URL fetched more than once in one generation resolves to ONE
    * verdict by precedence `upsert > remove > touch > retain`: a
    * successful kept re-fetch beats an earlier gone/moved response (a
    * page that 404s and is then re-fetched 200-and-kept is ALIVE — the
    * generation's freshest truth is the successful content, and
    * deleting it would discard the fresh page), remove beats touch (a
    * 304 beside a 410 means the validators raced a deletion; gone
    * wins), and everything beats retain (a 5xx is a non-event). Fetch
    * ORDER within a generation is not modeled (archives carry no
    * reliable ordering) — precedence is the deterministic stand-in.
    *
    * `corpus` must be cleanCorpus-shaped + `last_crawled`:
    * `(url, status, mime, charset, text, text_bytes, link_density,
    * n_links, last_modified, etag, last_crawled)`. Output: same schema —
    * composable into the next generation (and into
    * [[recrawlScheduleHttp]], which reads exactly these columns).
    *
    * Plan shape: ONE pass over the archives — the per-record annotated
    * funnel ([[annotatedRecords]], the same frame cleanCorpus filters)
    * projected to the verdict fields + kept-page columns, PINNED
    * ([[graft.core.Checkpoints.pin]]): it feeds the kept-page upserts
    * AND the status-verdict dim, and an unpinned plan would re-run
    * `graft_warc_parse` — the generation's dominant kernel cost — once
    * per consumer (a spec pins the one-eval-per-archive invariant via
    * WarcKernel.parseCount). The pin is KEPT-generation-sized: the
    * `text`/`charset` columns are gated `when(__keep, …)`, so a
    * candidate the funnel drops (under-min text, link farm — at real
    * crawl scale often the majority of 200-HTML responses) checkpoints
    * headers only, never its extracted text and never archive bytes
    * (spec-pinned: a 90%-dropped generation's pin shrinks with the
    * kept fraction); the caller may `Checkpoints.release` the returned
    * frame's inputs once consumed. Then one rollup to a per-URL verdict dim (a
    * fetched generation is orders of magnitude smaller than the corpus
    * — the broadcast side), one left join + filter over the corpus, one
    * union with the upserts. No global sort, no corpus-sized shuffle. */
  def mergeGeneration(corpus: DataFrame, fetched: DataFrame,
      fetchTime: String, payloadCol: String = "payload",
      maxLinkDensity: Double = 0.5, minTextBytes: Long = 50L): DataFrame = {
    val want = Seq("url", "status", "mime", "charset", "text",
      "text_bytes", "link_density", "n_links", "last_modified", "etag",
      "last_crawled")
    require(corpus.columns.map(_.toLowerCase(java.util.Locale.ROOT))
      .toSet == want.toSet,
      s"mergeGeneration: corpus must have exactly (${want.mkString(", ")})" +
        s" — got (${corpus.columns.mkString(", ")})")
    // ONE archive pass: the annotated funnel frame carries BOTH the
    // verdict fields (every response's status) and the kept-page
    // columns (null text on non-kept rows); the pin makes the WARC
    // parse run once per archive no matter how many consumers read it
    val ldExpr = HtmlExtract.linkDensity(col("__e"))
    val ann = graft.core.Checkpoints.pin(
      annotatedRecords(fetched, payloadCol, maxLinkDensity, minTextBytes)
        .select(col("url"),
          col("warc_rec.status").as("status"),
          lower(col("warc_rec.rec_type")).as("__rt"),
          col("__keep"),
          col("warc_rec.mime").as("mime"),
          // kept rows only: a candidate that FAILS __keep (under-min
          // text, link farm — at real crawl scale often the majority of
          // 200-HTML) must not checkpoint its extracted text; the
          // verdict dim needs only url/status/__rt/__keep, and only
          // kept rows' text is ever read (the `kept` filter below)
          when(col("__keep"), col("charset")).as("charset"),
          when(col("__keep"), col("__e.text")).as("text"),
          col("__e.text_bytes").as("text_bytes"),
          ldExpr.as("link_density"),
          col("__e.n_links").as("n_links"),
          col("warc_rec.last_modified").as("last_modified"),
          col("warc_rec.etag").as("etag")))
    val kept = ann.filter(col("__keep"))
      .select(want.init.map(col) :+ lit(fetchTime).as("last_crawled"): _*)
    val recs = ann
      .select(col("url"), col("status").as("__st"), col("__rt"))
      .filter(col("url").isNotNull && col("__rt") === "response" &&
        col("__st").isNotNull)
    val verdicts = recs
      .withColumn("__v",
        when(col("__st") === 304, lit("touch"))
          .when(col("__st").isin(404, 410), lit("remove"))
          .when(col("__st").between(300, 399), lit("remove"))
          .when(col("__st") === 200, lit("upsert"))
          .otherwise(lit("retain")))
      // one verdict per url: upsert > remove > touch > retain (see the
      // scaladoc) — a successful kept re-fetch in the same generation
      // beats an earlier gone/moved response, never the reverse
      .groupBy(col("url"))
      .agg(max(when(col("__v") === "upsert", 3)
        .when(col("__v") === "remove", 2)
        .when(col("__v") === "touch", 1).otherwise(0)).as("__rank"))
      .withColumn("__v", element_at(
        array(lit("retain"), lit("touch"), lit("remove"), lit("upsert")),
        col("__rank") + 1))
      .select(col("url"), col("__v"))
    // a 200 whose page the funnel DROPPED is a remove, not an upsert:
    // upsert applies only to urls cleanCorpus actually emitted — the
    // demotion happens AFTER precedence, so a dropped 200 beside a kept
    // 200 on the same url stays an upsert (the url IS kept)
    val keptKeys = kept.select(col("url")).distinct()
      .select(col("url"), lit(true).as("__kept"))
    val dim = broadcast(verdicts
      .join(keptKeys, Seq("url"), "left")
      .withColumn("__v", when(col("__v") === "upsert" &&
        col("__kept").isNull, lit("remove")).otherwise(col("__v")))
      .select(col("url"), col("__v")))
    val carried = corpus.toDF(corpus.columns.toIndexedSeq.map(
        _.toLowerCase(java.util.Locale.ROOT)): _*)
      .join(dim, Seq("url"), "left")
      .filter(col("__v").isNull || col("__v") === "retain" ||
        col("__v") === "touch")
      .withColumn("last_crawled", when(col("__v") === "touch",
        lit(fetchTime)).otherwise(col("last_crawled")))
      .drop("__v")
      .select(want.map(col): _*)
    // upserts: the generation's kept pages (replacements AND brand-new);
    // a url fetched twice with two kept pages collapses deterministically
    // to the field-wise-greatest row (struct max — any stable choice
    // works, this one needs no window)
    val upserts = kept
      .groupBy(col("url"))
      .agg(max(struct(want.tail.map(col): _*)).as("__s"))
      .select(col("url") +: want.tail.map(c => col(s"__s.$c")): _*)
      .join(dim.filter(col("__v") === "upsert").select(col("url")),
        Seq("url"))
      .select(want.map(col): _*)
    carried.unionAll(upserts)
  }

  /** Loss accounting for [[cleanCorpus]] — the counted funnel. cleanCorpus
    * is built from loud-NULL kernels, but `explode` turns a NULL into ZERO
    * rows: a corrupt archive, a 404 storm, and an over-tight boilerplate
    * threshold are indistinguishable from "no data" in its output. This
    * operator runs the SAME funnel (same gates, same thresholds, same
    * IEEE link-density division — one kernel,
    * [[graft.expressions.CrawlAuditKernel]], shared semantics by
    * construction) and counts every record's exit stage instead of
    * emitting pages:
    *
    * `records, parse_nulls, non_response, gated_status, gated_mime,
    * charset_fallbacks, dropped_small, dropped_boilerplate, kept`
    *
    * with `records = non_response + gated_status + gated_mime +
    * dropped_small + dropped_boilerplate + kept` per group, and `kept`
    * equal to the number of rows cleanCorpus would emit for the same
    * input and thresholds (spec-pinned). `charset_fallbacks` counts
    * pages that CONTINUED after the windows-1252 fallback — the
    * encoding-rot canary, not a drop.
    *
    * One row per `by` group (the whole corpus when `by` is empty). Scale
    * shape: the payload is parsed once per archive scan-side, the
    * aggregation ships nine longs per group through map-side partial
    * aggregation — the only shuffle is the tiny counter rollup. Null
    * payloads count as `parse_nulls` (a counted loss, never a silent
    * one). Reference parallel: sybil counts skipped blocks
    * (table_query.go:383) and ingest warnings (cmd_ingest.go). */
  def auditCorpus(warcs: DataFrame, payloadCol: String = "payload",
      maxLinkDensity: Double = 0.5, minTextBytes: Long = 50L,
      by: Seq[String] = Nil): DataFrame = {
    require(maxLinkDensity >= 0.0 && maxLinkDensity <= 1.0,
      s"auditCorpus: maxLinkDensity must be in [0,1], got $maxLinkDensity")
    require(minTextBytes >= 1L,
      s"auditCorpus: minTextBytes must be >= 1, got $minTextBytes")
    val audit = call_function("graft_crawl_audit", col(payloadCol),
      lit(maxLinkDensity), lit(minTextBytes))
    val audited = warcs.select(by.map(col) :+ audit.as("__audit"): _*)
    val sums = graft.expressions.CrawlAuditKernel.Fields
      .map(f => sum(col("__audit").getField(f)).as(f))
    if (by.isEmpty) audited.agg(sums.head, sums.tail: _*)
    else audited.groupBy(by.map(col): _*).agg(sums.head, sums.tail: _*)
  }
}

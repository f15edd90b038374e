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

  /** Raw archives → curated page rows. Keeps HTTP 200 HTML responses
    * whose extracted text clears `minTextBytes` and is not link-dominated
    * (`maxLinkDensity`). Output columns: `url` (canonicalized), `status`,
    * `mime`, `charset` (detected), `text`, `text_bytes`, `link_density`,
    * `n_links`, plus the caller's non-payload columns. */
  def cleanCorpus(warcs: DataFrame, payloadCol: String = "payload",
      maxLinkDensity: Double = 0.5, minTextBytes: Long = 50L): DataFrame = {
    require(maxLinkDensity >= 0.0 && maxLinkDensity <= 1.0,
      s"cleanCorpus: maxLinkDensity must be in [0,1], got $maxLinkDensity")
    require(minTextBytes >= 1L,
      s"cleanCorpus: minTextBytes must be >= 1, got $minTextBytes")
    val recs = Multimodal.warcRecords(warcs, payloadCol)
      .drop(payloadCol)
      .filter(col("warc_rec.rec_type") === "response" &&
        col("warc_rec.status") === 200 &&
        col("warc_rec.mime").startsWith("text/html"))
    val page = recs
      .withColumn("charset",
        call_function("graft_charset_guess", col("warc_rec.body")))
      .withColumn("__html",
        call_function("graft_charset_fix", col("warc_rec.body")))
      .withColumn("__e", call_function("graft_html_extract", col("__html")))
    val ld = HtmlExtract.linkDensity(col("__e"))
    page
      .filter(col("__e.text_bytes") >= minTextBytes &&
        ld <= maxLinkDensity)
      .withColumn("url",
        call_function("graft_canon_url", col("warc_rec.uri")))
      .select(col("*"), col("warc_rec.status").as("status"),
        col("warc_rec.mime").as("mime"),
        col("__e.text").as("text"),
        col("__e.text_bytes").as("text_bytes"),
        ld.as("link_density"),
        col("__e.n_links").as("n_links"))
      .drop("warc_rec", "__html", "__e")
  }
}

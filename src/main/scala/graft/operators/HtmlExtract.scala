package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML boilerplate stripping for crawl-derived corpora — the stage that
  * turns raw page markup into the `text` column every downstream operator
  * (dedup, quality, langid, decontamination) consumes. Built on the
  * zero-dependency single-pass kernel
  * ([[graft.expressions.HtmlKernel]], `graft_html_text` /
  * `graft_html_extract`), so extraction is a pure scan-side codegen
  * projection: no UDF, no shuffle, column-pruned and filter-pushed like
  * any other expression. At 100 TB this runs exactly once per payload at
  * the FEATURE-EXTRACTION position (the codec design rule, SCALE.md r12)
  * — extract text + signals in one pass, persist, and every later pass
  * reads the columns.
  *
  * The link-density filter is the classic jusText/boilerplate heuristic:
  * navigation/footer chrome is link-dominated (`anchor_text_bytes /
  * text_bytes` near 1), article text is not.
  */
object HtmlExtract {

  /** Appends one struct column `html` with the kernel's full output
    * (`text, n_tags, text_bytes, n_links, anchor_text_bytes, n_blocks,
    * dropped_bytes, html_bytes`) — one kernel pass for text AND signals. */
  def extract(df: DataFrame, htmlCol: String,
      outCol: String = "html"): DataFrame =
    df.withColumn(outCol, call_function("graft_html_extract", col(htmlCol)))

  /** Anchor-text share of the extracted text: NULL when there is no text
    * (a pure-markup page has no density, not density zero). One IEEE
    * division — bit-exact cross-engine for oracle replay. */
  def linkDensity(extracted: Column): Column = {
    val t = extracted.getField("text_bytes")
    when(t > 0L,
      extracted.getField("anchor_text_bytes").cast("double") /
        t.cast("double"))
  }

  /** Text-to-markup ratio (the other classic signal): extracted text bytes
    * over raw HTML bytes; NULL on empty input. */
  def textRatio(extracted: Column): Column = {
    val h = extracted.getField("html_bytes")
    when(h > 0L,
      extracted.getField("text_bytes").cast("double") / h.cast("double"))
  }

  /** Outlink edges: one row per (page, href) in document order — the
    * crawl-frontier / web-graph building block. hrefs come entity-decoded
    * and URL-whitespace-cleaned from the kernel; compose with
    * `graft_canon_url` for dedup keys and with [[Graph]] for link-graph
    * analytics. A page with no links contributes no rows. */
  def outlinks(df: DataFrame, htmlCol: String,
      outCol: String = "href"): DataFrame =
    df.withColumn(outCol,
      explode(call_function("graft_html_links", col(htmlCol))))

  /** [[outlinks]] with RFC 3986 resolution against the page's own URL —
    * the form a real frontier needs, since most hrefs are relative
    * (`/about`, `../x`, `?page=2`). Emits `outCol` as the ABSOLUTE
    * target (`graft_resolve_url(base, href)`); rows where the base
    * itself is not absolute resolve to NULL (filter or audit upstream).
    * Compose with `graft_canon_url` for dedup keys. Still a pure
    * scan-side projection — one kernel pass for the links, one
    * resolution per edge, no shuffle. */
  def resolvedOutlinks(df: DataFrame, htmlCol: String, baseUrlCol: String,
      outCol: String = "href"): DataFrame =
    outlinks(df, htmlCol, outCol)
      .withColumn(outCol,
        call_function("graft_resolve_url", col(baseUrlCol), col(outCol)))

  /** The curation filter: keep documents whose extracted text is non-trivial
    * and not link-dominated. Boilerplate chrome (nav bars, footers, link
    * farms) fails the density test; empty/script-only pages fail the size
    * test. Keeps rows with `text_bytes >= minTextBytes` AND
    * `link_density <= maxLinkDensity` (a no-link page has density 0). */
  def dropBoilerplate(df: DataFrame, htmlCol: String,
      maxLinkDensity: Double = 0.5, minTextBytes: Long = 1L): DataFrame = {
    require(maxLinkDensity >= 0.0 && maxLinkDensity <= 1.0,
      s"dropBoilerplate: maxLinkDensity must be in [0,1], got $maxLinkDensity")
    require(minTextBytes >= 1L,
      s"dropBoilerplate: minTextBytes must be >= 1, got $minTextBytes")
    val e = call_function("graft_html_extract", col(htmlCol))
    // one kernel pass: materialize the struct once in the filter plan.
    // The temp column is freshened against the caller's schema so a
    // caller column named "__html" is neither overwritten nor dropped.
    var tmp = "__html"
    while (df.columns.contains(tmp)) tmp = "_" + tmp
    df.withColumn(tmp, e)
      .filter(col(s"$tmp.text_bytes") >= minTextBytes &&
        linkDensity(col(tmp)) <= maxLinkDensity)
      .drop(tmp)
  }
}

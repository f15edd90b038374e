package graft

import org.apache.spark.sql.functions._

import graft.expressions.SitemapKernel

/** Sitemap kernel ([[SitemapKernel]], `graft_sitemap_parse`,
  * sitemaps.org protocol 0.9): urlset/sitemapindex walks, entity and
  * CDATA handling, namespace prefixes, gzip payloads, loud-NULL
  * malformations — then loc extraction differential-fuzzed against the
  * JDK's own XML parser. */
class SitemapSpec extends SparkSpec {
  import spark.implicits._

  private def b(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  test("urlset: full fields, defaults, loc-less entries skipped") {
    val xml = """<?xml version="1.0" encoding="UTF-8"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <url>
      |    <loc> http://ex.test/a?x=1&amp;y=2 </loc>
      |    <lastmod>2026-01-15</lastmod>
      |    <changefreq>daily</changefreq>
      |    <priority>0.8</priority>
      |  </url>
      |  <url><loc>http://ex.test/b</loc></url>
      |  <url><lastmod>2026-01-01</lastmod></url>
      |  <url><loc></loc></url>
      |</urlset>""".stripMargin
    val es = SitemapKernel.parse(b(xml))
    assert(es.length === 2) // loc-less + empty-loc entries skipped
    assert(es(0).kind === "url")
    assert(es(0).loc === "http://ex.test/a?x=1&y=2") // entity + trim
    assert(es(0).lastmod === "2026-01-15")
    assert(es(0).changefreq === "daily")
    assert(es(0).priority.doubleValue === 0.8)
    assert(es(1).loc === "http://ex.test/b" && es(1).lastmod === null &&
      es(1).changefreq === null && es(1).priority === null)
  }

  test("sitemapindex, prefixes, CDATA, comments, charrefs, bad priority") {
    val xml = """<sm:sitemapindex xmlns:sm="http://www.sitemaps.org/x">
      |  <!-- a comment with <url> inside -->
      |  <sm:sitemap><sm:loc><![CDATA[http://ex.test/s1.xml?a=1&b=2]]>
      |    </sm:loc><sm:lastmod>2026-02-01T12:00:00Z</sm:lastmod>
      |  </sm:sitemap>
      |  <sm:sitemap><sm:loc>http://ex.test/s&#50;.xml</sm:loc></sm:sitemap>
      |</sm:sitemapindex>""".stripMargin
    val es = SitemapKernel.parse(b(xml))
    assert(es.length === 2)
    assert(es(0).kind === "sitemap")
    // CDATA text is verbatim (no entity decode inside), then trimmed
    assert(es(0).loc === "http://ex.test/s1.xml?a=1&b=2")
    assert(es(0).lastmod === "2026-02-01T12:00:00Z")
    assert(es(1).loc === "http://ex.test/s2.xml") // decimal charref
    // invalid priority -> null, never zero
    val p = SitemapKernel.parse(b(
      "<urlset><url><loc>http://x/</loc><priority>high</priority></url>" +
        "</urlset>"))
    assert(p(0).priority === null)
  }

  test("gzip payloads inflate; malformations are loud NULLs") {
    val xml = "<urlset><url><loc>http://ex.test/gz</loc></url></urlset>"
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b(xml)); g.close()
    val es = SitemapKernel.parse(bos.toByteArray)
    assert(es.length === 1 && es(0).loc === "http://ex.test/gz")
    // no sitemap root at all
    assert(SitemapKernel.parse(b("<html><body>nope</body></html>")) === null)
    assert(SitemapKernel.parse(b("plain text")) === null)
    // unterminated comment / tag
    assert(SitemapKernel.parse(b("<urlset><!-- nope")) === null)
    assert(SitemapKernel.parse(b("<urlset><url><loc")) === null)
    // corrupt gzip
    val corrupt = bos.toByteArray.clone()
    corrupt(corrupt.length / 2) = (corrupt(corrupt.length / 2) ^ 0x55).toByte
    assert(SitemapKernel.parse(corrupt) === null)
  }

  test("fuzz: loc extraction matches the JDK XML parser on 300 docs") {
    val rnd = new scala.util.Random(9)
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    for (trial <- 0 until 300) {
      val nUrls = 1 + rnd.nextInt(6)
      val locs = (0 until nUrls).map(k =>
        s"http://h${rnd.nextInt(5)}.test/p$trial-$k" +
          (if (rnd.nextBoolean()) s"?a=$k&amp;b=${rnd.nextInt(9)}" else ""))
      val xml = new StringBuilder("<?xml version=\"1.0\"?><urlset>")
      locs.foreach { l =>
        xml.append("<url>")
        if (rnd.nextBoolean()) xml.append("<!-- c -->")
        xml.append("<loc>").append(l).append("</loc>")
        if (rnd.nextBoolean())
          xml.append("<lastmod>2026-0").append(1 + rnd.nextInt(9))
            .append("-01</lastmod>")
        xml.append("</url>")
      }
      xml.append("</urlset>")
      val bytes = b(xml.toString)
      val got = SitemapKernel.parse(bytes).map(_.loc).toSeq
      val doc = dbf.newDocumentBuilder()
        .parse(new java.io.ByteArrayInputStream(bytes))
      val nodes = doc.getElementsByTagName("loc")
      val want = (0 until nodes.getLength)
        .map(k => nodes.item(k).getTextContent.trim)
      assert(got === want, s"trial $trial")
    }
  }

  test("operator: sitemapindex recursion over a pre-fetched set") {
    val index = "<sitemapindex>" +
      "<sitemap><loc>HTTP://EX.test:80/child1.xml</loc></sitemap>" +
      "<sitemap><loc>http://ex.test/missing.xml</loc></sitemap>" +
      "</sitemapindex>"
    val child1 = "<urlset>" +
      "<url><loc>http://ex.test/a</loc><priority>0.5</priority></url>" +
      "<url><loc>http://ex.test/b</loc></url></urlset>"
    // a root that is itself a plain urlset: depth-1 urls
    val flat = "<urlset><url><loc>http://ex.test/c</loc></url></urlset>"
    val fetched = Seq(
      ("http://ex.test/root.xml", b(index)),
      ("http://ex.test/child1.xml", b(child1)), // canon key: case+port fold
      ("http://ex.test/flat.xml", b(flat)))
      .toDF("url", "payload")
    val roots = Seq("http://ex.test/root.xml", "http://ex.test/flat.xml")
      .toDF("u")
    val res = graft.operators.Crawl.expandSitemaps(fetched, roots)
    // output contract: canonical `url` first, raw `loc` preserved
    assert(res.columns.toSeq ===
      Seq("url", "loc", "lastmod", "changefreq", "priority", "depth"))
    val out = res.collect().map { r =>
      r.getAs[String]("loc") -> ((r.getAs[String]("url"),
        Option(r.getAs[java.lang.Double]("priority"))
          .map(_.doubleValue).getOrElse(-1.0),
        r.getAs[Int]("depth")))
    }.toMap
    // the flat root's url at depth 1; the index's children at depth 2;
    // the missing child contributes nothing (visible upstream, not here)
    assert(out === Map(
      "http://ex.test/c" -> (("http://ex.test/c", -1.0, 1)),
      "http://ex.test/a" -> (("http://ex.test/a", 0.5, 2)),
      "http://ex.test/b" -> (("http://ex.test/b", -1.0, 2))))
    // column-name validation: positional (payload, url) is rejected, not
    // silently mislabeled
    val swapped = fetched.select(col("payload").as("p"), col("url").as("u"))
    val err = intercept[IllegalArgumentException] {
      graft.operators.Crawl.expandSitemaps(swapped, roots)
    }
    assert(err.getMessage.contains("url, payload"))
  }

  test("SQL surface: sitemap feeds the frontier (explode + canon)") {
    val xml = "<urlset><url><loc>HTTP://EX.test:80/a?x=1&amp;" +
      "utm_source=z</loc><priority>0.9</priority></url>" +
      "<url><loc>http://ex.test/b</loc></url></urlset>"
    val df = Seq((1L, b(xml)), (2L, b("BROKEN")),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("id", "payload")
    df.createOrReplaceTempView("sitemap_fixture")
    val out = spark.sql(
      """SELECT id, graft_canon_url(e.loc) AS key, e.priority AS pri
        |FROM sitemap_fixture
        |LATERAL VIEW explode(graft_sitemap_parse(payload)) t AS e
        |ORDER BY id, key""".stripMargin).collect()
    // broken + null payloads explode to nothing (kernel-loud, row-absent)
    assert(out.length === 2)
    assert(out(0).getString(1) === "http://ex.test/a?x=1")
    assert(out(0).getDouble(2) === 0.9)
    assert(out(1).getString(1) === "http://ex.test/b" && out(1).isNullAt(2))
  }
}

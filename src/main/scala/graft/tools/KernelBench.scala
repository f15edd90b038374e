package graft.tools

import graft.expressions.{FlacPcm, HtmlKernel, JpegRaster, PngRaster}
import org.apache.spark.unsafe.types.UTF8String

/** Single-thread throughput of the zero-dependency codec kernels — the
  * number that decides whether decode can ride the scan at cluster
  * scale (a 1000-executor reader sustains ~100-300 MB/s/core of parquet;
  * a decode kernel near or above that is I/O-shadowed, one far below it
  * is the bottleneck). Fixtures are the same synths the catalog anchors
  * use, at realistic crawl-asset sizes. Prints one line per kernel:
  * payload MB/s and items/s. */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 200

    /** `outUnits` = decoded pixels (rasters) or samples (audio) per item
      * — the scale-honest denominator: synth payloads over-compress, so
      * input MB/s alone would flatter the kernels. */
    def run(tag: String, payload: Array[Byte], decode: Array[Byte] => AnyRef,
        outUnits: Long): Unit = {
      var i = 0
      while (i < math.max(20, reps / 10)) { decode(payload); i += 1 } // warm
      val t0 = System.nanoTime()
      i = 0
      var ok = 0
      while (i < reps) {
        if (decode(payload) != null) ok += 1
        i += 1
      }
      val dt = (System.nanoTime() - t0) / 1e9
      require(ok == reps, s"$tag: $ok/$reps decodes succeeded")
      val mbs = payload.length.toDouble * reps / dt / 1e6
      val mups = outUnits.toDouble * reps / dt / 1e6
      println(f"$tag%-34s ${reps / dt}%8.1f items/s  ${mups}%7.1f Mu/s  " +
        f"${mbs}%7.1f in-MB/s  (${payload.length / 1024} KiB/item)")
    }

    // 512x512 gradient rasters — the web-image working size
    run("png 8-bit RGB (filter cycle)",
      PngRaster.synth(512, 512, 3, 5, 5, 2), PngRaster.toPpm, 512 * 512)
    run("png 8-bit RGB Adam7",
      PngRaster.synth(512, 512, 3, 5, 5, 2, 1, 8), PngRaster.toPpm,
      512 * 512)
    run("png 16-bit gray",
      PngRaster.synth(512, 512, 3, 5, 5, 0, 0, 16), PngRaster.toPpm,
      512 * 512)
    run("jpeg baseline RGB (block-const)",
      JpegRaster.synth(512, 512, 3, 5, 2), JpegRaster.toPpm, 512 * 512)
    run("jpeg progressive RGB",
      JpegRaster.synth(512, 512, 3, 5, 6), JpegRaster.toPpm, 512 * 512)
    // ~8 s of 16-bit mono audio per item (64k samples)
    run("flac mono fixed+rice (64k smp)",
      FlacPcm.synth(65536, 8000, 251, 13, 1),
      (b: Array[Byte]) => FlacPcm.decode(b), 65536)
    run("flac stereo mid/side (64k smp)",
      FlacPcm.synth(65536, 8000, 251, 13, 7),
      (b: Array[Byte]) => FlacPcm.decode(b), 131072)
    run("flac mono verbatim (64k smp)",
      FlacPcm.synth(65536, 8000, 251, 13, 0),
      (b: Array[Byte]) => FlacPcm.decode(b), 65536)

    // ~100 KiB page at crawl-typical tag density (~60% markup), with
    // entities, links, and head script/style — the q213/q214 shape
    val page = {
      val sb = new StringBuilder("<!DOCTYPE html><html><head><title>t" +
        "</title><style>body{margin:0}</style><script>var x=1;</script>" +
        "</head><body>")
      var k = 0
      while (sb.length < 100 * 1024) {
        sb.append("<div class=\"row\"><h2>Section ").append(k)
          .append("</h2><p>lorem ipsum dolor sit amet consectetur " +
            "adipiscing elit sed do eiusmod tempor &amp; incididunt ut " +
            "labore</p><a href=\"/item?id=").append(k)
          .append("&amp;ref=nav\">more</a></div>")
        k += 1
      }
      sb.append("</body></html>").toString
    }
    val pageU = UTF8String.fromString(page)
    run("html extract (100 KiB page)", pageU.getBytes,
      (_: Array[Byte]) => HtmlKernel.extract(pageU),
      HtmlKernel.extract(pageU).text.length) // out units = text bytes

    // ~2 MiB WARC of response records carrying the page above, raw and
    // as the customary per-record-gzip-member warc.gz
    val warcRaw = {
      val sb = new StringBuilder
      while (sb.length < (2 << 20)) {
        sb.append("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: " +
          "<http://ex.test/p>\r\nContent-Length: ")
        val block = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + page
        sb.append(block.length).append("\r\n\r\n").append(block)
          .append("\r\n\r\n")
      }
      sb.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    }
    val nRecs = graft.expressions.WarcKernel.parse(warcRaw)._1.length.toLong
    run("warc parse (2 MiB, raw)", warcRaw,
      (x: Array[Byte]) => graft.expressions.WarcKernel.parse(x), nRecs)
    val warcGz = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(warcRaw); g.close()
      bos.toByteArray
    }
    run("warc parse (gzip member)", warcGz,
      (x: Array[Byte]) => graft.expressions.WarcKernel.parse(x), nRecs)

    // ~1 MiB sitemap (10k urls with lastmod/priority) — the frontier
    // feed; out units = entries
    val sitemapXml = {
      val sb = new StringBuilder("<?xml version=\"1.0\"?><urlset>")
      var k = 0
      while (k < 10000) {
        sb.append("<url><loc>http://ex").append(k % 7)
          .append(".test/page/").append(k)
          .append("?a=1&amp;b=2</loc><lastmod>2026-01-15</lastmod>" +
            "<priority>0.").append(k % 10).append("</priority></url>")
        k += 1
      }
      sb.append("</urlset>").toString
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    }
    run("sitemap parse (10k urls)", sitemapXml,
      (x: Array[Byte]) => graft.expressions.SitemapKernel.parse(x), 10000)

    // RFC 3986 resolution — the per-edge cost of the frontier hop.
    // Batched 1000 resolutions per item (the harness's rep counts are
    // sized for MB-scale kernels; a lone microsecond call never JITs);
    // out units = resolutions, so Mu/s reads directly as resolutions/s
    val resolveBase = "http://host.test/a/b/c/page.html"
    val resolveRefs = Array("../up/../x/y.html?q=1", "img/p.png",
      "/abs/q", "?page=2", "//cdn.test/lib.js")
    run("url resolve (x1000 mixed refs)",
      resolveRefs.mkString("\n").getBytes(
        java.nio.charset.StandardCharsets.US_ASCII),
      (_: Array[Byte]) => {
        var k = 0
        var last: String = ""
        while (k < 1000) {
          last = graft.expressions.UrlResolve.resolve(resolveBase,
            resolveRefs(k % resolveRefs.length))
          k += 1
        }
        last
      }, 1000)

    // the loss-accounting funnel over the same 2 MiB archive: parse +
    // per-record gates + charset + HTML extraction on every kept page —
    // the audit must cost ~what cleanCorpus itself costs (it IS the
    // same chain, counting instead of emitting)
    run("crawl audit (2 MiB archive)", warcRaw,
      (x: Array[Byte]) =>
        graft.expressions.CrawlAuditKernel.audit(x, 0.5, 50L),
      nRecs)

    // CDXJ index walk: a CommonCrawl index is ~200 GB/crawl of exactly
    // these lines — the "query the index, not the archives" pass is
    // priced per line, and the fold to a SURT join key per URL. Batched
    // 1000 per item like the url-resolve row; in-MB/s reads as index
    // scan bandwidth because the payload IS the concatenated lines.
    val cdxLines = (0 until 1000).map(i =>
      s"org,ex$i)/p$i?a=1&b=2 20260101000000 " +
        s"""{"url": "http://ex$i.org/p$i?a=\\"1\\"", "mime": """ +
        s""""text/html", "status": "200", "digest": "sha1:$i", """ +
        s""""length": "${1000 + i}", "offset": "${i * 2000}", """ +
        s""""filename": "crawl/w${i % 64}.warc.gz"}""").toArray
    run("cdxj parse (x1000 lines)",
      cdxLines.mkString("\n").getBytes(
        java.nio.charset.StandardCharsets.US_ASCII),
      (_: Array[Byte]) => {
        var k = 0
        var kept = 0
        while (k < cdxLines.length) {
          if (graft.expressions.CdxKernel.parse(cdxLines(k)) != null)
            kept += 1
          k += 1
        }
        require(kept == cdxLines.length)
        java.lang.Integer.valueOf(kept)
      }, 1000)
    val surtUrls = (0 until 1000).map(i =>
      s"HTTP://WWW.Ex$i.ORG:80/P$i?b=2&a=1#f").toArray
    run("surt fold (x1000 urls)",
      surtUrls.mkString("\n").getBytes(
        java.nio.charset.StandardCharsets.US_ASCII),
      (_: Array[Byte]) => {
        var k = 0
        var last: String = ""
        while (k < surtUrls.length) {
          last = graft.expressions.CdxKernel.surt(surtUrls(k))
          k += 1
        }
        last
      }, 1000)
  }
}

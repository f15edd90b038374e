package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.expressions.WarcKernel
import graft.operators.Multimodal

/** WARC container kernel ([[WarcKernel]], `graft_warc_parse`): record
  * walk, HTTP split, gzip members, and the loud-NULL malformation +
  * DoS-cap rules — every documented branch pinned by hand-built bytes. */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def b(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  private def str(a: Array[Byte]): String =
    new String(a, java.nio.charset.StandardCharsets.UTF_8)

  private def rec(warcType: String, block: String,
      extra: String = ""): String =
    s"WARC/1.0\r\nWARC-Type: $warcType\r\n$extra" +
      s"Content-Length: ${b(block).length}\r\n\r\n$block\r\n\r\n"

  private val httpBlock =
    "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n" +
      "<p>hello</p>"

  test("two-record walk: warcinfo block verbatim, response HTTP-split") {
    val warc = rec("warcinfo", "software: graft\r\n",
      "Content-Type: application/warc-fields\r\n") +
      rec("response", httpBlock,
        "WARC-Target-URI: <http://ex.test/p>\r\n")
    val (rs, buf) = WarcKernel.parse(b(warc))
    assert(rs.length === 2)
    assert(str(rs(0).recType) === "warcinfo" && rs(0).status === null)
    assert(str(rs(0).mime) === "application/warc-fields")
    assert(str(java.util.Arrays.copyOfRange(buf, rs(0).bodyOff,
      rs(0).bodyOff + rs(0).bodyLen)) === "software: graft\r\n")
    assert(str(rs(1).recType) === "response")
    assert(str(rs(1).uri) === "http://ex.test/p") // <...> stripped
    assert(rs(1).status.intValue === 200)
    assert(str(rs(1).mime) === "text/html; charset=utf-8") // HTTP wins
    assert(str(java.util.Arrays.copyOfRange(buf, rs(1).bodyOff,
      rs(1).bodyOff + rs(1).bodyLen)) === "<p>hello</p>")
  }

  test("WARC-Date + record extents: every [offset, offset+length) " +
      "slice re-parses standalone to exactly its record") {
    val warc =
      rec("response", httpBlock, "WARC-Target-URI: <http://ex.test/a>\r\n" +
        "WARC-Date: 2026-01-02T03:04:05Z\r\n") +
      rec("warcinfo", "software: graft\r\n") +
      rec("response", httpBlock, "WARC-Target-URI: <http://ex.test/b>\r\n" +
        "WARC-Date: 2026-02-02T03:04:06Z\r\n")
    val bytes = b(warc)
    val (rs, _) = WarcKernel.parse(bytes)
    assert(rs.length === 3)
    assert(str(rs(0).date) === "2026-01-02T03:04:05Z")
    assert(rs(1).date === null) // no WARC-Date header: loud null
    assert(str(rs(2).date) === "2026-02-02T03:04:06Z")
    // extents tile the stream exactly: record k ends where k+1 starts
    assert(rs(0).recOff === 0)
    assert(rs(1).recOff === rs(0).recOff + rs(0).recLen)
    assert(rs(2).recOff === rs(1).recOff + rs(1).recLen)
    assert(rs(2).recOff + rs(2).recLen === bytes.length)
    // the buildIndex -> fetchRecords contract: each slice re-parses to
    // EXACTLY its record, byte-identical fields
    for (r <- rs) {
      val slice = java.util.Arrays.copyOfRange(bytes, r.recOff,
        r.recOff + r.recLen)
      val (rs2, buf2) = WarcKernel.parse(slice)
      assert(rs2.length === 1)
      assert(str(rs2(0).recType) === str(r.recType))
      assert((rs2(0).date == null) === (r.date == null))
      if (r.date != null) assert(str(rs2(0).date) === str(r.date))
      assert(rs2(0).bodyLen === r.bodyLen)
    }
  }

  test("buildIndex: archives index themselves — surt keys, ts digits, " +
      "sha-256 digests, re-sliceable extents") {
    val warc =
      rec("response", httpBlock,
        "WARC-Target-URI: <HTTP://WWW.EX.test/A?b=2&a=1>\r\n" +
          "WARC-Date: 2026-01-02T03:04:05Z\r\n") +
      rec("warcinfo", "software: graft\r\n") + // not indexed
      rec("response", "HTTP/1.1 404 NF\r\n\r\ngone",
        "WARC-Target-URI: <http://ex.test/gone>\r\n" +
          "WARC-Date: 2026-01-02T03:04:06Z\r\n") +
      rec("response", httpBlock, // no date: null ts, loud
        "WARC-Target-URI: <http://ex.test/nodate>\r\n")
    val archives = Seq(("w0", b(warc))).toDF("filename", "payload")
    val idx = graft.operators.Crawl.buildIndex(archives)
      .orderBy(col("offset")).collect()
    assert(idx.length === 3) // responses only
    val a = idx(0)
    // SURT folds the shouted host + unsorted query; ts = date digits
    assert(a.getAs[String]("urlkey") === "test,ex)/a?a=1&b=2")
    assert(a.getAs[String]("ts") === "20260102030405")
    assert(a.getAs[String]("url") === "HTTP://WWW.EX.test/A?b=2&a=1")
    assert(a.getAs[Int]("status") === 200)
    assert(a.getAs[String]("mime") === "text/html; charset=utf-8")
    assert(a.getAs[String]("digest") ===
      org.apache.commons.codec.digest.DigestUtils.sha256Hex(
        "<p>hello</p>"))
    assert(idx(1).getAs[Int]("status") === 404)
    assert(idx(2).getAs[String]("ts") === null) // dateless: loud null
    // the index replays through fetchRecords: bodies match the digests
    val out = graft.operators.Crawl.fetchRecords(
        idx.toSeq.map(r => (r.getAs[String]("filename"),
          r.getAs[Long]("offset"), r.getAs[Long]("length")))
          .toDF("filename", "offset", "length"),
        archives)
      .select(col("offset"),
        sha2(col("warc_rec.body"), 256).as("got"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for (r <- idx)
      assert(out(r.getAs[Long]("offset")) === r.getAs[String]("digest"))
  }

  test("header details: case-insensitive names, obs-fold, bare-LF lines") {
    val warc = "WARC/1.0\nwarc-type: response\nWARC-TARGET-URI: http://u\n" +
      "content-length: 3\n\nxyz\n\n"
    val (rs, _) = WarcKernel.parse(b(warc))
    assert(rs.length === 1 && str(rs(0).uri) === "http://u")
    // non-HTTP response block: body is the whole block, status null
    assert(rs(0).status === null && rs(0).bodyLen === 3)
    // obs-fold: continuation line joins the previous value with one space
    val folded = "WARC/1.0\r\nWARC-Target-URI: http://a\r\n " +
      "b/c\r\nWARC-Type: metadata\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    val (fs, _) = WarcKernel.parse(b(folded))
    assert(str(fs(0).uri) === "http://a b/c")
  }

  test("HTTP split edges: no terminator -> empty body; odd status lines") {
    val noTerm = rec("response", "HTTP/1.1 404 NF\r\nX: 1\r\n")
    val (rs, _) = WarcKernel.parse(b(noTerm))
    assert(rs(0).status.intValue === 404 && rs(0).bodyLen === 0)
    // status is exactly 3 digits; garbage after the space -> null
    val bad = rec("response", "HTTP/1.1 abc\r\n\r\nx")
    val (bs, _) = WarcKernel.parse(b(bad))
    assert(bs(0).status === null && bs(0).bodyLen === 1)
    // a 4-digit "status" is rejected, not truncated to its first 3 digits
    val four = rec("response", "HTTP/1.1 9999 X\r\n\r\nx")
    val (f4, _) = WarcKernel.parse(b(four))
    assert(f4(0).status === null)
    // 1–2 digit codes (non-standard but unambiguous) still parse
    val two = rec("response", "HTTP/1.1 99 X\r\n\r\nx")
    val (t2, _) = WarcKernel.parse(b(two))
    assert(t2(0).status.intValue === 99)
  }

  test("malformed archives are LOUD nulls, never half-parses") {
    assert(WarcKernel.parse(b("GARBAGE")) === null)
    assert(WarcKernel.parse(
      b("WARC/1.0\r\nWARC-Type: metadata\r\n\r\n")) === null) // no length
    assert(WarcKernel.parse(
      b("WARC/1.0\r\nContent-Length: 99\r\n\r\nshort")) === null) // truncated
    assert(WarcKernel.parse(
      b("WARC/1.0\r\nContent-Length: 12x\r\n\r\n")) === null) // bad digits
    // a valid record FOLLOWED by garbage is also null (no silent prefix)
    assert(WarcKernel.parse(b(rec("metadata", "ok") + "JUNK")) === null)
    // empty input: zero records, not null
    val (empty, _) = WarcKernel.parse(Array.emptyByteArray)
    assert(empty.length === 0)
  }

  test("gzip: multi-member warc.gz reads end-to-end; bomb hits the cap") {
    def gz(parts: Seq[Array[Byte]]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      parts.foreach { p =>
        val g = new java.util.zip.GZIPOutputStream(bos)
        g.write(p); g.finish(); g.close()
      }
      bos.toByteArray
    }
    val m1 = b(rec("warcinfo", "software: graft\r\n"))
    val m2 = b(rec("response", httpBlock))
    val (rs, _) = WarcKernel.parse(gz(Seq(m1, m2)))
    assert(rs.length === 2 && rs(1).status.intValue === 200)
    // DoS guard: ~300 MiB of zeros compresses to ~300 KiB; the kernel
    // must refuse at MaxInflated, not materialize it
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    val chunk = new Array[Byte](1 << 20)
    for (_ <- 0 until 300) g.write(chunk)
    g.close()
    assert(WarcKernel.parse(bos.toByteArray) === null)
    // corrupt gzip: must not throw; a mid-stream flip surfaces as a loud
    // null (deflate/CRC error), never a half-parse or an exception
    val corrupt = gz(Seq(m1)).clone()
    corrupt(corrupt.length / 2) = (corrupt(corrupt.length / 2) ^ 0x55).toByte
    assert(WarcKernel.parse(corrupt) === null)
  }

  test("buildIndex + collapseRevisits: revisit records index with " +
      "warc/revisit mime and their payload digest — the full CDX loop") {
    val body = "<p>original body kept stable</p>"
    val digest = org.apache.commons.codec.digest.DigestUtils
      .sha256Hex(body)
    val warc =
      rec("response",
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body,
        "WARC-Target-URI: <http://ex.test/r>\r\n" +
          "WARC-Date: 2026-01-01T00:00:00Z\r\n") +
      // the ISO 28500 §6.7.2 identical-payload-digest revisit: no body,
      // the original's digest in WARC-Payload-Digest (engine label)
      rec("revisit", "",
        "WARC-Target-URI: <http://ex.test/r>\r\n" +
          "WARC-Date: 2026-02-01T00:00:00Z\r\n" +
          s"WARC-Payload-Digest: sha-256:$digest\r\n" +
          "WARC-Profile: http://netpreserve.org/warc/1.0/revisit/" +
          "identical-payload-digest\r\n") +
      // a FOREIGN-labelled digest stays verbatim: loud, never collapses
      rec("revisit", "",
        "WARC-Target-URI: <http://ex.test/other>\r\n" +
          "WARC-Date: 2026-02-02T00:00:00Z\r\n" +
          "WARC-Payload-Digest: sha1:AAABBB\r\n")
    val archives = Seq(("w0", b(warc))).toDF("filename", "payload")
    val idx = graft.operators.Crawl.buildIndex(archives)
      .orderBy(col("ts")).collect()
    assert(idx.length === 3)
    assert(idx(0).getAs[String]("mime") === "text/html" &&
      idx(0).getAs[String]("digest") === digest)
    assert(idx(1).getAs[String]("mime") === "warc/revisit" &&
      idx(1).getAs[String]("digest") === digest) // label stripped
    assert(idx(2).getAs[String]("digest") === "sha1:AAABBB") // verbatim
    // the loop: collapseRevisits folds the revisit onto its original
    val collapsed = graft.operators.Crawl
      .collapseRevisits(graft.operators.Crawl.buildIndex(archives))
      .orderBy(col("urlkey")).collect()
    assert(collapsed.length === 2)
    val other = collapsed(0) // test,ex)/other — the orphan group
    assert(other.getAs[Long]("n_revisits") === 1L &&
      other.isNullAt(other.fieldIndex("orig_ts")))
    val r = collapsed(1) // test,ex)/r
    assert(r.getAs[Long]("n_captures") === 2L &&
      r.getAs[Long]("n_revisits") === 1L &&
      r.getAs[String]("orig_ts") === "20260101000000" &&
      r.getAs[String]("last_ts") === "20260201000000")
    // fetch ONCE, from the original's location; the slice column feeds
    // curation directly (the sliceCol contract)
    val fetched = graft.operators.Crawl.fetchRecords(
        collapsed.toSeq.filter(_.getAs[String]("filename") != null)
          .map(c => (c.getAs[String]("filename"), c.getAs[Long]("offset"),
            c.getAs[Long]("length")))
          .toDF("filename", "offset", "length"),
        archives, sliceCol = "rec_bytes")
    val rows = fetched.collect()
    assert(rows.length === 1)
    val curated = graft.operators.Crawl.cleanCorpus(
      fetched.select(col("rec_bytes")), payloadCol = "rec_bytes",
      minTextBytes = 10L).collect()
    assert(curated.length === 1 &&
      curated(0).getAs[String]("text") === "original body kept stable")
  }

  test("member extents: warc.gz records carry their gzip-member " +
      "storage coordinates; every member slice re-parses standalone") {
    def gz1(p: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(p); g.close()
      bos.toByteArray
    }
    val parts = (0 until 5).map(i => b(rec("response",
      "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
        s"<p>page $i body " + "z" * (5 + 3 * i) + "</p>",
      s"WARC-Target-URI: <http://ex.test/m$i>\r\n")))
    val members = parts.map(gz1)
    val stored = members.reduce(_ ++ _)
    val (rs, _) = WarcKernel.parse(stored)
    assert(rs.length === 5)
    // member extents TILE the compressed stream and match the members
    // we actually wrote
    var off = 0L
    for ((r, m) <- rs.zip(members)) {
      assert(r.memOff === off, s"member offset at $off")
      assert(r.memLen === m.length.toLong)
      off += m.length
    }
    assert(off === stored.length.toLong)
    // the round-trip contract: each COMPRESSED member slice is a
    // complete gzip stream that re-parses to exactly its record
    for ((r, i) <- rs.zipWithIndex) {
      val slice = java.util.Arrays.copyOfRange(stored, r.memOff.toInt,
        (r.memOff + r.memLen).toInt)
      val parsed = WarcKernel.parse(slice)
      assert(parsed !== null)
      val (rs2, buf2) = parsed
      assert(rs2.length === 1)
      assert(str(rs2(0).uri) === s"http://ex.test/m$i")
      assert(new String(buf2, rs2(0).bodyOff, rs2(0).bodyLen,
        java.nio.charset.StandardCharsets.UTF_8) ===
        new String(parts(i)).substring(
          new String(parts(i)).indexOf("<p>")).stripSuffix("\r\n\r\n"))
    }
    // PLAIN input: storage coords == record-stream coords
    val plain = parts.reduce(_ ++ _)
    val (prs, _) = WarcKernel.parse(plain)
    assert(prs.forall(r => r.memOff === r.recOff.toLong &&
      r.memLen === r.recLen.toLong))
    // MISALIGNED packing — one member holding all 5 records: null
    // coords, LOUDLY (no range GET can slice that per record)
    val (srs, _) = WarcKernel.parse(gz1(plain))
    assert(srs.length === 5)
    assert(srs.forall(r => r.memOff === -1L && r.memLen === -1L))
    // a record split across TWO members (legal, unusual): the member
    // RUN maps — offsets cover both members, and the slice re-parses
    val half = parts(0).length / 2
    val twoM = gz1(parts(0).take(half)) ++ gz1(parts(0).drop(half))
    val (trs, _) = WarcKernel.parse(twoM)
    assert(trs.length === 1 && trs(0).memOff === 0L &&
      trs(0).memLen === twoM.length.toLong)
    val (trs2, _) = WarcKernel.parse(twoM)
    assert(str(trs2(0).uri) === "http://ex.test/m0")
  }

  test("buildIndex on warc.gz: member-coordinate offsets round-trip " +
      "through fetchRecords identically to the plain path") {
    val parts = (0 until 6).map(i => b(rec("response",
      "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
        s"<p>gz page $i</p>",
      s"WARC-Target-URI: <http://ex.test/g$i>\r\n" +
        s"WARC-Date: 2026-01-01T00:00:0${i % 10}Z\r\n")))
    def gz1(p: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(p); g.close()
      bos.toByteArray
    }
    val plainArchives = Seq(("w0", parts.reduce(_ ++ _)))
      .toDF("filename", "payload")
    val gzArchives = Seq(("w0.gz", parts.map(gz1).reduce(_ ++ _)))
      .toDF("filename", "payload")
    def roundtrip(archives: org.apache.spark.sql.DataFrame)
        : Seq[(String, String, String)] = {
      val idx = graft.operators.Crawl.buildIndex(archives)
        .filter(col("ts").substr(14, 1).isin("1", "3", "5"))
      graft.operators.Crawl.fetchRecords(
          idx.select(col("filename"), col("offset"), col("length")),
          archives)
        .join(idx, Seq("filename", "offset", "length"))
        .select(col("urlkey"), col("warc_rec.uri").as("url"),
          col("warc_rec.body").cast("string").as("body"),
          (sha2(col("warc_rec.body"), 256) === col("digest"))
            .as("digest_ok"))
        .orderBy(col("urlkey")).collect().toSeq
        .map { r =>
          assert(r.getAs[Boolean]("digest_ok"))
          (r.getAs[String]("urlkey"), r.getAs[String]("url"),
            r.getAs[String]("body"))
        }
    }
    val plainOut = roundtrip(plainArchives)
    val gzOut = roundtrip(gzArchives)
    assert(plainOut.length === 3) // odd capture seconds: g1, g3, g5
    assert(gzOut === plainOut)
    // gz index offsets address the COMPRESSED stream (≠ inflated)
    val gzIdx = graft.operators.Crawl.buildIndex(gzArchives)
      .orderBy(col("offset")).collect()
    val gzLens = parts.map(gz1(_).length.toLong)
    assert(gzIdx.map(_.getAs[Long]("offset")).toSeq ===
      gzLens.scanLeft(0L)(_ + _).init)
  }

  test("SQL surface + operator: warcRecords explodes; chain into html") {
    val warc = rec("warcinfo", "software: graft\r\n") +
      rec("response", httpBlock, "WARC-Target-URI: http://ex.test/p\r\n")
    val df = Seq((1L, b(warc)), (2L, b("BROKEN")),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("id", "payload")
    val out = Multimodal.warcRecords(df)
      .select(col("id"), col("warc_rec.rec_type").as("t"),
        col("warc_rec.status").as("st"),
        call_function("graft_html_text",
          col("warc_rec.body").cast("string")).as("txt"))
      .orderBy(col("id"), col("t")).collect()
    // broken + null payloads explode to NOTHING (loud at the kernel,
    // row-absent at the operator)
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 1L))
    assert(out(0).getString(1) === "response" && out(0).getInt(2) === 200)
    assert(out(0).getString(3) === "hello")
    assert(out(1).getString(1) === "warcinfo" && out(1).isNullAt(2))
    assert(out(1).getString(3) === "software: graft")
  }

  test("Location header + redirectEdges: relative targets resolve") {
    def str2(a: Array[Byte]) = if (a == null) null
      else new String(a, java.nio.charset.StandardCharsets.UTF_8)
    val moved = "HTTP/1.1 301 Moved\r\nLocation: ../new/page\r\n" +
      "Content-Type: text/html\r\n\r\n<p>moved</p>"
    val absMoved = "HTTP/1.1 308 PR\r\nlocation:  https://NEW.test:443/x \r\n" +
      "\r\n"
    val warc =
      rec("response", moved, "WARC-Target-URI: <http://ex.test/old/a/b>\r\n") +
      rec("response", absMoved, "WARC-Target-URI: http://ex.test/y\r\n") +
      rec("response", httpBlock, "WARC-Target-URI: http://ex.test/ok\r\n")
    val (rs, _) = WarcKernel.parse(b(warc))
    // kernel: Location captured case-insensitively, value trimmed;
    // absent on non-redirects
    assert(str2(rs(0).location) === "../new/page")
    assert(str2(rs(1).location) === "https://NEW.test:443/x")
    assert(rs(2).location === null)
    // operator: 3xx rows only, RFC 3986 resolution + canon on both ends
    val df = Seq((1L, b(warc))).toDF("id", "payload")
    val out = graft.operators.Crawl.redirectEdges(df)
      .select("id", "from_url", "to_url", "status")
      .orderBy("status").collect()
    assert(out.length === 2)
    assert(out(0).getString(1) === "http://ex.test/old/a/b")
    assert(out(0).getString(2) === "http://ex.test/old/new/page")
    assert(out(0).getInt(3) === 301)
    // absolute Location passes through; canon folds case + default port
    assert(out(1).getString(2) === "https://new.test/x")
    assert(out(1).getInt(3) === 308)
  }

  test("freshness validators: Last-Modified/ETag surface verbatim") {
    def str2(a: Array[Byte]) = if (a == null) null
      else new String(a, java.nio.charset.StandardCharsets.UTF_8)
    val fresh = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      "last-modified:  Tue, 03 Mar 2026 10:00:00 GMT \r\n" +
      "ETAG: W/\"abc123\"\r\n\r\n<p>x</p>"
    val bare = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>y</p>"
    val warc =
      rec("response", fresh, "WARC-Target-URI: http://ex.test/a\r\n") +
      rec("response", bare, "WARC-Target-URI: http://ex.test/b\r\n") +
      rec("warcinfo", "software: graft\r\n")
    val (rs, _) = WarcKernel.parse(b(warc))
    // names ASCII case-insensitive, values trimmed, kept VERBATIM —
    // IMF-fixdate parsing belongs downstream (to_timestamp), and an
    // ETag is an opaque token (RFC 9110 §8.8.3): W/ prefix + quotes stay
    assert(str2(rs(0).lastModified) === "Tue, 03 Mar 2026 10:00:00 GMT")
    assert(str2(rs(0).etag) === "W/\"abc123\"")
    assert(rs(1).lastModified === null && rs(1).etag === null)
    // non-response records never carry HTTP fields
    assert(rs(2).lastModified === null && rs(2).etag === null)
    // SQL surface: the struct fields are addressable by name
    val row = Seq((1L, b(warc))).toDF("id", "payload")
      .select(explode(call_function("graft_warc_parse",
        col("payload"))).as("r"))
      .select(col("r.uri"), col("r.last_modified"), col("r.etag"))
      .filter(col("r.uri") === "http://ex.test/a").head()
    assert(row.getString(1) === "Tue, 03 Mar 2026 10:00:00 GMT")
    assert(row.getString(2) === "W/\"abc123\"")
  }

  test("the composition loop closes: cleanCorpus output IS the corpus " +
      "frame recrawlScheduleHttp consumes") {
    val fresh = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      "Last-Modified: Sat, 10 Jan 2026 00:00:00 GMT\r\n" +
      "ETag: \"v1\"\r\n\r\n" +
      "<html><body><p>article body long enough to keep</p></body></html>"
    val bare = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<html><body><p>another article body to keep</p></body></html>"
    val warc =
      rec("response", fresh, "WARC-Target-URI: http://ex.test/a\r\n") +
      rec("response", bare, "WARC-Target-URI: http://ex.test/b\r\n")
    val corpus = graft.operators.Crawl.cleanCorpus(
        Seq((1L, b(warc))).toDF("id", "payload"), minTextBytes = 10)
      .withColumn("last_crawled", lit("2026-01-20T00:00:00"))
      .select(col("url"), col("last_crawled"), col("last_modified"),
        col("etag"))
    val entries = Seq(
      ("http://ex.test/a", "2026-01-15"), // newer than the Jan-10 copy
      ("http://ex.test/b", "2026-01-15")) // but older than the Jan-20 crawl
      .toDF("url", "lastmod")
    val out = graft.operators.Crawl.recrawlScheduleHttp(entries, corpus)
      .select("url", "action", "validator").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    // /a: the server stamped the stored copy Jan 10; the sitemap claims
    // Jan 15 -> refresh, revalidating with the ETag the CRAWL captured
    assert(out("http://ex.test/a") === (("refresh", "etag")))
    // /b: no validators; crawl time (Jan 20) governs -> skip
    assert(out("http://ex.test/b") === (("skip", "none")))
  }

  test("recrawlScheduleHttp: server Last-Modified beats crawl time") {
    val entries = Seq(
      ("http://ex.test/conflict", "2026-02-01"), // sitemap claims Feb
      ("http://ex.test/stale", "2026-02-01"),
      ("http://ex.test/fresh-enough", "2026-01-01"),
      ("http://ex.test/brandnew", "2026-02-01"),
      ("http://ex.test/nosig", null))
      .toDF("url", "lastmod")
    val corpus = Seq(
      // crawled Jan, but the SERVER stamped the copy March: the stored
      // content is already newer than the sitemap claim -> skip
      ("http://ex.test/conflict", "2026-01-01T00:00:00",
        "Tue, 03 Mar 2026 10:00:00 GMT", "W/\"v3\""),
      // crawled Jan, server stamped Jan 10th, sitemap claims Feb -> refresh
      ("http://ex.test/stale", "2026-01-01T00:00:00",
        "Sat, 10 Jan 2026 00:00:00 GMT", null),
      // no validators at all: crawl time governs; crawled after lastmod
      ("http://ex.test/fresh-enough", "2026-01-15T00:00:00", null, null),
      ("http://ex.test/nosig", "2026-01-01T00:00:00", null, "\"z\""))
      .toDF("url", "last_crawled", "last_modified", "etag")
    val out = graft.operators.Crawl.recrawlScheduleHttp(entries, corpus)
      .select("url", "action", "validator").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(out("http://ex.test/conflict") === (("skip", "etag")))
    assert(out("http://ex.test/stale") === (("refresh", "last_modified")))
    assert(out("http://ex.test/fresh-enough") === (("skip", "none")))
    assert(out("http://ex.test/brandnew") === (("new", "none")))
    // null lastmod: absence of evidence is not staleness — but the
    // validator still says HOW to revalidate when the fetcher decides to
    assert(out("http://ex.test/nosig") === (("skip", "etag")))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.expressions.CdxKernel

/** CDXJ index kernel ([[CdxKernel]], `graft_cdxj_parse` / `graft_surt`)
  * + the coalesced range-fetch planner
  * ([[graft.operators.Crawl.fetchPlan]]): line grammar, flat-JSON
  * escapes, loud-NULL malformations, SURT semantics pinned against the
  * documented rules, a 400-line differential fuzz whose JSON blocks are
  * built by an independent escaper, and the planner's gap/overlap
  * arithmetic. */
class CdxSpec extends SparkSpec {
  import spark.implicits._

  private val line = """org,example)/p 20260101000000 {"url": """ +
    """"http://example.org/p", "mime": "text/html", "status": "200", """ +
    """"digest": "sha1:ABC", "length": "1234", "offset": "5678", """ +
    """"filename": "crawl/a.warc.gz", "languages": "eng"}"""

  test("cdxj line: every field lands typed; unknown keys skip") {
    val r = CdxKernel.parse(line)
    assert(r.urlkey === "org,example)/p" && r.ts === "20260101000000")
    assert(r.url === "http://example.org/p" && r.mime === "text/html")
    assert(r.status.intValue === 200 && r.digest === "sha1:ABC")
    assert(r.length.longValue === 1234L && r.offset.longValue === 5678L)
    assert(r.filename === "crawl/a.warc.gz" && r.languages === "eng")
    // unknown keys, bare numbers, nested values all skip cleanly
    val r2 = CdxKernel.parse("""k 2026 {"status": 301, "extra": """ +
      """{"deep": [1, "x"]}, "url": "u", "redirect": "\/r\n"}""")
    assert(r2.status.intValue === 301 && r2.url === "u")
    assert(r2.mime === null && r2.filename === null)
    // JSON null is an ABSENT field, never the 4-char string "null";
    // true/false skip the same way
    val r3 = CdxKernel.parse(
      """k 2026 {"mime": null, "url": "u", "robotflags": true}""")
    assert(r3 !== null)
    assert(r3.mime === null && r3.url === "u")
  }

  test("cdxj malformations are loud NULLs; bad numerics null the field") {
    for (bad <- Seq(null, "", "nospace", "one two", "k 2026x {}",
        "k 20 {broken", "k 20 {\"a\": \"b\"} trailing",
        "k 20 {\"a\" \"b\"}", "k 20 {\"a\": \"b\",}",
        "k 999999999999999999 {}",
        "k 20 {\"a\": }", // empty bare value is not JSON
        "k 20 {\"a\": naked}")) // nor an unquoted word
      assert(CdxKernel.parse(bad) === null, s"input: $bad")
    // structurally fine, numerically garbage -> field null, row kept;
    // a >999 "status" nulls rather than TRUNCATING to a fabricated
    // in-range code (4294967496.toInt would wrap to 200)
    val r = CdxKernel.parse(
      """k 2026 {"status": "20x", "offset": "-1", "length": """ +
        """"99999999999999999999", "url": "u"}""")
    assert(r !== null)
    assert(r.status === null && r.offset === null)
    assert(r.length === null && r.url === "u")
    val wide = CdxKernel.parse("""k 2026 {"status": "4294967496"}""")
    assert(wide !== null)
    assert(wide.status === null)
    // empty object is a valid (all-null-fields) record
    assert(CdxKernel.parse("k 2026 {}") !== null)
  }

  test("SURT semantics: the documented decision table") {
    val cases = Seq(
      "http://www.Example.ORG/Path?b=2&a=1" -> "org,example)/path?a=1&b=2",
      "https://example.org:443/" -> "org,example)/", // https default drops
      "http://example.org:80/x" -> "org,example)/x", // http default drops
      "http://example.org:080/x" -> "org,example)/x", // numeric fold
      "ftp://example.org:21/x" -> "org,example)/x", // ftp default drops
      // a NON-default port is a distinct origin: RETAINED (pywb keeps it)
      "http://example.org:8080/x" -> "org,example:8080)/x",
      "https://example.org:80/x" -> "org,example:80)/x", // not https' default
      "http://example.org:/x" -> "org,example)/x", // empty port drops
      // bracketed IPv6: literal kept verbatim (no labels to reverse),
      // port rule applied after ']'
      "http://[2001:db8::1]/x" -> "[2001:db8::1])/x",
      "http://[2001:DB8::1]:80/x" -> "[2001:db8::1])/x",
      "http://[2001:db8::1]:8443/x" -> "[2001:db8::1]:8443)/x",
      "http://user:pw@sub.example.org/x" -> "org,example,sub)/x",
      "http://www2.example.org/" -> "org,example)/", // www\d*. strips
      "http://wwwx.example.org/" -> "org,example,wwwx)/", // not www\d*.
      "http://example.org" -> "org,example)/", // empty path folds
      "http://example.org/p#frag" -> "org,example)/p",
      "http://example.org/p?" -> "org,example)/p", // empty query drops
      "http://example.org/p?z=1&&a=2" -> "org,example)/p?a=2&z=1",
      // query with NO path: the authority must not swallow the query
      "http://example.org?a=1" -> "org,example)/?a=1",
      // ...even when the query itself contains a '/'
      "http://example.org?a=/x" -> "org,example)/?a=/x")
    for ((in, want) <- cases)
      assert(CdxKernel.surt(in) === want, s"surt($in)")
    for (bad <- Seq(null, "", "nota url", "http://", "http:///x",
        "http://ex.org:8a/x", "http://[2001:db8::1/x", // unterminated v6
        "http://[]/x", "http://[2001:db8::1]x/x")) // garbage after ']'
      assert(CdxKernel.surt(bad) === null, s"surt($bad)")
    // graft_surt is the EXTERNAL join key; graft_canon_url the internal
    // one — deliberately different (SURT case-folds the path)
    assert(CdxKernel.surt("http://ex.org/CaseY") === "org,ex)/casey")
  }

  test("fuzz: 400 random lines built by an independent JSON escaper " +
      "round-trip every field") {
    val rnd = new scala.util.Random(151)
    def jsonEsc(s: String): String = {
      val b = new StringBuilder("\"")
      s.foreach {
        case '"' => b.append("\\\"")
        case '\\' => b.append("\\\\")
        case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
        case c => b.append(c)
      }
      b.append('"').toString
    }
    def randStr(): String = {
      val pool = "abz09 /:.-_\"\\\t\n€ü"
      (0 until 1 + rnd.nextInt(12)).map(_ =>
        pool(rnd.nextInt(pool.length))).mkString
    }
    for (trial <- 1 to 400) {
      val url = randStr(); val mime = randStr(); val digest = randStr()
      val file = randStr()
      val status = rnd.nextInt(600)
      val off = rnd.nextLong().abs % 1000000000L
      val len = rnd.nextInt(100000).toLong
      val extraKeys = (0 until rnd.nextInt(3)).map(k =>
        s""""x$k": ${jsonEsc(randStr())}""")
      val fields = rnd.shuffle(Seq(
        s""""url": ${jsonEsc(url)}""", s""""mime": ${jsonEsc(mime)}""",
        s""""status": "$status"""", s""""digest": ${jsonEsc(digest)}""",
        s""""length": "$len"""", s""""offset": "$off"""",
        s""""filename": ${jsonEsc(file)}""") ++ extraKeys)
      val l = s"key$trial 20260101 {${fields.mkString(", ")}}"
      val r = CdxKernel.parse(l)
      assert(r !== null, s"trial $trial: $l")
      assert(r.url === url && r.mime === mime && r.digest === digest,
        s"trial $trial")
      assert(r.filename === file && r.status.intValue === status)
      assert(r.length.longValue === len && r.offset.longValue === off)
    }
  }

  test("SURT metamorphic fuzz: key invariant under case, ports, www, " +
      "fragments, query permutation — 500 random URLs") {
    val rnd = new scala.util.Random(97)
    for (trial <- 1 to 500) {
      val labels = (0 until 1 + rnd.nextInt(3)).map(_ =>
        ('a' + rnd.nextInt(26)).toChar.toString +
          ('a' + rnd.nextInt(26)).toChar.toString)
      val host = (labels :+ (if (rnd.nextBoolean()) "org" else "test"))
        .mkString(".")
      val path = "/" + (0 until rnd.nextInt(3)).map(_ =>
        s"p${rnd.nextInt(10)}").mkString("/")
      val params = (0 until rnd.nextInt(4)).map(k =>
        s"k$k=${rnd.nextInt(100)}")
      val q = if (params.isEmpty) "" else "?" + params.mkString("&")
      val base = s"http://$host$path$q"
      val key = CdxKernel.surt(base)
      assert(key !== null, s"trial $trial: $base")
      def mixCase(s: String): String = s.map(c =>
        if (rnd.nextBoolean()) c.toUpper else c)
      val variants = Seq(
        s"http://${mixCase(host)}$path$q", // host case never matters
        s"http://$host:80$path$q", // the scheme's DEFAULT port drops
        s"http://$host:080$path$q", // ...numerically ("080" folds to 80)
        s"http://www.$host$path$q", // one www. label strips
        s"http://www${rnd.nextInt(10)}.$host$path$q", // www\d*. too
        s"http://$host$path$q#frag${rnd.nextInt(10)}", // fragments drop
        s"http://$host$path" + (if (params.isEmpty) "" else "?" +
          rnd.shuffle(params).mkString("&"))) // param order is noise
      for (v <- variants)
        assert(CdxKernel.surt(v) === key, s"trial $trial: $v vs $base")
      // path CASE folds (SURT is lossy by design; the canon key isn't)
      assert(CdxKernel.surt(s"http://$host${mixCase(path)}$q") === key)
      // a NON-default port is a DISTINCT key — retained right before ')'
      val np = 81 + rnd.nextInt(9000)
      val withPort = CdxKernel.surt(s"http://$host:$np$path$q")
      assert(withPort !== key, s"trial $trial: port $np must not collide")
      assert(withPort === key.replaceFirst("\\)", s":$np)"),
        s"trial $trial: $withPort")
    }
  }

  test("fetchPlan fuzz: 60 random indexes == a brute-force reference " +
      "(coverage, disjointness, gap law)") {
    val rnd = new scala.util.Random(53)
    for (trial <- 1 to 60) {
      val gap = 1L + rnd.nextInt(300)
      val recs = (0 until 1 + rnd.nextInt(40)).map { _ =>
        (s"w${rnd.nextInt(3)}", rnd.nextInt(2000).toLong,
          1L + rnd.nextInt(150))
      }.distinct
      // brute-force reference: per file, sort by (offset, length), then
      // a single fold with the documented rule (running max end + cap)
      val want = recs.groupBy(_._1).toSeq.flatMap { case (f, rs) =>
        val sorted = rs.map(r => (r._2, r._3)).sortBy(identity)
        val groups = scala.collection.mutable.ListBuffer
          .empty[scala.collection.mutable.ListBuffer[(Long, Long)]]
        var prevEnd = Long.MinValue
        for ((off, len) <- sorted) {
          if (groups.isEmpty || off > prevEnd + gap)
            groups += scala.collection.mutable.ListBuffer((off, len))
          else groups.last += ((off, len))
          prevEnd = math.max(prevEnd, off + len)
        }
        groups.map { g =>
          val start = g.map(_._1).min
          val end = g.map(t => t._1 + t._2).max
          (f, start, end, g.size.toLong, g.map(_._2).sum,
            end - start - g.map(_._2).sum)
        }
      }.sortBy(t => (t._1, t._2))
      val got = graft.operators.Crawl
        .fetchPlan(recs.toDF("filename", "offset", "length"), gap)
        .orderBy(col("filename"), col("start"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
      assert(got === want, s"trial $trial (gap=$gap): $recs")
    }
  }

  test("SQL surface: index filter -> surt join against the corpus") {
    def l(key: String, file: String, off: Long, len: Long,
        mime: String): String =
      s"""$key 20260101000000 {"url": "http://${key.replace(")", "/")
        .split(",").reverse.mkString(".").replace("/", "/p")}", """ +
        s""""mime": "$mime", "status": "200", "length": "$len", """ +
        s""""offset": "$off", "filename": "$file"}"""
    val lines = Seq(
      l("org,ex)/a", "w1.warc.gz", 0L, 100L, "text/html"),
      l("org,ex)/b", "w1.warc.gz", 100L, 50L, "image/png"),
      l("org,ex)/c", "w2.warc.gz", 10L, 40L, "text/html"),
      "BROKEN LINE")
    val parsed = lines.toDF("line")
      .select(call_function("graft_cdxj_parse", col("line")).as("r"))
      .filter(col("r").isNotNull)
      .select(col("r.*"))
    assert(parsed.count() === 3) // broken line is a loud null
    val htmlOnly = parsed.filter(col("mime") === "text/html")
    assert(htmlOnly.count() === 2)
    // surt of our canonical urls joins against the index's urlkey
    val corpus = Seq("http://EX.org/a").toDF("url")
      .select(call_function("graft_surt", col("url")).as("urlkey"))
    assert(corpus.head().getString(0) === "org,ex)/a")
    assert(htmlOnly.join(corpus, Seq("urlkey")).count() === 1)
  }

  test("fetchPlan: gap coalescing, file partitioning, overlap accounting") {
    val idx = Seq(
      // w1: three captures, gaps 10 and 2000 (gap cap 100): two ranges
      ("w1", 0L, 100L), ("w1", 110L, 50L), ("w1", 2160L, 40L),
      // w2: overlapping records still one range, no negative gap rows
      ("w2", 0L, 100L), ("w2", 50L, 100L))
      .toDF("filename", "offset", "length")
    val out = graft.operators.Crawl.fetchPlan(idx, maxGapBytes = 100L)
      .orderBy(col("filename"), col("start"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq(
      ("w1", 0L, 160L, 2L, 150L, 10L),
      ("w1", 2160L, 2200L, 1L, 40L, 0L),
      ("w2", 0L, 150L, 2L, 200L, -50L)))
    // null-field rows are excluded (counted by the caller's audit)
    val withNull = idx.unionAll(Seq(("w3", -1L, -1L))
      .toDF("filename", "offset", "length")
      .select(lit(null).cast("string").as("filename"), col("offset"),
        col("length")))
    assert(graft.operators.Crawl.fetchPlan(withNull, 100L).count() === 3)
  }

  test("fetchRecords: ranges spanning record boundaries slice out " +
      "exactly the selected captures; a misaligned slice is a loud null") {
    def rec(uri: String, body: String): String = {
      val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
      s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: <$uri>" +
        s"\r\nContent-Type: application/http; msgtype=response" +
        s"\r\nContent-Length: ${http.length}\r\n\r\n$http\r\n\r\n"
    }
    // one file of 6 contiguous variable-length records; select #0, #2,
    // #3, #5 — the gaps (#1, #4) are whole unselected records, so the
    // coalesced range READS them but must never emit them
    val recs = (0 until 6).map(i =>
      rec(s"http://ex.test/r$i", s"body $i " + "x" * (10 + 7 * i)))
    val offsets = recs.scanLeft(0L)((acc, r) => acc + r.length).init
    val archive = Seq(("w1", recs.mkString("").getBytes("US-ASCII")))
      .toDF("filename", "payload")
    val sel = Seq(0, 2, 3, 5)
    val index = sel.map(i =>
      ("w1", offsets(i), recs(i).length.toLong))
      .toDF("filename", "offset", "length")
    // big gap cap: ONE range spanning every boundary
    val plan = graft.operators.Crawl.fetchPlan(index, 1L << 20).collect()
    assert(plan.length === 1 && plan(0).getAs[Long]("n_records") === 4L)
    val out = graft.operators.Crawl.fetchRecords(index, archive, 1L << 20)
      .orderBy(col("offset")).collect()
    assert(out.length === 4)
    assert(out.map(_.getAs[org.apache.spark.sql.Row]("warc_rec")
      .getAs[String]("uri")).toSeq === sel.map(i => s"http://ex.test/r$i"))
    // gap cap 0: one range per record, same captures out
    val out0 = graft.operators.Crawl.fetchRecords(index, archive, 0L)
      .orderBy(col("offset")).collect()
    assert(out0.map(_.getAs[org.apache.spark.sql.Row]("warc_rec")
      .getAs[String]("uri")).toSeq === out.map(
      _.getAs[org.apache.spark.sql.Row]("warc_rec")
        .getAs[String]("uri")).toSeq)
    // differential vs the full-scan parse restricted to the selection
    val full = graft.operators.Multimodal
      .warcRecords(archive.select(col("payload")))
      .select(col("warc_rec.uri").as("uri"),
        col("warc_rec.body").cast("string").as("body"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for (r <- out) {
      val w = r.getAs[org.apache.spark.sql.Row]("warc_rec")
      assert(new String(w.getAs[Array[Byte]]("body"), "US-ASCII") ===
        full(w.getAs[String]("uri")))
    }
    // a misaligned index entry (offset off by one) parses to null — the
    // loud-null rule, never a silently wrong record
    val bad = Seq(("w1", offsets(2) + 1, recs(2).length.toLong))
      .toDF("filename", "offset", "length")
    val badOut = graft.operators.Crawl.fetchRecords(bad, archive).collect()
    assert(badOut.length === 1 && badOut(0).isNullAt(
      badOut(0).fieldIndex("warc_rec")))
  }

  test("fetchPlan/fetchRecords: maxRangeBytes splits a dense " +
      "selection; records fetched are byte-identical across caps") {
    def rec(uri: String, body: String): String = {
      val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
      s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: <$uri>" +
        s"\r\nContent-Length: ${http.length}\r\n\r\n$http\r\n\r\n"
    }
    // 20 contiguous records, ALL selected: the gap rule alone would
    // coalesce the whole file into ONE range (exactly the q243 shape
    // the r16 verdict flagged) — the cap must split it
    val recs = (0 until 20).map(i => rec(f"http://ex.test/c$i%02d",
      f"body $i%02d " + "y" * 40))
    val offsets = recs.scanLeft(0L)((acc, r) => acc + r.length).init
    val recLen = recs.head.length.toLong // fixed-width by construction
    assert(recs.forall(_.length.toLong == recLen))
    val archive = Seq(("w1", recs.mkString("").getBytes("US-ASCII")))
      .toDF("filename", "payload")
    val index = offsets.map(o => ("w1", o, recLen))
      .toDF("filename", "offset", "length")
    // uncapped: one range holding the whole file
    val one = graft.operators.Crawl.fetchPlan(index, 1L << 20).collect()
    assert(one.length === 1 && one(0).getAs[Long]("n_records") === 20L)
    // capped at ~4 records: ranges split at the grid, every span
    // bounded by cap + one record, coverage/count conserved
    val cap = recLen * 4
    val ranges = graft.operators.Crawl
      .fetchPlan(index, 1L << 20, maxRangeBytes = cap)
      .orderBy(col("start")).collect()
    assert(ranges.length === 5, s"want 5 capped ranges, got ${
      ranges.length}")
    assert(ranges.map(_.getAs[Long]("n_records")).sum === 20L)
    for (r <- ranges)
      assert(r.getAs[Long]("end") - r.getAs[Long]("start") <=
        cap + recLen)
    // ranges tile the file: starts/ends consecutive, no byte skipped
    for (i <- 1 until ranges.length)
      assert(ranges(i).getAs[Long]("start") ===
        ranges(i - 1).getAs[Long]("end"))
    // fetchRecords: byte-identical captures out, capped or not
    def fetch(maxRange: Long): Seq[(Long, String, String)] =
      graft.operators.Crawl
        .fetchRecords(index, archive, 1L << 20, maxRangeBytes = maxRange)
        .orderBy(col("offset")).collect().toSeq
        .map { r =>
          val w = r.getAs[org.apache.spark.sql.Row]("warc_rec")
          (r.getAs[Long]("offset"), w.getAs[String]("uri"),
            new String(w.getAs[Array[Byte]]("body"), "US-ASCII"))
        }
    val uncapped = fetch(1L << 30)
    val capped = fetch(cap)
    assert(uncapped.length === 20 && capped === uncapped)
    // a record LONGER than the cap stays one (loud-sized) range — a
    // record cannot be split
    val big = graft.operators.Crawl
      .fetchPlan(index, 1L << 20, maxRangeBytes = 1L)
      .collect()
    assert(big.length === 20 &&
      big.forall(_.getAs[Long]("n_records") === 1L))
  }

  test("collapseRevisits: revisit chains fold onto the earliest " +
      "original; orphans stay loud") {
    def row(urlkey: String, ts: String, mime: String, digest: String,
        off: Long): (String, String, String, String, Integer, String,
        java.lang.Long, java.lang.Long, String) =
      (urlkey, ts, "http://ex.org/x", mime, 200, digest, 100L, off, "w1")
    val idx = Seq(
      // one original + two revisits on its digest
      row("org,ex)/a", "20260101000000", "text/html", "sha1:a", 0L),
      row("org,ex)/a", "20260115000000", "warc/revisit", "sha1:a", 300L),
      row("org,ex)/a", "20260201000000", "warc/revisit", "sha1:a", 600L),
      // same urlkey, DIFFERENT digest (content changed): its own group
      row("org,ex)/a", "20260301000000", "text/html", "sha1:a2", 900L),
      // two originals sharing a digest (content reverted): earliest wins
      row("org,ex)/b", "20260105000000", "text/html", "sha1:b", 0L),
      row("org,ex)/b", "20260120000000", "text/html", "sha1:b", 300L),
      // orphan: revisit whose original fell outside the slice
      row("org,ex)/c", "20260110000000", "warc/revisit", "sha1:c", 0L))
      .toDF("urlkey", "ts", "url", "mime", "status", "digest", "length",
        "offset", "filename")
    val out = graft.operators.Crawl.collapseRevisits(idx)
      .orderBy(col("urlkey"), col("digest")).collect()
    assert(out.length === 4)
    val a = out(0)
    assert(a.getAs[String]("digest") === "sha1:a" &&
      a.getAs[Long]("n_captures") === 3L &&
      a.getAs[Long]("n_revisits") === 2L &&
      a.getAs[String]("first_ts") === "20260101000000" &&
      a.getAs[String]("last_ts") === "20260201000000" &&
      a.getAs[String]("orig_ts") === "20260101000000" &&
      a.getAs[Long]("offset") === 0L)
    val a2 = out(1)
    assert(a2.getAs[String]("digest") === "sha1:a2" &&
      a2.getAs[Long]("n_captures") === 1L &&
      a2.getAs[Long]("n_revisits") === 0L)
    val b = out(2)
    assert(b.getAs[Long]("n_captures") === 2L &&
      b.getAs[Long]("n_revisits") === 0L &&
      b.getAs[String]("orig_ts") === "20260105000000" &&
      b.getAs[Long]("offset") === 0L)
    // the orphan: every location column null, n_revisits == n_captures
    val c = out(3)
    assert(c.getAs[Long]("n_captures") === 1L &&
      c.getAs[Long]("n_revisits") === 1L &&
      c.isNullAt(c.fieldIndex("filename")) &&
      c.isNullAt(c.fieldIndex("offset")) &&
      c.isNullAt(c.fieldIndex("orig_ts")))
  }

  test("collapseRevisits: a DATELESS original never shadows a dated " +
      "one (nulls-last original pick)") {
    def row(urlkey: String, ts: String, url: String, mime: String,
        digest: String, off: Long): (String, String, String, String,
        Integer, String, java.lang.Long, java.lang.Long, String) =
      (urlkey, ts, url, mime, 200, digest, 100L, off, "w1")
    val idx = Seq(
      // dateless original FIRST in input order (buildIndex's loud-null
      // ts) beside a dated one on the same digest: the dated original
      // must win the earliest pick — Spark's min(struct) orders a null
      // first field FIRST, which without the sentinel would land
      // orig_ts null with the dateless row's location
      row("org,ex)/d", null, "http://ex.org/d-null", "text/html",
        "sha1:d", 900L),
      row("org,ex)/d", "20260102000000", "http://ex.org/d-dated",
        "text/html", "sha1:d", 0L),
      row("org,ex)/d", "20260103000000", "http://ex.org/d-rv",
        "warc/revisit", "sha1:d", 300L),
      // a group whose ONLY original is dateless: orig_ts null LOUDLY,
      // location still points at the real (undated) capture
      row("org,ex)/e", null, "http://ex.org/e-null", "text/html",
        "sha1:e", 400L))
      .toDF("urlkey", "ts", "url", "mime", "status", "digest", "length",
        "offset", "filename")
    val out = graft.operators.Crawl.collapseRevisits(idx)
      .orderBy(col("urlkey"), col("digest")).collect()
    assert(out.length === 2)
    val d = out(0)
    assert(d.getAs[Long]("n_captures") === 3L &&
      d.getAs[Long]("n_revisits") === 1L &&
      d.getAs[String]("orig_ts") === "20260102000000" &&
      d.getAs[String]("url") === "http://ex.org/d-dated" &&
      d.getAs[Long]("offset") === 0L &&
      // first/last_ts aggregate over DATED captures (min/max skip null)
      d.getAs[String]("first_ts") === "20260102000000")
    val e = out(1)
    assert(e.isNullAt(e.fieldIndex("orig_ts")) &&
      e.getAs[String]("url") === "http://ex.org/e-null" &&
      e.getAs[Long]("offset") === 400L)
  }
}

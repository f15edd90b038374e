package graft

import graft.expressions.UrlResolve

/** RFC 3986 §5 reference resolution ([[UrlResolve]],
  * `graft_resolve_url`): the spec's OWN §5.4 example tables (normal and
  * abnormal, verbatim), crawl-shaped composition with canon, and a
  * differential fuzz against `java.net.URI.resolve` inside the region
  * where the two agree (the JDK deviates on empty refs, absolute-ref
  * dot segments, and bare `%` — each divergence pinned here). */
class UrlResolveSpec extends SparkSpec {
  import spark.implicits._

  private val Base = "http://a/b/c/d;p?q"
  private def r(ref: String): String = UrlResolve.resolve(Base, ref)

  test("RFC 3986 §5.4.1 normal examples, verbatim") {
    assert(r("g:h") === "g:h")
    assert(r("g") === "http://a/b/c/g")
    assert(r("./g") === "http://a/b/c/g")
    assert(r("g/") === "http://a/b/c/g/")
    assert(r("/g") === "http://a/g")
    assert(r("//g") === "http://g")
    assert(r("?y") === "http://a/b/c/d;p?y")
    assert(r("g?y") === "http://a/b/c/g?y")
    assert(r("#s") === "http://a/b/c/d;p?q#s")
    assert(r("g#s") === "http://a/b/c/g#s")
    assert(r("g?y#s") === "http://a/b/c/g?y#s")
    assert(r(";x") === "http://a/b/c/;x")
    assert(r("g;x") === "http://a/b/c/g;x")
    assert(r("g;x?y#s") === "http://a/b/c/g;x?y#s")
    assert(r("") === "http://a/b/c/d;p?q")
    assert(r(".") === "http://a/b/c/")
    assert(r("./") === "http://a/b/c/")
    assert(r("..") === "http://a/b/")
    assert(r("../") === "http://a/b/")
    assert(r("../g") === "http://a/b/g")
    assert(r("../..") === "http://a/")
    assert(r("../../") === "http://a/")
    assert(r("../../g") === "http://a/g")
  }

  test("RFC 3986 §5.4.2 abnormal examples, verbatim") {
    // .. cannot climb above the root
    assert(r("../../../g") === "http://a/g")
    assert(r("../../../../g") === "http://a/g")
    assert(r("/./g") === "http://a/g")
    assert(r("/../g") === "http://a/g")
    assert(r("g.") === "http://a/b/c/g.")
    assert(r(".g") === "http://a/b/c/.g")
    assert(r("g..") === "http://a/b/c/g..")
    assert(r("..g") === "http://a/b/c/..g")
    // nonsensical dot forms
    assert(r("./../g") === "http://a/b/g")
    assert(r("./g/.") === "http://a/b/c/g/")
    assert(r("g/./h") === "http://a/b/c/g/h")
    assert(r("g/../h") === "http://a/b/c/h")
    assert(r("g;x=1/./y") === "http://a/b/c/g;x=1/y")
    assert(r("g;x=1/../y") === "http://a/b/c/y")
    // query/fragment are not path-relative
    assert(r("g?y/./x") === "http://a/b/c/g?y/./x")
    assert(r("g?y/../x") === "http://a/b/c/g?y/../x")
    assert(r("g#s/./x") === "http://a/b/c/g#s/./x")
    assert(r("g#s/../x") === "http://a/b/c/g#s/../x")
    // strict parser: same-scheme relative backcompat NOT honored
    assert(r("http:g") === "http:g")
  }

  test("crawl shapes: protocol-relative, root, empty base path, nulls") {
    assert(UrlResolve.resolve("https://h.test/a/b", "//cdn.test/x.js") ===
      "https://cdn.test/x.js")
    // empty base path: merge inserts the leading slash (RFC §5.3)
    assert(UrlResolve.resolve("http://h.test", "a") === "http://h.test/a")
    assert(UrlResolve.resolve("http://h.test?q=1", "a") ===
      "http://h.test/a")
    // base fragment never survives (same-document ref re-targets it)
    assert(UrlResolve.resolve("http://h.test/p#old", "") ===
      "http://h.test/p")
    assert(UrlResolve.resolve("http://h.test/p#old", "#new") ===
      "http://h.test/p#new")
    // relative base cannot anchor resolution
    assert(UrlResolve.resolve("/just/a/path", "g") === null)
    assert(UrlResolve.resolve("", "g") === null)
    // absolute ref with dot segments: removed (the JDK skips this)
    assert(UrlResolve.resolve(Base, "http://x.test/a/../b") ===
      "http://x.test/b")
  }

  test("fuzz: matches java.net.URI.resolve where the specs agree") {
    val rnd = new scala.util.Random(3986)
    val segs = Array("a", "bb", "ccc", ".", "..", "d1")
    def randRef(): String = {
      val sb = new StringBuilder
      val abs = rnd.nextInt(4) == 0
      if (abs) sb.append('/')
      val n = 1 + rnd.nextInt(4)
      for (i <- 0 until n) {
        if (i > 0) sb.append('/')
        sb.append(segs(rnd.nextInt(segs.length)))
      }
      if (rnd.nextInt(3) == 0) sb.append("?q=").append(rnd.nextInt(10))
      if (rnd.nextInt(4) == 0) sb.append("#f").append(rnd.nextInt(10))
      sb.toString
    }
    var checked = 0
    for (_ <- 0 until 3000) {
      val ref = randRef()
      // agreement region: refs whose JDK result is FULLY FOLDED. The JDK
      // deviates from RFC §5.2.4 wherever dot segments survive its own
      // resolution — it skips remove_dot_segments on absolute-path refs
      // (URI.resolve("/./d1") keeps the "./") and keeps excess ".."
      // above the root ("./../../.." → "/.."), where the RFC's §5.4.2
      // example table requires /./g → /g and caps climbs at the root;
      // the kernel follows the RFC (pinned in the abnormal tests above)
      val want = try {
        val w = new java.net.URI(Base).resolve(ref).toString
        val path = w.takeWhile(c => c != '?' && c != '#')
        if (path.split('/').exists(s => s == "." || s == "..")) null else w
      } catch { case _: Throwable => null }
      if (want != null) {
        assert(UrlResolve.resolve(Base, ref) === want, s"ref '$ref'")
        checked += 1
      }
    }
    assert(checked > 2500)
  }

  test("fuzz: random BASES too — merge anchors on every base shape") {
    val rnd = new scala.util.Random(5234)
    val segs = Array("d", "ee", "fff")
    def randBase(): String = {
      val sb = new StringBuilder("http://h")
      sb.append(rnd.nextInt(3)).append(".test")
      val n = rnd.nextInt(4) // 0 = empty path (the §5.3 '/' insertion)
      for (_ <- 0 until n) sb.append('/').append(segs(rnd.nextInt(3)))
      if (rnd.nextBoolean() && n > 0) sb.append('/') // directory base
      if (rnd.nextInt(3) == 0) sb.append("?bq=1")
      sb.toString
    }
    def randRef(): String = {
      val sb = new StringBuilder
      for (i <- 0 until 1 + rnd.nextInt(3)) {
        if (i > 0) sb.append('/')
        sb.append(segs(rnd.nextInt(3)))
      }
      if (rnd.nextInt(3) == 0) sb.append("?q=2")
      sb.toString
    }
    var checked = 0
    for (_ <- 0 until 2000) {
      val base = randBase()
      val ref = randRef()
      val want = try {
        val w = new java.net.URI(base).resolve(ref).toString
        val path = w.takeWhile(c => c != '?' && c != '#')
        if (path.split('/').exists(s => s == "." || s == "..")) null else w
      } catch { case _: Throwable => null }
      if (want != null) {
        assert(UrlResolve.resolve(base, ref) === want,
          s"base '$base' ref '$ref'")
        checked += 1
      }
    }
    assert(checked > 1500)
  }

  test("SQL surface: resolve composes with canon for frontier keys") {
    val df = Seq(
      (1L, "http://EX.test/dir/page.html", "../other?a=1&utm_source=x"),
      (2L, "http://ex.test/dir/", "sub/p2#frag"),
      (3L, "http://ex.test/a", null.asInstanceOf[String]))
      .toDF("id", "base", "href")
    df.createOrReplaceTempView("resolve_fixture")
    val out = spark.sql(
      """SELECT id, graft_canon_url(graft_resolve_url(base, href)) AS key
        |FROM resolve_fixture ORDER BY id""".stripMargin).collect()
    assert(out(0).getString(1) === "http://ex.test/other?a=1")
    assert(out(1).getString(1) === "http://ex.test/dir/sub/p2")
    assert(out(2).isNullAt(1))
  }
}

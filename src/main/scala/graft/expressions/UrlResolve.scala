package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 §5 reference resolution — the missing hop between outlink
  * extraction and the frontier: real pages link RELATIVELY (`/about`,
  * `../x`, `foo.html`, `//cdn.host/x`, `?page=2`, `#sec`), and
  * `graft_canon_url` correctly refuses a relative link as a document
  * key, so without resolution a crawl frontier silently drops most of
  * the web's edges. `graft_resolve_url(base, ref)` turns (page URL,
  * href) into the absolute target exactly per the RFC's §5.2.2
  * transform-references algorithm:
  *
  *  - a ref with its own scheme wins outright (absolute refs pass
  *    through, dot-segments removed — strict mode, no same-scheme
  *    relative backcompat);
  *  - a protocol-relative ref (`//host/p`) inherits only the scheme;
  *  - an empty ref or `#frag` keeps the base's path and query (the
  *    same-document case);
  *  - `?q` keeps the base path, replaces the query;
  *  - absolute paths resolve against the authority; relative paths
  *    MERGE with the base path (§5.3) and then `remove_dot_segments`
  *    (§5.2.4) folds `.`/`..` — never escaping the root (`/../a` → `/a`,
  *    the RFC's abnormal-example behavior);
  *  - the result's fragment is the REF's fragment alone (a base
  *    fragment never survives resolution — RFC §5.3; `graft_canon_url`
  *    then strips fragments when building dedup keys).
  *
  * NULL when the base is not absolute (no scheme) — a relative base
  * cannot anchor resolution. Zero-dependency and ASCII-exact (scheme
  * chars are the RFC's own set, no locale-sensitive case logic);
  * `java.net.URI.resolve` is NOT used — it deviates from the RFC on
  * empty refs (keeps the base fragment), skips dot-segment removal on
  * absolute refs, and throws on the bare percent signs real hrefs
  * carry. UrlResolveSpec pins the RFC's §5.4 normal AND abnormal
  * example tables verbatim and differential-fuzzes against
  * `java.net.URI` in the region where the two specifications agree.
  *
  * Reference scope: sybil has no URL surface; this is the
  * training-data-pipeline crawl tier (q226 composes it with outlinks,
  * redirect edges ride the same kernel).
  */
object UrlResolve {

  /** URI-reference components; null = absent (RFC 5.3's "defined").
    * `auth` excludes the leading `//`. */
  final class Parts(val scheme: String, val auth: String, val path: String,
      val query: String, val frag: String)

  private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def isSchemeChar(c: Char): Boolean =
    isAlpha(c) || (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'

  /** Split per RFC 3986 appendix B (without regex). */
  def parse(s: String): Parts = {
    var rest = s
    var frag: String = null
    val hi = rest.indexOf('#')
    if (hi >= 0) { frag = rest.substring(hi + 1); rest = rest.substring(0, hi) }
    var query: String = null
    val qi = rest.indexOf('?')
    if (qi >= 0) { query = rest.substring(qi + 1); rest = rest.substring(0, qi) }
    var scheme: String = null
    val ci = rest.indexOf(':')
    if (ci > 0) {
      var ok = isAlpha(rest.charAt(0))
      var k = 1
      while (ok && k < ci) { ok = isSchemeChar(rest.charAt(k)); k += 1 }
      // a ':' inside a path segment ("./a:b") is not a scheme delimiter;
      // the scheme colon must precede any '/'
      val slash = rest.indexOf('/')
      if (ok && (slash < 0 || ci < slash)) {
        scheme = rest.substring(0, ci)
        rest = rest.substring(ci + 1)
      }
    }
    var auth: String = null
    if (rest.startsWith("//")) {
      val e = {
        var k = 2
        while (k < rest.length && rest.charAt(k) != '/') k += 1
        k
      }
      auth = rest.substring(2, e)
      rest = rest.substring(e)
    }
    new Parts(scheme, auth, rest, query, frag)
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. Index-walked (the naive
    * rebuild-the-input-per-step transcription is O(n²) in substring
    * churn — measured 3.6 µs/resolve before, and resolution runs once
    * per EDGE at frontier scale), with a fast path for the dominant
    * real-URL case of no dot segments at all. */
  def removeDotSegments(p: String): String = {
    val n = p.length
    // fast path: dot segments require a '.' at a segment start
    if (n == 0) return p
    if (p.charAt(0) != '.' && p.indexOf("/.") < 0) return p
    // java.lang.StringBuilder: the 3-arg (CharSequence, from, to) append
    // exists there — Scala's StringBuilder would silently auto-tuple it
    val out = new java.lang.StringBuilder(n)
    var i = 0
    def at(pat: String): Boolean = p.regionMatches(i, pat, 0, pat.length)
    def popSegment(): Unit = {
      val k = out.lastIndexOf("/")
      out.setLength(if (k < 0) 0 else k)
    }
    while (i < n) {
      if (at("../")) i += 3
      else if (i + 2 == n && at("..")) i = n // lone ".." (leading)
      else if (at("./")) i += 2
      else if (i + 1 == n && p.charAt(i) == '.') i = n // lone "."
      else if (at("/./")) i += 2 // consume "/.", keep the "/"
      else if (i + 2 == n && at("/.")) { out.append('/'); i = n }
      else if (at("/../")) { i += 3; popSegment() } // keep trailing "/"
      else if (i + 3 == n && at("/..")) {
        popSegment(); out.append('/'); i = n
      } else {
        // move one segment (incl. its leading '/', if any) to out
        var k = if (p.charAt(i) == '/') i + 1 else i
        while (k < n && p.charAt(k) != '/') k += 1
        out.append(p, i, k)
        i = k
      }
    }
    out.toString
  }

  /** RFC 3986 §5.3 merge. */
  private def merge(baseAuth: String, basePath: String,
      refPath: String): String =
    if (baseAuth != null && basePath.isEmpty) "/" + refPath
    else {
      val i = basePath.lastIndexOf('/')
      if (i < 0) refPath else basePath.substring(0, i + 1) + refPath
    }

  /** §5.2.2 transform references; null when base has no scheme. */
  def resolve(base: String, ref: String): String = {
    if (base == null || ref == null) return null
    val b = parse(base.trim)
    if (b.scheme == null) return null
    val r = parse(ref.trim)
    var scheme: String = null
    var auth: String = null
    var path: String = null
    var query: String = null
    if (r.scheme != null) {
      scheme = r.scheme; auth = r.auth
      path = removeDotSegments(r.path); query = r.query
    } else {
      scheme = b.scheme
      if (r.auth != null) {
        auth = r.auth; path = removeDotSegments(r.path); query = r.query
      } else {
        auth = b.auth
        if (r.path.isEmpty) {
          path = b.path
          query = if (r.query != null) r.query else b.query
        } else if (r.path.charAt(0) == '/') {
          path = removeDotSegments(r.path); query = r.query
        } else {
          path = removeDotSegments(merge(b.auth, b.path, r.path))
          query = r.query
        }
      }
    }
    val sb = new StringBuilder(scheme).append(':')
    if (auth != null) sb.append("//").append(auth)
    sb.append(path)
    if (query != null) sb.append('?').append(query)
    if (r.frag != null) sb.append('#').append(r.frag)
    sb.toString
  }
}

/** `graft_resolve_url(base string, ref string) -> string` — see
  * [[UrlResolve]]. NULL on null inputs or a non-absolute base. */
case class GraftResolveUrl(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_resolve_url expects (string, string), got ${l.sql}, ${r.sql}")
    }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_resolve_url"

  override protected def nullSafeEval(b: Any, r: Any): Any = {
    val out = UrlResolve.resolve(b.asInstanceOf[UTF8String].toString,
      r.asInstanceOf[UTF8String].toString)
    if (out == null) null else UTF8String.fromString(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = UrlResolve.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (b, r) => {
      val out = ctx.freshName("resolved")
      s"""
         |String $out = $cls.resolve($b.toString(), $r.toString());
         |if ($out == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  org.apache.spark.unsafe.types.UTF8String.fromString($out); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftResolveUrl =
    copy(left = newLeft, right = newRight)
}

package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization — the key-normalization step a web-corpus
  * pipeline runs before URL-level dedup (the C4/CCNet convention: most
  * exact duplicates in a crawl are the SAME page under cosmetically
  * different URLs). One deterministic pure function, so the canonical
  * form is a dedup key that agrees across shards, snapshots, and
  * engines:
  *
  *  - percent-encoding normalized (RFC 3986 §2.3 + §6.2.2.1): a
  *    `%XX` triplet whose octet is UNRESERVED (ALPHA / DIGIT / `-` `.`
  *    `_` `~`) decodes to the character; every other valid triplet
  *    keeps its encoding with the hex digits uppercased (`%3d`→`%3D`);
  *    a malformed `%` sequence is copied verbatim. Decoding is
  *    charset-free (single octets) and can never introduce a
  *    delimiter — `/ ? # @ : %` are all reserved, so the parse below
  *    is unaffected;
  *  - scheme and host lowercase (RFC 3986 §6.2.2.1 — both are
  *    case-insensitive; paths are NOT touched);
  *  - default port stripped (`80` for http, `443` for https), the
  *    empty port (`host:`) folded; an authority whose port is not
  *    `*DIGIT` — a second colon (`h:80:80`), letters — is rejected as
  *    NULL rather than emitting a key that is not a fixed point;
  *  - fragment dropped (never sent to the server);
  *  - tracking query params removed (`utm_*`, `fbclid`, `gclid`,
  *    `msclkid`, `mc_cid`, `mc_eid`, `ref`), OTHER params kept in their
  *    original order — reordering would conflate pages whose servers
  *    are order-sensitive;
  *  - trailing slashes stripped from the path (`/a//` = `/a/` = `/a`,
  *    and the bare root `/` = empty) — all of them, so the output is a
  *    fixed point of the function;
  *  - surrounding whitespace trimmed.
  *
  * NULL for anything without a `scheme://host` shape — a relative link
  * is not a canonicalizable document key. IDN/punycode host folding
  * stays OUT of the default key (it depends on the runtime's Unicode
  * tables, which the default key must not) but is available behind an
  * explicit flag (r12): `canon(u, idnHost = true)` /
  * `graft_canon_url(url, true)` folds a non-ASCII hostname to its
  * punycode A-label form via the JDK's `java.net.IDN` (IDNA2003), so
  * `http://bücher.de/` and `http://xn--bcher-kva.de/` collapse onto one
  * key for crawls that need it; a hostname IDNA rejects (oversized
  * label, empty label) is NULL under the flag — not a canonical key.
  * Percent-encoded non-ASCII hosts stay encoded either way (the
  * unreserved-octet rule is charset-free by design).
  */
object UrlCanon {
  private def isTracking(param: String): Boolean = {
    val eq = param.indexOf('=')
    val k = (if (eq < 0) param else param.substring(0, eq)).toLowerCase
    k.startsWith("utm_") || k == "fbclid" || k == "gclid" ||
      k == "msclkid" || k == "mc_cid" || k == "mc_eid" || k == "ref"
  }

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  private def isUnreservedOctet(v: Int): Boolean =
    (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') ||
      (v >= '0' && v <= '9') || v == '-' || v == '.' || v == '_' || v == '~'

  /** RFC 3986 percent normalization: decode unreserved octets, uppercase
    * the hex of every other valid triplet, copy malformed `%` verbatim.
    * Idempotent: a decoded character is unreserved text, `%XX` with
    * uppercase hex maps to itself, and `%25..` re-encodes to `%25..`. */
  private def pctNormalize(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length && hexVal(s.charAt(i + 1)) >= 0 &&
          hexVal(s.charAt(i + 2)) >= 0) {
        val v = hexVal(s.charAt(i + 1)) * 16 + hexVal(s.charAt(i + 2))
        if (isUnreservedOctet(v)) sb.append(v.toChar)
        else sb.append('%').append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  def canon(u: String): String = canon(u, idnHost = false)

  def canon(u: String, idnHost: Boolean): String = {
    if (u == null) return null
    val t = pctNormalize(u.trim)
    val si = t.indexOf("://")
    if (si <= 0) return null
    val scheme = t.substring(0, si).toLowerCase
    if (!scheme.head.isLetter ||
      !scheme.forall(c => c.isLetter || c.isDigit || c == '+' || c == '-' ||
        c == '.')) return null
    var rest = t.substring(si + 3)
    val hi = rest.indexOf('#')
    if (hi >= 0) rest = rest.substring(0, hi)
    val pe = rest.indexWhere(c => c == '/' || c == '?')
    val (hostport, tail) =
      if (pe < 0) (rest, "") else (rest.substring(0, pe), rest.substring(pe))
    if (hostport.isEmpty) return null
    // userinfo is CASE-SENSITIVE (RFC 3986 §3.2.1) — only the host part
    // of the authority lowercases
    val at = hostport.lastIndexOf('@')
    val userinfo = if (at >= 0) hostport.substring(0, at + 1) else ""
    val rawHost = hostport.substring(at + 1).toLowerCase
    if (rawHost.isEmpty) return null
    // split the authority into hostname + optional port. RFC 3986 port
    // is *DIGIT after the one colon outside an IPv6 bracket pair — a
    // second colon ("h:80:80") or a non-digit port is an invalid
    // authority and returns null, never a key that is not a fixed point
    val (hname, port) =
      if (rawHost.charAt(0) == '[') {
        val rb = rawHost.indexOf(']')
        if (rb < 0) return null
        val after = rawHost.substring(rb + 1)
        if (after.isEmpty) (rawHost, null)
        else if (after.charAt(0) == ':')
          (rawHost.substring(0, rb + 1), after.substring(1))
        else return null
      } else {
        val ci = rawHost.indexOf(':')
        if (ci < 0) (rawHost, null)
        else (rawHost.substring(0, ci), rawHost.substring(ci + 1))
      }
    if (port != null && !port.forall(c => c >= '0' && c <= '9')) return null
    // a hostless authority ("http://:8080/x") is not a document key
    if (hname.isEmpty) return null
    // flagged IDN fold: non-ASCII hostname -> punycode A-labels (skip
    // IPv6 brackets; ASCII hostnames — incl. existing xn-- — are fixed
    // points of toASCII, which keeps the canon idempotent)
    val hfold =
      if (!idnHost || hname.charAt(0) == '[') hname
      else try java.net.IDN.toASCII(hname).toLowerCase
      catch { case _: IllegalArgumentException => return null }
    val defPort =
      if (scheme == "http") "80" else if (scheme == "https") "443" else null
    // leading zeros carry no port semantics (":080" is port 80), so strip
    // them before BOTH the default-port compare and the emitted key —
    // otherwise ":080", ":80" and no-port yield three dedup keys for the
    // same document. All-zeros strips to empty, which folds like the
    // empty port; the output stays a fixed point (no leading zeros can
    // survive into it).
    val normPort =
      if (port == null) null
      else {
        var z = 0
        while (z < port.length - 1 && port.charAt(z) == '0') z += 1
        val stripped = port.substring(z)
        if (stripped == "0") "" else stripped
      }
    val host =
      if (normPort == null || normPort.isEmpty || normPort == defPort) hfold
      else hfold + ":" + normPort
    val qi = tail.indexOf('?')
    var path = if (qi < 0) tail else tail.substring(0, qi)
    val query = if (qi < 0) null else tail.substring(qi + 1)
    // ALL trailing slashes fold, not just one — the output must be a
    // fixed point (canon(canon(u)) == canon(u)) or '/a//' and '/a' get
    // different dedup keys
    while (path.nonEmpty && path.endsWith("/"))
      path = path.substring(0, path.length - 1)
    val kept =
      if (query == null) ""
      else {
        val ps = query.split("&", -1).filter(p => p.nonEmpty && !isTracking(p))
        if (ps.isEmpty) "" else "?" + ps.mkString("&")
      }
    scheme + "://" + userinfo + host + path + kept
  }
}

/** `graft_canon_url(string[, idn_fold]) -> string` — [[UrlCanon.canon]]
  * as a native codegen expression: the scan-side projection that turns a
  * raw crawl URL into the dedup key, NULL for non-URLs. The optional
  * second argument (a foldable boolean, default false) enables the
  * flagged IDN/punycode host fold. */
case class GraftCanonUrl(child: Expression, idnFold: Boolean = false)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_canon_url expects string, got ${t.sql}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_canon_url"

  override protected def nullSafeEval(input: Any): Any = {
    val c = UrlCanon.canon(input.asInstanceOf[UTF8String].toString, idnFold)
    if (c == null) null else UTF8String.fromString(c)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // fresh local: unbraced nullSafeCodeGen snippets collide on a fixed
    // name when two instances share one codegen method
    val c = ctx.freshName("canon")
    nullSafeCodeGen(ctx, ev, u => s"""
      String $c = graft.expressions.UrlCanon.canon($u.toString(), $idnFold);
      if ($c == null) { ${ev.isNull} = true; } else {
        ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($c);
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): GraftCanonUrl =
    copy(child = newChild)
}

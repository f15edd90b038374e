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
  *  - scheme and host lowercase (RFC 3986 §6.2.2.1 — both are
  *    case-insensitive; paths are NOT touched);
  *  - default port stripped (`:80` for http, `:443` for https);
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
  * is not a canonicalizable document key. Percent-encoding is preserved
  * untouched (decoding changes the key space and needs charset
  * assumptions a pipeline should make explicitly).
  */
object UrlCanon {
  private def isTracking(param: String): Boolean = {
    val eq = param.indexOf('=')
    val k = (if (eq < 0) param else param.substring(0, eq)).toLowerCase
    k.startsWith("utm_") || k == "fbclid" || k == "gclid" ||
      k == "msclkid" || k == "mc_cid" || k == "mc_eid" || k == "ref"
  }

  def canon(u: String): String = {
    if (u == null) return null
    val t = u.trim
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
    var host = hostport.substring(at + 1).toLowerCase
    if (host.isEmpty) return null
    val defPort =
      if (scheme == "http") ":80" else if (scheme == "https") ":443" else null
    if (defPort != null && host.endsWith(defPort))
      host = host.substring(0, host.length - defPort.length)
    // an authority that was ONLY a default port ("http://:80/x") strips
    // to an empty host — reject like every other hostless shape rather
    // than emit a key canon() itself maps to null
    if (host.isEmpty) return null
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

/** `graft_canon_url(string) -> string` — [[UrlCanon.canon]] as a native
  * codegen expression: the scan-side projection that turns a raw crawl
  * URL into the dedup key, NULL for non-URLs. */
case class GraftCanonUrl(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_canon_url expects string, got ${t.sql}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_canon_url"

  override protected def nullSafeEval(input: Any): Any = {
    val c = UrlCanon.canon(input.asInstanceOf[UTF8String].toString)
    if (c == null) null else UTF8String.fromString(c)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // fresh local: unbraced nullSafeCodeGen snippets collide on a fixed
    // name when two instances share one codegen method
    val c = ctx.freshName("canon")
    nullSafeCodeGen(ctx, ev, u => s"""
      String $c = graft.expressions.UrlCanon.canon($u.toString());
      if ($c == null) { ${ev.isNull} = true; } else {
        ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($c);
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): GraftCanonUrl =
    copy(child = newChild)
}

package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt evaluation (RFC 9309, the Robots Exclusion Protocol) — the
  * crawl-frontier filter that sits between [[HtmlText outlink extraction]]
  * / `graft_canon_url` and the fetch queue. Deterministic, documented
  * semantics:
  *
  *  - lines split on `\n` (trailing `\r` dropped), `#` comments stripped,
  *    whitespace trimmed; `key: value` at the first colon, keys ASCII
  *    case-insensitive; blank lines are not significant (RFC 9309 groups
  *    end only at the next `User-agent` line);
  *  - consecutive `User-agent` lines open one group; `Allow`/`Disallow`
  *    lines attach to the open group (rules before any `User-agent` are
  *    ignored, per the RFC's invalid-line rule);
  *  - group selection: exact ASCII case-insensitive product-token match
  *    beats the `*` group; ALL groups naming the winning token combine;
  *    no matching group at all → everything is allowed;
  *  - rule match: patterns are PREFIX matches over the path, `*` matches
  *    any byte run, a FINAL `$` anchors at the path end (a non-final `$`
  *    is literal); an empty pattern matches nothing (dropped at parse);
  *  - precedence: the longest matching pattern (raw pattern length,
  *    wildcards counted — the de-facto Googlebot rule RFC 9309 adopted)
  *    wins; at equal length `Allow` wins; no matching rule → allowed.
  *
  * `graft_robots_allowed(robots string, agent string, path string) ->
  * boolean`. Parsing memoizes per (robots, agent) in a per-thread
  * direct-mapped cache (64 entries, keyed by byte hash), so a frontier
  * join evaluating thousands of paths parses each robots.txt once per
  * task even when rows interleave hosts — the normal shape after a
  * frontier join; see [[RobotsKernel.eval]] for the bounds. Reference
  * scope: sybil has no crawl surface; training-data-pipeline extension
  * tier (q218).
  */
object RobotsKernel {

  final class Rule(val allow: Boolean, val pattern: String)

  private def lower(s: String): String = {
    // ASCII-only lowercase (locale-proof: no Turkish-I surprises)
    val a = s.toCharArray
    var i = 0
    while (i < a.length) {
      val c = a(i)
      if (c >= 'A' && c <= 'Z') a(i) = (c + 32).toChar
      i += 1
    }
    new String(a)
  }

  /** The winning group(s)' combined policy: matching rules plus the
    * politeness signal. `crawlDelay` is null when absent everywhere. */
  final class Policy(val rules: Array[Rule],
      val crawlDelay: java.lang.Double)

  private val EmptyPolicy = new Policy(Array.empty, null)

  /** Combined policy for the winning group(s); empty rules when no group
    * applies (→ everything allowed, no delay). `Crawl-delay` is the
    * de-facto extension RFC 9309 leaves out but Bing/Yandex honor:
    * seconds (fractions allowed) parsed per group; when several groups
    * name the winning token, the MAXIMUM defined delay wins — the most
    * conservative politeness is the only safe combination. Invalid or
    * negative values are ignored (an unparseable delay must not become
    * delay-zero). */
  def policyFor(robots: String, agentLower: String): Policy = {
    // per group: uaScore (-1 no match, 0 = '*', else token len) + rules
    final case class Group(var score: Int,
      val rules: scala.collection.mutable.ArrayBuffer[Rule]) {
      var delay: java.lang.Double = null
    }
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var cur: Group = null
    var inUa = false
    robots.split('\n').foreach { raw0 =>
      val raw = if (raw0.nonEmpty && raw0.last == '\r') raw0.dropRight(1)
        else raw0
      val noComment = {
        val h = raw.indexOf('#')
        if (h >= 0) raw.substring(0, h) else raw
      }
      val line = noComment.trim
      if (line.nonEmpty) {
        val c = line.indexOf(':')
        if (c > 0) {
          val key = lower(line.substring(0, c).trim)
          val value = line.substring(c + 1).trim
          key match {
            case "user-agent" =>
              if (!inUa) { cur = Group(-1,
                scala.collection.mutable.ArrayBuffer.empty[Rule])
                groups += cur; inUa = true }
              val ua = lower(value)
              val score = if (ua == "*") 0
                else if (ua == agentLower) ua.length
                else -1
              if (score > cur.score) cur.score = score
            case "allow" | "disallow" =>
              inUa = false
              if (cur != null && value.nonEmpty)
                cur.rules += new Rule(key == "allow", value)
            case "crawl-delay" =>
              inUa = false
              if (cur != null && value.nonEmpty) {
                // strict double: digits with optional one dot — no
                // exponents/signs/locale surprises
                val ok = value.forall(ch =>
                  (ch >= '0' && ch <= '9') || ch == '.') &&
                  value.count(_ == '.') <= 1 && value.exists(_.isDigit)
                if (ok) {
                  val v = java.lang.Double.parseDouble(value)
                  if (cur.delay == null || v > cur.delay.doubleValue())
                    cur.delay = v
                }
              }
            case _ => inUa = false
          }
        }
      }
    }
    val applicable = groups.filter(_.score >= 0)
    if (applicable.isEmpty) return EmptyPolicy
    val best = applicable.map(_.score).max
    val win = applicable.filter(_.score == best)
    var delay: java.lang.Double = null
    win.foreach { g =>
      if (g.delay != null &&
        (delay == null || g.delay.doubleValue() > delay.doubleValue()))
        delay = g.delay
    }
    new Policy(win.flatMap(_.rules).toArray, delay)
  }

  /** Back-compat shim for the rule list alone. */
  def rulesFor(robots: String, agentLower: String): Array[Rule] =
    policyFor(robots, agentLower).rules

  /** Greedy wildcard match of `pattern` against `path` — prefix semantics
    * unless the pattern's FINAL `$` anchors it (then full-path). */
  def matches(path: String, pattern: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.last == '$'
    val p = if (anchored) pattern.substring(0, pattern.length - 1)
      else pattern + "*"
    // full match of p against path (classic single-backtrack wildcard)
    val n = path.length; val m = p.length
    var i = 0; var j = 0; var star = -1; var mark = 0
    while (i < n) {
      if (j < m && p(j) != '*' && p(j) == path(i)) { i += 1; j += 1 }
      else if (j < m && p(j) == '*') { star = j; j += 1; mark = i }
      else if (star >= 0) { j = star + 1; mark += 1; i = mark }
      else return false
    }
    while (j < m && p(j) == '*') j += 1
    j == m
  }

  def allowed(rules: Array[Rule], path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    var i = 0
    while (i < rules.length) {
      val r = rules(i)
      if (matches(path, r.pattern)) {
        val len = r.pattern.length
        if (len > bestLen || (len == bestLen && r.allow && !bestAllow)) {
          bestLen = len; bestAllow = r.allow
        }
      }
      i += 1
    }
    bestLen < 0 || bestAllow
  }

  /** Per-thread memo capacity (power of two; direct-mapped). 64 hosts
    * of interleaving before same-bucket eviction can occur at all. */
  private val MemoSlots = 64
  /** Robots texts above this size bypass the memo (bounds per-thread
    * retained memory at MemoSlots × 1 MiB worst case). */
  private val MemoMaxBytes = 1 << 20

  private final class Memo {
    val robotsK = new Array[UTF8String](MemoSlots)
    val agentK = new Array[UTF8String](MemoSlots)
    val rules = new Array[Policy](MemoSlots)
  }
  private val memo = new ThreadLocal[Memo] {
    override def initialValue(): Memo = new Memo
  }

  /** Memo misses (parses) — test observability for the re-parse bound. */
  val parseCount = new java.util.concurrent.atomic.AtomicLong

  /** Row entry point. The memo is a per-thread DIRECT-MAPPED cache of
    * [[MemoSlots]] parsed (robots, agent) entries keyed by byte hash, so
    * the interleaved-host shape a frontier join produces (host A, host B,
    * host A, …) still hits: each distinct pair occupies its own bucket
    * and a hit costs one hash + one byte-equality over the robots text —
    * no re-parse, no per-row String allocation. Unclustered input over
    * more than [[MemoSlots]] same-bucket hosts degrades to re-parsing
    * (sorting/clustering the frontier by host restores hits); texts over
    * [[MemoMaxBytes]] always re-parse (memory bound). Keys are cloned
    * out of Spark's reused row buffers before retention. */
  def eval(robots: UTF8String, agent: UTF8String, path: UTF8String): Boolean =
    allowed(memoPolicy(robots, agent).rules, path.toString)

  /** `Crawl-delay` for the winning group(s), via the same memo. */
  def evalDelay(robots: UTF8String, agent: UTF8String): java.lang.Double =
    memoPolicy(robots, agent).crawlDelay

  private def memoPolicy(robots: UTF8String, agent: UTF8String): Policy = {
    if (robots.numBytes > MemoMaxBytes) {
      parseCount.incrementAndGet()
      return policyFor(robots.toString, lower(agent.toString))
    }
    val m = memo.get()
    val h = (robots.hashCode * 31 + agent.hashCode) & (MemoSlots - 1)
    val kr = m.robotsK(h)
    if (kr != null && kr.equals(robots) && m.agentK(h).equals(agent))
      m.rules(h)
    else {
      parseCount.incrementAndGet()
      val parsed = policyFor(robots.toString, lower(agent.toString))
      m.robotsK(h) = robots.clone()
      m.agentK(h) = agent.clone()
      m.rules(h) = parsed
      parsed
    }
  }
}

/** `graft_robots_allowed(robots, agent, path) -> boolean` — see
  * [[RobotsKernel]]. */
case class GraftRobotsAllowed(robotsE: Expression, agentE: Expression,
    pathE: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(robotsE, agentE, pathE)
  override def nullable: Boolean = true
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_robots_allowed"
  override def checkInputDataTypes(): TypeCheckResult =
    (robotsE.dataType, agentE.dataType, pathE.dataType) match {
      case (StringType, StringType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_robots_allowed expects (string, string, string)")
    }

  override def eval(input: InternalRow): Any = {
    val r = robotsE.eval(input)
    val a = agentE.eval(input)
    val p = pathE.eval(input)
    if (r == null || a == null || p == null) null
    else RobotsKernel.eval(r.asInstanceOf[UTF8String],
      a.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gens = children.map(_.genCode(ctx))
    ev.copy(code = code"""
        ${gens.map(_.code.toString).mkString("\n")}
        boolean ${ev.isNull} =
          ${gens.map(_.isNull.toString).mkString(" || ")};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = graft.expressions.RobotsKernel.eval(
            ${gens(0).value}, ${gens(1).value}, ${gens(2).value});
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GraftRobotsAllowed =
    GraftRobotsAllowed(newChildren(0), newChildren(1), newChildren(2))
}

/** `graft_robots_delay(robots, agent) -> double` — the winning group's
  * `Crawl-delay` in seconds (max across combined groups; null when
  * absent/invalid — see [[RobotsKernel.policyFor]]). The per-host
  * politeness signal a frontier scheduler partitions fetches by; shares
  * [[RobotsKernel]]'s per-thread memo with the allow/deny filter, so a
  * frontier computing both pays ONE parse per (robots, agent). */
case class GraftRobotsDelay(robotsE: Expression, agentE: Expression)
  extends Expression {
  override def children: Seq[Expression] = Seq(robotsE, agentE)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_robots_delay"
  override def checkInputDataTypes(): TypeCheckResult =
    (robotsE.dataType, agentE.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_robots_delay expects (string, string)")
    }

  override def eval(input: InternalRow): Any = {
    val r = robotsE.eval(input)
    val a = agentE.eval(input)
    if (r == null || a == null) null
    else {
      val d = RobotsKernel.evalDelay(r.asInstanceOf[UTF8String],
        a.asInstanceOf[UTF8String])
      if (d == null) null else d.doubleValue()
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gens = children.map(_.genCode(ctx))
    val tmp = ctx.freshName("delay")
    ev.copy(code = code"""
        ${gens.map(_.code.toString).mkString("\n")}
        boolean ${ev.isNull} =
          ${gens.map(_.isNull.toString).mkString(" || ")};
        double ${ev.value} = 0.0;
        if (!${ev.isNull}) {
          java.lang.Double $tmp = graft.expressions.RobotsKernel.evalDelay(
            ${gens(0).value}, ${gens(1).value});
          if ($tmp == null) { ${ev.isNull} = true; }
          else { ${ev.value} = $tmp.doubleValue(); }
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GraftRobotsDelay =
    GraftRobotsDelay(newChildren(0), newChildren(1))
}

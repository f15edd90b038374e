package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pass PII scan/redact kernels — the [[GraftNormalizeText]]
  * treatment applied to [[graft.operators.Pii]]'s three patterns
  * (email, TPC-H phone, dotted-quad IPv4). The regex chain paid three
  * `java.util.regex` matchers (with per-position retry on every `@`-less
  * local-part prefix) plus String materializations per row; these
  * scanners touch each byte O(1) times and allocate only when a match
  * actually exists.
  *
  * EXACTNESS — equal to the Java patterns for EVERY input, not just
  * ASCII, by case analysis (so unlike the normalize kernel there is no
  * slow-path fallback):
  *  - all three patterns are ASCII-only character classes, so no match
  *    ever contains a byte ≥ 0x80;
  *  - `\b` in java.util.regex is UNICODE-aware even under default flags
  *    (the documented `\b`/`\w` asymmetry: `é1` has no boundary between
  *    the letters although `\w` would not match `é`). Pattern.Bound's
  *    exact default rule — verified here by sweeping `\b1` over the
  *    full Unicode range in several contexts — is `_` ∪
  *    `isLetterOrDigit`, plus a CONTEXTUAL case: a non-spacing mark is
  *    word iff a letter-or-digit base is reachable backward over marks
  *    (by `charAt`, so a surrogate pair ends that scan as non-base).
  *    The boundary tests decode the adjacent UTF-8 code point(s) and
  *    replicate exactly that; malformed bytes decode to U+FFFD on the
  *    String side, which is non-word — matching the kernel's
  *    treat-as-non-word fallback;
  *  - the email pattern `L+@D+\.[A-Za-z]{2,}` backtracks only in the
  *    domain: `@` ∉ L fixes the local part as the maximal L-run ending
  *    at the `@` (clamped at the previous match end — `replaceAll`
  *    semantics), and `.` ∈ D means the greedy `D+` retreat lands on
  *    the RIGHTMOST dot inside the maximal D-run that is immediately
  *    followed by ≥ 2 letters (the match ends where those letters do);
  *  - phone is fixed-shape (15 bytes, digit/dash positions, `\b` both
  *    ends — checked against the input bytes even when the previous
  *    match abuts, exactly as a Matcher does);
  *  - ipv4's `([0-9]{1,3}\.){3}[0-9]{1,3}` is deterministic despite the
  *    greedy `{1,3}`: a digit run of length > 3 fails its group outright
  *    (shorter prefixes leave a digit where the `.` must be), so each
  *    group is "full run ≤ 3 then a literal dot", and the final octet is
  *    "full run ≤ 3 then a non-word byte".
  *
  * The ExpressionsSpec differential fuzz pins all four entry points to
  * the literal `java.util.regex` chain on adversarial inputs (emails
  * with trailing digit-dotted domains, phones inside emails, octet
  * runs of every length, multi-byte neighbors); q61/q69's DuckDB
  * oracles pin the same semantics cross-engine.
  */
object PiiKernel {
  // the three pattern texts, single-sourced for oracles and fallbacks
  val EmailRe = "[A-Za-z0-9._%+#-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
  val Ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  private def isDigit(c: Byte): Boolean = c >= '0' && c <= '9'
  private def isAlpha(c: Byte): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')

  /** java.util.regex's default-mode `\b` word test for a single code
    * point, CONTEXT-FREE part: `_` or `Character.isLetterOrDigit`
    * (Pattern.Bound's `isWord` without UNICODE_CHARACTER_CLASS).
    * Non-spacing marks are contextual — see [[hasBase]]. Empirically
    * verified against `Pattern.compile("\\b1")` over the full Unicode
    * range in multiple contexts (r12). */
  private def isWordCp(cp: Int): Boolean =
    if (cp < 0) false // malformed byte sequence: non-word (= U+FFFD)
    else cp == '_' || Character.isLetterOrDigit(cp)

  /** Pattern.Bound treats a NON_SPACING_MARK as word iff scanning
    * BACKWARD over marks reaches a letter-or-digit base — and it scans
    * by `charAt`, so any supplementary character (surrogate pair) ends
    * the scan as non-base. `p` is the byte index where the mark's own
    * sequence starts; we walk preceding code points. */
  private def hasBase(b: Array[Byte], pos: Int): Boolean = {
    var p = pos
    while (p > 0) {
      var s = p - 1
      while (s > 0 && (b(s) & 0xC0) == 0x80) s -= 1
      val cp = cpEnding(b, s, p)
      if (cp < 0 || cp > 0xFFFF) return false // malformed or charAt quirk
      if (Character.isLetterOrDigit(cp)) return true
      if (Character.getType(cp) != Character.NON_SPACING_MARK) return false
      p = s
    }
    false
  }

  /** The boundary word test for a decoded code point whose UTF-8
    * sequence starts at `cpStart`. */
  private def boundWord(b: Array[Byte], cp: Int, cpStart: Int): Boolean =
    if (cp < 0) false
    else if (isWordCp(cp)) true
    else if (cp <= 0xFFFF &&
      Character.getType(cp) == Character.NON_SPACING_MARK)
      hasBase(b, cpStart)
    else false

  /** Decode the UTF-8 code point STARTING at `j` (bounded by `n`);
    * -1 on malformed. */
  private def cpAt(b: Array[Byte], n: Int, j: Int): Int = {
    val c0 = b(j) & 0xff
    if (c0 < 0x80) c0
    else if (c0 < 0xC2) -1 // continuation or overlong lead
    else {
      val len =
        if (c0 < 0xE0) 2 else if (c0 < 0xF0) 3 else if (c0 < 0xF5) 4 else -1
      if (len < 0 || j + len > n) -1
      else {
        var cp = c0 & (0x7f >> len)
        var k = 1
        var ok = true
        while (ok && k < len) {
          val cc = b(j + k) & 0xff
          ok = (cc & 0xC0) == 0x80
          cp = (cp << 6) | (cc & 0x3f)
          k += 1
        }
        if (ok) cp else -1
      }
    }
  }

  /** Decode the code point starting at `s` REQUIRING its sequence to end
    * exactly at `end` (else the String side sees U+FFFD there): -1 if
    * malformed or mis-sized. */
  private def cpEnding(b: Array[Byte], s: Int, end: Int): Int = {
    val cp = cpAt(b, end, s)
    if (cp < 0) -1
    else {
      val c0 = b(s) & 0xff
      val len = if (c0 < 0x80) 1 else if (c0 < 0xE0) 2
        else if (c0 < 0xF0) 3 else 4
      if (s + len == end) cp else -1
    }
  }

  /** Is the character whose LAST byte is at `i - 1` a word character for
    * `\b` purposes? */
  private def isWordBefore(b: Array[Byte], i: Int): Boolean = {
    val c = b(i - 1)
    if (c >= 0) isWordCp(c)
    else {
      var s = i - 1
      while (s > 0 && (b(s) & 0xC0) == 0x80) s -= 1
      boundWord(b, cpEnding(b, s, i), s)
    }
  }

  /** Is the character STARTING at `j` a word character for `\b`? */
  private def isWordAt(b: Array[Byte], n: Int, j: Int): Boolean = {
    val c = b(j)
    if (c >= 0) isWordCp(c) else boundWord(b, cpAt(b, n, j), j)
  }
  /** email local-part class `[A-Za-z0-9._%+#-]` */
  private def isL(c: Byte): Boolean =
    isAlpha(c) || isDigit(c) || c == '.' || c == '_' || c == '%' ||
      c == '+' || c == '#' || c == '-'
  /** email domain class `[A-Za-z0-9.-]` */
  private def isD(c: Byte): Boolean =
    isAlpha(c) || isDigit(c) || c == '.' || c == '-'

  /** Next email match at or after `from`: `(start << 32) | end`, -1 if
    * none. `from` clamps the local part (a previous match is consumed). */
  def findEmail(b: Array[Byte], n: Int, from: Int): Long = {
    var i = from
    while (i < n) {
      if (b(i) == '@') {
        var ls = i
        while (ls > from && isL(b(ls - 1))) ls -= 1
        if (ls < i) {
          val ds = i + 1
          var de = ds
          while (de < n && isD(b(de))) de += 1
          // rightmost '.' in the D-run immediately followed by >=2
          // letters — and with at least one D char before it (`D+` is
          // non-empty, so a dot at the run start cannot be the TLD dot)
          var p = de - 1
          while (p >= ds + 1) {
            if (b(p) == '.') {
              var q = p + 1
              while (q < de && isAlpha(b(q))) q += 1
              if (q - p - 1 >= 2) return (ls.toLong << 32) | q
            }
            p -= 1
          }
        }
      }
      i += 1
    }
    -1L
  }

  /** Next phone match (fixed 15-byte shape, word-bounded). */
  def findPhone(b: Array[Byte], n: Int, from: Int): Long = {
    var i = from
    while (i + 15 <= n) {
      if (isDigit(b(i)) && (i == 0 || !isWordBefore(b, i)) &&
          isDigit(b(i + 1)) && b(i + 2) == '-' &&
          isDigit(b(i + 3)) && isDigit(b(i + 4)) && isDigit(b(i + 5)) &&
          b(i + 6) == '-' &&
          isDigit(b(i + 7)) && isDigit(b(i + 8)) && isDigit(b(i + 9)) &&
          b(i + 10) == '-' &&
          isDigit(b(i + 11)) && isDigit(b(i + 12)) && isDigit(b(i + 13)) &&
          isDigit(b(i + 14)) &&
          (i + 15 == n || !isWordAt(b, n, i + 15)))
        return (i.toLong << 32) | (i + 15)
      i += 1
    }
    -1L
  }

  /** Next ipv4 match (four full digit runs of 1-3, dot-separated,
    * word-bounded both ends). */
  def findIpv4(b: Array[Byte], n: Int, from: Int): Long = {
    var i = from
    while (i < n) {
      if (isDigit(b(i)) && (i == 0 || !isWordBefore(b, i))) {
        var j = i
        var ok = true
        var g = 0
        while (ok && g < 3) {
          var r = 0
          while (j < n && isDigit(b(j)) && r <= 3) { j += 1; r += 1 }
          ok = r >= 1 && r <= 3 && j < n && b(j) == '.'
          if (ok) j += 1
          g += 1
        }
        if (ok) {
          var r = 0
          while (j < n && isDigit(b(j)) && r <= 3) { j += 1; r += 1 }
          if (r >= 1 && r <= 3 && (j == n || !isWordAt(b, n, j)))
            return (i.toLong << 32) | j
        }
      }
      i += 1
    }
    -1L
  }

  type Finder = (Array[Byte], Int, Int) => Long

  private def countWith(u: UTF8String, f: Finder): Long = {
    val b = u.getBytes; val n = u.numBytes()
    var c = 0L
    var from = 0
    var m = f(b, n, from)
    while (m >= 0) {
      c += 1
      from = m.toInt
      m = f(b, n, from)
    }
    c
  }

  def countEmail(u: UTF8String): Long = countWith(u, findEmail)
  def countPhone(u: UTF8String): Long = countWith(u, findPhone)
  def countIpv4(u: UTF8String): Long = countWith(u, findIpv4)
  /** The composite total the curation report filters on — all three
    * counted INDEPENDENTLY on the input (the `Pii.scan` contract), not
    * sequentially like redaction. */
  def countTotal(u: UTF8String): Long =
    countEmail(u) + countPhone(u) + countIpv4(u)

  private val EmailTok = "<EMAIL>".getBytes("US-ASCII")
  private val PhoneTok = "<PHONE>".getBytes("US-ASCII")
  private val IpTok = "<IP>".getBytes("US-ASCII")

  /** One `replaceAll` pass; returns the input object untouched when
    * nothing matches (zero allocation on the common clean row). */
  private def replacePass(u: UTF8String, f: Finder,
      tok: Array[Byte]): UTF8String = {
    val b = u.getBytes; val n = u.numBytes()
    var m = f(b, n, 0)
    if (m < 0) return u
    val bos = new java.io.ByteArrayOutputStream(n + 16)
    var from = 0
    while (m >= 0) {
      val s = (m >>> 32).toInt; val e = m.toInt
      bos.write(b, from, s - from)
      bos.write(tok, 0, tok.length)
      from = e
      m = f(b, n, from)
    }
    bos.write(b, from, n - from)
    UTF8String.fromBytes(bos.toByteArray)
  }

  /** The full redaction chain: email → phone → ipv4, each pass on the
    * PREVIOUS pass's output (sequence matters: a phone-shaped local part
    * is consumed by the email pass; an ipv4 abutting a replaced span can
    * gain a boundary — both exactly as three `regexp_replace` calls). */
  def redact(u: UTF8String): UTF8String = {
    val a = replacePass(u, findEmail, EmailTok)
    val b = replacePass(a, findPhone, PhoneTok)
    replacePass(b, findIpv4, IpTok)
  }
}

/** `graft_pii_count(string, 'email'|'phone'|'ipv4'|'total') -> bigint` —
  * non-overlapping match count of one PII category (or the independent
  * three-way sum), byte-exact to `regexp_count` with the
  * [[graft.operators.Pii]] patterns. */
case class GraftPiiCount(child: Expression, category: String)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType =>
      if (GraftPiiCount.Cats.contains(category)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_pii_count: unknown category '$category' " +
          s"(expected one of ${GraftPiiCount.Cats.mkString(", ")})")
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pii_count expects string, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_pii_count"

  override protected def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[UTF8String])

  def count(u: UTF8String): Long = category match {
    case "email" => PiiKernel.countEmail(u)
    case "phone" => PiiKernel.countPhone(u)
    case "ipv4" => PiiKernel.countIpv4(u)
    case "total" => PiiKernel.countTotal(u)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftPiiCount", this,
      classOf[GraftPiiCount].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.count($s);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): GraftPiiCount = copy(child = newChild)
}

object GraftPiiCount {
  val Cats: Set[String] = Set("email", "phone", "ipv4", "total")
}

/** `graft_pii_redact(string) -> string` — the email → phone → ipv4
  * sequential redaction chain as byte-pass scans, byte-exact to the
  * three-`regexp_replace` stack. */
case class GraftPiiRedact(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pii_redact expects string, got ${t.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_pii_redact"

  override protected def nullSafeEval(input: Any): Any =
    PiiKernel.redact(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expressions.PiiKernel.redact($s);")

  override protected def withNewChildInternal(
      newChild: Expression): GraftPiiRedact = copy(child = newChild)
}

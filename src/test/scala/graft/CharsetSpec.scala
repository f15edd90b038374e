package graft

import java.nio.charset.{CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.functions._

import graft.expressions.CharsetKernel

/** Charset-repair kernel ([[CharsetKernel]]): the UTF-8 validator is
  * differential-fuzzed against the JDK `CharsetDecoder` in REPORT mode
  * (the independent strict reference — rejects overlongs, surrogates,
  * truncations); the windows-1252 fallback is fuzzed against the JDK's
  * own windows-1252 decoder byte-for-byte; RFC 3629 boundary bytes are
  * pinned by hand. */
class CharsetSpec extends SparkSpec {
  import spark.implicits._

  private def jdkValid(b: Array[Byte]): Boolean = {
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try { dec.decode(java.nio.ByteBuffer.wrap(b)); true }
    catch { case _: java.nio.charset.CharacterCodingException => false }
  }

  test("UTF-8 validity: RFC 3629 boundaries pinned by hand") {
    def v(hex: String): Boolean =
      CharsetKernel.validUtf8(hex.grouped(2)
        .map(Integer.parseInt(_, 16).toByte).toArray)
    assert(v(""))
    assert(v("7F") && v("C280") && v("DFBF"))          // 1/2-byte edges
    assert(v("E0A080") && v("EFBFBF"))                 // 3-byte edges
    assert(v("F0908080") && v("F48FBFBF"))             // 4-byte edges
    assert(!v("80") && !v("BF"))                       // bare continuation
    assert(!v("C0AF") && !v("C1BF"))                   // overlong 2-byte
    assert(!v("E08080") && !v("E09FBF"))               // overlong 3-byte
    assert(!v("EDA080") && !v("EDBFBF"))               // surrogates
    assert(!v("F0808080") && !v("F08FBFBF"))           // overlong 4-byte
    assert(!v("F4908080") && !v("F5808080") && !v("FF")) // > U+10FFFF
    assert(!v("C3") && !v("E0A0") && !v("F090"))       // truncated
  }

  test("fuzz: validator == JDK REPORT decoder; fallback == JDK cp1252") {
    val rnd = new scala.util.Random(0x1252)
    for (_ <- 0 until 3000) {
      val n = rnd.nextInt(24)
      val b = new Array[Byte](n)
      // mix pure-random bytes with nearly-valid UTF-8 (mutate one byte)
      if (rnd.nextBoolean()) rnd.nextBytes(b)
      else {
        val s = Seq.fill(8)(rnd.nextInt(0x2500)).map(cp =>
          new String(Character.toChars(cp))).mkString
        val u = s.getBytes(StandardCharsets.UTF_8)
        System.arraycopy(u, 0, b, 0, math.min(n, u.length))
        if (n > 0 && rnd.nextInt(3) == 0)
          b(rnd.nextInt(n)) = rnd.nextInt(256).toByte
      }
      assert(CharsetKernel.validUtf8(b) === jdkValid(b),
        s"validity mismatch on ${b.map("%02X".format(_)).mkString}")
      if (!CharsetKernel.validUtf8(b)) {
        val got = CharsetKernel.fix(b).toString
        // per-byte JDK cp1252, EXCEPT the five positions the WHATWG index
        // defines as C1 controls where the JDK emits U+FFFD — the kernel
        // follows WHATWG (the HTML5 rule a crawl pipeline wants)
        val cp1252 = java.nio.charset.Charset.forName("windows-1252")
        val want = b.map { x =>
          val c = x & 0xff
          if (c == 0x81 || c == 0x8d || c == 0x8f || c == 0x90 || c == 0x9d)
            c.toChar
          else new String(Array(x), cp1252).charAt(0)
        }.mkString
        assert(got === want,
          s"cp1252 mismatch on ${b.map("%02X".format(_)).mkString}")
      } else {
        assert(CharsetKernel.fix(b).toString ===
          new String(b, StandardCharsets.UTF_8))
      }
    }
  }

  test("guess: ascii / utf-8 / windows-1252 triple") {
    def g(b: Array[Byte]) = CharsetKernel.guess(b).toString
    assert(g("plain".getBytes) === "ascii")
    assert(g(Array.emptyByteArray) === "ascii")
    assert(g("héllo".getBytes(StandardCharsets.UTF_8)) === "utf-8")
    assert(g(Array('h'.toByte, 0xe9.toByte)) === "windows-1252")
  }

  test("SQL surface: the HTML5 fallback chain on mixed payloads") {
    val latin1 = Array[Byte]('c', 'a', 'f', 0xe9.toByte)
    val utf8 = "café".getBytes(StandardCharsets.UTF_8)
    val df = Seq((1L, latin1), (2L, utf8),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("id", "p")
    df.createOrReplaceTempView("charset_fixture")
    val r = spark.sql(
      """SELECT id, graft_charset_guess(p) AS cs, graft_charset_fix(p) AS t
        |FROM charset_fixture ORDER BY id""".stripMargin).collect()
    assert(r(0).getString(1) === "windows-1252" && r(0).getString(2) === "café")
    assert(r(1).getString(1) === "utf-8" && r(1).getString(2) === "café")
    assert(r(2).isNullAt(1) && r(2).isNullAt(2))
  }
}

package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Round-18 operators: isotonic calibration, WAV PCM kernels. */
class Round18OpsSpec extends SparkSpec {
  import spark.implicits._

  test("WAV PCM kernels fuzz: synth -> stats/decimate == clean-room " +
      "reference over random (n, a, b, k)") {
    val rnd = new scala.util.Random(71)
    for (_ <- 1 to 8) {
      val n = 5 + rnd.nextInt(400)
      val a = rnd.nextInt(1 << 12).toLong
      val b = rnd.nextInt(1 << 12).toLong
      val k = 2 + rnd.nextInt(5)
      val want = (0 until n).map(i => (((i * a + b) % 65536L) - 32768L).toInt)
      def statsRef(v: Seq[Int]) = (v.size.toLong,
        v.map(x => math.abs(x.toLong)).max,
        v.map(x => math.abs(x.toLong)).sum,
        v.map(x => x.toLong * x).sum,
        v.zip(v.tail).count { case (p, c) => (p < 0) != (c < 0) }.toLong)
      val dRef = (0 until n / k).map(j =>
        (want.slice(j * k, j * k + k).map(_.toLong).sum / k).toInt)
      val row = spark.sql(
        s"""SELECT graft_wav_pcm_stats(w) AS st,
           |  graft_wav_pcm_stats(graft_wav_decimate(w, ${k}L)) AS dst,
           |  graft_audio_meta(w) AS meta,
           |  graft_audio_meta(graft_wav_decimate(w, ${k}L)) AS dmeta
           |FROM (SELECT graft_synth_wav(${n}L, 8000L, ${a}L, ${b}L) AS w)"""
          .stripMargin).collect()(0)
      val st = row.getAs[Row]("st")
      val (en, ep, esa, esq, ezc) = statsRef(want)
      assert((st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3),
        st.getLong(4)) === ((en, ep, esa, esq, ezc)), s"stats n=$n a=$a b=$b")
      val dst = row.getAs[Row]("dst")
      val (dn, dp, dsa, dsq, dzc) = statsRef(dRef)
      assert((dst.getLong(0), dst.getLong(1), dst.getLong(2), dst.getLong(3),
        dst.getLong(4)) === ((dn, dp, dsa, dsq, dzc)),
        s"decimated stats n=$n a=$a b=$b k=$k")
      // the container re-enters the metadata layer: mono, 16-bit, the
      // decimated container's rate field divides down
      val meta = row.getAs[Row]("meta")
      assert(meta.getInt(0) === 1 && meta.getInt(1) === 8000 &&
        meta.getInt(2) === 16)
      val dmeta = row.getAs[Row]("dmeta")
      assert(dmeta.getInt(0) === 1 && dmeta.getInt(1) === 8000 / k &&
        dmeta.getInt(2) === 16, s"decimated rate k=$k")
    }
  }

  test("WAV PCM codegen: two non-nullable stats in one projection " +
      "(unbraced nullSafeCodeGen snippets must not collide)") {
    val r = spark.sql(
      """SELECT graft_wav_pcm_stats(graft_synth_wav(10L, 8000L, 3L, 1L))
        |    AS a,
        |  graft_wav_pcm_stats(graft_synth_wav(20L, 8000L, 5L, 2L)) AS b,
        |  graft_ppm_phash(graft_synth_ppm(9L, 9L, 1L, 2L)) AS c,
        |  graft_ppm_phash(graft_synth_ppm(10L, 10L, 2L, 3L)) AS d"""
        .stripMargin).collect()(0)
    assert(r.getAs[Row]("a").getLong(0) === 10L)
    assert(r.getAs[Row]("b").getLong(0) === 20L)
    assert(r.getAs[Row]("c").getInt(0) === 9)
    assert(r.getAs[Row]("d").getInt(0) === 10)
  }

  test("WAV PCM kernels: malformed, non-PCM16, stereo, and undersized " +
      "payloads are NULL, never garbage") {
    val rows = spark.sql(
      """SELECT
        |  graft_wav_pcm_stats(CAST('notawav' AS BINARY)) AS bad,
        |  graft_wav_decimate(CAST('RIFF' AS BINARY), 2L) AS short,
        |  graft_wav_decimate(graft_synth_wav(10L, 8000L, 3L, 1L), 11L)
        |    AS k_too_big,
        |  graft_wav_decimate(graft_synth_wav(10L, 8000L, 3L, 1L), 0L)
        |    AS k_zero
        |FROM (SELECT 1)""".stripMargin).collect()(0)
    assert(rows.isNullAt(0) && rows.isNullAt(1) && rows.isNullAt(2) &&
      rows.isNullAt(3))
    // a stereo container (channels field patched to 2) still yields
    // stream stats but refuses the mono-only decimate
    val wav = spark.sql("SELECT graft_synth_wav(10L, 8000L, 3L, 1L) AS w")
      .collect()(0).getAs[Array[Byte]](0)
    wav(22) = 2
    val df2 = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(wav)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("w",
          org.apache.spark.sql.types.BinaryType))))
    val r2 = df2.selectExpr("graft_wav_pcm_stats(w) AS st",
      "graft_wav_decimate(w, 2L) AS d").collect()(0)
    assert(!r2.isNullAt(0), "stream stats decode any channel count")
    assert(r2.isNullAt(1), "decimate is mono-only")
    // a non-PCM format tag (ADPCM = 2) with bits=16 must NOT decode: the
    // payload bytes are compressed, not samples — but metadata still
    // reports the container
    val wav3 = spark.sql("SELECT graft_synth_wav(10L, 8000L, 3L, 1L) AS w")
      .collect()(0).getAs[Array[Byte]](0)
    wav3(20) = 2
    val df3 = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(wav3)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("w",
          org.apache.spark.sql.types.BinaryType))))
    val r3 = df3.selectExpr("graft_wav_pcm_stats(w) AS st",
      "graft_wav_decimate(w, 2L) AS d",
      "graft_audio_meta(w) AS m").collect()(0)
    assert(r3.isNullAt(0) && r3.isNullAt(1), "non-PCM payloads never decode")
    assert(!r3.isNullAt(2), "metadata reports any format")
  }

  test("graft_canon_url: case, default ports, fragments, tracking " +
      "params, trailing slashes — and the things it must NOT touch") {
    import graft.expressions.UrlCanon.canon
    assert(canon("HTTP://Ex.COM:80/A/b/?utm_source=x&a=1&ref=z#frag")
      === "http://ex.com/A/b?a=1")
    assert(canon("https://H.test:443/x") === "https://h.test/x")
    // non-default ports and non-http(s) schemes keep their port
    assert(canon("http://h.test:8080/x") === "http://h.test:8080/x")
    assert(canon("ftp://H.test:80/X") === "ftp://h.test:80/X")
    // path case and param ORDER are preserved; only tracking keys drop
    assert(canon("http://h.test/P?b=2&a=1&gclid=g&mc_cid=m")
      === "http://h.test/P?b=2&a=1")
    // all-tracking query drops the '?' entirely; root slash folds
    assert(canon("http://h.test/?utm_campaign=c") === "http://h.test")
    assert(canon(" http://a.b/c ") === "http://a.b/c")
    // userinfo is case-sensitive (RFC 3986): only the host lowercases
    assert(canon("http://User:Pw@Ex.COM:80/P") === "http://User:Pw@ex.com/P")
    assert(canon("http://user@/p") === null)
    assert(canon("no scheme here") === null)
    assert(canon("://host/x") === null)
    assert(canon("http:///path") === null)
    // an authority that is ONLY a default port strips to hostless → null
    assert(canon("http://:80/x") === null)
    // ALL trailing slashes fold — the output must be a fixed point
    assert(canon("http://h.test/a//") === "http://h.test/a")
    assert(canon(null) === null)
    // invalid port shapes are rejected, not half-stripped (a multi-port
    // authority must not yield a key whose own canon differs)
    assert(canon("http://h.test:80:80/x") === null)
    assert(canon("http://h.test:8o/x") === null)
    assert(canon("http://:8080/x") === null)
    // empty port folds; leading zeros carry no port semantics, so a
    // zero-padded default port strips and a padded non-default port
    // collapses to the unpadded key (":080" == ":80", ":08080" == ":8080")
    assert(canon("http://h.test:/x") === "http://h.test/x")
    assert(canon("http://h.test:080/x") === "http://h.test/x")
    assert(canon("http://h.test:08080/x") === "http://h.test:8080/x")
    // all-zeros port strips to empty and folds like the empty port
    assert(canon("http://h.test:000/x") === "http://h.test/x")
    assert(canon("ftp://h.test:080/x") === "ftp://h.test:80/x")
    // IPv6 brackets shield the colons; default port still strips
    assert(canon("http://[::1]:80/x") === "http://[::1]/x")
    assert(canon("http://[::1]:8080/x") === "http://[::1]:8080/x")
    assert(canon("http://[::1/x") === null)
    // percent normalization: unreserved octets decode (%41→A, %7e→~),
    // reserved ones keep their encoding with uppercase hex, malformed
    // and double-encoded sequences are preserved verbatim
    assert(canon("http://h.test/%7euser/%41%2fb")
      === "http://h.test/~user/A%2Fb")
    assert(canon("http://%48.TEST/x") === "http://h.test/x")
    assert(canon("http://h.test/a%g1") === "http://h.test/a%g1")
    assert(canon("http://h.test/%2541") === "http://h.test/%2541")
    assert(canon("http://h.test/p?a=%3d&utm_source=%41")
      === "http://h.test/p?a=%3D")
    // the expression path agrees with the function
    val r = spark.sql("""SELECT
      |graft_canon_url(' HTTPS://WWW.Ex.TEST:443/Page/?fbclid=f&q=1#top')
      |AS c""".stripMargin).collect()(0)
    assert(r.getString(0) === "https://www.ex.test/Page?q=1")
  }

  test("graft_canon_url IDN flag: punycode fold collapses U-label and " +
      "A-label keys; default key untouched; idempotent; IDNA rejects -> " +
      "null") {
    import graft.expressions.UrlCanon.canon
    val puny = "http://xn--bcher-kva.de/x"
    assert(canon("http://BÜCHER.de/x", idnHost = true) === puny)
    assert(canon(puny, idnHost = true) === puny, "A-label is a fixed point")
    assert(canon("http://bücher.de:080/x", idnHost = true) === puny,
      "composes with port folding")
    // the DEFAULT key is byte-stable: no Unicode table dependency
    assert(canon("http://BÜCHER.de/x") === "http://bücher.de/x")
    // IPv6 brackets skip the fold
    assert(canon("http://[::1]:8080/x", idnHost = true)
      === "http://[::1]:8080/x")
    // a hostname IDNA rejects (64-char label) is not a canonical key
    val longLabel = "http://" + ("ü" * 64) + ".de/x"
    assert(canon(longLabel, idnHost = true) === null)
    assert(canon(longLabel) != null, "default key keeps it")
    // idempotence under the flag on mixed hosts
    for (u <- Seq("http://日本語.jp/a/b/?utm_source=x&q=1#f",
      "HTTPS://CafÉ.FR:443/P", "http://mixed.ü.ascii.test/x")) {
      val c = canon(u, idnHost = true)
      assert(c != null && canon(c, idnHost = true) === c, s"not idempotent: $u -> $c")
      assert(c.forall(_ < 0x80), s"folded key must be pure ASCII: $c")
    }
    // the expression surface honors the flag argument
    val r = spark.sql("""SELECT
      |graft_canon_url('http://BÜCHER.de/x', true) AS a,
      |graft_canon_url('http://BÜCHER.de/x') AS b""".stripMargin).collect()(0)
    assert(r.getString(0) === puny)
    assert(r.getString(1) === "http://bücher.de/x")
  }

  test("graft_canon_url fuzz: idempotent on random messy URLs (a " +
      "canonical form must be its own canonical form)") {
    val rnd = new scala.util.Random(97)
    val schemes = Seq("http", "HTTP", "https", "ftp")
    val hosts = Seq("Ex.COM", "a.b.c", "x", "[::1]", "User:P@H.io",
      "h%4F.io", "BÜCHER.de", "日本.jp", "xn--bcher-kva.de")
    val ports = Seq("", ":80", ":443", ":8080", ":", ":080", ":000",
      ":08080")
    val paths = Seq("", "/", "/A/b", "/A/b/", "/A/b//", "//x",
      "/%41b", "/a%2f", "/%7e%2541", "/a%zz", "/p%3dq")
    val queries = Seq("", "?a=1", "?utm_source=s", "?b=2&utm_a=1&a=1",
      "?ref=r&gclid=g", "?&&a=1", "?k=%3d%41")
    val frags = Seq("", "#f", "#a?b=1")
    for (_ <- 1 to 200) {
      def pick[T](xs: Seq[T]) = xs(rnd.nextInt(xs.size))
      val u = s"${pick(schemes)}://${pick(hosts)}${pick(ports)}" +
        s"${pick(paths)}${pick(queries)}${pick(frags)}"
      val c = graft.expressions.UrlCanon.canon(u)
      assert(c != null, s"parseable shape must canon: $u")
      assert(graft.expressions.UrlCanon.canon(c) === c,
        s"not idempotent: $u -> $c -> ${graft.expressions.UrlCanon.canon(c)}")
      // the flagged IDN variant must be idempotent on the same shapes
      val ci = graft.expressions.UrlCanon.canon(u, idnHost = true)
      assert(ci != null, s"IDN canon must accept the same shapes: $u")
      assert(graft.expressions.UrlCanon.canon(ci, idnHost = true) === ci,
        s"IDN canon not idempotent: $u -> $ci")
    }
  }

  test("isotonicCalibration fuzz: minimax lattice == in-memory PAV over " +
      "random score/label draws, every bin count") {
    for (seed <- Seq(7, 31, 55); bins <- Seq(1, 5, 12)) {
      val rnd = new scala.util.Random(seed)
      val rows = Seq.fill(300 + rnd.nextInt(300)) {
        val s = rnd.nextInt(61).toLong
        // label rate rises with score but noisily — adjacent-violator
        // pools are guaranteed, monotone-already stretches too
        (s, rnd.nextInt(100) < (20 + s))
      }
      val lo = rows.map(_._1).min
      val hi = rows.map(_._1).max
      val rollup = rows.groupBy(r => (r._1 - lo) * bins / (hi - lo + 1))
        .map { case (b, rs) => (b, rs.size.toLong, rs.count(_._2).toLong) }
        .toSeq.sortBy(_._1)
      // classic PAV: pool while the previous block's mean >= the
      // current's (equal-mean pooling leaves the fit unchanged)
      case class Blk(bs: Vector[Long], w: Long, p: Long)
      var st = Vector.empty[Blk]
      for ((b, n, p) <- rollup) {
        var cur = Blk(Vector(b), n, p)
        while (st.nonEmpty && st.last.p * cur.w >= cur.p * st.last.w) {
          val t = st.last; st = st.init
          cur = Blk(t.bs ++ cur.bs, t.w + cur.w, t.p + cur.p)
        }
        st :+= cur
      }
      val want = st.flatMap(blk =>
        blk.bs.map(b => b -> blk.p.toDouble / blk.w)).toMap
      val got = graft.core.Stats.isotonicCalibration(
          rows.toDF("s", "y"), col("s"), col("y"), bins)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(4)))
        .toMap
      assert(got.keySet === want.keySet, s"seed $seed bins $bins bin set")
      for ((b, n, p) <- rollup) {
        assert(got(b)._1 == n && got(b)._2 == p, s"seed $seed bins $bins " +
          s"bin $b counts ${got(b)} vs ($n, $p)")
        assert(math.abs(got(b)._3 - want(b)) <= 1e-12,
          s"seed $seed bins $bins bin $b fitted ${got(b)._3} vs ${want(b)}")
      }
      // the defining property, independent of the reference
      val fitted = got.toSeq.sortBy(_._1).map(_._2._3)
      assert(fitted.zip(fitted.tail).forall { case (a, c) => a <= c },
        s"seed $seed bins $bins not monotone: $fitted")
    }
  }

  test("isotonicCalibration excludes null scores; null label conditions " +
      "count as negative") {
    val df = Seq((Option(10L), Option("en")), (None, Option("en")),
        (Option(20L), None), (Option(30L), Option("fr")),
        (Option(40L), Option("en")))
      .toDF("s", "lang")
    val out = graft.core.Stats.isotonicCalibration(df, col("s"),
      col("lang") === "en", bins = 2).collect()
    // the null score never lands in a bin; the null lang row is a 0
    assert(out.map(_.getLong(1)).sum == 4L)
    assert(out.map(_.getLong(2)).sum == 2L)
  }

  test("isotonicCalibration refuses a span*bins that overflows, and an " +
      "all-null score column") {
    val wide = Seq(Long.MinValue / 2, Long.MaxValue / 2).toDF("s")
    intercept[IllegalArgumentException] {
      graft.core.Stats.isotonicCalibration(wide, col("s"), lit(true), 1000)
    }
    val empty = Seq(Option.empty[Long]).toDF("s")
    intercept[IllegalArgumentException] {
      graft.core.Stats.isotonicCalibration(empty, col("s"), lit(true))
    }
  }
}

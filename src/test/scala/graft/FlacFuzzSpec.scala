package graft

import graft.expressions.{FlacPcm, WavPcm}

/** Fuzz + clean-room differential for the zero-dependency FLAC decoder:
  *
  *  1. round-trip exactness — decode(synth) equals the generating
  *     formula for EVERY encoding mode (verbatim / fixed / LPC /
  *     per-frame cycle) and every stereo assignment, across frame-edge
  *     sample counts;
  *  2. a HAND-BUILT bit-level fixture — assembled in this test with an
  *     independent bit writer and independent table-driven CRCs,
  *     transcribed from the format spec separately from the encoder —
  *     pins the bit conventions (unary = zeros-then-one, Rice zigzag,
  *     two's-complement warmups, CRC-8/0x07, CRC-16/0x8005) so a
  *     shared encoder/decoder inversion cannot hide;
  *  3. the checksums are enforced — corrupting any region (header,
  *     residual bits, MD5) turns decode into NULL, never noise;
  *  4. malformed robustness — every truncation and a byte-flip sweep
  *     return NULL without throwing or hanging;
  *  5. the WAV routing — `graft_flac_to_wav` feeds the EXISTING
  *     `graft_wav_pcm_stats`/`graft_wav_decimate` kernels and agrees
  *     with the `graft_synth_wav` twin on every statistic.
  */
class FlacFuzzSpec extends SparkSpec {

  private def formula(i: Long, a: Long, b: Long): Int =
    (((i * a + b) % 65536L) - 32768L).toInt

  private def expected(n: Int, a: Long, b: Long, stereo: Boolean): Array[Short] =
    if (!stereo) Array.tabulate(n)(i => formula(i, a, b).toShort)
    else Array.tabulate(2 * n) { j =>
      if (j % 2 == 0) formula(j / 2, a, b).toShort
      else formula(j / 2, a + 3, b + 7).toShort
    }

  test("flac round trip: decode(synth) equals the sample formula for " +
      "every mode, across frame-boundary sample counts") {
    for (mode <- 0L to 7L;
         n <- Seq(1, 2, 5, 575, 576, 577, 1153, 2000);
         (a, b) <- Seq((251L, 13L), (7L, 4096L))) {
      val flac = FlacPcm.synth(n, 8000, a, b, mode)
      val d = FlacPcm.decode(flac)
      assert(d != null, s"decode failed n=$n mode=$mode a=$a")
      assert(d.rate === 8000)
      assert(d.channels === (if (mode >= 4) 2 else 1))
      assert(d.samples.toSeq === expected(n, a, b, mode >= 4).toSeq,
        s"sample mismatch n=$n mode=$mode a=$a b=$b")
    }
  }

  test("flac cycle-mode data-dependent paths: constant frames (flat " +
      "signal), wasted-bits frames (all-even), escaped partitions") {
    // a=0 → every frame flat → CONSTANT subframes
    val flat = FlacPcm.decode(FlacPcm.synth(2000, 8000, 0, 500, 3))
    assert(flat != null && flat.samples.forall(_ == formula(0, 0, 500)))
    // even a,b → every sample even → wasted-bits path on cycle frame 5
    val even = FlacPcm.decode(FlacPcm.synth(4000, 8000, 250L, 12L, 3))
    assert(even != null &&
      even.samples.toSeq === expected(4000, 250L, 12L, stereo = false).toSeq)
    // odd params → the escaped-partition path on cycle frame 5
    val esc = FlacPcm.decode(FlacPcm.synth(4000, 8000, 251L, 13L, 3))
    assert(esc != null &&
      esc.samples.toSeq === expected(4000, 251L, 13L, stereo = false).toSeq)
  }

  // ---- clean-room fixture ------------------------------------------------
  /** Independent MSB-first bit writer: bits accumulate as a string —
    * deliberately nothing like the encoder's int-accumulator Writer. */
  private final class Bits {
    private val sb = new StringBuilder
    def put(v: Long, n: Int): Bits = {
      var k = n - 1
      while (k >= 0) { sb.append(if (((v >> k) & 1L) == 1L) '1' else '0'); k -= 1 }
      this
    }
    def pad(): Bits = { while (sb.length % 8 != 0) sb.append('0'); this }
    def bytes: Array[Byte] = {
      pad()
      sb.toString.grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray
    }
  }

  /** Independent table-driven CRCs (the main code is bitwise). */
  private lazy val crc8Table: Array[Int] = Array.tabulate(256) { i =>
    var c = i
    for (_ <- 0 until 8) c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff
                             else (c << 1) & 0xff
    c
  }
  private lazy val crc16Table: Array[Int] = Array.tabulate(256) { i =>
    var c = i << 8
    for (_ <- 0 until 8) c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff
                             else (c << 1) & 0xffff
    c
  }
  private def tcrc8(b: Array[Byte]): Int =
    b.foldLeft(0)((c, x) => crc8Table(c ^ (x & 0xff)))
  private def tcrc16(b: Array[Byte]): Int =
    b.foldLeft(0)((c, x) => ((c << 8) & 0xffff) ^ crc16Table(((c >> 8) ^ (x & 0xff)) & 0xff))

  /** 4 samples [100, 102, 104, 106], one frame, FIXED order-1 subframe,
    * Rice k=1 — every field transcribed from the spec here, bit by bit. */
  private def handFixture(corruptHeader: Boolean = false,
      corruptBody: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    out.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO, last-block flag set, length 34
    val si = new Bits
    si.put(4, 16).put(4, 16)        // min/max block size
      .put(0, 24).put(0, 24)        // min/max frame size unknown
      .put(8000, 20)                // sample rate
      .put(0, 3)                    // channels − 1
      .put(15, 5)                   // bps − 1 = 15 → 16-bit
      .put(4, 36)                   // total samples
      .put(0, 64).put(0, 64)        // md5 zero → unchecked
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    out.write(si.bytes)
    // frame header: sync(14)=0x3ffe, reserved 0, fixed blocking 0,
    // bsCode 0110 (8-bit size−1 follows), srCode 0000 (STREAMINFO),
    // channels 0000 (mono), sample size 100 (16-bit), reserved 0,
    // frame number 0 (UTF-8 single byte), block size − 1 = 3
    val head = new Bits
    head.put(0x3ffe, 14).put(0, 1).put(0, 1)
      .put(6, 4).put(0, 4)
      .put(0, 4).put(4, 3).put(0, 1)
      .put(0, 8)
      .put(3, 8)
    val headBytes = head.bytes
    assert(headBytes.length == 6)
    val crc8v = tcrc8(headBytes)
    // subframe: pad 0, type 001001 (FIXED order 1), no wasted bits;
    // warmup 100 in 16 bits; residual: method 00 (4-bit Rice),
    // partition order 0000, parameter k=1 (0001); residuals all +2 →
    // zigzag u=4 → quotient 2 (two zeros + one), remainder bit 0
    val body = new Bits
    body.put(0, 1).put(9, 6).put(0, 1)
      .put(100, 16)
      .put(0, 2).put(0, 4).put(1, 4)
      .put(Integer.parseInt("0010", 2), 4) // residual +2
      .put(Integer.parseInt("0010", 2), 4)
      .put(Integer.parseInt("0010", 2), 4)
    val bodyBytes = body.bytes
    val frame = headBytes ++ Array(crc8v.toByte) ++ bodyBytes
    val crc16v = tcrc16(frame)
    out.write(frame)
    out.write((crc16v >> 8) & 0xff); out.write(crc16v & 0xff)
    val all = out.toByteArray
    if (corruptHeader) all(all.length - 12) = (all(all.length - 12) ^ 0x01).toByte
    if (corruptBody) all(all.length - 4) = (all(all.length - 4) ^ 0x40).toByte
    all
  }

  test("clean-room fixture: a hand-assembled fixed-order-1 frame decodes " +
      "to the spec'd samples") {
    val d = FlacPcm.decode(handFixture())
    assert(d != null, "hand fixture rejected")
    assert(d.rate === 8000 && d.channels === 1)
    assert(d.samples.toSeq === Seq[Short](100, 102, 104, 106))
  }

  test("multichannel (3ch independent): a hand-built constant-subframe " +
      "frame interleaves correctly beyond the synth's stereo ceiling") {
    // STREAMINFO: 3 channels; one frame, blocksize 4, chCode 2
    // (3 independent channels), three CONSTANT subframes 10 / −20 / 30
    val out = new java.io.ByteArrayOutputStream
    out.write("fLaC".getBytes("US-ASCII"))
    val si = new Bits
    si.put(4, 16).put(4, 16).put(0, 24).put(0, 24)
      .put(8000, 20).put(2, 3).put(15, 5).put(4, 36)
      .put(0, 64).put(0, 64)
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    out.write(si.bytes)
    val head = new Bits
    head.put(0x3ffe, 14).put(0, 1).put(0, 1)
      .put(6, 4).put(0, 4)   // 8-bit blocksize−1 follows; rate: STREAMINFO
      .put(2, 4).put(4, 3).put(0, 1) // 3ch independent, 16-bit, reserved
      .put(0, 8).put(3, 8)   // frame 0; blocksize−1 = 3
    val headBytes = head.bytes
    val crc8v = tcrc8(headBytes)
    val body = new Bits
    for (v <- Seq(10, -20, 30)) {
      body.put(0, 1).put(0, 6).put(0, 1) // pad, CONSTANT, no wasted bits
      body.put(v.toLong & 0xffff, 16)
    }
    val bodyBytes = body.bytes
    val frame = headBytes ++ Array(crc8v.toByte) ++ bodyBytes
    val crc16v = tcrc16(frame)
    out.write(frame)
    out.write((crc16v >> 8) & 0xff); out.write(crc16v & 0xff)
    val d = FlacPcm.decode(out.toByteArray)
    assert(d != null, "3-channel fixture rejected")
    assert(d.channels === 3)
    assert(d.samples.toSeq === Seq.fill(4)(Seq[Short](10, -20, 30)).flatten)
  }

  test("N-channel round trips (r12 ask #5): synthN 1..8 channels, " +
      "non-constant subframes cycling every kind, decode == formula") {
    // 3000 samples = 6 frames at SynthBlock=576: cycleKind 0..5 all run
    val n = 3000
    for (nc <- 1 to 8) {
      val f = FlacPcm.synthN(n, 16000, 251, 13, nc)
      val d = FlacPcm.decode(f)
      assert(d != null, s"synthN($nc ch) rejected by decode")
      assert(d.channels === nc && d.rate === 16000)
      assert(d.samples.length === n * nc)
      var i = 0
      while (i < n) {
        var c = 0
        while (c < nc) {
          val want = (((i.toLong * (251 + 3 * c) + 13 + 7 * c) % 65536L)
            - 32768L).toShort
          assert(d.samples(i * nc + c) === want,
            s"ch $c sample $i of $nc-channel stream")
          c += 1
        }
        i += 1
      }
      // metadata path agrees
      val m = FlacPcm.metaOnly(f)
      assert(m(0) === nc.toLong && m(1) === 16000L && m(2) === 16L)
      // integrity still enforced at every channel count: flip one frame
      // byte → CRC/MD5 refuse
      val g = f.clone()
      g(g.length - 9) = (g(g.length - 9) ^ 0x11).toByte
      assert(FlacPcm.decode(g) == null, s"corrupt $nc-ch stream accepted")
    }
    // channels=2 equals the stereo synth's mode-4 samples exactly (the
    // param convention is the same formula one step further)
    val a = FlacPcm.decode(FlacPcm.synthN(700, 8000, 251, 13, 2))
    val b = FlacPcm.decode(FlacPcm.synth(700, 8000, 251, 13, 4))
    assert(a != null && b != null)
    assert(a.samples.toSeq === b.samples.toSeq)
    // and the WAV interchange route carries >2 channels end to end:
    // flac_to_wav(5ch) → audio_meta reads the header the container wrote
    val r5 = spark.sql(
      "SELECT graft_audio_meta(graft_flac_to_wav(f)) AS m FROM " +
        "(SELECT graft_synth_flac_n(600L, 8000L, 251L, 13L, 5L) AS f)")
      .selectExpr("m.channels", "m.sample_rate", "m.duration_ms").head()
    assert((r5.getInt(0), r5.getInt(1), r5.getLong(2)) === ((5, 8000, 75L)))
  }

  test("checksums are enforced: header and body corruption → NULL") {
    assert(FlacPcm.decode(handFixture(corruptHeader = true)) == null)
    assert(FlacPcm.decode(handFixture(corruptBody = true)) == null)
    // MD5 enforcement: synth writes a real MD5 — corrupt one md5 byte
    val f = FlacPcm.synth(600, 8000, 251, 13, 1)
    assert(FlacPcm.decode(f) != null)
    val md5At = 8 + 18 // fLaC + block header(4) → STREAMINFO + 18
    f(md5At + 3) = (f(md5At + 3) ^ 0x55).toByte
    assert(FlacPcm.decode(f) == null, "MD5 mismatch must be NULL")
  }

  test("malformed robustness: every truncation and a byte-flip sweep " +
      "return NULL or the exact original, never throw") {
    val f = FlacPcm.synth(1153, 8000, 251, 13, 3)
    val good = FlacPcm.decode(f).samples.toSeq
    for (len <- 0 until f.length) {
      val d = FlacPcm.decode(java.util.Arrays.copyOf(f, len))
      assert(d == null, s"truncation at $len must be NULL")
    }
    for (i <- f.indices by 7) {
      val c = f.clone()
      c(i) = (c(i) ^ 0x10).toByte
      val d = FlacPcm.decode(c)  // CRC/MD5/structure: null, or untouched
      assert(d == null || d.samples.toSeq == good, s"flip at $i decoded to noise")
    }
    assert(FlacPcm.decode(Array[Byte]()) == null)
    assert(FlacPcm.decode("not a flac stream at all".getBytes) == null)
    assert(FlacPcm.decode(WavPcm.container(8000, Array[Short](1, 2, 3))) == null)
  }

  test("out-of-scope streams are NULL: a 24-bit STREAMINFO") {
    val f = FlacPcm.synth(600, 8000, 251, 13, 0)
    // bps−1 occupies STREAMINFO bits 103..107: MSB = byte 12 LSB, low
    // four bits = byte 13 high nibble. Patch 15 → 23 (24-bit) and fix
    // nothing else: the decoder must refuse on scope before any
    // checksum math can even disagree.
    val b12 = 8 + 12
    val b13 = 8 + 13
    f(b12) = ((f(b12) & ~0x01) | ((23 >> 4) & 1)).toByte
    f(b13) = ((f(b13) & 0x0f) | ((23 & 0xf) << 4)).toByte
    assert(FlacPcm.decode(f) == null)
  }

  test("metaOnly (graft_flac_meta) agrees with the full decode on valid " +
      "streams, reports header truth on frame-corrupt ones, and NULLs " +
      "on malformed metadata (ADVICE r12: metadata scans must not pay " +
      "full-decode cost)") {
    for (mode <- 0L to 7L) {
      val f = FlacPcm.synth(1000, 16000, 251, 13, mode)
      val d = FlacPcm.decode(f)
      val m = FlacPcm.metaOnly(f)
      assert(m != null && d != null)
      assert(m(0) === d.channels.toLong && m(1) === d.rate.toLong)
      assert(m(2) === 16L)
      assert(m(3) === 1000L * 1000L / 16000L)
      // corrupt a FRAME byte: decode NULLs (CRC), metaOnly still reads
      // the header — metadata means header truth
      val g = f.clone()
      g(g.length - 20) = (g(g.length - 20) ^ 0x55).toByte
      assert(FlacPcm.decode(g) == null)
      assert(FlacPcm.metaOnly(g) != null)
    }
    // malformed metadata chain is NULL in both
    val f = FlacPcm.synth(600, 8000, 251, 13, 0)
    for (cut <- Seq(3, 7, 20, 41)) {
      val t = java.util.Arrays.copyOf(f, cut)
      assert(FlacPcm.metaOnly(t) == null)
    }
    assert(FlacPcm.metaOnly(Array.fill[Byte](64)(9)) == null)
    assert(FlacPcm.metaOnly(null) == null)
    // the SQL surface: same struct shape as graft_audio_meta
    val r = spark.sql(
      "SELECT graft_flac_meta(graft_synth_flac(1000L, 16000L, 251L, 13L, 7L)) AS m")
      .selectExpr("m.channels", "m.sample_rate", "m.bits", "m.duration_ms")
      .head()
    assert((r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)) ===
      ((2, 16000, 16, 62L)))
  }

  test("graft_flac_to_wav routes through the existing WAV kernels and " +
      "agrees with the graft_synth_wav twin on every statistic") {
    val rows = spark.range(0, 24).selectExpr(
      "id",
      "graft_wav_pcm_stats(graft_flac_to_wav(graft_synth_flac(" +
        "64 + id * 7, 8000L, 251 + id * 37, id * 13, id % 4))) AS viaFlac",
      "graft_wav_pcm_stats(graft_synth_wav(" +
        "64 + id * 7, 8000L, 251 + id * 37, id * 13)) AS viaWav",
      "graft_wav_pcm_stats(graft_wav_decimate(graft_flac_to_wav(" +
        "graft_synth_flac(64 + id * 7, 8000L, 251 + id * 37, id * 13, " +
        "id % 4)), 4L)) AS dec",
      "graft_audio_meta(graft_flac_to_wav(graft_synth_flac(" +
        "64 + id * 7, 8000L, 251 + id * 37, id * 13, id % 4))) AS meta")
      .collect()
    for (r <- rows) {
      assert(r.getStruct(1) === r.getStruct(2),
        s"flac and wav stats disagree at id=${r.getLong(0)}")
      assert(r.getStruct(3) != null, "decimate over decoded flac failed")
      assert(r.getStruct(4).getInt(0) === 1) // mono
      assert(r.getStruct(4).getInt(1) === 8000)
    }
    // stereo: the decoded container carries 2 channels and interleaved stats
    val st = spark.range(0, 4).selectExpr(
      "graft_audio_meta(graft_flac_to_wav(graft_synth_flac(" +
        "500L, 16000L, 251L, 13L, 4 + id))) AS meta").collect()
    for (r <- st) assert(r.getStruct(0).getInt(0) === 2)
  }

  test("re-encode idempotence: decode(synth) samples re-synth'd through " +
      "every stereo assignment decode identically") {
    val base = FlacPcm.decode(FlacPcm.synth(700, 8000, 251, 13, 4)).samples
    for (mode <- 5L to 7L) {
      val d = FlacPcm.decode(FlacPcm.synth(700, 8000, 251, 13, mode))
      assert(d.samples.toSeq === base.toSeq, s"assignment mode=$mode drifts")
    }
  }
}

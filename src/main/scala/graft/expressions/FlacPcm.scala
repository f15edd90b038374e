package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** FLAC sample decode with ZERO external dependencies — the LOSSLESS
  * compressed-audio format (the speech-corpus norm: LibriSpeech,
  * MLS, and most archival speech sets ship FLAC), so unlike MP3/AAC the
  * decoded samples are bit-exact by specification and an arithmetic
  * oracle can hash them. This is the audio analogue of the r11/r12
  * raster kernels ([[PngRaster]]/[[JpegRaster]]): decode the codec, then
  * emit the engine's codec-free interchange form — here a 16-bit PCM WAV
  * container — so every EXISTING audio kernel ([[GraftWavPcmStats]],
  * [[GraftWavDecimate]], [[AudioMeta]]) runs on FLAC payloads unchanged.
  *
  * Format coverage (RFC 9639 / the published format spec), NULL outside
  * it — never garbage, never a hang (untrusted crawl bytes):
  *  - STREAMINFO + any skippable metadata blocks (padding, vorbis
  *    comment, seektable, …);
  *  - 16-bit streams only (the speech-corpus norm; 8/24-bit → NULL with
  *    the disposition in COVERAGE.md), 1-8 channels;
  *  - all frame block-size / sample-rate codes (incl. the 8/16-bit
  *    end-of-header forms), fixed and variable blocking strategies;
  *  - all four channel assignments: independent, left/side, right/side,
  *    mid/side (side channels carry the spec's +1 bit);
  *  - all four subframe types: CONSTANT, VERBATIM, FIXED orders 0-4,
  *    LPC orders 1-32 (64-bit accumulator, arithmetic shift);
  *  - both residual methods (4- and 5-bit Rice parameters), partitioned
  *    residuals at any order, escaped (raw-binary) partitions, and
  *    wasted-bits shifts;
  *  - every checksum the format defines is VERIFIED, not skipped:
  *    frame-header CRC-8, frame CRC-16, and the STREAMINFO MD5 of the
  *    decoded samples (when present/nonzero) — so a corrupted stream
  *    fails loudly to NULL instead of decoding to plausible noise. (The
  *    PNG kernel skips CRCs because inflate fails structurally; Rice
  *    streams have no such structure, so here the checksums carry the
  *    robustness load.)
  *
  * Exactness: FLAC prediction/residual arithmetic is integer-exact by
  * spec, so decode → [[WavPcm]] stats is as oracle-replayable as the
  * WAV path itself; [[FlacPcm.synth]] emits standards-valid streams
  * (correct CRC-8/CRC-16/MD5) whose samples follow the
  * [[GraftSynthWav]] formula, cycling through verbatim / fixed / LPC /
  * constant / wasted-bits / escaped-partition encodings and all four
  * stereo assignments so one catalog anchor exercises every decode
  * path against an oracle that only ever states the sample formula.
  */
object FlacPcm {
  /** Decode cap on total interleaved samples (2²² × 2 B = 8 MiB of PCM):
    * a crafted STREAMINFO/frame chain must not balloon executor memory.
    * Division-form guards everywhere a header product could wrap. */
  val MaxSamplesOut: Long = 1L << 22

  /** Stackless internal bail — every malformed-input path converges to
    * one `null` return at the decode entry points. */
  private final class Bail extends RuntimeException(null, null, false, false)
  private def bail(): Nothing = throw new Bail

  // ---------------------------------------------------------------- bits
  /** MSB-first bit reader with hard end-of-buffer bailing. */
  private final class Reader(val b: Array[Byte]) {
    var byt = 0 // byte position
    var bit = 0 // bit position inside b(byt), 0 = MSB
    def bitPos: Long = byt.toLong * 8 + bit
    def aligned: Boolean = bit == 0
    def u(n: Int): Long = { // n <= 56
      var v = 0L
      var left = n
      while (left > 0) {
        if (byt >= b.length) bail()
        val avail = 8 - bit
        val take = math.min(avail, left)
        val chunk = ((b(byt) & 0xff) >>> (avail - take)) & ((1 << take) - 1)
        v = (v << take) | chunk
        bit += take
        if (bit == 8) { bit = 0; byt += 1 }
        left -= take
      }
      v
    }
    def s(n: Int): Long = (u(n) << (64 - n)) >> (64 - n) // sign extend
    /** Unary: count of 0 bits before the terminating 1. */
    def unary(): Int = {
      var c = 0
      while (u(1) == 0L) {
        c += 1
        if (c > (b.length.toLong * 8)) bail() // cannot trigger (u bails) — belt
      }
      c
    }
    def align(): Unit = if (bit != 0) { if (u(8 - bit) != 0L) bail() }
  }

  /** MSB-first bit writer (the encoder side). */
  private final class Writer {
    private var buf = new Array[Byte](1024)
    private var len = 0
    private var cur = 0
    private var nb = 0 // bits pending in cur
    def put(v: Long, n: Int): Unit = {
      var left = n
      while (left > 0) {
        val take = math.min(8 - nb, left)
        val chunk = ((v >>> (left - take)) & ((1L << take) - 1)).toInt
        cur = (cur << take) | chunk
        nb += take
        left -= take
        if (nb == 8) {
          if (len == buf.length) buf = java.util.Arrays.copyOf(buf, len * 2)
          buf(len) = cur.toByte; len += 1; cur = 0; nb = 0
        }
      }
    }
    def align(): Unit = if (nb != 0) put(0L, 8 - nb)
    def size: Int = { require(nb == 0); len }
    def bytes: Array[Byte] = java.util.Arrays.copyOf(buf, len)
    def slice(from: Int, until: Int): Array[Byte] =
      java.util.Arrays.copyOfRange(buf, from, until)
  }

  // ---------------------------------------------------------------- crc
  /** CRC-8, poly x⁸+x²+x+1 (0x07), init 0 — the frame-header checksum. */
  def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly x¹⁶+x¹⁵+x²+1 (0x8005), init 0 — the whole-frame checksum. */
  def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  // ---------------------------------------------------------------- decode
  final case class Decoded(rate: Int, channels: Int, samples: Array[Short])

  private val RateTable = Array(-1, 88200, 176400, 192000, 8000, 16000,
    22050, 24000, 32000, 44100, 48000, 96000)

  /** Fixed-predictor coefficients by order (newest sample first). */
  private def fixedPredict(order: Int, s: Array[Int], i: Int): Long =
    order match {
      case 0 => 0L
      case 1 => s(i - 1).toLong
      case 2 => 2L * s(i - 1) - s(i - 2)
      case 3 => 3L * s(i - 1) - 3L * s(i - 2) + s(i - 3)
      case 4 => 4L * s(i - 1) - 6L * s(i - 2) + 4L * s(i - 3) - s(i - 4)
    }

  /** Decode a full FLAC stream to interleaved 16-bit samples, or null. */
  def decode(bytes: Array[Byte]): Decoded = {
    if (bytes == null || bytes.length < 4 + 4 + 34) return null
    try decodeOrBail(bytes)
    catch { case _: Bail | _: ArrayIndexOutOfBoundsException => null }
  }

  /** STREAMINFO fields + the offset where frames begin. */
  private final class Header {
    var rate = 0; var channels = 0; var bps = 0; var total = 0L
    var md5: Array[Byte] = null; var framesAt = 0
  }

  /** The ONE magic + metadata-block walk (shared by the full decode and
    * the metadata-only path — a drifting copy would let them disagree on
    * what parses). Bails on structural malformation; rate is validated
    * here (spec ceiling 655350), channels/bps are in-range by field width
    * (3-bit +1 / 5-bit +1); decode-scope checks (bps==16, sample cap)
    * stay with the decoder. */
  private def readHeader(b: Array[Byte]): Header = {
    if (!(b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C')) bail()
    var i = 4
    // metadata blocks; STREAMINFO must come first (spec) and be 34 bytes
    val h = new Header
    var seenInfo = false
    var last = false
    while (!last) {
      if (i + 4 > b.length) bail()
      val hb = b(i) & 0xff
      last = (hb & 0x80) != 0
      val typ = hb & 0x7f
      val len = ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
      if (typ == 127) bail() // forbidden block type
      if (i + 4 + len > b.length) bail()
      if (!seenInfo) {
        if (typ != 0 || len != 34) bail()
        val r = new Reader(b); r.byt = i + 4
        r.u(16); r.u(16); r.u(24); r.u(24) // min/max block, min/max frame
        h.rate = r.u(20).toInt
        h.channels = r.u(3).toInt + 1
        h.bps = r.u(5).toInt + 1
        h.total = r.u(36)
        h.md5 = java.util.Arrays.copyOfRange(b, i + 4 + 18, i + 4 + 34)
        seenInfo = true
      } else if (typ == 0) bail() // duplicate STREAMINFO
      i += 4 + len
    }
    if (!seenInfo || h.rate <= 0 || h.rate > 655350) bail()
    h.framesAt = i
    h
  }

  /** STREAMINFO-only metadata: `[channels, rate, bits, durationMs]` or
    * null — walks the metadata-block chain only, NO frame decode, NO
    * CRC/MD5, so a metadata scan over a FLAC corpus costs a header read
    * per row instead of a full sample decode. Deliberately wider than
    * [[decode]]: reports any STREAMINFO bit depth (decode is scoped to
    * 16-bit) and cannot see frame corruption — metadata means header
    * truth. total==0 (unknown length, legal per spec) reports 0 ms. */
  def metaOnly(bytes: Array[Byte]): Array[Long] = {
    if (bytes == null || bytes.length < 4 + 4 + 34) return null
    val h =
      try readHeader(bytes)
      catch { case _: Bail | _: ArrayIndexOutOfBoundsException => return null }
    Array(h.channels.toLong, h.rate.toLong, h.bps.toLong,
      h.total * 1000L / h.rate)
  }

  private def decodeOrBail(b: Array[Byte]): Decoded = {
    val hdr = readHeader(b)
    val rate = hdr.rate; val channels = hdr.channels; val bps = hdr.bps
    val total = hdr.total; val md5 = hdr.md5
    var i = hdr.framesAt
    if (bps != 16) bail() // scope: 16-bit streams (COVERAGE.md)
    if (channels < 1 || channels > 8) bail()
    if (total > MaxSamplesOut / channels) bail()

    val out = new java.io.ByteArrayOutputStream() // interleaved LE pairs
    var decodedFrames = 0L
    var totalPerCh = 0L
    while (i < b.length) {
      val r = new Reader(b); r.byt = i
      val frameStart = i
      if (r.u(14) != 0x3ffeL) bail()
      if (r.u(1) != 0L) bail() // reserved
      r.u(1) // blocking strategy (number semantics only)
      val bsCode = r.u(4).toInt
      val srCode = r.u(4).toInt
      val chCode = r.u(4).toInt
      val ssCode = r.u(3).toInt
      if (r.u(1) != 0L) bail() // reserved
      // UTF-8-style coded frame/sample number (value unused beyond validity)
      val first = r.u(8).toInt
      val extra = Integer.numberOfLeadingZeros(~(first << 24) | 0xffffff) match {
        case 0 => 0
        case 1 => bail() // lone continuation byte
        case n if n <= 7 => n - 1
        case _ => bail()
      }
      var k = 0
      while (k < extra) { if ((r.u(8).toInt & 0xc0) != 0x80) bail(); k += 1 }
      val blocksize = bsCode match {
        case 0 => bail()
        case 1 => 192
        case c if c <= 5 => 576 << (c - 2)
        case 6 => r.u(8).toInt + 1
        case 7 => r.u(16).toInt + 1
        case c => 256 << (c - 8)
      }
      srCode match {
        case 0 => ()
        case c if c <= 11 => if (RateTable(c) != rate) bail()
        case 12 => if (r.u(8) * 1000L != rate) bail()
        case 13 => if (r.u(16) != rate) bail()
        case 14 => if (r.u(16) * 10L != rate) bail()
        case _ => bail()
      }
      val (nCh, decor) = chCode match {
        case c if c <= 7 => (c + 1, 0)
        case 8 => (2, 1) // left/side
        case 9 => (2, 2) // right/side
        case 10 => (2, 3) // mid/side
        case _ => bail()
      }
      if (nCh != channels) bail()
      val frameBps = ssCode match {
        case 0 => bps
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case 7 => 32
        case _ => bail()
      }
      if (frameBps != 16) bail()
      if (!r.aligned) bail()
      if (crc8(b, frameStart, r.byt) != r.u(8).toInt) bail()
      if (totalPerCh + blocksize > MaxSamplesOut / channels) bail()

      val chans = new Array[Array[Int]](channels)
      var c = 0
      while (c < channels) {
        val side = (decor == 1 && c == 1) || (decor == 2 && c == 0) ||
          (decor == 3 && c == 1)
        chans(c) = subframe(r, blocksize, 16 + (if (side) 1 else 0))
        c += 1
      }
      r.align()
      val crcPos = r.byt
      if (crc16(b, frameStart, crcPos) != r.u(16).toInt) bail()

      // stereo decorrelation → independent channels
      decor match {
        case 1 => // left/side: right = left − side
          val l = chans(0); val s = chans(1)
          var j = 0; while (j < blocksize) { s(j) = l(j) - s(j); j += 1 }
        case 2 => // right/side: left = right + side
          val s = chans(0); val rr = chans(1)
          var j = 0; while (j < blocksize) { s(j) = rr(j) + s(j); j += 1 }
        case 3 => // mid/side
          val m = chans(0); val s = chans(1)
          var j = 0
          while (j < blocksize) {
            val mid2 = (m(j) << 1) | (s(j) & 1)
            m(j) = (mid2 + s(j)) >> 1
            s(j) = (mid2 - s(j)) >> 1
            j += 1
          }
        case _ => ()
      }
      var j = 0
      while (j < blocksize) {
        c = 0
        while (c < channels) {
          val v = chans(c)(j)
          if (v < Short.MinValue || v > Short.MaxValue) bail()
          out.write(v & 0xff); out.write((v >> 8) & 0xff)
          c += 1
        }
        j += 1
      }
      totalPerCh += blocksize
      decodedFrames += 1
      i = r.byt
    }
    if (decodedFrames == 0) bail()
    if (total != 0 && total != totalPerCh) bail()
    val pcmBytes = out.toByteArray
    if (md5.exists(_ != 0)) {
      val d = java.security.MessageDigest.getInstance("MD5").digest(pcmBytes)
      if (!java.util.Arrays.equals(d, md5)) bail()
    }
    val samples = new Array[Short](pcmBytes.length / 2)
    var p = 0
    while (p < samples.length) {
      samples(p) = ((pcmBytes(2 * p) & 0xff) | (pcmBytes(2 * p + 1) << 8)).toShort
      p += 1
    }
    Decoded(rate, channels, samples)
  }

  /** One subframe → blocksize samples at the given channel bit depth. */
  private def subframe(r: Reader, blocksize: Int, chBps: Int): Array[Int] = {
    if (r.u(1) != 0L) bail() // pad bit
    val typ = r.u(6).toInt
    val wasted =
      if (r.u(1) == 1L) {
        val w = r.unary() + 1
        if (w >= chBps) bail()
        w
      } else 0
    val bps = chBps - wasted
    val s = new Array[Int](blocksize)
    typ match {
      case 0 => // CONSTANT
        val v = r.s(bps).toInt
        java.util.Arrays.fill(s, v)
      case 1 => // VERBATIM
        var j = 0
        while (j < blocksize) { s(j) = r.s(bps).toInt; j += 1 }
      case t if t >= 8 && t <= 12 => // FIXED order 0-4
        val order = t - 8
        if (order > blocksize) bail()
        var j = 0
        while (j < order) { s(j) = r.s(bps).toInt; j += 1 }
        val res = residual(r, blocksize, order)
        j = order
        while (j < blocksize) {
          val v = fixedPredict(order, s, j) + res(j - order)
          if (v < Int.MinValue || v > Int.MaxValue) bail()
          s(j) = v.toInt
          j += 1
        }
      case t if t >= 32 => // LPC order 1-32
        val order = t - 31
        if (order > blocksize) bail()
        var j = 0
        while (j < order) { s(j) = r.s(bps).toInt; j += 1 }
        val precM1 = r.u(4).toInt
        if (precM1 == 15) bail()
        val prec = precM1 + 1
        val shift = r.s(5).toInt
        if (shift < 0) bail()
        val coef = new Array[Int](order)
        j = 0
        while (j < order) { coef(j) = r.s(prec).toInt; j += 1 }
        val res = residual(r, blocksize, order)
        j = order
        while (j < blocksize) {
          var acc = 0L
          var m = 0
          while (m < order) { acc += coef(m).toLong * s(j - 1 - m); m += 1 }
          val v = (acc >> shift) + res(j - order)
          if (v < Int.MinValue || v > Int.MaxValue) bail()
          s(j) = v.toInt
          j += 1
        }
      case _ => bail() // reserved types
    }
    if (wasted > 0) {
      var j = 0
      while (j < blocksize) { s(j) = s(j) << wasted; j += 1 }
    }
    s
  }

  /** Partitioned Rice residual → (blocksize − order) values. */
  private def residual(r: Reader, blocksize: Int, order: Int): Array[Int] = {
    val method = r.u(2).toInt
    val pw = method match { case 0 => 4; case 1 => 5; case _ => bail() }
    val escape = (1 << pw) - 1
    val partOrder = r.u(4).toInt
    val parts = 1 << partOrder
    if (blocksize % parts != 0) bail()
    val perPart = blocksize / parts
    val out = new Array[Int](blocksize - order)
    var idx = 0
    var p = 0
    while (p < parts) {
      val cnt = if (p == 0) perPart - order else perPart
      if (cnt < 0) bail()
      val param = r.u(pw).toInt
      if (param == escape) {
        val nbits = r.u(5).toInt
        var j = 0
        while (j < cnt) {
          out(idx) = if (nbits == 0) 0 else {
            val v = r.s(nbits)
            if (v < Int.MinValue || v > Int.MaxValue) bail()
            v.toInt
          }
          idx += 1; j += 1
        }
      } else {
        var j = 0
        while (j < cnt) {
          val q = r.unary().toLong
          val u = (q << param) | r.u(param)
          val v = (u >>> 1) ^ -(u & 1L) // zigzag
          if (v < Int.MinValue || v > Int.MaxValue) bail()
          out(idx) = v.toInt
          idx += 1; j += 1
        }
      }
      p += 1
    }
    out
  }

  // ---------------------------------------------------------------- encode
  /** Nominal synth frame size — small enough that a fixture stream holds
    * many frames (framing/CRC boundaries get exercised), spec-legal. */
  val SynthBlock = 576

  /** Standards-valid FLAC synthesizer over the [[GraftSynthWav]] sample
    * formula `s(i) = ((i·a + b) mod 65536) − 32768`; stereo modes add a
    * right channel with (a+3, b+7). `mode` selects the encoding paths a
    * decoder must survive — the SAMPLES are mode-invariant, so an oracle
    * states only the formula:
    *   0: verbatim subframes            4: stereo, independent channels
    *   1: fixed order-2 + Rice          5: stereo, left/side
    *   2: LPC order-2 + Rice            6: stereo, right/side
    *   3: per-frame cycle — verbatim,   7: stereo, mid/side
    *      fixed 1/2, LPC, constant           (stereo subframes cycle too)
    *      (when flat), wasted-bits
    *      (when all-even), escaped
    *      Rice partitions
    */
  def synth(n: Long, rate: Long, a: Long, b: Long, mode: Long): Array[Byte] = {
    require(n > 0 && n <= WavPcm.MaxSamples,
      s"graft_synth_flac: need 0 < n <= 2^20, got $n")
    require(rate > 0 && rate <= 192000,
      s"graft_synth_flac: rate must be in 1..192000, got $rate")
    require(a >= 0 && b >= 0 && a <= (1L << 20) && b <= (1L << 20),
      s"graft_synth_flac: a, b must be in [0, 2^20], got $a, $b")
    require(mode >= 0 && mode <= 7, s"graft_synth_flac: mode 0..7, got $mode")
    val stereo = mode >= 4
    val channels = if (stereo) 2 else 1
    val nI = n.toInt
    def formula(i: Long, aa: Long, bb: Long): Int =
      (((i * aa + bb) % 65536L) - 32768L).toInt
    val left = Array.tabulate(nI)(i => formula(i, a, b))
    val right = if (stereo) Array.tabulate(nI)(i => formula(i, a + 3, b + 7))
                else null

    // MD5 over the interleaved little-endian stream (the STREAMINFO field)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < nI) {
      md.update((left(i) & 0xff).toByte); md.update(((left(i) >> 8) & 0xff).toByte)
      if (stereo) {
        md.update((right(i) & 0xff).toByte); md.update(((right(i) >> 8) & 0xff).toByte)
      }
      i += 1
    }
    val md5 = md.digest()

    val w = new Writer
    w.put('f', 8); w.put('L', 8); w.put('a', 8); w.put('C', 8)
    // STREAMINFO, last-metadata-block flag set
    w.put(0x80L, 8); w.put(34L, 24)
    w.put(SynthBlock.toLong, 16); w.put(SynthBlock.toLong, 16)
    w.put(0L, 24); w.put(0L, 24) // min/max frame size unknown
    w.put(rate, 20); w.put((channels - 1).toLong, 3); w.put(15L, 5) // bps−1
    w.put(n, 36)
    md5.foreach(x => w.put(x & 0xffL, 8))

    var frameNo = 0L
    var pos = 0
    while (pos < nI) {
      val bs = math.min(SynthBlock, nI - pos)
      encodeFrame(w, frameNo, bs, pos, left, right, mode.toInt)
      pos += bs
      frameNo += 1
    }
    w.bytes
  }

  /** N-channel (1–8) synthesizer with INDEPENDENT channel assignment —
    * the r12 verdict's multichannel ask: the decoder accepts 8 channels
    * but the synth's stereo ceiling meant >2-channel coverage was one
    * hand-built constant frame. Channel `c` follows the [[synth]] param
    * convention one step further: formula params (a + 3c, b + 7c) — for
    * channels = 2 the samples equal mode-4 `synth` exactly. Subframe
    * kinds cycle per frame ([[cycleKind]]: verbatim, fixed-1/2, LPC,
    * constant-fallback, wasted/escape), so every subframe path runs at
    * every channel count, non-constant. */
  def synthN(n: Long, rate: Long, a: Long, b: Long, channels: Long): Array[Byte] = {
    require(n > 0 && n <= WavPcm.MaxSamples,
      s"graft_synth_flac_n: need 0 < n <= 2^20, got $n")
    require(rate > 0 && rate <= 192000,
      s"graft_synth_flac_n: rate must be in 1..192000, got $rate")
    require(a >= 0 && b >= 0 && a <= (1L << 20) && b <= (1L << 20),
      s"graft_synth_flac_n: a, b must be in [0, 2^20], got $a, $b")
    require(channels >= 1 && channels <= 8,
      s"graft_synth_flac_n: channels 1..8, got $channels")
    val nc = channels.toInt
    val nI = n.toInt
    def formula(i: Long, aa: Long, bb: Long): Int =
      (((i * aa + bb) % 65536L) - 32768L).toInt
    val chs = Array.tabulate(nc)(c =>
      Array.tabulate(nI)(i => formula(i, a + 3L * c, b + 7L * c)))

    // MD5 over the interleaved little-endian stream (the STREAMINFO field)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < nI) {
      var c = 0
      while (c < nc) {
        val v = chs(c)(i)
        md.update((v & 0xff).toByte); md.update(((v >> 8) & 0xff).toByte)
        c += 1
      }
      i += 1
    }
    val md5 = md.digest()

    val w = new Writer
    w.put('f', 8); w.put('L', 8); w.put('a', 8); w.put('C', 8)
    w.put(0x80L, 8); w.put(34L, 24) // STREAMINFO, last-metadata-block
    w.put(SynthBlock.toLong, 16); w.put(SynthBlock.toLong, 16)
    w.put(0L, 24); w.put(0L, 24)
    w.put(rate, 20); w.put((nc - 1).toLong, 3); w.put(15L, 5)
    w.put(n, 36)
    md5.foreach(x => w.put(x & 0xffL, 8))

    var frameNo = 0L
    var pos = 0
    while (pos < nI) {
      val bs = math.min(SynthBlock, nI - pos)
      val headStart = writeFrameHeader(w, frameNo, bs, nc - 1)
      val kind = cycleKind(frameNo)
      var c = 0
      while (c < nc) {
        val sub = java.util.Arrays.copyOfRange(chs(c), pos, pos + bs)
        encodeSubframe(w, sub, 16, kind)
        c += 1
      }
      w.align()
      w.patchCrc16(headStart)
      pos += bs
      frameNo += 1
    }
    w.bytes
  }

  /** Per-frame subframe strategy id for cycle mode (3 / stereo cycle). */
  private def cycleKind(frameNo: Long): Int = (frameNo % 6).toInt

  /** Frame header (sync … CRC-8), shared by the mono/stereo and the
    * N-channel encoders; returns the header start offset (the CRC-16
    * patch base). */
  private def writeFrameHeader(w: Writer, frameNo: Long, bs: Int,
      chAssign: Int): Int = {
    val headStart = w.size // asserts byte alignment between frames
    w.put(0x3ffeL, 14); w.put(0L, 1); w.put(0L, 1) // sync, reserved, fixed-block
    w.put(7L, 4)  // blocksize: 16-bit value−1 at end of header
    w.put(0L, 4)  // sample rate: from STREAMINFO
    w.put(chAssign.toLong, 4)
    w.put(4L, 3) // sample size: 16-bit
    w.put(0L, 1)
    // UTF-8-style frame number
    if (frameNo < 0x80) w.put(frameNo, 8)
    else if (frameNo < 0x800) {
      w.put(0xc0L | (frameNo >> 6), 8); w.put(0x80L | (frameNo & 0x3f), 8)
    } else {
      w.put(0xe0L | (frameNo >> 12), 8)
      w.put(0x80L | ((frameNo >> 6) & 0x3f), 8)
      w.put(0x80L | (frameNo & 0x3f), 8)
    }
    w.put((bs - 1).toLong, 16)
    w.align()
    w.patchCrc8(headStart)
    headStart
  }

  private def encodeFrame(w: Writer, frameNo: Long, bs: Int, off: Int,
      left: Array[Int], right: Array[Int], mode: Int): Unit = {
    val stereo = right != null
    val chAssign = if (!stereo) 0 else mode match {
      case 5 => 8 // left/side
      case 6 => 9 // right/side
      case 7 => 10 // mid/side
      case _ => 1 // independent stereo
    }
    val headStart = writeFrameHeader(w, frameNo, bs, chAssign)

    // channel sample arrays under the frame's assignment
    val ch0 = new Array[Int](bs)
    val ch1 = if (stereo) new Array[Int](bs) else null
    var j = 0
    while (j < bs) {
      val l = left(off + j)
      if (!stereo) ch0(j) = l
      else {
        val r = right(off + j)
        chAssign match {
          case 1 => ch0(j) = l; ch1(j) = r
          case 8 => ch0(j) = l; ch1(j) = l - r
          case 9 => ch0(j) = l - r; ch1(j) = r
          case 10 => ch0(j) = (l + r) >> 1; ch1(j) = l - r
        }
      }
      j += 1
    }
    val kind = mode match {
      case 0 | 4 => 0 // verbatim
      case 1 | 5 => 2 // fixed order 2
      case 2 | 6 => 3 // lpc order 2
      case _ => cycleKind(frameNo)
    }
    encodeSubframe(w, ch0, 16 + (if (chAssign == 9) 1 else 0), kind)
    if (stereo)
      encodeSubframe(w, ch1, 16 + (if (chAssign == 8 || chAssign == 10) 1 else 0),
        kind)
    w.align()
    w.patchCrc16(headStart)
  }

  /** kind: 0 verbatim, 1 fixed-1, 2 fixed-2, 3 lpc-2, 4 constant-or-
    * fixed-2, 5 wasted-or-escape. Falls back when a data-dependent form
    * (constant / wasted bits) does not apply to this block. */
  private def encodeSubframe(w: Writer, s: Array[Int], bps: Int, kind: Int): Unit = {
    val bs = s.length
    val allEqual = s.forall(_ == s(0))
    val allEven = s.forall(v => (v & 1) == 0)
    val k = kind match {
      case 4 => if (allEqual) 4 else 2
      case 5 => if (allEven && bs > 2) 6 else 5
      case x => x
    }
    k match {
      case 0 => // VERBATIM
        w.put(0L, 1); w.put(1L, 6); w.put(0L, 1)
        s.foreach(v => w.put(v.toLong & ((1L << bps) - 1), bps))
      case 4 => // CONSTANT
        w.put(0L, 1); w.put(0L, 6); w.put(0L, 1)
        w.put(s(0).toLong & ((1L << bps) - 1), bps)
      case 1 | 2 => // FIXED order 1 or 2
        val order = k
        if (bs <= order) { encodeSubframe(w, s, bps, 0); return }
        w.put(0L, 1); w.put((8 + order).toLong, 6); w.put(0L, 1)
        var j = 0
        while (j < order) { w.put(s(j).toLong & ((1L << bps) - 1), bps); j += 1 }
        val res = new Array[Long](bs - order)
        j = order
        while (j < bs) { res(j - order) = s(j) - fixedPredict(order, s, j); j += 1 }
        writeRice(w, res, escapeSecondHalf = false, bs, order)
      case 3 => // LPC order 2: pred = (2048·s[i−1] − 1024·s[i−2]) >> 10
        if (bs <= 2) { encodeSubframe(w, s, bps, 0); return }
        w.put(0L, 1); w.put(33L, 6); w.put(0L, 1) // 100001 = LPC order 2
        w.put(s(0).toLong & ((1L << bps) - 1), bps)
        w.put(s(1).toLong & ((1L << bps) - 1), bps)
        w.put(12L, 4) // precision − 1 = 12 → 13-bit coefficients
        w.put(10L, 5) // shift
        w.put(2048L & 0x1fff, 13); w.put((-1024L) & 0x1fff, 13)
        val res = new Array[Long](bs - 2)
        var j = 2
        while (j < bs) {
          val pred = (2048L * s(j - 1) - 1024L * s(j - 2)) >> 10
          res(j - 2) = s(j) - pred
          j += 1
        }
        writeRice(w, res, escapeSecondHalf = false, bs, 2)
      case 5 => // escaped-partition fixed-2 (order-1 partitions)
        if (bs <= 2 || bs % 2 != 0) { encodeSubframe(w, s, bps, 2); return }
        w.put(0L, 1); w.put(10L, 6); w.put(0L, 1) // fixed order 2
        w.put(s(0).toLong & ((1L << bps) - 1), bps)
        w.put(s(1).toLong & ((1L << bps) - 1), bps)
        val res = new Array[Long](bs - 2)
        var j = 2
        while (j < bs) { res(j - 2) = s(j) - fixedPredict(2, s, j); j += 1 }
        writeRice(w, res, escapeSecondHalf = true, bs, 2)
      case 6 => // wasted-bits(1) + fixed order 2 over halved samples
        w.put(0L, 1); w.put(10L, 6); w.put(1L, 1) // wasted flag
        w.put(1L, 1) // unary 0 → wasted = 1
        val bw = bps - 1
        val h = s.map(_ >> 1)
        w.put(h(0).toLong & ((1L << bw) - 1), bw)
        w.put(h(1).toLong & ((1L << bw) - 1), bw)
        val res = new Array[Long](bs - 2)
        var j = 2
        while (j < bs) { res(j - 2) = h(j) - fixedPredict(2, h, j); j += 1 }
        writeRice(w, res, escapeSecondHalf = false, bs, 2)
    }
  }

  /** Rice parameter by the standard mean-magnitude estimate (any value
    * is spec-legal; this one keeps fixture streams compact). */
  private def ricePick(res: Array[Long], from: Int, until: Int): Int = {
    var sumU = 0L
    var j = from
    while (j < until) {
      val v = res(j); sumU += (if (v >= 0) v << 1 else ((-v) << 1) - 1)
      j += 1
    }
    val cnt = math.max(1, until - from)
    var k = 0
    while (k < 14 && (cnt.toLong << (k + 1)) < sumU) k += 1
    k
  }

  private def writeRice(w: Writer, res: Array[Long], escapeSecondHalf: Boolean,
      bs: Int, order: Int): Unit = {
    w.put(0L, 2) // method 0: 4-bit Rice parameters
    if (!escapeSecondHalf) {
      w.put(0L, 4) // partition order 0
      val k = ricePick(res, 0, res.length)
      w.put(k.toLong, 4)
      res.foreach(v => riceOne(w, v, k))
    } else {
      w.put(1L, 4) // partition order 1: [rice | escaped-raw]
      val half = bs / 2
      val k = ricePick(res, 0, half - order)
      w.put(k.toLong, 4)
      var j = 0
      while (j < half - order) { riceOne(w, res(j), k); j += 1 }
      // second partition: escape code + raw nbits two's complement
      var maxBits = 1
      j = half - order
      while (j < res.length) {
        val v = res(j)
        val need = 65 - java.lang.Long.numberOfLeadingZeros(if (v < 0) ~v else v)
        if (need > maxBits) maxBits = need.toInt
        j += 1
      }
      w.put(15L, 4) // escape
      w.put(maxBits.toLong, 5)
      j = half - order
      while (j < res.length) {
        w.put(res(j) & ((1L << maxBits) - 1), maxBits); j += 1
      }
    }
  }

  private def riceOne(w: Writer, v: Long, k: Int): Unit = {
    val u = if (v >= 0) v << 1 else ((-v) << 1) - 1
    val q = (u >>> k).toInt
    var j = 0
    while (j < q) { w.put(0L, 1); j += 1 }
    w.put(1L, 1)
    if (k > 0) w.put(u & ((1L << k) - 1), k)
  }

  /** Writer CRC patch hooks (appended post-hoc so the header/frame bytes
    * are hashed exactly as emitted). */
  implicit private class WriterCrc(val w: Writer) {
    def patchCrc8(from: Int): Unit = {
      val bytes = w.slice(from, w.size)
      w.put(crc8(bytes, 0, bytes.length).toLong, 8)
    }
    def patchCrc16(from: Int): Unit = {
      val bytes = w.slice(from, w.size)
      w.put(crc16(bytes, 0, bytes.length).toLong, 16)
    }
  }
}

/** `graft_synth_flac(n, rate, a, b, mode) -> binary` — a standards-valid
  * FLAC stream whose decoded samples follow the [[GraftSynthWav]]
  * formula; `mode` cycles encoding paths (see [[FlacPcm.synth]]). */
case class GraftSynthFlac(nE: Expression, rateE: Expression, aE: Expression,
    bE: Expression, modeE: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(nE, rateE, aE, bE, modeE)
  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_synth_flac"
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_synth_flac expects (bigint, bigint, bigint, bigint, bigint)")

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val Seq(n, rate, a, b, mode) = vs.map(_.asInstanceOf[Long])
    FlacPcm.synth(n, rate, a, b, mode)
  }

  def build(n: Long, rate: Long, a: Long, b: Long, mode: Long): Array[Byte] =
    FlacPcm.synth(n, rate, a, b, mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftSynthFlac", this,
      classOf[GraftSynthFlac].getName)
    val gens = children.map(_.genCode(ctx))
    val anyNull = gens.map(_.isNull.toString).mkString(" || ")
    ev.copy(code = code"""
        ${gens.map(_.code.toString).mkString("\n")}
        boolean ${ev.isNull} = $anyNull;
        byte[] ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.build(${gens.map(_.value).mkString(", ")});
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GraftSynthFlac =
    GraftSynthFlac(newChildren(0), newChildren(1), newChildren(2),
      newChildren(3), newChildren(4))
}

/** `graft_flac_to_wav(binary) -> binary` — decode a FLAC stream to the
  * engine's 16-bit PCM WAV interchange form (NULL on anything malformed,
  * out of scope, or checksum-failing), so [[GraftWavPcmStats]] /
  * [[GraftWavDecimate]] / [[AudioMeta]] run on FLAC payloads unchanged —
  * the [[GraftPngToPpm]] routing pattern, one format over. */
case class GraftFlacToWav(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_flac_to_wav expects binary, got ${t.sql}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_flac_to_wav"

  override protected def nullSafeEval(input: Any): Any = {
    val d = FlacPcm.decode(input.asInstanceOf[Array[Byte]])
    if (d == null) null
    else WavPcm.container(d.rate, d.channels, d.samples)
  }
  def nullSafeEvalPub(input: Any): Any = nullSafeEval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftFlacToWav", this,
      classOf[GraftFlacToWav].getName)
    val r = ctx.freshName("flacWav")
    nullSafeCodeGen(ctx, ev, b => s"""
      Object $r = $ref.nullSafeEvalPub($b);
      if ($r == null) { ${ev.isNull} = true; } else {
        ${ev.value} = (byte[]) $r;
      }""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): GraftFlacToWav = copy(child = newChild)
}

/** `graft_flac_meta(binary) -> struct<channels,sample_rate,bits,
  * duration_ms>` — STREAMINFO-only metadata ([[FlacPcm.metaOnly]]): the
  * same struct shape as [[AudioMeta]] so the two coalesce into one audio
  * metadata surface, but a header walk instead of a full sample decode —
  * a metadata scan over a FLAC corpus must not pay per-frame CRC-16 +
  * whole-stream MD5 per row (ADVICE r12). */
case class GraftFlacMeta(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_flac_meta expects binary, got ${t.sql}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_flac_meta"

  override protected def nullSafeEval(input: Any): Any =
    evalBytes(input.asInstanceOf[Array[Byte]])

  /** Codegen entry point (shared with nullSafeEval). */
  def evalBytes(bytes: Array[Byte]): InternalRow =
    FlacPcm.metaOnly(bytes) match {
      case null => null
      case m => new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](m(0).toInt, m(1).toInt, m(2).toInt, m(3)))
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftFlacMeta", this,
      classOf[GraftFlacMeta].getName)
    val tmp = ctx.freshName("meta")
    nullSafeCodeGen(ctx, ev, bytes => s"""
      Object $tmp = $ref.evalBytes($bytes);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = (InternalRow) $tmp; }""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): GraftFlacMeta = copy(child = newChild)
}

/** `graft_synth_flac_n(n, rate, a, b, channels) -> binary` — the
  * N-channel (1–8) INDEPENDENT-assignment synthesizer
  * ([[FlacPcm.synthN]]): channel c follows the [[GraftSynthFlac]] param
  * convention one step further (a + 3c, b + 7c), subframe kinds cycle
  * per frame — the fixture surface for multichannel decode coverage
  * beyond the stereo synth's ceiling (r12 verdict ask #5). */
case class GraftSynthFlacN(nE: Expression, rateE: Expression, aE: Expression,
    bE: Expression, chE: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(nE, rateE, aE, bE, chE)
  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_synth_flac_n"
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_synth_flac_n expects (bigint, bigint, bigint, bigint, bigint)")

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val Seq(n, rate, a, b, ch) = vs.map(_.asInstanceOf[Long])
    FlacPcm.synthN(n, rate, a, b, ch)
  }

  def build(n: Long, rate: Long, a: Long, b: Long, ch: Long): Array[Byte] =
    FlacPcm.synthN(n, rate, a, b, ch)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftSynthFlacN", this,
      classOf[GraftSynthFlacN].getName)
    val gens = children.map(_.genCode(ctx))
    val anyNull = gens.map(_.isNull.toString).mkString(" || ")
    ev.copy(code = code"""
        ${gens.map(_.code.toString).mkString("\n")}
        boolean ${ev.isNull} = $anyNull;
        byte[] ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.build(${gens.map(_.value).mkString(", ")});
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GraftSynthFlacN =
    GraftSynthFlacN(newChildren(0), newChildren(1), newChildren(2),
      newChildren(3), newChildren(4))
}

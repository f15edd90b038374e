package graft

import java.io.ByteArrayInputStream
import java.util.zip.{CRC32, Deflater}

import org.apache.spark.sql.functions._

import graft.expressions.{PngRaster, PpmRaster}

/** Differential fuzz for the zero-dependency PNG decoder, three ways:
  *
  *  1. round trip — `toPpm(synth(...))` must equal the P5/P6 bytes the
  *     PPM synthesizer emits for the same pixel formula, for EVERY
  *     filter mode (the five predictors + per-row cycling) and both
  *     color types;
  *  2. against the JDK's own independent PNG decoder (`javax.imageio`,
  *     raw raster samples — no alpha compositing) over random-pixel
  *     PNGs of all five supported color types, produced by a TEST-LOCAL
  *     clean-room encoder that shares no code with the kernel;
  *  3. malformed robustness — every truncation of a valid file, plus
  *     targeted header corruptions, must decode to null, never throw.
  */
class PngFuzzSpec extends SparkSpec {
  import spark.implicits._

  test("png round trip: decode(synth) equals the PPM synthesizer's bytes " +
      "for every filter mode and color type") {
    for (f <- 0 to 5; c <- Seq(0, 2);
         (w, h, a, b) <- Seq((16, 12, 3, 5), (9, 8, 1, 1), (33, 21, 7, 11))) {
      val png = PngRaster.synth(w, h, a, b, f, c)
      val got = PngRaster.toPpm(png)
      assert(got != null, s"decode failed f=$f c=$c ${w}x$h")
      val expected =
        if (c == 2)
          graft.expressions.GraftSynthPpm(null, null, null, null)
            .build(w, h, a, b)
        else {
          val header = s"P5\n$w $h\n255\n".getBytes("US-ASCII")
          header ++ Array.tabulate(w * h) { p =>
            (((p % w) * a + (p / w) * b) % 256).toByte
          }
        }
      assert(java.util.Arrays.equals(got, expected),
        s"pixel mismatch f=$f c=$c ${w}x$h")
    }
  }

  test("png Adam7 + 16-bit round trip: every (interlace, depth) variant " +
      "decodes to pixels BYTE-IDENTICAL to the plain 8-bit decode") {
    // sizes chosen so Adam7 hits its edge geometry: sub-8 images where
    // whole passes are EMPTY (1x1 keeps only pass 1; 2x2 passes 1/6/7;
    // 5x3, 7x5 partial), exact multiples (8x8, 16x8), and odd overhangs
    for ((w, h) <- Seq((1, 1), (2, 2), (3, 1), (1, 3), (5, 3), (7, 5),
           (8, 8), (9, 9), (16, 8), (33, 21));
         f <- Seq(0, 4, 5); c <- Seq(0, 2)) {
      val base = PngRaster.toPpm(PngRaster.synth(w, h, 3, 5, f, c))
      assert(base != null, s"plain decode failed ${w}x$h f=$f c=$c")
      for ((il, bd) <- Seq((1, 8), (0, 16), (1, 16))) {
        val png = PngRaster.synth(w, h, 3, 5, f, c, il, bd)
        val got = PngRaster.toPpm(png)
        assert(got != null, s"decode failed ${w}x$h f=$f c=$c il=$il bd=$bd")
        assert(java.util.Arrays.equals(got, base),
          s"pixel mismatch ${w}x$h f=$f c=$c il=$il bd=$bd")
      }
    }
  }

  test("png Adam7/16-bit synth is standards-valid: the JDK's ImageIO " +
      "reads every variant and agrees on the (high-byte) samples") {
    for ((w, h) <- Seq((1, 1), (7, 5), (9, 8), (16, 12));
         (il, bd) <- Seq((1, 8), (0, 16), (1, 16)); c <- Seq(0, 2)) {
      val png = PngRaster.synth(w, h, 3, 5, 5, c, il, bd)
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(png))
      assert(img != null, s"ImageIO rejected ${w}x$h il=$il bd=$bd c=$c")
      val raster = img.getRaster
      val shift = if (bd == 16) 8 else 0 // ImageIO keeps 16-bit samples
      for (y <- 0 until h; x <- 0 until w) {
        val expected = (x * 3 + y * 5) % 256
        val chs = if (c == 2) 3 else 1
        for (ch <- 0 until chs)
          assert((raster.getSample(x, y, ch) >> shift) === expected,
            s"ImageIO sample ($x,$y) ch=$ch ${w}x$h il=$il bd=$bd c=$c")
      }
    }
  }

  test("png Adam7/16-bit malformed robustness: every truncation decodes " +
      "to null, never throws") {
    for ((il, bd) <- Seq((1, 8), (0, 16), (1, 16))) {
      val png = PngRaster.synth(9, 8, 3, 5, 5, 2, il, bd)
      for (len <- 0 until png.length)
        assert(PngRaster.toPpm(java.util.Arrays.copyOf(png, len)) == null,
          s"truncation at $len il=$il bd=$bd")
    }
    // 16-bit palette is invalid per the PNG spec: reject, don't decode
    val pal16 = {
      val png = PngRaster.synth(9, 8, 3, 5, 0, 0, 0, 16).clone()
      png(16 + 9) = 3 // colorType byte -> palette
      png
    }
    assert(PngRaster.toPpm(pal16) == null, "16-bit palette must be null")
  }

  test("png sub-byte depths (r12): 1/2/4-bit gray round-trips plain and " +
      "Adam7, and ImageIO agrees on every raw sample") {
    for (bd <- Seq(1, 2, 4); il <- Seq(0, 1); f <- Seq(0, 4, 5);
         (w, h) <- Seq((1, 1), (7, 5), (16, 12), (33, 21))) {
      val png = PngRaster.synth(w, h, 3, 5, f, 0, il, bd)
      val got = PngRaster.toPpm(png)
      assert(got != null, s"decode failed bd=$bd il=$il f=$f ${w}x$h")
      // synth quantizes the formula byte to d bits; decode re-expands by
      // the exact left-bit-replication factor 255/(2^d−1)
      val scale = 255 / ((1 << bd) - 1)
      val header = s"P5\n$w $h\n255\n".getBytes("US-ASCII")
      val expected = header ++ Array.tabulate(w * h) { p =>
        (((((p % w) * 3 + (p / w) * 5) % 256) >> (8 - bd)) * scale).toByte
      }
      assert(java.util.Arrays.equals(got, expected),
        s"pixels bd=$bd il=$il f=$f ${w}x$h")
    }
    for (bd <- Seq(1, 2, 4); il <- Seq(0, 1)) {
      val png = PngRaster.synth(9, 8, 3, 5, 5, 0, il, bd)
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(png))
      assert(img != null, s"ImageIO rejected bd=$bd il=$il")
      val raster = img.getRaster
      for (y <- 0 until 8; x <- 0 until 9)
        assert(raster.getSample(x, y, 0) ===
          (((x * 3 + y * 5) % 256) >> (8 - bd)),
          s"ImageIO ($x,$y) bd=$bd il=$il")
    }
  }

  test("png sub-byte palette: a hand-built 2-bit palette stream decodes " +
      "to the looked-up colors; an out-of-range index is null") {
    // 5x3 at depth 2: stride = ceil(5·2/8) = 2 bytes, rows pre-packed
    // MSB-first from the spec text, filter 0, four palette entries
    val pal = Array(0xe0, 0x10, 0x20, 0x30, 0xc0, 0x50, 0x60, 0x70, 0x90,
      0x01, 0x02, 0x03) // 4 RGB entries
    val rows = Array( // pixel indices per row
      Array(0, 1, 2, 3, 0), Array(3, 2, 1, 0, 1), Array(1, 1, 2, 2, 3))
    def build(palLen: Int): Array[Byte] = {
      val raw = new java.io.ByteArrayOutputStream()
      for (r <- rows) {
        raw.write(0) // filter none
        raw.write(((r(0) << 6) | (r(1) << 4) | (r(2) << 2) | r(3)) & 0xff)
        raw.write((r(4) << 6) & 0xff)
      }
      val d = new Deflater(); d.setInput(raw.toByteArray); d.finish()
      val zbuf = new Array[Byte](256)
      val zos = new java.io.ByteArrayOutputStream()
      while (!d.finished()) zos.write(zbuf, 0, d.deflate(zbuf))
      d.end()
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a,
        '\n'), 0, 8)
      def chunk(typ: String, data: Array[Byte]): Unit = {
        val len = data.length
        out.write(Array[Byte]((len >>> 24).toByte, (len >>> 16).toByte,
          (len >>> 8).toByte, len.toByte), 0, 4)
        val tb = typ.getBytes("US-ASCII")
        val crc = new CRC32(); crc.update(tb); crc.update(data)
        out.write(tb, 0, 4); out.write(data, 0, len)
        val cv = crc.getValue
        out.write(Array[Byte]((cv >>> 24).toByte, (cv >>> 16).toByte,
          (cv >>> 8).toByte, cv.toByte), 0, 4)
      }
      chunk("IHDR", Array[Byte](0, 0, 0, 5, 0, 0, 0, 3, 2, 3, 0, 0, 0))
      chunk("PLTE", pal.take(palLen * 3).map(_.toByte))
      chunk("IDAT", zos.toByteArray)
      chunk("IEND", Array.emptyByteArray)
      out.toByteArray
    }
    val got = PngRaster.toPpm(build(4))
    assert(got != null, "2-bit palette rejected")
    val header = s"P6\n5 3\n255\n".getBytes("US-ASCII")
    val expected = header ++ rows.flatten.flatMap(i =>
      Seq(pal(i * 3).toByte, pal(i * 3 + 1).toByte, pal(i * 3 + 2).toByte))
    assert(java.util.Arrays.equals(got, expected), "palette colors")
    // shrink the palette to 3 entries: index 3 becomes out of range
    assert(PngRaster.toPpm(build(3)) == null, "oob index must be null")
  }

  // test-local clean-room encoder: raw pixels in, one PNG out, with a
  // CHOSEN filter byte per scanline (filters computed from the spec
  // text, independently of PngRaster.synth's implementation)
  private def encodePng(w: Int, h: Int, colorType: Int,
      pixels: Array[Array[Int]], palette: Array[Int],
      rowFilter: Int => Int): Array[Byte] = {
    val bpp = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    }
    val stride = w * bpp
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val raw = new Array[Byte](h * (stride + 1))
    for (y <- 0 until h) {
      val f = rowFilter(y)
      raw(y * (stride + 1)) = f.toByte
      for (i <- 0 until stride) {
        val cur = pixels(y)(i)
        val left = if (i >= bpp) pixels(y)(i - bpp) else 0
        val up = if (y > 0) pixels(y - 1)(i) else 0
        val ul = if (y > 0 && i >= bpp) pixels(y - 1)(i - bpp) else 0
        val pred = f match {
          case 0 => 0; case 1 => left; case 2 => up
          case 3 => (left + up) / 2; case 4 => paeth(left, up, ul)
        }
        raw(y * (stride + 1) + 1 + i) = ((cur - pred) & 0xff).toByte
      }
    }
    val d = new Deflater(); d.setInput(raw); d.finish()
    val zbuf = new Array[Byte](raw.length + 64)
    val zos = new java.io.ByteArrayOutputStream()
    while (!d.finished()) zos.write(zbuf, 0, d.deflate(zbuf))
    d.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'),
      0, 8)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write(Array[Byte]((len >>> 24).toByte, (len >>> 16).toByte,
        (len >>> 8).toByte, len.toByte), 0, 4)
      val tb = typ.getBytes("US-ASCII")
      val crc = new CRC32(); crc.update(tb); crc.update(data)
      out.write(tb, 0, 4); out.write(data, 0, len)
      val cv = crc.getValue
      out.write(Array[Byte]((cv >>> 24).toByte, (cv >>> 16).toByte,
        (cv >>> 8).toByte, cv.toByte), 0, 4)
    }
    chunk("IHDR", Array[Byte]((w >>> 24).toByte, (w >>> 16).toByte,
      (w >>> 8).toByte, w.toByte, (h >>> 24).toByte, (h >>> 16).toByte,
      (h >>> 8).toByte, h.toByte, 8, colorType.toByte, 0, 0, 0))
    if (colorType == 3)
      chunk("PLTE", palette.map(_.toByte))
    chunk("IDAT", zos.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  test("png decode fuzz: random pixels, all five color types, random " +
      "per-row filters — decoder == raw pixels == the JDK's ImageIO") {
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 20) {
      val colorType = Seq(0, 2, 3, 4, 6)(trial % 5)
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(30)
      val bpp = colorType match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      }
      val paletteSize = 1 + rnd.nextInt(256)
      val palette = Array.fill(paletteSize * 3)(rnd.nextInt(256))
      val pixels = Array.fill(h)(Array.tabulate(w * bpp) { i =>
        if (colorType == 3) rnd.nextInt(paletteSize) else rnd.nextInt(256)
      })
      val png = encodePng(w, h, colorType, pixels, palette,
        _ => rnd.nextInt(5))
      val ppm = PngRaster.toPpm(png)
      assert(ppm != null, s"trial $trial ct=$colorType ${w}x$h")
      val hd = PpmRaster.parse(ppm)
      assert(hd != null && hd.w === w && hd.h === h)
      val outC = if (colorType == 0 || colorType == 4) 1 else 3
      assert(hd.channels === outC)
      // expected output channels from the raw pixels (alpha dropped,
      // palette resolved)
      def expected(x: Int, y: Int, ch: Int): Int = colorType match {
        case 0 => pixels(y)(x)
        case 2 => pixels(y)(x * 3 + ch)
        case 3 => palette(pixels(y)(x) * 3 + ch)
        case 4 => pixels(y)(x * 2)
        case 6 => pixels(y)(x * 4 + ch)
      }
      for (y <- 0 until h; x <- 0 until w; ch <- 0 until outC)
        assert((ppm(hd.off + (y * w + x) * outC + ch) & 0xff)
          === expected(x, y, ch),
          s"trial $trial ct=$colorType pixel ($x,$y) ch $ch")
      // the JDK's own decoder agrees on raw samples (validates the
      // test encoder itself, so the round trip can't share a bug)
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(png))
      assert(img != null, s"ImageIO rejected trial $trial")
      val raster = img.getRaster
      for (y <- 0 until h; x <- 0 until w) {
        colorType match {
          case 0 | 4 =>
            assert(raster.getSample(x, y, 0) === expected(x, y, 0))
          case 2 | 6 =>
            for (ch <- 0 until 3)
              assert(raster.getSample(x, y, ch) === expected(x, y, ch))
          case 3 =>
            // palette images surface as indexed rasters
            assert(palette(raster.getSample(x, y, 0) * 3) === expected(x, y, 0))
        }
      }
    }
  }

  test("png malformed robustness: every truncation and targeted header " +
      "corruption decodes to null, never throws") {
    val png = PngRaster.synth(12, 9, 3, 5, 5, 2)
    for (len <- 0 until png.length)
      assert(PngRaster.toPpm(java.util.Arrays.copyOf(png, len)) == null,
        s"truncation at $len")
    def corrupt(off: Int, v: Byte): Array[Byte] = {
      val c = png.clone(); c(off) = v; c
    }
    // IHDR data starts at 16: bitDepth +8, colorType +9, interlace +12.
    // Since r12, depth 16 and Adam7 are SUPPORTED — flipping the header
    // over an 8-bit plain stream now fails on the raw-size mismatch
    // (inflate under/overrun), which is the structural guard at work
    assert(PngRaster.toPpm(corrupt(16 + 8, 16)) == null,
      "16-bit header over an 8-bit stream")
    assert(PngRaster.toPpm(corrupt(16 + 8, 4)) == null, "bit depth 4")
    assert(PngRaster.toPpm(corrupt(16 + 9, 7)) == null, "bad color type")
    assert(PngRaster.toPpm(corrupt(16 + 12, 1)) == null,
      "Adam7 header over a plain stream")
    assert(PngRaster.toPpm(corrupt(16 + 12, 2)) == null, "interlace 2")
    assert(PngRaster.toPpm(corrupt(0, 'Q'.toByte)) == null, "bad signature")
    assert(PngRaster.toPpm(null) == null)
    assert(PngRaster.toPpm(Array[Byte]()) == null)
    // a zero dimension must be rejected, not divide/overflow downstream
    assert(PngRaster.toPpm(corrupt(16 + 3, 0)) == null, "width 0")
    // palette image without PLTE
    val noPlte = {
      val pixels = Array.fill(3)(Array.fill(4)(0))
      val withPlte = encodePng(4, 3, 3, pixels, Array(10, 20, 30), _ => 0)
      // drop the PLTE chunk (starts after IHDR: 8 + 25 = 33; length 12+3)
      val plteLen = 12 + 3
      withPlte.take(33) ++ withPlte.drop(33 + plteLen)
    }
    assert(PngRaster.toPpm(noPlte) == null, "type 3 without PLTE")
    // FDICT: a zlib header with the preset-dictionary flag makes
    // Inflater return 0 with needsDictionary()=true forever — the decode
    // loop must bail on zero progress, not spin. CMF 0x78 needs
    // FLG ≡ 1 (mod 31); 0x20 is the one with the FDICT bit set. IDAT
    // data starts at 8 (sig) + 25 (IHDR chunk) + 8 = 41; FLG is byte 42.
    val fdict = {
      val c = png.clone()
      assert((c(41) & 0xff) == 0x78, "synth zlib CMF")
      c(42) = 0x20
      c
    }
    val t0 = System.nanoTime()
    assert(PngRaster.toPpm(fdict) == null, "FDICT stream")
    assert(System.nanoTime() - t0 < 5e9.toLong, "FDICT must fail fast")
    // the expression surface: null in, null out, batch of valid rows fine
    val df = Seq(1L, 2L).toDF("i")
    val r = df.selectExpr(
      "graft_ppm_phash(graft_png_to_ppm(graft_synth_png(16L, 12L, i, 2L, 5L, 2L)))" +
        " AS ph").collect()
    assert(r.forall(!_.isNullAt(0)))
  }
}

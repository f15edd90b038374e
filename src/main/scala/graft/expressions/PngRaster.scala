package graft.expressions

import java.util.zip.{CRC32, DataFormatException, Deflater, Inflater}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** PNG pixel decode with ZERO external dependencies — PNG's compression
  * is zlib (JDK `java.util.zip.Inflater`) and its per-scanline filters
  * are five small integer predictors (None/Sub/Up/Average/Paeth), so the
  * dominant web-image format needs no codec library: this closes the
  * "codec-bound stub" for PNG and routes decoded pixels through the
  * EXISTING raster kernels ([[PpmRaster]] phash/resize/near-dup) by
  * converting to the engine's P5/P6 interchange form.
  *
  * Scope (returns NULL outside it, never garbage — the PpmRaster
  * discipline):
  *  - EVERY spec-valid (depth, color type) combination: depths 1/2/4
  *    (gray + palette; sub-byte samples unpack MSB-first, gray expands
  *    by the spec's 255/(2^d−1) left-bit-replication factor — exact
  *    integers 255/85/17), 8, and 16 (a 16-bit sample keeps its HIGH
  *    byte, the PNG-recommended 16→8 reduction); color types 0 (gray),
  *    2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA); alpha is DROPPED
  *    (a dedup/phash pipeline keys on pixel content; compositing needs
  *    a background choice that belongs to a render stage, not a key);
  *  - interlace 0 or 1 (r12: Adam7 is seven independent sub-images over
  *    the same five filters — each pass defilters against its own
  *    previous scanline, then scatters onto the 8×8 pixel lattice);
  *  - chunk CRCs are not verified (a corrupt stream fails structurally
  *    at inflate/length checks; the decoder is a reader, not a
  *    validator);
  *  - total pixels capped at [[PpmRaster.MaxPixels]] and every size
  *    guard in DIVISION form — a crafted header must not wrap a Long
  *    product past the checks.
  */
object PngRaster {
  private val Sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n',
    0x1a, '\n')

  /** Adam7 pass lattice: (xStart, yStart, xStep, yStep) per pass. */
  private val Adam7: Array[(Int, Int, Int, Int)] = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** The single trivial "pass" of a non-interlaced image. */
  private val NoInterlace: Array[(Int, Int, Int, Int)] =
    Array((0, 0, 1, 1))

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  /** Channels per color type; -1 for unsupported. Palette counts as one
    * channel in the FILTER step (bpp is bytes per pixel pre-palette). */
  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    case _ => -1
  }

  /** Paeth predictor (PNG spec §9, the RFC 2083 pseudocode): nearest of
    * left/up/up-left to `a + b - c`, ties break left, then up. */
  def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Decode a PNG payload to the engine's P5 (gray output) / P6 (color
    * output) interchange bytes; null on anything outside the documented
    * scope or structurally broken. */
  def toPpm(png: Array[Byte]): Array[Byte] = {
    if (png == null || png.length < Sig.length + 12) return null
    var i = 0
    while (i < Sig.length) { if (png(i) != Sig(i)) return null; i += 1 }

    var w, h, colorType = -1
    var bitDepth = -1
    var interlace = -1
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var sawIend = false
    var p = Sig.length
    // chunk walk: length(4 BE) type(4) data crc(4, unchecked)
    while (!sawIend) {
      if (p + 8 > png.length) return null
      val len = be32(png, p)
      if (len > Int.MaxValue - 12 || p + 8 + len + 4 > png.length) return null
      val typ = new String(png, p + 4, 4, "US-ASCII")
      val dataOff = p + 8
      typ match {
        case "IHDR" =>
          if (len != 13 || w >= 0) return null
          val wL = be32(png, dataOff); val hL = be32(png, dataOff + 4)
          if (wL <= 0 || hL <= 0 || wL > Int.MaxValue || hL > Int.MaxValue)
            return null
          w = wL.toInt; h = hL.toInt
          if (h.toLong > PpmRaster.MaxPixels / w) return null
          bitDepth = png(dataOff + 8) & 0xff
          colorType = png(dataOff + 9) & 0xff
          val compression = png(dataOff + 10) & 0xff
          val filterMethod = png(dataOff + 11) & 0xff
          interlace = png(dataOff + 12) & 0xff
          val depthOk = colorType match { // PNG spec §11.2.2 valid combos
            case 0 => bitDepth == 1 || bitDepth == 2 || bitDepth == 4 ||
              bitDepth == 8 || bitDepth == 16
            case 3 => bitDepth == 1 || bitDepth == 2 || bitDepth == 4 ||
              bitDepth == 8
            case _ => bitDepth == 8 || bitDepth == 16
          }
          if (!depthOk || channelsOf(colorType) < 0 ||
            compression != 0 || filterMethod != 0 ||
            (interlace != 0 && interlace != 1))
            return null
        case "PLTE" =>
          if (w < 0 || len % 3 != 0 || len > 256 * 3) return null
          palette = java.util.Arrays.copyOfRange(png, dataOff,
            dataOff + len.toInt)
        case "IDAT" =>
          if (w < 0) return null
          idat.write(png, dataOff, len.toInt)
        case "IEND" => sawIend = true
        case _ => // ancillary chunks skipped
      }
      p = dataOff + len.toInt + 4
    }
    if (w < 0) return null
    if (colorType == 3 && palette == null) return null

    val channels = channelsOf(colorType)
    val sampleBytes = bitDepth / 8
    // the filter unit (PNG spec §9): bytes per complete pixel ROUNDED UP
    // TO ONE — sub-byte depths (r12) filter on whole packed bytes
    val bpp = math.max(1, channels * sampleBytes)
    // packed scanline bytes for a wp-pixel row (sub-byte rows byte-pad)
    def strideL(wp: Int): Long =
      if (bitDepth < 8) (wp.toLong * bitDepth + 7) / 8 else wp.toLong * bpp
    val passes = if (interlace == 1) Adam7 else NoInterlace
    // raw stream size: per pass with a nonzero sub-image, hp scanlines of
    // (1 filter byte + packed stride); division-form accumulation cannot
    // wrap
    var expected = 0L
    for ((xs, ys, xStep, yStep) <- passes) {
      val wp = if (w > xs) (w - xs + xStep - 1) / xStep else 0
      val hp = if (h > ys) (h - ys + yStep - 1) / yStep else 0
      if (wp > 0 && hp > 0) expected += hp.toLong * (1L + strideL(wp))
    }
    if (expected <= 0 || expected > Int.MaxValue) return null
    val raw = new Array[Byte](expected.toInt)
    val inf = new Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        // Zero progress with output space free means the stream cannot
        // advance: truncated (needsInput) or an FDICT preset-dictionary
        // header (needsDictionary — inflate returns 0 forever on it, so
        // treating it as progress would spin this loop uninterruptibly
        // on a crafted payload).
        if (n == 0) return null
        got += n
      }
      if (got < raw.length) return null
    } catch { case _: DataFormatException => return null }
    finally inf.end()

    // defilter each pass against its OWN previous scanline, then scatter
    // its pixels onto the full lattice; 16-bit samples keep the high
    // (first, big-endian) byte. `plane` is 8-bit samples, w*channels wide.
    val outStride = w * channels
    val plane = new Array[Byte](h * outStride)
    var rawOff = 0
    for ((xs, ys, xStep, yStep) <- passes) {
      val wp = if (w > xs) (w - xs + xStep - 1) / xStep else 0
      val hp = if (h > ys) (h - ys + yStep - 1) / yStep else 0
      if (wp > 0 && hp > 0) {
        val pStride = strideL(wp).toInt // ≤ expected ≤ Int.MaxValue
        val pass = new Array[Byte](hp * pStride)
        var y = 0
        while (y < hp) {
          val f = raw(rawOff + y * (pStride + 1)) & 0xff
          if (f > 4) return null
          val src = rawOff + y * (pStride + 1) + 1
          val dst = y * pStride
          var x = 0
          while (x < pStride) {
            val a = if (x >= bpp) pass(dst + x - bpp) & 0xff else 0
            val b = if (y > 0) pass(dst - pStride + x) & 0xff else 0
            val c = if (y > 0 && x >= bpp) pass(dst - pStride + x - bpp) & 0xff
              else 0
            val pred = f match {
              case 0 => 0
              case 1 => a
              case 2 => b
              case 3 => (a + b) / 2
              case 4 => paeth(a, b, c)
            }
            pass(dst + x) = ((raw(src + x) & 0xff) + pred).toByte
            x += 1
          }
          // scatter this scanline's pixels to (xs + x2*xStep, ys + y*yStep)
          val ty = ys + y * yStep
          if (bitDepth < 8) {
            // unpack MSB-first d-bit samples; gray scales by the spec's
            // left-bit-replication factor 255/(2^d−1) — exact integers
            // (255, 85, 17); palette indices pass through unscaled
            val scale = if (colorType == 0) 255 / ((1 << bitDepth) - 1) else 1
            val mask = (1 << bitDepth) - 1
            var x2 = 0
            while (x2 < wp) {
              val bitpos = x2 * bitDepth
              val v = ((pass(dst + (bitpos >> 3)) & 0xff) >>>
                (8 - bitDepth - (bitpos & 7))) & mask
              plane(ty * outStride + (xs + x2 * xStep)) = (v * scale).toByte
              x2 += 1
            }
          } else {
            var x2 = 0
            while (x2 < wp) {
              val s = dst + x2 * bpp
              val d = ty * outStride + (xs + x2 * xStep) * channels
              var ch = 0
              while (ch < channels) {
                plane(d + ch) = pass(s + ch * sampleBytes)
                ch += 1
              }
              x2 += 1
            }
          }
          y += 1
        }
        rawOff += hp * (pStride + 1)
      }
    }

    // convert to the P5/P6 interchange form the PpmRaster kernels read
    val outChannels = colorType match {
      case 0 | 4 => 1
      case _ => 3
    }
    val magic = if (outChannels == 3) "P6" else "P5"
    val header = s"$magic\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * outChannels)
    System.arraycopy(header, 0, out, 0, header.length)
    var pix = 0
    val n = w * h
    colorType match {
      case 0 => System.arraycopy(plane, 0, out, header.length, n)
      case 4 => // gray+alpha: keep gray, drop alpha
        while (pix < n) {
          out(header.length + pix) = plane(pix * 2); pix += 1
        }
      case 2 => System.arraycopy(plane, 0, out, header.length, n * 3)
      case 6 => // RGBA: drop alpha
        while (pix < n) {
          val s = pix * 4; val d = header.length + pix * 3
          out(d) = plane(s); out(d + 1) = plane(s + 1); out(d + 2) = plane(s + 2)
          pix += 1
        }
      case 3 => // palette lookup; an out-of-range index is malformed
        val entries = palette.length / 3
        while (pix < n) {
          val idx = plane(pix) & 0xff
          if (idx >= entries) return null
          val d = header.length + pix * 3
          out(d) = palette(idx * 3); out(d + 1) = palette(idx * 3 + 1)
          out(d + 2) = palette(idx * 3 + 2)
          pix += 1
        }
    }
    out
  }

  /** Encode one gray-pattern raster as a standards-valid PNG (correct
    * CRCs — external readers accept it), pixel (x, y) = `(x·a + y·b)
    * mod 256` on every channel: the [[GraftSynthPpm]] fixture, PNG form.
    * `filterMode` 0-4 applies that filter to every scanline, 5 cycles
    * over emitted scanlines — the knob that makes a round-trip anchor
    * exercise ALL five defilter predictors. `colorType` 0 (gray) or
    * 2 (RGB). r12: `interlace` 1 emits the Adam7 pass structure (each
    * pass filtered against its own previous scanline); `bitDepth` 16
    * writes big-endian sample pairs whose HIGH byte is the formula value
    * (low byte `(x·b + y·a + 7) mod 256`), so the 16→8 decode of any
    * synth is byte-identical to its 8-bit sibling. */
  def synth(w: Int, h: Int, a: Long, b: Long, filterMode: Int,
      colorType: Int, interlace: Int = 0, bitDepth: Int = 8): Array[Byte] = {
    require(bitDepth >= 8 || colorType == 0,
      "sub-byte synth is gray-only (the spec's valid-combination table)")
    val channels = if (colorType == 2) 3 else 1
    val sampleBytes = bitDepth / 8
    val bpp = math.max(1, channels * sampleBytes)
    val passes = if (interlace == 1) Adam7 else NoInterlace
    val rawOut = new java.io.ByteArrayOutputStream()
    var emittedY = 0 // filterMode 5 cycles across every emitted scanline
    for ((xs, ys, xStep, yStep) <- passes) {
      val wp = if (w > xs) (w - xs + xStep - 1) / xStep else 0
      val hp = if (h > ys) (h - ys + yStep - 1) / yStep else 0
      if (wp > 0 && hp > 0) {
        val pStride =
          if (bitDepth < 8) (wp * bitDepth + 7) / 8 else wp * bpp
        // previous RECONSTRUCTED scanline of THIS pass (filters predict
        // from recon bytes within the pass)
        val prev = new Array[Byte](pStride)
        val cur = new Array[Byte](pStride)
        var y2 = 0
        while (y2 < hp) {
          val ty = ys + y2 * yStep
          if (bitDepth < 8) {
            // quantize the formula byte to d bits (v >> (8−d)) and pack
            // MSB-first; decode re-expands by 255/(2^d−1)
            java.util.Arrays.fill(cur, 0, pStride, 0.toByte)
            var x2 = 0
            while (x2 < wp) {
              val tx = xs + x2 * xStep
              val vd = (((tx * a + ty * b) % 256) >>> (8 - bitDepth)).toInt
              val bitpos = x2 * bitDepth
              cur(bitpos >> 3) = (cur(bitpos >> 3) |
                (vd << (8 - bitDepth - (bitpos & 7)))).toByte
              x2 += 1
            }
          } else {
            var x2 = 0
            while (x2 < wp) {
              val tx = xs + x2 * xStep
              val v = ((tx * a + ty * b) % 256).toByte
              val lo = ((tx * b + ty * a + 7) % 256).toByte
              var ch = 0
              while (ch < channels) {
                if (sampleBytes == 1) cur(x2 * bpp + ch) = v
                else {
                  cur(x2 * bpp + ch * 2) = v
                  cur(x2 * bpp + ch * 2 + 1) = lo
                }
                ch += 1
              }
              x2 += 1
            }
          }
          val f = if (filterMode == 5) emittedY % 5 else filterMode
          rawOut.write(f)
          var i = 0
          while (i < pStride) {
            val left = if (i >= bpp) cur(i - bpp) & 0xff else 0
            val up = if (y2 > 0) prev(i) & 0xff else 0
            val ul = if (y2 > 0 && i >= bpp) prev(i - bpp) & 0xff else 0
            val pred = f match {
              case 0 => 0
              case 1 => left
              case 2 => up
              case 3 => (left + up) / 2
              case 4 => paeth(left, up, ul)
            }
            rawOut.write(((cur(i) & 0xff) - pred) & 0xff)
            i += 1
          }
          System.arraycopy(cur, 0, prev, 0, pStride)
          emittedY += 1
          y2 += 1
        }
      }
    }
    val raw = rawOut.toByteArray

    val deflated = {
      val d = new Deflater()
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](raw.length + 64)
      val bos = new java.io.ByteArrayOutputStream()
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
      d.end()
      bos.toByteArray
    }

    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Sig, 0, Sig.length)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      bos.write(Array[Byte]((len >>> 24).toByte, (len >>> 16).toByte,
        (len >>> 8).toByte, len.toByte), 0, 4)
      val tb = typ.getBytes("US-ASCII")
      val crc = new CRC32()
      crc.update(tb); crc.update(data)
      bos.write(tb, 0, 4)
      bos.write(data, 0, len)
      val c = crc.getValue
      bos.write(Array[Byte]((c >>> 24).toByte, (c >>> 16).toByte,
        (c >>> 8).toByte, c.toByte), 0, 4)
    }
    chunk("IHDR", Array[Byte]((w >>> 24).toByte, (w >>> 16).toByte,
      (w >>> 8).toByte, w.toByte, (h >>> 24).toByte, (h >>> 16).toByte,
      (h >>> 8).toByte, h.toByte, bitDepth.toByte, colorType.toByte, 0, 0,
      interlace.toByte))
    chunk("IDAT", deflated)
    chunk("IEND", Array.emptyByteArray)
    bos.toByteArray
  }
}

/** `graft_png_to_ppm(binary) -> binary` — [[PngRaster.toPpm]] as a
  * native codegen expression: the scan-side conversion that lets a PNG
  * column enter every existing raster kernel (`graft_ppm_phash`,
  * `graft_ppm_resize`, Hamming near-dup) unchanged. NULL outside the
  * documented decode scope. */
case class GraftPngToPpm(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_png_to_ppm expects binary, got ${t.sql}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_png_to_ppm"

  override protected def nullSafeEval(input: Any): Any =
    PngRaster.toPpm(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("ppm")
    nullSafeCodeGen(ctx, ev, b => s"""
      byte[] $r = graft.expressions.PngRaster.toPpm($b);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }""")
  }

  override protected def withNewChildInternal(newChild: Expression): GraftPngToPpm =
    copy(child = newChild)
}

/** `graft_synth_png(w, h, a, b, filterMode, colorType[, interlace[,
  * bitDepth]]) -> binary` — [[PngRaster.synth]] in-plan: the arithmetic
  * PNG fixture generator for hash-checked decode round trips (the
  * [[GraftSynthPpm]] convention; same pixel formula, so for colorType 2
  * the decode of this payload — at either bit depth, interlaced or not —
  * is BYTE-IDENTICAL to `graft_synth_ppm(w,h,a,b)`). Bounded to 2²²
  * pixels. */
case class GraftSynthPng(override val children: Seq[Expression])
    extends Expression {
  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_synth_png"
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size < 6 || children.size > 8)
      TypeCheckResult.TypeCheckFailure(
        "graft_synth_png expects 6 to 8 bigint arguments")
    else if (children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_synth_png expects bigint arguments")

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val l = vs.map(_.asInstanceOf[Long])
    build(l(0), l(1), l(2), l(3), l(4), l(5),
      if (l.size > 6) l(6) else 0L, if (l.size > 7) l(7) else 8L)
  }

  def build(w: Long, h: Long, a: Long, b: Long, f: Long, c: Long,
      interlace: Long, bitDepth: Long): Array[Byte] = {
    // division-form bound (the GraftSynthPpm discipline): w*h can wrap
    require(w > 0 && h > 0 && h <= (1L << 22) / w,
      s"graft_synth_png: need 0 < w*h <= 2^22, got ${w}x$h")
    require(a >= 0 && b >= 0 && a <= (1L << 20) && b <= (1L << 20),
      s"graft_synth_png: a, b must be in [0, 2^20], got $a, $b")
    require(f >= 0 && f <= 5, s"graft_synth_png: filterMode in [0,5], got $f")
    require(c == 0 || c == 2, s"graft_synth_png: colorType 0 or 2, got $c")
    require(interlace == 0 || interlace == 1,
      s"graft_synth_png: interlace 0 or 1, got $interlace")
    require(bitDepth == 1 || bitDepth == 2 || bitDepth == 4 ||
      bitDepth == 8 || bitDepth == 16,
      s"graft_synth_png: bitDepth 1/2/4/8/16, got $bitDepth")
    require(bitDepth >= 8 || c == 0,
      s"graft_synth_png: sub-byte depths are gray-only, got c=$c")
    PngRaster.synth(w.toInt, h.toInt, a, b, f.toInt, c.toInt,
      interlace.toInt, bitDepth.toInt)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftSynthPng", this,
      classOf[GraftSynthPng].getName)
    val gens = children.map(_.genCode(ctx))
    val anyNull = gens.map(_.isNull.toString).mkString(" || ")
    val vals = gens.map(_.value).padTo(7, "0L").padTo(8, "8L")
    ev.copy(code = code"""
        ${gens.map(_.code.toString).mkString("\n")}
        boolean ${ev.isNull} = $anyNull;
        byte[] ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.build(${vals.mkString(", ")});
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GraftSynthPng =
    GraftSynthPng(newChildren)
}

object GraftSynthPng {
  def apply(wE: Expression, hE: Expression, aE: Expression, bE: Expression,
      fE: Expression, cE: Expression): GraftSynthPng =
    GraftSynthPng(Seq(wE, hE, aE, bE, fE, cE))
}

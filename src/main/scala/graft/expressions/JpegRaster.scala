package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Baseline JPEG pixel decode with ZERO external dependencies — the last
  * high-frequency crawl raster format (the [[PngRaster]] precedent):
  * canonical Huffman entropy decode, dequantization, an 8×8 separable
  * IDCT, chroma upsampling by sample replication, and the JFIF
  * YCbCr→RGB transform, emitting the engine's P5/P6 interchange bytes so
  * decoded pixels enter the EXISTING raster kernels (`graft_ppm_phash`,
  * `graft_ppm_resize`, Hamming near-dup) unchanged.
  *
  * Scope (NULL outside it, never garbage):
  *  - baseline and extended-sequential Huffman, 8-bit precision (SOF0 /
  *    SOF1); progressive (SOF2) and arithmetic coding return NULL —
  *    both need a second entropy machine for a shrinking share of crawl
  *    images, and NULL routes them to a slow path explicitly;
  *  - 1 component (gray → P5) or 3 components (YCbCr → P6, any sampling
  *    factors 1-2 with replication upsampling); CMYK/4-component NULL;
  *  - one interleaved scan (the baseline norm); restart markers (DRI /
  *    RSTn) supported — a crawl JPEG with restarts is common;
  *  - decode artifacts: the IDCT here is double-precision separable —
  *    maximally accurate, deterministic across platforms (strictfp-free
  *    JVM double math is IEEE-defined); chroma upsampling is nearest
  *    (sample replication), the libjpeg "fancy upsampling OFF" behavior,
  *    chosen because it is exactly reproducible in SQL;
  *  - total pixels capped at [[PpmRaster.MaxPixels]], size guards in
  *    division form (the crafted-header discipline).
  *
  * [[synth]] emits block-constant baseline JPEGs whose decode is EXACT
  * (DC-only blocks survive quantization at qDC = 8 losslessly and any
  * correct IDCT reproduces a constant block bit-for-bit), so a catalog
  * anchor can hash the decode against a SQL oracle that replays the
  * block formula — lossy-codec determinism without tolerance hashing.
  * The JpegFuzzSpec differential pins the decoder against the JDK's own
  * ImageIO on ImageIO-ENCODED images (subsampled, non-constant) within
  * a small tolerance, and on synth fixtures exactly.
  */
object JpegRaster {

  // zigzag order: zz(i) = raster index of the i-th coefficient
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private val CosTable: Array[Double] = {
    val t = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) {
        t(u * 8 + x) = math.cos((2 * x + 1) * u * math.Pi / 16.0) *
          (if (u == 0) math.sqrt(0.5) else 1.0) / 2.0
        x += 1
      }
      u += 1
    }
    t
  }

  /** 8×8 separable inverse DCT, rows then columns, in place. */
  private def idct8x8(blk: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) { // rows
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += blk(y * 8 + u) * CosTable(u * 8 + x); u += 1 }
        tmp(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) { // columns
      var y2 = 0
      while (y2 < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += tmp(v * 8 + x) * CosTable(v * 8 + y2); v += 1 }
        blk(y2 * 8 + x) = s
        y2 += 1
      }
      x += 1
    }
  }

  /** Canonical Huffman table in the JPEG spec's F.16 decode form. */
  private final class Huff(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val values: Array[Byte] = vals
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) == 0) { minCode(l) = 0; maxCode(l) = -1 }
        else {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  /** Entropy-coded-segment bit reader with 0xFF00 unstuffing; decodes
    * never read past a marker (nextBit returns -1 there). */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    def nextBit(): Int = {
      if (cnt == 0) {
        if (pos >= data.length) return -1
        var b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= data.length) return -1
          val m = data(pos) & 0xff
          if (m == 0x00) pos += 1
          else { pos -= 1; return -1 } // marker: stop, leave pos on 0xFF
        }
        buf = b; cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }
    /** Byte-align and consume an expected RSTn marker; false if absent. */
    def syncRestart(n: Int): Boolean = {
      cnt = 0
      if (pos + 1 >= data.length) return false
      if ((data(pos) & 0xff) != 0xff) return false
      val m = data(pos + 1) & 0xff
      if (m != 0xd0 + n) return false
      pos += 2
      true
    }
    def receive(s: Int): Int = {
      var v = 0
      var i = 0
      while (i < s) {
        val b = nextBit(); if (b < 0) return Int.MinValue
        v = (v << 1) | b
        i += 1
      }
      v
    }
  }

  private def decodeSym(r: BitReader, h: Huff): Int = {
    var code = 0
    var l = 1
    while (l <= 16) {
      val b = r.nextBit(); if (b < 0) return -1
      code = (code << 1) | b
      if (h.maxCode(l) >= 0 && code <= h.maxCode(l))
        return h.values(h.valPtr(l) + code - h.minCode(l)) & 0xff
      l += 1
    }
    -1
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0
    else if (v < (1 << (s - 1))) v - (1 << s) + 1
    else v

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def clamp(v: Double): Int = {
    val r = math.round(v).toInt
    if (r < 0) 0 else if (r > 255) 255 else r
  }

  private final class Component {
    var id = 0
    var h = 0
    var v = 0
    var qId = 0
    var dcTbl = 0
    var acTbl = 0
    var plane: Array[Int] = null // padded to full MCU grid
    var planeW = 0
    var planeH = 0
    var pred = 0
  }

  /** Decode a baseline JPEG payload to P5/P6 interchange bytes; null on
    * anything outside the documented scope or structurally broken. */
  def toPpm(jpg: Array[Byte]): Array[Byte] = {
    if (jpg == null || jpg.length < 4) return null
    if ((jpg(0) & 0xff) != 0xff || (jpg(1) & 0xff) != 0xd8) return null
    val quant = new Array[Array[Int]](4)
    val dcTables = new Array[Huff](4)
    val acTables = new Array[Huff](4)
    var comps: Array[Component] = null
    var w = 0
    var h = 0
    var restartInterval = 0
    var p = 2
    while (p + 4 <= jpg.length) {
      if ((jpg(p) & 0xff) != 0xff) return null
      val marker = jpg(p + 1) & 0xff
      if (marker == 0xff) {
        p += 1 // fill byte before a marker (spec B.1.1.2)
      } else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) {
        p += 2 // bare markers (shouldn't appear here, but harmless)
      } else if (marker == 0xd9) {
        return null // EOI before any scan
      } else {
        val len = be16(jpg, p + 2)
        if (len < 2 || p + 2 + len > jpg.length) return null
        val d = p + 4 // segment payload
        val dEnd = p + 2 + len
        marker match {
          case 0xdb => // DQT: one or more tables
            var q = d
            while (q < dEnd) {
              val pq = (jpg(q) & 0xff) >> 4
              val tq = jpg(q) & 0x0f
              if (tq > 3 || pq > 1) return null
              val tbl = new Array[Int](64)
              q += 1
              var i = 0
              while (i < 64) {
                if (pq == 1) { // 16-bit entries
                  if (q + 2 > dEnd) return null
                  tbl(i) = be16(jpg, q); q += 2
                } else {
                  if (q >= dEnd) return null
                  tbl(i) = jpg(q) & 0xff; q += 1
                }
                if (tbl(i) == 0) return null
                i += 1
              }
              quant(tq) = tbl
            }
          case 0xc4 => // DHT: one or more tables
            var q = d
            while (q < dEnd) {
              val tc = (jpg(q) & 0xff) >> 4
              val th = jpg(q) & 0x0f
              if (tc > 1 || th > 3) return null
              q += 1
              if (q + 16 > dEnd) return null
              val bits = new Array[Int](16)
              var total = 0
              var i = 0
              while (i < 16) {
                bits(i) = jpg(q + i) & 0xff; total += bits(i); i += 1
              }
              q += 16
              if (total > 256 || q + total > dEnd) return null
              val vals = java.util.Arrays.copyOfRange(jpg, q, q + total)
              q += total
              val tbl = new Huff(bits, vals)
              if (tc == 0) dcTables(th) = tbl else acTables(th) = tbl
            }
          case 0xc0 | 0xc1 => // SOF0 / SOF1: sequential Huffman, 8-bit
            if (comps != null) return null
            if (dEnd - d < 6) return null
            val precision = jpg(d) & 0xff
            if (precision != 8) return null
            h = be16(jpg, d + 1)
            w = be16(jpg, d + 3)
            val nc = jpg(d + 5) & 0xff
            if (w <= 0 || h <= 0 || (nc != 1 && nc != 3)) return null
            if (h.toLong > PpmRaster.MaxPixels / w) return null
            if (dEnd - d < 6 + nc * 3) return null
            comps = Array.fill(nc)(new Component)
            var i = 0
            while (i < nc) {
              val o = d + 6 + i * 3
              val c = comps(i)
              c.id = jpg(o) & 0xff
              c.h = (jpg(o + 1) & 0xff) >> 4
              c.v = jpg(o + 1) & 0x0f
              c.qId = jpg(o + 2) & 0xff
              if (c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2 || c.qId > 3)
                return null
              i += 1
            }
          case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
              0xcd | 0xce | 0xcf =>
            return null // progressive / lossless / arithmetic: out of scope
          case 0xdd => // DRI
            if (dEnd - d < 2) return null
            restartInterval = be16(jpg, d)
          case 0xda => // SOS: the single interleaved scan
            if (comps == null) return null
            val ns = jpg(d) & 0xff
            if (ns != comps.length) return null // non-interleaved: NULL
            if (dEnd - d < 1 + ns * 2 + 3) return null
            var i = 0
            while (i < ns) {
              val cid = jpg(d + 1 + i * 2) & 0xff
              val c = comps.find(_.id == cid).getOrElse(return null)
              c.dcTbl = (jpg(d + 2 + i * 2) & 0xff) >> 4
              c.acTbl = jpg(d + 2 + i * 2) & 0x0f
              if (c.dcTbl > 3 || c.acTbl > 3) return null
              i += 1
            }
            val ss = jpg(d + 1 + ns * 2) & 0xff
            val se = jpg(d + 2 + ns * 2) & 0xff
            if (ss != 0 || se != 63) return null // baseline spectral range
            return decodeScan(jpg, dEnd, w, h, comps, quant, dcTables,
              acTables, restartInterval)
          case _ => // APPn / COM / others: skip
        }
        p = dEnd
      }
    }
    null // no scan found
  }

  /** Entropy-decode the interleaved scan starting at `scanStart`, then
    * upsample + color-transform into P5/P6. */
  private def decodeScan(jpg: Array[Byte], scanStart: Int, w: Int, h: Int,
      comps: Array[Component], quant: Array[Array[Int]],
      dcTables: Array[Huff], acTables: Array[Huff],
      restartInterval: Int): Array[Byte] = {
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    for (c <- comps) {
      c.planeW = mcusX * c.h * 8
      c.planeH = mcusY * c.v * 8
      // planeW*planeH <= (w+15)*(h+15)*4 — bounded by the MaxPixels guard
      if (c.planeH.toLong * c.planeW > 16L * PpmRaster.MaxPixels) return null
      c.plane = new Array[Int](c.planeW * c.planeH)
      if (quant(c.qId) == null) return null
      if (dcTables(c.dcTbl) == null || acTables(c.acTbl) == null) return null
      c.pred = 0
    }
    val r = new BitReader(jpg, scanStart)
    val coef = new Array[Double](64)
    var mcu = 0
    val mcuCount = mcusX * mcusY
    var rstN = 0
    while (mcu < mcuCount) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!r.syncRestart(rstN)) return null
        rstN = (rstN + 1) & 7
        for (c <- comps) c.pred = 0
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      for (c <- comps) {
        val qt = quant(c.qId)
        val dcT = dcTables(c.dcTbl)
        val acT = acTables(c.acTbl)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            java.util.Arrays.fill(coef, 0.0)
            // DC
            val s = decodeSym(r, dcT)
            if (s < 0 || s > 15) return null
            val diffBits = r.receive(s)
            if (diffBits == Int.MinValue) return null
            c.pred += extend(diffBits, s)
            coef(0) = c.pred.toDouble * qt(0)
            // AC
            var k = 1
            while (k < 64) {
              val rs = decodeSym(r, acT)
              if (rs < 0) return null
              val run = rs >> 4
              val size = rs & 0x0f
              if (size == 0) {
                if (run == 15) k += 16 // ZRL
                else k = 64 // EOB
              } else {
                k += run
                if (k > 63) return null
                val vb = r.receive(size)
                if (vb == Int.MinValue) return null
                coef(Zigzag(k)) = extend(vb, size).toDouble * qt(k)
                k += 1
              }
            }
            idct8x8(coef)
            // place into the component plane (level shift +128)
            val ox = (mx * c.h + bx) * 8
            val oy = (my * c.v + by) * 8
            var yy = 0
            while (yy < 8) {
              val dst = (oy + yy) * c.planeW + ox
              var xx = 0
              while (xx < 8) {
                c.plane(dst + xx) = clamp(coef(yy * 8 + xx) + 128.0)
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
      }
      mcu += 1
    }
    // the stream must CLOSE: byte-align, then (skipping 0xFF fill) an
    // EOI marker. A crawl-truncated file whose entropy happens to parse
    // is still a broken document — NULL, never a silently cropped image.
    var q = r.pos
    while (q + 1 < jpg.length && (jpg(q) & 0xff) == 0xff &&
      (jpg(q + 1) & 0xff) == 0xff) q += 1
    if (q + 1 >= jpg.length || (jpg(q) & 0xff) != 0xff ||
      (jpg(q + 1) & 0xff) != 0xd9) return null

    // upsample + color transform into the interchange form
    val outChannels = if (comps.length == 1) 1 else 3
    val magic = if (outChannels == 3) "P6" else "P5"
    val header = s"$magic\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * outChannels)
    System.arraycopy(header, 0, out, 0, header.length)
    if (outChannels == 1) {
      val c = comps(0)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          // replication sampling of the (possibly padded) plane
          val sx = x * c.h / hMax
          val sy = y * c.v / vMax
          out(header.length + y * w + x) =
            c.plane(sy * c.planeW + sx).toByte
          x += 1
        }
        y += 1
      }
    } else {
      val cy = comps(0); val cb = comps(1); val cr = comps(2)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yv = cy.plane((y * cy.v / vMax) * cy.planeW + x * cy.h / hMax)
          val bv = cb.plane((y * cb.v / vMax) * cb.planeW + x * cb.h / hMax)
          val rv = cr.plane((y * cr.v / vMax) * cr.planeW + x * cr.h / hMax)
          val d = header.length + (y * w + x) * 3
          out(d) = clamp(yv + 1.402 * (rv - 128)).toByte
          out(d + 1) = clamp(yv - 0.344136 * (bv - 128) -
            0.714136 * (rv - 128)).toByte
          out(d + 2) = clamp(yv + 1.772 * (bv - 128)).toByte
          x += 1
        }
        y += 1
      }
    }
    out
  }

  // -------------------------------------------------------------------
  // synth: block-constant baseline JPEG with EXACT decode
  // -------------------------------------------------------------------

  private final class BitWriter(bos: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        buf = (buf << 1) | ((code >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          bos.write(buf)
          if (buf == 0xff) bos.write(0x00) // stuffing
          buf = 0; cnt = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = { // pad with 1s (the spec's convention)
      while (cnt != 0) put(1, 1)
    }
  }

  /** Encode a block-constant gray/RGB baseline JPEG: the 8×8 block at
    * (bi, bj) holds value `(bi·a + bj·b) mod 256` on every channel
    * (chroma constant 128, so RGB == Y exactly). With every quant entry
    * 8, a constant block's lone DC coefficient `8·(v−128)` quantizes to
    * `v−128` WITHOUT loss, and any correct IDCT reproduces the constant
    * — the decode is bit-exact and SQL-replayable despite the codec
    * being lossy in general. `colorType` 0 → 1-component gray, 2 → 3
    * 3-component YCbCr (1×1 sampling). */
  def synth(w: Int, h: Int, a: Long, b: Long, colorType: Int): Array[Byte] = {
    val nc = if (colorType == 2) 3 else 1
    val bos = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { bos.write(0xff); bos.write(m) }
    def seg(m: Int, payload: Array[Int]): Unit = {
      marker(m)
      val len = payload.length + 2
      bos.write(len >> 8); bos.write(len & 0xff)
      payload.foreach(v => bos.write(v & 0xff))
    }
    marker(0xd8) // SOI
    // DQT table 0, all entries 8 (natural order == zigzag for constants)
    seg(0xdb, Array(0x00) ++ Array.fill(64)(8))
    if (nc == 3) seg(0xdb, Array(0x01) ++ Array.fill(64)(8))
    // SOF0
    val sof = Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, nc) ++
      (0 until nc).flatMap(i =>
        Seq(i + 1, 0x11, if (i == 0) 0 else 1))
    seg(0xc0, sof.toArray)
    // DHT DC table 0: 12 symbols (categories 0-11) at code length 4
    seg(0xc4, Array(0x00, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
      ++ (0 to 11))
    // DHT AC table 0: the single EOB symbol at code length 1
    seg(0xc4, Array(0x10, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
    // SOS
    seg(0xda, Array(nc) ++ (1 to nc).flatMap(i => Seq(i, 0x00)) ++
      Seq(0, 63, 0))
    // entropy data: one MCU per 8x8 block (1x1 sampling), interleaved
    val bw = new BitWriter(bos)
    val blocksX = (w + 7) / 8
    val blocksY = (h + 7) / 8
    val pred = new Array[Int](nc)
    def category(v: Int): Int = {
      var s = 0
      var m = math.abs(v)
      while (m != 0) { s += 1; m >>= 1 }
      s
    }
    var bj = 0
    while (bj < blocksY) {
      var bi = 0
      while (bi < blocksX) {
        var c = 0
        while (c < nc) {
          val v = if (c == 0) ((bi * a + bj * b) % 256).toInt else 128
          val dc = v - 128 // quantized DC at q=8: 8*(v-128)/8
          val diff = dc - pred(c)
          pred(c) = dc
          val s = category(diff)
          bw.put(s, 4) // DC huffman: code == category, 4 bits
          if (s > 0)
            bw.put(if (diff < 0) diff - 1 + (1 << s) else diff, s)
          bw.put(0, 1) // AC: EOB (code 0, 1 bit)
          c += 1
        }
        bi += 1
      }
      bj += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    bos.toByteArray
  }
}

/** `graft_jpeg_to_ppm(binary) -> binary` — [[JpegRaster.toPpm]] as a
  * native codegen expression: the scan-side conversion that lets a
  * baseline JPEG column enter every existing raster kernel. NULL
  * outside the documented decode scope. */
case class GraftJpegToPpm(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_jpeg_to_ppm expects binary, got ${t.sql}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jpeg_to_ppm"

  override protected def nullSafeEval(input: Any): Any =
    JpegRaster.toPpm(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("ppm")
    nullSafeCodeGen(ctx, ev, b => s"""
      byte[] $r = graft.expressions.JpegRaster.toPpm($b);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }""")
  }

  override protected def withNewChildInternal(newChild: Expression): GraftJpegToPpm =
    copy(child = newChild)
}

/** `graft_synth_jpeg(w, h, a, b, colorType) -> binary` —
  * [[JpegRaster.synth]] in-plan: the block-constant JPEG fixture whose
  * decode is exact (see synth). Bounded to 2²² pixels. */
case class GraftSynthJpeg(wE: Expression, hE: Expression, aE: Expression,
    bE: Expression, cE: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(wE, hE, aE, bE, cE)
  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_synth_jpeg"
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_synth_jpeg expects five bigint arguments")

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val Seq(w, h, a, b, c) = vs.map(_.asInstanceOf[Long])
    build(w, h, a, b, c)
  }

  def build(w: Long, h: Long, a: Long, b: Long, c: Long): Array[Byte] = {
    require(w > 0 && h > 0 && h <= (1L << 22) / w,
      s"graft_synth_jpeg: need 0 < w*h <= 2^22, got ${w}x$h")
    require(a >= 0 && b >= 0 && a <= (1L << 20) && b <= (1L << 20),
      s"graft_synth_jpeg: a, b must be in [0, 2^20], got $a, $b")
    require(c == 0 || c == 2, s"graft_synth_jpeg: colorType 0 or 2, got $c")
    JpegRaster.synth(w.toInt, h.toInt, a, b, c.toInt)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftSynthJpeg", this,
      classOf[GraftSynthJpeg].getName)
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
      newChildren: IndexedSeq[Expression]): GraftSynthJpeg =
    GraftSynthJpeg(newChildren(0), newChildren(1), newChildren(2),
      newChildren(3), newChildren(4))
}

package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Real pixel kernels over PPM/PGM rasters — the codec-free formats
  * (P6 binary RGB / P5 binary grayscale: ASCII header + raw bytes) that
  * need no image library, so the decode→resize→perceptual-hash path can
  * be a true pixel computation in this environment rather than a stub.
  * Everything is EXACT integer arithmetic (floor divisions and
  * cross-multiplied comparisons, no floats), so a SQL oracle replays the
  * kernels bit-for-bit (the q94-q96 synthesize→parse convention).
  *
  * Conventions shared by all three expressions:
  *  - pixel x of an axis sized W maps to grid cell `i = x*G // W` for a
  *    G-cell grid (the exact partition `{x : floor(x*G/W) = i}`);
  *  - grayscale of an RGB pixel is `(299r + 587g + 114b) / 1000`
  *    (integer floor; weights sum to 1000 so r=g=b=v yields exactly v);
  *  - a malformed or undersized payload yields NULL, never garbage.
  */
object PpmRaster {
  /** Parsed header: (channels, width, height, data offset). Accepts P6
    * (3 channels) and P5 (1), maxval must be 255 (the 1-byte-per-sample
    * case); returns null on anything else or a short raster. */
  final case class Header(channels: Int, w: Int, h: Int, off: Int)

  /** Pixel-count cap (2²⁶ ≈ 67 MP — an 8K×8K raster): larger images
    * parse as NULL. Exists so the phash grid's exact cross-multiplied
    * integer comparisons can never overflow Long. */
  val MaxPixels: Long = 1L << 26

  def parse(b: Array[Byte]): Header = {
    if (b == null || b.length < 10) return null
    if (b(0) != 'P' || (b(1) != '5' && b(1) != '6')) return null
    val channels = if (b(1) == '6') 3 else 1
    var i = 2
    // three whitespace-separated ints (w, h, maxval), '#' comments allowed
    val vals = new Array[Int](3)
    var vi = 0
    while (vi < 3) {
      while (i < b.length &&
        (b(i) == ' ' || b(i) == '\n' || b(i) == '\r' || b(i) == '\t')) i += 1
      if (i < b.length && b(i) == '#') {
        while (i < b.length && b(i) != '\n') i += 1
      } else {
        if (i >= b.length || b(i) < '0' || b(i) > '9') return null
        var v = 0L
        while (i < b.length && b(i) >= '0' && b(i) <= '9') {
          v = v * 10 + (b(i) - '0')
          if (v > Int.MaxValue) return null
          i += 1
        }
        vals(vi) = v.toInt
        vi += 1
      }
    }
    // exactly ONE whitespace byte separates the header from the raster
    if (i >= b.length ||
      !(b(i) == ' ' || b(i) == '\n' || b(i) == '\r' || b(i) == '\t')) return null
    i += 1
    val (w, h, maxval) = (vals(0), vals(1), vals(2))
    if (w <= 0 || h <= 0 || maxval != 255) return null
    // overflow-proof size guards (division, not product: a crafted
    // 2^31-ish dimension pair would wrap the Long product past both
    // checks and crash the kernels downstream — malformed must mean
    // NULL, never garbage). MaxPixels also keeps every cross-multiplied
    // comparison in GraftPpmPhash inside Long (cellSum·w·h ≤
    // 255·2²⁶·2²⁶ ≈ 1.1e18 < 2⁶³).
    if (h.toLong > PpmRaster.MaxPixels / w) return null
    val raster = w.toLong * h * channels
    if (raster > Int.MaxValue - i) return null
    if (b.length < i + raster) return null
    Header(channels, w, h, i)
  }

  /** Grayscale plane of a parsed raster (row-major, one int per pixel). */
  def grayPlane(b: Array[Byte], hd: Header): Array[Int] = {
    val n = hd.w * hd.h
    val g = new Array[Int](n)
    var p = 0
    if (hd.channels == 1) {
      while (p < n) { g(p) = b(hd.off + p) & 0xff; p += 1 }
    } else {
      while (p < n) {
        val o = hd.off + p * 3
        g(p) = (299 * (b(o) & 0xff) + 587 * (b(o + 1) & 0xff) +
          114 * (b(o + 2) & 0xff)) / 1000
        p += 1
      }
    }
    g
  }
}

/** `graft_synth_ppm(w, h, a, b) -> binary` — an in-plan synthesized P6
  * image whose pixel (x, y) is the gray value `(x·a + y·b) mod 256` on
  * all three channels: the arithmetic fixture generator for the
  * hash-checked decode round trips (the synthWavHeader convention, but
  * with a full raster). Bounded to 2²² pixels — a fixture generator,
  * not a renderer. */
case class GraftSynthPpm(wE: Expression, hE: Expression, aE: Expression,
    bE: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(wE, hE, aE, bE)
  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_synth_ppm"
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_synth_ppm expects (bigint, bigint, bigint, bigint)")

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val Seq(w, h, a, b) = vs.map(_.asInstanceOf[Long])
    build(w, h, a, b)
  }

  def build(w: Long, h: Long, a: Long, b: Long): Array[Byte] = {
    // division form: the product w*h itself can wrap Long for absurd
    // inputs and sail under the cap
    require(w > 0 && h > 0 && h <= (1L << 22) / w,
      s"graft_synth_ppm: need 0 < w*h <= 2^22, got ${w}x$h")
    // upper-bounded so x*a + y*b stays exact in Long (x, y < 2^22, so
    // coefficients up to 2^20 keep each term under 2^42): an unbounded
    // coefficient would wrap and silently diverge from the documented
    // (x·a + y·b) mod 256 an oracle replays in HUGEINT
    require(a >= 0 && b >= 0 && a <= (1L << 20) && b <= (1L << 20),
      s"graft_synth_ppm: a, b must be in [0, 2^20], got $a, $b")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + (w * h * 3).toInt)
    System.arraycopy(header, 0, out, 0, header.length)
    var y = 0
    var o = header.length
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((x * a + y * b) % 256).toByte
        out(o) = v; out(o + 1) = v; out(o + 2) = v
        o += 3; x += 1
      }
      y += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftSynthPpm", this,
      classOf[GraftSynthPpm].getName)
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
      newChildren: IndexedSeq[Expression]): GraftSynthPpm =
    GraftSynthPpm(newChildren(0), newChildren(1), newChildren(2), newChildren(3))
}

/** `graft_ppm_phash(binary) -> struct` — decode a P5/P6 raster and
  * compute the classic perceptual hashes over the exact 8×8 grayscale
  * box-filter grid:
  *
  *  - `ahash` (64 bits, bit `j*8+i` for grid cell (i, j)): cell mean ≥
  *    image mean, decided by the exact cross-multiplication
  *    `cellSum · (W·H) ≥ totalSum · cellArea`;
  *  - `dhash` (56 bits, bit `j*7+i`): cell (i+1, j) mean > cell (i, j)
  *    mean, again cross-multiplied — the horizontal-gradient hash;
  *  - `gray_total`: the exact grayscale sum (the checksum that makes a
  *    resize round trip hash-checkable).
  *
  * NULL for malformed payloads or images smaller than the 8×8 grid.
  * Near-dup search over the hashes is one Hamming-band join away
  * (the simhashNearDupPairs machinery applies unchanged). */
case class GraftPpmPhash(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_ppm_phash expects binary, got ${t.sql}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("gray_total", LongType, nullable = false),
    StructField("ahash", LongType, nullable = false),
    StructField("dhash", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ppm_phash"

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val hd = PpmRaster.parse(b)
    if (hd == null || hd.w < 8 || hd.h < 8) return null
    val g = PpmRaster.grayPlane(b, hd)
    val (w, h) = (hd.w, hd.h)
    // exact 8x8 box-filter grid: cellSums(j*8+i), cellAreas likewise
    val cellSum = new Array[Long](64)
    val cellArea = new Array[Long](64)
    var total = 0L
    var y = 0
    while (y < h) {
      val j = (y.toLong * 8 / h).toInt
      var x = 0
      while (x < w) {
        val i = (x.toLong * 8 / w).toInt
        val v = g(y * w + x)
        cellSum(j * 8 + i) += v
        cellArea(j * 8 + i) += 1
        total += v
        x += 1
      }
      y += 1
    }
    val wh = w.toLong * h
    var ahash = 0L
    var k = 0
    while (k < 64) {
      if (cellSum(k) * wh >= total * cellArea(k)) ahash |= (1L << k)
      k += 1
    }
    var dhash = 0L
    var j = 0
    while (j < 8) {
      var i = 0
      while (i < 7) {
        val l = j * 8 + i
        if (cellSum(l + 1) * cellArea(l) > cellSum(l) * cellArea(l + 1))
          dhash |= (1L << (j * 7 + i))
        i += 1
      }
      j += 1
    }
    InternalRow(w, h, total, ahash, dhash)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftPpmPhash", this,
      classOf[GraftPpmPhash].getName)
    // fresh local: with a non-nullable child nullSafeCodeGen emits the
    // snippet unbraced — a fixed name collides when two instances share
    // one codegen method
    val r = ctx.freshName("phash")
    nullSafeCodeGen(ctx, ev, b => s"""
      Object $r = $ref.nullSafeEvalPub($b);
      if ($r == null) { ${ev.isNull} = true; } else {
        ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $r;
      }""")
  }
  def nullSafeEvalPub(input: Any): Any = nullSafeEval(input)

  override protected def withNewChildInternal(newChild: Expression): GraftPpmPhash =
    copy(child = newChild)
}

/** `graft_ppm_resize(binary, w2, h2) -> binary` — exact box-filter
  * DOWNSCALE of a P5/P6 raster: target pixel (u, v) is the floor mean of
  * its source cell `{(x, y) : x·w2//w = u, y·h2//h = v}`, per channel.
  * Emits the same format back (P6 stays P6, P5 stays P5) so the output
  * re-enters any raster expression — the thumbnail stage of a multimodal
  * ingest. NULL for malformed payloads or an upscale request (a
  * training-data pipeline shrinks; upscaling is a render concern). */
case class GraftPpmResize(payload: Expression, w2E: Expression,
    h2E: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(payload, w2E, h2E)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_ppm_resize"
  override def checkInputDataTypes(): TypeCheckResult =
    (payload.dataType, w2E.dataType, h2E.dataType) match {
      case (BinaryType, LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_ppm_resize expects (binary, bigint, bigint)")
    }

  override def eval(input: InternalRow): Any = {
    val b = payload.eval(input)
    val w2 = w2E.eval(input)
    val h2 = h2E.eval(input)
    if (b == null || w2 == null || h2 == null) null
    else resize(b.asInstanceOf[Array[Byte]],
      w2.asInstanceOf[Long], h2.asInstanceOf[Long])
  }

  def resize(b: Array[Byte], w2L: Long, h2L: Long): Array[Byte] = {
    val hd = PpmRaster.parse(b)
    if (hd == null) return null
    if (w2L <= 0 || h2L <= 0 || w2L > hd.w || h2L > hd.h) return null
    val (w2, h2) = (w2L.toInt, h2L.toInt)
    val c = hd.channels
    val sums = new Array[Long](w2 * h2 * c)
    val areas = new Array[Long](w2 * h2)
    var y = 0
    while (y < hd.h) {
      val v = (y.toLong * h2 / hd.h).toInt
      var x = 0
      while (x < hd.w) {
        val u = (x.toLong * w2 / hd.w).toInt
        val cell = v * w2 + u
        areas(cell) += 1
        var ch = 0
        while (ch < c) {
          sums(cell * c + ch) +=
            (b(hd.off + (y * hd.w + x) * c + ch) & 0xff)
          ch += 1
        }
        x += 1
      }
      y += 1
    }
    val magic = if (c == 3) "P6" else "P5"
    val header = s"$magic\n$w2 $h2\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w2 * h2 * c)
    System.arraycopy(header, 0, out, 0, header.length)
    var cell = 0
    while (cell < w2 * h2) {
      var ch = 0
      while (ch < c) {
        out(header.length + cell * c + ch) =
          (sums(cell * c + ch) / areas(cell)).toByte
        ch += 1
      }
      cell += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftPpmResize", this,
      classOf[GraftPpmResize].getName)
    val gens = children.map(_.genCode(ctx))
    ev.copy(code = code"""
        ${gens.map(_.code.toString).mkString("\n")}
        boolean ${ev.isNull} =
          ${gens.map(_.isNull.toString).mkString(" || ")};
        byte[] ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.resize(${gens(0).value}, ${gens(1).value},
            ${gens(2).value});
          ${ev.isNull} = ${ev.value} == null;
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GraftPpmResize =
    GraftPpmResize(newChildren(0), newChildren(1), newChildren(2))
}

package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** REAL video-metadata decode from raw MP4 (ISO BMFF) payload bytes —
  * completing the [[ImageDims]] / [[AudioMeta]] container-header triple.
  * No codec needed: the metadata lives in the box structure:
  *
  *  - top-level box walk (BE u32 size + 4cc type; size==1 → 64-bit
  *    largesize; size==0 → box extends to EOF), requiring an `ftyp` lead;
  *  - `moov`/`mvhd` (movie header, v0 or v1): timescale, duration →
  *    duration_ms = duration · 1000 / timescale;
  *  - `moov`/`trak` children counted; each `trak`/`tkhd` (v0/v1) carries
  *    presentation width/height as 16.16 fixed point — the first track
  *    with nonzero dims provides them (audio tracks store 0×0).
  *
  * Returns `struct<timescale int, duration_ms bigint, n_tracks int,
  * width int, height int>`, or NULL for anything that does not parse.
  * Frame/pixel decode stays the documented stub in operators/Multimodal;
  * header extraction is the real production path, fused in codegen.
  */
case class VideoMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_video_meta expects binary, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("timescale", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("n_tracks", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_video_meta"

  override protected def nullSafeEval(input: Any): Any =
    evalBytes(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftVideoMeta", this, classOf[VideoMeta].getName)
    val tmp = ctx.freshName("meta")
    nullSafeCodeGen(ctx, ev, bytes =>
      s"""
         |Object $tmp = $ref.evalBytes($bytes);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (InternalRow) $tmp; }
       """.stripMargin)
  }

  /** Codegen entry point (shared with nullSafeEval). */
  def evalBytes(bytes: Array[Byte]): InternalRow =
    VideoMeta.parse(bytes) match {
      case null => null
      case m => new GenericInternalRow(Array[Any](
        m(0).toInt, m(1), m(2).toInt, m(3).toInt, m(4).toInt))
    }

  override protected def withNewChildInternal(newChild: Expression): VideoMeta =
    copy(child = newChild)
}

object VideoMeta {
  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Long =
    ((u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)) & 0xffffffffL
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t(0) && b(i + 1) == t(1) && b(i + 2) == t(2) && b(i + 3) == t(3)

  /** Box at `i` within [i, end): returns (payloadStart, payloadEnd,
    * nextBox) or null when the header is malformed / out of bounds. */
  private def box(b: Array[Byte], i: Int, end: Int): Array[Int] = {
    if (i + 8 > end) return null
    val size32 = be32(b, i)
    var header = 8
    var size = size32
    if (size32 == 1) {
      if (i + 16 > end) return null
      size = be64(b, i + 8); header = 16
    } else if (size32 == 0) size = (end - i).toLong // box runs to EOF
    if (size < header || size > end - i) return null
    Array(i + header, i + size.toInt, i + size.toInt)
  }

  /** [timescale, durationMs, nTracks, width, height] or null when the
    * payload is not a parseable MP4. */
  def parse(b: Array[Byte]): Array[Long] = {
    if (b == null || b.length < 16) return null
    val first = box(b, 0, b.length)
    if (first == null || !tag(b, 4, "ftyp")) return null
    var timescale = -1L; var durMs = -1L
    var nTracks = 0L; var width = 0L; var height = 0L
    var i = 0
    while (i < b.length) {
      val bx = box(b, i, b.length)
      if (bx == null) return null
      if (tag(b, i + 4, "moov")) {
        // walk moov children
        var j = bx(0)
        while (j < bx(1)) {
          val cb = box(b, j, bx(1))
          if (cb == null) return null
          if (tag(b, j + 4, "mvhd")) {
            val p = cb(0)
            if (p + 4 > cb(1)) return null
            val v = u8(b, p)
            if (v == 1) {
              if (p + 32 > cb(1)) return null
              timescale = be32(b, p + 20)
              if (timescale > 0) durMs = be64(b, p + 24) * 1000L / timescale
            } else {
              if (p + 24 > cb(1)) return null
              timescale = be32(b, p + 12)
              if (timescale > 0) durMs = be32(b, p + 16) * 1000L / timescale
            }
          } else if (tag(b, j + 4, "trak")) {
            nTracks += 1
            // find tkhd among trak children
            var t = cb(0)
            while (t < cb(1)) {
              val tb = box(b, t, cb(1))
              if (tb == null) return null
              if (tag(b, t + 4, "tkhd")) {
                val p = tb(0)
                val v = if (p < tb(1)) u8(b, p) else -1
                // width/height are 16.16 fixed at the end of the payload
                val wOff = if (v == 1) p + 88 else p + 76
                if (v >= 0 && wOff + 8 <= tb(1) && width == 0L) {
                  val tw = be32(b, wOff) >> 16
                  val th = be32(b, wOff + 4) >> 16
                  if (tw > 0 && th > 0) { width = tw; height = th }
                }
              }
              t = tb(2)
            }
          }
          j = cb(2)
        }
      }
      i = bx(2)
    }
    if (timescale <= 0 || durMs < 0) return null
    Array(timescale, durMs, nTracks, width, height)
  }
}

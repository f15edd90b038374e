package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** REAL image-dimension decode from raw payload bytes — no codec library
  * needed, because dimensions live in fixed header structures:
  *
  *  - PNG: 8-byte signature then the IHDR chunk — width/height are
  *    big-endian u32 at offsets 16/20;
  *  - JPEG: marker scan from SOI (FFD8) to the first SOFn (C0-C3, C5-C7,
  *    C9-CB, CD-CF) — height/width are big-endian u16 at +5/+7 into the
  *    frame header;
  *  - GIF: "GIF87a"/"GIF89a" then little-endian u16 width/height at 6/8.
  *
  * Returns `struct<width int, height int>`, or NULL for anything that
  * doesn't parse (truncated, other formats) — the pixel decode itself
  * remains the documented stub in operators/Multimodal (no codecs in this
  * environment), but dimension extraction is the real production path.
  */
case class ImageDims(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_image_dims expects binary, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_image_dims"

  override protected def nullSafeEval(input: Any): Any =
    ImageDims.parse(input.asInstanceOf[Array[Byte]]) match {
      case null => null
      case wh => new GenericInternalRow(Array[Any](wh(0), wh(1)))
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftImageDims", this, classOf[ImageDims].getName)
    val tmp = ctx.freshName("dims")
    nullSafeCodeGen(ctx, ev, bytes =>
      s"""
         |Object $tmp = $ref.evalBytes($bytes);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (InternalRow) $tmp; }
       """.stripMargin)
  }

  /** Codegen entry point (shared with nullSafeEval). */
  def evalBytes(bytes: Array[Byte]): InternalRow =
    ImageDims.parse(bytes) match {
      case null => null
      case wh => new GenericInternalRow(Array[Any](wh(0), wh(1)))
    }

  override protected def withNewChildInternal(newChild: Expression): ImageDims =
    copy(child = newChild)
}

object ImageDims {
  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  /** (width, height) or null when the payload is not a parseable
    * PNG/JPEG/GIF header. */
  def parse(b: Array[Byte]): Array[Int] = {
    if (b == null || b.length < 10) return null
    // PNG: 89 'P' 'N' 'G' 0D 0A 1A 0A + IHDR at fixed offset
    if (b.length >= 24 && u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
      return Array(be32(b, 16), be32(b, 20))
    // GIF: "GIF87a"/"GIF89a" + LE logical screen size
    if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return Array(le16(b, 6), le16(b, 8))
    // JPEG: SOI then marker scan to the first frame header
    if (u8(b, 0) == 0xff && u8(b, 1) == 0xd8) {
      var i = 2
      while (i + 3 < b.length) {
        if (u8(b, i) != 0xff) return null // lost sync
        val marker = u8(b, i + 1)
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) i += 2 // standalone
        else {
          val len = be16(b, i + 2)
          if (len < 2) return null
          val isSof = (marker >= 0xc0 && marker <= 0xcf) &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof) {
            if (i + 8 >= b.length) return null
            return Array(be16(b, i + 7), be16(b, i + 5)) // width, height
          }
          i += 2 + len
        }
      }
    }
    null
  }
}

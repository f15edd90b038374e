package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** REAL audio-metadata decode from raw WAV (RIFF) payload bytes — like
  * [[ImageDims]], no codec library needed because the metadata lives in the
  * container header:
  *
  *  - RIFF signature + "WAVE" form type;
  *  - "fmt " chunk: channels (LE u16 at +2), sample rate (LE u32 at +4),
  *    byte rate (LE u32 at +8), bits/sample (LE u16 at +14);
  *  - "data" chunk size → duration_ms = data_size · 1000 / byte_rate.
  *
  * Chunks are scanned in order with even-byte padding, so metadata chunks
  * (LIST/INFO) before fmt/data parse correctly. Returns
  * `struct<channels int, sample_rate int, bits int, duration_ms bigint>`,
  * or NULL for anything that doesn't parse — sample decode stays the
  * documented stub in operators/Multimodal; header extraction is the real
  * production path and runs fused in codegen.
  */
case class AudioMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_audio_meta expects binary, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_audio_meta"

  override protected def nullSafeEval(input: Any): Any =
    evalBytes(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftAudioMeta", this, classOf[AudioMeta].getName)
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
    AudioMeta.parse(bytes) match {
      case null => null
      case m => new GenericInternalRow(Array[Any](
        m(0).toInt, m(1).toInt, m(2).toInt, m(3)))
    }

  override protected def withNewChildInternal(newChild: Expression): AudioMeta =
    copy(child = newChild)
}

object AudioMeta {
  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) |
      (u8(b, i + 3).toLong << 24)) & 0xffffffffL

  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t(0) && b(i + 1) == t(1) && b(i + 2) == t(2) && b(i + 3) == t(3)

  /** The ONE RIFF/WAVE chunk walk (shared with [[WavPcm]] — a drifting
    * copy would let the metadata and PCM layers disagree on what parses):
    * `[channels, rate, bits, byteRate, dataOff, dataSize, format]` or
    * null when the payload is not a parseable RIFF/WAVE container. The
    * format tag travels so the PCM layer can refuse non-PCM payloads;
    * the metadata layer reports any format (duration is rate math). */
  def chunks(b: Array[Byte]): Array[Long] = {
    if (b == null || b.length < 36) return null
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return null
    var channels = -1L; var rate = -1L; var bits = -1L; var byteRate = -1L
    var dataSize = -1L; var dataOff = -1L; var format = -1L
    var i = 12
    while (i + 8 <= b.length && (channels < 0 || dataSize < 0)) {
      val size = le32(b, i + 4)
      if (tag(b, i, "fmt ")) {
        if (i + 8 + 16 > b.length) return null
        format = le16(b, i + 8)
        channels = le16(b, i + 10)
        rate = le32(b, i + 12)
        byteRate = le32(b, i + 16)
        bits = le16(b, i + 22)
      } else if (tag(b, i, "data")) {
        dataSize = size
        dataOff = i + 8
      }
      // chunks are word-aligned: odd sizes carry a pad byte
      i += 8 + size.toInt + (size.toInt & 1)
      if (size > Int.MaxValue - 16 || i < 0) return null
    }
    if (channels <= 0 || rate <= 0 || bits <= 0 || byteRate <= 0 || dataSize < 0) return null
    // rate/byte_rate are u32 on disk but int in the output struct: a
    // crafted/corrupt fmt chunk past 2^31 would wrap negative through the
    // .toInt narrowing in evalBytes — treat it as unparseable instead
    // (documented NULL), like every other malformed header.
    if (rate > Int.MaxValue || byteRate > Int.MaxValue) return null
    Array(channels, rate, bits, byteRate, dataOff, dataSize, format)
  }

  /** [channels, sampleRate, bits, durationMs] or null when the payload is
    * not a parseable RIFF/WAVE header. */
  def parse(b: Array[Byte]): Array[Long] = {
    val c = chunks(b)
    if (c == null) return null
    Array(c(0), c(1), c(2), c(5) * 1000L / c(3))
  }
}

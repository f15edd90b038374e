package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Real PCM kernels over WAV audio — the codec-free format (RIFF header +
  * raw little-endian int16 samples) that needs no audio library, so the
  * decode→analyze→downsample path is a true sample computation in this
  * environment, the audio twin of [[PpmRaster]]'s pixel kernels.
  * Lossless compressed audio routes here through [[FlacPcm]]
  * (`graft_flac_to_wav`); the lossy codecs — MP3/AAC/Opus — are a
  * reasoned non-replication (COVERAGE.md: conformance there is an RMS
  * bound, not bit-exactness, so no arithmetic oracle can exist).
  * Everything is EXACT integer arithmetic (truncating division,
  * the SQL integer-division convention), so an oracle replays the
  * kernels bit-for-bit from the synthesis formula without ever parsing
  * binary.
  *
  * Container parsing is [[AudioMeta.chunks]] — the ONE RIFF walk — so the
  * metadata and PCM layers can never disagree on what parses. Only
  * 16-bit PCM payloads decode; anything else is NULL, never garbage.
  */
object WavPcm {
  /** Sample-count cap for the synthesizer (2²⁰ ≈ 24 s at 44.1 kHz): a
    * fixture generator, not a renderer; also keeps i·a ≤ 2⁴⁰ exact. */
  val MaxSamples: Long = 1L << 20

  /** Decoded 16-bit PCM view: (channels, rate, sample offset, count).
    * Null unless the container parses AND the payload is 16-bit PCM with
    * an even in-bounds data chunk. */
  final case class Pcm(channels: Int, rate: Int, off: Int, n: Int)

  def pcm(b: Array[Byte]): Pcm = {
    val c = AudioMeta.chunks(b)
    if (c == null) return null
    val Array(channels, rate, bits, _, off, size, format) = c
    // format tag 1 = integer PCM: an ADPCM/float/extensible payload with
    // bits=16 would otherwise decode its compressed bytes as samples —
    // exactly the "garbage, never NULL" outcome the contract forbids
    if (format != 1L || bits != 16L || off < 0) return null
    if ((size & 1L) == 1L) return null
    if (off + size > b.length) return null
    Pcm(channels.toInt, rate.toInt, off.toInt, (size / 2).toInt)
  }

  def sample(b: Array[Byte], off: Int, i: Int): Int = {
    val o = off + i * 2
    ((b(o) & 0xff) | (b(o + 1) << 8)).toShort.toInt
  }

  /** A minimal mono 16-bit PCM WAV container around `n` samples. */
  def container(rate: Int, samples: Array[Short]): Array[Byte] =
    container(rate, 1, samples)

  /** The general form: `channels`-way interleaved 16-bit PCM (the
    * [[FlacPcm]] decode target — FLAC carries up to 8 channels). */
  def container(rate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def putTag(o: Int, t: String): Unit = {
      var k = 0; while (k < 4) { out(o + k) = t(k).toByte; k += 1 }
    }
    def putLe32(o: Int, v: Long): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte
      out(o + 3) = ((v >> 24) & 0xff).toByte
    }
    def putLe16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    putTag(0, "RIFF"); putLe32(4, 36L + dataLen); putTag(8, "WAVE")
    putTag(12, "fmt "); putLe32(16, 16L)
    putLe16(20, 1) // PCM
    putLe16(22, channels)
    putLe32(24, rate.toLong)
    putLe32(28, rate.toLong * 2 * channels) // byte rate
    putLe16(32, 2 * channels) // block align
    putLe16(34, 16) // bits
    putTag(36, "data"); putLe32(40, dataLen.toLong)
    var i = 0
    while (i < samples.length) {
      putLe16(44 + i * 2, samples(i) & 0xffff)
      i += 1
    }
    out
  }
}

/** `graft_synth_wav(n, rate, a, b) -> binary` — an in-plan synthesized
  * mono 16-bit PCM WAV whose sample i is `((i·a + b) mod 65536) − 32768`:
  * the arithmetic fixture generator for hash-checked decode round trips
  * (the [[GraftSynthPpm]] convention, one dimension down). */
case class GraftSynthWav(nE: Expression, rateE: Expression, aE: Expression,
    bE: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(nE, rateE, aE, bE)
  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_synth_wav"
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_synth_wav expects (bigint, bigint, bigint, bigint)")

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val Seq(n, rate, a, b) = vs.map(_.asInstanceOf[Long])
    build(n, rate, a, b)
  }

  def build(n: Long, rate: Long, a: Long, b: Long): Array[Byte] = {
    require(n > 0 && n <= WavPcm.MaxSamples,
      s"graft_synth_wav: need 0 < n <= 2^20, got $n")
    require(rate > 0 && rate <= 192000,
      s"graft_synth_wav: rate must be in 1..192000, got $rate")
    // bounded so i*a + b stays exact in Long (i < 2^20, a <= 2^20 keeps
    // the product under 2^40) — the GraftSynthPpm coefficient rule
    require(a >= 0 && b >= 0 && a <= (1L << 20) && b <= (1L << 20),
      s"graft_synth_wav: a, b must be in [0, 2^20], got $a, $b")
    val samples = new Array[Short](n.toInt)
    var i = 0L
    while (i < n) {
      samples(i.toInt) = (((i * a + b) % 65536L) - 32768L).toShort
      i += 1
    }
    WavPcm.container(rate.toInt, samples)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftSynthWav", this,
      classOf[GraftSynthWav].getName)
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
      newChildren: IndexedSeq[Expression]): GraftSynthWav =
    GraftSynthWav(newChildren(0), newChildren(1), newChildren(2), newChildren(3))
}

/** `graft_wav_pcm_stats(binary) -> struct` — decode a 16-bit PCM WAV and
  * fold the exact stream statistics an audio-curation pass filters on:
  *
  *  - `n_samples`: decoded sample count (all channels, stream order);
  *  - `peak`: max |s| (clipping detector; 32768 for a full-scale trough);
  *  - `sum_abs` / `sum_sq`: exact integer loudness bases — mean-abs and
  *    RMS are one division/sqrt away, left to the query so the stored
  *    values stay integers an oracle replays exactly;
  *  - `zero_crossings`: count of consecutive pairs whose signs differ
  *    (`(s < 0) ≠ (prev < 0)`, zero counts as non-negative) — the classic
  *    cheap pitch/noisiness proxy.
  *
  * NULL for malformed containers, non-16-bit payloads, or an empty data
  * chunk. Exactness: n ≤ 2³¹ samples of magnitude ≤ 2¹⁵ keep sum_abs
  * under 2⁴⁶ and sum_sq under 2⁶¹ — no overflow at any parseable size. */
case class GraftWavPcmStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_wav_pcm_stats expects binary, got ${t.sql}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_samples", LongType, nullable = false),
    StructField("peak", LongType, nullable = false),
    StructField("sum_abs", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("zero_crossings", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wav_pcm_stats"

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val p = WavPcm.pcm(b)
    if (p == null || p.n == 0) return null
    var i = 0
    var peak = 0L
    var sumAbs = 0L
    var sumSq = 0L
    var zc = 0L
    var prevNeg = false
    while (i < p.n) {
      val s = WavPcm.sample(b, p.off, i)
      val a = math.abs(s.toLong)
      if (a > peak) peak = a
      sumAbs += a
      sumSq += s.toLong * s
      val neg = s < 0
      if (i > 0 && neg != prevNeg) zc += 1
      prevNeg = neg
      i += 1
    }
    InternalRow(p.n.toLong, peak, sumAbs, sumSq, zc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftWavPcmStats", this,
      classOf[GraftWavPcmStats].getName)
    // fresh local: with a non-nullable child nullSafeCodeGen emits the
    // snippet unbraced, so a fixed name would collide when two instances
    // share one codegen method (the AudioMeta ctx.freshName convention)
    val r = ctx.freshName("wavStats")
    nullSafeCodeGen(ctx, ev, b => s"""
      Object $r = $ref.nullSafeEvalPub($b);
      if ($r == null) { ${ev.isNull} = true; } else {
        ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $r;
      }""")
  }
  def nullSafeEvalPub(input: Any): Any = nullSafeEval(input)

  override protected def withNewChildInternal(
      newChild: Expression): GraftWavPcmStats = copy(child = newChild)
}

/** `graft_wav_decimate(binary, k) -> binary` — exact block-mean
  * downsample of a MONO 16-bit PCM WAV by integer factor `k`: output
  * sample j is `trunc(Σ s[j·k .. j·k+k-1] / k)` over FULL blocks only
  * (the tail remainder is dropped — a partial block's mean is a
  * different statistic), emitted as a mono WAV at rate `max(1, rate/k)`.
  * The box-filter-not-interpolation choice mirrors [[GraftPpmResize]];
  * TRUNCATING division (Java `/`), because SQL integer division — DuckDB
  * `//` included, measured — truncates negative means toward zero. NULL
  * for malformed/non-mono payloads, k < 1, or fewer than k samples. */
case class GraftWavDecimate(payload: Expression, kE: Expression)
    extends Expression {
  override def children: Seq[Expression] = Seq(payload, kE)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_wav_decimate"
  override def checkInputDataTypes(): TypeCheckResult =
    (payload.dataType, kE.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_wav_decimate expects (binary, bigint)")
    }

  override def eval(input: InternalRow): Any = {
    val b = payload.eval(input)
    val k = kE.eval(input)
    if (b == null || k == null) null
    else decimate(b.asInstanceOf[Array[Byte]], k.asInstanceOf[Long])
  }

  def decimate(b: Array[Byte], kL: Long): Array[Byte] = {
    val p = WavPcm.pcm(b)
    if (p == null || p.channels != 1) return null
    if (kL < 1 || kL > p.n) return null
    val k = kL.toInt
    val blocks = p.n / k
    val out = new Array[Short](blocks)
    var j = 0
    while (j < blocks) {
      var s = 0L
      var i = 0
      while (i < k) { s += WavPcm.sample(b, p.off, j * k + i); i += 1 }
      out(j) = (s / k).toShort
      j += 1
    }
    WavPcm.container(math.max(1, p.rate / k), out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftWavDecimate", this,
      classOf[GraftWavDecimate].getName)
    val gens = children.map(_.genCode(ctx))
    ev.copy(code = code"""
        ${gens.map(_.code.toString).mkString("\n")}
        boolean ${ev.isNull} =
          ${gens.map(_.isNull.toString).mkString(" || ")};
        byte[] ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.decimate(${gens(0).value}, ${gens(1).value});
          ${ev.isNull} = ${ev.value} == null;
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GraftWavDecimate =
    GraftWavDecimate(newChildren(0), newChildren(1))
}

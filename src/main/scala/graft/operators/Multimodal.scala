package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extraction /
  * frame-sampling are partition-local batch transforms.
  *
  * Decode comes in two tiers. Header/metadata decode is REAL for all
  * three modalities (PNG/JPEG/GIF dims, WAV chunk walk, MP4 box walk —
  * codegen expressions). PIXEL/SAMPLE decode is real and
  * zero-dependency for every format where exactness is provable: PPM/
  * PGM, PNG (all spec-valid depths incl. sub-byte + Adam7), JPEG
  * (baseline AND progressive Huffman), WAV, and FLAC — see
  * expressions/{PpmRaster,PngRaster,JpegRaster,WavPcm,FlacPcm}.scala,
  * oracle-checked q199/q201/q206/q209/q211/q212. What remains a
  * deterministic STUB is the LOSSY codec tier (MP3/AAC video-frame
  * entropy) — a reasoned non-replication (COVERAGE.md: lossy
  * conformance is an RMS bound, not bit-exactness, so no arithmetic
  * oracle can exist); everything around it — schema, batch shape,
  * partition-local iteration, column plumbing — is the real production
  * path: swap `decodeStub` for a JNI/codec call and nothing else
  * changes. At 100 TB the binary payloads stay columnar in parquet
  * (never collected) and each task decodes its partition in fixed-size
  * batches to bound peak memory.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** STUB decode: a real implementation would hand `bytes` to an image or
    * audio codec. This deterministic fake derives an 8-dim feature vector
    * from byte statistics so the pipeline is testable end-to-end.
    */
  private[operators] def decodeStub(kind: String, bytes: Array[Byte]): Array[Float] = {
    if (bytes == null || bytes.isEmpty) return Array.fill(8)(0f)
    val hist = new Array[Long](8)
    var i = 0
    while (i < bytes.length) { hist(((bytes(i) & 0xff) >> 5)) += 1; i += 1 }
    val n = bytes.length.toFloat
    hist.map(_ / n)
  }

  private val batchSize = 64 // decode batch shape (rows per codec call batch)

  /** Feature extraction over the payload column: partition-local, batched.
    * Output keeps the key columns and appends `features: array<float>`.
    */
  /** One codec call per BATCH — the shape a real decoder needs (setup
    * amortizes across `batch.size` payloads). The stub maps rows 1:1; a
    * real implementation replaces only this function. */
  private[operators] def decodeStubBatch(
      batch: Seq[(String, Array[Byte])]): Seq[Array[Float]] =
    batch.map { case (kind, bytes) => decodeStub(kind, bytes) }

  def extractFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(media.schema.fields.toSeq :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val kindIdx = media.schema.fieldIndex("kind")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { it =>
      // the per-batch call is REAL (decodeStubBatch receives the whole
      // batch), so swapping in an actual codec keeps this plumbing
      it.grouped(batchSize).flatMap { batch =>
        val feats = decodeStubBatch(batch.map(r =>
          (r.getString(kindIdx), r.getAs[Array[Byte]](payloadIdx))))
        batch.lazyZip(feats).map((r, f) => Row.fromSeq(r.toSeq :+ f.toSeq))
      }
    }(enc)
  }

  /** Frame sampling for video-ish payloads: slice the payload into `n`
    * evenly spaced "frames" (real impl: keyframe extraction). Pure column
    * expressions — stays in codegen, no shuffle.
    */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"sampleFrames: n must be >= 1, got $n")
    // offsets multiply in BIGINT: i * length(payload) overflows 32-bit
    // for payloads past ~2 GB/n (ANSI abort; wraparound would emit
    // garbage frames counted from the END via negative substring starts)
    media.withColumn("frames",
      expr(s"transform(sequence(0, ${n - 1}), i -> " +
        s"substring(payload, CAST(CAST(i AS BIGINT) * " +
        s"CAST(length(payload) AS BIGINT) / $n AS INT) + 1, " +
        s"GREATEST(CAST(length(payload) / $n AS INT), 1)))"))
  }

  /** REAL dimension decode from payload bytes (PNG IHDR / JPEG SOF / GIF
    * logical screen — expressions/ImageDims.scala): appends
    * `decoded_dims struct<width,height>` (null when not parseable). This is
    * an actual header parse, not the feature stub — it needs no codec
    * library and runs fused in codegen, so at 100 TB dimension extraction
    * is a pure scan-side projection. */
  def decodeDims(media: DataFrame, payloadCol: String = "payload"): DataFrame =
    media.withColumn("decoded_dims",
      call_function("graft_image_dims", col(payloadCol)))

  /** Resize-to-fit for image payloads: scale the longer side down to
    * `maxDim` preserving aspect ratio (never upscale, floor division,
    * ≥ 1 px), replacing `payloadCol` with a payload carrying the NEW
    * dimensions and appending `resized: boolean`. The dimension math and
    * the binary round-trip (header parse → integer scale → header
    * re-synthesis, re-parseable by [[decodeDims]]) are real; only the
    * pixel re-encode is synthesized — this container has no image codec,
    * and a real pipeline swaps [[synthPngHeader]] for one. Unparseable
    * payloads pass through unchanged with `resized = false`.
    *
    * Pure column expressions fused into the scan — at 100 TB, resize
    * planning (which rows need work, what the target dims are) is a
    * shuffle-free projection; only the codec byte-work itself would move
    * to a [[extractFeatures]]-style partition-local batch. */
  def resizeImages(media: DataFrame, maxDim: Int,
      payloadCol: String = "payload"): DataFrame = {
    require(maxDim >= 1, "resizeImages: maxDim must be >= 1")
    val d = call_function("graft_image_dims", col(payloadCol))
    val w = d.getField("width").cast("long")
    val h = d.getField("height").cast("long")
    val m = greatest(w, h)
    // exact integer scale: floor(side · maxDim / m), clamped to >= 1 —
    // the double ratio is exact for header-range dims, so floor == DIV
    def fit(side: Column) =
      greatest(lit(1L), floor((side * lit(maxDim.toLong)) / m).cast("long"))
    val needs = m > maxDim
    // one withColumns call: both outputs evaluate against the ORIGINAL
    // payload (chained withColumn would re-parse the replaced bytes and
    // always report resized = false)
    media.withColumns(Map(
      payloadCol ->
        when(w.isNull || h.isNull || !needs, col(payloadCol))
          .otherwise(synthPngHeader(fit(w), fit(h))),
      "resized" ->
        when(w.isNull || h.isNull, lit(false)).otherwise(needs)))
  }

  /** REAL audio-metadata decode from payload bytes (WAV/RIFF header walk —
    * expressions/AudioMeta.scala): appends `decoded_audio
    * struct<channels,sample_rate,bits,duration_ms>` (null when not
    * parseable). r12: FLAC payloads route through the same API — when
    * the RIFF walk fails, the FLAC STREAMINFO walk supplies the same
    * struct. r13 (ADVICE): the FLAC branch is `graft_flac_meta` — a
    * header-only parse — NOT `graft_flac_to_wav`+reparse, which ran a
    * full sample decode (every frame, per-frame CRC-16, whole-stream
    * MD5) per row just to read 4 header fields STREAMINFO already
    * carries. Metadata here means header truth: a FLAC with corrupt
    * FRAME bytes still reports its header (decode-time validation lives
    * on the `graft_flac_to_wav` path). Like [[decodeDims]], a pure
    * scan-side projection — no shuffle. */
  def decodeAudioMeta(media: DataFrame, payloadCol: String = "payload"): DataFrame =
    media.withColumn("decoded_audio",
      coalesce(
        call_function("graft_audio_meta", col(payloadCol)),
        call_function("graft_flac_meta", col(payloadCol))))

  /** REAL video-metadata decode from payload bytes (MP4/ISO-BMFF box walk —
    * expressions/VideoMeta.scala): appends `decoded_video
    * struct<timescale,duration_ms,n_tracks,width,height>` (null when not
    * parseable). Completes the image/audio/video header-parse triple —
    * pure scan-side codegen projection, no codec, no shuffle. */
  /** WARC container → one row per archive record (`warc_rec
    * struct<rec_type,uri,status,mime,body>`), gzip members inflated,
    * HTTP responses pre-split — the ingest hop BEFORE [[decodeDims]] /
    * `graft_html_*` in a crawl pipeline ([[graft.expressions.WarcKernel]];
    * r13). Malformed archives explode to zero rows via the kernel's loud
    * NULL (use a left-style audit upstream to count them). Scan-side
    * generator expression — no shuffle; one payload parses once. */
  def warcRecords(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("warc_rec",
      explode(call_function("graft_warc_parse", col(payloadCol))))

  def decodeVideoMeta(media: DataFrame, payloadCol: String = "payload"): DataFrame =
    media.withColumn("decoded_video",
      call_function("graft_video_meta", col(payloadCol)))

  /** Metadata quality filter: keep decodable-looking media (non-empty
    * payload, sane dimensions) — predicate pushdown-friendly. */
  def filterValid(media: DataFrame): DataFrame =
    media.filter(col("payload").isNotNull && length(col("payload")) > 0 &&
      (col("kind") =!= "image" ||
        (col("meta.width") > 0 && col("meta.height") > 0)))

  /** Fail-fast range guard for the hex builders: `lpad` TRUNCATES an
    * over-wide hex string keeping the most-significant digits, which
    * would silently encode garbage into a synthesized header — raise
    * instead. */
  private def fitsBytes(v: Column, bytes: Int): Column = {
    val limit = if (bytes >= 8) lit(Long.MaxValue)
      else lit((1L << (8 * bytes)) - 1)
    when(v < 0 || v > limit,
      raise_error(concat(lit(s"value out of range for $bytes-byte field: "),
        v.cast("string")))).otherwise(v)
  }

  /** Little-endian hex of an integer column, `bytes` wide — the byte-order
    * building block for in-plan binary synthesis (big-endian `hex()` with
    * its byte pairs reversed). Fails loudly on values that don't fit the
    * field width. */
  def leHex(v: Column, bytes: Int): Column = {
    val h = lpad(hex(fitsBytes(v, bytes)), 2 * bytes, "0")
    concat((bytes to 1 by -1).map(b => substring(h, 2 * b - 1, 2)): _*)
  }

  /** Big-endian hex of an integer column, `bytes` wide. Fails loudly on
    * values that don't fit the field width (lpad would truncate keeping
    * the WRONG — most-significant — digits). */
  def beHex(v: Column, bytes: Int): Column =
    lpad(hex(fitsBytes(v, bytes)), 2 * bytes, "0")

  /** A minimal PNG header (signature + IHDR through width/height, 24+
    * bytes) as a BINARY column — the [[synthWavHeader]] trick for the
    * image parser: big-endian dimensions at fixed offsets. */
  def synthPngHeader(width: Column, height: Column): Column =
    unhex(concat(
      lit("89504E470D0A1A0A"),              // PNG signature
      lit("0000000D"), lit("49484452"),     // IHDR length + tag
      beHex(width.cast("long"), 4), beHex(height.cast("long"), 4),
      lit("0806000000"),                    // bit depth, color type, ...
      lit("00000000")))                     // CRC placeholder

  /** A minimal MP4 (ISO-BMFF) structure — ftyp + moov(mvhd v0 + one
    * trak/tkhd v0) — as a BINARY column. The real box walk must recover
    * (timescale, duration, 1 track, width, height); tkhd dimensions are
    * 16.16 fixed-point. */
  def synthMp4Header(timescale: Column, duration: Column,
      width: Column, height: Column): Column =
    unhex(concat(
      lit("00000010"), lit("66747970"), lit("69736F6D"), lit("00000000"),
      lit("000000D8"), lit("6D6F6F76"),                    // moov, size 216
      lit("0000006C"), lit("6D766864"), lit("00000000"),   // mvhd v0, size 108
      lit("00000000"), lit("00000000"),                    // ctime, mtime
      beHex(timescale.cast("long"), 4), beHex(duration.cast("long"), 4),
      lit("00" * 80),                                      // rate..next_track
      lit("00000064"), lit("7472616B"),                    // trak, size 100
      lit("0000005C"), lit("746B6864"), lit("00000000"),   // tkhd v0, size 92
      lit("00" * 72),                                      // ctime..matrix
      beHex(width.cast("long"), 2), lit("0000"),           // 16.16 width
      beHex(height.cast("long"), 2), lit("0000")))         // 16.16 height

  /** A complete RIFF/WAVE header (44 bytes, no sample body) as a BINARY
    * column, synthesized in-plan from integer field columns. Used to
    * exercise the REAL `graft_audio_meta` byte parser inside the
    * oracle-checked catalog: the fields are plain arithmetic both engines
    * can state, while the Spark side must round-trip them through actual
    * little-endian RIFF bytes and the chunk-walking decoder. `blockAlign`
    * is derived (`channels·bits/8`), `byteRate = rate·blockAlign`.
    */
  def synthWavHeader(channels: Column, rate: Column, bits: Column,
      dataSize: Column): Column = {
    val blockAlign = (channels * bits / 8).cast("long")
    val byteRate = (rate * blockAlign).cast("long")
    unhex(concat(
      lit("52494646"), leHex(dataSize + 36, 4),            // "RIFF" + size
      lit("57415645"),                                      // "WAVE"
      lit("666D7420"), leHex(lit(16L), 4),                  // "fmt " + 16
      leHex(lit(1L), 2), leHex(channels.cast("long"), 2),   // PCM, channels
      leHex(rate.cast("long"), 4), leHex(byteRate, 4),
      leHex(blockAlign, 2), leHex(bits.cast("long"), 2),
      lit("64617461"), leHex(dataSize.cast("long"), 4)))    // "data" + size
  }
}

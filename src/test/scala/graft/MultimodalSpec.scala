package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal binary-column plumbing: schema, batched feature extraction,
  * frame sampling, validity filtering. The decode itself is a deterministic
  * stub (no codecs here); the Spark-side path is real. */
class MultimodalSpec extends SparkSpec {

  private lazy val media = {
    val rows = (0L until 200L).map { i =>
      val payload =
        if (i % 17 == 0) null
        else Array.tabulate[Byte]((i % 50 + 10).toInt)(j => ((i * 31 + j) % 256).toByte)
      Row(i, if (i % 3 == 0) "image" else "audio", payload,
        Row(if (i % 3 == 0) 640 else null, if (i % 3 == 0) 480 else null,
          if (i % 3 == 0) null else java.lang.Long.valueOf(i * 1000)))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), Multimodal.mediaSchema)
  }

  test("extractFeatures appends an 8-dim float vector per row, distributed") {
    val out = Multimodal.extractFeatures(Multimodal.filterValid(media))
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val f = r.getAs[collection.Seq[Float]]("features")
      assert(f.length === 8)
      assert(math.abs(f.sum - 1.0f) < 1e-3) // byte histogram normalizes to 1
    }
    // deterministic: same input → same features
    val again = Multimodal.extractFeatures(Multimodal.filterValid(media)).collect()
    assert(rows.map(_.getAs[collection.Seq[Float]]("features")).toSeq ===
      again.map(_.getAs[collection.Seq[Float]]("features")).toSeq)
  }

  test("sampleFrames slices payload into n non-empty frames") {
    val out = Multimodal.sampleFrames(Multimodal.filterValid(media), 4)
    out.collect().foreach { r =>
      val frames = r.getAs[collection.Seq[Array[Byte]]]("frames")
      assert(frames.length === 4)
      val payload = r.getAs[Array[Byte]]("payload")
      assert(frames.forall(_.nonEmpty))
      // first frame starts at the payload start
      assert(frames.head.head === payload.head)
    }
  }

  test("filterValid drops null payloads and keeps dimensioned images") {
    val kept = Multimodal.filterValid(media)
    assert(kept.filter(col("payload").isNull).count() === 0)
    assert(kept.count() < media.count())
    assert(kept.filter(col("kind") === "image").count() > 0)
  }

  test("decodeAudioMeta parses REAL WAV headers (chunk walk); garbage is null") {
    import spark.implicits._
    def le16(v: Int) = Array((v & 0xff).toByte, (v >>> 8).toByte)
    def le32(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(tagS: String, body: Array[Byte]): Array[Byte] =
      tagS.getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def wav(channels: Int, rate: Int, bits: Int, dataBytes: Int,
        leadingChunks: Array[Byte] = Array.empty): Array[Byte] = {
      val byteRate = rate * channels * bits / 8
      val fmt = chunk("fmt ", le16(1) ++ le16(channels) ++ le32(rate.toLong) ++
        le32(byteRate.toLong) ++ le16(channels * bits / 8) ++ le16(bits))
      val data = chunk("data", new Array[Byte](dataBytes))
      val body = "WAVE".getBytes("US-ASCII") ++ leadingChunks ++ fmt ++ data
      "RIFF".getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body
    }
    // 2ch 44100Hz 16bit, 1 sec of data (byteRate=176400) → 1000 ms;
    // one with an odd-sized LIST chunk BEFORE fmt (pad-byte walk);
    // one mono 8kHz 8bit half-second; garbage and a truncated RIFF → null
    val listChunk = chunk("LIST", Array[Byte](1, 2, 3)) // odd size → padded
    // degenerate fmt: zero bits/sample but otherwise-valid fields → null,
    // consistent with the channels/rate/byteRate guards
    val zeroBits = {
      val fmt = chunk("fmt ", le16(1) ++ le16(2) ++ le32(44100L) ++
        le32(176400L) ++ le16(4) ++ le16(0))
      val body = "WAVE".getBytes("US-ASCII") ++ fmt ++
        chunk("data", new Array[Byte](100))
      "RIFF".getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body
    }
    val df = Seq(
      (1L, wav(2, 44100, 16, 176400)),
      (2L, wav(2, 44100, 16, 176400, leadingChunks = listChunk)),
      (3L, wav(1, 8000, 8, 4000)),
      (4L, Array.fill[Byte](64)(9)),
      (5L, "RIFF".getBytes("US-ASCII") ++ le32(4L) ++ "WAVE".getBytes("US-ASCII")),
      (6L, zeroBits))
      .toDF("media_id", "payload")
    val out = Multimodal.decodeAudioMeta(df).select("media_id", "decoded_audio.*")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None
         else Some((r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4))))).toMap
    assert(out(1L) === Some((2, 44100, 16, 1000L)))
    assert(out(2L) === Some((2, 44100, 16, 1000L)), "chunk walk must skip LIST+pad")
    assert(out(3L) === Some((1, 8000, 8, 500L)))
    assert(out(4L) === None && out(5L) === None)
    assert(out(6L) === None, "bits == 0 must be unparseable like other degenerate fmt fields")
  }

  test("decodeAudioMeta routes FLAC through the same surface (r12): the " +
      "RIFF walk fails, the FLAC decode supplies the WAV form") {
    import spark.implicits._
    // 16000 samples at 16 kHz stereo = 1000 ms through the interchange WAV
    val flac = graft.expressions.FlacPcm.synth(16000, 16000, 251, 13, 7)
    val df = Seq((1L, flac), (2L, Array.fill[Byte](64)(9)))
      .toDF("media_id", "payload")
    val out = Multimodal.decodeAudioMeta(df)
      .select("media_id", "decoded_audio.*").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None
         else Some((r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4))))).toMap
    assert(out(1L) === Some((2, 16000, 16, 1000L)))
    assert(out(2L) === None)
  }

  test("decodeDims parses REAL PNG/JPEG/GIF headers; garbage is null") {
    import spark.implicits._
    def png(w: Int, h: Int): Array[Byte] = {
      val b = new Array[Byte](24)
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).zipWithIndex
        .foreach { case (v, i) => b(i) = v.toByte }
      // IHDR length+type (ignored by the parser), then BE width/height
      def be32(i: Int, v: Int): Unit = {
        b(i) = (v >>> 24).toByte; b(i + 1) = (v >>> 16).toByte
        b(i + 2) = (v >>> 8).toByte; b(i + 3) = v.toByte
      }
      be32(16, w); be32(20, h)
      b
    }
    def jpeg(w: Int, h: Int): Array[Byte] = {
      // SOI, APP0 (len 4, skipped), SOF0 (len 11): prec, h16, w16, ...
      val app0 = Array[Int](0xff, 0xe0, 0x00, 0x04, 0x00, 0x00)
      val sof = Array[Int](0xff, 0xc0, 0x00, 0x0b, 8,
        h >>> 8, h & 0xff, w >>> 8, w & 0xff, 1, 0)
      (Array(0xff, 0xd8) ++ app0 ++ sof).map(_.toByte)
    }
    def gif(w: Int, h: Int): Array[Byte] =
      ("GIF89a".getBytes("US-ASCII") ++
        Array((w & 0xff).toByte, (w >>> 8).toByte, (h & 0xff).toByte, (h >>> 8).toByte))
    val df = Seq(
      (1L, png(640, 480)), (2L, jpeg(1024, 768)), (3L, gif(320, 200)),
      (4L, Array.fill[Byte](32)(7))).toDF("media_id", "payload")
    val out = Multimodal.decodeDims(df).select("media_id", "decoded_dims.*")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getInt(1), r.getInt(2))))).toMap
    assert(out(1L) === Some((640, 480)))
    assert(out(2L) === Some((1024, 768)))
    assert(out(3L) === Some((320, 200)))
    assert(out(4L) === None)
  }

  test("decodeVideoMeta parses REAL MP4 box structure; garbage is null") {
    import spark.implicits._
    def be32(v: Long): Array[Byte] = Array(
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ typ.getBytes("US-ASCII") ++ payload
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0))
    // mvhd v0: ver/flags, creation, modification, timescale, duration
    def mvhd(timescale: Long, duration: Long): Array[Byte] =
      box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(timescale) ++
        be32(duration) ++ new Array[Byte](80))
    // mvhd v1: 64-bit creation/modification/duration
    def mvhdV1(timescale: Long, duration: Long): Array[Byte] =
      box("mvhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
        be32(timescale) ++ be64(duration) ++ new Array[Byte](80))
    // tkhd v0: 76 bytes before 16.16 width/height
    def tkhd(w: Int, h: Int): Array[Byte] =
      box("tkhd", new Array[Byte](76) ++ be32(w.toLong << 16) ++
        be32(h.toLong << 16))
    def trak(w: Int, h: Int): Array[Byte] = box("trak", tkhd(w, h))
    val good = ftyp ++ box("moov",
      mvhd(1000, 90000) ++ trak(0, 0) ++ trak(640, 360))
    val v1 = ftyp ++ box("moov", mvhdV1(600, 1200) ++ trak(1920, 1080))
    val noFtyp = box("moov", mvhd(1000, 1000))
    val truncated = good.take(40)
    val df = Seq(
      (1L, good), (2L, v1), (3L, noFtyp), (4L, truncated),
      (5L, Array.fill[Byte](64)(7)))
      .toDF("media_id", "payload")
    val out = graft.operators.Multimodal.decodeVideoMeta(df)
      .select("media_id", "decoded_video.*")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None
         else Some((r.getInt(1), r.getLong(2), r.getInt(3), r.getInt(4),
           r.getInt(5))))).toMap
    // audio track (0x0) first: dims must come from the VIDEO track
    assert(out(1L) === Some((1000, 90000L, 2, 640, 360)))
    assert(out(2L) === Some((600, 2000L, 1, 1920, 1080)))
    assert(out(3L) === None, "missing ftyp must not parse")
    assert(out(4L) === None && out(5L) === None)
  }

  test("resizeImages: aspect-preserving fit, no upscale, garbage untouched") {
    import spark.implicits._
    val df = Seq(
      (1L, 800L, 200L),   // landscape, needs resize -> (512, 128)
      (2L, 200L, 800L),   // portrait -> (128, 512)
      (3L, 300L, 400L),   // fits -> unchanged
      (4L, 10000L, 1L)    // extreme ratio -> short side clamps to 1
    ).toDF("id", "w", "h")
      .select(col("id"), Multimodal.synthPngHeader(col("w"), col("h"))
        .as("payload"))
      .union(Seq(5L).toDF("id")
        .select(col("id"), lit(Array[Byte](1, 2, 3)).as("payload")))
    val out = Multimodal.decodeDims(Multimodal.resizeImages(df, maxDim = 512))
      .select(col("id"), col("decoded_dims.width"),
        col("decoded_dims.height"), col("resized"), col("payload"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), r.getBoolean(3)))).toMap
    assert(out(1L) === ((Some(512), Some(128), true)))
    assert(out(2L) === ((Some(128), Some(512), true)))
    assert(out(3L) === ((Some(300), Some(400), false)))
    assert(out(4L) === ((Some(512), Some(1), true)))
    assert(out(5L) === ((None, None, false)), "garbage passes through")
  }

  // ---- real pixel kernels (PPM/PGM: decode -> resize -> phash) ---------

  private def p6(w: Int, h: Int, px: Int => Int): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    header ++ (0 until w * h).flatMap(p =>
      Seq(px(p).toByte, px(p).toByte, px(p).toByte))
  }

  test("ppm_phash: hand-computed step image — ahash right half, dhash " +
      "exactly at the step, P5 == P6") {
    import spark.implicits._
    // 8x8, left half 0 / right half 255: every grid cell is one pixel
    val step = p6(8, 8, p => if (p % 8 >= 4) 255 else 0)
    val p5 = s"P5\n8 8\n255\n".getBytes("US-ASCII") ++
      (0 until 64).map(p => (if (p % 8 >= 4) 255 else 0).toByte)
    val rows = Seq((1L, step), (2L, p5)).toDF("id", "payload")
      .select(col("id"), call_function("graft_ppm_phash", col("payload"))
        .as("ph"))
      .select(col("id"), col("ph.width"), col("ph.height"),
        col("ph.gray_total"), col("ph.ahash"), col("ph.dhash"))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val wantA = (0 until 8).map(j => (4 to 7).map(i =>
      1L << (j * 8 + i)).sum).sum // bits for ci in 4..7, every row
    val wantD = (0 until 8).map(j => 1L << (j * 7 + 3)).sum // step at i=3
    assert(rows(1L) === Seq(8, 8, 255L * 32, wantA, wantD))
    assert(rows(2L) === rows(1L), "P5 grayscale must decode identically")
  }

  test("ppm_phash: identical images hash identically; shifted gradient " +
      "stays hamming-close; null for garbage and sub-8x8") {
    import spark.implicits._
    def hashes(bytes: Seq[Array[Byte]]): Seq[Option[(Long, Long)]] =
      bytes.zipWithIndex.map { case (b, i) => (i.toLong, b) }
        .toDF("id", "payload")
        .select(col("id"), call_function("graft_ppm_phash", col("payload"))
          .as("ph")).orderBy(col("id"))
        .collect().map(r => Option(r.getStruct(1)).map(s =>
          (s.getAs[Long]("ahash"), s.getAs[Long]("dhash")))).toSeq
    val base = p6(32, 24, p => (p * 7) % 256)
    val same = p6(32, 24, p => (p * 7) % 256)
    val near = p6(32, 24, p => ((p * 7) % 256 + 2) % 256)
    val Seq(hb, hs, hn, garbage, tiny) = hashes(Seq(base, same, near,
      Array[Byte](9, 9, 9), p6(4, 4, _ => 7)))
    assert(hb === hs, "identical pixels, identical hashes")
    assert(hn.isDefined)
    val ham = java.lang.Long.bitCount(hb.get._1 ^ hn.get._1)
    assert(ham <= 16, s"near-identical image drifted $ham ahash bits")
    assert(garbage === None && tiny === None)
  }

  test("ppm_resize: exact floor box-filter, format preserved, upscale null") {
    import spark.implicits._
    // 4x2 gradient 10,20,30,40 / 50,60,70,80 -> 2x1: means of 4-px cells
    val img = p6(4, 2, p => 10 * (p + 1))
    val out = Seq(Tuple1(img)).toDF("payload")
      .select(call_function("graft_ppm_resize", col("payload"),
        lit(2L), lit(1L)).as("rz"),
        call_function("graft_ppm_resize", col("payload"),
          lit(8L), lit(2L)).as("up"))
      .head()
    assert(out.isNullAt(1), "upscale must be null")
    val rz = out.getAs[Array[Byte]](0)
    val hd = graft.expressions.PpmRaster.parse(rz)
    assert(hd.channels === 3 && hd.w === 2 && hd.h === 1)
    // left cell {10,20,50,60} mean 35, right {30,40,70,80} mean 55
    assert((rz(hd.off) & 0xff) === 35 && (rz(hd.off + 3) & 0xff) === 55)
  }

  test("ppm kernels: crafted overflow headers yield null, never garbage; " +
      "synth size cap can't be wrapped past") {
    import spark.implicits._
    // 2147483647x2147483647: the naive w*h*3 Long product wraps negative
    // and would sail under both size guards, then crash grayPlane
    val crafted = ("P6\n2147483647 2147483647\n255\n" + "x" * 32)
      .getBytes("US-ASCII")
    // over the 2^26-pixel cap but under Int ranges: also null
    val big = s"P5\n100000 100000\n255\nx".getBytes("US-ASCII")
    val out = Seq((1L, crafted), (2L, big)).toDF("id", "payload")
      .select(col("id"),
        call_function("graft_ppm_phash", col("payload")).as("ph"),
        call_function("graft_ppm_resize", col("payload"), lit(8L), lit(8L))
          .as("rz"))
      .collect()
    assert(out.forall(r => r.isNullAt(1) && r.isNullAt(2)))
    val e = intercept[Exception] {
      Seq(1L).toDF("i").select(call_function("graft_synth_ppm",
        lit(4294967296L), lit(4294967296L), lit(1L), lit(1L))).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " " + msgs(t.getCause)
    assert(msgs(e).contains("graft_synth_ppm"), "cap must hold under wrap")
  }

  test("ppm kernels: codegen and interpreted paths agree") {
    import spark.implicits._
    def run(): Seq[Seq[String]] = Seq(1L, 2L, 3L).toDF("i")
      .select(call_function("graft_ppm_phash",
        call_function("graft_ppm_resize",
          call_function("graft_synth_ppm", lit(20L) + col("i"),
            lit(15L), col("i"), lit(3L)),
          lit(11L), lit(9L))).as("ph"))
      .collect().map(_.toSeq.map(String.valueOf)).toSeq
    val gen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = try run() finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(gen === interp)
    assert(gen.forall(_.head != "null"))
  }
}

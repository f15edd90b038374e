package graft

import java.io.ByteArrayInputStream

import org.apache.spark.sql.functions._

import graft.expressions.{JpegRaster, PpmRaster}

/** Differential fuzz for the zero-dependency baseline JPEG decoder:
  *
  *  1. exact round trip — `toPpm(synth(...))` must equal the
  *     block-constant P5/P6 bytes (DC-only blocks at quant 8 survive the
  *     lossy codec losslessly; see JpegRaster.synth);
  *  2. the synth stream is standards-valid — the JDK's own ImageIO
  *     decoder accepts it and agrees on every sample EXACTLY;
  *  3. real entropy data — images ENCODED BY ImageIO (non-constant
  *     gradients + noise, gray and RGB, default subsampling) decode
  *     within a small tolerance of ImageIO's own decode (IDCT and
  *     upsampling implementations legitimately differ by a little);
  *  4. malformed robustness — every truncation and targeted corruption
  *     decodes to null, never throws and never hangs.
  */
class JpegFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def expectedPpm(w: Int, h: Int, a: Long, b: Long,
      c: Int): Array[Byte] = {
    val chs = if (c == 2) 3 else 1
    val magic = if (chs == 3) "P6" else "P5"
    val header = s"$magic\n$w $h\n255\n".getBytes("US-ASCII")
    header ++ Array.tabulate(w * h * chs) { i =>
      val p = i / chs
      val bi = (p % w) / 8
      val bj = (p / w) / 8
      ((bi * a + bj * b) % 256).toByte
    }
  }

  test("jpeg exact round trip: decode(synth) equals the block-constant " +
      "bytes for gray and RGB, all block-edge geometries") {
    for ((w, h) <- Seq((8, 8), (1, 1), (7, 5), (16, 16), (17, 9), (40, 33),
           (9, 24));
         c <- Seq(0, 2); (a, b) <- Seq((3L, 5L), (0L, 0L), (255L, 1L))) {
      val jpg = JpegRaster.synth(w, h, a, b, c)
      val got = JpegRaster.toPpm(jpg)
      assert(got != null, s"decode failed ${w}x$h c=$c a=$a b=$b")
      assert(java.util.Arrays.equals(got, expectedPpm(w, h, a, b, c)),
        s"pixel mismatch ${w}x$h c=$c a=$a b=$b")
    }
  }

  test("jpeg synth is standards-valid: ImageIO accepts every fixture and " +
      "agrees on every sample exactly") {
    for ((w, h) <- Seq((8, 8), (7, 5), (17, 9), (40, 33));
         c <- Seq(0, 2)) {
      val jpg = JpegRaster.synth(w, h, 3, 5, c)
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(jpg))
      assert(img != null, s"ImageIO rejected ${w}x$h c=$c")
      assert(img.getWidth === w && img.getHeight === h)
      // raw raster samples — getRGB would run gray through an ICC
      // gray→sRGB transform and distort the comparison
      val raster = img.getRaster
      for (y <- 0 until h; x <- 0 until w) {
        val expected = (((x / 8) * 3 + (y / 8) * 5) % 256)
        for (ch <- 0 until raster.getNumBands)
          assert(raster.getSample(x, y, ch) === expected,
            s"ImageIO sample ($x,$y) ch=$ch ${w}x$h c=$c")
      }
    }
  }

  test("jpeg differential vs ImageIO on ImageIO-ENCODED images: real " +
      "huffman streams, subsampling, gradients + noise, small tolerance") {
    val rnd = new scala.util.Random(67)
    for (trial <- 1 to 12) {
      val w = 16 + rnd.nextInt(60)
      val h = 16 + rnd.nextInt(50)
      val gray = trial % 3 == 0
      val img = new java.awt.image.BufferedImage(w, h,
        if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
        else java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w) {
        // smooth REFLECTED gradient + mild noise: continuous content (no
        // %256 wrap edges), so codec loss stays small and implementation
        // deltas — not content edges — dominate the diff
        def chan(k: Int) = {
          val t = (x * 2 + y * 3 + k * 40 + rnd.nextInt(9) - 4) % 512
          val v = if (t < 0) -t else t
          if (v > 255) 511 - v else v
        }
        val rgb = (chan(0) << 16) | (chan(1) << 8) | chan(2)
        img.setRGB(x, y, rgb)
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", bos))
      val jpg = bos.toByteArray
      val mine = JpegRaster.toPpm(jpg)
      assert(mine != null, s"trial $trial ${w}x$h gray=$gray: decode null")
      val hd = PpmRaster.parse(mine)
      assert(hd != null && hd.w === w && hd.h === h)
      val ref = javax.imageio.ImageIO.read(new ByteArrayInputStream(jpg))
      val raster = ref.getRaster
      var sumAbs = 0L
      var maxAbs = 0
      var n = 0
      for (y <- 0 until h; x <- 0 until w; ch <- 0 until hd.channels) {
        val got = mine(hd.off + (y * w + x) * hd.channels + ch) & 0xff
        val want = raster.getSample(x, y, ch)
        val d = math.abs(got - want)
        sumAbs += d; if (d > maxAbs) maxAbs = d; n += 1
      }
      val mean = sumAbs.toDouble / n
      // mean must be tiny (same codec math); max tolerates the chroma
      // upsampler difference at edges (replication here vs ImageIO's
      // triangle filter — localized, bounded divergence)
      assert(mean <= 3.0 && maxAbs <= 100,
        s"trial $trial ${w}x$h gray=$gray: mean=$mean max=$maxAbs — " +
          "decoders diverged beyond implementation slack")
    }
  }

  test("jpeg progressive exact round trip (r12): SOF2 framing of the " +
      "block-constant fixtures decodes to the same exact bytes") {
    for ((w, h) <- Seq((8, 8), (1, 1), (7, 5), (16, 16), (17, 9), (40, 33),
           (9, 24), (130, 70));
         c <- Seq(0, 2); (a, b) <- Seq((3L, 5L), (0L, 0L), (255L, 1L))) {
      val jpg = JpegRaster.synth(w, h, a, b, c + 4)
      val got = JpegRaster.toPpm(jpg)
      assert(got != null, s"progressive decode failed ${w}x$h c=$c a=$a")
      assert(java.util.Arrays.equals(got, expectedPpm(w, h, a, b, c)),
        s"progressive pixel mismatch ${w}x$h c=$c a=$a b=$b")
    }
  }

  test("jpeg progressive synth is standards-valid: ImageIO accepts the " +
      "SOF2 fixtures and agrees on every sample exactly") {
    for ((w, h) <- Seq((8, 8), (7, 5), (17, 9), (40, 33)); c <- Seq(0, 2)) {
      val jpg = JpegRaster.synth(w, h, 3, 5, c + 4)
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(jpg))
      assert(img != null, s"ImageIO rejected progressive ${w}x$h c=$c")
      assert(img.getWidth === w && img.getHeight === h)
      val raster = img.getRaster
      for (y <- 0 until h; x <- 0 until w) {
        val expected = (((x / 8) * 3 + (y / 8) * 5) % 256)
        for (ch <- 0 until raster.getNumBands)
          assert(raster.getSample(x, y, ch) === expected,
            s"ImageIO sample ($x,$y) ch=$ch ${w}x$h c=$c progressive")
      }
    }
  }

  test("jpeg progressive differential vs ImageIO-ENCODED progressive " +
      "streams: real multi-scan refinement entropy, small tolerance") {
    val rnd = new scala.util.Random(71)
    for (trial <- 1 to 10) {
      val w = 16 + rnd.nextInt(60)
      val h = 16 + rnd.nextInt(50)
      val gray = trial % 3 == 0
      val img = new java.awt.image.BufferedImage(w, h,
        if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
        else java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w) {
        def chan(k: Int) = {
          val t = (x * 2 + y * 3 + k * 40 + rnd.nextInt(9) - 4) % 512
          val v = if (t < 0) -t else t
          if (v > 255) 511 - v else v
        }
        img.setRGB(x, y, (chan(0) << 16) | (chan(1) << 8) | chan(2))
      }
      // the JDK encoder's progressive scan script includes successive-
      // approximation DC/AC refinement scans — the full G.2 machine
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg")
        .next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      writer.dispose(); ios.close()
      val jpg = bos.toByteArray
      // confirm the stream really is progressive (SOF2 present)
      assert((0 until jpg.length - 1).exists(i =>
        (jpg(i) & 0xff) == 0xff && (jpg(i + 1) & 0xff) == 0xc2),
        s"trial $trial: ImageIO did not emit SOF2")
      val mine = JpegRaster.toPpm(jpg)
      assert(mine != null, s"trial $trial ${w}x$h gray=$gray: decode null")
      val hd = PpmRaster.parse(mine)
      assert(hd != null && hd.w === w && hd.h === h)
      val ref = javax.imageio.ImageIO.read(new ByteArrayInputStream(jpg))
      val raster = ref.getRaster
      var sumAbs = 0L
      var maxAbs = 0
      var n = 0
      for (y <- 0 until h; x <- 0 until w; ch <- 0 until hd.channels) {
        val got = mine(hd.off + (y * w + x) * hd.channels + ch) & 0xff
        val want = raster.getSample(x, y, ch)
        val d = math.abs(got - want)
        sumAbs += d; if (d > maxAbs) maxAbs = d; n += 1
      }
      val mean = sumAbs.toDouble / n
      assert(mean <= 3.0 && maxAbs <= 100,
        s"trial $trial ${w}x$h gray=$gray: mean=$mean max=$maxAbs — " +
          "progressive decoders diverged beyond implementation slack")
    }
  }

  test("jpeg restart markers (DRI/RSTn): exact round trip in BOTH " +
      "framings, ImageIO agrees, and a dropped RST is refused") {
    for ((w, h) <- Seq((40, 33), (17, 9), (64, 64)); c <- Seq(0, 2, 4, 6);
         rst <- Seq(1, 3, 7)) {
      val jpg = JpegRaster.synth(w, h, 3, 5, c, restartMcus = rst)
      val got = JpegRaster.toPpm(jpg)
      assert(got != null, s"restart decode failed ${w}x$h c=$c rst=$rst")
      assert(java.util.Arrays.equals(got, expectedPpm(w, h, 3, 5, c & 3)),
        s"restart pixel mismatch ${w}x$h c=$c rst=$rst")
    }
    // standards validity: ImageIO decodes the restart-marked streams
    for (c <- Seq(2, 6)) {
      val jpg = JpegRaster.synth(40, 33, 3, 5, c, restartMcus = 3)
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(jpg))
      assert(img != null, s"ImageIO rejected restart stream c=$c")
      val raster = img.getRaster
      for (y <- 0 until 33; x <- 0 until 40; ch <- 0 until 3)
        assert(raster.getSample(x, y, ch) === ((x / 8) * 3 + (y / 8) * 5) % 256,
          s"ImageIO restart sample ($x,$y) c=$c")
    }
    // excising the first RST marker must fail the sync check, not decode
    val jpg = JpegRaster.synth(40, 33, 3, 5, 2, restartMcus = 2)
    val at = (2 until jpg.length - 1).find(i =>
      (jpg(i) & 0xff) == 0xff && (jpg(i + 1) & 0xff) == 0xd0).get
    val cut = jpg.take(at) ++ jpg.drop(at + 2)
    assert(JpegRaster.toPpm(cut) == null, "missing RST must be null")
  }

  test("jpeg progressive malformed robustness: truncations null, the " +
      "expression surface fuses, a DC-less stream is refused") {
    val jpg = JpegRaster.synth(17, 9, 3, 5, 6)
    for (len <- 0 until jpg.length)
      assert(JpegRaster.toPpm(java.util.Arrays.copyOf(jpg, len)) == null,
        s"progressive truncation at $len")
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 200) {
      val c = jpg.clone()
      c(2 + rnd.nextInt(c.length - 2)) = rnd.nextInt(256).toByte
      JpegRaster.toPpm(c) // null or a decode; must not throw
    }
    val r = Seq(1L, 2L).toDF("i").selectExpr(
      "graft_ppm_phash(graft_jpeg_to_ppm(graft_synth_jpeg(" +
        "24L, 16L, i, 5L, (i % 2) * 2 + 4))) AS ph").collect()
    assert(r.forall(!_.isNullAt(0)))
  }

  test("jpeg malformed robustness: every truncation and targeted " +
      "corruption decodes to null, never throws") {
    val jpg = JpegRaster.synth(17, 9, 3, 5, 2)
    for (len <- 0 until jpg.length)
      assert(JpegRaster.toPpm(java.util.Arrays.copyOf(jpg, len)) == null,
        s"truncation at $len")
    def corrupt(off: Int, v: Byte): Array[Byte] = {
      val c = jpg.clone(); c(off) = v; c
    }
    // SOI must lead
    assert(JpegRaster.toPpm(corrupt(1, 0x00)) == null, "no SOI")
    // find the SOF0 marker and flip its flavor / fields
    val sofAt = (0 until jpg.length - 1).find(i =>
      (jpg(i) & 0xff) == 0xff && (jpg(i + 1) & 0xff) == 0xc0).get
    assert(JpegRaster.toPpm(corrupt(sofAt + 1, 0xc2.toByte)) == null,
      "a baseline stream relabeled SOF2 violates the progressive band " +
        "rules (its scan claims Ss=0, Se=63) -> null")
    assert(JpegRaster.toPpm(corrupt(sofAt + 1, 0xc9.toByte)) == null,
      "arithmetic coding -> null")
    assert(JpegRaster.toPpm(corrupt(sofAt + 4, 12)) == null,
      "12-bit precision -> null")
    assert(JpegRaster.toPpm(corrupt(sofAt + 9, 4)) == null,
      "4-component (CMYK) -> null")
    assert(JpegRaster.toPpm(null) == null)
    assert(JpegRaster.toPpm(Array[Byte]()) == null)
    // random byte flips in the entropy segment must never throw
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 200) {
      val c = jpg.clone()
      c(2 + rnd.nextInt(c.length - 2)) = rnd.nextInt(256).toByte
      JpegRaster.toPpm(c) // null or a decode; must not throw
    }
    // the expression surface: fused with the existing raster kernels
    val r = Seq(1L, 2L).toDF("i").selectExpr(
      "graft_ppm_phash(graft_jpeg_to_ppm(graft_synth_jpeg(" +
        "24L, 16L, i, 5L, (i % 2) * 2))) AS ph").collect()
    assert(r.forall(!_.isNullAt(0)))
  }
}

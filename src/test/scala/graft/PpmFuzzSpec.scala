package graft

import org.apache.spark.sql.functions._

/** Randomized differential fuzz for the raster kernels: random
  * dimensions / gradients / resize targets, each draw checked against a
  * CLEAN-ROOM Scala reference (functional comprehensions, no shared code
  * with the kernels' imperative loops) — the grid partition `i = x·G//W`
  * and the cross-multiplied hash decisions are exactly where an
  * off-by-one hides at dimensions the fixed catalog never visits. */
class PpmFuzzSpec extends SparkSpec {
  import spark.implicits._

  // clean-room reference: gradient image as a function, grid by
  // grouping coordinates, hashes from exact rational comparisons
  private def refImage(w: Int, h: Int, a: Int, b: Int): Map[(Int, Int), Int] =
    (for (x <- 0 until w; y <- 0 until h)
      yield (x, y) -> ((x.toLong * a + y.toLong * b) % 256).toInt).toMap

  private def refPhash(w: Int, h: Int,
      px: Map[(Int, Int), Int]): (Long, Long, Long) = {
    val cells = px.groupBy { case ((x, y), _) =>
      (x.toLong * 8 / w, y.toLong * 8 / h)
    }.map { case (c, m) => c -> ((m.values.map(_.toLong).sum, m.size.toLong)) }
    val total = px.values.map(_.toLong).sum
    val wh = w.toLong * h
    val ahash = cells.collect {
      case ((i, j), (cs, ca)) if BigInt(cs) * wh >= BigInt(total) * ca =>
        1L << (j * 8 + i)
    }.sum
    val dhash = (for (j <- 0L until 8L; i <- 0L until 7L) yield {
      val (ls, la) = cells((i, j))
      val (rs, ra) = cells((i + 1, j))
      if (BigInt(rs) * la > BigInt(ls) * ra) 1L << (j * 7 + i) else 0L
    }).sum
    (total, ahash, dhash)
  }

  private def refResize(w: Int, h: Int, px: Map[(Int, Int), Int],
      w2: Int, h2: Int): Map[(Int, Int), Int] =
    px.groupBy { case ((x, y), _) =>
      ((x.toLong * w2 / w).toInt, (y.toLong * h2 / h).toInt)
    }.map { case (c, m) =>
      c -> (m.values.map(_.toLong).sum / m.size).toInt
    }

  test("ppm parser: header variants (comments, CRLF, multi-space) parse; " +
      "truncation and malformed magics are null") {
    import graft.expressions.PpmRaster
    val raster = Array.fill(4 * 3 * 3)(7.toByte)
    def img(header: String): Array[Byte] =
      header.getBytes("US-ASCII") ++ raster
    // every legal whitespace/comment arrangement of the same 4x3 image
    val good = Seq(
      "P6\n4 3\n255\n",
      "P6 4 3 255 ",
      "P6\r\n4\t3\r\n255\n",
      "P6\n# a comment\n4 3\n# another\n255\n",
      "P6\n  4   3\n 255\n")
    for (h <- good) {
      val hd = PpmRaster.parse(img(h))
      assert(hd != null && hd.w === 4 && hd.h === 3 && hd.channels === 3, h)
      assert(img(h).length - hd.off === 36, s"offset wrong for '$h'")
    }
    val bad = Seq(
      img("P6\n4 3\n255\n").dropRight(1),       // short raster
      img("P4\n4 3\n255\n"),                     // unsupported magic
      img("P6\n4 3\n65535\n"),                   // 2-byte maxval
      img("P6\n4 3\n"),                          // missing maxval
      "P6\n-4 3\n255\n".getBytes("US-ASCII") ++ raster, // negative dim
      Array[Byte](),
      null)
    for ((b, i) <- bad.zipWithIndex)
      assert(PpmRaster.parse(b) == null, s"bad case $i must be null")
  }

  test("ppm phash/resize fuzz: random dims and gradients == clean-room " +
      "reference, through the full synth->resize->rehash chain") {
    val rnd = new scala.util.Random(7)
    val draws = (1 to 12).map { _ =>
      val w = 8 + rnd.nextInt(60)
      val h = 8 + rnd.nextInt(60)
      (w, h, 1 + rnd.nextInt(50), 1 + rnd.nextInt(50),
        8 + rnd.nextInt(math.max(1, w - 7)), 8 + rnd.nextInt(math.max(1, h - 7)))
    }.filter { case (w, h, _, _, w2, h2) => w2 <= w && h2 <= h }
    assert(draws.size >= 8, "fixture must keep most draws")
    val rows = draws.zipWithIndex.map { case ((w, h, a, b, w2, h2), i) =>
      (i.toLong, w.toLong, h.toLong, a.toLong, b.toLong, w2.toLong, h2.toLong)
    }.toDF("id", "w", "h", "a", "b", "w2", "h2")
    val payload = call_function("graft_synth_ppm",
      col("w"), col("h"), col("a"), col("b"))
    val got = rows.select(col("id"),
        call_function("graft_ppm_phash", payload).as("ph"),
        call_function("graft_ppm_phash", call_function("graft_ppm_resize",
          payload, col("w2"), col("h2"))).as("rz"))
      .orderBy(col("id")).collect()
    draws.zipWithIndex.foreach { case ((w, h, a, b, w2, h2), i) =>
      val px = refImage(w, h, a, b)
      val (total, ahash, dhash) = refPhash(w, h, px)
      val ph = got(i).getStruct(1)
      assert((ph.getAs[Int]("width"), ph.getAs[Int]("height"),
        ph.getAs[Long]("gray_total"), ph.getAs[Long]("ahash"),
        ph.getAs[Long]("dhash")) === ((w, h, total, ahash, dhash)),
        s"draw $i ${w}x$h a=$a b=$b")
      val rpx = refResize(w, h, px, w2, h2)
      val (rt, rah, rdh) = refPhash(w2, h2, rpx)
      val rz = got(i).getStruct(2)
      assert((rz.getAs[Int]("width"), rz.getAs[Int]("height"),
        rz.getAs[Long]("gray_total"), rz.getAs[Long]("ahash"),
        rz.getAs[Long]("dhash")) === ((w2, h2, rt, rah, rdh)),
        s"resize draw $i ${w}x$h -> ${w2}x$h2")
    }
  }
}

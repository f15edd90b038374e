package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions.{BasicHist, BasicHistAggregator, HistBuf}

/** Histogram semantics, mirroring the reference's aggregate tests
  * (/root/reference/src/lib/aggregate_test.go:13-413): percentile sanity on
  * single-valued groups, global percentiles vs sorted array, outlier drop,
  * merge laws.
  */
class HistSpec extends SparkSpec {
  import spark.implicits._

  private def runHist(values: Seq[Long], mn: Long, mx: Long, buckets: Int = 1000) =
    values.toDF("v")
      .agg(BasicHist.hist(col("v"), lit(1L), mn, mx, buckets).as("h"))
      .select("h.*").collect()(0)

  test("single-valued distribution: p25=p50=p75=value, stddev 0") {
    val r = runHist(Seq.fill(100)(42L), 42, 42)
    val pcts = r.getAs[collection.Seq[Long]]("percentiles")
    assert(pcts(25) === 42 && pcts(50) === 42 && pcts(75) === 42)
    assert(r.getAs[Double]("stddev") === 0.0)
    assert(r.getAs[Double]("mean") === 42.0)
    assert(r.getAs[Long]("count") === 100)
  }

  test("percentiles track the sorted array within one bucket width") {
    val rnd = new scala.util.Random(42)
    val values = Seq.fill(5000)(rnd.nextInt(1000).toLong)
    val sorted = values.sorted
    val agg = new BasicHistAggregator(0, 999, 1000)
    val r = runHist(values, 0, 999)
    val pcts = r.getAs[collection.Seq[Long]]("percentiles")
    for (p <- Seq(10, 25, 50, 75, 90, 99)) {
      val exact = sorted((p / 100.0 * (sorted.size - 1)).toInt)
      assert(math.abs(pcts(p) - exact) <= agg.bucketSize + 1,
        s"p$p: hist=${pcts(p)} exact=$exact")
    }
  }

  test("mean/min/max/count match exact aggregates; weighted mean matches") {
    val rnd = new scala.util.Random(7)
    val vw = Seq.fill(2000)((rnd.nextInt(500).toLong + 10, rnd.nextInt(5).toLong + 1))
    val df = vw.toDF("v", "w")
    val r = df.agg(BasicHist.hist(col("v"), col("w"), 10, 509, 1000).as("h"))
      .select("h.*").collect()(0)
    val wsum = vw.map { case (v, w) => v * w }.sum.toDouble
    val wcnt = vw.map(_._2).sum
    assert(r.getAs[Long]("count") === wcnt)
    assert(r.getAs[Long]("samples") === vw.size)
    assert(math.abs(r.getAs[Double]("mean") - wsum / wcnt) < 1e-6)
    assert(r.getAs[Long]("min") === vw.map(_._1).min)
    assert(r.getAs[Long]("max") === vw.map(_._1).max)
  }

  test("outlier guard: values beyond max*10 or below min are dropped") {
    // reference: hist_basic.go:101-109
    val values = Seq(5L, 50L, 100L, 1001L, 4L, -100L)
    val r = runHist(values, 5, 100)
    assert(r.getAs[Long]("samples") === 3) // 1001 (>100*10), 4 and -100 (<min) dropped
    assert(r.getAs[Long]("max") === 100)
  }

  test("stddev approximates exact population stddev within bucket width") {
    val rnd = new scala.util.Random(11)
    val values = Seq.fill(3000)(rnd.nextInt(10000).toLong)
    val r = runHist(values, 0, 9999)
    val mean = values.sum.toDouble / values.size
    val exact = math.sqrt(values.map(v => (v - mean) * (v - mean)).sum / values.size)
    val agg = new BasicHistAggregator(0, 9999, 1000)
    assert(math.abs(r.getAs[Double]("stddev") - exact) <= agg.bucketSize,
      s"hist=${r.getAs[Double]("stddev")} exact=$exact")
  }

  test("merge is associative and order-insensitive (partial agg safety)") {
    val agg = new BasicHistAggregator(0, 999, 100)
    def buf(vals: Seq[Long]): HistBuf =
      vals.foldLeft(agg.zero)((b, v) => agg.reduce(b, (v, 1L)))
    // mean is compared with tolerance (double addition order differs);
    // everything else must be exactly merge-order-independent.
    def canon(b: HistBuf) = {
      val r = agg.finish(b)
      ((r.count, r.min, r.max, r.percentiles.toSeq, r.bucketLows.toSeq,
        r.bucketCounts.toSeq), r.mean)
    }
    for (seed <- 1 to 50) {
      val rnd = new scala.util.Random(seed)
      val Seq(xs, ys, zs) = Seq.fill(3)(Seq.fill(50)(rnd.nextLong(1000)))
      val (abc, mAbc) = canon(agg.merge(agg.merge(buf(xs), buf(ys)), buf(zs)))
      val (cab, mCab) = canon(agg.merge(buf(zs), agg.merge(buf(ys), buf(xs))))
      val (flat, mFlat) = canon(buf(xs ++ ys ++ zs))
      assert(abc === cab)
      assert(abc === flat)
      assert(math.abs(mAbc - mCab) < 1e-9 && math.abs(mAbc - mFlat) < 1e-9)
    }
  }

  test("nested hist: halving layout partitions the range, top-anchored") {
    import graft.functions.NestedHist
    val lay = NestedHist.layout(0, 100000, 1000)
    // ascending, contiguous, last (lowest) subrange is <= numBuckets wide
    assert(lay.head._1 === 0L && lay.last._2 === 100000L)
    for (Seq(a, b) <- lay.sliding(2)) assert(a._2 === b._1)
    assert(lay.head._2 - lay.head._1 <= 1000)
    // widths halve from the top: each upper sub is ~2x the next lower
    // (integer >> halving: an odd width w splits as w>>1, so the upper is
    // 2a or 2a+1)
    val upperWidths = lay.tail.map(s => s._2 - s._1)
    for (Seq(a, b) <- upperWidths.sliding(2)) assert(b === a * 2 || b === a * 2 + 1)
  }

  test("nested hist: fine absolute resolution at the bottom, exact stats") {
    import graft.functions.{NestedHist, NestedHistAggregator}
    // heavy-tailed: most mass small, a few huge — MultiHist's reason to exist
    val rnd = new scala.util.Random(11)
    val values = Seq.fill(4000)(math.exp(rnd.nextDouble() * 11).toLong)
    val mx = values.max
    val r = values.toDF("v")
      .agg(NestedHist.nestedHist(col("v"), lit(1L), 0L, mx).as("h"))
      .select("h.*").collect()(0)
    assert(r.getAs[Long]("count") === 4000)
    val sorted = values.sorted
    val pcts = r.getAs[collection.Seq[Long]]("percentiles")
    for (p <- Seq(25, 50, 75)) {
      val exact = sorted((p / 100.0 * (sorted.size - 1)).toInt).toDouble
      val got = pcts(p).toDouble
      // low percentiles sit in the fine 1:1 subranges → tight absolute error;
      // allow one bucket width of the containing subrange either way
      val lay = NestedHist.layout(0, mx, 1000)
      val width = lay.find(s => exact >= s._1 && exact <= s._2).map(_._3).getOrElse(1L)
      assert(math.abs(got - exact) <= width + 1, s"p$p got=$got exact=$exact width=$width")
    }
    // boundary routing: a value on a shared edge goes to the upper sub (no crash,
    // counted once)
    val lay = NestedHist.layout(0, mx, 1000)
    val edge = lay(1)._1
    val agg = new NestedHistAggregator(0, mx, 1000)
    val b = agg.reduce(agg.zero, (edge, 1L))
    assert(b.counts.sum === 1L)
  }

  test("nested hist: merge is associative and order-insensitive") {
    import graft.functions.NestedHistAggregator
    val agg = new NestedHistAggregator(0, 99999, 100)
    def buf(vals: Seq[Long]): HistBuf =
      vals.foldLeft(agg.zero)((b, v) => agg.reduce(b, (v, 1L)))
    def canon(b: HistBuf) = {
      val r = agg.finish(b)
      (r.count, r.min, r.max, r.percentiles.toSeq, r.bucketLows.toSeq,
        r.bucketCounts.toSeq)
    }
    for (seed <- 1 to 20) {
      val rnd = new scala.util.Random(seed)
      val Seq(xs, ys, zs) = Seq.fill(3)(Seq.fill(60)(rnd.nextLong(100000)))
      assert(canon(agg.merge(agg.merge(buf(xs), buf(ys)), buf(zs))) ===
        canon(agg.merge(buf(zs), agg.merge(buf(ys), buf(xs)))))
      assert(canon(agg.merge(agg.merge(buf(xs), buf(ys)), buf(zs))) ===
        canon(buf(xs ++ ys ++ zs)))
    }
  }

  test("small range collapses to width-1 buckets (reference size<100 branch)") {
    val agg = new BasicHistAggregator(10, 30, 1000)
    assert(agg.bucketSize === 1)
    val r = runHist(Seq(10L, 20L, 20L, 30L), 10, 30)
    val lows = r.getAs[collection.Seq[Long]]("bucketLows")
    val cnts = r.getAs[collection.Seq[Long]]("bucketCounts")
    assert(lows.zip(cnts).toMap === Map(10L -> 1L, 20L -> 2L, 30L -> 1L))
  }
}

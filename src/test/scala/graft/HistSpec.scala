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

  test("small range collapses to width-1 buckets (reference size<100 branch)") {
    val agg = new BasicHistAggregator(10, 30, 1000)
    assert(agg.bucketSize === 1)
    val r = runHist(Seq(10L, 20L, 20L, 30L), 10, 30)
    val lows = r.getAs[collection.Seq[Long]]("bucketLows")
    val cnts = r.getAs[collection.Seq[Long]]("bucketCounts")
    assert(lows.zip(cnts).toMap === Map(10L -> 1L, 20L -> 2L, 30L -> 1L))
  }
}

package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Log-scaled histogram (`-loghist`) — the reference's MultiHist
  * (/root/reference/src/lib/hist_multi.go:223-261) nests fixed-width
  * sub-histograms over halving ranges so low values get fine absolute
  * resolution and wide tails stay cheap. Same idea here with a flat bucket
  * function: bucket = floor(log2(v - min + 1) * ticksPerOctave), i.e.
  * `ticksPerOctave` buckets per doubling. Same outlier guard, weighted
  * counts, mergeable buffer, and percentile walk as [[BasicHistAggregator]].
  */
class LogHistAggregator(
    infoMin: Long,
    infoMax: Long,
    ticksPerOctave: Int = LogHist.DefaultTicksPerOctave)
  extends Aggregator[(Long, Long), HistBuf, HistResult] with Serializable {

  val numBuckets: Int = LogHist.numBuckets(infoMin, infoMax, ticksPerOctave)

  private def bucketOf(value: Long): Int =
    LogHist.bucketOf(value, infoMin, numBuckets, ticksPerOctave)

  /** Low value of a bucket: inverse of [[bucketOf]]. */
  private def lowOf(bucket: Int): Long =
    LogHist.lowOf(bucket, infoMin, ticksPerOctave)

  def zero: HistBuf = HistBuf(
    new Array[Long](numBuckets), 0.0, 0L, 0L,
    Long.MaxValue, Long.MinValue, Array.empty, Array.empty)

  // total-guard form of hist_multi.go:51-58 (see BasicHistAggregator)
  private val upperCutoff: Long =
    if (infoMax <= 0) Long.MaxValue
    else if (infoMax > Long.MaxValue / 10) Long.MaxValue
    else infoMax * 10

  def reduce(b: HistBuf, in: (Long, Long)): HistBuf = {
    val (value, weight) = in
    if (weight == Long.MinValue) return b // null-row sentinel (see BasicHist)
    if (weight < 0L) throw new IllegalArgumentException( // see BasicHist
      s"hist: negative weights are unsupported; got $weight")
    if (value > upperCutoff || value < infoMin) return b // hist_multi.go:51-58
    b.samples += 1
    b.count += weight
    b.avgSum += value.toDouble * weight
    if (value < b.min) b.min = value
    if (value > b.max) b.max = value
    b.counts(bucketOf(value)) += weight
    b
  }

  def merge(a: HistBuf, c: HistBuf): HistBuf = {
    var i = 0
    while (i < a.counts.length) { a.counts(i) += c.counts(i); i += 1 }
    a.avgSum += c.avgSum; a.count += c.count; a.samples += c.samples
    a.min = math.min(a.min, c.min); a.max = math.max(a.max, c.max)
    a
  }

  def finish(b: HistBuf): HistResult = {
    if (b.count == 0) {
      // all-zero-weight groups: samples/extents are real (BasicHist rule)
      val mn = if (b.samples > 0) b.min else 0L
      val mx = if (b.samples > 0) b.max else 0L
      return HistResult(0, b.samples, 0.0, mn, mx, 0.0,
        Array.empty, Array.empty, Array.empty)
    }
    val mean = b.avgSum / b.count

    val pcts = new Array[Long](101)
    pcts(0) = b.min
    var cum = 0L; var prevP = 0L; var k = 0
    while (k < b.counts.length) {
      if (b.counts(k) > 0) {
        cum += b.counts(k)
        val p = (100 * cum) / b.count
        if (p > prevP) {
          var ip = prevP + 1
          while (ip <= p) { pcts(ip.toInt) = lowOf(k); ip += 1 }
          prevP = p
        }
      }
      k += 1
    }

    var sumVar = 0.0
    k = 0
    while (k < b.counts.length) {
      if (b.counts(k) > 0) {
        val d = lowOf(k).toDouble - mean
        sumVar += d * d * (b.counts(k).toDouble / b.count)
      }
      k += 1
    }

    val lows = Array.newBuilder[Long]; val cnts = Array.newBuilder[Long]
    k = 0
    while (k < b.counts.length) {
      if (b.counts(k) > 0) { lows += lowOf(k); cnts += b.counts(k) }
      k += 1
    }
    HistResult(b.count, b.samples, mean, b.min, b.max, math.sqrt(sumVar),
      pcts.take(100), lows.result(), cnts.result())
  }

  def bufferEncoder: Encoder[HistBuf] = Encoders.product[HistBuf]
  def outputEncoder: Encoder[HistResult] = Encoders.product[HistResult]
}

/** Mergeable per-block log-hist partial — the cache's persisted form (same
  * [[HistBuf]] shape as the flat hist; the bucket function is the only
  * difference, pinned by (extents, ticks) in the cache key). */
class LogHistPartialAggregator(infoMin: Long, infoMax: Long, ticksPerOctave: Int = LogHist.DefaultTicksPerOctave)
  extends HistPartialOf(new LogHistAggregator(infoMin, infoMax, ticksPerOctave))

/** Folds persisted log-hist [[HistBuf]] partials into one [[HistResult]]
  * — associative order-insensitive merge, identical to single-pass. */
class LogHistMergeAggregator(infoMin: Long, infoMax: Long, ticksPerOctave: Int = LogHist.DefaultTicksPerOctave)
  extends HistMergeOf(new LogHistAggregator(infoMin, infoMax, ticksPerOctave))

object LogHist {
  /** The one source of truth for the default tick layout. The query cache
    * keys log-hist partials on this (persisted partials bucketed with a
    * different ticksPerOctave must NEVER merge with new-layout ones), so it
    * must not be duplicated as a literal anywhere. */
  val DefaultTicksPerOctave: Int = 16

  def logHist(value: Column, weight: Column, infoMin: Long, infoMax: Long,
      ticksPerOctave: Int = LogHist.DefaultTicksPerOctave): Column =
    udaf(new LogHistAggregator(infoMin, infoMax, ticksPerOctave)).apply(value, weight)

  /** Mergeable per-block partial (a [[HistBuf]] struct column). */
  def logHistPartial(value: Column, weight: Column, infoMin: Long, infoMax: Long,
      ticksPerOctave: Int = LogHist.DefaultTicksPerOctave): Column =
    udaf(new LogHistPartialAggregator(infoMin, infoMax, ticksPerOctave)).apply(value, weight)

  /** Merge persisted partials into the final [[HistResult]] (struct passed
    * as its subfields — udaf flattens product inputs). */
  def logHistMerge(buf: Column, infoMin: Long, infoMax: Long,
      ticksPerOctave: Int = LogHist.DefaultTicksPerOctave): Column =
    udaf(new LogHistMergeAggregator(infoMin, infoMax, ticksPerOctave))
      .apply(BasicHist.bufFields(buf): _*)

  /** The bucket function as pure driver-side math, exposed so an oracle SQL
    * twin can precompute the EXACT integer bucket thresholds as literals
    * (cross-engine log/pow bit-compat is not guaranteed; integer thresholds
    * are). */
  def numBuckets(infoMin: Long, infoMax: Long, ticksPerOctave: Int): Int = {
    val span = math.max(1L, infoMax - infoMin)
    (math.ceil(math.log(span.toDouble + 1) / math.log(2.0)) * ticksPerOctave).toInt + 2
  }

  def bucketOf(value: Long, infoMin: Long, numBuckets: Int, ticksPerOctave: Int): Int = {
    val off = value - infoMin
    val b = (math.log(off.toDouble + 1) / math.log(2.0) * ticksPerOctave).toInt
    math.min(b, numBuckets - 1)
  }

  def lowOf(bucket: Int, infoMin: Long, ticksPerOctave: Int): Long =
    infoMin + (math.pow(2.0, bucket.toDouble / ticksPerOctave) - 1).toLong

  /** For each occupied-in-principle bucket over the integer domain
    * [infoMin, infoMax*10], the smallest value mapping to it, paired with
    * the bucket's low value — ascending. Linear scan of the domain with the
    * exact production double math (only used to build oracle SQL twins). */
  def bucketThresholds(infoMin: Long, infoMax: Long, ticksPerOctave: Int): Seq[(Long, Long)] = {
    val nb = numBuckets(infoMin, infoMax, ticksPerOctave)
    val out = Seq.newBuilder[(Long, Long)]
    var lastBucket = -1
    var v = infoMin
    val top = infoMax * 10
    while (v <= top) {
      val b = bucketOf(v, infoMin, nb, ticksPerOctave)
      if (b != lastBucket) { out += ((v, lowOf(b, infoMin, ticksPerOctave))); lastBucket = b }
      v += 1
    }
    out.result()
  }
}

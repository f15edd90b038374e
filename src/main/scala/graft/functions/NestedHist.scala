package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** The reference's TRUE MultiHist structure
  * (/root/reference/src/lib/hist_multi.go:223-257 TrackPercentiles):
  * sub-histograms over HALVING ranges anchored at the top —
  *
  * {{{
  *   [max-R/2, max]   one BasicHist of ~numBuckets buckets
  *   [max-3R/4, max-R/2]          "
  *   ...halving...
  *   [min, last_edge] 1:1 buckets (width <= numBuckets)
  * }}}
  *
  * so low values get fine ABSOLUTE resolution and the wide tail stays
  * cheap. A value on a shared boundary goes to the UPPER subhist (the
  * reference routes first-match iterating from the top,
  * hist_multi.go:80-86). Values in (max, max*10] pass the outlier guard
  * and count toward count/mean but land in no bucket (AddWeightedValue
  * increments before routing) — replicated here.
  *
  * Within each subrange the bucket width uses this repo's ceil convention
  * (see [[BasicHistAggregator]] — documented deviation from the
  * reference's floor, which strands range tails).
  *
  * The buffer is the flat concatenation of all subhists' counts (layout is
  * a pure function of (infoMin, infoMax, numBuckets)), so Spark's
  * partial/final merge is index-wise addition — same [[HistBuf]] shape and
  * merge law as the flat histograms.
  */
class NestedHistAggregator(
    infoMin: Long,
    infoMax: Long,
    numBucketsIn: Int = 1000)
  extends Aggregator[(Long, Long), HistBuf, HistResult] with Serializable {

  /** (subMin, subMax, bucketWidth, slotOffset, slots) — ascending subMin. */
  val layout: Seq[(Long, Long, Long, Int, Int)] =
    NestedHist.layout(infoMin, infoMax, numBucketsIn)

  private val totalSlots: Int = layout.map(_._5).sum
  // ascending subMins for routing: last i with subMin <= v
  private val subMins: Array[Long] = layout.map(_._1).toArray

  def zero: HistBuf = HistBuf(
    new Array[Long](totalSlots), 0.0, 0L, 0L,
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
    // route: last subrange whose min <= value (== upper sub on boundaries)
    var i = subMins.length - 1
    while (i > 0 && subMins(i) > value) i -= 1
    val (smin, smax, width, off, slots) = layout(i)
    if (value <= smax) {
      var k = ((value - smin) / width).toInt
      if (k >= slots) k = slots - 1
      b.counts(off + k) += weight
    }
    // else: value in (infoMax, infoMax*10] — counted, not bucketed
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

    // merged sparse buckets, ascending low (layout is ascending; within a
    // sub, slot k has low = subMin + k*width); shared-boundary duplicate
    // lows merge by adding counts (GetSparseBuckets semantics)
    val lows = scala.collection.mutable.ArrayBuffer.empty[Long]
    val cnts = scala.collection.mutable.ArrayBuffer.empty[Long]
    var total = 0L
    for ((smin, _, width, off, slots) <- layout) {
      var k = 0
      while (k < slots) {
        val c = b.counts(off + k)
        if (c > 0) {
          val low = smin + k * width
          total += c
          if (lows.nonEmpty && lows.last == low) cnts(cnts.length - 1) += c
          else { lows += low; cnts += c }
        }
        k += 1
      }
    }
    val lowsA = lows.toArray; val cntsA = cnts.toArray

    // percentile walk over merged buckets (hist_multi.go:91-130): total is
    // the BUCKETED weight (out-of-range values are excluded)
    val pcts = new Array[Long](101)
    pcts(0) = b.min
    var cum = 0L; var prevP = 0L; var i = 0
    while (i < lowsA.length) {
      cum += cntsA(i)
      val p = (100 * cum) / math.max(1L, total)
      if (p > prevP) {
        var ip = prevP + 1
        while (ip <= p) { pcts(ip.toInt) = lowsA(i); ip += 1 }
        prevP = p
      }
      i += 1
    }

    var sumVar = 0.0
    i = 0
    while (i < lowsA.length) {
      val d = lowsA(i).toDouble - mean
      sumVar += d * d * (cntsA(i).toDouble / b.count)
      i += 1
    }

    HistResult(b.count, b.samples, mean, b.min, b.max, math.sqrt(sumVar),
      pcts.take(100), lowsA, cntsA)
  }

  def bufferEncoder: Encoder[HistBuf] = Encoders.product[HistBuf]
  def outputEncoder: Encoder[HistResult] = Encoders.product[HistResult]
}

/** Mergeable per-block nested-hist partial (cache-persisted form; same
  * [[HistBuf]] shape, halving-subrange bucket function). */
class NestedHistPartialAggregator(infoMin: Long, infoMax: Long, numBuckets: Int = 1000)
  extends HistPartialOf(new NestedHistAggregator(infoMin, infoMax, numBuckets))

/** Folds persisted nested-hist [[HistBuf]] partials into one
  * [[HistResult]] — associative order-insensitive merge. */
class NestedHistMergeAggregator(infoMin: Long, infoMax: Long, numBuckets: Int = 1000)
  extends HistMergeOf(new NestedHistAggregator(infoMin, infoMax, numBuckets))

object NestedHist {
  def nestedHist(value: Column, weight: Column, infoMin: Long, infoMax: Long,
      numBuckets: Int = 1000): Column =
    udaf(new NestedHistAggregator(infoMin, infoMax, numBuckets)).apply(value, weight)

  /** Mergeable per-block partial (a [[HistBuf]] struct column). */
  def nestedHistPartial(value: Column, weight: Column, infoMin: Long, infoMax: Long,
      numBuckets: Int = 1000): Column =
    udaf(new NestedHistPartialAggregator(infoMin, infoMax, numBuckets)).apply(value, weight)

  /** Merge persisted partials into the final [[HistResult]]. */
  def nestedHistMerge(buf: Column, infoMin: Long, infoMax: Long,
      numBuckets: Int = 1000): Column =
    udaf(new NestedHistMergeAggregator(infoMin, infoMax, numBuckets))
      .apply(BasicHist.bufFields(buf): _*)

  /** Halving subranges from the top (hist_multi.go:225-256), returned
    * ASCENDING by subMin: (subMin, subMax, bucketWidth, slotOffset, slots).
    * Pure integer math — oracle SQL twins embed these as literals. */
  def layout(infoMin: Long, infoMax: Long, numBuckets: Int): Seq[(Long, Long, Long, Int, Int)] = {
    var bs = infoMax - infoMin
    var right = infoMax
    val subs = Seq.newBuilder[(Long, Long)]
    while (bs > numBuckets) {
      bs >>= 1
      subs += ((right - bs, right))
      right -= bs
    }
    subs += ((infoMin, right))
    val asc = subs.result().reverse // ascending by subMin
    var off = 0
    asc.map { case (lo, hi) =>
      val range = hi - lo
      val width = math.max(1L, (range + numBuckets - 1) / numBuckets)
      val slots = (range / width).toInt + 1
      val t = (lo, hi, width, off, slots)
      off += slots
      t
    }
  }
}

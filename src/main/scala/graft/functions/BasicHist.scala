package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Result of a histogram aggregation: sybil's `-op hist` output surface
  * (mean / observed min,max / weighted count / raw sample count / stddev /
  * p0..p99 percentile array / sparse bucket counts keyed by bucket's low
  * value). See /root/reference/src/lib/hist_basic.go and hist.go:9-25.
  */
case class HistResult(
    count: Long,
    samples: Long,
    mean: Double,
    min: Long,
    max: Long,
    stddev: Double,
    percentiles: Array[Long],
    bucketLows: Array[Long],
    bucketCounts: Array[Long])

/** Mutable aggregation buffer (partial histogram). */
case class HistBuf(
    var counts: Array[Long],   // weight per bucket, length numBuckets+2
    var avgSum: Double,        // sum(weight * value) — exact weighted mean at finish
    var count: Long,           // sum of weights (capped-in values only)
    var samples: Long,         // raw row count
    var min: Long,
    var max: Long,
    var outliers: Array[Long], // values beyond the top bucket (kept raw, like the reference's side array)
    var underliers: Array[Long])

/** Fixed-width histogram with sybil BasicHist semantics
  * (/root/reference/src/lib/hist_basic.go:34-70,100-151):
  *
  *  - bucket width = (max-min)/numBuckets (integer); if that is 0, width 1
  *    for ranges < 100 else range/100 (hist_basic.go:54-63);
  *  - values outside [min, max*10] are silently dropped
  *    (hist_basic.go:101-109 — the outlier guard);
  *  - values past the last bucket are clamped there and kept in a raw
  *    side-array that contributes exactly to stddev (hist_basic.go:132-141,
  *    205-218);
  *  - percentiles p0..p99 come from the cumulative bucket walk
  *    (hist_basic.go:153-183). Deviation: the reference overwrites
  *    `percentiles[p]` with the raw bucket *index* (hist_basic.go:177 — a
  *    bug); we keep the bucket's low value instead.
  *
  * The buffer is associatively mergeable, so Spark's partial/final
  * aggregation (map-side combine, AQE) applies — the Spark-native analog of
  * the reference's per-block partial + MultiCombineResults merge
  * (aggregate.go:326-467).
  *
  * `infoMin`/`infoMax` are the column extents (sybil's stored IntInfo,
  * table_column_info.go); compute them in a cheap pre-pass (parquet footer
  * stats make this nearly free) or supply known bounds.
  */
class BasicHistAggregator(
    infoMin: Long,
    infoMax: Long,
    numBucketsIn: Int = 1000)
  extends Aggregator[(Long, Long), HistBuf, HistResult] with Serializable {

  // setup: hist_basic.go:34-70. Deviation: the reference floors
  // size/buckets, which strands the top ~(size mod buckets) of the range in
  // the clamp bucket (and double-counts it in stddev via the outlier side
  // array, hist_basic.go:132-141). We take the ceiling instead so the
  // buckets span the whole [min, max] extent; small ranges still collapse
  // to width-1 buckets like the reference's size<100 branch.
  private val size: Long = infoMax - infoMin
  val bucketSize: Long = math.max(1L, (size + numBucketsIn - 1) / numBucketsIn)
  val numBuckets: Int = (size / bucketSize).toInt + 2

  def zero: HistBuf = HistBuf(
    new Array[Long](numBuckets), 0.0, 0L, 0L,
    Long.MaxValue, Long.MinValue, Array.empty, Array.empty)

  // hist_basic.go:101-109's guard, made total: `max*10` is a nonsense
  // cutoff for a non-positive max (it drops nearly ALL data) and
  // overflows past Long.MaxValue/10 — the deviation policy applies
  // (replicate the intent, not the arithmetic bug)
  private val upperCutoff: Long =
    if (infoMax <= 0) Long.MaxValue
    else if (infoMax > Long.MaxValue / 10) Long.MaxValue
    else infoMax * 10

  def reduce(b: HistBuf, in: (Long, Long)): HistBuf = {
    val (value, weight) = in
    // Long.MinValue = the null-row sentinel: the DSL encodes a
    // null-populated row with it (sybil skips unpopulated records per
    // column, aggregate.go:246-259) — it must not touch samples or
    // min/max. A genuine ZERO weight is a real record (samples and
    // min/max update, no bucket mass) — the sentinel must sit outside
    // the plausible weight range, hence MinValue and not 0/-1. Negative
    // weights are REJECTED loudly: every finish() statistic (percentile
    // walk, stddev, the count==0 empty guard) assumes non-negative
    // bucket masses, and silently dropping them while Count sums them
    // would be internally inconsistent.
    if (weight == Long.MinValue) return b
    if (weight < 0L) throw new IllegalArgumentException(
      "hist: negative weights are unsupported (bucket masses must be " +
        s"non-negative); got $weight")
    // outlier guard: hist_basic.go:101-109
    if (value > upperCutoff || value < infoMin) return b
    b.samples += 1
    b.count += weight
    b.avgSum += value.toDouble * weight
    if (value < b.min) b.min = value
    if (value > b.max) b.max = value
    var bucket = (value - infoMin) / bucketSize
    if (bucket >= b.counts.length) {
      // the raw side array exists for exact stddev; unbounded growth
      // (quadratic immutable-array appends) means the sidecar extents
      // are badly stale — fail loudly rather than melt down
      if (b.outliers.length >= 10000) throw new IllegalStateException(
        "hist outlier side array exceeded 10000 values — sidecar " +
          "extents are far below the data; run rebuild/update-info")
      b.outliers :+= value
      bucket = b.counts.length - 1
    }
    if (bucket < 0) { b.underliers :+= value; bucket = 0 }
    b.counts(bucket.toInt) += weight
    b
  }

  def merge(a: HistBuf, c: HistBuf): HistBuf = {
    var i = 0
    while (i < a.counts.length) { a.counts(i) += c.counts(i); i += 1 }
    a.avgSum += c.avgSum
    a.count += c.count
    a.samples += c.samples
    a.min = math.min(a.min, c.min)
    a.max = math.max(a.max, c.max)
    a.outliers ++= c.outliers
    a.underliers ++= c.underliers
    a
  }

  def finish(b: HistBuf): HistResult = {
    if (b.count == 0) {
      // no mass, but possibly real records: a group whose rows all carry
      // genuine zero weights still observed samples and extents (reduce
      // updates them before adding mass) — report those; mean/stddev/
      // percentiles have no mass to stand on and stay 0/empty. A truly
      // empty buffer (samples == 0) keeps the all-zero row.
      val mn = if (b.samples > 0) b.min else 0L
      val mx = if (b.samples > 0) b.max else 0L
      return HistResult(0, b.samples, 0.0, mn, mx, 0.0,
        Array.empty, Array.empty, Array.empty)
    }
    val mean = b.avgSum / b.count

    // percentile walk (hist_basic.go:153-183), with two deviations: no
    // raw-index overwrite (reference line 177 stores the bucket index, a
    // bug), and each slot is written exactly once — pcts(p) is the lowest
    // bucket whose cumulative weight reaches p%, not the highest bucket
    // before p+1% (the reference's repeated prevP..p loop drifts upward).
    val pcts = new Array[Long](101)
    pcts(0) = b.min
    var cum = 0L
    var prevP = 0L
    var k = 0
    while (k < b.counts.length) {
      val kc = b.counts(k)
      if (kc > 0) {
        cum += kc
        val p = (100 * cum) / b.count
        if (p > prevP) {
          val bucketVal = k.toLong * bucketSize + infoMin
          var ip = prevP + 1
          while (ip <= p) { pcts(ip.toInt) = bucketVal; ip += 1 }
          prevP = p
        }
      }
      k += 1
    }

    // stddev from buckets + raw out/underliers: hist_basic.go:192-225
    var sumVar = 0.0
    k = 0
    while (k < b.counts.length) {
      if (b.counts(k) > 0) {
        val v = k.toLong * bucketSize + infoMin
        val delta = v.toDouble - mean
        sumVar += delta * delta * (b.counts(k).toDouble / b.count)
      }
      k += 1
    }
    for (v <- b.outliers) { val d = v - mean; sumVar += d * d / b.count }
    for (v <- b.underliers) { val d = v - mean; sumVar += d * d / b.count }

    val lows = Array.newBuilder[Long]
    val cnts = Array.newBuilder[Long]
    k = 0
    while (k < b.counts.length) {
      if (b.counts(k) > 0) {
        lows += k.toLong * bucketSize + infoMin
        cnts += b.counts(k)
      }
      k += 1
    }
    HistResult(b.count, b.samples, mean, b.min, b.max, math.sqrt(sumVar),
      pcts.take(100), lows.result(), cnts.result())
  }

  def bufferEncoder: Encoder[HistBuf] = Encoders.product[HistBuf]
  def outputEncoder: Encoder[HistResult] = Encoders.product[HistResult]
}

/** Finishes with the RAW buffer instead of the result — the per-block
  * partial the query cache persists (the reference's cached
  * SavedQueryResults carry hist buffers the same way, query_cache.go +
  * hist merge in aggregate.go:326-467). ONE generic wrapper shared by all
  * three hist flavors: a HistBuf change cannot silently desynchronize
  * hand-rolled copies. */
class HistPartialOf(inner: Aggregator[(Long, Long), HistBuf, HistResult])
  extends Aggregator[(Long, Long), HistBuf, HistBuf] with Serializable {
  def zero: HistBuf = inner.zero
  def reduce(b: HistBuf, in: (Long, Long)): HistBuf = inner.reduce(b, in)
  def merge(a: HistBuf, c: HistBuf): HistBuf = inner.merge(a, c)
  def finish(b: HistBuf): HistBuf = b
  def bufferEncoder: Encoder[HistBuf] = Encoders.product[HistBuf]
  def outputEncoder: Encoder[HistBuf] = Encoders.product[HistBuf]
}

/** Folds persisted [[HistBuf]] partials back into one [[HistResult]] —
  * the final-merge side of the cached-hist path, generic over the flavor.
  * Correct because the buffer merge is associative and order-insensitive
  * (HistSpec merge law), and the buffer keeps the raw outlier
  * side-arrays, so stddev is identical to the single-pass result. */
class HistMergeOf(inner: Aggregator[(Long, Long), HistBuf, HistResult])
  extends Aggregator[HistBuf, HistBuf, HistResult] with Serializable {
  def zero: HistBuf = inner.zero
  def reduce(b: HistBuf, in: HistBuf): HistBuf = inner.merge(b, in)
  def merge(a: HistBuf, c: HistBuf): HistBuf = inner.merge(a, c)
  def finish(b: HistBuf): HistResult = inner.finish(b)
  def bufferEncoder: Encoder[HistBuf] = Encoders.product[HistBuf]
  def outputEncoder: Encoder[HistResult] = Encoders.product[HistResult]
}

class HistPartialAggregator(infoMin: Long, infoMax: Long, numBuckets: Int = 1000)
  extends HistPartialOf(new BasicHistAggregator(infoMin, infoMax, numBuckets))

class HistMergeAggregator(infoMin: Long, infoMax: Long, numBuckets: Int = 1000)
  extends HistMergeOf(new BasicHistAggregator(infoMin, infoMax, numBuckets))

object BasicHist {
  /** A persisted [[HistBuf]] struct column flattened to its subfields in
    * declaration order — the ONE place the udaf-input field order lives
    * (a HistBuf field rename/reorder must change exactly here). */
  private[functions] def bufFields(buf: Column): Seq[Column] = Seq(
    buf.getField("counts"), buf.getField("avgSum"), buf.getField("count"),
    buf.getField("samples"), buf.getField("min"), buf.getField("max"),
    buf.getField("outliers"), buf.getField("underliers"))

  /** Column expression: histogram of `value` weighted by `weight` with the
    * given column extents. Usable inside any `agg(...)`. */
  def hist(value: Column, weight: Column, infoMin: Long, infoMax: Long,
      buckets: Int = 1000): Column =
    udaf(new BasicHistAggregator(infoMin, infoMax, buckets)).apply(value, weight)

  /** Mergeable per-block partial (a [[HistBuf]] struct column). */
  def histPartial(value: Column, weight: Column, infoMin: Long, infoMax: Long,
      buckets: Int = 1000): Column =
    udaf(new HistPartialAggregator(infoMin, infoMax, buckets)).apply(value, weight)

  /** Merge persisted partials into the final [[HistResult]]. The UDAF's
    * product input flattens to one argument per [[HistBuf]] field, so the
    * struct column is passed as its subfields in declaration order. */
  def histMerge(buf: Column, infoMin: Long, infoMax: Long,
      buckets: Int = 1000): Column =
    udaf(new HistMergeAggregator(infoMin, infoMax, buckets))
      .apply(bufFields(buf): _*)
}

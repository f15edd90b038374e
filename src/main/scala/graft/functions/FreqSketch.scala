package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import scala.collection.mutable

/** One (item, lower-bound count) entry of a [[MisraGries]] summary. */
case class FreqEntry(item: String, count: Long)

/** Misra-Gries heavy-hitters summary buffer: at most `capacity` counters.
  * `decs` tracks the total decrement applied so far — the error bound. */
case class MGBuf(var items: Array[String], var counts: Array[Long],
    var n: Long, var decs: Long)

/** Misra-Gries frequent-items sketch as a mergeable Spark `Aggregator` —
  * the bounded-memory answer to "top tokens over 100 TB": exact per-group
  * top-k (explode → groupBy → window) shuffles the full token stream and
  * keeps every distinct token alive in the aggregation hash; this summary
  * holds at most `capacity` counters per group no matter how many distinct
  * items flow through, and merges associatively so Spark's partial
  * aggregation (map-side combine) applies.
  *
  * Guarantees (standard MG, and what the spec asserts against exact
  * counts): for every item, `true_count - n/(capacity+1) <= est <=
  * true_count`; every item with frequency > n/(capacity+1) is IN the
  * summary. Merge is the Agarwal et al. mergeable-summaries rule: add
  * counters pointwise, then subtract the (capacity+1)-th largest count
  * and drop non-positive counters — the bound degrades additively, never
  * breaks.
  *
  * The finish sorts surviving entries by (count desc, item asc) — a
  * deterministic report given a deterministic input partitioning is NOT
  * guaranteed (MG summaries depend on arrival order), which is why the
  * catalog's oracle-checked q89 is the EXACT top-k and the sketch is
  * spec-verified by its mathematical guarantee instead of a value hash.
  */
class MisraGriesAggregator(capacity: Int)
  extends Aggregator[String, MGBuf, Array[FreqEntry]] with Serializable {
  require(capacity >= 1, "capacity must be >= 1")

  def zero: MGBuf = MGBuf(Array.empty, Array.empty, 0L, 0L)

  private def toMap(b: MGBuf): mutable.LinkedHashMap[String, Long] = {
    val m = mutable.LinkedHashMap.empty[String, Long]
    var i = 0
    while (i < b.items.length) { m.put(b.items(i), b.counts(i)); i += 1 }
    m
  }

  private def fromMap(m: mutable.LinkedHashMap[String, Long], n: Long,
      decs: Long): MGBuf =
    MGBuf(m.keys.toArray, m.values.toArray, n, decs)

  /** Shrink to at most `capacity` counters by subtracting the
    * (capacity+1)-th largest count from every counter and dropping the
    * non-positive remainder. No-op when already within capacity. */
  private def shrink(m: mutable.LinkedHashMap[String, Long]): Long = {
    if (m.size <= capacity) return 0L
    val sorted = m.values.toArray.sorted(Ordering.Long.reverse)
    val sub = sorted(capacity) // (capacity+1)-th largest
    val dead = m.collect { case (k, v) if v <= sub => k }.toList
    dead.foreach(m.remove)
    m.mapValuesInPlace((_, v) => v - sub)
    sub
  }

  /** Hot path: mutate the buffer in place. The common case (item already
    * tracked) is a linear scan over ≤ capacity entries with ZERO
    * allocation — rebuilding a map per input row would dominate the
    * "bounded memory at corpus scale" purpose of the sketch. Null items
    * are SKIPPED (SQL aggregate null semantics), never conflated with the
    * empty string — conflation would overestimate "" and break the
    * `est <= true` guarantee. */
  def reduce(b: MGBuf, item: String): MGBuf = {
    if (item == null) return b
    var i = 0
    while (i < b.items.length) {
      if (b.items(i) == item) { b.counts(i) += 1; b.n += 1; return b }
      i += 1
    }
    if (b.items.length < capacity) { // append (rare after warm-up)
      b.items = b.items :+ item
      b.counts = b.counts :+ 1L
      b.n += 1
      return b
    }
    // full + unseen item: classic MG — decrement every counter (the new
    // item's virtual count 1 cancels against the same decrement), drop
    // zeros. O(capacity), amortized across the ≥ capacity increments
    // that must precede it.
    var j = 0
    while (j < b.counts.length) { b.counts(j) -= 1; j += 1 }
    val keep = b.counts.zipWithIndex.filter(_._1 > 0)
    b.items = keep.map { case (_, idx) => b.items(idx) }
    b.counts = keep.map(_._1)
    b.n += 1
    b.decs += 1
    b
  }

  def merge(a: MGBuf, b: MGBuf): MGBuf = {
    val m = toMap(a)
    var i = 0
    while (i < b.items.length) {
      m.update(b.items(i), m.getOrElse(b.items(i), 0L) + b.counts(i))
      i += 1
    }
    val dec = shrink(m)
    fromMap(m, a.n + b.n, a.decs + b.decs + dec)
  }

  def finish(b: MGBuf): Array[FreqEntry] =
    b.items.zip(b.counts).map { case (k, v) => FreqEntry(k, v) }
      .sortBy(e => (-e.count, e.item))

  def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
  def outputEncoder: Encoder[Array[FreqEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[FreqEntry]]()
}

object FreqSketch {
  /** Column form: `freq_sketch(tokenCol)` usable in `groupBy(...).agg`. */
  def sketch(tokens: Column, capacity: Int): Column =
    udaf(new MisraGriesAggregator(capacity)).apply(tokens)
}

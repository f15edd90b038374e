package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable quantile-summary buffer: exact value→count table while the
  * group's distinct-value count stays ≤ [[QuantileBins.ExactCap]], then a
  * deterministic collapse to fixed log-tick bins over the FULL long range
  * (no extents needed — the property the reference's t-digest flavor
  * exists for, hist_tdigest.go). Both representations are pure multiset
  * functions and the merge is commutative/associative, so the summary is
  * a multiset homomorphism: S(A ∪ B) = merge(S(A), S(B)) EXACTLY, for any
  * split. That is the property the randomized sketches (t-digest, KLL,
  * GK) lack — their result depends on insertion/merge order, so a
  * per-block cached merge could never be bit-identical to the single-pass
  * run. This engine's query-cache invariant is bit-identical cached ==
  * uncached (the HLL register-max precedent), so the -tdigest flavor runs
  * on this summary in BOTH paths.
  *
  * Representation (r12 — the r11 verdict's "immutable Map per row" note,
  * measured at 2.9-5.6 M rows/s/thread before the change): the exact
  * table is open-addressed linear probing over paired long arrays
  * (`ek` keys / `ec` counts — a slot is live iff its count ≠ 0, which is
  * sound because counts are always ≥ 1; `nd` is the live-slot count), and
  * the collapsed histogram is ONE dense long array indexed by
  * `binId + BinBase` — both product-encodable, both allocation-free per
  * row. Persisted partials are COMPACTED to ascending-key order
  * ([[QuantileBins.compact]]), so the cached bytes are a canonical pure
  * function of the block's multiset — insertion order cannot even leak
  * into the cache file.
  */
case class QBinsBuf(
    var collapsed: Boolean,
    var ek: Array[Long],   // exact keys (open-addressed; live iff ec ≠ 0)
    var ec: Array[Long],   // exact counts
    var nd: Long,          // live slots in the exact table
    var bins: Array[Long], // dense collapsed histogram (binId + BinBase)
    var mn: Long,          // exact observed min (Long.MaxValue if n==0)
    var mx: Long,          // exact observed max (Long.MinValue if n==0)
    var n: Long)           // total populated count

/** Deterministic mergeable quantile summary for the DSL's `-tdigest`
  * flavor (hist_tdigest.go surface: percentiles p0..p99, mean = q(0.5),
  * min/max = q(0)/q(1), stddev = 0).
  *
  * Layout: value space is covered by sign × (octave, tick) bins with
  * [[TicksPerOctave]] = 64 ticks per power of two — [[BinCount]] = 8193
  * possible bins, so the collapsed buffer is bounded (64 KiB of longs)
  * regardless of data. Relative value error after collapse ≤ 1/64
  * (~1.6%), comparable to a t-digest's mid-range accuracy; groups with
  * ≤ [[ExactCap]] distinct values (the common case for the DSL's int
  * columns) are EXACT. q(0)/q(1) are always exact (tracked min/max).
  *
  * Accuracy/determinism trade, recorded deliberately: DataSketches KLL
  * was considered for this slot and rejected — its compaction uses
  * random bits (no public seed), so per-block partials merged in cache
  * order vs. Spark's partition order would produce two different (both
  * "correct") answers, breaking the cached == uncached equality gate
  * that every other cacheable op honors bit-for-bit.
  */
class QuantileBinsAggregator
  extends Aggregator[(Long, Long), QBinsBuf, Array[Long]] with Serializable {
  import QuantileBins._

  def zero: QBinsBuf =
    QBinsBuf(collapsed = false, Array.emptyLongArray, Array.emptyLongArray,
      0L, Array.emptyLongArray, Long.MaxValue, Long.MinValue, 0L)

  /** Input: (value, populated). `populated` 0 marks a null row (skipped
    * entirely — sybil skips unpopulated records per column,
    * aggregate.go:246-259); anything else counts one sample. An explicit
    * flag, not an in-band sentinel: every long is a legal data value for
    * a quantile column. */
  def reduce(b: QBinsBuf, in: (Long, Long)): QBinsBuf = {
    val (v, pop) = in
    if (pop == 0L) return b
    b.n += 1
    if (v < b.mn) b.mn = v
    if (v > b.mx) b.mx = v
    if (b.collapsed) {
      b.bins(binId(v) + BinBase) += 1L
    } else {
      insert(b, v, 1L)
      if (b.nd > ExactCap) collapse(b)
    }
    b
  }

  def merge(a: QBinsBuf, c: QBinsBuf): QBinsBuf = {
    a.n += c.n
    a.mn = math.min(a.mn, c.mn)
    a.mx = math.max(a.mx, c.mx)
    if (a.collapsed || c.collapsed) {
      if (!a.collapsed) collapse(a)
      if (c.collapsed) {
        var i = 0
        while (i < c.bins.length) { a.bins(i) += c.bins(i); i += 1 }
      } else {
        var i = 0
        while (i < c.ek.length) {
          if (c.ec(i) != 0L) a.bins(binId(c.ek(i)) + BinBase) += c.ec(i)
          i += 1
        }
      }
    } else {
      var i = 0
      while (i < c.ek.length) {
        if (c.ec(i) != 0L) insert(a, c.ek(i), c.ec(i))
        i += 1
      }
      if (a.nd > ExactCap) collapse(a)
    }
    a
  }

  def finish(b: QBinsBuf): Array[Long] = QuantileBins.finishPcts(b)

  def bufferEncoder: Encoder[QBinsBuf] = Encoders.product[QBinsBuf]
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** Finishes with the RAW buffer — the per-block partial the query cache
  * persists (the HistPartialOf pattern: one wrapper, no hand-rolled copy
  * of the reduce/merge logic). The finish compacts to canonical
  * ascending-key arrays so the persisted bytes are insertion-order-free. */
class QuantileBinsPartialAggregator
  extends Aggregator[(Long, Long), QBinsBuf, QBinsBuf] with Serializable {
  private val inner = new QuantileBinsAggregator
  def zero: QBinsBuf = inner.zero
  def reduce(b: QBinsBuf, in: (Long, Long)): QBinsBuf = inner.reduce(b, in)
  def merge(a: QBinsBuf, c: QBinsBuf): QBinsBuf = inner.merge(a, c)
  def finish(b: QBinsBuf): QBinsBuf = QuantileBins.compact(b)
  def bufferEncoder: Encoder[QBinsBuf] = Encoders.product[QBinsBuf]
  def outputEncoder: Encoder[QBinsBuf] = Encoders.product[QBinsBuf]
}

/** Folds persisted [[QBinsBuf]] partials back into the percentile array —
  * the final-merge side of the cached `-tdigest` path. Bit-identical to
  * the single-pass result because the buffer is a multiset homomorphism
  * (QuantileBinsSpec merge law). Compacted inputs merge fine: the insert
  * path grows any table at ≥½ load before probing, so a 100%-load
  * compacted array is simply re-tabled on first touch. */
class QuantileBinsMergeAggregator
  extends Aggregator[QBinsBuf, QBinsBuf, Array[Long]] with Serializable {
  private val inner = new QuantileBinsAggregator
  def zero: QBinsBuf = inner.zero
  def reduce(b: QBinsBuf, in: QBinsBuf): QBinsBuf = inner.merge(b, in)
  def merge(a: QBinsBuf, c: QBinsBuf): QBinsBuf = inner.merge(a, c)
  def finish(b: QBinsBuf): Array[Long] = QuantileBins.finishPcts(b)
  def bufferEncoder: Encoder[QBinsBuf] = Encoders.product[QBinsBuf]
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object QuantileBins {
  /** Distinct-value cap for the exact representation. Past it the group
    * collapses to bins; the predicate (distinct > cap) is itself a
    * multiset function, so collapse timing cannot depend on row order. */
  val ExactCap = 8192
  /** log2-subdivision: 64 ticks per octave → ≤ 1/64 relative bin width. */
  val TicksPerOctave = 64
  private val TickShift = 6 // log2(TicksPerOctave)
  /** binId range: extremes are −(1 + 63·64) = −4033 (Long.MinValue) and
    * +(1 + 62·64 + 63) = +4032 (Long.MaxValue), so |id| ≤ 4033;
    * BinBase = 4096 is a safe round-up giving indices in [0, 2·4096]. */
  val BinBase = 4096
  val BinCount = 2 * BinBase + 1

  /** Layout version folded into the query-cache key: bump when binId /
    * repr / ExactCap / the persisted buffer shape change, or old
    * persisted partials would merge into a different layout. */
  val LayoutKey: String = s"td.e$ExactCap.t$TicksPerOctave.v3" // v3: array buffers

  // ---- open-addressed exact table (paired long arrays) ----------------
  /** Murmur3 fmix64 — the table's slot scrambler. */
  private def fmix(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33; k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33; k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33; k
  }

  /** Add `cnt` to `key`'s slot, growing at ≥½ load FIRST so a probe
    * always terminates — including over a 100%-load compacted buffer. */
  private[functions] def insert(b: QBinsBuf, key: Long, cnt: Long): Unit = {
    if (2 * b.nd >= b.ek.length) grow(b)
    val mask = b.ek.length - 1
    var slot = (fmix(key) & mask).toInt
    while (b.ec(slot) != 0L && b.ek(slot) != key) slot = (slot + 1) & mask
    if (b.ec(slot) == 0L) { b.ek(slot) = key; b.nd += 1 }
    b.ec(slot) += cnt
  }

  private def grow(b: QBinsBuf): Unit = {
    // capacity MUST stay a power of two (mask probing) — sizing from the
    // current array length would inherit a compacted buffer's arbitrary
    // length; size from the live count instead: smallest power of two
    // ≥ 4·nd keeps post-grow load ≤ ¼ from every starting shape
    var cap = 16
    while (cap.toLong < 4L * math.max(1L, b.nd)) cap <<= 1
    val ek = new Array[Long](cap)
    val ec = new Array[Long](cap)
    val mask = cap - 1
    var i = 0
    while (i < b.ek.length) {
      if (b.ec(i) != 0L) {
        var slot = (fmix(b.ek(i)) & mask).toInt
        while (ec(slot) != 0L) slot = (slot + 1) & mask
        ek(slot) = b.ek(i); ec(slot) = b.ec(i)
      }
      i += 1
    }
    b.ek = ek; b.ec = ec
  }

  /** Canonical form for persistence: live entries only, ascending key
    * order — the cached bytes become a pure multiset function of the
    * block (no insertion-order residue in the table layout). Idempotent:
    * an already-dense buffer (ek.length == nd, any length — NOT a power
    * of two, so mask-probing it would never terminate) is re-sorted in
    * place without table probes; counts are paired with keys during the
    * single live-slot sweep, so no hash lookup happens at all. */
  private[graft] def compact(b: QBinsBuf): QBinsBuf = {
    if (b.collapsed || b.nd == 0L) return b
    val m = b.nd.toInt
    // pair (key, count) during the sweep; sort pairs by key
    val idx = new Array[Int](m)
    var i = 0; var j = 0
    while (i < b.ek.length) {
      if (b.ec(i) != 0L) { idx(j) = i; j += 1 }
      i += 1
    }
    val boxed = new Array[Integer](m)
    j = 0
    while (j < m) { boxed(j) = Integer.valueOf(idx(j)); j += 1 }
    java.util.Arrays.sort(boxed, (x: Integer, y: Integer) =>
      java.lang.Long.compare(b.ek(x.intValue), b.ek(y.intValue)))
    val ek = new Array[Long](m)
    val ec = new Array[Long](m)
    j = 0
    while (j < m) {
      val s = boxed(j).intValue
      ek(j) = b.ek(s); ec(j) = b.ec(s); j += 1
    }
    b.ek = ek; b.ec = ec
    b
  }

  /** Spec/debug views — logical content regardless of table layout. */
  def exactEntries(b: QBinsBuf): Map[Long, Long] =
    b.ek.indices.iterator.filter(b.ec(_) != 0L)
      .map(i => b.ek(i) -> b.ec(i)).toMap
  def binEntries(b: QBinsBuf): Map[Int, Long] =
    b.bins.indices.iterator.filter(b.bins(_) != 0L)
      .map(i => (i - BinBase) -> b.bins(i)).toMap

  /** Order-preserving bin id: negative values map to negative ids, zero
    * to 0, positives to ≥ 1; |id| grows with |value|, so ascending id ==
    * ascending value and a cumulative-count walk yields quantiles. */
  def binId(v: Long): Int =
    if (v == 0L) 0
    else if (v == Long.MinValue) -(1 + 63 * TicksPerOctave) // |v| = 2^63
    else if (v > 0L) 1 + mag(v)
    else -(1 + mag(-v))

  /** Magnitude bin for u ≥ 1: octave = floor(log2 u), tick = the
    * TicksPerOctave-way subdivision of [2^oct, 2^(oct+1)). All shifts —
    * (within << 6) fits because within < 2^oct ≤ 2^62 only when oct ≤ 6
    * takes that branch (within < 128). */
  private def mag(u: Long): Int = {
    val oct = 63 - java.lang.Long.numberOfLeadingZeros(u)
    val within = u - (1L << oct)
    val tick =
      if (oct <= TickShift) ((within << TickShift) >> oct).toInt
      else (within >>> (oct - TickShift)).toInt
    oct * TicksPerOctave + tick
  }

  /** Representative value for a bin: the edge CLOSEST TO ZERO (lower edge
    * for positive bins, negated lower magnitude edge for negative bins) —
    * deterministic, and clamped to the exact min/max at finish so
    * q(0)/q(1) stay exact. */
  def repr(id: Int): Long =
    if (id == 0) 0L
    else if (id > 0) magLowerEdge(id - 1)
    else -magLowerEdge(-id - 1) // id = -(1+63*T) → 1L<<63 → Long.MinValue

  private def magLowerEdge(m: Int): Long = {
    val oct = m / TicksPerOctave
    val tick = m % TicksPerOctave
    val base = 1L << oct // oct == 63 only via the Long.MinValue id
    if (oct >= TickShift)
      // exact: tick·2^(oct-6); tick < 64 so the shift tops out at
      // 63·2^56 < 2^62 — the (tick<<oct)>>6 form overflows for oct ≥ 58
      // and emitted non-monotonic representatives (r11 review find)
      base + (tick.toLong << (oct - TickShift))
    else
      base + (((tick.toLong << oct) + (TicksPerOctave - 1)) >> TickShift) // ceil
  }

  private[functions] def collapse(b: QBinsBuf): Unit = {
    val bins = new Array[Long](BinCount)
    var i = 0
    while (i < b.ek.length) {
      if (b.ec(i) != 0L) bins(binId(b.ek(i)) + BinBase) += b.ec(i)
      i += 1
    }
    b.bins = bins
    b.ek = Array.emptyLongArray; b.ec = Array.emptyLongArray; b.nd = 0L
    b.collapsed = true
  }

  /** 101 quantile values for f = 0.00, 0.01, …, 0.99, 1.00 — the
    * `__pcts` surface SybilQuery reshapes into the hist struct. Rank
    * convention: value at rank ceil(f·n) (1-based, clamped to [1, n]) —
    * q(0) = min, q(1) = max. Null for an empty group (percentile_approx's
    * convention, which this replaces). */
  def finishPcts(b: QBinsBuf): Array[Long] = {
    if (b.n == 0L) return null
    // ascending (value, count) walk arrays
    var vs: Array[Long] = null
    var cs: Array[Long] = null
    if (b.collapsed) {
      var live = 0
      var i = 0
      while (i < b.bins.length) { if (b.bins(i) != 0L) live += 1; i += 1 }
      vs = new Array[Long](live); cs = new Array[Long](live)
      i = 0; var j = 0
      while (i < b.bins.length) { // index ascending == bin id ascending
        if (b.bins(i) != 0L) { vs(j) = repr(i - BinBase); cs(j) = b.bins(i); j += 1 }
        i += 1
      }
    } else {
      val sorted = compact(copyOf(b)) // canonical ascending-key arrays
      vs = sorted.ek; cs = sorted.ec
    }
    val out = new Array[Long](101)
    var j = 0
    var i = 0
    var cum = cs(0)
    while (j <= 100) {
      // exact integer ceil(j·n/100) — float rounding at the boundary
      // would be a rank off-by-one that flips a percentile value
      val rank = math.max(1L, ((BigInt(j) * b.n + 99) / 100).toLong)
      while (cum < rank && i < vs.length - 1) { i += 1; cum += cs(i) }
      out(j) = math.max(b.mn, math.min(b.mx, vs(i)))
      j += 1
    }
    // q(0)/q(1) are EXACT (tracked extremes) — in collapsed mode the
    // last bin's zero-side edge sits below the true max and the clamp
    // alone cannot raise it
    out(0) = b.mn
    out(100) = b.mx
    out
  }

  private def copyOf(b: QBinsBuf): QBinsBuf =
    QBinsBuf(b.collapsed, b.ek.clone(), b.ec.clone(), b.nd, b.bins,
      b.mn, b.mx, b.n)

  /** A persisted [[QBinsBuf]] struct column flattened to its subfields in
    * declaration order — the ONE place the udaf-input field order lives. */
  private[graft] def bufFields(buf: Column): Seq[Column] = Seq(
    buf.getField("collapsed"), buf.getField("ek"), buf.getField("ec"),
    buf.getField("nd"), buf.getField("bins"),
    buf.getField("mn"), buf.getField("mx"), buf.getField("n"))

  /** Column expression: the 101-quantile array of `value` where
    * `populated` ≠ 0 (both long columns). */
  def qpcts(value: Column, populated: Column): Column =
    udaf(new QuantileBinsAggregator).apply(value, populated)

  /** Mergeable per-block partial (a [[QBinsBuf]] struct column). */
  def qpctsPartial(value: Column, populated: Column): Column =
    udaf(new QuantileBinsPartialAggregator).apply(value, populated)

  /** Merge persisted partials into the final 101-quantile array. */
  def qpctsMerge(buf: Column): Column =
    udaf(new QuantileBinsMergeAggregator).apply(bufFields(buf): _*)
}

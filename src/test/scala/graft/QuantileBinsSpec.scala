package graft

import scala.util.Random

import graft.functions.{QBinsBuf, QuantileBins, QuantileBinsAggregator}

/** QuantileBins — the deterministic mergeable quantile summary behind the
  * DSL's `-tdigest` flavor. The load-bearing property is the multiset
  * homomorphism: S(A ∪ B) == merge(S(A), S(B)) for ANY split and ANY
  * order, which is what makes per-block cache partials bit-identical to
  * the single-pass run (randomized sketches — t-digest/KLL/GK — cannot
  * give this). Checked here by fuzz across the exact→collapsed boundary.
  */
class QuantileBinsSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def summarize(vs: Seq[Long]): QBinsBuf = {
    val agg = new QuantileBinsAggregator
    vs.foldLeft(agg.zero)((b, v) => agg.reduce(b, (v, 1L)))
  }

  private def pcts(vs: Seq[Long]): Seq[Long] =
    QuantileBins.finishPcts(summarize(vs)).toSeq

  /** Rank-convention oracle: value at rank ceil(f·n), 1-based. */
  private def exactPcts(vs: Seq[Long]): Seq[Long] = {
    val s = vs.sorted
    (0 to 100).map { j =>
      val rank = math.max(1L, (j.toLong * s.length + 99) / 100)
      s((rank - 1).toInt)
    }
  }

  test("binId is order-consistent and repr is the zero-side edge") {
    val rnd = new Random(7)
    val vs = (Seq(0L, 1L, -1L, 2L, 127L, 128L, Long.MaxValue, Long.MinValue,
      Long.MinValue + 1) ++ Seq.fill(5000)(rnd.nextLong()) ++
      Seq.fill(2000)(rnd.nextInt(100000).toLong - 50000)).distinct
    for (v <- vs) {
      val id = QuantileBins.binId(v)
      val r = QuantileBins.repr(id)
      // representative sits between zero and the value (edge closest to 0)
      if (v > 0) assert(r >= 1 && r <= v, s"v=$v id=$id repr=$r")
      else if (v < 0) assert(r <= -1 && r >= v, s"v=$v id=$id repr=$r")
      else assert(r === 0L)
      // ...and within one tick of it (≤ |v|/64 + 1): the weak in-range
      // check alone let the oct≥58 shift overflow ship wrong edges that
      // were still inside [1, v] (r11 review find)
      val av = math.abs(v.toDouble) // abs on the Long wraps at MinValue
      assert(math.abs(v.toDouble - r.toDouble) <= av / 64 + 1,
        s"repr too far: v=$v repr=$r")
      // |v| <= 127 (octave <= 6): tick width < 1, so bins are EXACT
      if (math.abs(v) <= 127) assert(r === v, s"small value v=$v repr=$r")
    }
    for (Seq(a, b) <- vs.sorted.sliding(2).toSeq) {
      assert(QuantileBins.binId(a) <= QuantileBins.binId(b), s"order $a,$b")
      // monotonic THROUGH repr as well — the percentile walk sorts by
      // bin id and a non-monotonic representative corrupts the array
      assert(QuantileBins.repr(QuantileBins.binId(a)) <=
        QuantileBins.repr(QuantileBins.binId(b)), s"repr order $a,$b")
    }
  }

  test("exact mode (distinct <= cap) reproduces exact rank percentiles") {
    val rnd = new Random(11)
    for (trial <- 0 until 20) {
      val n = 1 + rnd.nextInt(4000)
      // heavy duplication keeps distinct under the cap
      val vs = Seq.fill(n)((rnd.nextInt(500) - 250).toLong * rnd.nextInt(3))
      assert(pcts(vs) === exactPcts(vs), s"trial $trial n=$n")
    }
  }

  test("merge law: S(A++B) == merge(S(A), S(B)) across the collapse boundary") {
    val agg = new QuantileBinsAggregator
    val rnd = new Random(13)
    for (trial <- 0 until 12) {
      // sizes straddle ExactCap so every combination occurs:
      // exact+exact (stays exact), exact+exact (collapses on merge),
      // exact+collapsed, collapsed+collapsed
      val nA = 1 + rnd.nextInt(QuantileBins.ExactCap * 2)
      val nB = 1 + rnd.nextInt(QuantileBins.ExactCap * 2)
      def gen(n: Int) = Seq.fill(n)(
        if (rnd.nextBoolean()) rnd.nextLong() else rnd.nextInt(1000).toLong)
      val a = gen(nA).map(_ * (1 + rnd.nextInt(3))) // some duplicates
      val b = gen(nB)
      val merged = agg.merge(summarize(a), summarize(b))
      val single = summarize(a ++ b)
      assert(merged.collapsed === single.collapsed, s"trial $trial collapsed")
      assert(merged.n === single.n && merged.mn === single.mn &&
        merged.mx === single.mx, s"trial $trial scalars")
      // logical content, independent of table layout (r12: the exact
      // table is open-addressed arrays; slot order may differ by
      // insertion path, the multiset may not)
      assert(QuantileBins.exactEntries(merged) ===
        QuantileBins.exactEntries(single), s"trial $trial exact")
      assert(QuantileBins.binEntries(merged) ===
        QuantileBins.binEntries(single), s"trial $trial bins")
      assert(QuantileBins.finishPcts(merged).toSeq ===
        QuantileBins.finishPcts(single).toSeq, s"trial $trial pcts")
    }
  }

  test("order independence: shuffled input yields identical summaries") {
    val rnd = new Random(17)
    val vs = Seq.fill(QuantileBins.ExactCap + 3000)(rnd.nextLong() % 100000000L)
    val p1 = pcts(vs)
    val p2 = pcts(rnd.shuffle(vs))
    assert(p1 === p2)
  }

  test("compacted partials are canonical: byte-identical arrays for any " +
      "insertion order (what the query cache persists)") {
    val rnd = new Random(23)
    val vs = Seq.fill(3000)(rnd.nextLong() % 100000L)
    val a = QuantileBins.compact(summarize(vs))
    val b = QuantileBins.compact(summarize(rnd.shuffle(vs)))
    assert(a.ek.toSeq === b.ek.toSeq && a.ec.toSeq === b.ec.toSeq)
    assert(a.ek.toSeq === a.ek.sorted.toSeq) // ascending-key canonical form
    // a compacted (100%-load) buffer still merges: the insert path grows
    // any table at ≥ half load before probing
    val agg = new QuantileBinsAggregator
    val m = agg.merge(QuantileBins.compact(summarize(vs.take(1500))),
      QuantileBins.compact(summarize(vs.drop(1500))))
    assert(QuantileBins.exactEntries(m) === QuantileBins.exactEntries(a))
  }

  test("compact is idempotent: re-compacting a dense (arbitrary-length, " +
      "non-power-of-two) buffer terminates and is a no-op (ADVICE r12 " +
      "latent hang: mask-probing a length-3 array can never terminate)") {
    // 3 live keys → compacted length 3, the exact shape the old countOf
    // probe could spin on
    val b1 = QuantileBins.compact(summarize(Seq(7L, -2L, 100L, 7L)))
    assert(b1.ek.length === 3)
    val ek = b1.ek.clone(); val ec = b1.ec.clone()
    val b2 = QuantileBins.compact(b1)
    assert(b2.ek.toSeq === ek.toSeq && b2.ec.toSeq === ec.toSeq)
    // and a larger one for good measure
    val rnd = new Random(41)
    val vs = Seq.fill(2000)(rnd.nextLong() % 50000L)
    val c1 = QuantileBins.compact(summarize(vs))
    val c2 = QuantileBins.compact(QuantileBins.compact(summarize(vs)))
    assert(c1.ek.toSeq === c2.ek.toSeq && c1.ec.toSeq === c2.ec.toSeq)
  }

  test("collapsed mode: min/max exact, interior error bounded by bin width") {
    val rnd = new Random(19)
    val vs = Seq.fill(QuantileBins.ExactCap + 5000)(
      math.abs(rnd.nextLong()) % 1000000000L + 1L)
    val got = pcts(vs)
    val exact = exactPcts(vs)
    assert(got.head === vs.min && got.last === vs.max)
    for (j <- 1 until 100) {
      // representative = bin lower edge, bin width <= value/64, so the
      // estimate sits in (exact*(1-1/64) - 1, exact]
      val e = exact(j).toDouble
      assert(got(j) <= exact(j) && got(j) >= e - e / 64 - 1,
        s"p$j got=${got(j)} exact=${exact(j)}")
    }
  }

  test("collapsed mode at FULL long magnitudes: error bound holds up to " +
      "Long.MaxValue (octaves 58-62 overflowed pre-fix)") {
    val rnd = new Random(29)
    // half the mass in the top octaves where tick<<oct used to wrap
    val vs = Seq.fill(QuantileBins.ExactCap + 4000) {
      val u = math.abs(rnd.nextLong()) | 1L
      if (rnd.nextBoolean()) u else u >>> rnd.nextInt(40)
    }
    val got = pcts(vs)
    val exact = exactPcts(vs)
    assert(got.head === vs.min && got.last === vs.max)
    for (j <- 1 until 100) {
      val e = exact(j).toDouble
      assert(got(j) <= exact(j) && got(j) >= e - e / 64 - 1,
        s"p$j got=${got(j)} exact=${exact(j)}")
    }
    // monotone percentile array — the visible symptom of the overflow
    for (j <- 1 to 100)
      assert(got(j) >= got(j - 1), s"non-monotone at p$j")
  }

  test("null rows (populated=0) are skipped entirely") {
    val agg = new QuantileBinsAggregator
    var b = agg.zero
    b = agg.reduce(b, (42L, 1L))
    b = agg.reduce(b, (Long.MinValue, 0L)) // a null row carrying junk value
    b = agg.reduce(b, (7L, 1L))
    assert(b.n === 2L && b.mn === 7L && b.mx === 42L)
    assert(QuantileBins.finishPcts(agg.zero) === null, "empty group -> null")
  }
}

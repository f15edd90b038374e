package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Count-Min sketch buffer: a flat `depth × width` counter matrix. */
case class CmsBuf(counters: Array[Long])

/** Count-Min sketch as a mergeable Spark `Aggregator`: point-frequency
  * estimates with `est ≥ exact` (one-sided) and
  * `est ≤ exact + ε·N` w.h.p. for `width ≈ e/ε`, `depth ≈ ln(1/δ)`.
  *
  * Complements the other sketches in the engine: HLL answers "how many
  * distinct", Misra-Gries answers "which items are frequent", CMS answers
  * "how frequent is THIS item" for arbitrary post-hoc probes — without
  * the groupBy-per-item shuffle an exact count needs. The buffer is a
  * fixed `depth·width` long array: partial aggregation reduces items
  * map-side into per-partition matrices and the shuffle carries one
  * matrix per partition, never per-item state — the whole point at
  * 100 TB (an exact tf over a 10^9-term vocabulary shuffles 10^9 rows;
  * CMS shuffles `partitions · depth · width` longs).
  *
  * Row hashes are md5-based (`md5(r ‖ ":" ‖ item)`, first 8 hex chars as
  * an integer, mod width) — the same engine-portable convention as
  * [[graft.operators.Sampling.hashBucket]], so an oracle can rebuild the
  * identical matrix in SQL: counter(r, b) = Σ count(item) over items
  * with bucket_r(item) = b.
  *
  * Reference scope note: sybil's only sketch is HLL count-distinct
  * (src/lib/hll.go); the frequency-sketch family is part of this
  * engine's training-data-pipeline extension surface.
  */
class CmsAggregator(depth: Int, width: Int)
    extends Aggregator[String, CmsBuf, Array[Long]] {
  require(depth >= 1 && width >= 1, "cms: depth and width must be >= 1")

  def zero: CmsBuf = CmsBuf(new Array[Long](depth * width))

  // MessageDigest is neither thread-safe nor serializable: one per
  // executor thread, rebuilt after deserialization
  @transient private lazy val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  @inline private def bucket(r: Int, item: String): Int = {
    val md = mdLocal.get()
    val hex = md.digest(s"$r:$item".getBytes(StandardCharsets.UTF_8))
    // first 8 hex chars = first 4 bytes, as an unsigned 32-bit value
    val v = ((hex(0) & 0xffL) << 24) | ((hex(1) & 0xffL) << 16) |
      ((hex(2) & 0xffL) << 8) | (hex(3) & 0xffL)
    (v % width).toInt
  }

  def reduce(b: CmsBuf, item: String): CmsBuf = {
    if (item != null) {
      var r = 0
      while (r < depth) {
        b.counters(r * width + bucket(r, item)) += 1L
        r += 1
      }
    }
    b
  }

  def merge(a: CmsBuf, b: CmsBuf): CmsBuf = {
    val ac = a.counters; val bc = b.counters
    var i = 0
    while (i < ac.length) { ac(i) += bc(i); i += 1 }
    a
  }

  def finish(b: CmsBuf): Array[Long] = b.counters

  def bufferEncoder: Encoder[CmsBuf] = Encoders.product[CmsBuf]
  def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CmsSketch {
  /** Column form: `cms_sketch(itemCol)` usable in `agg` — returns the
    * flat `depth·width` counter matrix. */
  def sketch(item: Column, depth: Int, width: Int): Column =
    udaf(new CmsAggregator(depth, width)).apply(item)

  /** Point estimate from a sketch column: `min` over the `depth` row
    * counters the item hashes to. `itemBucket` must use the SAME md5
    * convention as the aggregator (see [[estimateExpr]]). */
  def estimateExpr(matrix: Column, item: Column, depth: Int, width: Int): Column = {
    import org.apache.spark.sql.functions._
    val rows = (0 until depth).map { r =>
      val b = conv(substring(md5(concat(lit(r.toString), lit(":"), item)), 1, 8),
        16, 10).cast("long") % width
      element_at(matrix, (lit(r * width) + b + 1).cast("int"))
    }
    least(rows: _*)
  }

  /** Inner-product estimate from TWO sketches (Cormode & Muthukrishnan
    * §4.2): `min over rows r of Σ_w A[r][w]·B[r][w]` estimates
    * `Σ_key count_A(key)·count_B(key)` — the EQUI-JOIN SIZE of the two
    * relations on the sketched key, one-sided (`est ≥ exact`) with
    * `ε·N_A·N_B` error w.h.p. This is the planner's tool: predict a
    * join's output cardinality from two `depth·width` matrices without
    * shuffling either input. Products and row sums fold in decimal(38,0)
    * (counter products at 10^12-row scale overflow a long), finished
    * with one exact cast back. */
  def innerProductExpr(a: Column, b: Column, depth: Int,
      width: Int): Column = {
    import org.apache.spark.sql.functions._
    val dec = "decimal(38,0)"
    val rows = (0 until depth).map { r =>
      aggregate(
        zip_with(slice(a, r * width + 1, width), slice(b, r * width + 1, width),
          (x, y) => x.cast(dec) * y.cast(dec)),
        lit(0).cast(dec),
        (acc, x) => acc + x).cast("long")
    }
    least(rows: _*)
  }
}

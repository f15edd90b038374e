package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table layout for co-located joins — the storage-level answer
  * to the one shuffle Catalyst cannot remove: a big⋈big equi-join on a
  * key neither side is partitioned by. Writing both sides bucketed (and
  * sorted) on the join key pins rows to hash buckets at WRITE time, so
  * every later join or aggregation on that key plans with zero Exchange —
  * at 100 TB that converts the nightly fact⋈fact join from a full
  * two-sided shuffle into a metadata lookup. The reference engine has no
  * equivalent (single-node, no joins); this is Spark-native capability
  * the engine exposes for its own tables.
  *
  * The trade: bucketed layout costs one shuffle-by-key at write time and
  * fixes the bucket count, so it pays off for keys joined or aggregated
  * repeatedly (user_id, doc content-hash), not ad-hoc exploration.
  * Bucket-pruning on point lookups is a further read-side win.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted external parquet table registered
    * under `name` at `path`. `overwrite` drops any previous registration
    * (the catalog entry, not just the files — stale bucketing metadata is
    * worse than none, since Spark would trust it and skip a needed
    * shuffle).
    */
  def writeBucketed(df: DataFrame, name: String, path: String,
      keyCol: String, buckets: Int): Unit = {
    require(buckets > 0, "buckets must be positive")
    val spark = df.sparkSession
    // quote each PART of a possibly-qualified name: one backtick pair
    // around db.tbl would drop a table literally named "db.tbl" (a
    // no-op) while saveAsTable addresses db=db, table=tbl — leaving the
    // stale bucket-spec registration this drop exists to prevent
    spark.sql("DROP TABLE IF EXISTS " +
      name.split('.').map(p => s"`$p`").mkString("."))
    df.write
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .option("path", path)
      .mode(SaveMode.Overwrite)
      .saveAsTable(name)
  }

  /** Read a bucketed table back WITH its bucketing metadata (a plain
    * `spark.read.parquet(path)` would see the same rows but lose the
    * layout guarantee and re-shuffle on join). */
  def readBucketed(spark: SparkSession, name: String): DataFrame =
    spark.table(name)

  /** Z-order (Morton) interleave of two non-negative integer columns,
    * `bits` bits each: bit `i` of `x` lands at bit `2i`, bit `i` of `y`
    * at `2i+1`. A contiguous z-range maps to an axis-aligned tile in
    * (x, y) space — sorting by z clusters BOTH dimensions at once, which
    * is what makes it a layout key (single-column sorting clusters one
    * dimension and scatters the other).
    *
    * Pure bit arithmetic over built-in expressions (shift/and/sum) — runs
    * fused inside whole-stage codegen, engine-portable, no UDF.
    */
  def zorder2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Write `df` parquet with rows CLUSTERED on the z-order curve of
    * (`xCol`, `yCol`): range-partition on the z-value, sort within each
    * partition by it. Every output file then covers a narrow tile of BOTH
    * dimensions, so parquet min/max row-group stats prune scans filtered
    * on EITHER column — the multi-dimensional data-skipping layout
    * (single-key sorting only prunes its own column). At 100 TB this is
    * the difference between "point query on (x, y) reads a few files" and
    * "reads everything that matches the first sort key".
    *
    * The two columns are normalized into `[0, 2^bits)` by their own
    * min/max extents (one tiny agg job), so skew in raw value ranges does
    * not collapse the curve.
    */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
      partitions: Int, bits: Int = 16): Unit = {
    val r = df.agg(min(col(xCol)).cast("double"), max(col(xCol)).cast("double"),
      min(col(yCol)).cast("double"), max(col(yCol)).cast("double")).collect()(0)
    // empty input (or all-null columns): no extents — degenerate to a
    // plain write (everything lands in z = 0) instead of an NPE
    def ext(i: Int): Double = if (r.isNullAt(i)) 0.0 else r.getDouble(i)
    val (xmin, xmax, ymin, ymax) = (ext(0), ext(1), ext(2), ext(3))
    val span = (1L << bits) - 1
    def norm(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else least(lit(span), floor((c.cast("double") - lo) / (hi - lo) * span)
        .cast("long"))
    val z = zorder2(norm(col(xCol), xmin, xmax), norm(col(yCol), ymin, ymax),
      bits)
    require(!df.columns.contains("__z"),
      "writeZOrdered: input already has a __z column (it would be " +
        "silently overwritten and dropped)")
    df.withColumn("__z", z)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}

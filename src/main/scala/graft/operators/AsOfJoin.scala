package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, the single right row with the
  * greatest `rightTime <= leftTime` for the same key — the standard
  * event-stream enrichment operator (latest dimension state at event time).
  *
  * Spark has no native as-of join; the classic MERGE-style trick is used:
  * union both sides tagged, sort within each key by (time, side) with right
  * rows first on ties, and carry the last-seen right payload forward with a
  * running `last(..., ignoreNulls)` window. ONE shuffle on the key — no
  * range explosion, no per-key loops; at 100 TB this behaves like any other
  * keyed window (state = one row).
  */
object AsOfJoin {

  /** @param right must be unique per (key, time) — pre-reduce it otherwise
    *              (ties would make the match nondeterministic).
    * @param payload right columns to carry onto left rows; null payload
    *                values are carried as-is (they neither drop the match
    *                nor pull values from an older right row).
    * @param saltBuckets skew escape hatch: with the default 1, each key is
    *                one window partition — a single hot key (one user with
    *                90% of events) serializes into one task. With S > 1,
    *                left rows scatter across S sub-partitions of their key
    *                and right rows replicate into all S, so the hot key's
    *                work parallelizes S-ways at the cost of an S× copy of
    *                the (small, pre-reduced) right side. Results are
    *                identical — each sub-partition still sees every right
    *                row ≤ any of its left times. */
  def backward(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String],
      saltBuckets: Int = 1): DataFrame = {

    val lCols = left.columns.toSeq
    // a payload name colliding with a left column would emit duplicate
    // output columns (any later by-name reference throws
    // AMBIGUOUS_REFERENCE); internal scratch names would be silently
    // overwritten
    val reserved = Set("__key", "__t", "__side", "__salt", "__p")
    require(payload.forall(c => !lCols.contains(c) && !reserved(c)),
      s"asof payload names must not collide with left columns or " +
        s"internal names: ${payload.filter(c =>
          lCols.contains(c) || reserved(c)).mkString(", ")}")
    require(lCols.forall(!reserved(_)),
      s"left columns must not use reserved names: ${
        lCols.filter(reserved).mkString(", ")}")
    // all payload columns travel in ONE struct through ONE last(ignoreNulls)
    // window, so every output row stitches from a single right row (mixed-row
    // results were possible with independent per-column windows when payload
    // values were null); a constant marker field distinguishes matched from
    // unmatched left rows even when every payload value is null
    val pType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__matched", org.apache.spark.sql.types.IntegerType,
        nullable = false) +: payload.map(c => right.schema(c)))
    // side 0 = right, 1 = left: at equal times right sorts first so a right
    // row at exactly leftTime matches (asof uses <=)
    // salt: left rows scatter (any deterministic-per-row value works — the
    // match result does not depend on which sub-partition a left row lands
    // in); right rows replicate to every salt so each sub-partition is
    // self-sufficient
    val lSalt: Column =
      if (saltBuckets <= 1) lit(0)
      else pmod(hash(lCols.map(col): _*), lit(saltBuckets))
    // ASOF semantics: null never matches — a null rightTime would sort
    // NULLS FIRST and become a universal "earliest" match, and null keys
    // would match each other through the window partition (null == null
    // in partitionBy, unlike an equi-join). Null-key/time left rows are
    // unmatchable by definition and drop like any unmatched left row.
    val l = left
      .filter(col(leftKey).isNotNull && col(leftTime).isNotNull)
      .withColumn("__key", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__salt", lSalt)
      .select(Seq(col("__key"), col("__t"), col("__side"), col("__salt")) ++
        lCols.map(col) :+ lit(null).cast(pType).as("__p"): _*)
    val rBase = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .withColumn("__key", col(rightKey))
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
    val r = (if (saltBuckets <= 1) rBase.withColumn("__salt", lit(0))
             else rBase.withColumn("__salt",
               explode(sequence(lit(0), lit(saltBuckets - 1)))))
      .select(Seq(col("__key"), col("__t"), col("__side"), col("__salt")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(lit(1).as("__matched") +: payload.map(c => col(c).as(c)): _*).as("__p"): _*)

    val w = Window.partitionBy(col("__key"), col("__salt"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .select(lCols.map(col) ++ Seq(col("__side"),
        last(col("__p"), ignoreNulls = true).over(w).as("__carry")): _*)
      .filter(col("__side") === 1 && col("__carry").isNotNull)
      .select(lCols.map(col) ++ payload.map(c => col("__carry").getField(c).as(c)): _*)
  }
}

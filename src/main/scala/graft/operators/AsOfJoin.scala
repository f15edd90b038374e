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
    * @param payload right columns to carry onto left rows. */
  def backward(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String]): DataFrame = {

    val lCols = left.columns.toSeq
    // side 0 = right, 1 = left: at equal times right sorts first so a right
    // row at exactly leftTime matches (asof uses <=)
    val l = left
      .withColumn("__key", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select(Seq(col("__key"), col("__t"), col("__side")) ++
        lCols.map(col) ++ payload.map(c => lit(null).cast(right.schema(c).dataType).as(s"__p_$c")): _*)
    val r = right
      .withColumn("__key", col(rightKey))
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(Seq(col("__key"), col("__t"), col("__side")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(c => col(c).as(s"__p_$c")): _*)

    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .select((lCols.map(col) :+ col("__side")) ++
        payload.map(c => last(col(s"__p_$c"), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("__side") === 1 && col(payload.head).isNotNull)
      .drop("__side")
  }
}

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
    *                nor pull values from an older right row). */
  def backward(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String]): DataFrame = {

    val lCols = left.columns.toSeq
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
    val l = left
      .withColumn("__key", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select(Seq(col("__key"), col("__t"), col("__side")) ++
        lCols.map(col) :+ lit(null).cast(pType).as("__p"): _*)
    val r = right
      .withColumn("__key", col(rightKey))
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(Seq(col("__key"), col("__t"), col("__side")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(lit(1).as("__matched") +: payload.map(c => col(c).as(c)): _*).as("__p"): _*)

    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .select(lCols.map(col) ++ Seq(col("__side"),
        last(col("__p"), ignoreNulls = true).over(w).as("__carry")): _*)
      .filter(col("__side") === 1 && col("__carry").isNotNull)
      .select(lCols.map(col) ++ payload.map(c => col("__carry").getField(c).as(c)): _*)
  }
}

package graft.core

import org.apache.spark.sql.DataFrame

/** Result sinks matching the reference's output surface
  * (/root/reference/src/lib/printer.go:291-308 console; 15-22 `-json`).
  * Spark's `show` covers the tabular console path; this adds the JSON
  * envelope shape (`results` array of objects with group cols + Count/
  * Samples/aggregates) a sybil client would parse.
  */
object Printer {

  /** JSON lines, one object per result row (printer.go printJson). */
  def toJsonLines(df: DataFrame): Seq[String] =
    df.toJSON.collect().toSeq

  /** The `-json` envelope: {"results": [...]} */
  def toJsonEnvelope(df: DataFrame): String =
    df.toJSON.collect().mkString("{\"results\":[", ",", "]}")

  /** Console table (printer.go tabular path). */
  def printConsole(df: DataFrame, limit: Int = 100): Unit =
    df.show(limit, truncate = false)

  /** Sybil's hist console lines (printer.go:210-229):
    * {{{ group (Count) \n   col | p0 p99 | avg | p0 p25 p50 p75 p99 | std }}}
    * One bounded collect (result sink, rows already limited). */
  def printHistConsole(df: DataFrame, limit: Int = 100): Unit = {
    val histCols = df.schema.fields.filter(_.name.endsWith("_hist")).map(_.name)
    val groupCols = df.schema.fields.map(_.name)
      .filterNot(n => n.endsWith("_hist") || n == "Count" || n == "Samples")
    for (r <- df.limit(limit).collect()) {
      val key = groupCols.map(c => String.valueOf(r.getAs[Any](c))).mkString("\t")
      println(s"$key (${r.getAs[Long]("Count")})")
      for (hc <- histCols) {
        val h = r.getStruct(r.fieldIndex(hc))
        val p = h.getAs[collection.Seq[Long]]("percentiles")
        val name = f"  ${hc.stripSuffix("_hist")}%5s"
        if (p.nonEmpty)
          println(f"$name | ${p(0)} ${p(99)} | ${h.getAs[Double]("mean")}%.2f | " +
            f"${p(0)} ${p(25)} ${p(50)} ${p(75)} ${p(99)} | ${h.getAs[Double]("stddev")}%.2f")
        else println(s"$name No Data")
      }
    }
  }
}

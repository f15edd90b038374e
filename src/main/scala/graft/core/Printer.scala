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
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — a training corpus must be scrubbed of
  * emails, phone numbers, and IP addresses before the text is ever used.
  *
  * The patterns are deliberately written in the common subset of Java
  * regex (Spark) and RE2 (DuckDB/Go scanners): no backreferences, no
  * lookaround — so the exact same pattern text runs in the engine, the
  * oracle, and any downstream Go/Rust scrubber.
  *
  * Scale: both scan and redact are pure per-row projections (codegen'd
  * `regexp_count` / `regexp_replace`) — no shuffle, no UDF; they fuse into
  * whatever scan precedes them. Cost is O(bytes) per row with compiled
  * regexes cached per-task by Spark's expression runtime.
  */
object Pii {

  /** `local@domain.tld` — permissive local part (incl. `#` for synthetic
    * corpus ids), 2+ alpha TLD. */
  val EmailRe = "[A-Za-z0-9._%+#-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** TPC-H-style international phone: `CC-NNN-NNN-NNNN` (country code 2
    * digits). Word-bounded so account numbers do not partially match. */
  val PhoneRe = "\\b[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** Dotted-quad IPv4, word-bounded. (Octet range is not validated —
    * over-matching is the safe direction for redaction.) */
  val Ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** Total PII match count over ALL categories — the single-sourced
    * composite other modules (e.g. [[Curation.report]]) filter on, so
    * adding a category here updates every consumer at once. */
  def totalCol(text: Column): Column =
    cats.map { case (_, re, _) => regexp_count(text, lit(re)) }
      .reduce(_ + _).cast("long")

  private val cats: Seq[(String, String, String)] = Seq(
    ("email", EmailRe, "<EMAIL>"),
    ("phone", PhoneRe, "<PHONE>"),
    ("ipv4", Ipv4Re, "<IP>"))

  /** Per-document PII hit counts: `(id, n_email, n_phone, n_ipv4,
    * pii_total)`. */
  def scan(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = cats.map { case (name, re, _) =>
      regexp_count(col(textCol), lit(re)).cast("long").as(s"n_$name")
    }
    docs.select((col(idCol) +: counts): _*)
      .withColumn("pii_total",
        cats.map(c => col(s"n_${c._1}")).reduce(_ + _))
  }

  private def redactedCol(textCol: String): Column =
    cats.foldLeft(col(textCol)) { case (c, (_, re, token)) =>
      regexp_replace(c, re, token)
    }

  /** Redact all PII categories in place: `(id, redacted)`. Replacement
    * order is email → phone → ipv4; the placeholder tokens contain no
    * digits or `@`, so earlier replacements can never create or destroy a
    * later category's match. */
  def redact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), redactedCol(textCol).as("redacted"))

  /** Scan AND redact in ONE projection: `(id, n_email, n_phone, n_ipv4,
    * pii_total, redacted)`. Use this over `scan ⋈ redact` when both are
    * wanted — a self-join would compute the input text twice and shuffle
    * on the id for no reason; this stays a single codegen'd map. */
  def annotate(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = cats.map { case (name, re, _) =>
      regexp_count(col(textCol), lit(re)).cast("long").as(s"n_$name")
    }
    docs.select((col(idCol) +: counts :+ redactedCol(textCol).as("redacted")): _*)
      .withColumn("pii_total",
        cats.map(c => col(s"n_${c._1}")).reduce(_ + _))
  }
}

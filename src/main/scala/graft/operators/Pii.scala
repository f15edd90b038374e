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
  * Scale: both scan and redact are pure per-row projections — no shuffle,
  * no UDF; they fuse into whatever scan precedes them. Since r12 they run
  * on the [[graft.expressions.PiiKernel]] byte-pass scanners
  * (`graft_pii_count` / `graft_pii_redact`), byte-exact to the regex
  * chain for every input (the NormalizeText playbook: the chain's
  * `java.util.regex` matcher cost plus its per-row allocation pressure
  * was q69's residual CPU at sf3 — SCALE.md r11); the pattern TEXTS
  * below stay single-sourced for the DuckDB oracles and any downstream
  * RE2 scrubber.
  */
object Pii {

  /** `local@domain.tld` — permissive local part (incl. `#` for synthetic
    * corpus ids), 2+ alpha TLD. */
  val EmailRe: String = graft.expressions.PiiKernel.EmailRe

  /** TPC-H-style international phone: `CC-NNN-NNN-NNNN` (country code 2
    * digits). Word-bounded so account numbers do not partially match. */
  val PhoneRe: String = graft.expressions.PiiKernel.PhoneRe

  /** Dotted-quad IPv4, word-bounded. (Octet range is not validated —
    * over-matching is the safe direction for redaction.) */
  val Ipv4Re: String = graft.expressions.PiiKernel.Ipv4Re

  /** Total PII match count over ALL categories — the single-sourced
    * composite other modules (e.g. [[Curation.report]]) filter on, so
    * adding a category here updates every consumer at once. */
  def totalCol(text: Column): Column =
    call_function("graft_pii_count", text, lit("total"))

  private val catNames = Seq("email", "phone", "ipv4")

  /** Per-document PII hit counts: `(id, n_email, n_phone, n_ipv4,
    * pii_total)`. */
  def scan(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = catNames.map { name =>
      call_function("graft_pii_count", col(textCol), lit(name))
        .as(s"n_$name")
    }
    docs.select((col(idCol) +: counts): _*)
      .withColumn("pii_total",
        catNames.map(c => col(s"n_$c")).reduce(_ + _))
  }

  private def redactedCol(textCol: String): Column =
    call_function("graft_pii_redact", col(textCol))

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
    val counts = catNames.map { name =>
      call_function("graft_pii_count", col(textCol), lit(name))
        .as(s"n_$name")
    }
    docs.select((col(idCol) +: counts :+ redactedCol(textCol).as("redacted")): _*)
      .withColumn("pii_total",
        catNames.map(c => col(s"n_$c")).reduce(_ + _))
  }
}

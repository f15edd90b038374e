package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end corpus curation verdict: one pass that stamps every
  * document with the signals a C4-style cleaning pipeline filters on and a
  * composite keep/drop decision — the "run the whole pipeline" entry point
  * that composes the individual operators ([[TextAnalysis.normalizeText]],
  * [[Pii]] patterns, exact-dup ranking) instead of re-implementing them.
  *
  * Scale: one projection computes normalization, token stats, and PII
  * counts fused over the scan; the only shuffle is the duplicate-rank
  * window keyed on the normalized-content hash (uniform key; identical
  * copies land together, which is the point). Verdict thresholds stay in
  * the plan as literals.
  */
object Curation {

  /** Per-document curation report: `(id, n_tokens, ttr, pii_total,
    * dup_rank, keep_doc)`. A document is kept iff it is the canonical
    * (lowest-id) copy of its normalized content, long enough, lexically
    * diverse enough, and PII-free.
    */
  def report(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Long = 5L, minTtr: Double = 0.3): DataFrame = {
    val toks = split(col(textCol), " ")
    val piiTotal = Seq(Pii.EmailRe, Pii.PhoneRe, Pii.Ipv4Re)
      .map(re => regexp_count(col(textCol), lit(re)))
      .reduce(_ + _).cast("long")
    val base = docs.select(
      col(idCol),
      md5(TextAnalysis.normalizeText(col(textCol))).as("__fp"),
      size(toks).cast("long").as("n_tokens"),
      (size(array_distinct(toks)).cast("double") / size(toks)).as("ttr"),
      piiTotal.as("pii_total"))
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol))
    base
      .withColumn("dup_rank", row_number().over(w).cast("long"))
      .withColumn("keep_doc",
        col("dup_rank") === 1L && col("n_tokens") >= minTokens &&
          col("ttr") >= minTtr && col("pii_total") === 0L)
      .drop("__fp")
  }

  /** Exact score-band bucketing (decile/percentile assignment) without a
    * global row sort. `NTILE`/`row_number` over the whole table would pull
    * every row through one window task — the canonical scale-killer. This
    * instead computes, per DISTINCT score value, how many rows score
    * strictly higher, and assigns `bucket = (buckets · higher) div total`
    * — integer arithmetic only, ties share a bucket (so boundaries shift
    * by tie mass rather than splitting ties arbitrarily).
    *
    * The window runs over the distinct-value AGGREGATE (bounded by the
    * score's value range, e.g. ≤ a few thousand for integer length
    * scores), never over rows; the per-value cutoffs broadcast back onto
    * the table. For unbounded-cardinality double scores, quantize the
    * score into integer bands first.
    */
  /** Corpus snapshot diff: per document id, whether the new snapshot
    * `added` it, `removed` it, `changed` its bytes, or left it
    * `unchanged` — the audit run between two crawl/ingest versions before
    * retraining decisions ("how much actually moved?"). Comparison is by
    * content hash, so moved/recompressed storage reads as unchanged.
    *
    * Output: `(id, status)`, one row per id present in either snapshot.
    *
    * Scale shape: each side reduces to `(id, md5)` in its scan
    * projection — raw text never crosses the shuffle — then ONE
    * full-outer equi-join on the id. Both sides shuffle once on the same
    * uniform key (or zero times if both snapshots are bucketed on id,
    * the layout [[graft.sources.Bucketing]] writes); the status is a
    * null-pattern projection on the joined row.
    */
  def snapshotDiff(oldDocs: DataFrame, newDocs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val o = oldDocs.select(col(idCol).as("id"), md5(col(textCol)).as("__ho"))
    val n = newDocs.select(col(idCol).as("id"), md5(col(textCol)).as("__hn"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("__ho").isNull, lit("added"))
          .when(col("__hn").isNull, lit("removed"))
          .when(col("__ho") === col("__hn"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  def exactScoreBands(df: DataFrame, idCol: String, scoreCol: String,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val g = df.groupBy(col(scoreCol)).agg(count(lit(1)).as("__c"))
    val w = Window.orderBy(col(scoreCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = g.select(col(scoreCol),
        coalesce(sum(col("__c")).over(w), lit(0L)).as("__higher"))
      .crossJoin(broadcast(df.agg(count(lit(1)).as("__total"))))
    df.select(col(idCol), col(scoreCol))
      .join(broadcast(cum), Seq(scoreCol))
      .select(col(idCol), col(scoreCol),
        expr(s"($buckets * __higher) div __total").as("bucket"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    // single-sourced from Pii's category list: a new category there
    // reaches this verdict automatically
    val piiTotal = Pii.totalCol(col(textCol))
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
    // explicit presence flags: a null hash means NULL TEXT, not an
    // absent id — branching on hash nullness would misclassify a
    // null-text doc as added/removed (the q146 oracle branches on id
    // presence, as this now does)
    val o = oldDocs.select(col(idCol).as("id"), md5(col(textCol)).as("__ho"),
      lit(true).as("__po"))
    val n = newDocs.select(col(idCol).as("id"), md5(col(textCol)).as("__hn"),
      lit(true).as("__pn"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("__po").isNull, lit("added"))
          .when(col("__pn").isNull, lit("removed"))
          .when(col("__ho") <=> col("__hn"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Exact score-band bucketing (decile/percentile assignment) without a
    * global row sort. `NTILE`/`row_number` over the whole table would pull
    * every row through one window task — the canonical scale-killer. This
    * instead computes, per DISTINCT score value, how many rows score
    * strictly higher, and assigns `bucket = (buckets · higher) div total`
    * — integer arithmetic only, ties share a bucket (so boundaries shift
    * by tie mass rather than splitting ties arbitrarily).
    *
    * The cum runs over the distinct-value AGGREGATE through
    * [[graft.core.Stats.resolvedCumSumsDesc]]: a bounded integer-score
    * rollup takes one small window and the cutoffs broadcast back; a
    * continuous-score rollup (≈ row count) auto-selects the
    * range-partitioned distributed prefix sum, and the join back flips
    * to a shuffle join on the score key. `distributedCum = Some(…)` pins
    * the regime and skips the probe (the 100 TB-job setting). */
  def exactScoreBands(df: DataFrame, idCol: String, scoreCol: String,
      buckets: Int = 10,
      distributedCum: Option[Boolean] = None): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    // null scores carry no rank: excluding them from BOTH the rollup and
    // the total keeps every bucket id honest (a null group in the total
    // would shift every decile down while the equi-join silently dropped
    // the null rows anyway) — the Stats.valueRollup discipline
    val g = df.filter(col(scoreCol).isNotNull)
      .groupBy(col(scoreCol)).agg(count(lit(1)).as("__c"))
    // descending cum over the distinct-score rollup via the shared
    // serial-vs-distributed prefix-sum machinery: an integer-score rollup
    // stays a bounded window, a continuous-score rollup (≈ row count)
    // takes the range-partitioned path — and then the cutoff table is no
    // longer broadcast-sized either, so the join back flips to a shuffle
    // join on the same key
    val (cum0, dist) = graft.core.Stats.resolvedCumSumsDesc(
      g, scoreCol, Seq("__c"), distributedCum)
    val cum = cum0.select(col(scoreCol),
      (col("__cum___c") - col("__c")).as("__higher"),
      col("__tot___c").as("__total"))
    df.select(col(idCol), col(scoreCol))
      .join(if (dist) cum else broadcast(cum), Seq(scoreCol))
      .select(col(idCol), col(scoreCol),
        expr(s"($buckets * __higher) div __total").as("bucket"))
  }

  /** Exact token-budget threshold: the highest-score-first greedy cut —
    * "admit documents from the top score down until the token budget is
    * spent" — answered EXACTLY in one pass: what score threshold does
    * the budget imply, how many documents and tokens does it admit?
    * (The planner's question behind every "keep the top X%" rule: X is
    * an output here, not a guess.) Whole score-groups are admitted
    * atomically (same-score docs are indistinguishable; the first group
    * overflowing the budget is excluded, the standard conservative cut).
    *
    * Output: one row `(threshold, n_docs_kept, tokens_kept, budget)`;
    * an unspendable budget (even the top group overflows) reports a
    * null threshold and zero counts.
    *
    * Scale: the cum-window runs over the DISTINCT-SCORE rollup (the
    * quantile-family shape), never documents; the finish is a bounded
    * aggregation of that rollup.
    */
  def tokenBudgetThreshold(docs: DataFrame, scoreCol: Column,
      tokenCol: Column, budgetTokens: Long,
      distributedCum: Option[Boolean] = None): DataFrame = {
    require(budgetTokens >= 0, "tokenBudgetThreshold: budget must be >= 0")
    // null-score docs rank below every threshold and null token counts
    // are unknown cost — both are excluded, or the report would admit
    // docs a downstream "score >= threshold" filter rejects and count
    // all-null groups as zero-cost (the Stats.valueRollup discipline)
    val rollup = docs.select(scoreCol.as("__s"),
        tokenCol.cast("long").as("__tk"))
      .filter(col("__s").isNotNull && col("__tk").isNotNull)
      .groupBy(col("__s"))
      .agg(sum(col("__tk")).as("__gt"), count(lit(1)).as("__gn"))
    // descending cum over the distinct-score rollup through the shared
    // serial-vs-distributed prefix-sum machinery (continuous scores would
    // otherwise serialize a row-count-sized window into one task); the
    // finish is a bounded aggregation either way
    val (cum, _) = graft.core.Stats.resolvedCumSumsDesc(
      rollup, "__s", Seq("__gt"), distributedCum)
    cum.filter(col("__cum___gt") <= budgetTokens)
      .agg(min(col("__s")).as("threshold"),
        coalesce(sum(col("__gn")), lit(0L)).as("n_docs_kept"),
        coalesce(max(col("__cum___gt")), lit(0L)).as("tokens_kept"))
      .withColumn("budget", lit(budgetTokens))
  }

  /** Per-source data card — the one-row-per-slice report card a corpus
    * ships with: volume (docs/tokens/chars), shape (tokens per doc,
    * chars per token, short-doc fraction), duplication (fraction of docs
    * in byte-identical groups within the source), and language mix
    * (count, majority language with its share, and the Gini–Simpson
    * diversity `1 − Σ share²`). Simpson avoids entropy's `ln`
    * deliberately: `Σ c²` stays an exact integer and the index needs one
    * multiply + one division, so the card hash-checks bit-for-bit.
    *
    * Scale: three aggregations over one scan pattern — per-source sums,
    * per-(source, lang) counts, per-(source, content-hash) counts — each
    * partial-aggregating map-side; the per-source finishers join
    * |sources|-row tables. The majority pick runs its window over the
    * lang-count table (|sources|·|langs| rows), never the corpus.
    */
  def dataCard(docs: DataFrame, sourceCol: String, langCol: String,
      textCol: String, shortTokens: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val src = col(sourceCol)
    val nTok = size(split(col(textCol), " ")).cast("long")
    val base = docs.select(src, col(langCol).as("__lang"),
      nTok.as("__t"), length(col(textCol)).cast("long").as("__c"),
      md5(col(textCol)).as("__h"))
    val vol = base.groupBy(src).agg(
      count(lit(1)).as("n_docs"),
      sum(col("__t")).as("n_tokens"),
      sum(col("__c")).as("n_chars"),
      sum(when(col("__t") < shortTokens, 1L).otherwise(0L)).as("__short"))
    val lc = base.groupBy(src, col("__lang"))
      .agg(count(lit(1)).as("__lc"))
    val lang = lc.groupBy(src).agg(
      count(lit(1)).as("n_langs"),
      sum(col("__lc") * col("__lc")).as("__sumc2"))
    val top = lc.withColumn("__rn", row_number().over(
        Window.partitionBy(src).orderBy(col("__lc").desc, col("__lang").asc)))
      .filter(col("__rn") === 1)
      .select(src, col("__lang").as("top_lang"), col("__lc").as("__topc"))
    val dup = base.groupBy(src, col("__h")).agg(count(lit(1)).as("__dc"))
      .groupBy(src)
      .agg(sum(when(col("__dc") > 1, col("__dc")).otherwise(0L)).as("__dup"))
    vol.join(lang, sourceCol).join(top, sourceCol).join(dup, sourceCol)
      .select(src, col("n_docs"), col("n_tokens"), col("n_chars"),
        (col("n_tokens").cast("double") / col("n_docs").cast("double"))
          .as("tokens_per_doc"),
        (col("n_chars").cast("double") / col("n_tokens").cast("double"))
          .as("chars_per_token"),
        (col("__short").cast("double") / col("n_docs").cast("double"))
          .as("short_doc_frac"),
        (col("__dup").cast("double") / col("n_docs").cast("double"))
          .as("exact_dup_frac"),
        col("n_langs"), col("top_lang"),
        (col("__topc").cast("double") / col("n_docs").cast("double"))
          .as("top_lang_frac"),
        (lit(1.0) - col("__sumc2").cast("double") /
          (col("n_docs").cast("double") * col("n_docs").cast("double")))
          .as("lang_simpson"))
  }

  /** Curation waterfall: how many documents (and how much token mass)
    * survive each successive filter stage — the report every corpus
    * build publishes. `stageCols` are pre-computed boolean columns on
    * `df` in pipeline order; stage `i`'s survivors are the docs passing
    * stages 1..i CONJUNCTIVELY (a doc dropped at stage 2 never reaches
    * stage 3, like the real pipeline), and stage 0 is the unfiltered
    * input.
    *
    * One aggregation computes every stage's counters in a single pass
    * (no per-stage scans), then a bounded `stack` unpivots them into one
    * row per stage with the retention fraction against the previous
    * stage. Exact integers; two divisions per row.
    */
  def waterfall(df: DataFrame, tokenCol: Column,
      stageCols: Seq[String]): DataFrame = {
    require(stageCols.nonEmpty, "waterfall: at least one stage")
    val cums = stageCols.scanLeft(lit(true))((acc, c) => acc && col(c)).tail
    val aggCols =
      (count(lit(1)).as("n0") +: sum(tokenCol.cast("long")).as("t0") +:
        cums.zipWithIndex.flatMap { case (c, i) =>
          Seq(sum(when(c, 1L).otherwise(0L)).as(s"n${i + 1}"),
            sum(when(c, tokenCol.cast("long")).otherwise(0L))
              .as(s"t${i + 1}"))
        })
    val one = df.agg(aggCols.head, aggCols.tail: _*)
    val names = "input" +: stageCols
    val stackArgs = names.zipWithIndex.map { case (nm, i) =>
      // escape for the SQL string literal: a stage name containing a
      // quote or backslash must not break the stack() parse
      val esc = nm.replace("\\", "\\\\").replace("'", "\\'")
      s"${i}L, '$esc', n$i, t$i"
    }.mkString(", ")
    one.select(expr(
        s"stack(${names.size}, $stackArgs) AS (stage, stage_name, n_docs, n_tokens)"))
      .withColumn("prev_docs",
        lag(col("n_docs"), 1).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("stage"))))
      .select(col("stage"), col("stage_name"), col("n_docs"),
        col("n_tokens"),
        when(col("prev_docs") > 0,
          col("n_docs").cast("double") / col("prev_docs").cast("double"))
          .otherwise(lit(null).cast("double")).as("retention"))
  }
}

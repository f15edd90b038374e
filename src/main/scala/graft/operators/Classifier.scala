package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Linear text classification for pipeline curation — the fasttext-style
  * "train a cheap classifier on weak labels, score the whole corpus" stage
  * (quality classifiers, language filters, domain routers).
  *
  * The model is multinomial Naive Bayes over whitespace tokens with
  * Laplace smoothing: trivially trainable inside one Spark plan (counts
  * and divisions only — no gradient loop), yet the exact shape GPT-3's
  * quality filter and CCNet's language router used at corpus scale.
  * Training and scoring are transductive here (score the corpus the model
  * was trained on); scoring a different frame is the same plan with the
  * model join swapped onto the other corpus.
  */
object Classifier {

  /** Train multinomial NB on `labelExpr` (a boolean weak label per doc)
    * and score every document with its smoothed log-odds.
    *
    * Per-token weight: `lr(t) = ln((c_pos(t)+1)/(N_pos+V)) −
    * ln((c_neg(t)+1)/(N_neg+V))`; per-doc score: `ln(P_pos/P_neg) +
    * Σ lr(token)`, folded in token-position order so the double sum is
    * order-deterministic under any partitioning, then rounded to 6
    * decimals (same determinism discipline as
    * [[LanguageModel.bigramScore]] / [[TextAnalysis.bm25]]). Every
    * arithmetic step is a single IEEE division / `ln` / add, so the SQL
    * oracle reproduces the score bit-for-bit.
    *
    * Output: `(id, is_pos, n_tokens, score, pred)` — one row per doc with
    * at least one token; `pred = score > 0`.
    *
    * Plan shape at 100 TB: the token stream shuffles ONCE on the token
    * key for the per-class counts (vocabulary-bounded output, full
    * map-side partial aggregation — Zipf heads collapse before the
    * shuffle); the trained model (V rows) broadcasts back onto the
    * exploded corpus, and the only corpus-sized shuffle is the per-doc
    * reassembly on the id. Class totals and the doc prior ride along as
    * broadcast singletons — no driver-side actions. A vocabulary too big
    * to broadcast degrades to a shuffle join on the token key with the
    * same semantics.
    */
  def naiveBayesScore(docs: DataFrame, idCol: String, textCol: String,
      labelExpr: Column): DataFrame = {
    val base = docs.select(col(idCol), labelExpr.as("is_pos"),
        split(col(textCol), " ").as("tk"))
      .filter(size(col("tk")) >= 1)
    val toks = base.select(col(idCol), col("is_pos"),
      posexplode(col("tk")).as(Seq("pos", "t")))

    // per-class token counts; V = distinct tokens (the smoothing
    // support). counts feeds BOTH the model and the totals (derived
    // below instead of a second full-corpus token shuffle), so the
    // vocab-sized frame pins in the bounded PlanCache.
    val counts = graft.core.Stats.PlanCache.register(
      toks.groupBy("t").agg(
        sum(when(col("is_pos"), 1L).otherwise(0L)).as("c_pos"),
        sum(when(!col("is_pos"), 1L).otherwise(0L)).as("c_neg")))
    // n_pos/n_neg/v are exactly derivable from the vocabulary rollup —
    // aggregating toks again would re-explode and re-shuffle the whole
    // corpus for numbers the V-row frame already holds
    val totals = counts.agg(
      sum(col("c_pos")).as("n_pos"),
      sum(col("c_neg")).as("n_neg"),
      count(lit(1)).as("v"))
    val priors = base.agg(
      sum(when(col("is_pos"), 1L).otherwise(0L)).as("d_pos"),
      sum(when(!col("is_pos"), 1L).otherwise(0L)).as("d_neg"),
      sum(when(col("is_pos").isNull, 1L).otherwise(0L)).as("__null_lbl"))

    // degenerate-corpus guard: a single-class corpus has no odds to
    // learn, and a NULL weak label trains into NEITHER class while its
    // tokens still widen V — both fail loudly (assert_true is null on
    // pass; the coalesce keeps it inside the plan, same pattern as
    // Sampling.mixtureWeights)
    val dPosG = coalesce(assert_true(
      col("d_pos") > 0 && col("d_neg") > 0 && col("__null_lbl") === 0,
      lit("naiveBayesScore: both label classes must be non-empty and " +
        "the label expression must be non-null on every doc (a null " +
        "label trains into neither class but still skews smoothing)"))
      .cast("long"),
      col("d_pos"))

    // one IEEE division + one ln per term, fixed order
    val model = counts.crossJoin(broadcast(totals))
      .select(col("t"),
        (log((col("c_pos") + lit(1L)).cast("double") /
            (col("n_pos") + col("v"))) -
          log((col("c_neg") + lit(1L)).cast("double") /
            (col("n_neg") + col("v")))).as("lr"))

    toks.join(broadcast(model), "t")
      .groupBy(col(idCol))
      .agg(
        first(col("is_pos")).as("is_pos"),
        count(lit(1)).as("n_tokens"),
        F.aggregate(
          array_sort(collect_list(struct(col("pos"), col("lr")))),
          lit(0.0),
          (acc, x) => acc + x.getField("lr")).as("__s"))
      .crossJoin(broadcast(priors))
      .select(col(idCol), col("is_pos"), col("n_tokens"),
        round(log(dPosG.cast("double") / col("d_neg")) + col("__s"), 6)
          .as("score"))
      .withColumn("pred", col("score") > 0d)
  }

  /** Confusion-matrix rollup of [[naiveBayesScore]] — the
    * train-quality report: per (actual, predicted) cell, doc count and
    * total score mass. The score total runs through `graft_dsum`
    * (order-independent int128 fixed-point) so the 4-row report is
    * hash-exact under any partitioning; the rollup itself is negligible
    * next to the scoring pass. */
  def naiveBayesReport(scored: DataFrame): DataFrame =
    scored.groupBy(col("is_pos"), col("pred"))
      .agg(count(lit(1)).as("n_docs"),
        call_function("graft_dsum", col("score"), lit(6)).as("score_sum"))
}

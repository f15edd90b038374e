package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the "perplexity filter"
  * stage of a training-data pipeline (score every document by how typical
  * its token transitions are for the corpus, drop the tails).
  *
  * The classic form averages log-probabilities; this implementation
  * averages the raw MLE transition probabilities instead, because every
  * arithmetic step (one integer-count division per bigram, an in-order
  * double fold per document, one final division) is then a single IEEE
  * operation reproducible bit-for-bit by the SQL oracle — `ln` is not
  * required to be correctly rounded and differs across libm
  * implementations, so a log-based score could not be hash-checked.
  * Ranking behavior (flag documents whose transitions are rare) is the
  * same monotone signal.
  */
object LanguageModel {

  /** Train a bigram transition model on `docs` and score every document by
    * its mean transition probability `p(w2|w1) = c(w1,w2) / c(w1·)`.
    *
    * Output: `(id, n_bigrams, avg_p, min_p)` — one row per document with
    * at least one bigram (single-token documents have no transitions and
    * are absent, matching the oracle).
    *
    * Plan shape at 100 TB: the two count aggregations shuffle on the
    * bigram / unigram key with full map-side partial aggregation (uniform
    * hash keys, vocabulary-bounded cardinality); the trained model —
    * `O(vocab²)` rows, tiny next to the corpus — broadcasts onto the
    * exploded corpus so the scoring join never shuffles the big side; the
    * final per-document reassembly is the only corpus-sized shuffle (on
    * the doc id). For web-scale vocabularies where `vocab²` outgrows the
    * broadcast budget, drop the `broadcast` hint and the same plan runs as
    * a shuffle join on the bigram key — the semantics don't change.
    *
    * The per-document fold runs in token order (`array_sort` on the
    * position before the `aggregate` fold), so the double sum is
    * order-deterministic under any partitioning; `min_p` is
    * order-independent anyway.
    */
  def bigramScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol), split(col(textCol), " ").as("tk"))
      // single-token docs have no bigrams; also guards sequence(1,0) which
      // Spark would generate DESCENDING (start>stop => step -1)
      .filter(size(col("tk")) >= 2)
    // bg feeds the model counts AND the scoring join — pinned so the
    // corpus tokenizes + explodes once per run, not three times (r18;
    // the containmentScored discipline)
    val bg = graft.core.Stats.PlanCache.register(toks.select(col(idCol),
        posexplode(expr(
          "transform(sequence(0, size(tk) - 2), i -> struct(tk[i] AS w1, tk[i+1] AS w2))"))
          .as(Seq("pos", "b")))
      .select(col(idCol), col("pos"), col("b.w1").as("w1"), col("b.w2").as("w2")))
    val c2 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n2"))
    // r18 (guide §2.4): the unigram context count is the bigram table's
    // own marginal — Σ_w2 n2(w1, w2) ≡ COUNT(*) of bigrams with that w1 —
    // so c1 aggregates the small distinct-bigram frame instead of paying
    // a second full shuffle of the exploded corpus
    val c1 = c2.groupBy(col("w1")).agg(sum(col("n2")).as("n1"))
    // one IEEE division per (w1,w2): bit-identical to CAST(n2 AS DOUBLE)/n1
    val lm = c2.join(c1, "w1")
      .select(col("w1"), col("w2"), (col("n2").cast("double") / col("n1")).as("p"))
    bg.join(broadcast(lm), Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(
        F.aggregate(
          array_sort(collect_list(struct(col("pos"), col("p")))),
          lit(0.0),
          (acc, x) => acc + x.getField("p")).as("__s"),
        count(lit(1)).as("n_bigrams"),
        min(col("p")).as("min_p"))
      .select(col(idCol), col("n_bigrams"),
        (col("__s") / col("n_bigrams")).as("avg_p"), col("min_p"))
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer learning (the SentencePiece unigram family —
  * Kudo 2018, "Subword Regularization" — simplified to deterministic
  * hard-EM), the OTHER major subword-tokenizer family next to
  * [[Bpe]]'s merge learner: instead of growing pieces bottom-up by
  * merges, start from an overcomplete substring vocabulary and
  * alternate (Viterbi-segment the corpus under current piece scores) ↔
  * (re-score pieces from their segmentation counts, prune the
  * worst) until the target vocabulary size.
  *
  * Everything that touches the corpus is distributed and bounded:
  * the corpus collapses to a `(word, freq)` rollup once (one shuffle);
  * each EM round is ONE scan of that rollup with the vocabulary
  * broadcast as literal arrays into the native `graft_viterbi_segment`
  * kernel, plus one partial-aggregated count shuffle whose keys are ⊆
  * the vocabulary. Only vocabulary-sized frames (≤ vocabSize rows) are
  * ever collected — the k-means codebook convention.
  *
  * Determinism (no oracle can replay Viterbi in SQL, so the catalog
  * anchors [[seedVocab]] — the exact stage — and the trainer is
  * spec-verified against an in-memory reference): seed ranking is
  * (count desc, piece asc); DP ties keep the longest piece; scores are
  * Laplace-smoothed `log((cnt + 1) / (total + |V|))` — smoothing keeps
  * force-kept zero-count characters usable as the coverage fallback
  * (`log 0` would knock them out of the DP entirely).
  */
object Unigram {

  /** Seed vocabulary: every substring of length 1..`maxLen` of every
    * corpus word, counted by word frequency; ALL single characters are
    * force-kept (they are the coverage guarantee), and the remaining
    * `vocabSize − |chars|` slots go to the top multi-character pieces
    * by (count desc, piece asc). Exact integers, total order,
    * SQL-replayable — the catalog-anchored stage (q208).
    *
    * Scale: one shuffle to the word rollup, a scan-side substring
    * explosion (≤ maxLen·|word| pieces per distinct word), one
    * partial-aggregated count shuffle, and a TakeOrdered top-k — never
    * a global sort, never a driver loop. Output: `(piece, cnt)`.
    */
  def seedVocab(docs: DataFrame, textCol: String, maxLen: Int = 4,
      vocabSize: Int = 150): DataFrame = {
    require(maxLen >= 1, s"seedVocab: maxLen must be >= 1, got $maxLen")
    val words = wordRollup(docs, textCol)
    val counts = graft.core.Stats.PlanCache.register(
      words
        .select(col("freq"), explode(expr(
          s"""flatten(transform(sequence(1, length(w)), i ->
             |  transform(sequence(i, least(i + ${maxLen - 1}, length(w))),
             |    j -> substring(w, i, j - i + 1))))""".stripMargin))
          .as("piece"))
        .groupBy(col("piece"))
        .agg(sum(col("freq")).as("cnt")))
    val chars = counts.filter(length(col("piece")) === 1)
    // the only driver-side value: the alphabet size (bounded by charset)
    val nChars = chars.count()
    require(vocabSize > nChars,
      s"seedVocab: vocabSize $vocabSize must exceed the $nChars distinct " +
        "characters (they are force-kept for coverage)")
    val multi = counts.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece"))
      .limit((vocabSize - nChars).toInt)
    chars.unionByName(multi)
  }

  /** The corpus word rollup shared by seeding and every EM round. */
  private def wordRollup(docs: DataFrame, textCol: String): DataFrame =
    graft.core.Stats.PlanCache.register(
      docs.select(explode(split(col(textCol), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy(col("w")).agg(count(lit(1)).as("freq")))

  /** Fixed-round deterministic hard-EM: seed → (segment, recount,
    * prune) × `iterations`. Pruning keeps all characters plus the top
    * `vocabSize − |chars|` multi-character pieces by (count desc, piece
    * asc); a multi-character piece that no Viterbi path uses drops out
    * naturally (count 0 sorts last). Returns the final bounded
    * vocabulary `(piece, cnt, score)` — `cnt` the piece's corpus usage
    * under the final segmentation, `score` its smoothed log-prob.
    */
  def train(docs: DataFrame, textCol: String, maxLen: Int = 4,
      vocabSize: Int = 150, iterations: Int = 2): DataFrame = {
    require(iterations >= 1 && iterations <= 20,
      s"train: iterations must be in 1..20, got $iterations")
    val spark = docs.sparkSession
    val words = wordRollup(docs, textCol)
    // sorted: the collect order of the unordered seed union must not
    // leak into the vocabulary sequence (output row order, char order)
    var vocab: Seq[(String, Long)] = seedVocab(docs, textCol, maxLen, vocabSize)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      .sortBy(_._1)
    // "single character" means one CODEPOINT — the same rule as
    // seedVocab's SQL length(). Java String.length counts UTF-16 units,
    // which would strip supplementary-plane characters (emoji, CJK
    // ext-B) of their force-keep coverage guarantee and silently drop
    // every word containing them from the counts.
    def isOneChar(p: String): Boolean =
      p.codePointCount(0, p.length) == 1
    val nChars = vocab.count(v => isOneChar(v._1))
    var lastCounts: Map[String, Long] = vocab.toMap
    for (_ <- 1 to iterations) {
      val counted = segmentCounts(words, vocab)
      // prune: every character survives (coverage); multi-char pieces
      // compete for the remaining slots on their fresh counts
      val charRows = vocab.collect { case (p, _) if isOneChar(p) =>
        p -> counted.getOrElse(p, 0L)
      }
      val multiRows = vocab.collect { case (p, _) if !isOneChar(p) =>
        p -> counted.getOrElse(p, 0L)
      }.sortBy { case (p, c) => (-c, p) }
        .take(vocabSize - nChars)
      vocab = charRows ++ multiRows
      lastCounts = counted
    }
    val total = vocab.map(v => lastCounts.getOrElse(v._1, 0L)).sum
    val out = vocab.map { case (p, _) =>
      val c = lastCounts.getOrElse(p, 0L)
      (p, c, math.log((c + 1).toDouble / (total + vocab.size).toDouble))
    }
    import spark.implicits._
    out.toDF("piece", "cnt", "score")
  }

  /** One E-step: Viterbi-segment the word rollup under `vocab`'s
    * smoothed scores, return per-piece corpus counts (word freq ×
    * occurrences). One scan + one bounded-key shuffle; the vocabulary
    * rides into the kernel as literal arrays. */
  private def segmentCounts(words: DataFrame,
      vocab: Seq[(String, Long)]): Map[String, Long] = {
    val total = vocab.map(_._2).sum
    val pieces = vocab.map(_._1)
    val scores = vocab.map(v =>
      math.log((v._2 + 1).toDouble / (total + vocab.size).toDouble))
    words
      .select(col("freq"),
        explode(call_function("graft_viterbi_segment", col("w"),
          typedlit(pieces), typedlit(scores))).as("piece"))
      .groupBy(col("piece"))
      .agg(sum(col("freq")).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }
}

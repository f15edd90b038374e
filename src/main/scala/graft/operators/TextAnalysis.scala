package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization,
  * quality scoring, language-ID heuristics, content fingerprints, SimHash.
  * Everything is a pure column expression (codegen-friendly, no UDFs) so
  * the operators fuse into the scan at any scale.
  */
object TextAnalysis {

  /** The engine-wide tokenizer: SINGLE-SPACE split, deliberately — every
    * DuckDB oracle states the identical `string_split(text, ' ')`, so the
    * convention must stay byte-for-byte cross-engine (a `\s`-class split
    * would diverge: the engines' class semantics differ and dozens of
    * oracles would need lockstep edits). Corpus text is expected to be
    * space-normalized upstream (ingest, or [[normalizeText]] /
    * [[graft.operators.Dedup.normalizeForDedup]] which do collapse
    * tabs/newlines); a raw newline-y document tokenizes coarsely under
    * this convention — identically so in both engines. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish subword-count proxy: word-piece regex splits on non-alnum and
    * camel-ish boundaries — a deterministic stand-in for a real tokenizer's
    * piece count. Java-regex-only surface (the lookarounds have no RE2
    * equivalent), so unlike the operators above it is deliberately
    * spec-verified rather than oracle-checked. */
  def subwordCount(text: Column): Column =
    size(split(text, "[^\\p{L}\\p{N}]+|(?<=\\p{Ll})(?=\\p{Lu})"))

  def tokenCount(text: Column): Column = size(tokens(text))

  def uniqueTokenCount(text: Column): Column =
    size(array_distinct(tokens(text)))

  /** Quality signals: length, chars-per-token, punctuation ratio, stopword
    * ratio, type-token ratio. Returns a struct column. */
  def qualityScore(text: Column, stopwords: Seq[String] = defaultStopwords): Column = {
    val toks = tokens(text)
    val n = size(toks)
    val punct = size(split(text, "[\\p{Punct}]")) - 1
    val stops = size(array_intersect(toks, array(stopwords.map(lit): _*)))
    struct(
      length(text).as("chars"),
      n.as("tokens"),
      (length(text).cast("double") / n).as("chars_per_token"),
      (punct.cast("double") / greatest(length(text), lit(1))).as("punct_ratio"),
      (stops.cast("double") / n).as("stopword_ratio"),
      (size(array_distinct(toks)).cast("double") / n).as("type_token_ratio"))
  }

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")

  /** n-gram-profile language ID: score text against tiny per-language
    * marker-token profiles, pick the argmax (an honest heuristic — real
    * systems use char-n-gram models; the *shape* — per-language score then
    * greatest — is the production pipeline). */
  def langIdGuess(text: Column): Column = {
    val profiles: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "and", "of", "is"),
      "es" -> Seq("el", "la", "de", "que"),
      "de" -> Seq("der", "die", "und", "das"),
      "fr" -> Seq("le", "la", "et", "les"),
      "zh" -> Seq("的", "是", "了", "在"))
    val toks = tokens(text)
    val scores = profiles.map { case (lang, markers) =>
      struct(size(array_intersect(toks, array(markers.map(lit): _*))).as("score"),
        lit(lang).as("lang"))
    }
    // greatest on struct: lexicographic on (score, lang) — argmax with a
    // deterministic tiebreak. Zero markers means NO evidence: report
    // "unknown" rather than letting the tiebreak confidently label every
    // URL/code/short string with the lexicographically largest language.
    val best = greatest(scores: _*)
    when(best.getField("score") > 0, best.getField("lang"))
      .otherwise(lit("unknown"))
  }

  /** Canonical content fingerprint: hash of the sorted distinct vocabulary
    * (order-insensitive, whitespace-insensitive). */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Canonical text normalization, applied BEFORE hashing/dedup so that
    * trivially-variant copies (case, punctuation style, ragged whitespace)
    * collide: lowercase → strip everything outside `[a-z0-9 ]` (ASCII
    * punctuation policy, deliberately aggressive the way near-dup
    * canonicalizers are) → collapse whitespace runs → trim. A pure
    * codegen'd projection (no shuffle, no UDF); the regexes avoid
    * engine-specific character classes (`\p{Punct}`, `\s`) so the
    * identical patterns run in Java and RE2 engines. Runs as the native
    * `graft_normalize_text` byte-pass kernel
    * (expressions/NormalizeText.scala) — one allocation per row instead
    * of two java.util.regex matchers plus four intermediate strings; the
    * r11 sf3 measurement put the regex chain at ~350× DuckDB's cost for
    * the same rows, with its allocation pressure degrading per-thread
    * throughput as cores filled. ASCII fast path is byte-exact to the
    * chain; non-ASCII rows take the literal legacy chain inside the
    * kernel (ExpressionsSpec differential fuzz pins both). */
  def normalizeText(text: Column): Column =
    call_function("graft_normalize_text", text)

  /** The pre-kernel regex chain — kept ONLY as the differential-fuzz
    * reference (ExpressionsSpec) so the kernel is pinned to the exact
    * semantics it replaced. Not used by any operator. */
  private[graft] def normalizeTextLegacy(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", " "),
      "  +", " "))

  /** SimHash over tokens with `bits` bits (≤ 60). Per distinct token, md5
    * hex → integer (first 15 hex digits); bit b votes +1/-1; the signature
    * sets bit b when the vote sum is positive. Near-duplicate docs differ
    * in few bits (compare with [[hammingDistance]]). Runs as the native
    * `graft_simhash` expression (expressions/SimHash.scala): one fused
    * codegen pass computes all bit votes, versus `bits` interpreted HOF
    * folds re-walking the hash array. No shuffle either way.
    */
  def simhash(text: Column, bits: Int = 16): Column = {
    require(bits <= 60, "simhash uses the first 15 hex digits of md5 (60 bits)")
    call_function("graft_simhash", tokens(text), lit(bits))
  }

  /** Hamming distance between two simhash signatures. */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Per-document distinctive terms: score = tf / df (term frequency in
    * the doc over the number of docs containing the term), top `k` per doc
    * by (score desc, term). The tf-idf-family scorer with the ratio kept
    * RAW — one IEEE division is bit-exact across engines where `ln()` (the
    * textbook idf) is not ULP-stable, so the whole pipeline stays
    * oracle-checkable.
    *
    * Scale shape: explode → two groupBys (doc-term, then term) → join on
    * term → per-doc top-k window. The df side is corpus-global — the join
    * key is the term (stopwords are hot keys but carry df=1 rows on the
    * build side, so the join multiplicity, not a single partition, absorbs
    * them; AQE splits if needed).
    */
  def distinctiveTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    val terms = docs.select(col(idCol).as("doc"),
      explode(tokens(col(textCol))).as("term"))
    val tf = terms.groupBy("doc", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, "term")
      .select(col("doc"), col("term"),
        (col("tf").cast("double") / col("df")).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc").orderBy(col("score").desc, col("term"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("doc").as(idCol), col("term"), col("score"))
  }

  /** Repetition signals (the Gopher-rule family): per document,
    *  - `dup_word_frac`  = fraction of word occurrences that are repeats
    *    of an already-seen word — (n_words − n_distinct) / n_words;
    *  - `top_bigram_frac` = occurrences of the most frequent bigram over
    *    total bigram occurrences.
    * High values flag degenerate/templated text that quality-filters drop
    * before training. Both fractions are ONE IEEE division of exact ints —
    * bit-identical cross-engine, no rounding convention needed.
    *
    * Scale shape: the bigram top-count runs distributed (explode →
    * two-level groupBy with partial aggregation) rather than a per-row
    * O(n²) HOF scan — a 100k-token document costs 100k rows, not 10^10
    * comparisons. Docs with < 2 words get top_bigram_frac = 0.
    */
  def repetitionSignals(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // All four raw counts are row-local, so this is ONE fused codegen pass
    // (`graft_repetition`) and a projection — zero shuffles, zero joins.
    // The composed alternative (explode bigrams -> two groupBys -> join)
    // shuffles the entire bigram stream twice; at corpus scale that is the
    // dominant cost of the whole query for a per-row statistic.
    val r = call_function("graft_repetition", tokens(col(textCol)))
    docs.select(col(idCol), r.as("__r"))
      .select(col(idCol),
        col("__r.n_words").as("n_words"),
        ((col("__r.n_words") - col("__r.n_distinct")).cast("double") /
          col("__r.n_words")).as("dup_word_frac"),
        when(col("__r.n_bigrams") > 0,
          col("__r.top_bigram").cast("double") / col("__r.n_bigrams"))
          .otherwise(lit(0.0)).as("top_bigram_frac"))
  }

  /** Character-entropy quality signal: Shannon entropy (bits/char) of the
    * code-point distribution, via the native one-pass `graft_char_entropy`
    * expression — row-local, zero shuffle, fuses into the scan. Low
    * entropy flags template/repetitive text; near-maximal entropy flags
    * gibberish/binary spill. */
  def charEntropy(textCol: Column): Column =
    call_function("graft_char_entropy", textCol)

  /** Exact top-`k` tokens per group by frequency (ties broken by token
    * asc) — the corpus-vocabulary report. The count aggregation
    * partial-aggregates map-side; the top-k runs through the two-phase
    * skew-safe cap ([[Sampling.quotaCapTwoPhase]]), so a group with a
    * pathological vocabulary never serializes one sort task. For
    * summaries that must stay bounded-memory per group regardless of
    * vocabulary size, [[graft.functions.FreqSketch]] is the sketch path
    * with the same report shape. */
  def heavyHitters(docs: DataFrame, groupCol: String, textCol: String,
      k: Int): DataFrame = {
    val counts = docs
      .select(col(groupCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(groupCol), col("token"))
      .agg(count(lit(1)).as("cnt"))
    graft.operators.Sampling.quotaCapTwoPhase(counts, groupCol,
      Seq(col("cnt").desc, col("token")), k, col("token"))
  }

  /** Sliding-window document chunking (the RAG/embedding-prep shape):
    * token windows of `size` advancing by `size - overlap`, each chunk
    * rejoined with spaces. The last window may be shorter; a document
    * shorter than one window yields exactly one chunk. Pure row-local
    * array arithmetic — explodes to chunk rows with zero shuffle, so at
    * corpus scale this is a projection feeding the embedding stage.
    *
    * Output: `(id, chunk_idx, chunk_text, n_tokens)`.
    */
  def chunkForRag(docs: DataFrame, idCol: String, textCol: String,
      size: Int, overlap: Int): DataFrame = {
    require(size >= 1 && overlap >= 0 && overlap < size,
      "need size >= 1 and 0 <= overlap < size")
    val step = size - overlap
    val chunks = docs
      .select(col(idCol), tokens(col(textCol)).as("__tk"))
      .select(col(idCol), posexplode(expr(
        s"transform(sequence(0, greatest(0, cast(ceil((size(__tk) - $size) / $step.0) as int))), " +
          s"i -> slice(__tk, i * $step + 1, $size))"))
        .as(Seq("chunk_idx", "__ctk")))
    chunks.select(col(idCol), col("chunk_idx"),
      concat_ws(" ", col("__ctk")).as("chunk_text"),
      org.apache.spark.sql.functions.size(col("__ctk")).cast("long")
        .as("n_tokens"))
  }

  /** Convenience: append all text stats to a documents DataFrame. */
  def annotate(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("token_count", tokenCount(col(textCol)))
      .withColumn("unique_tokens", uniqueTokenCount(col(textCol)))
      .withColumn("quality", qualityScore(col(textCol)))
      .withColumn("lang_guess", langIdGuess(col(textCol)))
      .withColumn("fingerprint", fingerprint(col(textCol)))
      .withColumn("simhash", simhash(col(textCol)))

  /** BM25 ranking of the corpus against a bag of query terms (Robertson/
    * Okapi, the Lucene `ln(1 + (N-df+0.5)/(df+0.5))` idf form). Returns
    * one row per document containing at least one query term:
    * `(id, score)`, score rounded to 6 decimals (`ln` is not ULP-stable
    * cross-engine; same convention as [[charEntropy]] consumers).
    *
    * Scale shape: tf explodes ONLY the matching terms (the `isin` filter
    * sits under the explode's groupBy, so non-query tokens never reach a
    * shuffle); df/avgdl/N are one tiny corpus aggregate broadcast back
    * into the plan — no driver-side `.collect()`, the scalars ride as a
    * 1-row broadcast join. Two shuffles total: (doc,term) tf and the
    * final per-doc sum.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val base = docs.select(col(idCol).as("doc"), tokens(col(textCol)).as("tk"))
    // per-doc length BEFORE the term filter (BM25's dl is the full doc)
    val withDl = base.select(col("doc"), col("tk"), size(col("tk")).as("dl"))
    val corpus = withDl.agg(count(lit(1)).as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val tf = withDl
      .select(col("doc"), col("dl"), explode(col("tk")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy("doc", "dl", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(corpus))
      .select(col("doc"), (
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))) *
        (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) +
          lit(b) * col("dl") / col("avgdl")))).as("s"))
      .groupBy("doc").agg(round(sum(col("s")), 6).as("score"))
      .select(col("doc").as(idCol), col("score"))
  }

  /** Inverted index over the corpus: per term, document frequency, total
    * term frequency, and the posting list head (first `postingsCap` doc
    * ids ascending, comma-joined — a string so the layout is engine-
    * portable). `minDf` drops the long tail of hapaxes.
    *
    * Scale shape: explode → groupBy (doc, term) → groupBy term, both with
    * map-side partial aggregation on uniform term keys. The posting list
    * is capped BEFORE collection: a per-term `row_number` marks the first
    * `postingsCap` doc ids and `collect_list` only ever sees those (nulls
    * are skipped), so a stopword's aggregation state holds ≤ cap ids, not
    * the corpus — the unbounded-state trap of naive index builds. At real
    * index scale the postings would range-partition by (term, docRange)
    * into segment files; the capped head here is the per-segment layout.
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
      minDf: Int = 2, postingsCap: Int = 20): DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc"), explode(tokens(col(textCol))).as("term"))
      .groupBy("term", "doc").agg(count(lit(1)).as("tf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("term").orderBy("doc")
    tf.withColumn("__r", row_number().over(w))
      .groupBy("term").agg(
        count(lit(1)).as("df"),
        sum(col("tf")).as("total_tf"),
        array_join(transform(
          sort_array(collect_list(when(col("__r") <= postingsCap, col("doc")))),
          _.cast("string")), ",").as("postings"))
      .filter(col("df") >= minDf)
  }

  /** Compression-ratio quality signal (`deflate_len/raw_len`, raw DEFLATE
    * level 6 via the native `graft_deflate_len` expression): near 0 =
    * template/repetition-heavy (long-range structure n-gram counters
    * miss), near 1 = high-entropy junk; both ends are cut candidates.
    * Empty text reports 1.0 (nothing to compress, nothing to flag). Pure
    * scan-side projection. No cross-engine oracle exists (DEFLATE bytes
    * are implementation-defined) — spec-verified, rows-only in the
    * catalog. */
  def compressionRatio(text: Column): Column =
    when(octet_length(text) === 0, lit(1.0)).otherwise(
      call_function("graft_deflate_len", text).cast("double") /
        octet_length(text).cast("double"))

  /** Pairwise corpus-overlap report: for every ordered pair of `groupCol`
    * values (a < b), the exact vocabulary sizes, shared-vocabulary count,
    * vocabulary Jaccard, and the number of byte-identical documents
    * (distinct md5 content hashes present on both sides) — the
    * before-you-merge measurement for combining crawls/sources: high
    * vocab Jaccard with low content overlap means same domain, new text;
    * high content overlap means the merge needs [[Dedup]] first.
    *
    * Output: `(src_a, src_b, vocab_a, vocab_b, vocab_common,
    * vocab_jaccard, content_common)`, one row per unordered pair
    * (including zero-overlap pairs), ordered (src_a, src_b).
    *
    * Everything is exact integers until `vocab_jaccard`, one IEEE
    * division — bit-identical cross-engine.
    *
    * The vocabulary is the distinct `n`-gram set (n = 1 for unigrams;
    * larger n measures phrase-level overlap, which separates corpora a
    * shared unigram vocabulary cannot).
    *
    * Scale shape: the (group, term) / (group, hash) rollups partial-
    * aggregate on uniform keys; the overlap self-joins key on term/hash,
    * and a term present in g groups fans out to at most g·(g−1)/2 pair
    * rows — bounded by the (small) number of corpora, never by corpus
    * size. The per-group size frames are |G| rows, broadcast onto the
    * |G|² pair skeleton so zero-overlap pairs still appear. No raw text
    * crosses a shuffle: terms and md5 hashes only.
    */
  /** Sketch-mode [[corpusOverlap]] — the 100 TB form. One HLL sketch per
    * group replaces the distinct-vocabulary rollup, and the pairwise
    * shared-vocabulary count comes from inclusion–exclusion over a sketch
    * union (`|A∩B| ≈ |A| + |B| − |A∪B|`, DataSketches HLL union is
    * lossless over sketches). The whole report becomes ONE aggregation
    * over the term stream producing |G| sketch rows, then driver-light
    * pairwise arithmetic on broadcast-sized frames — no term-keyed
    * self-join at all. Estimates carry HLL error (~2% per term at
    * lgK 12), amplified by the subtraction for low-overlap pairs —
    * numbers are for dashboards/merge triage; the exact mode is the
    * oracle. Content overlap stays exact (md5-hash rollup — doc counts
    * are orders of magnitude below vocab counts).
    *
    * Output schema matches [[corpusOverlap]] with `vocab_*` columns as
    * estimate doubles (`content_common` stays an exact long).
    */
  def corpusOverlapApprox(docs: DataFrame, groupCol: String,
      textCol: String, n: Int = 1): DataFrame = {
    require(n >= 1, "n-gram order must be >= 1")
    val sk = docs
      .select(col(groupCol).as("g"),
        explode(Decontam.ngrams(col(textCol), n)).as("token"))
      .groupBy("g")
      .agg(hll_sketch_agg(col("token")).as("sk"))
    val pairs = sk
      .select(col("g").as("src_a"), col("sk").as("sk_a"))
      .join(broadcast(sk.select(col("g").as("src_b"), col("sk").as("sk_b"))),
        col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        hll_sketch_estimate(col("sk_a")).cast("double").as("vocab_a"),
        hll_sketch_estimate(col("sk_b")).cast("double").as("vocab_b"),
        hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b")))
          .cast("double").as("vocab_union"))
    val common = greatest(
      col("vocab_a") + col("vocab_b") - col("vocab_union"), lit(0.0))
    val ch = docs
      .select(col(groupCol).as("g"), md5(col(textCol)).as("h")).distinct()
    val contentCommon = ch.as("a")
      .join(ch.as("b"), col("a.h") === col("b.h") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("ga"), col("b.g").as("gb"))
      .agg(count(lit(1)).as("content_common"))
    pairs
      .join(broadcast(contentCommon),
        pairs("src_a") === contentCommon("ga") &&
          pairs("src_b") === contentCommon("gb"), "left")
      .select(col("src_a"), col("src_b"), col("vocab_a"), col("vocab_b"),
        common.as("vocab_common"),
        (common / (col("vocab_a") + col("vocab_b") - common))
          .as("vocab_jaccard"),
        coalesce(col("content_common"), lit(0L)).as("content_common"))
  }

  def corpusOverlap(docs: DataFrame, groupCol: String,
      textCol: String, n: Int = 1): DataFrame = {
    require(n >= 1, "n-gram order must be >= 1")
    val tok = docs
      .select(col(groupCol).as("g"),
        explode(Decontam.ngrams(col(textCol), n)).as("token"))
      .distinct()
    val sizes = tok.groupBy("g").agg(count(lit(1)).as("vocab"))
    val vocabCommon = tok.as("a")
      .join(tok.as("b"),
        col("a.token") === col("b.token") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("ga"), col("b.g").as("gb"))
      .agg(count(lit(1)).as("vocab_common"))
    val ch = docs
      .select(col(groupCol).as("g"), md5(col(textCol)).as("h")).distinct()
    val contentCommon = ch.as("a")
      .join(ch.as("b"), col("a.h") === col("b.h") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("ga"), col("b.g").as("gb"))
      .agg(count(lit(1)).as("content_common"))
    val pairs = sizes
      .select(col("g").as("src_a"), col("vocab").as("vocab_a"))
      .join(broadcast(
        sizes.select(col("g").as("src_b"), col("vocab").as("vocab_b"))),
        col("src_a") < col("src_b"))
    pairs
      .join(broadcast(vocabCommon),
        pairs("src_a") === vocabCommon("ga") &&
          pairs("src_b") === vocabCommon("gb"), "left")
      .drop("ga", "gb")
      .join(broadcast(contentCommon),
        pairs("src_a") === contentCommon("ga") &&
          pairs("src_b") === contentCommon("gb"), "left")
      .drop("ga", "gb")
      .select(col("src_a"), col("src_b"), col("vocab_a"), col("vocab_b"),
        coalesce(col("vocab_common"), lit(0L)).as("vocab_common"),
        (coalesce(col("vocab_common"), lit(0L)).cast("double") /
          (col("vocab_a") + col("vocab_b") -
            coalesce(col("vocab_common"), lit(0L))).cast("double"))
          .as("vocab_jaccard"),
        coalesce(col("content_common"), lit(0L)).as("content_common"))
  }

  /** Domain-relevance score — the log-free exact form of DSIR-style
    * importance weighting (Xie et al., "Data Selection for Language
    * Models via Importance Resampling", NeurIPS 2023): score each
    * NON-target document by how much its vocabulary leans toward the
    * target slice. Per distinct token w of the doc, the vote is the
    * exact integer cross-difference of document-frequency rates,
    * `df_t(w)·N_r − df_r(w)·N_t` (positive iff w is relatively more
    * common in the target), and the doc's score is the sum of its votes.
    * Ordering docs by this score is the importance-sampling readout with
    * no `ln`/`pow` anywhere — hash-checkable cross-engine where a
    * log-likelihood ratio is not ULP-stable.
    *
    * Output: one row per non-target doc, `(id, n_terms, score)`.
    *
    * Scale shape: one (doc, token) distinct rollup, one token-keyed
    * aggregation for the df table, one token-keyed join back, one doc
    * rollup — all partial-aggregated on uniform keys. The corpus totals
    * ride a 1-row broadcast (no driver collect). Votes accumulate in
    * decimal(38,0): per-token products reach N_t·N_r (~10¹⁸ at
    * billion-doc scale), so a long accumulator could overflow mid-sum;
    * the final score is cast back to long (callers at extreme scale keep
    * the decimal).
    */
  def domainRelevance(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column): DataFrame = {
    val tok = docs
      .select(col(idCol).as("doc"), isTarget.as("is_t"),
        explode(tokens(col(textCol))).as("token"))
      .distinct()
    val dfTable = tok.groupBy("token").agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("df_t"),
      sum(when(col("is_t"), 0L).otherwise(1L)).as("df_r"))
    val totals = docs.agg(
      sum(when(isTarget, 1L).otherwise(0L)).as("n_t"),
      sum(when(isTarget, 0L).otherwise(1L)).as("n_r"))
    tok.filter(!col("is_t"))
      .join(dfTable, "token")
      .crossJoin(broadcast(totals))
      .groupBy(col("doc").as(idCol))
      .agg(count(lit(1)).as("n_terms"),
        sum((col("df_t") * col("n_r") - col("df_r") * col("n_t"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("long").as("score"))
  }

  /** Vocabulary coverage / out-of-vocabulary rate: build the top-`vocabSize`
    * token vocabulary of the corpus (by occurrence count, ties broken by
    * token — fully deterministic), then report per `groupCol` the total
    * token occurrences, the occurrences not covered by that vocabulary,
    * and the OOV fraction — the tokenizer-coverage audit run before
    * committing a vocab/tokenizer to a corpus mix.
    *
    * Output: `(groupCol, n_tokens, n_oov, oov_frac)` ordered by group.
    * Counts are exact integers; `oov_frac` is one IEEE division.
    *
    * Scale shape: the token-count rollup partial-aggregates on uniform
    * token keys; the top-V selection is `TakeOrderedAndProject` (map-side
    * partial top-k, never a global sort); the vocabulary (bounded at
    * `vocabSize` rows) broadcasts back onto the occurrence stream, so the
    * corpus-side scan joins against a hash set and aggregates — no
    * corpus-sized shuffle beyond the token counts.
    */
  def vocabCoverage(docs: DataFrame, groupCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive")
    val occ = docs
      .select(col(groupCol), explode(tokens(col(textCol))).as("token"))
    val vocab = occ.groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc).limit(vocabSize)
      .select(col("token"), lit(1L).as("__in"))
    occ.join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_frac",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
  }

  /** Collocation mining: adjacent token pairs ranked by PMI's monotone
    * exponential, the lift `p(ab) / (p(a)·p(b))` — how much more often the
    * pair co-occurs than independence predicts. Lift is reported instead
    * of `log2(lift)` (PMI proper) deliberately: every arithmetic step is
    * then a single IEEE division/multiply reproducible bit-for-bit by the
    * SQL oracle, whereas `ln` is not correctly-rounded and differs across
    * libm implementations (same reasoning as [[LanguageModel.bigramScore]];
    * the ranking is identical because log is monotone). `minCount` drops
    * rare-pair noise (hapax pairs have huge, meaningless lift); ties break
    * on `(w1, w2)` ascending so the top-k frontier is deterministic.
    *
    * Output: `(w1, w2, n_pair, lift)`, the `topK` highest-lift pairs.
    *
    * Plan shape at 100 TB: bigram and unigram counts each shuffle once on
    * a token key with full map-side partial aggregation (Zipf head keys
    * partial-aggregate away; the reduce side sees vocabulary-bounded
    * cardinality). The unigram table — vocab-sized, tiny next to the
    * corpus — broadcasts onto both sides of the pair join; the corpus
    * totals ride along as broadcast singletons so no count() action runs
    * driver-side. The final top-k is a `TakeOrderedAndProject` over the
    * vocab²-bounded (minCount-pruned) pair table, never a global sort of
    * corpus-sized data.
    */
  def pmiCollocations(docs: DataFrame, textCol: String,
      minCount: Long = 5L, topK: Int = 50): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    require(topK > 0, "topK must be positive")
    val tk = docs.select(tokens(col(textCol)).as("tk"))
    val uni = tk.select(explode(col("tk")).as("t"))
    val c1 = uni.groupBy("t").agg(count(lit(1)).as("c"))
    val nTok = uni.agg(count(lit(1)).as("n_tok"))
    // guard: Spark's sequence(0, -1) would generate DESCENDING; docs with
    // fewer than 2 tokens have no pairs
    val bg = tk.filter(size(col("tk")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(tk) - 2), i -> struct(tk[i] AS w1, tk[i+1] AS w2))"))
        .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
    val nBg = bg.agg(count(lit(1)).as("n_bg"))
    // lift = (n_pair/N_bg) / ((c_a/N_tok) * (c_b/N_tok)): three divisions
    // and one multiply, each a single IEEE op in a fixed order — the SQL
    // oracle evaluates the identical expression tree
    c2.join(broadcast(c1.select(col("t").as("w1"), col("c").as("__ca"))), "w1")
      .join(broadcast(c1.select(col("t").as("w2"), col("c").as("__cb"))), "w2")
      .crossJoin(broadcast(nTok))
      .crossJoin(broadcast(nBg))
      .select(col("w1"), col("w2"), col("n_pair"),
        ((col("n_pair").cast("double") / col("n_bg")) /
          ((col("__ca").cast("double") / col("n_tok")) *
            (col("__cb").cast("double") / col("n_tok")))).as("lift"))
      .orderBy(col("lift").desc, col("w1").asc, col("w2").asc)
      .limit(topK)
  }

  /** Unicode-script composition per group — the language-ID support
    * signal: what fraction of each group's characters is basic Latin,
    * accented Latin, CJK, Cyrillic, digits, whitespace, other? A corpus
    * labeled `lang=en` with a rising CJK fraction has a router bug; a
    * `zh` slice that is mostly Latin is transliteration or mislabeling.
    *
    * Counting is `regexp_count` over character-class ranges written in
    * `\x{…}` syntax — the one code-point escape both Java regex (Spark)
    * and RE2 (the DuckDB oracle) parse identically; all fractions are
    * exact-integer counts with one final IEEE division each.
    *
    * Scale: char counts are row-local scan-side work; the group rollup is
    * one partial-aggregated shuffle on the group key. |groups| output
    * rows.
    */
  def scriptMix(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val t = col(textCol)
    def cnt(pattern: String): Column =
      regexp_count(t, lit(pattern)).cast("long")
    val classes = Seq(
      "latin" -> "[A-Za-z]",
      "accented" -> "[\\x{00C0}-\\x{024F}]",
      "cjk" -> "[\\x{4E00}-\\x{9FFF}]",
      "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
      "digit" -> "[0-9]",
      "space" -> "[ ]")
    val perDoc = docs.select(
      (col(groupCol) +: (length(t).cast("long").as("n_chars") +:
        classes.map { case (name, p) => cnt(p).as(s"__$name") })): _*)
    val known = classes.map(c => col(s"__${c._1}")).reduce(_ + _)
    val aggExprs: Seq[Column] =
      count(lit(1)).as("n_docs") +: sum(col("n_chars")).as("n_chars") +:
        (classes.map(c => sum(col(s"__${c._1}")).as(s"__s${c._1}")) :+
          sum(col("__other")).as("__sother"))
    val agged = perDoc
      .withColumn("__other", col("n_chars") - known)
      .groupBy(col(groupCol))
      .agg(aggExprs.head, aggExprs.tail: _*)
    val fracs = (classes.map(_._1) :+ "other").map(name =>
      when(col("n_chars") > 0,
        col(s"__s$name").cast("double") / col("n_chars").cast("double"))
        .otherwise(lit(0.0)).as(s"${name}_frac"))
    agged.select((col(groupCol) +: col("n_docs") +: col("n_chars") +:
      fracs): _*)
  }

  /** Per-document keyword extraction: top-`topK` terms by TF-IDF
    * (`tf · ln((N+1)/(df+1))`, the smoothed form). The complement of
    * [[distinctiveTerms]] (which ranks a GROUP's terms against the rest
    * of the corpus): this tags every individual document. Scores round
    * to 6 decimals before ranking (the q108 determinism discipline —
    * `ln` agrees across engines at that precision) and ties break on the
    * term, so the cut is reproducible.
    *
    * Scale: tf and df are one token-keyed shuffle each with map-side
    * partials; the doc count rides a broadcast singleton; df broadcasts
    * back onto the tf table (vocab-bounded). The top-k window partitions
    * by DOC id — millions of small partitions, the well-conditioned
    * direction (no giant single partition exists by construction).
    */
  def tfidfKeywords(docs: DataFrame, idCol: String, textCol: String,
      topK: Int = 3): DataFrame = {
    require(topK >= 1, "tfidfKeywords: topK must be >= 1")
    import org.apache.spark.sql.expressions.Window
    // tf feeds the df rollup AND the scoring join — pinned so the corpus
    // tokenizes + shuffles onto (id, term) once per run, not twice (r18)
    val tf = graft.core.Stats.PlanCache.register(docs
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf")))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("__n"))
    val scored = tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score", round(col("tf") *
        log((col("__n") + lit(1L)).cast("double") / (col("df") + lit(1L))),
        6))
    scored.withColumn("__rn", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(col("score").desc, col("term").asc)))
      .filter(col("__rn") <= topK)
      .select(col(idCol), col("term"), col("tf"), col("score"),
        col("__rn").cast("long").as("rank"))
  }

  /** Keyword-in-context (KWIC) extraction — the audit surface behind
    * every "show me how this token is actually used" review (PII
    * candidates, policy terms, suspicious boilerplate): every occurrence
    * of `term` with `window` tokens of context on each side, clamped at
    * document edges. Output: `(id, pos, context)` (`pos` = 0-based token
    * position), first `topK` occurrences by (id, pos).
    *
    * Scale: occurrence detection is a scan-side explode + pushable
    * equality filter; context assembly is row-local slicing; the bounded
    * top-k is a TakeOrdered. Nothing shuffles except the k survivors.
    */
  def keywordInContext(docs: DataFrame, idCol: String, textCol: String,
      term: String, window: Int = 3, topK: Int = 200): DataFrame = {
    require(window >= 0, "keywordInContext: window must be >= 0")
    require(topK >= 1, "keywordInContext: topK must be >= 1")
    docs.select(col(idCol), tokens(col(textCol)).as("__tk"))
      .select(col(idCol), col("__tk"),
        posexplode(col("__tk")).as(Seq("pos", "__t")))
      .filter(col("__t") === term)
      .select(col(idCol), col("pos"),
        expr(s"""array_join(slice(__tk,
          |  greatest(pos + 1 - $window, 1),
          |  least(pos + 1 + $window, size(__tk)) -
          |    greatest(pos + 1 - $window, 1) + 1), ' ')""".stripMargin)
          .as("context"))
      .orderBy(col(idCol), col("pos"))
      .limit(topK)
  }

  /** Corpus self-similarity probe (the self-BLEU idea, Jaccard form): how
    * alike is the corpus to ITSELF? Draw a deterministic `k`-doc sample
    * (the k smallest `md5(salt:id)` — reproducible, uniform), compute all
    * k·(k−1)/2 pairwise Jaccards over distinct token `n`-grams, and
    * report the count, mean, min and max. A healthy diverse corpus sits
    * near 0; a climbing mean is template flooding that per-pair dedup
    * thresholds (q35-style, tuned for near-dups) never fire on.
    *
    * The mean folds through `graft_dsum` (exact decimal accumulation), so
    * the report is hash-exact under any partitioning/evaluation order.
    *
    * Scale: the sample is a bounded `TakeOrdered` over scan-side keys
    * (never a global sort); the k sampled docs' gram sets broadcast into
    * a k×k self-join — k² stays a few thousand pairs for k ≤ 100
    * regardless of corpus size, which is the entire point: the probe's
    * cost is O(corpus scan) + O(k²), not O(corpus²). Gram sets compare as
    * STRINGS here because the report is oracle-checked; swap in
    * `graft_shingle_hash` sets for a faster engine-only variant.
    */
  def selfSimilarity(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 100, n: Int = 2, salt: String = "selfsim"): DataFrame = {
    require(k >= 2, "selfSimilarity: need at least 2 sampled docs")
    val grams = array_distinct(expr(
      s"transform(sequence(1, greatest(size(__tk) - ${n - 1}, 0)), " +
        s"i -> array_join(slice(__tk, i, $n), ' '))"))
    val sampled = docs
      .select(col(idCol).as("__id"),
        md5(concat(lit(salt), lit(":"), col(idCol).cast("string"))).as("__key"),
        tokens(col(textCol)).as("__tk"))
      // docs shorter than one n-gram carry no self-similarity signal —
      // and the empty-gram guard index would otherwise hit sequence's
      // descending-generation trap (sequence(1,0) = [1,0] → slice at 0
      // throws; the pmiCollocations discipline)
      .filter(size(col("__tk")) >= n)
      .orderBy(col("__key"), col("__id")).limit(k)
      .select(col("__id"), grams.as("__g"))
    val a = sampled.select(col("__id").as("id_a"), col("__g").as("ga"))
    val b = sampled.select(col("__id").as("id_b"), col("__g").as("gb"))
    val inter = size(array_intersect(col("ga"), col("gb")))
    val uni = size(col("ga")) + size(col("gb")) - inter
    val jac = when(uni > 0, inter.cast("double") / uni.cast("double"))
      .otherwise(lit(0.0))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .select(jac.as("__j"))
      .agg(count(lit(1)).as("n_pairs"),
        call_function("graft_dsum", col("__j"), lit(9)).as("__s"),
        min(col("__j")).as("min_jaccard"),
        max(col("__j")).as("max_jaccard"))
      .select(col("n_pairs"),
        (col("__s") / col("n_pairs").cast("double")).as("mean_jaccard"),
        col("min_jaccard"), col("max_jaccard"))
  }

  /** Burrows' Delta stylometric distance between corpus slices — the
    * classic authorship/style-drift measure: over the corpus's top-F
    * most frequent words (function words dominate, which is the point —
    * style lives in "the/of/and" rates, not topic words), each slice's
    * relative frequencies are z-scored against the across-slice
    * distribution and Delta(a,b) is the mean absolute z difference.
    * A feed whose style shifts (template change, new generator, bot
    * injection) jumps out of its neighborhood in this matrix even when
    * content-level dedup sees nothing.
    *
    * Exactness: `|z_a − z_b|` algebraically collapses to
    * `|f_a − f_b| / σ_w` (the μ cancels), so each pair-word term is
    * two IEEE ops on exact-count ratios; σ_w comes from decimal-exact
    * moments; Delta accumulates the F terms in decimal (order-free).
    *
    * Scale: one token-count rollup (partial-agg on the uniform word
    * key), a bounded top-F table broadcast everywhere, and |slices|²·F
    * arithmetic on tiny frames. The corpus is scanned once.
    */
  def burrowsDelta(docs: DataFrame, sourceCol: String, textCol: String,
      topWords: Int = 20): DataFrame = {
    require(topWords >= 1, "burrowsDelta: topWords >= 1")
    def dsum(c: Column): Column = call_function("graft_dsum", c, lit(12))
    val toks = docs.select(col(sourceCol).as("__src"),
      explode(tokens(col(textCol))).as("__w"))
    val counts = graft.core.Stats.PlanCache.register(
      toks.groupBy(col("__src"), col("__w"))
        .agg(count(lit(1)).as("__c")))
    val totals = counts.groupBy(col("__src"))
      .agg(sum(col("__c")).as("__t"))
    val top = counts.groupBy(col("__w"))
      .agg(sum(col("__c")).as("__cw"))
      .orderBy(col("__cw").desc, col("__w")).limit(topWords)
      .select(col("__w"))
    // every (slice, top word) cell — absent words are genuine zeros.
    // grid feeds THREE consumers (sigma + both pair sides): pinned, or
    // the totals aggregation, the top-F broadcast subquery, and the
    // counts join all execute three times per run (r18; grid itself is
    // |slices|·F rows — tiny)
    val grid = graft.core.Stats.PlanCache.register(
      totals.crossJoin(broadcast(top))
      .join(counts, Seq("__src", "__w"), "left")
      .select(col("__src"), col("__w"),
        (coalesce(col("__c"), lit(0L)).cast("double") /
          col("__t").cast("double")).as("__f")))
    val nSrc = totals.select(count(lit(1)).as("__n"))
    val sigma = grid.groupBy(col("__w"))
      .agg(dsum(col("__f")).as("__sf"), dsum(col("__f") * col("__f")).as("__sf2"))
      .crossJoin(broadcast(nSrc))
      .select(col("__w"),
        sqrt(greatest(lit(0.0),
          col("__sf2") / col("__n").cast("double") -
            (col("__sf") / col("__n").cast("double")) *
            (col("__sf") / col("__n").cast("double")))).as("__sig"))
    val a = grid.toDF("src_a", "__w", "__fa")
    val b = grid.toDF("src_b", "__w", "__fb")
    a.join(b, Seq("__w")).filter(col("src_a") < col("src_b"))
      .join(broadcast(sigma), Seq("__w"))
      .select(col("src_a"), col("src_b"),
        when(col("__sig") > 0, abs(col("__fa") - col("__fb")) / col("__sig"))
          .otherwise(lit(0.0)).as("__dz"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_words"),
        (dsum(col("__dz")) / count(lit(1)).cast("double")).as("delta"))
  }

  /** Gopher-style rule report (Rae et al. 2021 §A1.1, the rule bundle
    * most production corpora are filtered with): per-document metrics and
    * a boolean per rule, plus the conjunctive `keep` verdict. Emitting
    * the FLAGS (not just the verdict) is the point — the report shows
    * which rule is doing the killing, the first thing a curation review
    * asks.
    *
    * Every metric is exact-integer counting plus at most one IEEE
    * division; rules compare those exact values to literal thresholds,
    * so the verdict is bit-deterministic. All row-local — a pure
    * scan-side projection at any scale (the one aggregate-ish piece, the
    * top-bigram share, is a per-row HOF over the doc's own tokens).
    */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 5, maxWords: Int = 100000,
      minMeanWordLen: Double = 2.0, maxMeanWordLen: Double = 10.0,
      minDistinctStopwords: Int = 2, minAlphaWordFrac: Double = 0.8,
      maxTopBigramFrac: Double = 0.2,
      stopwords: Seq[String] =
        Seq("the", "a", "of", "to", "and", "in", "is", "that")): DataFrame = {
    // n_words and the top-bigram count come from the native one-pass
    // graft_repetition expression (expressions/TextStats.scala) — the
    // interpreted sort+fold formulation of the bigram mode measured ~5 s
    // at sf0.1 where the fused pass is sub-second; the remaining HOFs are
    // linear scans. The __rep struct is one evaluation under codegen CSE.
    val charSum = expr(
      "aggregate(split(__text, ' '), 0L, (s, w) -> s + length(w))")
    val stopArr = array(stopwords.map(lit): _*)
    val nStop = size(array_intersect(
      array_distinct(tokens(col("__text"))), stopArr)).cast("long")
    val nAlpha = expr(
      "size(filter(split(__text, ' '), w -> w rlike '[A-Za-z]'))")
      .cast("long")
    val nWords = col("__rep.n_words")
    // per-row kernels (graft_repetition + the HOF scans) are the cost —
    // spread a narrow scan to the session's parallelism first (r17)
    val base = graft.core.Spread.narrow(
        docs.select(col(idCol), col(textCol).as("__text")))
      .withColumn("__rep",
        call_function("graft_repetition", tokens(col("__text"))))
      .select(col(idCol),
        nWords.as("n_words"),
        (charSum.cast("double") / nWords.cast("double"))
          .as("mean_word_len"),
        nStop.as("n_stopwords"),
        (nAlpha.cast("double") / nWords.cast("double"))
          .as("alpha_word_frac"),
        when(nWords >= 2,
          col("__rep.top_bigram").cast("double") /
            (nWords - 1L).cast("double"))
          .otherwise(lit(0.0)).as("top_bigram_frac"))
    base.select(col(idCol), col("n_words"), col("mean_word_len"),
        col("n_stopwords"), col("alpha_word_frac"), col("top_bigram_frac"),
        (col("n_words") >= minWords && col("n_words") <= maxWords)
          .as("pass_words"),
        (col("mean_word_len") >= minMeanWordLen &&
          col("mean_word_len") <= maxMeanWordLen).as("pass_word_len"),
        (col("n_stopwords") >= minDistinctStopwords).as("pass_stopwords"),
        (col("alpha_word_frac") >= minAlphaWordFrac).as("pass_alpha"),
        (col("top_bigram_frac") <= maxTopBigramFrac).as("pass_repetition"))
      .withColumn("keep",
        col("pass_words") && col("pass_word_len") && col("pass_stopwords") &&
          col("pass_alpha") && col("pass_repetition"))
  }
}

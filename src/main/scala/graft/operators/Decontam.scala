package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination and boilerplate detection — the corpus-hygiene
  * half of a training-data pipeline: find documents that overlap an
  * evaluation set (so they can be dropped before training), and find
  * n-grams so common across documents they are boilerplate.
  */
object Decontam {

  /** Broadcasts created on [[overlapViaBloom]]'s >16 MB fallback path,
    * awaiting explicit release. The caller owns cleanup: materialize the
    * returned DataFrame, then call [[releaseFallbackBroadcasts]]. */
  private val fallbackBroadcasts =
    new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.broadcast.Broadcast[_]]()

  /** Unpersist every tracked fallback broadcast (non-blocking) and return
    * how many were released. Safe to call while no query is running; a
    * released broadcast re-fetches lazily if a cached plan re-executes. */
  def releaseFallbackBroadcasts(): Int = {
    var n = 0
    var bc = fallbackBroadcasts.poll()
    while (bc != null) {
      bc.unpersist(false)
      n += 1
      bc = fallbackBroadcasts.poll()
    }
    n
  }

  /** Distinct n-gram STRINGS of a space-tokenized text column. Row-local
    * (no shuffle); used where the n-grams themselves are the output — the
    * native one-pass `graft_shingles` expression (codegen) replaces the
    * interpreted `transform`/`slice`/`concat_ws`/`array_distinct` chain
    * with identical output (first-occurrence order, space-joined, empty
    * for short docs). Join-heavy paths use the hashed form
    * (`graft_shingle_hash`) instead — longs shuffle ~4x smaller than
    * strings. */
  def ngrams(textCol: Column, n: Int): Column =
    coalesce(
      call_function("graft_shingles", split(textCol, " "), lit(n)),
      array().cast("array<string>"))

  /** Per-document count of distinct n-grams shared with a benchmark set
    * (documents overlapping an eval benchmark must be quarantined before
    * training). Benchmark documents themselves are excluded from the
    * output.
    *
    * Plan shape: both sides hash their n-grams in one fused codegen pass
    * (`graft_shingle_hash`, never materializing the strings), the
    * benchmark's distinct hash set — tiny next to the corpus — broadcasts,
    * and the corpus side never shuffles. Counts over 64-bit hashes equal
    * counts over the string n-grams barring collisions (~1e-13 per pair at
    * these set sizes); the oracle computes the same counts from string
    * n-grams and must agree.
    */
  /** One fused explode of a frame's distinct per-doc n-gram hashes — THE
    * hashing convention both the exact and Bloom overlap variants share
    * (their outputs are contractually identical, so a drifting copy here
    * would silently desynchronize them). */
  private def hashedNgrams(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = df.select(col(idCol),
    explode(call_function("graft_shingle_hash",
      split(col(textCol), " "), lit(n))).as("__ng"))

  def overlapWithBenchmark(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    def hashed(df: DataFrame) = hashedNgrams(df, idCol, textCol, n)
    val benchNgrams = hashed(benchmark).select(col("__ng")).distinct()
    val benchIds = benchmark.select(col(idCol))
    hashed(corpus)
      .join(benchIds, Seq(idCol), "left_anti")
      .join(broadcast(benchNgrams), Seq("__ng"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("overlap_ngrams"))
  }

  /** [[overlapWithBenchmark]] for benchmarks too large to broadcast as a
    * distinct n-gram set: a Bloom filter over the benchmark's n-gram
    * hashes (a few MB even for billions of n-grams, vs GBs for the set
    * itself) broadcasts and prunes the corpus side BEFORE the exact
    * shuffle join, so the shuffle carries only probable hits (true
    * overlaps + the fpp sliver). The trailing exact join re-verifies
    * every survivor, so the OUTPUT is exactly [[overlapWithBenchmark]]'s
    * — the Bloom can only prune, never alter results — and the same SQL
    * oracle hash-checks it.
    *
    * The filter itself is built distributed (`stat.bloomFilter` runs a
    * treeAggregate over the benchmark) and only the finished bit array
    * lands on the driver for broadcast.
    */
  def overlapViaBloom(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int, fpp: Double = 0.01): DataFrame = {
    def hashed(df: DataFrame) = hashedNgrams(df, idCol, textCol, n)
    // three consumers (count, bloomFilter treeAggregate, exact join) of
    // the benchmark's distinct gram set — in the too-big-to-broadcast
    // regime this operator exists for, recomputing it per consumer means
    // three full benchmark scans; the bounded PlanCache pins it once
    val benchNgrams = graft.core.Stats.PlanCache.register(
      hashed(benchmark).select(col("__ng")).distinct())
    val expected = math.max(benchNgrams.count(), 1L)
    val bloom = benchNgrams.stat.bloomFilter("__ng", expected, fpp)
    // the finished filter probes via the native graft_bloom_contains
    // codegen expression (the serialized bytes fold into the plan and
    // ride the per-stage taskBinary broadcast — same transfer cost as an
    // explicit broadcast, but the probe stays inside whole-stage codegen
    // instead of a per-row lambda). BOUNDED: a plan literal is copied on
    // every tree transform and rendered by explain/plan logging, so past
    // 16 MB serialized (≈ a 1.4B-gram filter at fpp 0.01) the probe
    // falls back to an explicit broadcast + UDF — one driver copy, out
    // of the expression tree — trading codegen for plan hygiene in the
    // regime where the literal would dominate the plan itself. Both
    // paths only PRUNE before the exact re-verify join, so the output
    // contract is identical.
    val bloomBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val maxInlineBloomBytes = 16 << 20
    val probe: Column => Column =
      if (bloomBytes.length <= maxInlineBloomBytes)
        ng => call_function("graft_bloom_contains", lit(bloomBytes), ng)
      else {
        val bc = corpus.sparkSession.sparkContext.broadcast(bloom)
        // a >16 MB broadcast pinned per call would accumulate across a
        // long session: track it so releaseFallbackBroadcasts() (called
        // by the owner once the returned frame is materialized) frees the
        // executor/driver copies; Spark's ContextCleaner also reclaims it
        // once the plan holding the udf closure is unreferenced.
        fallbackBroadcasts.add(bc)
        val mightContain = udf((h: Long) => bc.value.mightContainLong(h))
        ng => mightContain(ng)
      }
    val benchIds = benchmark.select(col(idCol))
    hashed(corpus)
      .join(benchIds, Seq(idCol), "left_anti")
      .filter(probe(col("__ng")))
      // shuffle-hash, NOT broadcast: this operator exists for the regime
      // where the benchmark n-gram set exceeds the broadcast budget
      .join(benchNgrams.hint("shuffle_hash"), Seq("__ng"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("overlap_ngrams"))
  }

  /** n-grams appearing in at least `minDocs` distinct documents, by
    * document frequency — the C4-style boilerplate report (navigation
    * chrome, license headers, templates). Per-doc n-grams are distinct
    * before counting, so a doc repeating a phrase internally counts once.
    *
    * The n-gram strings ARE the output here, so this is the string path:
    * one explode, one shuffle on the n-gram, top-k via TakeOrdered. At
    * 100 TB the groupBy key is the n-gram itself — uniform (hash
    * partitioning over a huge key space), no skew beyond genuinely viral
    * n-grams, which is what the report exists to find.
    */
  def boilerplateNgrams(docs: DataFrame, textCol: String, n: Int,
      minDocs: Long): DataFrame =
    docs.select(explode(ngrams(col(textCol), n)).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= minDocs)

  /** Per-document n-gram novelty — the doc-level rollup of the corpus
    * view [[boilerplateNgrams]] reports: how much of THIS document's
    * distinct n-gram set is corpus-common (df > `commonDf`)?
    * `common_frac` near 1 flags templated/boilerplate-dominated docs the
    * quality filter should drop; near 0 flags novel text. One IEEE
    * division of exact ints — engine-portable without rounding.
    *
    * Scale: n-grams travel as 64-bit hashes (`graft_shingle_hash`, one
    * fused pass per doc); df is one shuffle on the hash (uniform); the
    * join back keys on the same hash and the per-doc rollup on the doc
    * id. The df side can be reused verbatim as a broadcast when the
    * common-gram set is small (df > threshold prunes it to the viral
    * tail).
    */
  def ngramNovelty(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, commonDf: Long = 5L): DataFrame = {
    // grams feeds the df rollup AND the join probe side — pin it so the
    // dominant corpus explode runs once, not twice
    val grams = graft.core.Stats.PlanCache.register(
      docs.select(col(idCol),
        explode(call_function("graft_shingle_hash",
          split(col(textCol), " "), lit(n))).as("__g")))
    val dfreq = grams.groupBy(col("__g")).agg(count(lit(1)).as("__df"))
    grams.join(dfreq, "__g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__df") > commonDf, 1L).otherwise(0L)).as("n_common"))
      .withColumn("common_frac",
        col("n_common").cast("double") / col("n_grams"))
  }

  /** Boilerplate REMOVAL (the rewrite to [[boilerplateNgrams]]'s report):
    * split each document into units on `sep` (lines, paragraphs — any
    * separator), drop every unit whose document frequency is at least
    * `minDocFrac` of the corpus, and reassemble the survivors in their
    * original order. This is the classic corpus-level line-dedup pass
    * (navigation chrome / license headers appear verbatim across many
    * pages; dropping them per-document beats dropping whole documents).
    *
    * Output: `(id, cleaned, n_kept, n_removed)`; a fully-boilerplate
    * document comes back with `cleaned = ""` rather than vanishing.
    *
    * Scale: one shuffle keyed on the unit string for document frequency
    * (uniform key space), one join back (same key), and one groupBy on
    * the doc id to reassemble — the per-doc sort is over that doc's own
    * units only (array_sort after collect, no global sort). The corpus
    * total-doc count rides along as a broadcast singleton, keeping the
    * threshold inside the plan (no driver-side count action).
    */
  def removeCommonUnits(docs: DataFrame, idCol: String, textCol: String,
      sep: String, minDocFrac: Double): DataFrame = {
    require(minDocFrac > 0 && minDocFrac <= 1, "minDocFrac must be in (0,1]")
    val total = docs.agg(count(lit(1)).as("__total"))
    // units feeds the df rollup AND the anti-join kept side — pin it so
    // the corpus splits once, not twice
    val units = graft.core.Stats.PlanCache.register(
      docs.select(col(idCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("pos", "unit"))))
    val common = units.select(col(idCol), col("unit")).distinct()
      .groupBy(col("unit")).agg(count(lit(1)).as("__df"))
      .crossJoin(broadcast(total))
      .filter(col("__df") >= col("__total") * minDocFrac)
      .select(col("unit"))
    val kept = units.join(common, Seq("unit"), "left_anti")
    val rebuilt = kept.groupBy(col(idCol))
      .agg(
        concat_ws(sep, transform(
          array_sort(collect_list(struct(col("pos"), col("unit")))),
          x => x.getField("unit"))).as("cleaned"),
        count(lit(1)).as("n_kept"))
    docs.select(col(idCol),
        // null text holds zero units — size(split(null)) is null and
        // would propagate into n_removed
        coalesce(size(split(col(textCol),
          java.util.regex.Pattern.quote(sep))), lit(0))
          .cast("long").as("__n_units"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cleaned"), lit("")).as("cleaned"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__n_units") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  /** Span EXCISION decontamination — the surgical alternative to
    * dropping whole documents ([[overlapWithBenchmark]] + filter): every
    * token covered by an `n`-gram that appears in the benchmark is
    * removed and the survivors reassemble in order. A doc that quotes
    * one eval question keeps its other 5 000 tokens; the quote itself is
    * gone. Output: `(id, cleaned, n_tokens, n_removed, n_matches)`.
    *
    * Gram equality is on the literal token strings (the benchmark side
    * is DISTINCT n-gram strings — bounded by the benchmark, broadcast),
    * so the oracle replays it without any hash convention. Matched START
    * positions aggregate per doc (bounded by that doc's match count) and
    * the excision is one row-local pass: token `i` is dropped iff some
    * matched start `s` satisfies `s ≤ i < s+n`.
    *
    * Scale: the corpus-side gram explode is scan-side; the only join is
    * against the broadcast benchmark gram set; matched starts shuffle
    * once on the doc id (match-count-sized, not corpus-sized); the
    * rebuild is a projection on the docs table itself.
    */
  def exciseBenchmarkSpans(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1, "exciseBenchmarkSpans: n must be >= 1")
    // r17: gram identity travels as 64-bit hashes (the q37/q57
    // convention — graft_shingle_hash_all is positional, so posexplode
    // recovers the same 0-based starts the string formulation produced;
    // the two kernels hash identical byte streams, so hash equality is
    // string equality barring ~1e-13 collisions, and the oracle's
    // string-gram replay doubles as the no-collision check). The string
    // form allocated one joined gram STRING per position on both sides
    // — the corpus side's dominant CPU.
    val bench = benchmark
      .select(split(col(textCol), " ").as("__tk"))
      .filter(size(col("__tk")) >= n)
      .select(explode(call_function("graft_shingle_hash",
        col("__tk"), lit(n))).as("__g"))
      .distinct()
    val starts = corpus
      .select(col(idCol), split(col(textCol), " ").as("__tk"))
      .filter(size(col("__tk")) >= n)
      .select(col(idCol), posexplode(call_function("graft_shingle_hash_all",
        col("__tk"), lit(n))).as(Seq("__s", "__g")))
      .join(broadcast(bench), "__g")
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("__s"))).as("__starts"))
    // null text reassembles as the degenerate empty row, not null cells
    corpus.select(col(idCol),
        coalesce(split(col(textCol), " "),
          expr("CAST(array() AS ARRAY<STRING>)")).as("__tk"))
      .join(starts, Seq(idCol), "left")
      .withColumn("__starts",
        coalesce(col("__starts"), expr("array()")))
      .select(col(idCol),
        expr(s"array_join(filter(__tk, (x, i) -> " +
          s"NOT exists(__starts, s -> s <= i AND i < s + $n)), ' ')")
          .as("cleaned"),
        size(col("__tk")).cast("long").as("n_tokens"),
        expr(s"size(filter(__tk, (x, i) -> " +
          s"exists(__starts, s -> s <= i AND i < s + $n)))")
          .cast("long").as("n_removed"),
        size(col("__starts")).cast("long").as("n_matches"))
  }
}

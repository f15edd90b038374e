package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic sampling for corpus mixing/downsampling.
  *
  * A training pipeline needs samples that are (a) reproducible across
  * runs, engines, and re-partitionings, and (b) stratified — different
  * keep-rates per source/language implement the mixture weights. Spark's
  * `df.sample` is seed-stable only for a fixed partitioning, so we hash
  * the ROW ID instead: membership is a pure function of the row, immune
  * to shuffle/split changes, and the same predicate replays anywhere
  * (including the DuckDB oracle).
  */
object Sampling {

  /** `md5(salt ‖ id) mod 10000` — a uniform basis-point bucket in
    * [0, 10000), identical in any engine with md5 (the first 8 hex chars
    * fit a long exactly). */
  def hashBucket(idCol: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), idCol.cast("string"))), 1, 8), 16, 10)
      .cast(LongType) % 10000L

  /** Early-exit distinct sample — sybil `-distinct-limit`
    * (src/lib/aggregate.go:19, table_query.go:259-280: "find x distinct
    * samples that fit some filter set and exit early"): up to `n`
    * distinct key tuples, with each scan partition STOPPING as soon as
    * it has collected `n` local distinct tuples. Any `n` global distinct
    * tuples exist within the per-partition samples (global distinct ⊆
    * union of partition keys, and every partition returns all its keys
    * until it hits `n`), so the final `distinct().limit(n)` is complete.
    *
    * WHICH tuples come back depends on scan order — exactly like the
    * reference, whose result depends on block visit order; pass
    * `n >= `#distinct for a deterministic (complete) answer. Unlike the
    * reference, the returned tuples are never accompanied by partial
    * aggregates — this surface answers the flag's documented use case
    * (distinct samples under a filter) and nothing mushier.
    *
    * Scale: the one deliberate `mapPartitions` in the engine — Catalyst
    * cannot express "stop consuming this partition's iterator", and
    * stopping is the point: remaining columnar batches in a satisfied
    * partition are never decoded (spec asserts records-read shrinks).
    * The shuffle carries ≤ n·partitions key tuples, never data.
    */
  def distinctSample(df: DataFrame, cols: Seq[String], n: Int): DataFrame = {
    require(cols.nonEmpty, "distinctSample: at least one key column")
    require(n >= 1, s"distinctSample: n must be >= 1, got $n")
    val keyed = df.select(cols.map(col): _*)
    val enc = org.apache.spark.sql.Encoders.row(keyed.schema)
    keyed.mapPartitions { it =>
      val seen = scala.collection.mutable.LinkedHashSet
        .empty[org.apache.spark.sql.Row]
      while (it.hasNext && seen.size < n) seen += it.next()
      seen.iterator
    }(enc)
      .distinct().limit(n)
  }

  /** Stratified deterministic sample: keep a row iff its hash bucket falls
    * below the stratum's threshold (in basis points: 10000 = keep all,
    * 2500 = keep 25%). Adds `sample_weight` = 10000/threshold for unbiased
    * re-weighting of downstream aggregates.
    *
    * Thresholds are integers (not double rates) so the cutoff — and the
    * weight, one IEEE division of two exact ints — is bit-identical across
    * engines. Scale: a narrow filter over the scan, no shuffle at all;
    * pushes into the scan as a deterministic predicate.
    */
  def stratifiedHashSample(df: DataFrame, idCol: String, stratumCol: String,
      thresholdsBp: Map[String, Int], defaultBp: Int,
      salt: String): DataFrame = {
    require((defaultBp +: thresholdsBp.values.toSeq).forall(t => t >= 0 && t <= 10000),
      "thresholds are basis points in [0, 10000]")
    val threshold = thresholdsBp.toSeq.sortBy(_._1).foldLeft(lit(defaultBp)) {
      case (acc, (k, bp)) => when(col(stratumCol) === k, lit(bp)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), salt) < threshold.cast(LongType))
      .withColumn("sample_weight",
        lit(10000.0) / threshold.cast("double"))
  }

  /** Per-key quota cap: keep at most `k` rows per `keyCol` value, ranked
    * by `orderBy` (ties MUST be broken by a unique column for determinism)
    * — the classic per-domain/per-source retention cap that stops a single
    * crawler-friendly site from dominating the corpus mixture.
    *
    * Scale: one shuffle on the key + a bounded window (row_number stops
    * scanning at k only logically — the sort is per-key). Skewed keys (one
    * domain = billions of rows) serialize into one task's sort; the escape
    * hatch at that scale is a two-phase cap — per-partition pre-cap to k
    * rows per key (mapPartitions or a salted window), then the exact
    * window over the ≤ k·partitions survivors — which this stays ready
    * for because the predicate is rank-based, not value-based.
    */
  def quotaCap(df: DataFrame, keyCol: String, orderBy: Seq[Column],
      k: Int): DataFrame = {
    require(k > 0, "quota must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(orderBy: _*)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Weight-proportional deterministic sample: keep a row with probability
    * `weight / maxWeight`, decided by pure integer arithmetic on the md5
    * basis-point bucket — P(bucket·maxW < 10000·w) = w/maxW exactly, no
    * floats in the decision, so membership replays bit-identically in any
    * engine (the transcendental-free alternative to exponential-sort
    * weighted reservoirs, whose ln()/pow() keys are not ULP-stable across
    * engines). Adds `sample_weight` = maxW/w, the Horvitz-Thompson
    * reweighting factor, as one exact-int IEEE division.
    *
    * Scale: a pure filter over the scan — no shuffle, pushes down like any
    * deterministic predicate. `maxWeight` is a corpus constant the caller
    * pins (a config, not a data scan), which is what keeps membership
    * stable as the corpus grows.
    */
  def weightedHashSample(df: DataFrame, idCol: String, weightCol: Column,
      maxWeight: Long, salt: String): DataFrame = {
    require(maxWeight > 0, "maxWeight must be positive")
    // the membership product 10000·w must stay inside long (the oracle
    // computes the identical int arithmetic)
    require(maxWeight < Long.MaxValue / 10000L,
      "maxWeight too large for integer membership arithmetic")
    val w = weightCol.cast(LongType)
    df.filter(hashBucket(col(idCol), salt) * maxWeight < lit(10000L) * w)
      .withColumn("sample_weight",
        // Horvitz–Thompson: P(keep) = min(1, w/maxWeight), so the weight
        // floors at 1.0 — a row with w > maxWeight is kept ALWAYS and
        // must not down-weight downstream sums by maxWeight/w
        greatest(lit(1.0),
          lit(maxWeight).cast("double") / w.cast("double")))
  }

  /** Skew-resistant [[quotaCap]]: identical output, two phases. Phase 1
    * pre-caps to k per (key, salt) — `buckets` parallel sub-sorts instead
    * of one task sorting a pathological key's billions of rows; phase 2
    * runs the exact window over the ≤ buckets·k survivors per key.
    *
    * EXACT, not approximate: any row in a key's true top-k is also within
    * the top-k of its own salt bucket (the rows above it there are a
    * subset of the rows above it globally), so phase 1 never drops a
    * final-answer row — the result is salt-invariant. `saltCol` just
    * spreads rows (any column works; a unique id spreads best).
    */
  def quotaCapTwoPhase(df: DataFrame, keyCol: String, orderBy: Seq[Column],
      k: Int, saltCol: Column, buckets: Int = 32): DataFrame = {
    require(k > 0 && buckets > 0, "quota and buckets must be positive")
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol), col("__salt")).orderBy(orderBy: _*)
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(orderBy: _*)
    df.withColumn("__salt", pmod(xxhash64(saltCol), lit(buckets.toLong)))
      .withColumn("__rk", row_number().over(w1)).filter(col("__rk") <= k)
      .withColumn("__rk2", row_number().over(w2)).filter(col("__rk2") <= k)
      .drop("__rk", "__rk2", "__salt")
  }

  /** Sequence packing: assign documents to fixed token-budget training
    * bins by concatenation order — the GPT-style "concatenate the corpus,
    * cut every `budget` tokens" layout. A document's bin is where its
    * FIRST token lands (`floor(exclusive-prefix-sum / budget)`), and
    * `bin_offset` is its start position within the bin; a doc longer than
    * the remaining space straddles into the next bin(s), exactly like the
    * token stream it models.
    *
    * Output: `(id, n_tokens, pack_part, bin, bin_offset)`.
    *
    * Scale: a single global ordering would serialize into ONE window task,
    * so packing is partitioned — `pack_part = id mod parts` (any
    * deterministic key works) and the prefix sum runs per partition;
    * `parts` independent token streams pack in parallel, which is also how
    * a 1000-executor run would shard its writer tasks. The window state is
    * one running long per partition.
    */
  def packSequences(docs: DataFrame, idCol: String, tokenCountCol: Column,
      budget: Long, parts: Int = 32): DataFrame = {
    require(budget > 0, "token budget must be positive")
    require(parts > 0, "parts must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pack_part"))
      .orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs
      .select(col(idCol), tokenCountCol.cast("long").as("n_tokens"))
      // partition key for ANY id type: numeric ids keep the plain modulo
      // (the oracle's arithmetic); non-numeric ids (UUID strings) take
      // the engine-portable md5 bucket — the plain cast would abort the
      // query under ANSI (or, with ANSI off, null out and silently
      // collapse the whole corpus into ONE window partition, the
      // single-task shape this pre-partitioning exists to avoid)
      .withColumn("pack_part", coalesce(
        pmod(expr(s"try_cast(`$idCol` AS LONG)"), lit(parts.toLong)),
        pmod(conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
          .cast("long"), lit(parts.toLong))))
      .withColumn("__start", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col(idCol), col("n_tokens"), col("pack_part"),
        (col("__start") / budget).cast("long").as("bin"),
        (col("__start") % budget).as("bin_offset"))
  }

  /** Deterministic percent split label from any key column: md5 bucket
    * in [0, 100) keyed `salt:key`, then the train/val/test cut — the
    * single home for the bucket convention every split constructor (and
    * the q133 naive-split audit) shares, so the engine-side expression
    * and its SQL mirrors cannot silently diverge. */
  def pctSplit(key: Column, salt: String, trainPct: Int,
      valPct: Int): Column = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      "pctSplit: percentages must be non-negative and sum <= 100")
    val bucket = conv(substring(md5(concat(lit(salt), lit(":"), key)),
      1, 8), 16, 10).cast(LongType) % 100L
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Leakage-free train/val/test split: the split is keyed on the
    * CONTENT hash, not the row id, so byte-identical documents always
    * land in the same split — the minimum hygiene bar before training
    * (an id-keyed split leaks every exact duplicate across the
    * boundary; extend the same idea to near-dup cluster ids from
    * [[Dedup.connectedComponents]] when fuzzy leakage matters).
    *
    * `train`/`val` are percent cut points on the md5 bucket of the
    * content (e.g. 80/10 → 80/10/10) via [[pctSplit]]. Deterministic,
    * engine-portable (same convention as [[hashBucket]]), and a pure
    * per-row map — no shuffle, fuses into the scan at any scale.
    */
  def dedupAwareSplit(docs: DataFrame, idCol: String, textCol: String,
      trainPct: Int = 80, valPct: Int = 10, salt: String = "split"): DataFrame =
    docs.select(col(idCol), md5(col(textCol)).as("content_hash"),
      pctSplit(md5(col(textCol)), salt, trainPct, valPct).as("split"))

  /** Cluster-aware train/val/test split — [[dedupAwareSplit]] upgraded
    * from exact-dup hygiene to NEAR-dup hygiene: the split keys on the
    * document's near-dup CLUSTER representative (the min-id of its
    * [[Dedup.connectedComponents]] component over LSH candidate pairs),
    * so a paraphrase cluster can never straddle train and eval. Docs in
    * no cluster (including docs too short for [[Dedup.minhashBands]]'s
    * 3-token shingle floor, which can never band-collide) key on their
    * CONTENT hash, so exact duplicates share a split even when they are
    * too short to cluster — the [[dedupAwareSplit]] guarantee is the
    * floor, never lost by upgrading to cluster keys.
    *
    * Scale: the component labels are |clustered docs| rows joined back on
    * the doc id (uniform key); the split itself stays a pure projection.
    * Output: `(id, cluster_key: string, split)`.
    */
  def clusterAwareSplit(docs: DataFrame, idCol: String, textCol: String,
      trainPct: Int = 80, valPct: Int = 10,
      salt: String = "csplit"): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      "clusterAwareSplit: percentages must be non-negative and sum <= 100")
    val cc = Dedup.connectedComponents(
      Dedup.lshCandidates(Dedup.minhashBands(docs, idCol, textCol), idCol))
    val key = coalesce(col("cluster_id").cast("string"), md5(col(textCol)))
      .as("cluster_key")
    docs.select(col(idCol), col(textCol))
      .join(cc.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol), key)
      .select(col(idCol), col("cluster_key"),
        pctSplit(col("cluster_key"), salt, trainPct, valPct).as("split"))
  }

  /** Audit an EXISTING train/val/test assignment for near-duplicate
    * leakage — the measurement the split constructors
    * ([[dedupAwareSplit]], [[clusterAwareSplit]]) only promise: how many
    * verified near-dup pairs straddle two different splits, i.e. how many
    * eval documents have a paraphrase in train. Pairs are LSH band
    * collisions ([[graft.operators.Dedup.minhashBands]] →
    * [[graft.operators.Dedup.lshCandidates]]) confirmed by exact shingle
    * Jaccard ≥ `threshold` ([[graft.operators.Dedup.jaccardVerify]]), so
    * the audit never scores all pairs — candidates only.
    *
    * Output: one row per unordered split pair `(split_a < split_b)` with
    * the crossing pair count and the count of distinct documents
    * involved. Empty output = leak-free (what [[clusterAwareSplit]]
    * guarantees by construction for its own pairs — spec-asserted).
    *
    * Scale: the candidate/verify stages are the proven dedup shapes
    * (signatures shuffle, text never does); the split lookup is two
    * id-keyed equi-joins of the (small) verified-pair set against the
    * assignment; the final rollup groups a handful of split pairs.
    */
  def splitLeakageAudit(docs: DataFrame, idCol: String, textCol: String,
      splits: DataFrame, splitCol: String = "split",
      threshold: Double = 0.6): DataFrame = {
    val cand = Dedup.lshCandidates(Dedup.minhashBands(docs, idCol, textCol),
      idCol)
    val verified = Dedup.jaccardVerify(docs, cand, idCol, textCol, threshold)
    val s1 = splits.select(col(idCol).as("d1"), col(splitCol).as("__s1"))
    val s2 = splits.select(col(idCol).as("d2"), col(splitCol).as("__s2"))
    verified.join(s1, "d1").join(s2, "d2")
      .filter(col("__s1") =!= col("__s2"))
      .select(least(col("__s1"), col("__s2")).as("split_a"),
        greatest(col("__s1"), col("__s2")).as("split_b"),
        explode(array(col("d1"), col("d2"))).as("__doc"))
      .groupBy(col("split_a"), col("split_b"))
      // every pair explodes into exactly two endpoint rows
      .agg((count(lit(1)) / 2).cast("long").as("n_pairs"),
        countDistinct(col("__doc")).as("n_docs"))
  }

  /** Temperature-scaled corpus mixture weights: per group (source,
    * domain, language), the sampling weight `tokens^α / Σ tokens^α` and
    * its share of a token budget — the standard recipe for rebalancing a
    * multi-source corpus (up-weight small domains, damp dominant ones;
    * α = 1 is proportional, α = 0 uniform, α ≈ 0.5–0.75 the usual
    * multilingual compromise).
    *
    * `temperatureQuarters` expresses α in quarters (0..4 → α = 0, ¼, ½,
    * ¾, 1): `x^(m/4)` composes from one or two `sqrt`s and one multiply —
    * all IEEE-correctly-rounded, so the weights are bit-identical in any
    * engine that runs the same composition — whereas `pow(x, α)` is not
    * ULP-stable across math libraries and would break result-hash
    * parity. The denominator accumulates in DECIMAL (`graft_dsum`), so
    * it is order- and partitioning-independent too.
    *
    * Output: `(group, n_docs, tokens, weight, target_tokens)` with
    * `target_tokens = ⌊weight · budgetTokens⌋`.
    *
    * Scale: one partial-aggregated shuffle over the group key (group
    * cardinality = #domains, tiny); the denominator is a one-row
    * broadcast. The weights feed [[stratifiedHashSample]] thresholds to
    * actually draw the mixture.
    */
  def mixtureWeights(df: DataFrame, groupCol: String, tokenCountCol: Column,
      budgetTokens: Long, temperatureQuarters: Int = 3): DataFrame = {
    require(temperatureQuarters >= 0 && temperatureQuarters <= 4,
      "mixtureWeights: temperatureQuarters must be in 0..4")
    val g = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCountCol.cast("long")).as("tokens"))
    val x = col("tokens").cast("double")
    val wr = temperatureQuarters match {
      case 0 => lit(1.0)
      case 1 => sqrt(sqrt(x))
      case 2 => sqrt(x)
      case 3 => sqrt(sqrt(x)) * sqrt(x)
      case 4 => x
    }
    val raw = g.withColumn("__w", wr)
    // scale 9, not 18: wr values are O(10²-10⁵), so the scaled int sum
    // stays far below 2^53 — the decimal→double finish is then a single
    // exact-int division both engines round identically, and the 1e-9
    // grain towers over the repr-vs-binary cast gap (the q174/q175
    // lesson: deep scales turn each cast into a cross-engine lottery)
    val den = raw.agg(
      call_function("graft_dsum", col("__w"), lit(9)).as("__den"))
    // degenerate-corpus guard (empty input, or every group at 0 tokens):
    // a zero denominator would silently turn every weight into NaN/null.
    // assert_true is null on pass, so the coalesce keeps it in the plan
    // (same pattern as groupedTrend/groupedGini's loud preconditions)
    val denGuarded = coalesce(
      assert_true(col("__den") > 0d, lit(
        "mixtureWeights: total corpus weight is zero (empty input or " +
          "all-zero token counts) — weights are undefined")).cast("double"),
      col("__den"))
    raw.crossJoin(broadcast(den))
      .select(col(groupCol), col("n_docs"), col("tokens"),
        (col("__w") / denGuarded).as("weight"),
        floor((col("__w") / denGuarded) * lit(budgetTokens.toDouble))
          .cast("long").as("target_tokens"))
  }

  /** Priority sampling (Duffield–Lund–Thorup, JACM 2007): a weighted
    * sample of exactly `n` rows WITHOUT replacement, with near-optimal
    * variance for subset-sum estimation — the bounded-size alternative to
    * [[weightedHashSample]]'s Bernoulli draw (whose size is random).
    *
    * Each row gets priority `q = w / u` with `u` uniform in (0, 1]; the
    * sample is the top-`n` priorities and the estimator weight is
    * `max(w, τ)` where the threshold τ is the (n+1)-th priority
    * (Σ max(w,τ) over the sample is unbiased for Σ w). Determinism and
    * cross-engine replay: `u = (md5bucket + 1)/2³²` from the salted row
    * id (the md5 32-bit prefix, so `u` is exact and never 0), and
    * `q = (w·2³²)/(bucket+1)` is ONE IEEE division of two exact integers
    * — bit-identical anywhere; ties cannot occur at distinct buckets with
    * equal weights but ordering still pins the id as tiebreak. Weights
    * must be positive integers below 2³¹ so `w·2³²` stays in a long.
    *
    * Output: `(idCol, weight, priority, est_weight)` for the `n` sampled
    * rows, ordered by priority descending. If the input has ≤ n rows,
    * every row is kept with `est_weight = weight` (τ = 0).
    *
    * Scale shape: priorities are a scan-side projection; both the
    * sample and the threshold come from `TakeOrderedAndProject` over
    * n+1 rows — map-side partial top-k, never a global sort — and τ
    * rides a one-row broadcast (no driver collect). The top-(n+1) scan
    * executes twice (once for τ, once for the sample); both are the
    * same bounded partial-top-k job.
    */
  /** The salted-id priority shared by [[prioritySample]] and
    * [[prioritySamplePerGroup]]: `q = w·2³² / (md5bucket+1)` — one IEEE
    * division of two exact integers, deterministic and engine-portable —
    * with a loud positive-weight guard (w ≤ 0 makes the priority
    * meaningless and the estimator biased; same pattern as
    * mixtureWeights). Adds `__w` (long weight) and `__q` (priority). */
  private def priorityCols(df: DataFrame, idCol: String,
      weightCol: Column, salt: String): DataFrame = {
    val bucket = conv(
      substring(md5(concat(lit(salt), col(idCol).cast("string"))), 1, 8),
      16, 10).cast(LongType)
    val w = weightCol.cast(LongType)
    // upper bound too: __w · 2³² must stay inside long, or a > 2³¹
    // weight overflows NEGATIVE and the corpus's heaviest rows — the
    // ones weighted sampling most needs to keep — silently sort last
    val wGuarded = coalesce(
      assert_true(w > 0L && w < lit(2147483648L), lit(
        "prioritySample: weights must be positive integers below 2^31 " +
          "(the priority product w*2^32 must fit a long)")).cast("long"),
      w)
    df.withColumn("__w", wGuarded)
      .withColumn("__q",
        (col("__w") * lit(4294967296L)).cast("double") /
          (bucket + lit(1L)).cast("double"))
  }

  def prioritySample(df: DataFrame, idCol: String, weightCol: Column,
      n: Int, salt: String): DataFrame = {
    require(n > 0, "sample size must be positive")
    val scored = priorityCols(df, idCol, weightCol, salt)
    val top = scored.orderBy(col("__q").desc, col(idCol).asc).limit(n + 1)
    val tau = top.agg(
      when(count(lit(1)) === (n + 1), min(col("__q")))
        .otherwise(lit(0.0)).as("__tau"))
    top.orderBy(col("__q").desc, col(idCol).asc).limit(n)
      .crossJoin(broadcast(tau))
      .select(col(idCol), col("__w").as("weight"), col("__q").as("priority"),
        greatest(col("__w").cast("double"), col("__tau")).as("est_weight"))
      .orderBy(col("priority").desc, col(idCol).asc)
  }

  /** Per-group [[prioritySample]]: exactly `n` weighted rows from EVERY
    * `groupCol` value (fewer only when a group is smaller than n), each
    * group carrying its own Duffield–Lund–Thorup threshold τ_g and
    * estimator weights — the balanced per-domain weighted draw that one
    * global sample cannot give (a heavy domain would crowd out the rest),
    * and the per-stratum subset-sum estimator that [[quotaCap]]'s plain
    * top-k cannot give.
    *
    * Output: `(groupCol, idCol, weight, priority, est_weight)` ordered by
    * (group, priority desc, id).
    *
    * Scale shape: priorities are scan-side; the per-group top-(n+1) runs
    * the two-phase trick of [[quotaCapTwoPhase]] — a salted pre-cap
    * bounds every task's sort at n+1 rows per (group, salt) even when one
    * domain holds billions of rows, then the exact window ranks
    * ≤ buckets·(n+1) survivors per group (provably the true top-(n+1):
    * any row in a group's true top-k is in its salt bucket's top-k). τ_g
    * comes from a |groups|-row aggregation broadcast back onto the
    * sample. Nothing scans twice and nothing collects.
    */
  def prioritySamplePerGroup(df: DataFrame, groupCol: String, idCol: String,
      weightCol: Column, n: Int, salt: String,
      buckets: Int = 32): DataFrame = {
    require(n > 0 && buckets > 0, "sample size and buckets must be positive")
    val scored = priorityCols(df, idCol, weightCol, salt)
    val order = Seq(col("__q").desc, col(idCol).asc)
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol), col("__sb")).orderBy(order: _*)
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(order: _*)
    val ranked = scored
      .withColumn("__sb", pmod(xxhash64(col(idCol)), lit(buckets.toLong)))
      .withColumn("__r1", row_number().over(w1)).filter(col("__r1") <= n + 1)
      .withColumn("__rn", row_number().over(w2)).filter(col("__rn") <= n + 1)
    val tauG = ranked.groupBy(col(groupCol)).agg(
      when(count(lit(1)) === (n + 1), min(col("__q")))
        .otherwise(lit(0.0)).as("__tau"))
    ranked.filter(col("__rn") <= n)
      .join(broadcast(tauG), Seq(groupCol))
      .select(col(groupCol), col(idCol), col("__w").as("weight"),
        col("__q").as("priority"),
        greatest(col("__w").cast("double"), col("__tau")).as("est_weight"))
      .orderBy(col(groupCol).asc, col("priority").desc, col(idCol).asc)
  }

  /** Epoch planner over [[mixtureWeights]] — the repeat-data audit
    * (Muennighoff et al. 2023, "Scaling Data-Constrained Language
    * Models": repeating past ~4 epochs stops buying loss): given the
    * temperature-weighted token targets, how many EPOCHS of each source
    * does the budget imply, which sources exceed `maxEpochs`, and how
    * many target tokens the cap forfeits (`deficit_tokens` — the mass to
    * re-spread or cut).
    *
    * Pure projection over the mixture-weight rollup (|groups| rows):
    * `epochs = target/tokens` (one IEEE division), `granted =
    * min(target, tokens·maxEpochs)` in exact integers.
    */
  def epochPlan(df: DataFrame, groupCol: String, tokenCountCol: Column,
      budgetTokens: Long, temperatureQuarters: Int = 3,
      maxEpochs: Int = 4): DataFrame = {
    require(maxEpochs >= 1, "maxEpochs must be >= 1")
    val w = mixtureWeights(df, groupCol, tokenCountCol, budgetTokens,
      temperatureQuarters)
    w.select(col(groupCol), col("n_docs"), col("tokens"), col("weight"),
        col("target_tokens"))
      .withColumn("epochs",
        when(col("tokens") > 0,
          col("target_tokens").cast("double") / col("tokens").cast("double")))
      .withColumn("over_cap",
        coalesce(col("epochs") > lit(maxEpochs.toDouble), lit(false)))
      .withColumn("granted_tokens",
        least(col("target_tokens"), col("tokens") * lit(maxEpochs.toLong)))
      .withColumn("deficit_tokens",
        col("target_tokens") - col("granted_tokens"))
  }

  /** Length-bucketed batch assignment with a padding-efficiency report —
    * the batch shaper every fixed-shape training loop runs (fairseq's
    * `--max-tokens` bucketing): sequences of similar length batch
    * together so per-batch padding to `max_len` wastes little compute.
    *
    * Each row lands in length bucket `len div bucketWidth`; within a
    * bucket, rows are shuffled by the deterministic hash
    * `md5(salt:id)` (a reproducible epoch permutation — change `salt` to
    * reshuffle) and cut into batches of `batchSize`. Output, per
    * (bucket, batch): sequence count, max/total length, absolute padding
    * waste `n·max − Σlen`, and the padded-token fraction.
    *
    * Scale shape: the per-bucket order is NOT a
    * `Window.partitionBy(bucket)` — one popular length bucket would
    * collapse into a single window task. Instead [[Ranking.globalRowNumber]]
    * range-partitions on `(bucket, hash, id)` and ranks with per-range
    * offsets, so parallelism tracks data volume, not bucket count;
    * per-bucket positions are recovered by subtracting the bucket's min
    * rank (a bucket-count-sized aggregate, broadcast back). The report
    * aggregation shuffles once on (bucket, batch) with map-side partials.
    */
  def lengthBucketBatches(docs: DataFrame, idCol: String, lenExpr: Column,
      bucketWidth: Int, batchSize: Int, salt: String): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(batchSize > 0, "batchSize must be positive")
    val base = docs
      .select(col(idCol), lenExpr.cast("long").as("len"))
      .withColumn("bucket", expr(s"len div $bucketWidth"))
      .withColumn("__k",
        md5(concat(lit(salt), lit(":"), col(idCol).cast("string"))))
    val ranked = Ranking.globalRowNumber(base,
      Seq(col("bucket"), col("__k"), col(idCol)), "__rn")
    val starts = ranked.groupBy("bucket").agg(min("__rn").as("__b0"))
    ranked.join(broadcast(starts), "bucket")
      .withColumn("batch", expr(s"(__rn - __b0) div $batchSize"))
      .groupBy(col("bucket"), col("batch"))
      .agg(count(lit(1)).as("n_seqs"),
        max(col("len")).as("max_len"),
        sum(col("len")).as("sum_len"))
      .withColumn("pad_tokens",
        col("n_seqs") * col("max_len") - col("sum_len"))
      .withColumn("pad_frac",
        when(col("n_seqs") * col("max_len") > 0,
          col("pad_tokens").cast("double") /
            (col("n_seqs") * col("max_len")))
          .otherwise(lit(0.0)))
  }

  /** DSIR-style importance weights (Data Selection via Importance
    * Resampling, Xie et al. 2023): score every document by how much its
    * hashed-feature profile looks like a TARGET slice relative to the raw
    * corpus, so the high scorers can be upsampled toward the target
    * distribution.
    *
    * Features are token unigrams hashed into `buckets` buckets (the
    * paper's hashed n-gram trick — fixed-size model at any vocabulary).
    * The classic score is the log-likelihood ratio
    * `Σ_f c_f·log(p_target(f)/p_raw(f))`; this implementation uses the
    * linear likelihood-ratio form instead — with add-one smoothing,
    *
    *   num = Σ_f c_f·(t_f + 1)        (exact BIGINT)
    *   den = Σ_f c_f·(r_f + 1)        (exact BIGINT)
    *   score = (num / (T + B)) / (den / (R + B))   (three IEEE ops)
    *
    * — because every step is then integer-exact or a single IEEE
    * division, reproducible bit-for-bit by the SQL oracle (`ln` is not
    * correctly rounded across libms — the q75/q149 discipline). The
    * signal is the same "target-like vs typical" ratio.
    *
    * Scale shape: the two feature tables are ≤ `buckets` rows — they
    * reduce map-side and BROADCAST onto the per-doc bucket counts; the
    * only corpus-sized shuffles are the (doc, bucket) partial-agg
    * group-by and the final per-doc reassembly. Nothing quadratic, no
    * model state beyond 2·buckets longs.
    */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, buckets: Int = 256, salt: String = "dsir",
      topK: Int = 100): DataFrame = {
    require(buckets > 0, "dsirWeights: buckets must be positive")
    require(topK > 0, "dsirWeights: topK must be positive")
    val toks = docs
      .select(col(idCol), targetPred.as("__tgt"),
        explode(split(col(textCol), " ")).as("__t"))
      .withColumn("__b",
        conv(substring(md5(concat(lit(salt), lit(":"), col("__t"))), 1, 8),
          16, 10).cast(LongType) % buckets.toLong)
    // per-doc hashed-feature counts: one partial-agg shuffle on (doc, b)
    val docCounts = toks.groupBy(col(idCol), col("__b"))
      .agg(count(lit(1)).as("__c"))
    // feature tables: ≤ `buckets` rows each, reduce map-side
    val rawF = toks.groupBy(col("__b")).agg(count(lit(1)).as("__r"))
    val tgtF = toks.filter(col("__tgt")).groupBy(col("__b"))
      .agg(count(lit(1)).as("__tf"))
    val totals = toks.agg(
      count(lit(1)).as("__R"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("__T"))
    val scored = docCounts
      .join(broadcast(rawF), Seq("__b"))
      .join(broadcast(tgtF), Seq("__b"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_tokens"),
        sum(col("__c") * (coalesce(col("__tf"), lit(0L)) + lit(1L)))
          .as("num"),
        sum(col("__c") * (col("__r") + lit(1L))).as("den"))
      .crossJoin(broadcast(totals))
      .select(col(idCol), col("n_tokens"), col("num"), col("den"),
        ((col("num").cast("double") /
            (col("__T") + lit(buckets.toLong)).cast("double")) /
          (col("den").cast("double") /
            (col("__R") + lit(buckets.toLong)).cast("double"))).as("score"))
    scored.orderBy(col("score").desc, col(idCol)).limit(topK)
  }

  /** Purged temporal split (the time-series "embargo" split, de Prado's
    * purged CV adapted to event logs): train = rows at or before the
    * cut, test = rows at or after cut + embargo, and any entity with
    * activity INSIDE the embargo window is purged from the test side
    * entirely — its post-embargo rows are correlated with training-time
    * state, the leak this split exists to stop.
    *
    * The cut and embargo are integer fractions of the observed time span
    * (exact integer arithmetic, engine-portable). Returns one row per
    * `labelCol` value with train/test/embargo counts and the purged test
    * rows, plus the resolved boundaries for auditability.
    *
    * Scale: two scans (one for the min/max bounds — a 2-long broadcast —
    * one for the classification), one partial-agg shuffle on the
    * entity key for the purge set (broadcast back), one on the label for
    * the report. The purge set is |entities-in-embargo| — bounded by the
    * embargo width, naturally small; at pathological widths it degrades
    * to a shuffle join, same semantics.
    */
  def purgedTemporalSplit(events: DataFrame, entityCol: String,
      tsSecCol: Column, labelCol: String,
      trainPctOfSpan: Int = 60, embargoPctOfSpan: Int = 5): DataFrame = {
    require(trainPctOfSpan > 0 && embargoPctOfSpan >= 0 &&
      trainPctOfSpan + embargoPctOfSpan < 100,
      "purgedTemporalSplit: need 0 < train, 0 <= embargo, train+embargo < 100")
    val bounds = events.agg(min(tsSecCol).as("__lo"), max(tsSecCol).as("__hi"))
      .select(col("__lo"),
        (col("__lo") +
          expr(s"((__hi - __lo) * $trainPctOfSpan) div 100")).as("__t1"),
        (col("__lo") + expr(
          s"((__hi - __lo) * ${trainPctOfSpan + embargoPctOfSpan}) div 100"))
          .as("__t2"))
    val tagged = events
      .select(col(entityCol).as("__e"), tsSecCol.as("__s"),
        col(labelCol).as("__lbl"))
      .crossJoin(broadcast(bounds))
      .withColumn("__zone",
        when(col("__s") <= col("__t1"), "train")
          .when(col("__s") < col("__t2"), "embargo")
          .otherwise("test"))
    val purged = tagged.filter(col("__zone") === "embargo")
      .select(col("__e")).distinct().withColumn("__purge", lit(true))
    tagged.join(broadcast(purged), Seq("__e"), "left")
      .groupBy(col("__lbl").as(labelCol))
      .agg(
        sum(when(col("__zone") === "train", 1L).otherwise(0L))
          .as("n_train"),
        sum(when(col("__zone") === "embargo", 1L).otherwise(0L))
          .as("n_embargo"),
        sum(when(col("__zone") === "test" && col("__purge").isNull, 1L)
          .otherwise(0L)).as("n_test"),
        sum(when(col("__zone") === "test" && col("__purge").isNotNull, 1L)
          .otherwise(0L)).as("n_test_purged"),
        min(col("__t1")).as("t_cut"),
        min(col("__t2")).as("t_test_start"))
  }
}

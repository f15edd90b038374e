package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DecimalType, DoubleType,
  IntegerType, LongType, ShortType}

/** Derived statistics over aggregation results — the reference's library
  * layer (src/lib/stats.go). */
object Stats {

  /** Intra-class correlation via one-way ANOVA: MSB / (MSB + MSW) — the
    * definition at stats.go:5-9. Computed from EXACT per-group decimal sums
    * (not the reference's histogram approximation; its loop also adds the
    * cumulative variance once per group instead of the group's own,
    * stats.go:70-77 — we use the textbook sums of squares).
    *
    * Returns one row: (k, n, msb, msw, icc).
    */
  def icc(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    // every cross-row sum goes through DECIMAL so the result is independent
    // of partitioning/merge order (bit-identical across engines); the
    // native graft_dsum int128 path gives the identical double ~4x faster
    val dsum = call_function("graft_dsum", col(valueCol), lit(6))
    val dsumsq = call_function("graft_dsum", col(valueCol) * col(valueCol), lit(8))
    def dsum2(c: Column) = call_function("graft_dsum", c, lit(10))
    // null values would count in n_g but not the sums (see pearson)
    val g = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_g"), dsum.as("sum_g"), dsumsq.as("sumsq_g"))
    g.select(
        count(lit(1)).as("k"),
        sum(col("n_g")).as("n"),
        dsum2(col("sum_g")).as("sum_all"),
        // SSW = Σ_g (sumsq_g − sum_g²/n_g)
        dsum2(col("sumsq_g") - col("sum_g") * col("sum_g") / col("n_g")).as("ssw"),
        // Σ_g sum_g²/n_g, for SSB = that − sum_all²/n
        dsum2(col("sum_g") * col("sum_g") / col("n_g")).as("sum_sq_over_n"))
      .select(col("k"), col("n"),
        ((col("sum_sq_over_n") - col("sum_all") * col("sum_all") / col("n")) /
          (col("k") - 1)).as("msb"),
        (col("ssw") / (col("n") - col("k"))).as("msw"))
      // rounded outputs: the two decimal-cast paths (JVM shortest-repr vs
      // exact-binary) can differ at ~1e-13 relative; 6 decimals is the
      // portable precision
      .select(col("k"), col("n"), round(col("msb"), 6).as("msb"),
        round(col("msw"), 6).as("msw"),
        round(col("msb") / (col("msb") + col("msw")), 6).as("icc"))
  }

  /** Exact per-group Pearson correlation of two numeric columns. Built on
    * the same exact-decimal-sum discipline as [[icc]]: the five cross-row
    * sums (Σx, Σy, Σxy, Σx², Σy²) accumulate as DECIMAL (order-independent
    * under any partitioning), then the moment formula
    * `(n·Σxy − Σx·Σy) / (√(n·Σx² − Σx²) · √(n·Σy² − Σy²))` runs as a fixed
    * sequence of IEEE ops — reproducible bit-for-bit by a SQL oracle,
    * unlike built-in `corr` whose running double accumulation is
    * merge-order-dependent. One shuffle (the groupBy), partials combined
    * map-side. Outputs ROUND(·, 6): the per-value double→decimal rounding
    * can differ from an engine using exact binary scaling at ~1e-13
    * relative.
    */
  def pearson(df: DataFrame, groupCol: String, xCol: String, yCol: String,
      scale: Int = 6): DataFrame = {
    // graft_dsum == CAST(SUM(CAST(x AS DECIMAL(38,s))) AS DOUBLE) on an
    // int128 buffer — ~4x over Spark's BigDecimal-backed decimal sum
    def d(c: Column, s: Int) = call_function("graft_dsum", c, lit(s))
    val x = col(xCol).cast(DoubleType)
    val y = col(yCol).cast(DoubleType)
    // complete-case only: a null x or y would count in n but not in the
    // moments — the plausible-but-wrong-numerators hazard groupedTrend's
    // exact guard documents; the oracle states the same WHERE
    df.filter(x.isNotNull && y.isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        d(x, scale).as("sx"), d(y, scale).as("sy"),
        d(x * y, scale * 2).as("sxy"),
        d(x * x, scale * 2).as("sxx"), d(y * y, scale * 2).as("syy"))
      .select(col(groupCol), col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
            sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6)
          .as("corr_xy"))
  }

  /** Per-group ordinary-least-squares trend: `y = slope·x + intercept`
    * from the same exact-decimal moment discipline as [[pearson]] (Σx,
    * Σy, Σxy, Σx² accumulate as int128 decimals — order-independent —
    * then the closed form runs as a fixed IEEE sequence, ROUND-6). The
    * trend detector for metric drift: feed (time-bucket index, metric)
    * pairs per series. One shuffle, partials combine map-side.
    *
    * `exact = true` REQUIRES integer-valued `xCol`/`yCol` (scale-0 sums
    * would silently truncate fractions into wrong moments); the agg
    * carries a guard that fails the job if any value has a fractional
    * part, rather than returning plausible-but-wrong numerators.
    */
  def groupedTrend(df: DataFrame, groupCol: String, xCol: String,
      yCol: String, scale: Int = 6, exact: Boolean = false): DataFrame = {
    def d(c: Column, s: Int) = call_function("graft_dsum", c, lit(s))
    val x = col(xCol).cast(DoubleType)
    val y = col(yCol).cast(DoubleType)
    // exact mode: integer-valued series — scale-0 sums keep every moment's
    // RAW decimal inside double range, so the decimal→double cast is exact
    // in ANY engine (a scale-12 raw int128 is ~1e21: correctly-rounded
    // casts and raw/10^s casts then disagree at ~1e-11 relative, which
    // round-6 absorbs but exact integers must not see)
    val sc = if (exact) 0 else scale
    val sc2 = if (exact) 0 else scale * 2
    val aggs = Seq(
      d(x, sc).as("sx"), d(y, sc).as("sy"),
      d(x * y, sc2).as("sxy"), d(x * x, sc2).as("sxx")) ++
      // NULLs are violations too, not just fractions: `x =!= floor(x)`
      // is NULL for a NULL input and would slip to otherwise(0), yet
      // n = count(*) counts the row while the sums skip it — exactly the
      // plausible-but-wrong numerators the guard exists to prevent
      (if (exact) Seq(sum(when(x.isNull || y.isNull ||
        x =!= floor(x) || y =!= floor(y), 1L)
        .otherwise(0L)).as("__nonint"))
       else Nil)
    // non-exact mode drops incomplete pairs for the same n-vs-moments
    // consistency the exact guard enforces loudly
    val src = if (exact) df else df.filter(x.isNotNull && y.isNotNull)
    val m = src.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), aggs: _*)
    val slopeNum = col("n") * col("sxy") - col("sx") * col("sy")
    val interNum = col("sy") * col("sxx") - col("sx") * col("sxy")
    val denom = col("n") * col("sxx") - col("sx") * col("sx")
    // integer-input guard: assert_true is null on pass, so the coalesce
    // keeps it in the plan (an unused guard column would be pruned)
    val nGuarded =
      if (!exact) col("n")
      else coalesce(
        assert_true(col("__nonint") === 0, lit(
          s"groupedTrend(exact=true) requires non-null integer-valued " +
            s"$xCol/$yCol: scale-0 exact sums truncate fractions, and " +
            "null rows would count in n but not in the moments")).cast("long"),
        col("n")).as("n")
    if (exact)
      // integer-valued inputs make slope/intercept RATIONALS whose
      // terminating decimal expansions routinely END in a 5 — an exact
      // ROUND tie that Spark (decimal-string HALF_UP) and other engines
      // (scaled-double nearbyint) break differently. The tie-proof form
      // reports the exact numerators and denominator: no rounding
      // convention at all (every value is an exact integer in double
      // range), division deferred to the consumer.
      m.select(col(groupCol), nGuarded, slopeNum.as("slope_num"),
        interNum.as("intercept_num"), denom.as("denom"))
    else
      m.select(col(groupCol), col("n"),
        round(slopeNum / denom, 6).as("slope"),
        round(interNum / denom, 6).as("intercept"))
  }

  /** Full Pearson correlation MATRIX of `cols` in ONE scan: every per-
    * column sum/sumsq and every pairwise cross-sum lands in a single
    * `agg` (k + k + k(k-1)/2 exact int128 decimal sums — order-
    * independent), then each pair's coefficient is the fixed IEEE moment
    * formula. One pass over the data no matter how many columns; the
    * naive per-pair [[pearson]] loop would scan k(k-1)/2 times.
    *
    * Output: one row per unordered pair `(x, y, corr_xy)` with x < y by
    * column order, ROUND-6 (the [[icc]] convention).
    */
  def pearsonMatrix(df: DataFrame, cols: Seq[String], scale: Int = 6): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    def d(c: Column, s: Int) = call_function("graft_dsum", c, lit(s))
    def v(c: String) = col(c).cast(DoubleType)
    val aggs =
      Seq(count(lit(1)).as("n")) ++
      cols.map(c => d(v(c), scale).as(s"s_$c")) ++
      cols.map(c => d(v(c) * v(c), scale * 2).as(s"ss_$c")) ++
      cols.combinations(2).toSeq.map { case Seq(a, b) =>
        d(v(a) * v(b), scale * 2).as(s"sp_${a}_$b")
      }
    // listwise deletion: one shared n must match every pair's moments, so
    // a row with ANY null column drops entirely (the standard
    // complete-case correlation matrix); the oracle states the same WHERE
    val m = df.filter(cols.map(c => v(c).isNotNull).reduce(_ && _))
      .agg(aggs.head, aggs.tail: _*)
    // one exploded projection over the single agg row — the union-per-pair
    // alternative would plant k(k-1)/2 copies of the aggregation subtree
    val pairStructs = cols.combinations(2).toSeq.map { case Seq(a, b) =>
      struct(lit(a).as("x"), lit(b).as("y"),
        round((col("n") * col(s"sp_${a}_$b") - col(s"s_$a") * col(s"s_$b")) /
          (sqrt(col("n") * col(s"ss_$a") - col(s"s_$a") * col(s"s_$a")) *
            sqrt(col("n") * col(s"ss_$b") - col(s"s_$b") * col(s"s_$b"))),
          6).as("corr_xy"))
    }
    m.select(explode(array(pairStructs: _*)).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"), col("p.corr_xy").as("corr_xy"))
  }

  /** Key-distribution skew report — the diagnostic behind every "one hot
    * key serialized the stage" incident: row count, distinct keys, the
    * hottest key's count, and the share of rows held by the top-1 / top-k
    * keys. All metrics are exact integers plus single IEEE divisions
    * (bit-exact cross-engine; no entropy-style transcendental sums).
    *
    * Scale: the per-key count partial-aggregates map-side (the diagnosis
    * job itself cannot be serialized by the skew it measures); the top-k
    * is a TakeOrdered over the counts, never a global sort.
    *
    * Output: one row `(n_rows, n_keys, max_cnt, topk_cnt, top1_share,
    * topk_share)`.
    */
  def keySkew(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__c"))
    val totals = counts.agg(sum(col("__c")).as("n_rows"),
      count(lit(1)).as("n_keys"), max(col("__c")).as("max_cnt"))
    val topk = counts.orderBy(col("__c").desc, col(keyCol))
      .limit(k).agg(sum(col("__c")).as("topk_cnt"))
    totals.crossJoin(topk)
      .select(col("n_rows"), col("n_keys"), col("max_cnt"), col("topk_cnt"),
        (col("max_cnt").cast(DoubleType) / col("n_rows")).as("top1_share"),
        (col("topk_cnt").cast(DoubleType) / col("n_rows")).as("topk_share"))
  }

  /** Adds `__cum` (inclusive running sum of `__c` by `vCol` within each
    * group) and `__n` (group total) to a `(groupCol, vCol, __c)` rollup —
    * the shared engine under every exact quantile operator here.
    *
    * Two implementations, equal output (spec-proved), different scale
    * regimes — measured, not guessed:
    *
    *  - `distributed = false` (default): one `Window.partitionBy(group)`
    *    prefix sum. Each group's distinct values sort in ONE task — fine
    *    while distinct-values-per-group fit a task's sort budget (the
    *    usual case: the rollup has already collapsed raw rows), and it
    *    is 2× faster than the distributed form at sf0.1 because it runs
    *    half the stages.
    *  - `distributed = true`: the distributed prefix-sum — range-
    *    partition on (group, value) so every core owns a contiguous
    *    slice, cumulative-sum per slice, add per-slice offsets (an
    *    exclusive prefix over the |slices|·|groups|-row side table,
    *    broadcast back; the [[graft.operators.Ranking.globalRowNumber]]
    *    shape). The escape hatch when a group has ~10⁹ distinct values
    *    and the serial sort would be the straggler; costs ~2× in stage
    *    overhead at small scale, which is why it is not the default.
    */
  private[graft] def withGroupedCumSum(in: DataFrame, groupCol: String,
      vCol: String, distributed: Boolean = false): DataFrame =
    withGroupedCumSumResolved(in, groupCol, vCol, distributed)

  /** Bounded registry for the plan-cache entries the rollup probes create
    * ([[resolveCum]]'s shared-scan persist, [[madOutliers]]'s deviation
    * rollup). Identical plans dedup inside Spark's CacheManager, but
    * DISTINCT queries would otherwise accumulate MEMORY_AND_DISK entries
    * for the session's lifetime; this FIFO unpersists the oldest once
    * more than `spark.graft.cache.maxPlans` (default 8) are live.
    * Eviction is correctness-free — an evicted entry still referenced by
    * an unexecuted plan simply recomputes on use — and a re-registered
    * plan (same canonicalized form) refreshes its slot instead of
    * double-entering, so one hot query cannot evict itself.
    */
  /** Session-conf integer with a named-key error: a malformed value must
    * say WHICH conf key is bad, not surface as a bare
    * NumberFormatException from inside query construction.
    */
  private def confLong(conf: org.apache.spark.sql.RuntimeConfig,
      key: String, default: Long): Long =
    conf.getOption(key).map { v =>
      try v.trim.toLong
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"$key must be an integer, got '$v'")
      }
    }.getOrElse(default)

  private[graft] object PlanCache {
    private val live = scala.collection.mutable.ArrayDeque
      .empty[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, DataFrame)]
    private[graft] def size: Int = synchronized(live.size)
    def register(df: DataFrame): DataFrame = synchronized {
      // the registry is JVM-global; entries from a STOPPED context are
      // dead weight (their unpersist would throw assertNotStopped) and
      // are dropped first. Within a running context a plan-keyed hit is
      // correct across sessions too: the CacheManager lives in
      // SharedState, which every session of the context shares, so any
      // session's persist substitutes into any session's plan — keying
      // hits by session would create two registry entries aliasing ONE
      // cache entry, and evicting either would silently un-cache the
      // survivor
      live.filterInPlace(!_._2.sparkSession.sparkContext.isStopped)
      val key = df.queryExecution.logical.canonicalized
      val idx = live.indexWhere(_._1 == key)
      if (idx >= 0) {
        // already a live cache entry in THIS session: CacheManager
        // substitutes it into this plan at execution, no second persist
        val e = live.remove(idx); live.append(e); df
      } else {
        val cached = df.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        live.append((key, cached))
        val cap = confLong(df.sparkSession.conf,
          "spark.graft.cache.maxPlans", 8L).toInt
        while (live.size > cap) live.removeHead()._2.unpersist(blocking = false)
        cached
      }
    }
    /** Unpersist and forget every registered plan (r18, bench hygiene).
      *
      * The registry is JVM-global while `spark.catalog.clearCache()` is
      * not registry-aware: a bench that clearCache()s between queries
      * leaves `live` holding keys whose storage is GONE, and a later
      * query constructing the same canonicalized fragment hits the stale
      * key and silently runs UNPINNED (every consumer recomputes).
      * Resetting both together keeps registry and CacheManager in step;
      * it is also what makes a "whole query" timed execution honest —
      * pins re-materialize inside the timed window exactly once.
      */
    private[graft] def reset(): Unit = synchronized {
      live.foreach { case (_, df) =>
        try {
          if (!df.sparkSession.sparkContext.isStopped)
            df.unpersist(blocking = false)
        } catch { case _: Throwable => () }
      }
      live.clear()
    }
  }

  /** Auto-selection for the serial-vs-distributed cumulative sum
    * (the sybil analog: bucket-vs-flat encoding picked by cardinality,
    * column_store_io.go:17-38). `choice = None` probes the rollup's max
    * distinct-values-per-group and flips to the distributed prefix-sum
    * above `spark.graft.cum.serialMaxDistinct` (default 4M ≈ a task's
    * comfortable sort budget); the rollup is persisted first so the
    * probe job and the query share one scan (for [[madOutliers]] the
    * persist additionally collapses its two serial rollup consumers onto
    * one materialization). An explicit `Some(…)` skips the probe job —
    * the right call when the caller knows the regime (catalog entries,
    * 100 TB jobs that cannot afford a probe pass).
    *
    * Returns the (possibly persisted) rollup and the resolved flag.
    */
  private[graft] def resolveCum(rollup: DataFrame, groupCol: String,
      choice: Option[Boolean]): (DataFrame, Boolean) = choice match {
    case Some(d) => (rollup, d)
    case None =>
      val conf = rollup.sparkSession.conf
      // the probe is two extra scheduled jobs (persist + max-distinct);
      // below ~8 MB of source input the serial window cannot be the
      // straggler anyway and the fixed overhead would triple a
      // sub-second query, so tiny inputs skip straight to serial.
      // Driver-side plan arithmetic — leaf stats are file sizes.
      val probeMin = confLong(conf,
        "spark.graft.cum.probeMinInputBytes", 8L * 1024 * 1024)
      // RDD/LocalRelation-backed leaves report the defaultSizeInBytes
      // SENTINEL (conf default Long.MaxValue), not a measurement — a tiny
      // in-memory frame would look huge and pay the probe jobs the
      // heuristic exists to avoid. Unknown size ⇒ serial without probing:
      // the auto path is sized for file-backed tables, whose leaves carry
      // real file sizes.
      val sentinel = BigInt(
        rollup.sparkSession.sessionState.conf.defaultSizeInBytes)
      val leafSizes = rollup.queryExecution.optimizedPlan.collectLeaves()
        .map(_.stats.sizeInBytes)
      if (leafSizes.contains(sentinel)) return (rollup, false)
      if (leafSizes.sum < BigInt(probeMin)) return (rollup, false)
      val threshold = confLong(conf,
        "spark.graft.cum.serialMaxDistinct", 4000000L)
      // MEMORY_AND_DISK via the bounded [[PlanCache]]: identical plans
      // dedup in the CacheManager, distinct ones rotate out FIFO
      val cached = PlanCache.register(rollup)
      val maxDistinct = cached.groupBy(col(groupCol))
        .agg(count(lit(1)).as("__d")).agg(max(col("__d"))).collect()
        .headOption.flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long]))
        .getOrElse(0L)
      (cached, maxDistinct > threshold)
  }

  private def withGroupedCumSumResolved(in: DataFrame, groupCol: String,
      vCol: String, distributed: Boolean): DataFrame =
    withGroupedCumSumsResolved(in, groupCol, vCol, Seq("__c"), distributed)
      .withColumnRenamed("__cum___c", "__cum")
      .withColumnRenamed("__tot___c", "__n")

  /** Multi-measure form of the grouped cumulative sum: one value sort per
    * group yields, for EVERY measure column `m`, the inclusive prefix sum
    * `__cum_<m>` and the group total `__tot_<m>`. All measures share the
    * single window (serial) or the single range-partition + offset
    * broadcast (distributed) — k measures cost one extra running adder
    * each, never a second sort or shuffle. Callers needing several
    * aligned prefix sums (Gini needs the running count AND the running
    * value mass) use this instead of stacking two single-measure passes.
    */
  private def withGroupedCumSumsResolved(in: DataFrame, groupCol: String,
      vCol: String, measures: Seq[String], distributed: Boolean,
      asc: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // one sort direction everywhere: the serial window, the range
    // partitioner, and the per-partition window must agree or the
    // distributed offsets would not be prefix sums of the same order
    val ord = if (asc) col(vCol).asc else col(vCol).desc
    if (!distributed) {
      val w = Window.partitionBy(col(groupCol)).orderBy(ord)
        .rowsBetween(Window.unboundedPreceding, 0)
      val wTot = Window.partitionBy(col(groupCol))
      return measures.foldLeft(in)((d, m) => d
        .withColumn(s"__cum_$m", sum(col(m)).over(w))
        .withColumn(s"__tot_$m", sum(col(m)).over(wTot)))
    }
    // checkpoint pins the sampled range boundaries for both consumers
    // (offsets + output) — see Ranking.globalRowNumber; reliable under
    // spark.graft.checkpointDir (Checkpoints.pin)
    val ranged = Checkpoints.pin(
      in.repartitionByRange(col(groupCol), ord)
        .withColumn("__pid", spark_partition_id()))
    val wLocal = Window.partitionBy(col("__pid"), col(groupCol))
      .orderBy(ord).rowsBetween(Window.unboundedPreceding, 0)
    val local = measures.foldLeft(ranged)((d, m) =>
      d.withColumn(s"__lcum_$m", sum(col(m)).over(wLocal)))
    val pcs = measures.map(m => sum(col(m)).as(s"__pc_$m"))
    val parts = ranged.groupBy(col("__pid"), col(groupCol))
      .agg(pcs.head, pcs.tail: _*)
    val wOff = Window.partitionBy(col(groupCol)).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(col(groupCol))
    val offs = measures.foldLeft(parts)((d, m) => d
      .withColumn(s"__off_$m",
        coalesce(sum(col(s"__pc_$m")).over(wOff), lit(0).cast(
          d.schema(s"__pc_$m").dataType)))
      .withColumn(s"__tot_$m", sum(col(s"__pc_$m")).over(wTot)))
      .select(col("__pid") +: col(groupCol) +:
        measures.flatMap(m => Seq(col(s"__off_$m"), col(s"__tot_$m"))): _*)
    val joined = local.join(broadcast(offs), Seq("__pid", groupCol))
    measures.foldLeft(joined)((d, m) =>
        d.withColumn(s"__cum_$m", col(s"__lcum_$m") + col(s"__off_$m")))
      .drop("__pid" +: measures.flatMap(m =>
        Seq(s"__lcum_$m", s"__off_$m")): _*)
  }

  /** Ungrouped DESCENDING cumulative sums over a rollup — the shape behind
    * "from the top score down" cuts ([[graft.operators.Curation
    * .exactScoreBands]], [[graft.operators.Curation.tokenBudgetThreshold]]):
    * for each measure `m`, the inclusive prefix sum `__cum_<m>` walking
    * `vCol` highest-first, plus the total `__tot_<m>`. `choice = None`
    * auto-probes cardinality via [[resolveCum]]: an integer-score rollup
    * (thousands of rows) takes the serial window, a continuous-score
    * rollup (≈ row count) takes the range-partitioned distributed prefix
    * sum — the latter is what keeps a 100 TB quality-score sweep off a
    * single sort task. Returns the (possibly cached) frame and the
    * resolved flag so the caller can match its join strategy to the
    * regime. */
  private[graft] def resolvedCumSumsDesc(rollup: DataFrame, vCol: String,
      measures: Seq[String], choice: Option[Boolean]): (DataFrame, Boolean) = {
    val withG = rollup.withColumn("__cg", lit(1))
    val (g, dist) = resolveCum(withG, "__cg", choice)
    (withGroupedCumSumsResolved(g, "__cg", vCol, measures, dist, asc = false)
      .drop("__cg"), dist)
  }

  /** Exact per-group WEIGHTED lower median: the smallest value whose
    * cumulative weight reaches half the group's total — [[groupedMedian]]
    * with integer weights (a row counting `w` times). Same distinct-value
    * -window shape: the window runs over distinct (group, value) pairs
    * after a partial-aggregated weight rollup, never over raw rows.
    */
  /** Distinct-(group, value) rollup with weights — the quantile family's
    * shared input, with NULL VALUES EXCLUDED: a null value row would
    * otherwise enter the cum window as the smallest value (Spark sorts
    * nulls first), shifting every crossing, and engines disagree on null
    * sort order (the [[ksDrift]] note) so results would also diverge
    * cross-engine. The family's semantics are therefore "over non-null
    * values" — matching both engines' own median/quantile builtins. */
  private def valueRollup(df: DataFrame, groupCol: String,
      valueCol: String, weight: Column): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol))
      .agg(sum(weight).as("__c"))

  def groupedWeightedMedian(df: DataFrame, groupCol: String, valueCol: String,
      weightCol: String, distributedCum: Option[Boolean] = None): DataFrame = {
    // integer-VALUED weights only: the long cast would silently truncate
    // fractional weights (normalized doubles in (0,1) all become 0 and
    // the "median" degenerates to the group min). The weight column's
    // TYPE may be floating (TPC-H quantities are integral doubles), so
    // the guard is groupedTrend's runtime assert: violations ride the
    // rollup as a second cum measure whose per-group TOTAL reaches every
    // surviving row, and the job fails loudly instead of reporting a
    // plausible wrong median.
    df.schema(weightCol).dataType match {
      case _: org.apache.spark.sql.types.NumericType => ()
      case other => throw new IllegalArgumentException(
        s"groupedWeightedMedian requires a numeric weight column; " +
          s"$weightCol is $other")
    }
    val w = col(weightCol)
    val rollup = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol))
      .agg(sum(w.cast("long")).as("__c"),
        sum(when(w.isNull ||
            w.cast(DoubleType) =!= floor(w.cast(DoubleType)), 1L)
          .otherwise(0L)).as("__bad"))
    val (g, dist) = resolveCum(rollup, groupCol, distributedCum)
    withGroupedCumSumsResolved(g, groupCol, valueCol, Seq("__c", "__bad"),
        dist)
      .filter(col("__cum___c") * 2 >= col("__tot___c"))
      .groupBy(col(groupCol))
      .agg(
        coalesce(assert_true(max(col("__tot___bad")) === 0, lit(
            s"groupedWeightedMedian requires non-null integer-valued " +
              s"$weightCol: the long cast would truncate fractions"))
            .cast("long"),
          max(col("__tot___c"))).as("total_weight"),
        min(col(valueCol)).as("median"))
  }

  /** Exact per-group lower median of an integer-valued column — the
    * smallest value `v` in the group with `2·|{x ≤ v}| ≥ n`. No
    * interpolation (so no cross-engine float risk) and no per-row window:
    * the cumulative count runs over DISTINCT (group, value) pairs (the
    * same distinct-value-window trick as
    * [[graft.operators.Curation.exactScoreBands]]), then one
    * partial-aggregatable `min` picks the crossing value. Two shuffles,
    * both keyed on the group; value-skew is absorbed by the pre-aggregate.
    */
  def groupedMedian(df: DataFrame, groupCol: String, valueCol: String,
      distributedCum: Option[Boolean] = None): DataFrame = {
    val (g, dist) = resolveCum(
      valueRollup(df, groupCol, valueCol, lit(1L)),
      groupCol, distributedCum)
    withGroupedCumSum(g, groupCol, valueCol, dist)
      .filter(col("__cum") * 2 >= col("__n"))
      .groupBy(col(groupCol))
      .agg(max(col("__n")).as("n"), min(col(valueCol)).as("median"))
  }

  /** Robust per-group outlier report via MAD (median absolute deviation):
    * `(group, n, median, mad, n_outliers)` where a row is an outlier iff
    * `|x − median| > k · mad`. Both medians are LOWER medians (the
    * [[groupedMedian]] crossing rule) so every output is either a data
    * value or one exact subtraction — no interpolation, no cross-engine
    * float drift, no rounding convention needed.
    *
    * Scale shape: the raw data is scanned ONCE, into a partial-aggregated
    * `(group, value, count)` rollup; everything downstream — both
    * weighted lower medians (the distinct-value-window trick) and the
    * outlier count — runs over distinct values only, so value skew
    * collapses map-side and a 10^12-row group with 10^6 distinct values
    * costs 10^6 window rows. The per-group median/MAD tables are
    * |groups| rows, pinned back with broadcast joins.
    */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      k: Double = 3.0, distributedCum: Option[Boolean] = None): DataFrame = {
    // the rollup feeds BOTH lower medians and the outlier count, so it
    // is always PlanCache-registered — on the auto path resolveCum
    // already did it (register is idempotent on the canonicalized plan);
    // with an explicit Some(…) regime this is the only persist, and
    // skipping it would re-scan the raw data once per consumer
    val (g0, dist) = resolveCum(
      valueRollup(df, groupCol, valueCol, lit(1L)),
      groupCol, distributedCum)
    val g = PlanCache.register(g0)
    // in: (groupCol, vCol, "__c") pre-counted; weighted lower median per group
    def lowerMedian(in: DataFrame, vCol: String, out: String): DataFrame =
      withGroupedCumSum(in, groupCol, vCol, dist)
        .filter(col("__cum") * 2 >= col("__n"))
        .groupBy(col(groupCol))
        .agg(min(col(vCol)).as(out))
    val med = lowerMedian(g, valueCol, "median")
    // deviations of DISTINCT values, re-merged (v and 2·med−v collide);
    // cached like g — it too has two consumers (mad + final agg), is
    // bounded by the distinct-value count, and rotates out of the
    // bounded [[PlanCache]] instead of leaking per query
    val devG = PlanCache.register(g.join(broadcast(med), groupCol)
      .select(col(groupCol), abs(col(valueCol) - col("median")).as("__dev"),
        col("median"), col("__c"))
      .groupBy(col(groupCol), col("__dev"))
      .agg(max(col("median")).as("median"), sum(col("__c")).as("__c")))
    val mad = lowerMedian(devG, "__dev", "mad")
    devG.join(broadcast(mad), groupCol)
      .groupBy(col(groupCol))
      .agg(sum(col("__c")).as("n"), max(col("median")).as("median"),
        max(col("mad")).as("mad"),
        sum(when(col("__dev") > lit(k) * col("mad"), col("__c"))
          .otherwise(0L)).as("n_outliers"))
  }

  /** Exact per-group LOWER quantiles, several at once in one pass: for
    * each `(name, num, den)` the smallest value whose cumulative count
    * reaches `⌈n·num/den⌉`. The crossing test is pure integer arithmetic
    * (`cum·den ≥ n·num` ⟺ `cum ≥ ⌈n·num/den⌉`) and every output is a
    * data value — no interpolation, engine-exact, the multi-quantile
    * generalization of [[groupedMedian]].
    *
    * One distinct-value rollup, ONE cumulative window, one final groupBy
    * computing all quantiles as conditional mins — adding a quantile
    * adds an aggregate expression, not a pass.
    */
  def lowerQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[(String, Int, Int)],
      distributedCum: Option[Boolean] = None): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, n, d) => n >= 0 && n <= d && d > 0 },
      "quantiles must be fractions in [0, 1]")
    val (g, dist) = resolveCum(
      valueRollup(df, groupCol, valueCol, lit(1L)),
      groupCol, distributedCum)
    val cum = withGroupedCumSum(g, groupCol, valueCol, dist)
    val aggs = qs.map { case (name, num, den) =>
      min(when(col("__cum") * den >= col("__n") * num, col(valueCol))).as(name)
    }
    cum.groupBy(col(groupCol))
      .agg(max(col("__n")).as("n"), aggs: _*)
  }

  /** Exact per-group quantile normalization: the empirical CDF table
    * `(group, v, n_le, n, ecdf = n_le/n)` over DISTINCT values — the
    * map that sends a raw score to its uniform-[0,1] quantile position.
    * The cross-corpus mixing tool: two sources' quality scores live on
    * incomparable scales, their ECDFs don't ("keep the top 20%" means
    * the same thing everywhere). Joining this table back on
    * `(group, v)` (broadcast at distinct-value scale) normalizes the
    * corpus; the table itself is the deliverable here.
    *
    * Same machinery as the rest of the exact quantile family: one
    * distinct-value rollup, one cumulative sum over it (serial window or
    * distributed prefix-sum, auto-selected by [[resolveCum]]), one IEEE
    * division per distinct value.
    */
  def quantileNormalize(df: DataFrame, groupCol: String, valueCol: String,
      distributedCum: Option[Boolean] = None): DataFrame = {
    val (g, dist) = resolveCum(
      valueRollup(df, groupCol, valueCol, lit(1L)),
      groupCol, distributedCum)
    withGroupedCumSum(g, groupCol, valueCol, dist)
      .select(col(groupCol), col(valueCol),
        col("__cum").as("n_le"), col("__n").as("n"),
        (col("__cum").cast("double") / col("__n").cast("double")).as("ecdf"))
  }

  /** Rank-biased overlap (Webber et al., TOIS 2010) at depth `k` with
    * persistence `p = 1/2` between two rankings of the same table —
    * "do these two curation policies keep the same documents?", weighted
    * toward the top where it matters. `RBO@k = (1−p)·Σ_{d=1..k}
    * p^{d−1}·|A∩B|@d / d`; with `p = 1/2` every weight is a power of
    * two, and each id's total contribution collapses to a PRECOMPUTED
    * constant `C[m] = Σ_{d=m..k} 2^{−(d−1)}/d` indexed by
    * `m = max(rank_A, rank_B)` — the constants are embedded as literals
    * (summed at build time, highest depth first) so both engines read
    * identical doubles and the only runtime float work is one decimal
    * accumulation and one multiply. Also reports the plain overlap@k.
    *
    * Scale: each ranking is a bounded `TakeOrdered` top-k (never a
    * global sort); ranks attach with a k-row window; the join and sum
    * run over ≤ 2k rows. Output: one row `(rbo, overlap_at_k, k)`.
    */
  def rankBiasedOverlap(df: DataFrame, idCol: String, scoreA: Column,
      scoreB: Column, k: Int = 50): DataFrame = {
    require(k >= 1, "rankBiasedOverlap: k must be >= 1")
    import org.apache.spark.sql.expressions.Window
    // C[m] = sum_{d=m..k} 2^-(d-1)/d, accumulated from depth k upward
    val c = new Array[Double](k + 1)
    for (m <- k to 1 by -1)
      c(m) = c.lift(m + 1).getOrElse(0.0) + math.pow(2.0, -(m - 1)) / m
    val cArr = array((1 to k).map(m => lit(c(m))): _*)
    def top(score: Column, rk: String) =
      df.select(col(idCol), score.as("__s"))
        .orderBy(col("__s").desc, col(idCol).asc).limit(k)
        .select(col(idCol), row_number().over(
          Window.orderBy(col("__s").desc, col(idCol).asc)).as(rk))
    top(scoreA, "__ra").join(top(scoreB, "__rb"), idCol)
      .select(greatest(col("__ra"), col("__rb")).as("__m"))
      .agg(
        call_function("graft_dsum",
          element_at(cArr, col("__m")), lit(12)).as("__sum"),
        count(lit(1)).as("overlap_at_k"))
      .select(
        round(lit(0.5) * coalesce(col("__sum"), lit(0.0)), 9).as("rbo"),
        col("overlap_at_k"), lit(k.toLong).as("k"))
  }

  /** Winsorized per-group summary: clip values to the exact lower
    * [lo, hi] quantiles (default p05/p95) and report both the raw and
    * winsorized means — the standard tail-robust mean for metrics with
    * heavy outliers. Means are exact-decimal sums over the clipped /
    * raw values divided by the count (the engine's bit-exact double-sum
    * convention); the quantile thresholds join back as a broadcast of
    * |groups| rows.
    */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
      loNum: Int = 5, hiNum: Int = 95, den: Int = 100,
      distributedCum: Option[Boolean] = None): DataFrame = {
    val th = lowerQuantiles(df, groupCol, valueCol,
      Seq(("p_lo", loNum, den), ("p_hi", hiNum, den)), distributedCum)
    def dsum(c: Column) = call_function("graft_dsum", c, lit(4))
    // same non-null population as the quantile thresholds (valueRollup):
    // null rows would count in n but not in either decimal mean
    df.filter(col(valueCol).isNotNull)
      .join(broadcast(th), groupCol)
      .withColumn("__clip",
        least(greatest(col(valueCol), col("p_lo")), col("p_hi")))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), max(col("p_lo")).as("p_lo"),
        max(col("p_hi")).as("p_hi"),
        (dsum(col(valueCol)) / count(lit(1))).as("raw_mean"),
        (dsum(col("__clip")) / count(lit(1))).as("winsorized_mean"))
  }

  /** Exact equi-DEPTH histogram: `buckets` buckets with (near-)equal row
    * counts per group; each row reports the bucket's upper edge (a data
    * value) and its exact count. A distinct value lands in the bucket
    * where its mass STARTS — `⌊cum_before·B/n⌋ + 1` — so a dominant tie
    * sits in the bucket its rank reaches, and the buckets it overflows
    * through are simply absent (the honest answer for discrete data; an
    * end-based `⌈cum·B/n⌉` rule would shove the smallest heavy value
    * into the LAST bucket). The complement of the equal-WIDTH
    * `BasicHist`: width adapts, depth stays constant.
    *
    * Same scale shape as [[lowerQuantiles]]: rollup → one distinct-value
    * window → one groupBy; raw-row skew never reaches the window.
    */
  def equidepthHist(df: DataFrame, groupCol: String, valueCol: String,
      buckets: Int = 8, distributedCum: Option[Boolean] = None): DataFrame = {
    require(buckets >= 1, "equidepthHist: buckets must be >= 1")
    val (g, dist) = resolveCum(
      valueRollup(df, groupCol, valueCol, lit(1L)),
      groupCol, distributedCum)
    withGroupedCumSum(g, groupCol, valueCol, dist)
      .withColumn("bucket",
        expr(s"((__cum - __c) * $buckets) DIV __n + 1"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col(valueCol)).as("hi_edge"), sum(col("__c")).as("cnt"))
  }

  /** Exact per-group Gini coefficient of a non-negative integer-valued
    * column — the standard concentration readout for a training corpus
    * (how unevenly document length / token mass is spread within each
    * source). Uses the pairwise-difference identity
    * `Gini = Σ_{i<j}(x_j − x_i) / (n · Σx)`: for each DISTINCT value v
    * with multiplicity c, the pairs it closes contribute
    * `c · (v·N_<v − S_<v)` where `N_<v`/`S_<v` are the count and sum of
    * strictly smaller values — so the whole statistic is one
    * distinct-value rollup, ONE value sort per group producing the two
    * aligned prefix sums ([[withGroupedCumSumsResolved]]), and a
    * partial-aggregatable finish. Same scale shape as [[groupedMedian]]:
    * a 10^12-row group with 10^6 distinct values costs 10^6 window rows.
    *
    * Every intermediate is exact integer arithmetic in decimal(38,0)
    * (int128-class, same headroom as the oracle's HUGEINT); the ONLY
    * float step is the final division of two exact integers — both
    * correctly rounded to double on both engines, hence bit-identical.
    * Output: `(group, n, total, gini)`; degenerate groups (n ≤ 1 or
    * zero mass) report 0.0.
    */
  def groupedGini(df: DataFrame, groupCol: String, valueCol: String,
      distributedCum: Option[Boolean] = None): DataFrame = {
    // the decimal(38,0) mass sums TRUNCATE fractional inputs — the same
    // silently-wrong-numerators trap groupedTrend's exact mode guards
    // against at runtime; here the value type is known at plan time, so
    // reject non-integral columns before any job runs
    df.schema(valueCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case d: DecimalType if d.scale == 0 => ()
      case other => throw new IllegalArgumentException(
        s"groupedGini requires an integer-valued column; $valueCol is " +
          s"$other (exact decimal(38,0) mass sums would truncate fractions)")
    }
    val dec = "decimal(38,0)"
    // deliberately NOT the null-dropping valueRollup: Gini over a
    // partial population is a DIFFERENT statistic (n changes the
    // denominator), so nulls must reach the loud runtime guard below
    // rather than silently shrinking the population
    val (g, dist) = resolveCum(
      df.groupBy(col(groupCol), col(valueCol)).agg(count(lit(1)).as("__c")),
      groupCol, distributedCum)
    val g2 = g.withColumn("__w",
      col("__c").cast(dec) * col(valueCol).cast(dec))
    val cum = withGroupedCumSumsResolved(g2, groupCol, valueCol,
      Seq("__c", "__w"), dist)
    // inclusive prefix − own contribution = strictly-below prefix
    val contrib = col("__c").cast(dec) *
      (col(valueCol).cast(dec) *
        (col("__cum___c") - col("__c")).cast(dec) -
        (col("__cum___w") - col("__w")))
    // `n`/`total` report as long: the OUTPUT envelope is Σx < 2^63 (the
    // gini itself is int128 throughout). The identity additionally
    // requires non-negative values — with mixed signs Σx stops being a
    // scale and the coefficient is meaningless — and sign is a data
    // property, so it is checked at runtime on the |groups| finish rows
    // (same loud-failure pattern as groupedTrend's exact mode).
    // null rollup rows need their own counter: min() skips NULLs, so a
    // group mixing NULL and non-negative values would pass a vmin-only
    // check while its nulls count in n but drop out of the moments
    cum.groupBy(col(groupCol))
      .agg(sum(contrib).as("__num"),
        max(col("__tot___c")).as("__n"), max(col("__tot___w")).as("__s"),
        min(col(valueCol)).as("__vmin"),
        sum(when(col(valueCol).isNull, col("__c")).otherwise(0L))
          .as("__nnull"))
      .select(col(groupCol),
        coalesce(
          assert_true(col("__nnull") === 0 &&
            col("__vmin").isNotNull && col("__vmin") >= 0, lit(
            s"groupedGini requires non-null non-negative $valueCol: " +
              "null rows would count in n but not in the moments, and " +
              "with mixed signs the pairwise-difference identity no " +
              "longer yields a concentration coefficient")).cast("long"),
          col("__n").cast("long")).as("n"),
        col("__s").cast("long").as("total"),
        when(col("__n") > 1 && col("__s") > 0,
          col("__num").cast("double") /
            (col("__n").cast(dec) * col("__s")).cast("double"))
          .otherwise(lit(0.0)).as("gini"))
  }

  /** Exact per-group ROC AUC of a score against a boolean label — the
    * filter-calibration readout: how well does a heuristic quality score
    * actually separate the positive class before you commit it as a
    * corpus filter. Computed as the tie-corrected Mann–Whitney rank-sum:
    * rows at DISTINCT score v (cnt rows, p positive) share the average
    * rank `below + (cnt+1)/2`, so the doubled positive rank-sum is
    * `Σ p·(2·below + cnt + 1)` and
    * `AUC = (2·R_P − n_P(n_P+1)) / (2·n_P·n_N)` — ties contribute the
    * standard ½ credit with NO floats: every intermediate is exact
    * integer in decimal(38,0), and the only IEEE step is the final
    * division of two exact integers (bit-identical cross-engine). Unlike
    * [[groupedGini]] the score's TYPE is unconstrained (ranks only use
    * order, never value mass): doubles rank fine.
    *
    * Output: `(group, n_pos, n_neg, auc)`; a single-class group has no
    * ranking to measure and reports null. Null scores/labels fail loudly
    * (a null would take a rank but drop out of the classes — the same
    * count-vs-moment mismatch groupedGini guards against).
    *
    * Scale shape: the [[groupedMedian]] family's — distinct-value rollup,
    * ONE value-ordered prefix sum per group ([[resolveCum]] auto-selects
    * the distributed form past the probe threshold), partial-aggregatable
    * finish. A 10^12-row group with 10^6 distinct scores costs 10^6
    * window rows.
    */
  def groupedAuc(df: DataFrame, groupCol: String, scoreCol: String,
      labelCol: Column,
      distributedCum: Option[Boolean] = None): DataFrame = {
    val dec = "decimal(38,0)"
    val (g, dist) = resolveCum(
      df.groupBy(col(groupCol), col(scoreCol)).agg(
        count(lit(1)).as("__c"),
        sum(when(labelCol, 1L).otherwise(0L)).as("__p"),
        sum(when(!labelCol, 1L).otherwise(0L)).as("__l0")),
      groupCol, distributedCum)
    val cum = withGroupedCumSumsResolved(g, groupCol, scoreCol,
      Seq("__c"), dist)
    // doubled average-rank contribution of this distinct score's positives
    val contrib = col("__p").cast(dec) *
      (lit(2).cast(dec) * (col("__cum___c") - col("__c")).cast(dec) +
        col("__c").cast(dec) + lit(1).cast(dec))
    cum.groupBy(col(groupCol))
      .agg(sum(contrib).as("__r2"),
        sum(col("__p")).as("__np"), sum(col("__l0")).as("__nn"),
        sum(col("__c")).as("__call"),
        sum(when(col(scoreCol).isNull, col("__c")).otherwise(0L))
          .as("__nullscore"))
      .select(col(groupCol),
        coalesce(
          assert_true(col("__nullscore") === 0 &&
            col("__np") + col("__nn") === col("__call"), lit(
            "groupedAuc requires non-null scores and labels: a null " +
              "would take a rank but belong to neither class")).cast("long"),
          col("__np").cast("long")).as("n_pos"),
        col("__nn").cast("long").as("n_neg"),
        when(col("__np") > 0 && col("__nn") > 0,
          (col("__r2") - col("__np").cast(dec) *
            (col("__np").cast(dec) + lit(1).cast(dec))).cast("double") /
            (lit(2).cast(dec) * col("__np").cast(dec) *
              col("__nn").cast(dec)).cast("double"))
          .otherwise(lit(null).cast("double")).as("auc"))
  }

  /** Deterministic Poisson bootstrap of a mean (Chamandy et al.,
    * "Estimating Uncertainty for Massive Data Streams", Google 2012; the
    * resampling scheme that works when rows live on a thousand
    * executors): every (row, replicate) pair draws a Poisson(1)-ish
    * count from the salted md5 bucket of the ROW ID — membership is a
    * pure function of the row, so the same replicates replay
    * bit-identically in any engine, any partitioning, any run — and each
    * replicate's mean is Σc·v / Σc. The spread of the `reps` means IS
    * the sampling distribution: read the CI off the sorted replicate
    * table. The Poisson pmf is pinned as integer 16-bit thresholds
    * (`round(CDF(k)·65536)` = 24109/48219/60273/64292/65296, tail capped
    * at 5 draws — E[c] ≈ 0.9997); no transcendentals anywhere, the only
    * float is each replicate's one final division of exact integer sums.
    *
    * Output: `(rep, n_drawn, mean)`, one row per replicate; an empty
    * replicate (possible only on tiny inputs) reports null.
    *
    * Scale shape: the replicate fan-out is a scan-side explode (rows ×
    * reps, generated map-side, no shuffle) feeding ONE partial-aggregated
    * groupBy on the uniform `rep` key — the classic Poisson-bootstrap
    * trade: reps× scan work buys a full sampling distribution in one
    * pass with |reps| rows of state. The dominant cost is hashing, so
    * draws are BATCHED through the native `graft_boot_counts`
    * expression: each md5 of `(salt|id#chunk)` yields eight independent
    * 16-bit buckets consumed directly as digest bytes — 8× fewer
    * digests than one-per-(row, replicate) and zero per-replicate
    * string slicing (measured 15.5 s → 8.6 s → 3.3 s at sf0.1 /
    * 40 reps for naive → hex-chunked → native). The explode that
    * remains fans out a plain int array; everything downstream is
    * codegen arithmetic. Long sums are exact to 2^63 (cents × corpus
    * ≈ 10^13 at sf0.1; switch the accumulator to decimal via
    * `graft_dsum` past ~10^17).
    */
  def bootstrapMeans(df: DataFrame, idCol: Column, valueCol: Column,
      reps: Int = 40, salt: String = "boot"): DataFrame = {
    require(reps >= 1, "bootstrapMeans: need at least one replicate")
    // same two scale measures as [[bootstrapGroupMeans]]: spread a
    // narrow scan (one row group serializes the md5-bound draws) and
    // keep the replicate counters vectorized through graft_vecsum
    // instead of exploding reps rows per input row.
    // Null values (or values whose long cast fails) are excluded from
    // the resample entirely — they contribute to neither n_drawn nor the
    // sums, so the output is the bootstrap of the non-null population; a
    // null element reaching graft_vecsum would otherwise abort the query.
    val src = df.select(valueCol.cast(LongType).as("__v"),
      idCol.cast("string").as("__id"))
      .filter(col("__v").isNotNull)
    val cores = df.sparkSession.sparkContext.defaultParallelism
    val spread = if (src.rdd.getNumPartitions * 2 < cores)
      src.repartition(cores) else src
    spread.select(col("__v"),
        call_function("graft_boot_counts", col("__id"),
          lit(salt), lit(reps)).as("__cs"))
      .agg(call_function("graft_vecsum", col("__cs")).as("__ns"),
        call_function("graft_vecsum",
          expr("transform(__cs, c -> CAST(c AS BIGINT) * __v)")).as("__svs"))
      .select(posexplode(expr("arrays_zip(__ns, __svs)")).as(Seq("rep", "__z")))
      .select(col("rep"), col("__z.__ns").as("n_drawn"),
        when(col("__z.__ns") > 0,
          col("__z.__svs").cast("double") / col("__z.__ns").cast("double"))
          .otherwise(lit(null).cast("double")).as("mean"))
  }

  /** Per-group [[bootstrapMeans]]: one replicate table per group key, in
    * the same single pass — the groupBy key is `(group, rep)` instead of
    * `rep`, everything else is identical (and identically exact). Output:
    * `(group, rep, n_drawn, mean)`.
    *
    * Scale: |groups|·reps result rows; the fan-out is still scan-side
    * and the single shuffle partial-aggregates map-side on a key whose
    * cardinality is groups×reps — the cheap direction of the bootstrap
    * at any corpus size.
    */
  def bootstrapGroupMeans(df: DataFrame, groupCol: Column, idCol: Column,
      valueCol: Column, reps: Int = 40, salt: String = "boot"): DataFrame = {
    require(reps >= 1, "bootstrapGroupMeans: need at least one replicate")
    // the k replicate counters stay INSIDE their row: graft_vecsum adds
    // the count vector and the value-weighted vector elementwise per
    // group (map-side combine applies), and the per-replicate fan-out
    // happens after aggregation on |groups| rows — the explode-then-
    // group formulation pushed reps·rows in-flight rows (24M at sf0.1)
    // through the hash aggregate for what is a vector add
    // the draws are CPU-bound (reps/8 md5 digests per row) and computed
    // scan-side; a narrow input — one small file is ONE row group, and
    // parquet cannot split below a row group — would serialize them into
    // a single task. Spread to the session's parallelism first when the
    // scan is narrower than half the cores; at real scale inputs carry
    // thousands of row groups and the floor never triggers.
    // null/uncastable values excluded as in [[bootstrapMeans]] — the
    // per-group resample covers the non-null population only
    val src = df.select(groupCol.as("grp"), valueCol.cast(LongType).as("__v"),
      idCol.cast("string").as("__id"))
      .filter(col("__v").isNotNull)
    val cores = df.sparkSession.sparkContext.defaultParallelism
    val spread = if (src.rdd.getNumPartitions * 2 < cores)
      src.repartition(cores) else src
    spread.select(col("grp"), col("__v"),
        call_function("graft_boot_counts", col("__id"),
          lit(salt), lit(reps)).as("__cs"))
      .groupBy(col("grp"))
      .agg(call_function("graft_vecsum", col("__cs")).as("__ns"),
        call_function("graft_vecsum",
          expr("transform(__cs, c -> CAST(c AS BIGINT) * __v)")).as("__svs"))
      .select(col("grp"),
        posexplode(expr("arrays_zip(__ns, __svs)")).as(Seq("rep", "__z")))
      .select(col("grp"), col("rep"),
        col("__z.__ns").as("n_drawn"),
        when(col("__z.__ns") > 0,
          col("__z.__svs").cast("double") / col("__z.__ns").cast("double"))
          .otherwise(lit(null).cast("double")).as("mean"))
  }

  /** Bootstrap CI report over [[bootstrapGroupMeans]]'s replicate table:
    * per group, the point estimate (full-sample mean) and the percentile
    * CI read off the SORTED replicate means at 0-based ranks
    * `floor(α·reps)` and `ceil((1−α)·reps)−1` (α = 0.025, reps = 40 →
    * ranks 1 and 38). The replicate list is reps-bounded, so the
    * per-group `array_sort(collect_list(…))` holds ≤ reps doubles —
    * bounded state, not a data-sized sort; null (empty-replicate) means
    * only occur on near-empty groups and are excluded from the order
    * with their count reported. */
  def bootstrapGroupCi(df: DataFrame, groupCol: Column, idCol: Column,
      valueCol: Column, reps: Int = 40, salt: String = "boot",
      alpha: Double = 0.025): DataFrame = {
    val loIdx = math.floor(alpha * reps).toInt
    val hiIdx = math.ceil((1.0 - alpha) * reps).toInt - 1
    val repsTab = bootstrapGroupMeans(df, groupCol, idCol, valueCol, reps, salt)
    // count non-null values only, matching the replicate tables'
    // non-null-population contract
    val point = df.groupBy(groupCol.as("grp"))
      .agg((sum(valueCol.cast(LongType)).cast("double") /
        count(valueCol.cast(LongType)).cast("double")).as("mean_est"))
    repsTab.groupBy(col("grp"))
      .agg(count(col("mean")).as("n_reps"),
        array_sort(collect_list(col("mean"))).as("__ms"))
      .select(col("grp"), col("n_reps"),
        // ANSI mode errors on out-of-bounds element_at: a group whose
        // non-null replicate count falls short of the rank (possible
        // only on near-empty groups) reports a null bound instead
        when(col("n_reps") > hiIdx,
          element_at(col("__ms"), loIdx + 1)).as("ci_lo"),
        when(col("n_reps") > hiIdx,
          element_at(col("__ms"), hiIdx + 1)).as("ci_hi"))
      .join(point, "grp")
      .select(col("grp"), col("n_reps"), col("mean_est"),
        col("ci_lo"), col("ci_hi"))
  }

  /** Column profile — the pre-training data audit: per column, row count,
    * non-null count, exact distinct count, and extents (numeric columns
    * report double extents, string columns string extents). Long format:
    * `(col_name, n_rows, n_nonnull, n_distinct, min_num, max_num,
    * min_str, max_str)`.
    *
    * ONE scan: each row melts into one `(col_name, value)` pair per
    * profiled column (a row-local explode), then a two-level aggregation
    * — `(col_name, value)` rollup, then per-column finish — computes
    * every metric including the EXACT distinct count (= the rollup's row
    * count). Both shuffles key on uniform (column, value) pairs and
    * partial-aggregate map-side; this beats the multi-distinct Expand
    * plan (which widens every expanded row with null-padded grouping
    * keys) by ~3× at sf0.1 and scales the same way a distinct-value
    * rollup does everywhere else in the engine.
    *
    * `approxDistinct = true` is the 100 TB form: no distinct-value
    * rollup at all — ONE aggregation over the melted pairs with
    * `approx_count_distinct` (HLL++, `rsd` ≈ 2%) for `n_distinct` and
    * streaming min/max. One shuffle whose payload is |cols| sketches,
    * immune to distinct-value explosion. Exact stays the default
    * because the oracle hash-checks it (spec proves the modes agree
    * within the sketch's error bound).
    */
  def columnProfile(df: DataFrame, numCols: Seq[String],
      strCols: Seq[String], approxDistinct: Boolean = false): DataFrame = {
    def profileHalf(cols: Seq[String], toValue: Column => Column,
        numeric: Boolean): Option[DataFrame] =
      if (cols.isEmpty) None else Some {
        val pairs = cols.map(c =>
          struct(lit(c).as("col_name"), toValue(col(c)).as("v")))
        // NOT spread (r18, measured): wrapping the melt in Spread.narrow
        // regressed q117 1.51 → 1.95 s at c32 — the 600k-row exchange
        // costs more than the 3-task melt parallelism buys (the rollup
        // already partial-aggregates map-side, so the explode never
        // crosses a shuffle)
        val melted = df.select(explode(array(pairs: _*)).as("p"))
          .select(col("p.col_name").as("col_name"), col("p.v").as("v"))
        val prof =
          if (approxDistinct)
            melted.groupBy(col("col_name")).agg(
              count(lit(1)).as("n_rows"),
              count(col("v")).as("n_nonnull"),
              approx_count_distinct(col("v"), 0.02).as("n_distinct"),
              min(col("v")).as("__min"), max(col("v")).as("__max"))
          else {
            val rollup = melted.groupBy(col("col_name"), col("v"))
              .agg(count(lit(1)).as("__c"))
            rollup.groupBy(col("col_name")).agg(
              sum(col("__c")).as("n_rows"),
              sum(when(col("v").isNotNull, col("__c")).otherwise(0L)).as("n_nonnull"),
              count(col("v")).as("n_distinct"),
              min(col("v")).as("__min"), max(col("v")).as("__max"))
          }
        if (numeric)
          prof.select(col("col_name"), col("n_rows"), col("n_nonnull"),
            col("n_distinct"),
            col("__min").cast(DoubleType).as("min_num"),
            col("__max").cast(DoubleType).as("max_num"),
            lit(null).cast("string").as("min_str"),
            lit(null).cast("string").as("max_str"))
        else
          prof.select(col("col_name"), col("n_rows"), col("n_nonnull"),
            col("n_distinct"),
            lit(null).cast("double").as("min_num"),
            lit(null).cast("double").as("max_num"),
            col("__min").cast("string").as("min_str"),
            col("__max").cast("string").as("max_str"))
      }
    val halves = profileHalf(numCols, _.cast(DoubleType), numeric = true).toSeq ++
      profileHalf(strCols, _.cast("string"), numeric = false).toSeq
    require(halves.nonEmpty, "columnProfile: no columns given")
    halves.reduce(_.unionByName(_))
  }

  /** Two-period distribution-drift report: split the rows at the midpoint
    * of the time range, bin `valueCol` into `bins` equal-width buckets
    * over the GLOBAL min/max (both periods share one grid — drift must be
    * read off comparable bins), and report each bin's count and share per
    * period, the per-bin share gap, and the total variation distance
    * `TVD = ½ Σ |frac_a − frac_b|` as a constant column. The monitoring
    * primitive for "did this feed's distribution move?" — PSI without the
    * logarithm, because TVD's arithmetic (exact-integer divisions, one
    * subtraction, a DECIMAL-accumulated sum) is bit-identical across
    * engines while `ln` is not ULP-stable and would break result-hash
    * parity; the two statistics order drifts identically for
    * equal-granularity grids.
    *
    * Degenerate guards: a constant column collapses to bin 0; a period
    * with zero rows reports zero shares (not NaN). Values at the global
    * max clamp into the last bin.
    *
    * Scale: two scans (one for the four global extremes, one for the
    * binned counts — the stats row broadcasts), one partial-aggregated
    * shuffle keyed by bin (≤ `bins` groups), then single-row broadcasts
    * for totals and the TVD. No window over raw rows, nothing
    * driver-side.
    */
  def driftReport(df: DataFrame, valueCol: String, tsCol: String,
      bins: Int = 20): DataFrame = {
    require(bins >= 1, "driftReport: bins must be >= 1")
    val st = df.agg(
      min(col(tsCol)).as("__tmin"), max(col(tsCol)).as("__tmax"),
      min(col(valueCol)).as("__vmin"), max(col(valueCol)).as("__vmax"))
    val j = df.select(col(valueCol).as("__v"), col(tsCol).as("__t"))
      .crossJoin(broadcast(st))
    // integer midpoint (ts columns are integral seconds/nanos); rows at
    // exactly the midpoint belong to the later period
    val period = when(col("__t") < expr("(__tmin + __tmax) div 2"), "a")
      .otherwise("b")
    // pinned float composition: ((v - vmin) / (vmax - vmin)) * bins —
    // the oracle spells the same parenthesization
    val bin = when(col("__vmax") === col("__vmin"), lit(0L))
      .otherwise(least(lit(bins - 1L),
        floor(((col("__v") - col("__vmin")) /
          (col("__vmax") - col("__vmin"))) * lit(bins.toDouble))
          .cast("long")))
    val g = j.select(bin.as("bin"), period.as("__p"))
      .groupBy(col("bin"))
      .agg(sum(when(col("__p") === "a", 1L).otherwise(0L)).as("cnt_a"),
        sum(when(col("__p") === "b", 1L).otherwise(0L)).as("cnt_b"))
    val tot = g.agg(sum(col("cnt_a")).as("__ta"), sum(col("cnt_b")).as("__tb"))
    val g2 = g.crossJoin(broadcast(tot))
    val fr = g2
      .select(col("bin"), col("cnt_a"), col("cnt_b"),
        when(col("__ta") > 0, col("cnt_a").cast(DoubleType) / col("__ta"))
          .otherwise(lit(0.0)).as("frac_a"),
        when(col("__tb") > 0, col("cnt_b").cast(DoubleType) / col("__tb"))
          .otherwise(lit(0.0)).as("frac_b"))
      .withColumn("abs_diff", abs(col("frac_a") - col("frac_b")))
    // TVD over a common denominator: ½ Σ |cnt_a·tb − cnt_b·ta| / (ta·tb).
    // The numerator is an EXACT integer sum (decimal-typed — the products
    // overflow int64 on a 10¹²-row period), divided once at the end, so
    // the statistic never sums doubles. Summing the per-bin abs_diff
    // doubles instead would round each sub-1 term inside its significant
    // digits when cast to a fixed decimal scale — the one place the two
    // engines' double→decimal conventions can disagree by an ULP.
    val dec = (c: Column) => c.cast(DecimalType(20, 0))
    val tvd = g2.agg(
        sum(abs(dec(col("cnt_a")) * dec(col("__tb")) -
          dec(col("cnt_b")) * dec(col("__ta")))).as("__num"),
        max(col("__ta")).as("__ta"), max(col("__tb")).as("__tb"))
      .select(
        // one-side-empty reports 0.5 — NOT an arbitrary sentinel: it is
        // the TVD formula's own value under the report's zero-shares
        // convention (the empty side's fracs are pinned 0.0 above, so
        // ½·Σ|0 − q| = ½). ksDrift pins 1.0 for the same condition
        // because a CDF gap has no zero-shares convention to follow —
        // the two conventions are each internally consistent and both
        // oracle-stated.
        when(col("__ta") > 0 && col("__tb") > 0,
          ((col("__num").cast(DoubleType) / col("__ta")) / col("__tb")) *
            lit(0.5))
          .otherwise(lit(0.5)).as("tvd"))
    fr.crossJoin(broadcast(tvd)).orderBy(col("bin"))
  }

  /** Exact two-sample Kolmogorov–Smirnov drift statistic, per group: the
    * supremum CDF gap `D = sup_v |F_a(v) − F_b(v)|` between the early
    * period (rows before the integer midpoint of the GLOBAL time range —
    * [[driftReport]]'s split convention) and the late period. The
    * bin-free companion to [[driftReport]]'s TVD: no grid to choose, and
    * D is sensitive to distribution-shape shifts a coarse grid averages
    * away.
    *
    * The sup over a finite sample is attained at a data value, so the
    * whole statistic is the distinct-value rollup (per-side conditional
    * counts), ONE value sort per group yielding both aligned prefix
    * counts ([[withGroupedCumSumsResolved]]), and a partial-aggregatable
    * `max` of `|cumA·n_b − cumB·n_a|` — an EXACT integer in
    * decimal(38,0), divided once by `n_a·n_b` at the end. Same scale
    * shape and float discipline as the rest of the quantile family.
    * A group empty on one side reports the pinned sentinel `D = 1.0`
    * (maximal drift), never NaN.
    */
  def ksDrift(df: DataFrame, groupCol: String, valueCol: String,
      tsCol: String, distributedCum: Option[Boolean] = None): DataFrame = {
    val dec = "decimal(38,0)"
    val st = df.agg(min(col(tsCol)).as("__tmin"), max(col(tsCol)).as("__tmax"))
    // NULL values are excluded from both sides — a CDF ranges over
    // observed values, and engines disagree on where NULLs sort in the
    // value window (Spark first, DuckDB last); n_a/n_b count non-null rows
    val j = df.select(col(groupCol), col(valueCol), col(tsCol).as("__t"))
      .filter(col(valueCol).isNotNull)
      .crossJoin(broadcast(st))
    // rows at exactly the midpoint belong to the later period (driftReport)
    val isA = col("__t") < expr("(__tmin + __tmax) div 2")
    val (g, dist) = resolveCum(
      j.groupBy(col(groupCol), col(valueCol))
        .agg(sum(when(isA, 1L).otherwise(0L)).as("__ca"),
          sum(when(isA, 0L).otherwise(1L)).as("__cb")),
      groupCol, distributedCum)
    val cum = withGroupedCumSumsResolved(g, groupCol, valueCol,
      Seq("__ca", "__cb"), dist)
    val dev = abs(
      col("__cum___ca").cast(dec) * col("__tot___cb").cast(dec) -
        col("__cum___cb").cast(dec) * col("__tot___ca").cast(dec))
    cum.groupBy(col(groupCol))
      .agg(max(dev).as("__dnum"),
        max(col("__tot___ca")).as("__na"), max(col("__tot___cb")).as("__nb"))
      .select(col(groupCol),
        col("__na").as("n_a"), col("__nb").as("n_b"),
        when(col("__na") > 0 && col("__nb") > 0,
          col("__dnum").cast("double") /
            (col("__na").cast(dec) * col("__nb").cast(dec)).cast("double"))
          .otherwise(lit(1.0)).as("ks"))
  }

  /** Theil–Sen robust trend per group: the MEDIAN of all pairwise slopes
    * `(y_j − y_i)/(x_j − x_i)` over the group's (x, y) rollup points —
    * immune to the outlier days that wreck [[groupedTrend]]'s
    * least-squares slope (breakdown point 29%). Exact: each slope is one
    * IEEE division of exact aggregates, the median is the exact middle
    * slope (odd count) or the mean of the two middles (one add + one
    * halving).
    *
    * Scale: the input must already be a bounded-cardinality rollup (days,
    * hours, buckets — the same contract as groupedTrend); the pair join
    * is per-group O(D²) on those rollup rows, never on raw events, and
    * the median window sorts ≤ D² slopes per group. For D in the
    * thousands, sample the x domain first — the estimator is defined on
    * any x subset.
    */
  def theilSenTrend(rollup: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = rollup.select(col(groupCol).as("__g"), col(xCol).as("__xa"),
      col(yCol).as("__ya"))
    val b = rollup.select(col(groupCol).as("__g"), col(xCol).as("__xb"),
      col(yCol).as("__yb"))
    val slopes = a.join(b, Seq("__g"))
      .filter(col("__xa") < col("__xb"))
      .select(col("__g"),
        ((col("__yb") - col("__ya")).cast("double") /
          (col("__xb") - col("__xa")).cast("double")).as("__s"))
    val w = Window.partitionBy(col("__g")).orderBy(col("__s"))
    val ranked = slopes
      .withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("__g"))))
    ranked
      .filter(col("__rk") === expr("(__n + 1) div 2") ||
        col("__rk") === expr("__n div 2 + 1"))
      .groupBy(col("__g").as(groupCol))
      .agg(min(col("__n")).as("n_slopes"),
        ((min(col("__s")) + max(col("__s"))) / 2.0).as("theil_sen_slope"))
  }

  /** Isotonic calibration of a binary outcome against a score: the
    * monotone least-squares fit (what pool-adjacent-violators computes)
    * over `bins` equal-width score bins — the calibration map that turns
    * a raw quality-classifier score into a usable P(label), the step a
    * filtering pipeline needs between "model says 0.83" and "keep
    * everything above precision 0.9" (the [[groupedAuc]] / reliability-
    * curve companion: those DIAGNOSE the score, this one corrects it).
    *
    * Computed via the max-min closed form over the bin rollup,
    * `fitted(i) = max_{j≤i} min_{k≥i} wmean(y, bins j..k)` (Robertson/
    * Wright/Dykstra, "Order Restricted Statistical Inference", eq. 1.9 —
    * identical to the PAV recursion, but expressible as three bounded
    * joins instead of a sequential pooling loop). Exact and engine-
    * replayable: bin ids are integer arithmetic on the collected [lo, hi]
    * extents (one scalar row, the SybilQuery extents precedent), every
    * candidate mean is ONE IEEE division of exact integer sums, and the
    * min/max lattice picks among identical doubles in any engine.
    *
    * Scale shape: ONE partial-aggregated shuffle of the corpus onto ≤bins
    * keys; everything after runs on the ≤bins-row rollup (the pair/span
    * frames are ≤bins² and ≤bins³/6 rows — at the default 12 bins, 78 and
    * ~360 rows), so the minimax lattice costs nothing at any corpus size.
    * Empty bins simply don't appear: pooling is over OBSERVED bins, which
    * leaves the fit unchanged (an empty bin contributes weight 0 to every
    * span containing it).
    *
    * Output: `(bin, n, n_pos, emp_rate, fitted)`, fitted non-decreasing
    * in bin. Null/uncastable scores are excluded (they have no bin);
    * `labelCond` must be null-free (wrap in `coalesce`/`isNotNull` if the
    * underlying column can be null — a null condition row would
    * silently count as negative).
    */
  def isotonicCalibration(df: DataFrame, scoreCol: Column, labelCond: Column,
      bins: Int = 12): DataFrame = {
    require(bins >= 1 && bins <= 10000,
      s"isotonicCalibration: bins must be in 1..10000, got $bins")
    val src = df.select(scoreCol.cast(LongType).as("__s"),
        when(labelCond, 1L).otherwise(0L).as("__y"))
      .filter(col("__s").isNotNull)
    // the only driver-side values: the score extents (one scalar row)
    val extRow = src.agg(min(col("__s")), max(col("__s"))).collect()(0)
    require(!extRow.isNullAt(0),
      "isotonicCalibration: no non-null castable scores")
    val lo = extRow.getLong(0)
    val hi = extRow.getLong(1)
    // overflow guard in exact BigInt (division-form long guards get the
    // edge cases wrong when lo is very negative)
    require((BigInt(hi) - BigInt(lo) + 1) * bins <= BigInt(Long.MaxValue),
      s"isotonicCalibration: score span [$lo, $hi] * $bins bins overflows")
    val b = PlanCache.register(src
      .select(expr(s"((__s - ${lo}L) * $bins) div (${hi}L - ${lo}L + 1L)")
        .as("bin"), col("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos")))
    // every span's weighted mean: (j, k) pairs joined to their member
    // bins — bounded theta joins on the rollup, never on data
    val spanMean = b.select(col("bin").as("j"))
      .join(b.select(col("bin").as("k")), col("j") <= col("k"))
      .join(b.select(col("bin").as("m"), col("n"), col("n_pos")),
        col("m") >= col("j") && col("m") <= col("k"))
      .groupBy(col("j"), col("k"))
      .agg((sum(col("n_pos")).cast(DoubleType) /
        sum(col("n")).cast(DoubleType)).as("a"))
    val fit = spanMean
      .join(b.select(col("bin").as("i")),
        col("j") <= col("i") && col("k") >= col("i"))
      .groupBy(col("j"), col("i")).agg(min(col("a")).as("__m"))
      .groupBy(col("i")).agg(max(col("__m")).as("fitted"))
    b.join(fit, col("bin") === col("i"))
      .select(col("bin"), col("n"), col("n_pos"),
        (col("n_pos").cast(DoubleType) / col("n").cast(DoubleType))
          .as("emp_rate"),
        col("fitted"))
  }
}

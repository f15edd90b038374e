package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Batch event-stream analytics: gap sessionization and ordered funnels.
  * The streaming twin (mapGroupsWithState sessionization over the same gap
  * rule) lives in [[graft.streaming.Streams]]; these are the batch/backfill
  * forms a training-data pipeline runs over historical event logs.
  *
  * Scale: each operator shuffles once on the user key and then works
  * per-user. The skew boundary is a single user's events fitting one
  * window task (same boundary as [[AsOfJoin]]); a pathological hot user
  * can be pre-split by sessionizing over (user, coarse time range) salt
  * buckets — sessions never span buckets wider than the gap allows.
  */
object Events {

  /** Split each user's event stream into sessions: a new session starts at
    * every gap > `gapSecs` between consecutive events. Returns one row per
    * session with start/end/count/duration.
    *
    * Plan shape: one shuffle (window partitioned by user, ordered by time
    * with `orderCol` as the deterministic tie-break), then a groupBy on
    * (user, session) that reuses the same partitioning — Catalyst plans
    * the aggregation without a second exchange.
    */
  /** The ONE gap-based session assignment (shared by [[sessionize]] and
    * [[sessionSequences]] — a drifting copy of the session rule would
    * silently diverge their boundaries for the same gapSecs): appends
    * `session_idx` per user via the running count of gap-exceeding
    * steps. */
  private def withSessionIdx(events: DataFrame, userCol: String,
      tsSecCol: String, orderCol: String, gapSecs: Long): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsSecCol), col(orderCol))
    val gap = col(tsSecCol) - lag(col(tsSecCol), 1).over(w)
    val isNew = when(gap.isNull || gap > gapSecs, 1L).otherwise(0L)
    events
      .withColumn("__new", isNew)
      .withColumn("session_idx", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  def sessionize(events: DataFrame, userCol: String, tsSecCol: String,
      orderCol: String, gapSecs: Long): DataFrame = {
    withSessionIdx(events, userCol, tsSecCol, orderCol, gapSecs)
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        min(col(tsSecCol)).as("session_start"),
        max(col(tsSecCol)).as("session_end"),
        count(lit(1)).as("n_events"))
      .withColumn("duration_secs", col("session_end") - col("session_start"))
  }

  /** Per-user event-type transition matrix: for every consecutive pair of
    * events in a user's timeline, count (prev_type → type) with the gap
    * stats that tell dwell time. The Markov-chain view of an event log —
    * what follows what, and how fast.
    *
    * Scale: one shuffle (the per-user window), then a groupBy on the
    * (prev, next) pair — at most |types|² groups, tiny. Same hot-user
    * boundary as [[sessionize]].
    */
  def transitions(events: DataFrame, userCol: String, tsSecCol: String,
      orderCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsSecCol), col(orderCol))
    events
      .withColumn("__prev_type", lag(col(typeCol), 1).over(w))
      .withColumn("__gap", col(tsSecCol) - lag(col(tsSecCol), 1).over(w))
      .filter(col("__prev_type").isNotNull)
      .groupBy(col("__prev_type").as("prev_type"), col(typeCol).as("next_type"))
      .agg(
        count(lit(1)).as("n"),
        min(col("__gap")).as("min_gap"),
        max(col("__gap")).as("max_gap"))
  }

  /** Ordered funnel: step i counts users whose first step-(i-1) event is
    * STRICTLY before some step-i event (and, when `stepWindow` is set,
    * within `stepWindow` time units of it). Returns
    * (step, event_type, users), one row per step.
    *
    * Each stage is one aggregation plus one join whose right side is the
    * per-user frontier (≤ one row per user, shrinking monotonically down
    * the funnel) — Spark broadcasts it once it fits, and the events scan
    * is filtered to a single event type before the join, so nothing
    * quadratic ever forms.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String],
      stepWindow: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var reached = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
    var out = reached.agg(count(lit(1)).cast(LongType).as("users"))
      .select(lit(1L).as("step"), lit(steps.head).as("event_type"), col("users"))
    for ((st, i) <- steps.zipWithIndex.drop(1)) {
      val frontier = reached
        .select(col(userCol).as("__u"), col("__t"))
      val inWindow = stepWindow
        .map(wd => col(tsCol) <= col("__t") + wd)
        .getOrElse(lit(true))
      reached = events.filter(col(typeCol) === st)
        .join(frontier,
          col(userCol) === col("__u") && col(tsCol) > col("__t") && inWindow)
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
      out = out.unionByName(reached
        .agg(count(lit(1)).cast(LongType).as("users"))
        .select(lit((i + 1).toLong).as("step"), lit(st).as("event_type"),
          col("users")))
    }
    out
  }

  /** Interval (band) self-join: ordered pairs of events of the same user
    * at most `windowSec` seconds apart, aggregated to the
    * `(type₁, type₂)` co-occurrence matrix with gap extents. "Ordered"
    * means `(ts, event_id)` of the first element is lexicographically
    * smaller — each unordered pair counts exactly once.
    *
    * A naive formulation is a non-equi theta join, which Spark can only
    * execute as a broadcast-nested-loop — O(n²) per user and a
    * scale-killer. This instead blocks time into `windowSec` buckets and
    * equi-joins on `(user, bucket)`: the left side duplicates each event
    * into its own bucket and the next one, the right side keeps one row.
    * Any pair within the window lands in exactly one of the two branches
    * (s₂ ≥ s₁ forces b₂ ∈ {b₁, b₁+1}), so no dedup pass is needed; the
    * exact window predicate then prunes the in-bucket false candidates.
    * Cost: one 2× row duplication and one hash join keyed on
    * `(user, bucket)` — uniform unless one user floods one minute, which
    * AQE skew-split handles.
    */
  def intervalPairs(events: DataFrame, userCol: String, tsSecCol: String,
      idCol: String, typeCol: String, windowSec: Long): DataFrame = {
    require(windowSec >= 1, "windowSec must be >= 1")
    val e = events.select(col(userCol), col(tsSecCol).cast(LongType).as("s"),
      col(idCol).as("eid"), col(typeCol).as("etype"))
    val left = e.select(col(userCol), col("s").as("s1"), col("eid").as("id1"),
      col("etype").as("t1"),
      explode(array(expr(s"s div $windowSec"), expr(s"s div $windowSec + 1")))
        .as("jb"))
    val right = e.select(col(userCol), col("s").as("s2"),
      col("eid").as("id2"), col("etype").as("t2"),
      expr(s"s div $windowSec").as("jb"))
    val gap = col("s2") - col("s1")
    left.join(right, Seq(userCol, "jb"))
      .filter(gap >= 0 && gap <= windowSec &&
        (col("s1") < col("s2") ||
          (col("s1") === col("s2") && col("id1") < col("id2"))))
      .groupBy(col("t1"), col("t2"))
      .agg(count(lit(1)).as("n_pairs"),
        min(gap).as("min_gap"), max(gap).as("max_gap"))
  }

  /** Trailing-window rate anomaly detection: per (type, bucket) event
    * counts scored against the mean/std of the previous `lookback`
    * buckets (current bucket excluded — an anomaly must not dilute its
    * own baseline). The bucket axis is DENSIFIED per type over its
    * observed [min, max] span: a bucket with no events scores as count 0
    * — a rate dropping to zero is the canonical anomaly and must not be
    * invisible — and trailing baselines never silently skip time gaps.
    * Buckets without a full lookback window are not scored. The z-score is IEEE ops over EXACT integer window sums
    * (counts, so sum/sumsq are exact; sqrt is correctly rounded), making
    * the output bit-deterministic with no rounding convention.
    *
    * Scale: one groupBy on (type, bucket) — partial-aggregated — then a
    * window over BUCKETS per type (thousands of rows per type, not event
    * rows). Densification explodes one span/bucketSecs-element sequence
    * per type — pick bucket widths so a type's span stays in the
    * thousands-of-buckets range (the constraint any dense time-series
    * report has).
    *
    * Output: `(event_type, bucket, cnt, z, anomaly)` where anomaly =
    * |z| > `zThreshold` (0 std → anomaly iff the count moved at all).
    */
  def rateAnomalies(events: DataFrame, typeCol: String, tsSecCol: String,
      bucketSecs: Long, lookback: Int, zThreshold: Double): DataFrame = {
    require(bucketSecs >= 1 && lookback >= 2, "bucketSecs>=1, lookback>=2")
    val sparse = events
      .select(col(typeCol),
        (expr(s"cast($tsSecCol as bigint) div $bucketSecs") * bucketSecs)
          .as("bucket"))
      .groupBy(col(typeCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    // densify: every bucket in the type's observed span, empty ones = 0
    val spans = sparse.groupBy(col(typeCol))
      .agg(min(col("bucket")).as("__lo"), max(col("bucket")).as("__hi"))
    val counts = spans
      .select(col(typeCol),
        explode(sequence(col("__lo"), col("__hi"), lit(bucketSecs)))
          .as("bucket"))
      .join(sparse, Seq(typeCol, "bucket"), "left")
      .select(col(typeCol), col("bucket"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(typeCol)).orderBy(col("bucket"))
      .rowsBetween(-lookback, -1)
    val n = lit(lookback.toLong)
    val scored = counts
      .withColumn("__k", count(lit(1)).over(w))
      .withColumn("__s", sum(col("cnt")).over(w))
      .withColumn("__ss", sum(col("cnt") * col("cnt")).over(w))
      .filter(col("__k") === lookback)
    val mean = col("__s").cast("double") / n
    val variance = (col("__ss").cast("double") -
      col("__s").cast("double") * col("__s") / n) / n
    val std = sqrt(variance)
    // z reported 0 for a flat baseline (std = 0) — anomaly is then decided
    // by "did the count move at all", keeping infinities out of the output
    scored
      .withColumn("z",
        when(std > 0, (col("cnt").cast("double") - mean) / std)
          .otherwise(lit(0.0)))
      .select(col(typeCol), col("bucket"), col("cnt"), col("z"),
        (when(std > 0, abs(col("z")) > zThreshold)
          .otherwise(col("cnt").cast("double") =!= mean))
          .cast("int").cast("long").as("anomaly"))
  }

  /** Last-touch attribution: each conversion event is attributed to the
    * same user's most recent `touchType` event at-or-before it, provided
    * the touch happened within `windowSec` — the standard marketing/
    * funnel-credit assignment, and the canonical USE of a backward as-of
    * join (the join does the "most recent at-or-before"; the window is a
    * post-filter on the matched gap).
    *
    * Scale: inherits [[AsOfJoin.backward]]'s shape — one shuffle on the
    * user key, one running-last window, no range explosion. Touches are
    * pre-reduced to unique (user, ts) with max(id) so ties are
    * deterministic in any engine.
    *
    * Output: `(conv_id, user, conv_ts, touch_id, touch_gap)` for
    * attributed conversions only (unattributed = no touch within window).
    */
  def lastTouchAttribution(events: DataFrame, userCol: String,
      tsSecCol: String, idCol: String, typeCol: String, convType: String,
      touchType: String, windowSec: Long): DataFrame = {
    require(windowSec >= 0, "windowSec must be >= 0")
    val conv = events.filter(col(typeCol) === convType)
      .select(col(userCol), col(tsSecCol).cast(LongType).as("conv_ts"),
        col(idCol).as("conv_id"))
    val touch = events.filter(col(typeCol) === touchType)
      .select(col(userCol).as("__tu"), col(tsSecCol).cast(LongType).as("touch_ts"),
        col(idCol).as("tid"))
      .groupBy(col("__tu"), col("touch_ts"))
      .agg(max(col("tid")).as("touch_id"))
    AsOfJoin.backward(conv, touch, userCol, "__tu", "conv_ts", "touch_ts",
        Seq("touch_id", "touch_ts"))
      .filter(col("touch_id").isNotNull &&
        col("conv_ts") - col("touch_ts") <= windowSec)
      .select(col("conv_id"), col(userCol), col("conv_ts"), col("touch_id"),
        (col("conv_ts") - col("touch_ts")).as("touch_gap"))
  }

  /** Cumulative distinct users over time WITHOUT a running distinct: a
    * user contributes to the cumulative curve exactly once — at their
    * FIRST bucket — so `cum_users(b) = Σ new_users(b' ≤ b)`. The naive
    * formulation (`COUNT(DISTINCT user) OVER (ORDER BY bucket)`) keeps an
    * ever-growing distinct set alive per window frame; the first-seen
    * rewrite is one uniform groupBy on the user, a tiny per-bucket count,
    * and a running sum over the BUCKET axis (rows = number of buckets, not
    * rows of data — a single-partition window over thousands of rows, not
    * billions).
    *
    * Output: `(bucket, new_users, cum_users)`.
    */
  def cumulativeDistinct(events: DataFrame, userCol: String, tsSecCol: String,
      bucketSecs: Long): DataFrame = {
    require(bucketSecs >= 1, "bucketSecs must be >= 1")
    val firstSeen = events
      .select(col(userCol), col(tsSecCol).cast(LongType).as("__s"))
      .groupBy(col(userCol))
      .agg(min(expr(s"__s div $bucketSecs") * bucketSecs).as("bucket"))
    val perBucket = firstSeen.groupBy(col("bucket"))
      .agg(count(lit(1)).as("new_users"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    perBucket.withColumn("cum_users", sum(col("new_users")).over(w))
  }

  /** Cohort retention matrix: users grouped by their FIRST-seen bucket
    * (the cohort), counted distinct in every bucket they were active —
    * the classic "week-0 signups still active in week N" triangle.
    *
    * Scale: first-seen is one groupBy on the user (uniform); the join
    * back to activity keys on the same user hash; the final matrix
    * aggregation is |cohorts| × |buckets| — tiny. No windows, no
    * running distincts.
    *
    * Output: `(cohort, bucket, active_users)` with `bucket >= cohort`.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsSecCol: String,
      bucketSecs: Long): DataFrame = {
    require(bucketSecs >= 1, "bucketSecs must be >= 1")
    val e = events.select(col(userCol),
      (expr(s"cast($tsSecCol as bigint) div $bucketSecs") * bucketSecs)
        .as("bucket"))
    val cohorts = e.groupBy(col(userCol)).agg(min(col("bucket")).as("cohort"))
    e.join(cohorts, userCol)
      .groupBy(col("cohort"), col("bucket"))
      .agg(count_distinct(col(userCol)).as("active_users"))
  }

  /** Top event-type PATHS: every length-`k` run of consecutive events per
    * user, counted corpus-wide — the sequential-pattern view behind "what
    * do users do right before X" questions ([[transitions]] is the k=2
    * Markov special case; paths keep the full k-step context).
    *
    * Scale: one shuffle on the user for the per-user lag window (uniform
    * key; a user's history sorts in one task — bounded by per-user event
    * counts, not corpus size), then a partial-aggregated count on the
    * path string and a TakeOrdered top-k. Deterministic: the within-user
    * order ties on the event id.
    */
  def topPaths(events: DataFrame, userCol: String, tsSecCol: String,
      typeCol: String, idCol: String, k: Int = 3, topN: Int = 20): DataFrame = {
    require(k >= 2, "topPaths: k must be >= 2")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsSecCol), col(idCol))
    // lags materialize as columns first — a window expression cannot sit
    // inside the subsequent filter
    val lagged = (1 until k).foldLeft(events) { (df, i) =>
      df.withColumn(s"__l$i", lag(col(typeCol), k - i).over(w))
    }
    val parts = (1 until k).map(i => col(s"__l$i")) :+ col(typeCol)
    lagged
      .filter(col("__l1").isNotNull)
      .withColumn("path", concat_ws(">", parts: _*))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(topN)
  }

  /** Exact SLIDING-window distinct users: for every `bucketSecs` bucket,
    * the distinct-user count over the trailing `windowBuckets` buckets
    * (window end inclusive). The sliding complement of
    * [[cumulativeDistinct]] (whose first-seen rewrite only works for the
    * all-history window): each distinct `(user, bucket)` PAIR fans out to
    * the `windowBuckets` window-ends it contributes to, then one
    * count-distinct per window-end — `COUNT(DISTINCT) OVER (RANGE …)`
    * semantics without a running-set window (Spark rejects DISTINCT in
    * windows; a set-carrying UDAF would hold every trailing user in
    * state).
    *
    * Scale: the fan-out multiplies the DISTINCT pair rollup (already
    * collapsed map-side), not raw events — cost `pairs × windowBuckets`,
    * keyed on uniform (bucket, user) hashes. Window-ends with no events
    * in their own bucket still report (they inherit fan-out from earlier
    * buckets); ends beyond the data's last bucket are dropped to keep
    * the frame aligned with observed buckets.
    */
  def slidingDistinct(events: DataFrame, userCol: String, tsSecCol: String,
      bucketSecs: Long, windowBuckets: Int): DataFrame = {
    require(bucketSecs >= 1 && windowBuckets >= 1,
      "bucketSecs and windowBuckets must be >= 1")
    val pairs = events
      .select(col(userCol),
        (expr(s"cast($tsSecCol as bigint) div $bucketSecs") * bucketSecs)
          .as("__b"))
      .distinct()
    val maxB = pairs.agg(max(col("__b")).as("__maxb"))
    pairs
      .select(col(userCol), explode(sequence(col("__b"),
        col("__b") + lit(bucketSecs * (windowBuckets - 1)),
        lit(bucketSecs))).as("bucket"))
      .crossJoin(broadcast(maxB))
      .filter(col("bucket") <= col("__maxb"))
      .groupBy(col("bucket"))
      .agg(count_distinct(col(userCol)).as("n_users"))
  }

  /** Recency-weighted engagement score per user: each event contributes
    * `value · 2^(−age/halfLife)` with the age bucketed to whole
    * half-lives — a week-old event counts half, a month-old a sixteenth.
    * The decay is a POWER OF TWO with an integer exponent
    * (`1 / (1 << k)`, k clamped to 62), so the factor is EXACTLY
    * representable and the weighting is one IEEE multiply — no `exp`,
    * no rounding convention, hash-exact in any engine. Scores accumulate
    * through `graft_dsum` (order-independent decimal), so the ranking is
    * partitioning-proof. "Now" is the data's max timestamp (a broadcast
    * singleton — no wall-clock nondeterminism).
    *
    * Output: top `topK` users by decayed score, with the raw value sum
    * and event count alongside (the decay-vs-volume contrast IS the
    * signal: high raw / low decayed = churned heavy user).
    *
    * Scale: one scan + one user-keyed partial-aggregated shuffle + a
    * bounded TakeOrdered. The max-ts singleton broadcasts.
    */
  /** Kaplan–Meier survival curve for time-to-conversion: from each
    * user's first `startType` event to their first at-or-after
    * `eventType` event, users who never convert CENSORED at the corpus
    * horizon — the estimator that handles "hasn't converted YET"
    * correctly, which a naive mean-time-to-convert silently gets wrong.
    * `S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ)` over distinct conversion times
    * (bucketed to `bucketSec`), with the risk set nᵢ shrinking by both
    * conversions and censorings.
    *
    * Determinism: dᵢ, nᵢ are exact integers; each factor is one IEEE
    * division+subtract; the running product folds in time order over the
    * assembled curve (bounded by distinct buckets), bit-identical to the
    * oracle's ordered `list_reduce`.
    *
    * Output: `(t, n_risk, n_events, survival)` per conversion bucket.
    *
    * Scale: per-user firsts are two partial-aggregated rollups; the
    * timeline cum-window runs over the DISTINCT-bucket rollup (the
    * quantile-family shape, never raw events); the curve assembly is a
    * bounded single-row fold. The horizon and cohort size ride
    * broadcasts.
    */
  def survivalCurve(events: DataFrame, userCol: String, tsSecCol: String,
      typeCol: String, startType: String, eventType: String,
      bucketSec: Long = 3600L): DataFrame = {
    require(bucketSec > 0, "survivalCurve: bucketSec must be positive")
    import org.apache.spark.sql.expressions.Window
    val fs = events.filter(col(typeCol) === startType)
      .groupBy(col(userCol)).agg(min(col(tsSecCol)).as("__fs"))
    val conv = events.filter(col(typeCol) === eventType)
      .join(fs, userCol)
      .groupBy(col(userCol))
      .agg(min(when(col(tsSecCol) >= col("__fs"), col(tsSecCol)))
        .as("__fp"))
    val horizon = events.agg(max(col(tsSecCol)).as("__tmax"))
    val cohort = fs.join(conv, Seq(userCol), "left")
      .crossJoin(broadcast(horizon))
      .select(col(userCol),
        when(col("__fp").isNotNull,
          expr(s"(__fp - __fs) div $bucketSec")).as("__t"),
        expr(s"(__tmax - __fs) div $bucketSec").as("__c"))
    val n = cohort.agg(count(lit(1)).as("__n"))
    val evRoll = cohort.filter(col("__t").isNotNull)
      .groupBy(col("__t").as("t")).agg(count(lit(1)).as("d"))
    val censRoll = cohort.filter(col("__t").isNull)
      .groupBy(col("__c").as("t")).agg(count(lit(1)).as("cens"))
    val timeline = evRoll.join(censRoll, Seq("t"), "full_outer")
      .select(col("t"), coalesce(col("d"), lit(0L)).as("d"),
        coalesce(col("cens"), lit(0L)).as("cens"))
    // departures BEFORE t shrink the risk set; the window runs over the
    // distinct-bucket rollup, not events
    val wB = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val curve = timeline
      .withColumn("__dep", coalesce(sum(col("d") + col("cens")).over(wB),
        lit(0L)))
      .crossJoin(broadcast(n))
      .filter(col("d") > 0)
      .select(col("t"), (col("__n") - col("__dep")).as("n_risk"),
        col("d").as("n_events"),
        (lit(1.0) - col("d").cast("double") /
          (col("__n") - col("__dep")).cast("double")).as("__f"))
    curve.agg(array_sort(collect_list(
        struct(col("t"), col("n_risk"), col("n_events"), col("__f"))))
        .as("__cv"))
      // a conversionless cohort yields an empty curve — and sequence(1, 0)
      // would generate DESCENDING, so the empty case exits here
      .filter(size(col("__cv")) > 0)
      .select(posexplode(expr(
        """transform(sequence(1, size(__cv)), i -> struct(
          |  __cv[i - 1].t AS t, __cv[i - 1].n_risk AS n_risk,
          |  __cv[i - 1].n_events AS n_events,
          |  aggregate(transform(slice(__cv, 1, i), x -> x.__f),
          |    CAST(1.0 AS DOUBLE), (a, x) -> a * x) AS survival))"""
          .stripMargin)).as(Seq("__p", "__r")))
      .select(col("__r.t").as("t"), col("__r.n_risk").as("n_risk"),
        col("__r.n_events").as("n_events"),
        col("__r.survival").as("survival"))
  }

  /** Burstiness of each user's inter-event gaps (Goh & Barabási 2008):
    * `B = (σ−μ)/(σ+μ)` over the gap distribution — −1 = metronome
    * (periodic, the scripted-client signature), 0 = Poisson (organic),
    * +1 = extreme bursts. The gap MULTISET is order-invariant under
    * timestamp ties (equal timestamps contribute the same gaps whichever
    * order the window visits them), so the exact integer sums `Σg, Σg²`
    * — and everything derived — are deterministic. The float finish is
    * three divisions, one subtract, one sqrt, mirrored op-for-op by the
    * oracle; variance clamps at 0 before the sqrt.
    *
    * Output: top `topK` most bursty users with `minGaps`+ gaps.
    *
    * Scale: one user-keyed window (parallel across users), one
    * partial-aggregated rollup on the user, a bounded TakeOrdered. `Σg²`
    * stays in long — exact to ~3·10⁹-second gaps at 10⁶ events/user;
    * swap the accumulator to `graft_dsum` decimals beyond that.
    */
  def burstiness(events: DataFrame, userCol: String, tsSecCol: String,
      minGaps: Long = 5L, topK: Int = 100): DataFrame = {
    require(minGaps >= 2, "burstiness: need at least 2 gaps for a spread")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col("__t"))
    val gaps = events
      .select(col(userCol), col(tsSecCol).cast("long").as("__t"))
      .withColumn("__g", col("__t") - lag(col("__t"), 1).over(w))
      .filter(col("__g").isNotNull)
    val agg = gaps.groupBy(col(userCol))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("__g")).as("__sg"),
        sum(col("__g") * col("__g")).as("__s2"))
      .filter(col("n_gaps") >= minGaps)
    val mean = col("__sg").cast("double") / col("n_gaps").cast("double")
    val varE = greatest(
      col("__s2").cast("double") / col("n_gaps").cast("double") -
        mean * mean, lit(0.0))
    agg
      .withColumn("mean_gap", mean)
      .withColumn("sd_gap", sqrt(varE))
      .withColumn("burstiness",
        when(col("sd_gap") + col("mean_gap") > 0,
          (col("sd_gap") - col("mean_gap")) /
            (col("sd_gap") + col("mean_gap"))).otherwise(lit(0.0)))
      .select(col(userCol), col("n_gaps"), col("mean_gap"), col("sd_gap"),
        col("burstiness"))
      .orderBy(col("burstiness").desc, col(userCol).asc)
      .limit(topK)
  }

  def decayedScore(events: DataFrame, userCol: String, tsSecCol: String,
      valueCol: String, halfLifeSec: Long, topK: Int = 100): DataFrame = {
    require(halfLifeSec > 0, "decayedScore: halfLifeSec must be positive")
    require(topK > 0, "decayedScore: topK must be positive")
    val mx = events.agg(max(col(tsSecCol)).as("__tmax"))
    events.crossJoin(broadcast(mx))
      .withColumn("__k",
        least(expr(s"(__tmax - $tsSecCol) div $halfLifeSec"), lit(62L)))
      .withColumn("__w", col(valueCol) /
        expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(__k AS INT)) AS DOUBLE)"))
      .groupBy(col(userCol))
      .agg(
        call_function("graft_dsum", col("__w"), lit(9)).as("decayed_score"),
        call_function("graft_dsum", col(valueCol), lit(4)).as("raw_sum"),
        count(lit(1)).as("n_events"))
      .orderBy(col("decayed_score").desc, col(userCol).asc)
      .limit(topK)
  }

  /** Hour-of-week seasonality profile: per (label, hour-of-week 0..167)
    * the event count, exact mean value, and the LIFT of that hour against
    * the label's flat-profile expectation (`168·n_hour / n_label`) — the
    * load-shape fingerprint that separates organic diurnal traffic from
    * scripted flat-rate clients, and the baseline a rate-anomaly monitor
    * normalizes against. Hours are epoch-aligned (hour 0 = Thursday
    * 00:00 UTC), which is a labeling convention, not a semantic choice.
    *
    * Everything is exact integers plus one division per output; the plan
    * is one partial-aggregated rollup on (label, hour) joined to the
    * label totals (broadcast — label cardinality is small by
    * construction).
    */
  def hourOfWeekProfile(events: DataFrame, labelCol: String,
      tsSecCol: Column, valueCol: Column): DataFrame = {
    val base = events.select(col(labelCol).as("__lbl"),
        tsSecCol.cast("long").as("__s"), valueCol.cast("double").as("__v"))
      .withColumn("how", expr("(__s div 3600) % 168"))
    val per = base.groupBy(col("__lbl"), col("how"))
      .agg(count(lit(1)).as("n"),
        call_function("graft_dsum", col("__v"), lit(6)).as("__sv"))
    val tot = base.groupBy(col("__lbl"))
      .agg(count(lit(1)).as("__ntot"))
    per.join(broadcast(tot), "__lbl")
      .select(col("__lbl").as(labelCol), col("how"), col("n"),
        (col("__sv") / col("n").cast("double")).as("mean_value"),
        ((lit(168L) * col("n")).cast("double") /
          col("__ntot").cast("double")).as("lift"))
  }

  /** Exact-integer CUSUM changepoint scan per label: over the label's
    * time-bucket counts (in bucket order), the classic one-sided CUSUM
    * statistics for a rate INCREASE and DECREASE against the label's own
    * flat baseline — but kept in pure integers by scaling through the
    * bucket count: with `D` buckets and `T` total events,
    * `s⁺_t = max(0, s⁺_{t-1} + (c_t·D − T))` accumulates `D·Σ(c − mean)`
    * without ever forming the fractional mean, and the alarm fires when
    * `s⁺ > h·T` (an `h`-mean-days cumulative excess). No floats anywhere
    * — the whole scan is hash-exact by construction.
    *
    * Output per label: bucket span, totals, the max CUSUM in each
    * direction and the FIRST alarm bucket (null if never). The fold runs
    * over the label's assembled bucket array — per-label state is one
    * six-long struct, and the array is rollup-sized (buckets, not
    * events).
    *
    * Densification (and the final per-label fold) materializes the
    * label's FULL bucket span, so a sparse label over a wide range with
    * a tiny `bucketSec` is an inherent memory bomb — `maxSpanBuckets`
    * caps it loudly (in-plan assert, default 2²² ≈ 4.2M buckets ≈ 33 MB
    * of fold array) instead of letting the executor OOM; callers with a
    * genuinely wider span must raise it knowingly. Span generation is
    * chunked through 64Ki-bucket blocks so no single `sequence()` array
    * exceeds 512 KiB regardless of the cap.
    */
  def cusumChangepoint(events: DataFrame, labelCol: String,
      tsSecCol: Column, bucketSec: Long, h: Long = 2L,
      maxSpanBuckets: Long = 1L << 22): DataFrame = {
    require(bucketSec > 0 && h > 0, "cusumChangepoint: bucketSec, h > 0")
    require(maxSpanBuckets > 0, "cusumChangepoint: maxSpanBuckets > 0")
    val obs = events
      .select(col(labelCol).as("__lbl"), tsSecCol.cast("long").as("__s"))
      .withColumn("__b", expr(s"__s div $bucketSec"))
      .groupBy(col("__lbl"), col("__b"))
      .agg(count(lit(1)).as("__c"))
    // DENSIFY each label's bucket span with zero-count buckets: a rate
    // dropping to nothing is the canonical down-change and must not be
    // invisible (the rateAnomalies discipline) — folding only observed
    // buckets would skip every should-be decrease step through a silent
    // gap and inflate the per-bucket baseline. Fan-out is the bucket
    // SPAN per label — rollup-scale by construction.
    val spans = obs.groupBy(col("__lbl"))
      .agg(min(col("__b")).as("__lo"), max(col("__b")).as("__hi"))
    // Loud span cap: assert_true is null on pass, so the coalesce keeps
    // it in the plan (the mixtureWeights idiom) — a span past the cap
    // aborts with the label-sizing message instead of OOMing mid-fold.
    // The subtraction runs in DECIMAL(38,0): with extreme cast
    // timestamps (hi near Long.MaxValue, lo deeply negative) a raw long
    // difference wraps negative, the assert would pass, and the failure
    // would surface later as a confusing sequence()-too-long error.
    val loGuarded = coalesce(
      assert_true(col("__hi").cast("decimal(38,0)") -
        col("__lo").cast("decimal(38,0)") < lit(maxSpanBuckets), lit(
        s"cusumChangepoint: a label's bucket span exceeds " +
          s"maxSpanBuckets=$maxSpanBuckets — widen bucketSec or raise " +
          "the cap knowingly (the fold array is span-sized)")).cast("long"),
      col("__lo"))
    // Two-level chunked densify: explode 64Ki-bucket BLOCKS (shiftright
    // is floor division, correct for negative bucket ids), then sequence
    // within each block clipped to [lo, hi] — no single sequence() array
    // ever exceeds 64Ki elements, so a wide-span label costs many small
    // rows instead of one multi-hundred-MB array row.
    val buck = spans
      .select(col("__lbl"), col("__lo"), col("__hi"),
        explode(sequence(shiftright(loGuarded, 16),
          shiftright(col("__hi"), 16))).as("__blk"))
      .select(col("__lbl"), explode(sequence(
        greatest(col("__lo"), shiftleft(col("__blk"), 16)),
        least(col("__hi"),
          shiftleft(col("__blk"), 16) + lit(65535L)))).as("__b"))
      .join(obs, Seq("__lbl", "__b"), "left")
      .withColumn("__c", coalesce(col("__c"), lit(0L)))
    val folded = buck.groupBy(col("__lbl"))
      .agg(sort_array(collect_list(struct(col("__b"), col("__c"))))
        .as("__arr"),
        count(lit(1)).as("n_buckets"),
        sum(col("__c")).as("total"))
      .withColumn("__st", expr(
        s"""aggregate(__arr,
           |  named_struct('su', 0L, 'mu', 0L, 'fu', -1L,
           |               'sd', 0L, 'md', 0L, 'fd', -1L),
           |  (s, x) -> named_struct(
           |    'su', GREATEST(0L, s.su + (x.__c * n_buckets - total)),
           |    'mu', GREATEST(s.mu,
           |      GREATEST(0L, s.su + (x.__c * n_buckets - total))),
           |    'fu', IF(s.fu >= 0L, s.fu,
           |      IF(GREATEST(0L, s.su + (x.__c * n_buckets - total)) >
           |         $h * total, x.__b, -1L)),
           |    'sd', GREATEST(0L, s.sd + (total - x.__c * n_buckets)),
           |    'md', GREATEST(s.md,
           |      GREATEST(0L, s.sd + (total - x.__c * n_buckets))),
           |    'fd', IF(s.fd >= 0L, s.fd,
           |      IF(GREATEST(0L, s.sd + (total - x.__c * n_buckets)) >
           |         $h * total, x.__b, -1L))))""".stripMargin))
    folded.select(col("__lbl").as(labelCol), col("n_buckets"), col("total"),
      col("__st.mu").as("max_cusum_up"),
      nullif(col("__st.fu"), lit(-1L)).as("up_changepoint"),
      col("__st.md").as("max_cusum_down"),
      nullif(col("__st.fd"), lit(-1L)).as("down_changepoint"))
  }

  /** Halving EWMA over per-label bucket counts: `s_t = (s_{t-1}+x_t)/2`
    * — the α = ½ exponential smoother whose every step is one IEEE add
    * plus an EXACT halving, so the whole recurrence is bit-deterministic
    * (no α·x products to round differently). Reports the smoothed level
    * against the latest bucket — the "is today hot relative to decayed
    * history" monitor that complements [[cusumChangepoint]]'s alarm.
    *
    * The recurrence is non-associative (same class as CUSUM), so the
    * oracle must walk it with a recursive CTE; the engine folds the
    * label's bucket array inside the aggregate — rollup-sized state, no
    * window, no per-event state.
    */
  def ewmaLevel(events: DataFrame, labelCol: String, tsSecCol: Column,
      bucketSec: Long): DataFrame = {
    require(bucketSec > 0, "ewmaLevel: bucketSec > 0")
    val buck = events
      .select(col(labelCol).as("__lbl"), tsSecCol.cast("long").as("__s"))
      .withColumn("__b", expr(s"__s div $bucketSec"))
      .groupBy(col("__lbl"), col("__b"))
      .agg(count(lit(1)).as("__c"))
    buck.groupBy(col("__lbl"))
      .agg(sort_array(collect_list(struct(col("__b"), col("__c"))))
        .as("__arr"),
        count(lit(1)).as("n_buckets"),
        sum(col("__c")).as("total"),
        max(col("__b")).as("__lastb"))
      .withColumn("__st", expr(
        """aggregate(__arr,
          |  named_struct('init', false, 's', 0.0D, 'last', 0L),
          |  (s, x) -> named_struct(
          |    'init', true,
          |    's', IF(s.init,
          |      (s.s + CAST(x.__c AS DOUBLE)) / 2.0D,
          |      CAST(x.__c AS DOUBLE)),
          |    'last', x.__c))""".stripMargin))
      .select(col("__lbl").as(labelCol), col("n_buckets"), col("total"),
        col("__st.s").as("ewma_level"),
        col("__st.last").as("last_count"),
        when(col("__st.s") > 0,
          col("__st.last").cast("double") / col("__st.s"))
          .otherwise(lit(null).cast("double")).as("last_over_level"))
  }

  /** Session sequence export: the per-session ORDERED event-type string
    * (`view>click>purchase`) with size and duration — the
    * behavioral-cloning / next-action training row an event log turns
    * into. Sessions are the same gap-based windows as [[sessionize]];
    * the sequence assembles from a sorted (ts, tiebreak, type) struct
    * array, so it is deterministic under any partitioning.
    *
    * Scale: one user-key window + one session group-by; the sequence
    * string lives only inside its own session row. Pathological sessions
    * (bot streams) are the caller's gap/cap decision — compose with
    * [[graft.operators.Sampling.quotaCap]] upstream when needed.
    */
  def sessionSequences(events: DataFrame, userCol: String,
      tsSecCol: String, orderCol: String, typeCol: String, gapSecs: Long,
      topK: Int = 100): DataFrame = {
    withSessionIdx(events, userCol, tsSecCol, orderCol, gapSecs)
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(col(tsSecCol)) - min(col(tsSecCol))).as("duration_secs"),
        expr(s"array_join(transform(array_sort(collect_list(" +
          s"struct($tsSecCol, $orderCol, $typeCol))), x -> x.$typeCol)," +
          " '>')").as("sequence"))
      .orderBy(col("n_events").desc, col(userCol), col("session_idx"))
      .limit(topK)
  }
}

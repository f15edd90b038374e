package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.sources.GraftTable

/** Structured Streaming surface. The reference engine has no true streaming
  * (SURVEY.md §2.10) — ingestion is micro-batched appends + a digest pass —
  * so this module is the Spark-native extension: the same time-bucketed
  * aggregation semantics as the batch DSL, but incremental, with
  * watermark-bounded state, plus a stateful sessionizer and a streaming
  * digest loop that feeds [[GraftTable]].
  */
object Streams {

  /** Streaming version of the DSL's time-bucket aggregation
    * (`-time -time-bucket S` — aggregate.go:145-183): tumbling windows over
    * an epoch-seconds column, watermarked so state is bounded. Late rows
    * beyond the watermark are dropped — semantics batch sybil never needed,
    * declared here explicitly.
    */
  def timeBucketCounts(
      events: DataFrame,
      tsCol: String,
      groupCols: Seq[String],
      valueCol: String,
      bucketSecs: Long,
      watermark: String = "10 minutes"): DataFrame =
    events
      .withColumn("__ts", timestamp_seconds(col(tsCol).cast(LongType)))
      .withWatermark("__ts", watermark)
      .groupBy(window(col("__ts"), s"$bucketSecs seconds") +: groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("Count"),
        sum(col(valueCol).cast(DecimalType(38, 6))).cast(DoubleType).as("sum_value"))
      .select(
        col("window.start").cast(LongType).as("time_bucket") +:
          groupCols.map(col) :+ col("Count") :+ col("sum_value"): _*)

  /** Streaming version of the DSL's `-op hist`: per (window, group), the
    * full mergeable histogram ([[graft.functions.BasicHist]]) computed
    * incrementally — the Aggregator's merge law (spec-verified associative
    * and order-insensitive) is exactly what the state store needs, so the
    * SAME bucket math serves batch queries, cached per-block partials, and
    * streams. Extents come from the table sidecar like every batch hist
    * (the reference reads stored IntInfo, table_column_info.go).
    */
  def timeBucketHist(
      events: DataFrame,
      tsCol: String,
      groupCols: Seq[String],
      valueCol: String,
      bucketSecs: Long,
      infoMin: Long,
      infoMax: Long,
      watermark: String = "10 minutes"): DataFrame =
    events
      .withColumn("__ts", timestamp_seconds(col(tsCol).cast(LongType)))
      .withWatermark("__ts", watermark)
      .groupBy(window(col("__ts"), s"$bucketSecs seconds") +: groupCols.map(col): _*)
      .agg(graft.functions.BasicHist.hist(
        col(valueCol).cast(LongType), lit(1L), infoMin, infoMax).as("h"))
      .select(
        col("window.start").cast(LongType).as("time_bucket") +:
          groupCols.map(col) :+ col("h.count").as("Count") :+
          col("h.mean").as("mean") :+ col("h.percentiles")(50).as("p50"): _*)

  case class SessionUpdate(key: String, events: Long, firstSeen: Long, lastSeen: Long, closed: Boolean)

  /** Per-key session state via mapGroupsWithState: counts events per key,
    * closes the session after `gapSecs` of processing-time silence. The
    * custom-state extension point the reference's Lua stub never delivered
    * (config.go:28 ENABLE_LUA=false).
    */
  def sessionize(
      events: Dataset[(String, Long)], // (key, epoch seconds)
      gapSecs: Long,
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout)
      : Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    val timed = timeout == GroupStateTimeout.ProcessingTimeTimeout
    // only the processing-time flavor arms the gap-close timer;
    // EventTimeTimeout would be silently ignored (sessions never close,
    // state grows forever on an unbounded key space) — reject it loudly.
    // NoTimeout is allowed as an explicit never-auto-close choice for
    // bounded key spaces.
    require(timed || timeout == GroupStateTimeout.NoTimeout,
      s"sessionize supports ProcessingTimeTimeout (gap-close) or an " +
        s"explicit NoTimeout; $timeout would silently never close sessions")
    events
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long, Long), SessionUpdate](timeout) {
        case (key, rows, state: GroupState[(Long, Long, Long)]) =>
          if (state.hasTimedOut) {
            val (n, first, last) = state.get
            state.remove()
            SessionUpdate(key, n, first, last, closed = true)
          } else {
            val ts = rows.map(_._2).toSeq
            val (n0, first0, last0) = state.getOption.getOrElse((0L, Long.MaxValue, 0L))
            val next = (n0 + ts.size, math.min(first0, ts.min), math.max(last0, ts.max))
            state.update(next)
            if (timed) state.setTimeoutDuration(gapSecs * 1000)
            SessionUpdate(key, next._1, next._2, next._3, closed = false)
          }
      }
  }

  /** Streaming exact dedup: drop any document whose content hash was
    * already seen inside the watermark horizon — the incremental version of
    * [[graft.operators.Dedup.exactDedup]] for a training-data ingest
    * pipeline. State is the set of hashes within the watermark (bounded;
    * Spark evicts expired keys), keyed by the SAME md5 content hash as the
    * batch operator so batch backfill and streaming ingest agree on what
    * counts as a duplicate.
    */
  def streamingDedup(
      docs: DataFrame,
      tsCol: String,
      textCol: String,
      watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("__ts", timestamp_seconds(col(tsCol).cast(LongType)))
      .withColumn("content_hash", md5(col(textCol)))
      .withWatermark("__ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Streaming duplicate-rate monitor: per event-time window, how many
    * incoming documents repeat content ALREADY ADMITTED inside the
    * watermark horizon — the live twin of the batch dup-fraction audits
    * (q161's `exact_dup_frac`): a crawler loop or a re-queued shard
    * shows up as a dup-rate spike in the window it happens, not in next
    * week's batch sweep. Composes the two bounded-state primitives:
    * [[streamingDedup]]'s keep-side count vs the raw per-window count —
    * `n_dups = n_docs − n_kept`, `dup_frac` one IEEE division.
    *
    * Returned as TWO streaming frames `(raw, kept)` aggregated on the
    * same windows; the caller joins them on `window_start` at sink time
    * (two independent watermarked aggs — Spark disallows a stream-stream
    * join above a dropDuplicates in one query, and the sink-side join of
    * two complete window rows is exact).
    */
  def streamingDupRate(
      docs: DataFrame,
      tsCol: String,
      textCol: String,
      windowLen: String = "10 minutes",
      watermark: String = "1 hour"): (DataFrame, DataFrame) = {
    def windowed(df: DataFrame, cnt: String): DataFrame = df
      .groupBy(window(col("__ts"), windowLen).as("__w"))
      .agg(count(lit(1)).as(cnt))
      .select(col("__w.start").as("window_start"), col(cnt))
    val base = docs
      .withColumn("__ts", timestamp_seconds(col(tsCol).cast(LongType)))
      .withColumn("content_hash", md5(col(textCol)))
      .withWatermark("__ts", watermark)
    val raw = windowed(base, "n_docs")
    val kept = windowed(
      base.dropDuplicatesWithinWatermark("content_hash"), "n_kept")
    (raw, kept)
  }

  /** Streaming decontamination: per incoming document, count distinct
    * n-grams shared with a STATIC benchmark set — the stream-static join
    * form of [[graft.operators.Decontam.overlapWithBenchmark]], for
    * quarantining eval-set overlap at ingest time instead of in a batch
    * sweep. The benchmark side is a bounded static table, so Spark plans
    * a stateless per-micro-batch join (no streaming state at all);
    * with the benchmark hash set broadcast, each micro-batch is one
    * map-side pass. Uses the SAME `graft_shingle_hash` n-gram hashing as
    * the batch operator, so batch backfill and live tail agree on what
    * counts as contamination.
    */
  def decontamStream(
      docs: DataFrame,        // streaming: (id, ts, text, ...)
      benchmark: DataFrame,   // static: (id, text, ...)
      idCol: String,
      tsCol: String,          // epoch-seconds ingest time
      textCol: String,
      n: Int,
      watermark: String = "1 hour"): DataFrame = {
    val benchNgrams = benchmark
      .select(explode(call_function("graft_shingle_hash",
        split(col(textCol), " "), lit(n))).as("__ng"))
      .distinct()
    // mirror the batch operator's id exclusion (Decontam
    // .overlapWithBenchmark): a doc sharing an id with a benchmark row is
    // excluded there, and the stream must agree for the documented
    // batch-backfill parity to hold
    val benchIds = benchmark.select(col(idCol)).distinct()
    docs
      .withColumn("__ts", timestamp_seconds(col(tsCol).cast(LongType)))
      .withWatermark("__ts", watermark)
      .join(broadcast(benchIds), Seq(idCol), "left_anti")
      .select(col(idCol), col("__ts"),
        explode(call_function("graft_shingle_hash",
          split(col(textCol), " "), lit(n))).as("__ng"))
      .join(broadcast(benchNgrams), Seq("__ng"))
      // watermarked window bounds the aggregation state (a doc's n-grams
      // all carry its own ingest ts, so each doc lands in one window)
      .groupBy(window(col("__ts"), watermark), col(idCol))
      .agg(count(lit(1)).as("overlap_ngrams"))
      .select(col(idCol), col("overlap_ngrams"))
  }

  /** Streaming per-key quota cap: admit the first `k` rows of each key in
    * ARRIVAL order — the incremental twin of
    * [[graft.operators.Sampling.quotaCap]]. Semantics differ by necessity
    * and by design: a stream cannot rank rows it has not seen, so the
    * batch form caps by a global order and this caps by arrival; a
    * backfill then live-tail pipeline runs the batch cap over history and
    * this over the tail. State per key is ONE long (admitted count) —
    * bounded by the number of keys, not rows.
    */
  def streamingQuotaCap(
      rows: Dataset[(String, Long)], // (key, payload id)
      k: Long): Dataset[(String, Long)] = {
    import rows.sparkSession.implicits._
    rows
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (String, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, batch, state: GroupState[Long]) =>
          val admitted = state.getOption.getOrElse(0L)
          // clamp before toInt: a quota past Int.MaxValue would truncate
          // NEGATIVE and admit nothing at all
          val room = (k - admitted).max(0L).min(Int.MaxValue.toLong).toInt
          val take = batch.take(room).toSeq
          state.update(admitted + take.size)
          take.iterator
      }
  }

  /** Gap-based sessions via Spark's NATIVE `session_window` (the built-in
    * alternative to the [[sessionize]] mapGroupsWithState formulation):
    * watermark-bounded merging session state, append-mode emission once a
    * session can no longer grow. Boundary semantics: `session_window`
    * SPLITS at `next - prev == gap` (windows touch but don't overlap)
    * where the batch [[graft.operators.Events.sessionize]] keeps them
    * together (`> gap` splits) — identical for every non-boundary gap,
    * asserted by the parity spec.
    *
    * Output: `(user, session_start, session_end_excl, n_events)`;
    * `session_end_excl` is the window end (last event + gap).
    */
  def sessionWindowCounts(events: DataFrame, userCol: String,
      tsSecCol: String, gapSecs: Long,
      watermark: String = "10 seconds"): DataFrame =
    events
      .withColumn("__ts", timestamp_seconds(col(tsSecCol).cast(LongType)))
      .withWatermark("__ts", watermark)
      .groupBy(col(userCol), session_window(col("__ts"), s"$gapSecs seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col(userCol),
        col("session_window.start").cast(LongType).as("session_start"),
        col("session_window.end").cast(LongType).as("session_end_excl"),
        col("n_events"))

  /** Streaming rate-anomaly scoring over CLOSED buckets: feed the
    * append-mode output of a watermarked bucket aggregation (e.g.
    * [[timeBucketCounts]]) and each finalized `(type, bucket, cnt)` row is
    * z-scored against the type's previous `lookback` bucket rows — the
    * incremental twin of [[graft.operators.Events.rateAnomalies]], same
    * exact-integer sums and IEEE formula, so scores are bit-identical to
    * the batch operator given the same closed buckets in bucket order
    * (spec-asserted). Gaps are densified like the batch form: when a new
    * bucket arrives `g` steps past the last one, the `g - 1` empty
    * buckets in between are synthesized, SCORED (a rate collapsing to
    * zero is the canonical anomaly), and enter the trailing ring. State
    * per type is a ring of `lookback` (bucket, count) pairs — bounded,
    * independent of stream length.
    */
  def streamingRateAnomalies(
      counts: Dataset[(String, Long, Long)], // (type, closed bucket, count)
      bucketSecs: Long,
      lookback: Int,
      zThreshold: Double): Dataset[(String, Long, Long, Double, Long)] = {
    import counts.sparkSession.implicits._
    counts
      .groupByKey(_._1)
      .flatMapGroupsWithState[Seq[(Long, Long)], (String, Long, Long, Double, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (key, batch, state: GroupState[Seq[(Long, Long)]]) =>
          var hist = state.getOption.getOrElse(Seq.empty)
          def score(b: Long, c: Long): Option[(String, Long, Long, Double, Long)] = {
            val trailing = hist.filter(_._1 < b).takeRight(lookback)
            val res =
              if (trailing.size == lookback) {
                val n = lookback.toDouble
                val s = trailing.map(_._2).sum
                val ss = trailing.map(x => x._2 * x._2).sum
                val mean = s.toDouble / n
                val variance = (ss.toDouble - s.toDouble * s / n) / n
                val std = math.sqrt(variance)
                val z = if (std > 0) (c.toDouble - mean) / std else 0.0
                val anomaly =
                  if (std > 0) { if (math.abs(z) > zThreshold) 1L else 0L }
                  else { if (c.toDouble != mean) 1L else 0L }
                Some((key, b, c, z, anomaly))
              } else None
            hist = (hist :+ (b, c)).sortBy(_._1).takeRight(lookback)
            res
          }
          val out = batch.toSeq.sortBy(_._2).flatMap { case (_, b, c) =>
            // densify the gap since the last seen bucket with zero counts
            val zeros = hist.lastOption.toSeq.flatMap { case (last, _) =>
              ((last + bucketSecs) until b by bucketSecs)
                .flatMap(zb => score(zb, 0L))
            }
            zeros ++ score(b, c)
          }
          state.update(hist)
          out.iterator
      }
  }

  /** Streaming heavy hitters: a live Misra-Gries summary per key — the
    * incremental twin of the batch
    * [[graft.functions.MisraGriesAggregator]], sharing its reduce/merge
    * code, so the batch guarantee carries over (est ≤ true ≤ est +
    * n/(capacity+1) over everything the stream has seen). Each
    * micro-batch folds its tokens into the key's bounded buffer and
    * emits the refreshed summary (Update mode). State per key is at most
    * `capacity` counters — bounded regardless of vocabulary size, which
    * is the only viable shape for an unbounded stream (exact counts per
    * token would grow state with the vocabulary forever).
    */
  def streamingHeavyHitters(
      tokens: Dataset[(String, String)], // (group key, token)
      capacity: Int): Dataset[(String, String, Long)] = {
    import tokens.sparkSession.implicits._
    val agg = new graft.functions.MisraGriesAggregator(capacity)
    tokens
      .groupByKey(_._1)
      .flatMapGroupsWithState[graft.functions.MGBuf, (String, String, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (key, batch, state: GroupState[graft.functions.MGBuf]) =>
          val buf = batch.map(_._2).foldLeft(state.getOption.getOrElse(agg.zero))(agg.reduce)
          state.update(buf)
          agg.finish(buf).iterator.map(e => (key, e.item, e.count))
      }
  }

  /** Streaming Count-Min sketch per window: the live twin of the batch
    * [[graft.functions.CmsAggregator]] — the same mergeable depth×width
    * matrix accumulates inside a watermarked windowed agg, so the state
    * store holds one fixed-size matrix per window, never per-item counts
    * (the vocabulary can be unbounded; the state cannot). Point
    * estimates on the emitted matrix use the identical md5 bucketing as
    * batch, so live and backfill estimates agree exactly for the same
    * data.
    */
  def streamingCms(
      items: DataFrame, // (tsCol, itemCol)
      tsCol: String,
      itemCol: String,
      bucketSecs: Long,
      depth: Int,
      width: Int,
      watermark: String = "10 minutes"): DataFrame =
    items
      .withColumn("__ts", timestamp_seconds(col(tsCol).cast(LongType)))
      .withWatermark("__ts", watermark)
      .groupBy(window(col("__ts"), s"$bucketSecs seconds"))
      .agg(graft.functions.CmsSketch.sketch(col(itemCol), depth, width).as("m"))
      .select(col("window.start").cast(LongType).as("time_bucket"), col("m"))

  /** Streaming windowed distinct-count ESTIMATES: a DataSketches HLL
    * sketch per window (`hll_sketch_agg` — the same sketch as the DSL's
    * approx distinct and the query cache's distinct partials), estimated
    * on emit. Streaming `COUNT(DISTINCT)` is unsupported and an exact
    * per-window set would grow state with cardinality; the sketch is the
    * bounded-state answer, and because union/merge is register-wise max,
    * the streamed estimate equals the batch estimate for the same rows
    * exactly (spec).
    */
  def streamingDistinct(
      items: DataFrame, // (tsCol, itemCol)
      tsCol: String,
      itemCol: String,
      bucketSecs: Long,
      watermark: String = "10 minutes"): DataFrame =
    items
      .withColumn("__ts", timestamp_seconds(col(tsCol).cast(LongType)))
      .withWatermark("__ts", watermark)
      .groupBy(window(col("__ts"), s"$bucketSecs seconds"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col(itemCol))).as("n_distinct"))
      .select(col("window.start").cast(LongType).as("time_bucket"),
        col("n_distinct"))

  /** Streaming distribution-drift monitor: the live twin of
    * [[graft.core.Stats.driftReport]]. Each event-time window's values
    * are binned onto a FIXED equal-width grid (`vmin`/`vmax`/`bins` come
    * from a batch profile — a stream cannot know its global extremes, and
    * drift must be read off a stable grid anyway) inside ONE watermarked
    * aggregation that builds the whole bin vector as `bins` conditional
    * sums — streaming forbids a second aggregation over a per-(window,
    * bin) rollup, and the vector form keeps state at one fixed-width row
    * per window. The total-variation distance against the `baseline` bin
    * shares (broadcast as plan literals) is then a pure projection:
    * `TVD = ½ Σ |cnt_i/n − baseline_i|`, evaluated in one fixed fold
    * order, so live and batch-backfill reports agree bit-for-bit for the
    * same rows (spec).
    *
    * Output per closed window: `(time_bucket, n, tvd, bin_counts)`.
    */
  def streamingDrift(
      events: DataFrame, // (tsCol, valueCol)
      tsCol: String,
      valueCol: String,
      bucketSecs: Long,
      vmin: Double,
      vmax: Double,
      baseline: Seq[Double],
      watermark: String = "10 minutes"): DataFrame = {
    val bins = baseline.size
    require(bins >= 1, "streamingDrift: baseline must have >= 1 bins")
    require(vmax > vmin, "streamingDrift: vmax must exceed vmin")
    // clamp BOTH ends of the profiled grid: live values can fall outside
    // the batch profile's [vmin, vmax] in either direction, and a negative
    // bin would match no count column — below-range rows (downward drift,
    // the monitor's main quarry) would silently vanish from n and the TVD
    val bin = greatest(lit(0L), least(lit(bins - 1L),
      floor(((col(valueCol) - lit(vmin)) / (lit(vmax) - lit(vmin))) *
        lit(bins.toDouble)).cast(LongType)))
    val counts = (0 until bins).map(i =>
      sum(when(col("__bin") === i, 1L).otherwise(0L)).as(s"__c$i"))
    val n = (0 until bins).map(i => col(s"__c$i")).reduce(_ + _)
    val tvd = (0 until bins).map { i =>
      abs(when(col("n") > 0, col(s"__c$i").cast("double") / col("n"))
        .otherwise(lit(0.0)) - lit(baseline(i)))
    }.reduce(_ + _) * lit(0.5)
    events
      // null values would bin into the TOP bin (least/greatest skip null
      // operands), inflating its share and firing spurious drift alarms —
      // a distribution profile ranges over observed values (the ksDrift
      // discipline)
      .filter(col(valueCol).isNotNull)
      .withColumn("__ts", timestamp_seconds(col(tsCol).cast(LongType)))
      .withColumn("__bin", bin)
      .withWatermark("__ts", watermark)
      .groupBy(window(col("__ts"), s"$bucketSecs seconds"))
      .agg(counts.head, counts.tail: _*)
      .withColumn("n", n)
      .select(col("window.start").cast(LongType).as("time_bucket"),
        col("n"), tvd.as("tvd"),
        array((0 until bins).map(i => col(s"__c$i")): _*).as("bin_counts"))
  }

  /** Streaming digest loop: drain a JSON-lines directory into a GraftTable
    * with `Trigger.AvailableNow` — the reference's `sybil digest` cycle
    * (table_ingest.go:287-331) as an incremental job with checkpointed
    * progress instead of file locks.
    *
    * Exactly-once: `foreachBatch` re-runs a batch whose checkpoint commit
    * didn't land, so the append goes through
    * [[GraftTable.ingestIdempotent]] keyed on (checkpoint, batchId) — a
    * replayed batch is a no-op instead of a duplicate segment. The digest
    * runs AFTER the drain completes (never between a crash and its
    * replay), which is the ordering the idempotency contract needs.
    */
  def digestStream(
      spark: SparkSession,
      srcDir: String,
      table: GraftTable,
      checkpoint: String,
      schema: org.apache.spark.sql.types.StructType): Unit = {
    val q = spark.readStream
      .schema(schema)
      .json(srcDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          table.ingestIdempotent(batch, s"$checkpoint#$batchId"); ()
        }
      }
      .start()
    q.awaitTermination()
    table.digest()
  }

  /** Streaming vocabulary-coverage (OOV-rate) monitor: the live twin of
    * [[graft.operators.TextAnalysis.vocabCoverage]]. The vocabulary is a
    * FIXED static frame (one `token` column — from a batch top-V build or
    * the tokenizer's actual vocab file): a stream cannot rank its own
    * global top-V, and a drifting cut would make windows incomparable —
    * same reasoning as [[streamingDrift]]'s fixed grid. Per event-time
    * window: total token occurrences, OOV occurrences, and the OOV
    * fraction (exact counts, one IEEE division — equal to the batch
    * formula on the same rows, spec-asserted).
    *
    * Scale shape: tokens explode scan-side; the vocabulary joins as a
    * stream-static broadcast hash join (bounded at V rows — tokenizer
    * vocabs are 32k–256k); the windowed aggregation keeps three longs
    * per open window. A rising OOV rate is the live signal that the
    * incoming crawl drifted away from the tokenizer.
    */
  def streamingOovRate(
      docs: DataFrame, // (tsCol, textCol)
      tsCol: String,
      textCol: String,
      vocab: DataFrame, // static, one `token` column
      bucketSecs: Long,
      watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("__ts", timestamp_seconds(col(tsCol).cast(LongType)))
      .withWatermark("__ts", watermark)
      .select(col("__ts"), explode(split(col(textCol), " ")).as("token"))
      // defensive distinct: a duplicate vocab token would multiply joined
      // rows, inflating n_tokens and deflating oov_frac (vocabCoverage's
      // vocab is distinct by construction; a caller-supplied file may
      // not be)
      .join(broadcast(vocab.select(col("token")).distinct()
          .withColumn("__in", lit(1L))),
        Seq("token"), "left")
      .groupBy(window(col("__ts"), s"$bucketSecs seconds"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("window.start").cast(LongType).as("time_bucket"),
        col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens").cast("double"))
          .as("oov_frac"))

  /** Continuous table writer: append every micro-batch of `stream` to a
    * [[GraftTable]], exactly-once under replays (idempotent token =
    * (checkpoint, batchId)). Returns the running query — callers own its
    * lifecycle and when to `digest()` (compaction must not interleave with
    * a crashed-but-unreplayed batch; see [[GraftTable.ingestIdempotent]]).
    */
  def writeToTable(stream: DataFrame, table: GraftTable, checkpoint: String,
      outputMode: OutputMode = OutputMode.Append())
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      // configurable: a raw event stream appends, but an aggregated stream
      // needs Update/Complete for analysis to accept it — foreachBatch
      // handles any of them (each micro-batch lands as one segment)
      .outputMode(outputMode)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          table.ingestIdempotent(batch, s"$checkpoint#$batchId"); ()
        }
      }
      .start()
}

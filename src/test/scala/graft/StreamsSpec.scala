package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

import graft.sources.GraftTable
import graft.streaming.Streams

/** Structured Streaming extensions: windowed agg parity with the batch
  * time-bucket op, stateful sessionization, streaming digest. */
class StreamsSpec extends SparkSpec {
  import spark.implicits._

  test("streaming time-bucket agg matches the batch result") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String, Double)]
    val base = 1700000000L
    val rows = (0 until 300).map(i => (base + i * 10, s"t${i % 3}", i.toDouble))
    mem.addData(rows: _*)
    val streamDf = mem.toDF().toDF("ts_sec", "event_type", "value")
    val out = Streams.timeBucketCounts(streamDf, "ts_sec", Seq("event_type"), "value", 300)
    val q = out.writeStream.format("memory").queryName("tb")
      .outputMode(OutputMode.Update()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("tb")
      .groupBy("time_bucket", "event_type").agg(max("Count").as("Count"), max("sum_value").as("sum_value"))
    val batch = rows.toDF("ts_sec", "event_type", "value")
      .groupBy((expr("ts_sec div 300") * 300).as("time_bucket"), col("event_type"))
      .agg(count(lit(1)).as("Count"),
        sum(col("value").cast(DecimalType(38, 6))).cast(DoubleType).as("sum_value"))
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming hist matches the batch hist (incremental merge parity)") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String, Double)]
    val base = 1700000000L
    val rows = (0 until 400).map(i => (base + i * 5, s"t${i % 2}", (i % 97).toDouble))
    // two adds → at least two micro-batches → the state store must MERGE
    // partial HistBufs, not just fold rows into one buffer
    mem.addData(rows.take(150): _*)
    val streamDf = mem.toDF().toDF("ts_sec", "event_type", "value")
    val out = Streams.timeBucketHist(streamDf, "ts_sec", Seq("event_type"),
      "value", bucketSecs = 600, infoMin = 0L, infoMax = 96L)
    val q = out.writeStream.format("memory").queryName("tbh")
      .outputMode(OutputMode.Update()).start()
    q.processAllAvailable()
    mem.addData(rows.drop(150): _*)
    q.processAllAvailable()
    q.stop()
    // Update mode re-emits refined rows: keep the final value per key —
    // the emission with the largest Count (counts only grow; last() after
    // a groupBy shuffle would be non-deterministic)
    val streamed = spark.table("tbh")
      .groupBy("time_bucket", "event_type")
      .agg(max("Count").as("Count"), expr("max_by(mean, Count)").as("mean"),
        expr("max_by(p50, Count)").as("p50"))
    val batch = rows.toDF("ts_sec", "event_type", "value")
      .groupBy((expr("ts_sec div 600") * 600).as("time_bucket"), col("event_type"))
      .agg(graft.functions.BasicHist.hist(col("value").cast(LongType), lit(1L), 0L, 96L).as("h"))
      .select(col("time_bucket"), col("event_type"), col("h.count").as("Count"),
        col("h.mean").as("mean"), col("h.percentiles")(50).as("p50"))
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("sessionize keeps per-key running counts") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    mem.addData(("a", 10L), ("a", 20L), ("b", 5L))
    // NoTimeout keeps the test deterministic (ProcessingTimeTimeout's
    // timer-driven batches don't settle under processAllAvailable)
    val out = Streams.sessionize(mem.toDS(), gapSecs = 60,
      timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Update()).start()
    q.processAllAvailable()
    mem.addData(("a", 30L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sess").as[Streams.SessionUpdate].collect()
    val aFinal = rows.filter(_.key == "a").maxBy(_.events)
    assert(aFinal.events === 3 && aFinal.firstSeen === 10 && aFinal.lastSeen === 30)
    assert(rows.filter(_.key == "b").map(_.events).max === 1)
  }

  test("streaming dedup drops repeated content within the watermark") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val base = 1700000000L
    mem.addData(
      (1L, base, "the quick brown fox"),
      (2L, base + 5, "the quick brown fox"), // exact dup of 1
      (3L, base + 9, "something else entirely"))
    val streamDf = mem.toDF().toDF("doc_id", "ts_sec", "text")
    val out = Streams.streamingDedup(streamDf, "ts_sec", "text")
    val q = out.writeStream.format("memory").queryName("sdedup")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("sdedup").select("doc_id").as[Long].collect().sorted
    assert(ids.toSeq === Seq(1L, 3L)) // dup doc 2 dropped
  }

  test("streaming dup rate: window counts reconcile to the batch dup audit") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val base = 1700000000L // window-aligned epoch
    // window 1: 3 docs, one dup pair -> 1 dup; window 2: 2 docs, 0 dups
    // (same content as window 1 but still inside the 1h watermark state,
    // so it is a dup of ADMITTED content -> counted)
    mem.addData(
      (1L, base, "aaa"), (2L, base + 10, "aaa"), (3L, base + 20, "bbb"),
      (4L, base + 600, "ccc"), (5L, base + 610, "aaa"))
    val streamDf = mem.toDF().toDF("doc_id", "ts_sec", "text")
    val (raw, kept) = Streams.streamingDupRate(
      streamDf, "ts_sec", "text", windowLen = "10 minutes")
    def run(df: org.apache.spark.sql.DataFrame, name: String) = {
      val q = df.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Complete()).start()
      q.processAllAvailable(); q.stop()
      spark.table(name).collect()
        .map(r => r.getTimestamp(0).getTime / 1000 -> r.getLong(1)).toMap
    }
    val rawM = run(raw, "sdup_raw")
    val keptM = run(kept, "sdup_kept")
    val w1 = base - base % 600
    val w2 = w1 + 600
    assert(rawM(w1) === 3L && rawM(w2) === 2L)
    assert(keptM(w1) === 2L, "the in-window dup is dropped")
    assert(keptM(w2) === 1L,
      "content admitted in an earlier window still counts as dup state")
    // sink-side reconciliation: n_dups = n_docs - n_kept per window
    assert(rawM(w1) - keptM(w1) === 1L && rawM(w2) - keptM(w2) === 1L)
  }

  test("streaming decontam matches the batch overlap counts (stream-static join)") {
    implicit val sq = spark.sqlContext
    val bench = Seq((100L, "alpha beta gamma delta"), (101L, "one two three four"))
      .toDF("doc_id", "text")
    val docRows = Seq(
      (1L, "alpha beta gamma delta epsilon"), // shares 3-grams with bench
      (2L, "zero one two three four five"),   // shares with bench doc 101
      (3L, "nothing in common here at all"),  // no overlap -> absent
      // shares an ID with a benchmark row: the batch operator's anti-join
      // excludes it, and the stream must agree despite the full overlap
      (100L, "alpha beta gamma delta"))
    val base = 1700000000L
    val mem = MemoryStream[(Long, Long, String)]
    mem.addData(docRows.map { case (id, t) => (id, base, t) }: _*)
    val streamDf = mem.toDF().toDF("doc_id", "ts_sec", "text")
    val out = Streams.decontamStream(streamDf, bench, "doc_id", "ts_sec",
      "text", n = 3)
    val q = out.writeStream.format("memory").queryName("sdecon")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    // append mode emits a window only once the watermark passes its end:
    // push a far-future row (no benchmark overlap) to advance the watermark
    mem.addData((99L, base + 100000L, "watermark flush row"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sdecon").as[(Long, Long)].collect().toMap
    val expected = graft.operators.Decontam.overlapWithBenchmark(
        docRows.toDF("doc_id", "text"), bench, "doc_id", "text", n = 3)
      .as[(Long, Long)].collect().toMap
    assert(got === expected)
    assert(expected.keySet === Set(1L, 2L)) // doc 3 absent from both
  }

  test("streaming quota cap admits first k per key across micro-batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    // batch 1: a gets 2, b gets 1; batch 2: a gets 2 more (only 1 admitted
    // — state must carry the count across micro-batches), b gets 1 more
    mem.addData(("a", 1L), ("a", 2L), ("b", 10L))
    val out = Streams.streamingQuotaCap(mem.toDS(), k = 3)
    val q = out.toDF("key", "id").writeStream.format("memory")
      .queryName("sqcap").outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    mem.addData(("a", 3L), ("a", 4L), ("b", 11L))
    q.processAllAvailable()
    q.stop()
    val admitted = spark.table("sqcap").as[(String, Long)].collect().sorted
    assert(admitted.toSeq === Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 10L), ("b", 11L)))
  }

  test("streaming digest drains a json dir into a GraftTable") {
    val src = SparkSpec.tempDir("graft-stream-src")
    val ckpt = SparkSpec.tempDir("graft-stream-ckpt")
    val root = SparkSpec.tempDir("graft-stream-table")
    Files.writeString(src.resolve("a.jsonl"),
      (0 until 100).map(i => s"""{"id":$i,"k":"x"}""").mkString("\n"))
    Files.writeString(src.resolve("b.jsonl"),
      (100 until 150).map(i => s"""{"id":$i,"k":"y"}""").mkString("\n"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("k", StringType)))
    val table = new GraftTable(spark, root.toString)
    Streams.digestStream(spark, src.toString, table, ckpt.toString, schema)
    assert(table.read().count() === 150)
    assert(table.info().rowCount === 150)
  }

  test("writeStreamInto: continuous ingest sink — exactly-once batches, " +
      "periodic digest, consistent reads (the reference's steady-ingest " +
      "loop as a Structured Streaming sink)") {
    implicit val sq = spark.sqlContext
    val ckpt = SparkSpec.tempDir("graft-sink-ckpt")
    val root = SparkSpec.tempDir("graft-sink-table")
    val table = new GraftTable(spark, root.toString)
    val mem = MemoryStream[(Long, String)]
    val q = table.writeStreamInto(mem.toDF().toDF("id", "k"),
      ckpt.toString, digestEvery = 2,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      // 4 micro-batches of 50 → 200 rows; digest fires after batches 1,3
      for (b <- 0 until 4) {
        mem.addData((0 until 50).map(i => ((b * 50 + i).toLong, s"u${i % 3}")): _*)
        q.processAllAvailable()
      }
      assert(table.read(readLog = true).count() === 200)
      assert(table.blockIds.nonEmpty, "periodic digest must have compacted")
      // the sidecar agrees (stats ride the stream writes)
      assert(table.info().rowCount === 200)
      val idInfo = table.info().columns.find(_.name == "id").get
      assert(idInfo.min.contains(0L) && idInfo.max.contains(199L))
    } finally q.stop()
    // replay simulation: the sink's token is the checkpointed batchId —
    // re-running an already-ingested batch id is a no-op (the crash-
    // between-commit-and-checkpoint case foreachBatch re-delivers)
    import spark.implicits._
    assert(!table.ingestIdempotent(
      (0 until 50).map(i => (i.toLong, s"u${i % 3}")).toDF("id", "k"),
      "stream#0"))
    assert(table.read(readLog = true).count() === 200, "replay must not double-count")
    // DSL query over the streamed table
    val counts = graft.dsl.SybilQuery().groupBy("k")
      .run(table.read(readLog = true))
      .collect().map(r => r.getAs[String]("k") -> r.getAs[Long]("Count")).toMap
    assert(counts.values.sum === 200)
  }

  test("native session_window stream matches batch sessionize (non-boundary gaps)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val base = 1700000000L
    // two users, gaps strictly <> 60 so both formulations agree
    val rows = Seq(
      ("a", base), ("a", base + 30), ("a", base + 50),      // session 1 (3)
      ("a", base + 200), ("a", base + 210),                 // session 2 (2)
      ("b", base + 10), ("b", base + 300))                  // two singletons
    val mem = MemoryStream[(String, Long)]
    val out = Streams.sessionWindowCounts(
      mem.toDF().toDF("user", "ts_sec"), "user", "ts_sec", gapSecs = 60L)
    val q = out.writeStream.format("memory").queryName("sess_native")
      .outputMode("append").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    // advance the watermark far past every session so append mode emits all
    mem.addData(("zz", base + 100000))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql(
      "SELECT user, session_start, n_events FROM sess_native WHERE user <> 'zz'")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.operators.Events.sessionize(
      rows.toDF("user", "ts_sec"), "user", "ts_sec", "ts_sec", 60L)
      .select(col("user"), col("session_start"), col("n_events"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(batch == Set(("a", base, 3L), ("a", base + 200, 2L),
      ("b", base + 10, 1L), ("b", base + 300, 1L)))
  }

  test("streaming rate anomalies match the batch scorer bit-for-bit on closed buckets") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rnd = new scala.util.Random(9)
    // per-type bucket counts with a planted spike AND a planted outage
    // (buckets 10-11 have no events at all -> densified zeros, scored)
    val buckets = (0 until 30).filterNot(i => i == 10 || i == 11).map { i =>
      ("click", i * 3600L, if (i == 20) 500L else 40L + rnd.nextInt(5)) }
    val raw = buckets.flatMap { case (t, b, c) =>
      (0 until c.toInt).map(j => (t, b + j % 3600)) }
    val mem = MemoryStream[(String, Long, Long)]
    val out = Streams.streamingRateAnomalies(mem.toDS(), bucketSecs = 3600L,
      lookback = 6, zThreshold = 2.0)
    val q = out.writeStream.format("memory").queryName("sra")
      .outputMode("append").start()
    // two micro-batches split mid-series: state must carry across
    mem.addData(buckets.take(15): _*)
    q.processAllAvailable()
    mem.addData(buckets.drop(15): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql("SELECT * FROM sra").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4))).toSet
    val batch = graft.operators.Events.rateAnomalies(
      raw.toDF("event_type", "ts_sec"), "event_type", "ts_sec",
      bucketSecs = 3600L, lookback = 6, zThreshold = 2.0)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4))).toSet
    assert(streamed == batch)
    assert(streamed.exists { case (_, b, _, _, a) => b == 20 * 3600L && a == 1L },
      "the planted spike must be flagged")
    assert(streamed.exists { case (_, b, c, _, a) =>
      b == 10 * 3600L && c == 0L && a == 1L },
      "the outage bucket must be scored as zero and flagged")
  }

  test("streaming heavy hitters keeps the MG guarantee across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val out = Streams.streamingHeavyHitters(mem.toDS(), capacity = 5)
    val q = out.writeStream.format("memory").queryName("shh")
      .outputMode("update").start()
    // batch 1: "hot" dominates; batch 2 shifts the distribution
    mem.addData((0 until 50).map(i => ("g", if (i % 2 == 0) "hot" else s"w$i")): _*)
    q.processAllAvailable()
    mem.addData((0 until 60).map(i => ("g", if (i % 3 == 0) "warm" else "hot")): _*)
    q.processAllAvailable()
    q.stop()
    // latest summary (second batch's emission): guarantee vs exact counts
    val latest = spark.sql(
      "SELECT _2 AS item, MAX(_3) AS est FROM shh GROUP BY _2")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = 110L
    val bound = n / 6
    // exact: hot = 25 + 40 = 65, warm = 20 — both far above n/(cap+1)=18
    assert(latest.contains("hot") && latest.contains("warm"))
    assert(latest("hot") <= 65 && 65 - latest("hot") <= bound)
    assert(latest("warm") <= 20 && 20 - latest("warm") <= bound)
  }

  test("writeToTable appends micro-batches exactly-once into a GraftTable") {
    import spark.implicits._
    val ckpt = SparkSpec.tempDir("graft-w2t-ckpt").toString
    val root = SparkSpec.tempDir("graft-w2t-table").toString
    val table = new GraftTable(spark, root)
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = Streams.writeToTable(mem.toDF().toDF("id", "k"), table, ckpt)
    mem.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    assert(table.read(readLog = true).count() === 2)
    mem.addData((3L, "c"))
    q.processAllAvailable()
    q.stop()
    assert(table.read(readLog = true).count() === 3)
    // a foreachBatch replay of an already-committed batch is a no-op:
    // batch 0's token is in the ledger
    assert(!table.ingestIdempotent(Seq((1L, "a"), (2L, "b")).toDF("id", "k"),
      s"$ckpt#0"))
    assert(table.read(readLog = true).count() === 3)
  }

  test("streaming windowed HLL distinct equals the batch estimate") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val base = 1700000000L
    // duplicates within and across micro-batches: merge must dedup
    val rows = (0 until 400).map(i => (base + i * 3, s"u${i % 57}"))
    mem.addData(rows.take(170): _*)
    val streamDf = mem.toDF().toDF("ts_sec", "uid")
    val out = Streams.streamingDistinct(streamDf, "ts_sec", "uid", 600)
    val q = out.writeStream.format("memory").queryName("sdst")
      .outputMode(OutputMode.Update()).start()
    q.processAllAvailable()
    mem.addData(rows.drop(170): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sdst")
      .groupBy("time_bucket").agg(max("n_distinct").as("n_distinct"))
    val batch = rows.toDF("ts_sec", "uid")
      .groupBy((expr("ts_sec div 600") * 600).as("time_bucket"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(uid))").as("n_distinct"))
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming OOV rate equals the batch coverage formula per window") {
    implicit val sq = spark.sqlContext
    val vocab = Seq("a", "b", "c").toDF("token")
    val base = 1700000000L
    // window 1: 2 docs (7 tokens, 1 OOV); window 2: 1 doc (3 tokens, 2 OOV)
    // split mid-window across micro-batches so state must merge
    val rows = Seq(
      (base + 10L, "a b z c"), (base + 20L, "a a b"),
      (base + 610L, "z q a"))
    val mem = MemoryStream[(Long, String)]
    mem.addData(rows.take(1): _*)
    val streamDf = mem.toDF().toDF("ts_sec", "text")
    val out = Streams.streamingOovRate(streamDf, "ts_sec", "text", vocab, 600)
    val q = out.writeStream.format("memory").queryName("soov")
      .outputMode(OutputMode.Update()).start()
    q.processAllAvailable()
    mem.addData(rows.drop(1): _*)
    q.processAllAvailable()
    q.stop()
    // Update mode re-emits a window as it grows: keep the final row per
    // window (max n_tokens) and compare against the batch formula
    val streamed = spark.table("soov")
      .groupBy("time_bucket")
      .agg(max(struct(col("n_tokens"), col("n_oov"), col("oov_frac")))
        .as("s"))
      .select(col("time_bucket"), col("s.n_tokens"), col("s.n_oov"),
        col("s.oov_frac"))
      .as[(Long, Long, Long, Double)].collect()
      .map { case (k, a, b, c) => k -> ((a, b, c)) }.toMap
    assert(streamed === Map(
      (base + 10 - (base + 10) % 600) -> ((7L, 1L, 1.0 / 7.0)),
      (base + 610 - (base + 610) % 600) -> ((3L, 2L, 2.0 / 3.0))))
  }

  test("streaming drift TVD equals the batch formula across micro-batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val base = 1700000400L // multiple of 600: windows align with the data
    // three windows: the second skews high vs the uniform baseline; the
    // third drifts BELOW the profiled vmin (and a bit above vmax) — the
    // out-of-range rows must clamp into the edge bins, not vanish
    val rows = (0 until 200).map(i => (base + i * 3, (i % 10).toDouble)) ++
      (0 until 100).map(i => (base + 600 + i * 3, 8.0 + (i % 2))) ++
      (0 until 80).map(i => (base + 1200 + i * 3,
        if (i % 4 == 3) 12.5 else -3.0 - (i % 3)))
    mem.addData(rows.take(120): _*)
    val baseline = Seq.fill(5)(0.2) // uniform over 5 bins
    val streamDf = mem.toDF().toDF("ts_sec", "v")
    val out = Streams.streamingDrift(streamDf, "ts_sec", "v", 600,
      vmin = 0.0, vmax = 10.0, baseline = baseline)
    val q = out.writeStream.format("memory").queryName("sdrift")
      .outputMode(OutputMode.Update()).start()
    q.processAllAvailable()
    mem.addData(rows.drop(120): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sdrift")
      .groupBy("time_bucket").agg(max("n").as("n"), max("tvd").as("tvd"))
      .orderBy("time_bucket").collect()
    // batch reference: same fixed grid, same fold order
    def refTvd(vs: Seq[Double]): Double = {
      val cnt = Array.fill(5)(0L)
      vs.foreach { v =>
        cnt(math.max(0, math.min(4, math.floor(((v - 0.0) / 10.0) * 5.0).toInt))) += 1
      }
      (0 until 5).map(i => math.abs(cnt(i).toDouble / vs.size - 0.2))
        .foldLeft(0.0)(_ + _) * 0.5
    }
    val byWin = rows.groupBy(r => r._1 / 600 * 600).toSeq.sortBy(_._1)
    assert(streamed.length === byWin.length)
    for ((row, (_, wrows)) <- streamed.zip(byWin)) {
      assert(row.getLong(1) === wrows.length.toLong)
      assert(row.getDouble(2) === refTvd(wrows.map(_._2)))
    }
    // window 1 is exactly uniform -> zero drift; window 2 skews high;
    // window 3's below-range rows all land in bin 0 -> near-max drift,
    // and its n counts EVERY row (nothing dropped as a negative bin)
    assert(streamed(0).getDouble(2) === 0.0)
    assert(streamed(1).getDouble(2) > 0.5)
    assert(streamed(2).getLong(1) === 80L)
    assert(streamed(2).getDouble(2) > 0.5)
  }

  test("streaming CMS matrices equal the batch sketch (state-store merge parity)") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val base = 1700000000L
    val rows = (0 until 300).map(i => (base + i * 4, s"w${i % 23}"))
    mem.addData(rows.take(120): _*)
    val streamDf = mem.toDF().toDF("ts_sec", "term")
    val out = Streams.streamingCms(streamDf, "ts_sec", "term",
      bucketSecs = 600, depth = 3, width = 64)
    val q = out.writeStream.format("memory").queryName("scms")
      .outputMode(OutputMode.Update()).start()
    q.processAllAvailable()
    mem.addData(rows.drop(120): _*)
    q.processAllAvailable()
    q.stop()
    // Update mode re-emits refined matrices; the final emission per bucket
    // is the one with the largest total count (counters only grow)
    val streamed = spark.table("scms")
      .select(col("time_bucket"), col("m"),
        expr("aggregate(m, 0L, (a, x) -> a + x)").as("__tot"))
      .groupBy("time_bucket").agg(expr("max_by(m, __tot)").as("m"))
      .select(col("time_bucket"), col("m"))
    val batch = rows.toDF("ts_sec", "term")
      .groupBy((expr("ts_sec div 600") * 600).as("time_bucket"))
      .agg(graft.functions.CmsSketch.sketch(col("term"), 3, 64).as("m"))
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("crawl ingest is streaming-transparent: cleanCorpus on a stream " +
      "matches the batch result row for row") {
    implicit val sq = spark.sqlContext
    // the r13 chain (warc parse -> charset fix -> html extract -> filters)
    // is stateless scan-side work, so the SAME operator call must run
    // unchanged on a streaming source — this is the 100 TB ingest shape
    // (a stream of arriving archives), not a separate code path
    def warcOf(i: Long): Array[Byte] = {
      val body = s"<html><body><p>article text number $i with enough " +
        s"padding words</p><a href=\"/r\">ref</a></body></html>"
      val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: " +
        s"<http://ex$i.test/a>\r\nContent-Length: ${http.length}\r\n\r\n" +
        http + "\r\n\r\n").getBytes("US-ASCII")
    }
    val rows = (0L until 20L).map(i => (i, warcOf(i)))
    val mem = MemoryStream[(Long, Array[Byte])]
    mem.addData(rows: _*)
    val streamed = graft.operators.Crawl.cleanCorpus(
      mem.toDF().toDF("id", "payload"), minTextBytes = 10)
    val q = streamed.writeStream.format("memory").queryName("crawl_stream")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("crawl_stream")
      .select("id", "url", "status", "text").orderBy("id")
    val want = graft.operators.Crawl.cleanCorpus(
        rows.toDF("id", "payload"), minTextBytes = 10)
      .select("id", "url", "status", "text").orderBy("id")
    assert(got.count() === 20)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("crawl loss accounting is streaming-transparent: auditCorpus on a " +
      "stream matches the batch funnel per archive") {
    implicit val sq = spark.sqlContext
    // same shape as the cleanCorpus parity test, but every third archive
    // plants a loss (corrupt payload) so the funnel counters are load-
    // bearing; the audit is a stateless projection + streaming aggregate
    def warcOf(i: Long): Array[Byte] =
      if (i % 3 == 2) s"CORRUPT $i".getBytes("US-ASCII")
      else {
        val body = s"<html><body><p>article text number $i with enough " +
          s"padding words</p><a href=\"/r\">ref</a></body></html>"
        val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: " +
          s"<http://ex$i.test/a>\r\nContent-Length: ${http.length}\r\n\r\n" +
          http + "\r\n\r\n").getBytes("US-ASCII")
      }
    val rows = (0L until 18L).map(i => (i, warcOf(i)))
    val mem = MemoryStream[(Long, Array[Byte])]
    mem.addData(rows: _*)
    val streamed = graft.operators.Crawl.auditCorpus(
      mem.toDF().toDF("id", "payload"), minTextBytes = 10, by = Seq("id"))
    val q = streamed.writeStream.format("memory").queryName("audit_stream")
      .outputMode(OutputMode.Complete()).start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("audit_stream").orderBy("id")
    val want = graft.operators.Crawl.auditCorpus(
      rows.toDF("id", "payload"), minTextBytes = 10, by = Seq("id"))
      .orderBy("id")
    assert(got.count() === 18)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // the planted losses are counted, not silent
    val totals = spark.table("audit_stream")
      .agg(sum("parse_nulls"), sum("kept")).collect()(0)
    assert(totals.getLong(0) === 6L && totals.getLong(1) === 12L)
  }

  test("redirect edges are streaming-transparent: same operator call, " +
      "row-for-row parity") {
    implicit val sq = spark.sqlContext
    // stateless scan-side work (warc parse -> 3xx filter -> resolve ->
    // canon): the SAME redirectEdges call must run unchanged on a stream
    def warcOf(i: Long): Array[Byte] = {
      val http = s"HTTP/1.1 301 Moved\r\nLocation: ../new/p$i\r\n\r\n"
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: " +
        s"<http://ex$i.test/old/sub/r>\r\nContent-Length: ${http.length}" +
        s"\r\n\r\n$http\r\n\r\n").getBytes("US-ASCII")
    }
    val rows = (0L until 12L).map(i => (i, warcOf(i)))
    val mem = MemoryStream[(Long, Array[Byte])]
    mem.addData(rows: _*)
    val streamed = graft.operators.Crawl.redirectEdges(
      mem.toDF().toDF("id", "payload"))
    val q = streamed.writeStream.format("memory").queryName("redir_stream")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("redir_stream")
      .select("id", "from_url", "to_url", "status").orderBy("id")
    val want = graft.operators.Crawl.redirectEdges(
        rows.toDF("id", "payload"))
      .select("id", "from_url", "to_url", "status").orderBy("id")
    assert(got.count() === 12)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // the resolution is load-bearing: ../new anchored on /old/sub/r
    val r0 = got.collect()(0)
    assert(r0.getString(2) === "http://ex0.test/old/new/p0")
  }

  test("sitemap ingestion is streaming-transparent: parse + explode on " +
      "a stream matches batch") {
    implicit val sq = spark.sqlContext
    def smOf(i: Long): Array[Byte] =
      (s"<urlset><url><loc>http://ex$i.test/a?x=1&amp;y=2</loc>" +
        s"<priority>0.${i % 10}</priority></url>" +
        s"<url><loc>http://ex$i.test/b</loc></url></urlset>")
        .getBytes("UTF-8")
    val rows = (0L until 15L).map(i =>
      (i, if (i % 5 == 4) "BROKEN".getBytes("UTF-8") else smOf(i)))
    val mem = MemoryStream[(Long, Array[Byte])]
    mem.addData(rows: _*)
    def chain(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"), explode(call_function("graft_sitemap_parse",
        col("payload"))).as("e"))
      .select(col("id"), col("e.loc").as("loc"),
        col("e.priority").as("priority"))
    val q = chain(mem.toDF().toDF("id", "payload"))
      .writeStream.format("memory").queryName("sm_stream")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sm_stream").orderBy("id", "loc")
    val want = chain(rows.toDF("id", "payload")).orderBy("id", "loc")
    assert(got.count() === 24) // 12 good feeds x 2; broken -> zero rows
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("two-generation crawl round trip: generation-1 stream output " +
      "builds micro-batch 2, and both audit funnels conserve") {
    implicit val sq = spark.sqlContext
    // the q234 shape as a STREAM: micro-batch 1 is the generation-1
    // fetch; the frontier computed FROM ITS OUTPUT names the URLs whose
    // archives become micro-batch 2 — output feeding input, the
    // incremental-crawl production loop
    def warc(uri: String, http: String): Array[Byte] =
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: <$uri>" +
        s"\r\nContent-Length: ${http.length}\r\n\r\n$http\r\n\r\n")
        .getBytes("US-ASCII")
    def page(body: String): String =
      "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    val p404 = "HTTP/1.1 404 NF\r\nContent-Type: text/html\r\n\r\n" +
      "<p>gone here</p>"
    val farm = page("<div>" + ("<a href=\"/u\">w</a> " * 6) + "</div>")
    def gen1(i: Long): (Long, Long, Array[Byte]) = (1L, i,
      warc(s"http://ex${i % 3}.test/a$i",
        if (i % 5 == 0) p404
        else page(s"<html><body><p>gen one article words $i</p>" +
          s"<a href=\"/c$i\">n</a></body></html>")))
    val mem = MemoryStream[(Long, Long, Array[Byte])]
    val in = mem.toDF().toDF("gen", "id", "payload")
    val qClean = graft.operators.Crawl.cleanCorpus(in, minTextBytes = 10)
      .writeStream.format("memory").queryName("rt_clean")
      .outputMode(OutputMode.Append()).start()
    val qAudit = graft.operators.Crawl
      .auditCorpus(in, minTextBytes = 10, by = Seq("gen"))
      .writeStream.format("memory").queryName("rt_audit")
      .outputMode(OutputMode.Complete()).start()
    val g1 = (0L until 20L).map(gen1)
    mem.addData(g1: _*)
    qClean.processAllAvailable(); qAudit.processAllAvailable()
    // generation 1 landed: 16 kept (every 5th 404s), funnel conserves
    val a1 = spark.table("rt_audit").filter(col("gen") === 1L).head()
    def conserves(r: org.apache.spark.sql.Row): Unit =
      assert(r.getAs[Long]("records") === r.getAs[Long]("non_response") +
        r.getAs[Long]("gated_status") + r.getAs[Long]("gated_mime") +
        r.getAs[Long]("dropped_small") +
        r.getAs[Long]("dropped_boilerplate") + r.getAs[Long]("kept"))
    assert(a1.getAs[Long]("records") === 20L)
    assert(a1.getAs[Long]("gated_status") === 4L)
    assert(a1.getAs[Long]("kept") === 16L)
    conserves(a1)
    // kept == the clean stream's emitted row count (the shared-kernel
    // invariant, now across a stream)
    assert(spark.table("rt_clean").count() === 16L)
    // the frontier FROM the stream's own generation-1 output: corpus =
    // what we now hold; pages = the fetched html (batch parse of the
    // same archives the stream saw)
    val corpus1 = spark.table("rt_clean").select(col("url"))
    val pages2 = graft.operators.Multimodal
      .warcRecords(g1.toDF("gen", "id", "payload"), "payload")
      .filter(col("warc_rec.status") === 200)
      .select(call_function("graft_canon_url", col("warc_rec.uri"))
        .as("url"), col("warc_rec.body").cast("string").as("page"))
    val robotsDim = Seq("ex0.test", "ex1.test", "ex2.test")
      .toDF("host").withColumn("robots",
        lit("User-agent: *\nDisallow: /zz\n"))
    val frontier2 = graft.operators.Crawl
      .frontier(pages2, "url", "page", robotsDim, corpus1)
      .collect().map(_.getString(0)).sorted
    val wantFrontier = (0L until 20L).filter(_ % 5 != 0)
      .map(i => s"http://ex${i % 3}.test/c$i").sorted
    assert(frontier2.toSeq === wantFrontier)
    // micro-batch 2 IS the frontier: one archive per frontier URL
    // (every 3rd source doc a link farm — the gen-2 planted loss)
    val g2 = frontier2.map { u =>
      val i = u.split("/c")(1).toLong
      (2L, i, warc(u, if (i % 3 == 0) farm
        else page(s"<html><body><p>gen two article words $i</p>" +
          "</body></html>")))
    }
    mem.addData(g2.toIndexedSeq: _*)
    qClean.processAllAvailable(); qAudit.processAllAvailable()
    qClean.stop(); qAudit.stop()
    val a2 = spark.table("rt_audit").filter(col("gen") === 2L).head()
    assert(a2.getAs[Long]("records") === 16L)
    assert(a2.getAs[Long]("dropped_boilerplate") === 5L) // 3,6,9,12,18
    assert(a2.getAs[Long]("kept") === 11L)
    conserves(a2)
    // generation 2's kept pages landed in the same clean stream, on
    // their frontier urls
    val clean2 = spark.table("rt_clean")
      .filter(col("gen") === 2L).select("url")
      .collect().map(_.getString(0)).sorted
    val wantClean2 = (0L until 20L)
      .filter(i => i % 5 != 0 && i % 3 != 0)
      .map(i => s"http://ex${i % 3}.test/c$i").sorted
    assert(clean2.toSeq === wantClean2)
  }
}

package graft

import java.nio.file.Files
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.dsl.SybilQuery
import graft.sources.{GraftTable, Ingest}

/** Ingest coercions + table lifecycle (ingest → digest → query → trim),
  * mirroring the reference's ingest/digest tests (row_store_test.go,
  * table_ingest.go) and the API E2E scheme (api_test.go:86-100). */
class IngestSpec extends SparkSpec {

  private def tmpDir(prefix: String) =
    SparkSpec.tempDir(prefix).toString

  private def writeJsonl(lines: Seq[String]): String = {
    val d = SparkSpec.tempDir("graft-jsonl")
    Files.writeString(d.resolve("data.jsonl"), lines.mkString("\n"))
    d.resolve("data.jsonl").toString
  }

  test("json ingest: flatten, truncate floats, bool→0/1, arrays→set of strings") {
    val path = writeJsonl(Seq(
      """{"name":"a","ping":60.9,"ok":true,"nested":{"x":{"y":5}},"tags":["t1","t2"],"nums":[1.4,2.6]}""",
      """{"name":"b","ping":-3.7,"ok":false,"nested":{"x":{"y":6}},"tags":[],"nums":[7.0]}"""))
    val df = Ingest.readJson(spark, path)
    val r = df.orderBy("name").collect()
    assert(df.schema("ping").dataType === LongType)
    assert(r(0).getAs[Long]("ping") === 60) // 60.9 truncated (cmd_ingest.go:59-60)
    assert(r(1).getAs[Long]("ping") === -3) // toward zero, like Go int64()
    assert(r(0).getAs[Long]("ok") === 1 && r(1).getAs[Long]("ok") === 0)
    assert(df.columns.contains("nested_x_y")) // '_'-joined flattening
    assert(r(0).getAs[Long]("nested_x_y") === 5)
    assert(r(0).getAs[collection.Seq[String]]("tags") === Seq("t1", "t2"))
    assert(r(0).getAs[collection.Seq[String]]("nums") === Seq("1", "3")) // %.0f rounds
  }

  test("json ingest: ints/timestamps/exclude flags") {
    val path = writeJsonl(Seq(
      """{"sid":"123","when":"2024-03-01 10:00:00","secret":"x","v":1}""",
      """{"sid":"notanint","when":"garbage","secret":"y","v":2}"""))
    val df = Ingest.readJson(spark, path,
      ints = Set("sid"), timestamps = Set("when"), exclude = Set("secret"))
    assert(!df.columns.contains("secret"))
    assert(df.schema("sid").dataType === LongType)
    val r = df.orderBy("v").collect()
    assert(r(0).getAs[Long]("sid") === 123L)
    assert(r(0).getAs[Long]("when") === 1709287200L) // UTC unix secs
    assert(r(1).isNullAt(r(1).fieldIndex("sid")))    // parse failure → missing
    assert(r(1).isNullAt(r(1).fieldIndex("when")))
  }

  test("jsonPath re-roots records before flattening (reference -path flag)") {
    val path = writeJsonl(Seq(
      """{"meta":{"v":1},"payload":{"rec":{"a":1,"b":{"c":"x"}}}}""",
      """{"meta":{"v":2},"payload":{"rec":{"a":2,"b":{"c":"y"}}}}"""))
    val df = Ingest.readJson(spark, path, jsonPath = Some("$.payload.rec"))
    assert(df.columns.sorted.toSeq === Seq("a", "b_c"))
    assert(df.orderBy("a").collect()(1).getAs[String]("b_c") === "y")
  }

  test("json envelope printer emits parseable results array") {
    val path = writeJsonl(Seq("""{"k":"a","v":1}""", """{"k":"b","v":2}"""))
    val out = graft.core.Printer.toJsonEnvelope(Ingest.readJson(spark, path).orderBy("k"))
    assert(out.startsWith("{\"results\":[") && out.contains("\"k\":\"a\"") &&
      out.endsWith("]}"))
  }

  test("sybilCompat=false keeps doubles") {
    val path = writeJsonl(Seq("""{"x":1.5}"""))
    val df = Ingest.readJson(spark, path, sybilCompat = false)
    assert(df.schema("x").dataType === DoubleType)
  }

  test("table lifecycle: ingest → read-log → digest → query → info → trim") {
    import spark.implicits._
    val root = tmpDir("graft-table")
    val t = new GraftTable(spark, root)

    val batch1 = (0 until 500).map(i => (i.toLong, s"u${i % 7}", 1700000000L + i)).toDF("id", "user", "time")
    val batch2 = (500 until 900).map(i => (i.toLong, s"u${i % 7}", 1700000000L + i)).toDF("id", "user", "time")
    t.ingest(batch1)
    t.ingest(batch2)

    // pre-digest: data only visible with readLog (the -read-log flag)
    assert(t.read(readLog = true).count() === 900)
    intercept[IllegalArgumentException](t.read(readLog = false))

    t.digest()
    assert(t.read(readLog = false).count() === 900)
    val i = t.info()
    assert(i.rowCount === 900)
    val idInfo = i.columns.find(_.name == "id").get
    assert(idInfo.min.contains(0L) && idInfo.max.contains(899L))

    // DSL over the digested table
    val q = SybilQuery().groupBy("user").limitTo(10).run(t.read())
    assert(q.collect().map(_.getAs[Long]("Count")).sum === 900)

    // type conflict: same column name, different type → dropped with warning
    val bad = Seq(("x", "stringy-id")).toDF("user", "id")
    t.ingest(bad)
    assert(t.read(readLog = true).filter(col("id").isNull).count() === 1)

    // trim by age: everything older than cutoff goes
    val removed = t.trim(olderThan = Some(1800000000L))
    assert(removed.nonEmpty)
    assert(!Files.list(java.nio.file.Paths.get(root, "blocks")).iterator().hasNext)
  }

  test("digest enforces the 64Ki-row cap per block file WITHOUT a " +
      "shuffle (r13: maxRecordsPerFile replaced repartition — the " +
      "all-data exchange was the measured superlinear phase)") {
    import spark.implicits._
    val root = tmpDir("graft-chunks")
    val t = new GraftTable(spark, root)
    // 2 log files of 75k rows each: a digest task must roll a file at
    // the cap (32 tiny log files would give 32 tiny tasks instead —
    // openCostInBytes packs roughly one small file per split)
    t.ingest((0 until 150000).map(i => (i.toLong, i % 3)).toDF("id", "k")
      .coalesce(2))
    t.digest()
    val dir = java.nio.file.Paths.get(root, "blocks")
    val files = Files.walk(dir).iterator()
    val parts = Iterator.continually(files).takeWhile(_.hasNext).map(_.next())
      .filter(p => p.toString.endsWith(".parquet")).toSeq
    // the invariant is the CAP (no file exceeds ChunkSize rows), not an
    // exact file count — without the shuffle, file count = input splits
    // + per-task tails, which is layout-dependent by design
    assert(parts.nonEmpty)
    for (p <- parts) {
      val n = spark.read.parquet(p.toString).count()
      assert(n <= t.ChunkSize, s"$p has $n rows > ChunkSize")
    }
    assert(t.read().count() === 150000)
    // and at least one file actually hit the cap (the cap is real, not
    // vacuously satisfied by tiny inputs)
    assert(parts.exists(p => spark.read.parquet(p.toString).count() == t.ChunkSize))
  }

  test("digest compaction: repeated small ingest+digest keeps ONE block") {
    import spark.implicits._
    val root = tmpDir("graft-compact")
    val t = new GraftTable(spark, root)
    for (c <- 0 until 10) {
      t.ingest((0 until 50).map(i => ((c * 50 + i).toLong, s"u${i % 3}")).toDF("id", "user"))
      t.digest() // partial-block top-up (FillPartialBlock, table_block_io.go:48-107)
    }
    assert(t.blockIds.size === 1, "sub-64Ki blocks must merge, not accumulate")
    assert(t.read().count() === 500)
    val i = t.info()
    assert(i.rowCount === 500)
    val id = i.columns.find(_.name == "id").get
    assert(id.min.contains(0L) && id.max.contains(499L))
  }

  test("digest journal makes a crash between rename and cleanup duplicate-free") {
    import spark.implicits._
    val root = tmpDir("graft-journal")
    val t = new GraftTable(spark, root)
    t.ingest((0 until 20).map(i => (i.toLong, s"u${i % 3}")).toDF("id", "user"))
    t.digest()
    val merged = t.blockIds.head
    // Reconstruct the flagged crash state: the merged block has landed and
    // the journal names the consumed partial block, but the partial was
    // never deleted (crash in the cleanup window). The "partial" here is a
    // byte-copy of the merged block, so without journal superseding, every
    // row would be read twice and reconciled() would legitimize both.
    val blocks = java.nio.file.Paths.get(root, "blocks")
    val fake = blocks.resolve("00000000-dead-beef-0000-000000000000")
    Files.walk(blocks.resolve(merged)).forEach { p =>
      val dst = fake.resolve(blocks.resolve(merged).relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(dst)
      else Files.copy(p, dst)
    }
    Files.writeString(java.nio.file.Paths.get(root, "digest.journal"),
      s"""{"newBlock":"$merged","consumedBlocks":["${fake.getFileName}"],"consumedLogs":[]}""")
    assert(t.read().count() === 20, "superseded block must not be read twice")
    assert(t.blockIds === Seq(merged))
    // reconciled() (via blockSegments) finishes the cleanup: dir + journal go
    assert(t.blockSegments.map(_.id) === Seq(merged))
    assert(!Files.exists(fake), "superseded partial must be deleted")
    assert(!Files.exists(java.nio.file.Paths.get(root, "digest.journal")))
    assert(t.info().rowCount === 20)
  }

  test("compaction and trim garbage-collect cache partials of dead blocks") {
    import spark.implicits._
    val root = tmpDir("graft-cachegc")
    val t = new GraftTable(spark, root)
    t.ingest((0 until 100).map(i => (s"k${i % 4}", i.toLong, (i % 7).toLong))
      .toDF("k", "time", "v"))
    t.digest()
    val b0 = t.blockIds.head
    val cache = new graft.sources.QueryCache(spark, t)
    cache.run(graft.dsl.SybilQuery().groupBy("k")
      .intFilterGt("time", -1).limitTo(100))
    val cacheRoot = java.nio.file.Paths.get(root, "cache")
    def partialDirs(id: String): Seq[java.nio.file.Path] =
      if (!Files.exists(cacheRoot)) Nil
      else Files.list(cacheRoot).iterator().asScala.toSeq
        .map(_.resolve(id)).filter(Files.exists(_))
    assert(partialDirs(b0).nonEmpty, "the miss must have cached a partial")
    // plant sweep-test entries under an existing cache key: an in-flight
    // .tmp- publish (must SURVIVE the sweep) and a dead-block orphan (the
    // late-publish case the targeted GC misses — must be swept)
    val someKey = Files.list(cacheRoot).iterator().asScala
      .filter(Files.isDirectory(_)).next()
    val inflight = someKey.resolve(".tmp-inflight")
    Files.createDirectories(inflight)
    Files.writeString(inflight.resolve("part-0"), "in-flight publish")
    val orphan = someKey.resolve("00000000-dead-0000-0000-000000000000")
    Files.createDirectories(orphan)
    Files.writeString(orphan.resolve("part-0"), "late publish for a dead block")
    // compaction consumes the partial block b0 → its cache partials must go
    t.ingest((100 until 200).map(i => (s"k${i % 4}", i.toLong, (i % 7).toLong))
      .toDF("k", "time", "v"))
    t.digest()
    assert(!t.blockIds.contains(b0))
    assert(partialDirs(b0).isEmpty, "dead block's cache partials must be GC'd")
    assert(Files.exists(inflight), "sweep must never touch in-flight .tmp- publishes")
    assert(!Files.exists(orphan), "sweep must remove orphans of dead blocks")
    // and trim GCs the partials of the blocks it deletes
    val b1 = t.blockIds.head
    cache.run(graft.dsl.SybilQuery().groupBy("k")
      .intFilterGt("time", -1).limitTo(100))
    assert(partialDirs(b1).nonEmpty)
    t.trim(olderThan = Some(10000L))
    assert(t.blockIds.isEmpty && partialDirs(b1).isEmpty)
  }

  test("query cache serves loghist exactly, with a key distinct from flat hist") {
    import spark.implicits._
    val root = tmpDir("graft-loghist-cache")
    val t = new GraftTable(spark, root)
    t.ingest((1 until 2000).map(i => (s"k${i % 2}", i.toLong, (i % 500 + 1).toLong))
      .toDF("k", "time", "v"))
    t.digest()
    val cache = new graft.sources.QueryCache(spark, t)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.selectExpr("k", "Count", "v_hist.count", "v_hist.mean",
        "v_hist.percentiles[50]", "v_hist.stddev").collect().map(_.toString).sorted
    val logQ = graft.dsl.SybilQuery().groupBy("k").aggregate("v")
      .logHistogram.intFilterGt("time", 0)
    val flatQ = logQ.copy(useLogHist = false)
    val single = canon(t.query(logQ))
    val (miss, o1) = cache.run(logQ)
    assert(o1.misses === 1 && canon(miss) === single, "cached-miss == single-pass")
    val (hit, o2) = cache.run(logQ)
    assert(o2.hits === 1 && canon(hit) === single, "cache-hit == single-pass")
    // flat hist with identical filters must NOT share the log partials
    val (flat, o3) = cache.run(flatQ)
    assert(o3.misses === 1, "flavor must be part of the cache key")
    assert(canon(flat) !== single, "flat and log layouts differ on this data")
    // nested MultiHist: third flavor, own key, cached == single-pass
    val nestedQ = logQ.copy(useLogHist = false, useNestedHist = true)
    val singleNested = canon(t.query(nestedQ))
    val (nm, o4) = cache.run(nestedQ)
    assert(o4.misses === 1 && canon(nm) === singleNested)
    val (nh, o5) = cache.run(nestedQ)
    assert(o5.hits === 1 && canon(nh) === singleNested)
  }

  test("concurrent ingest + digest stress: every row exactly once") {
    // the reference's stress_ingest_digest.sh scheme: writers append while a
    // digester compacts; dir-level atomicity + the digest lock + journal +
    // sidecar self-heal must deliver exactly-once rows
    import spark.implicits._
    val root = tmpDir("graft-stress")
    val t = new GraftTable(spark, root)
    val threads = 4; val batches = 5; val rowsPer = 40
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads + 1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val writers = (0 until threads).map { th =>
      pool.submit(new Runnable {
        def run(): Unit = try {
          for (b <- 0 until batches) {
            val base = (th * batches + b) * rowsPer
            t.ingest((0 until rowsPer).map(i => ((base + i).toLong, s"u$th"))
              .toDF("id", "user"))
          }
        } catch { case e: Throwable => errs.add(e) }
      })
    }
    val digester = pool.submit(new Runnable {
      def run(): Unit = try {
        for (_ <- 0 until 8) {
          try t.digest()
          catch { case _: IllegalStateException => () } // lock contention is expected
          Thread.sleep(30)
        }
      } catch { case e: Throwable => errs.add(e) }
    })
    writers.foreach(_.get)
    digester.get()
    pool.shutdown()
    assert(errs.isEmpty, s"stress errors: ${errs.asScala.map(_.toString).mkString("; ")}")
    t.digest() // final drain
    val total = threads * batches * rowsPer
    val ids = t.read().select("id").collect().map(_.getLong(0))
    assert(ids.length === total, "no row lost, none duplicated")
    assert(ids.toSet.size === total)
    assert(t.rebuild().rowCount === total)
  }

  test("query-DURING-digest consistency: every concurrent snapshot is an " +
      "exactly-once batch prefix (withSnapshot retry = the reference's " +
      "BLOCK SIZE CHANGED re-run)") {
    import spark.implicits._
    val root = tmpDir("graft-qstress")
    val t = new GraftTable(spark, root)
    val batches = 24; val rowsPer = 150
    def batchDf(b: Int) = {
      val base = b * rowsPer
      (0 until rowsPer).map(i => (base + i).toLong).toDF("id")
    }
    t.ingest(batchDf(0)) // the table is never empty once readers start
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    @volatile var writerDone = false
    val digestActive = new java.util.concurrent.atomic.AtomicBoolean(false)
    @volatile var overlappedReads = 0
    val writer = pool.submit(new Runnable {
      def run(): Unit = try {
        for (b <- 1 until batches) { t.ingest(batchDf(b)); Thread.sleep(5) }
      } catch { case e: Throwable => errs.add(e) }
      finally writerDone = true
    })
    val digester = pool.submit(new Runnable {
      def run(): Unit = try {
        while (!writerDone) {
          digestActive.set(true)
          try t.digest()
          catch { case _: IllegalStateException => () }
          finally digestActive.set(false)
          Thread.sleep(10)
        }
      } catch { case e: Throwable => errs.add(e) }
    })
    val reader = pool.submit(new Runnable {
      def run(): Unit = try {
        var lastCnt = 0L
        var reads = 0
        while (!writerDone || reads < 5) {
          val during = digestActive.get()
          val row = t.withSnapshot(readLog = true) { df =>
            df.agg(count(lit(1)), coalesce(sum(col("id")), lit(0L)))
              .collect()(0)
          }
          val (cnt, s) = (row.getLong(0), row.getLong(1))
          // exactly-once PREFIX: batch-aligned count, and the id sum
          // identifies the prefix uniquely (batches are disjoint ranges)
          assert(cnt % rowsPer === 0L,
            s"snapshot count $cnt is not batch-aligned (torn segment)")
          assert(s === cnt * (cnt - 1) / 2,
            s"snapshot of $cnt rows has sum $s != ${cnt * (cnt - 1) / 2} " +
              "(double-count or missing middle batch)")
          assert(cnt >= lastCnt, s"snapshot went backwards: $lastCnt -> $cnt")
          lastCnt = cnt
          if (during) overlappedReads += 1
          reads += 1
        }
      } catch { case e: Throwable => errs.add(e) }
    })
    writer.get(); digester.get(); reader.get()
    pool.shutdown()
    assert(errs.isEmpty,
      s"stress errors: ${errs.asScala.map(_.toString).mkString("; ")}")
    assert(overlappedReads > 0,
      "no read overlapped a digest — the test exercised nothing")
    t.digest()
    val total = batches.toLong * rowsPer
    val fin = t.read().agg(count(lit(1)), sum(col("id"))).collect()(0)
    assert(fin.getLong(0) === total)
    assert(fin.getLong(1) === total * (total - 1) / 2)
  }

  test("concurrent ingest + digest + optimize stress: exactly-once rows, clustered layout") {
    import spark.implicits._
    val root = tmpDir("graft-zstress")
    val t = new GraftTable(spark, root)
    val threads = 3; val batches = 4; val rowsPer = 50
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads + 1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val writers = (0 until threads).map { th =>
      pool.submit(new Runnable {
        def run(): Unit = try {
          for (b <- 0 until batches) {
            val base = (th * batches + b) * rowsPer
            t.ingest((0 until rowsPer).map(i =>
              ((base + i).toLong, (base + i).toLong % 100,
                ((base + i) * 7).toLong % 100)).toDF("id", "x", "y"))
          }
        } catch { case e: Throwable => errs.add(e) }
      })
    }
    val maintainer = pool.submit(new Runnable {
      def run(): Unit = try {
        for (r <- 0 until 6) {
          try { if (r % 2 == 0) t.digest() else t.optimize("x", "y", bits = 6) }
          catch { case _: IllegalStateException => () } // lock contention ok
          Thread.sleep(40)
        }
      } catch { case e: Throwable => errs.add(e) }
    })
    writers.foreach(_.get)
    maintainer.get()
    pool.shutdown()
    assert(errs.isEmpty, s"stress errors: ${errs.asScala.map(_.toString).mkString("; ")}")
    t.digest()
    t.optimize("x", "y", bits = 6)
    val total = threads * batches * rowsPer
    val ids = t.read().select("id").collect().map(_.getLong(0))
    assert(ids.length === total && ids.toSet.size === total,
      "no row lost, none duplicated through digest+optimize interleaving")
    assert(t.rebuild().rowCount === total)
  }

  test("ingest is O(batch): appending to a large table reads only the batch") {
    import spark.implicits._
    val root = tmpDir("graft-obatch")
    val t = new GraftTable(spark, root)
    t.ingest((0 until 200000).map(i => (i.toLong, (i % 97).toLong)).toDF("id", "v"))
    t.digest()
    val bytesRead = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        if (te.taskMetrics != null)
          bytesRead.addAndGet(te.taskMetrics.inputMetrics.bytesRead)
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      t.ingest((0 until 100).map(i => ((200000 + i).toLong, 7L)).toDF("id", "v"))
      Thread.sleep(500) // listener bus drain
    } finally spark.sparkContext.removeSparkListener(listener)
    // the 200k-row table is ~1.5 MB of parquet; an O(batch) ingest touches
    // only the tiny new segment (footer + 100 rows)
    assert(bytesRead.get < 300000,
      s"ingest read ${bytesRead.get} bytes — smells like a full-table rescan")
    val id = t.info().columns.find(_.name == "id").get
    assert(id.max.contains(200099L), "batch extents must merge into the sidecar")
    assert(t.info().rowCount === 200100)
  }

  test("extents are outlier-resistant: a corrupt extremum does not poison them") {
    import spark.implicits._
    val root = tmpDir("graft-outlier")
    val t = new GraftTable(spark, root)
    t.ingest((0 until 200).map(i => (i.toLong, i.toLong)).toDF("id", "v"))
    t.digest()
    // one corrupt record 5 orders of magnitude out (>1000 sigma of the rest)
    t.ingest(Seq((200L, 10000000L)).toDF("id", "v"))
    val v = t.info().columns.find(_.name == "v").get
    assert(v.max.contains(199L),
      s"corrupt extremum must not widen extents (got max=${v.max})")
    // but a plausible new extreme IS admitted
    t.ingest(Seq((201L, 250L)).toDF("id", "v"))
    assert(t.info().columns.find(_.name == "v").get.max.contains(250L))
  }

  test("corrupt segment leaves hist bucket layout pinned (end-to-end)") {
    // the CONSEQUENCE of the 1000-sigma extent rejection
    // (table_column_info.go:72-131): hist bucket widths derive from the
    // sidecar extents, so one corrupt segment must neither stretch the
    // bucket layout nor enter the histogram (values > max*10 drop,
    // hist_basic.go:101-109)
    import spark.implicits._
    import graft.dsl.{AggOp, SybilQuery}
    val root = tmpDir("graft-outlier-hist")
    val t = new GraftTable(spark, root)
    t.ingest((0 until 200).map(i => ("a", i.toLong, i.toLong))
      .toDF("k", "time", "v"))
    t.digest()
    val q = SybilQuery().groupBy("k").aggregate("v").withOp(AggOp.HistOp)
    def hist(df: org.apache.spark.sql.DataFrame) = {
      val r = df.collect().head
      val h = r.getStruct(r.fieldIndex("v_hist"))
      (h.getAs[Long]("count"), h.getAs[Long]("min"), h.getAs[Long]("max"),
        h.getAs[collection.Seq[Long]]("bucketLows").toSeq)
    }
    val (cleanCount, _, cleanMax, cleanLows) = hist(t.query(q))
    assert(cleanCount == 200 && cleanMax == 199)
    // corrupt segment 5 orders of magnitude out
    t.ingest(Seq(("a", 200L, 10000000L)).toDF("k", "time", "v"))
    t.digest()
    val (count2, _, max2, lows2) = hist(t.query(q))
    assert(lows2 == cleanLows,
      s"bucket layout must stay pinned by the rejected extents (got $lows2)")
    assert(count2 == 200 && max2 == 199,
      "the corrupt value must drop from the histogram, not clamp into it")
  }

  test("reconcile self-heals a sidecar that missed a segment (racy ingest)") {
    import spark.implicits._
    val root = tmpDir("graft-heal")
    val t = new GraftTable(spark, root)
    t.ingest((0 until 100).map(i => (i.toLong, i % 5)).toDF("id", "k"))
    // simulate a concurrent ingest whose sidecar update lost the race:
    // a log dir exists on disk that info.json has never seen
    (100 until 150).map(i => (i.toLong, i % 5)).toDF("id", "k")
      .write.parquet(s"$root/ingest/${java.util.UUID.randomUUID()}")
    assert(t.info().rowCount === 100) // sidecar stale
    t.digest() // digest reconciles first
    assert(t.info().rowCount === 150, "orphan segment must be recovered")
    assert(t.read().count() === 150)
    val id = t.info().columns.find(_.name == "id").get
    assert(id.max.contains(149L))
  }

  test("ingest of a batch whose every column conflicts is a warned no-op") {
    import spark.implicits._
    val root = tmpDir("graft-allconflict")
    val t = new GraftTable(spark, root)
    t.ingest(Seq((1L, 2L)).toDF("a", "b"))
    t.ingest(Seq(("x", "y")).toDF("a", "b")) // both columns conflict → dropped
    assert(t.info().rowCount === 1)
    assert(t.read(readLog = true).count() === 1)
  }

  test("digest lock: concurrent digest refused, stale lock broken") {
    import spark.implicits._
    val root = tmpDir("graft-lock")
    val t = new GraftTable(spark, root)
    t.ingest(Seq((1L, 2L)).toDF("a", "b"))
    val lock = java.nio.file.Paths.get(root, "digest.lock")
    Files.writeString(lock, "99999999") // someone else holds it (fresh)
    intercept[IllegalStateException](t.digest())
    // stale lock (old mtime) is broken and digest proceeds
    Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 3600 * 1000))
    t.digest()
    assert(t.blockIds.nonEmpty && !Files.exists(lock))
  }

  test("set (array) group-by is rejected with a clear error") {
    import spark.implicits._
    val df = Seq((1L, Seq("a", "b"))).toDF("v", "tags")
    val ex = intercept[IllegalArgumentException] {
      SybilQuery().groupBy("tags").run(df)
    }
    assert(ex.getMessage.contains("set column"))
  }

  test("TSV export round-trips records (gzip, header)") {
    import spark.implicits._
    val root = tmpDir("graft-tsv")
    val t = new GraftTable(spark, root)
    t.ingest(Seq((1L, "a\tx"), (2L, "b")).toDF("id", "s"))
    t.digest()
    val out = tmpDir("graft-tsv-out")
    t.exportTsv(out)
    val files = Files.list(java.nio.file.Paths.get(out)).iterator()
    val gz = Iterator.continually(files).takeWhile(_.hasNext).map(_.next())
      .filter(_.toString.endsWith(".csv.gz")).toSeq
    assert(gz.nonEmpty, "export must produce gzip parts")
    val back = spark.read.option("sep", "\t").option("header", "true")
      .csv(out).orderBy("id").collect()
    assert(back.length === 2 && back(0).getString(0) === "1")
  }

  test("csv ingest with header and numeric inference") {
    val d = SparkSpec.tempDir("graft-csv")
    Files.writeString(d.resolve("data.csv"), "name,age,score\nalice,30,9.7\nbob,41,3.2\n")
    val df = Ingest.readCsv(spark, d.resolve("data.csv").toString)
    assert(df.schema("age").dataType === LongType)
    assert(df.schema("score").dataType === LongType) // truncated like sybil
    val r = df.orderBy("name").collect()
    assert(r(0).getAs[Long]("score") === 9)
  }

  test("optimize rewrites blocks z-order-clustered: rows intact, both dims tiled, cache dropped") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = tmpDir("graft-zopt")
    val t = new GraftTable(spark, root)
    val rnd = new scala.util.Random(7)
    val rows = (0 until 20000).map(i =>
      (i.toLong, rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
    t.ingest(rows.toDF("id", "x", "y"))
    t.digest()
    val before = t.blockIds
    // plant a cache partial under the old block id — optimize must GC it
    val cacheDir = root + "/cache/somekey/" + before.head
    Files.createDirectories(java.nio.file.Paths.get(cacheDir))
    Files.writeString(java.nio.file.Paths.get(cacheDir, "part.txt"), "x")

    t.optimize("x", "y", bits = 8, rowsPerPartition = 1250) // 16 tiles

    assert(t.read().count() === 20000)
    assert(t.info().rowCount === 20000)
    assert(t.blockIds.size === 1 && !before.contains(t.blockIds.head))
    assert(!Files.exists(java.nio.file.Paths.get(cacheDir)),
      "cache partials of consumed blocks must be GC'd")
    // layout: per-FILE extents of BOTH dims much narrower than the global
    // 0..999 range (the two-dim data-skipping property)
    val widths = t.read()
      .select(input_file_name().as("f"), col("x"), col("y"))
      .groupBy("f")
      .agg((max("x") - min("x")).as("xr"), (max("y") - min("y")).as("yr"))
      .agg(avg("xr"), avg("yr")).collect()(0)
    assert(widths.getDouble(0) < 500.0, s"x tile ${widths.getDouble(0)}")
    assert(widths.getDouble(1) < 500.0, s"y tile ${widths.getDouble(1)}")
    // sidecar extents survived the rewrite
    val xi = t.info().columns.find(_.name == "x").get
    assert(xi.min.contains(rows.map(_._2).min) && xi.max.contains(rows.map(_._2).max))
  }

  test("retryStaleListing classifies the ANALYSIS-time race (PATH_NOT_FOUND " +
      "from a dir a digest consumed between listing and resolution) as " +
      "stale, and rethrows anything else immediately") {
    var calls = 0
    val out = GraftTable.retryStaleListing(maxRetries = 5) {
      calls += 1
      if (calls < 3) throw new org.apache.spark.sql.AnalysisException(
        errorClass = "PATH_NOT_FOUND",
        messageParameters = Map("path" -> "file:/tmp/gone"))
      42
    }
    assert(out === 42 && calls === 3)
    // a non-stale failure propagates on the FIRST call — retrying a real
    // error 5 times would just quintuple the damage
    var calls2 = 0
    val e = intercept[IllegalStateException] {
      GraftTable.retryStaleListing(maxRetries = 5) {
        calls2 += 1
        throw new IllegalStateException("genuinely broken")
      }
    }
    assert(e.getMessage === "genuinely broken" && calls2 === 1)
    // retries exhausted: the stale error itself surfaces (loud, never a hang)
    intercept[org.apache.spark.sql.AnalysisException] {
      GraftTable.retryStaleListing(maxRetries = 2) {
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "PATH_NOT_FOUND",
          messageParameters = Map("path" -> "file:/tmp/gone"))
      }
    }
  }

  test("ingestIdempotent: replaying a token is a no-op; ledger completes after a crash") {
    import spark.implicits._
    val root = tmpDir("graft-idem")
    val t = new GraftTable(spark, root)
    val batch = (0 until 50).map(i => (i.toLong, s"u$i")).toDF("id", "user")

    assert(t.ingestIdempotent(batch, "ckpt#0"))
    assert(!t.ingestIdempotent(batch, "ckpt#0")) // replay: no-op
    assert(t.read(readLog = true).count() === 50)
    assert(t.info().rowCount === 50)

    assert(t.ingestIdempotent(batch, "ckpt#1")) // new batch appends
    assert(t.read(readLog = true).count() === 100)

    // crash window: segment published but ledger append lost — the replay
    // (a NEW process, so a fresh instance with a fresh ledger mirror)
    // must complete the ledger WITHOUT re-ingesting
    val ledger = java.nio.file.Paths.get(root, "stream_tokens.log")
    val lines = Files.readAllLines(ledger)
    Files.writeString(ledger, lines.get(0) + "\n") // drop ckpt#1's line
    val t2 = new GraftTable(spark, root)           // post-crash instance
    assert(t2.ingestIdempotent(batch, "ckpt#1"))   // "ingested" (completes ledger)
    assert(t2.read(readLog = true).count() === 100) // but no duplicate rows
    assert(!t2.ingestIdempotent(batch, "ckpt#1"))  // now recorded
    assert(Files.readAllLines(ledger).size === 2)
  }
}

package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Checkpoints
import graft.operators.{Dedup, Ranking}

/** One-shot task-failure injector. Each partition visit decrements the
  * fuse; the task that reaches zero throws ON ITS FIRST ATTEMPT only, so
  * Spark's task retry (maxTaskFailures = 2 in the shared test session —
  * a real cluster defaults to 4) re-runs it and the job proceeds. The
  * counter is JVM-static, which is exactly right in local mode: driver
  * and executors share the JVM. */
object ChaosBomb {
  val fuse = new AtomicInteger(0)
  val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
  def arm(afterPartitionVisits: Int): Unit = {
    fired.set(false)
    fuse.set(afterPartitionVisits)
  }
  def touch(): Unit =
    if (fuse.decrementAndGet() == 0 && TaskContext.get().attemptNumber() == 0) {
      fired.set(true)
      throw new RuntimeException("chaos: injected executor failure")
    }
  /** A bomb that never went off proves nothing — every bombed run must
    * end with this. */
  def assertFired(): Unit =
    assert(fired.get(), "chaos bomb never detonated (fuse armed past the " +
      "run's total partition visits?) — the test exercised nothing")
}

/** Fault-injection for the reliable-checkpoint mode (VERDICT r10 #4):
  * CheckpointSpec proves eviction survival between actions; the actual
  * product claim for `spark.graft.checkpointDir` is RECOVERY — a task
  * dies mid-run (the local-mode stand-in for executor loss), Spark
  * retries it, the retry re-reads pinned data from checkpoint FILES,
  * and the job completes with identical output. Detection is real, not
  * assumed: the pinned frame carries a `rand()` column, so a recompute
  * instead of a file re-read would draw different values and fail the
  * equality.
  */
class ChaosSpec extends SparkSpec {
  import spark.implicits._

  private def withReliable[A](f: => A): A = {
    spark.conf.set(Checkpoints.ConfKey, SparkSpec.reliableCkptDir.toString)
    try f
    finally spark.conf.unset(Checkpoints.ConfKey)
  }

  private def canon(df: DataFrame): Seq[Seq[String]] =
    df.collect().map(_.toSeq.map(String.valueOf).toSeq)
      .sortBy(_.mkString("|")).toSeq

  test("post-pin task failure recovers from checkpoint files, not " +
      "recomputation (rand-detectable)") {
    withReliable {
      val pinned = Checkpoints.pin(
        spark.range(4000).repartition(8).withColumn("r", rand()))
      try {
        val clean = canon(pinned)
        // consumer stage downstream of the pin; the 5th of its 8 tasks
        // dies on first attempt
        val bombed = pinned.as[(Long, Double)]
          .mapPartitions { it => ChaosBomb.touch(); it }
          .toDF("id", "r")
        ChaosBomb.arm(5)
        assert(canon(bombed) === clean,
          "retry must re-read the pin's checkpoint files bit-for-bit " +
            "(different rand values would mean a recompute)")
        ChaosBomb.assertFired()
      } finally Checkpoints.release(pinned)
    }
  }

  test("connected components completes identically with a task failure " +
      "mid-run (reliable mode)") {
    // a 21-node chain + a clique: several label rounds, but diameter
    // safely inside the convergence cap
    val edges = ((1 to 20).map(i => (i.toLong, i.toLong + 1)) ++
      Seq((1000L, 1001L), (1001L, 1002L), (1000L, 1002L))).toDF("d1", "d2")
    val clean = canon(Dedup.connectedComponents(edges))
    withReliable {
      val bombedEdges = edges.as[(Long, Long)]
        .mapPartitions { it => ChaosBomb.touch(); it }.toDF("d1", "d2")
      ChaosBomb.arm(3) // fires while the edge list is being pinned
      assert(canon(Dedup.connectedComponents(bombedEdges)) === clean)
      ChaosBomb.assertFired()
    }
  }

  test("two-phase rank completes identically with a task failure AFTER " +
      "the range-sampling pass (reliable mode)") {
    val rnd = new scala.util.Random(23)
    val df = (1 to 3000).map(_ => (rnd.nextInt(300), rnd.nextLong()))
      .toDF("k", "id").distinct()
    val clean = canon(Ranking.globalRowNumber(df, Seq($"k", $"id"), partitions = 7))
    withReliable {
      // explicit repartition(6) BELOW the bomb: AQE would otherwise
      // coalesce the distinct's shuffle to one partition and the armed
      // fuse would outlive the run (user-specified counts are preserved)
      val bombed = df.repartition(6).as[(Int, Long)]
        .mapPartitions { it => ChaosBomb.touch(); it }.toDF("k", "id")
      // repartitionByRange scans the source twice (boundary sampling,
      // then shuffle write): arming past the first full scan drops the
      // failure into the shuffle-write pass — mid-run, post-sampling
      ChaosBomb.arm(6 + 2)
      assert(canon(Ranking.globalRowNumber(bombed, Seq($"k", $"id"),
        partitions = 7)) === clean)
      ChaosBomb.assertFired()
    }
  }

  // ---------------------------------------------------------------------
  // Loud-failure half (r11 verdict #6). The tests above prove recovery
  // when checkpoint FILES survive; these prove the complementary
  // operational claim: when the files are gone or corrupt, the job FAILS
  // with a diagnosable error — it can never silently recompute different
  // data, because the pin cut the lineage. An operator debugging a
  // 100 TB job needs the failure to name the checkpoint, not to get a
  // plausible-but-wrong result.
  // ---------------------------------------------------------------------

  private def rddDirs(): Set[java.nio.file.Path] = {
    val root = SparkSpec.reliableCkptDir
    if (!java.nio.file.Files.exists(root)) return Set.empty
    val s = java.nio.file.Files.walk(root)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(_.getFileName.toString.startsWith("rdd-")).toSet
    } finally s.close()
  }

  private def partFilesIn(dir: java.nio.file.Path): Seq[java.nio.file.Path] = {
    if (!java.nio.file.Files.exists(dir)) return Seq.empty
    val s = java.nio.file.Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(_.getFileName.toString.startsWith("part-")).toSeq
    } finally s.close()
  }

  /** The checkpoint directory backing a pinned frame (the
    * Checkpoints.release walk, read-only). */
  private def ckptDirOf(df: DataFrame): java.nio.file.Path = {
    def walk(r: org.apache.spark.rdd.RDD[_]): Option[String] =
      r.getCheckpointFile.orElse(
        r.dependencies.view.flatMap(d => walk(d.rdd)).headOption)
    java.nio.file.Paths.get(new java.net.URI(walk(df.rdd).getOrElse(
      fail("frame is not reliably checkpointed"))))
  }

  private def causeChain(e: Throwable): String = {
    val sb = new StringBuilder
    var t: Throwable = e
    while (t != null) { sb.append(t.toString).append('\n'); t = t.getCause }
    sb.toString
  }

  /** The failure must name something an operator can act on: the
    * checkpoint file/dir or the read failure class. */
  private def assertDiagnosable(e: Throwable): Unit = {
    val chain = causeChain(e)
    assert(chain.contains("rdd-") || chain.toLowerCase.contains("checkpoint"),
      s"failure does not name the checkpoint:\n$chain")
  }

  test("DELETED checkpoint part-file: the next read fails loudly and " +
      "names the checkpoint — never silently recomputes (lineage is cut)") {
    withReliable {
      val pinned = Checkpoints.pin(
        spark.range(2000).repartition(4).withColumn("r", rand()))
      assert(pinned.count() === 2000L) // readable while intact
      val parts = partFilesIn(ckptDirOf(pinned))
      assert(parts.nonEmpty, "no part files under the pin's rdd dir")
      java.nio.file.Files.delete(parts.head) // one lost block/object
      val e = intercept[Exception] { pinned.count() }
      assertDiagnosable(e)
    }
  }

  test("CORRUPT checkpoint part-file: the next read fails loudly, not " +
      "with garbage rows") {
    withReliable {
      val pinned = Checkpoints.pin(
        spark.range(1000).repartition(4).withColumn("r", rand()))
      assert(pinned.count() === 1000L)
      val parts = partFilesIn(ckptDirOf(pinned))
      assert(parts.nonEmpty)
      java.nio.file.Files.write(parts.head,
        Array.fill[Byte](64)(0x5A)) // overwrite with garbage
      val e = intercept[Exception] { pinned.count() }
      // a corrupt stream surfaces as a checksum/serializer failure naming
      // the part file (observed: hadoop ChecksumException on rdd-N/part-M)
      assertDiagnosable(e)
    }
  }

  test("two-phase rank: checkpoint loss between pin and consumption " +
      "fails the job loudly (no re-sampled silent ranks)") {
    withReliable {
      val before = rddDirs()
      val df = (1 to 2000).map(i => (i % 97, i.toLong)).toDF("k", "id")
      // the range pin materializes eagerly inside the call
      val ranked = Ranking.globalRowNumber(df, Seq($"k", $"id"), partitions = 5)
      val fresh = rddDirs().diff(before)
      assert(fresh.nonEmpty, "globalRowNumber created no reliable pin")
      val deleted = fresh.flatMap(partFilesIn).count { p =>
        java.nio.file.Files.deleteIfExists(p)
      }
      assert(deleted > 0)
      val e = intercept[Exception] { ranked.collect() }
      assertDiagnosable(e)
    }
  }

  test("distributed prefix-sum: checkpoint loss between pin and " +
      "consumption fails the job loudly") {
    withReliable {
      val before = rddDirs()
      val rollup = (1 to 3000).map(i => (s"g${i % 3}", (i * 13 % 500).toLong))
        .toDF("g", "v").groupBy("g", "v").agg(count(lit(1)).as("__c"))
      val out = graft.core.Stats.withGroupedCumSum(
        rollup, "g", "v", distributed = true)
      val fresh = rddDirs().diff(before)
      assert(fresh.nonEmpty, "withGroupedCumSum created no reliable pin")
      val deleted = fresh.flatMap(partFilesIn).count { p =>
        java.nio.file.Files.deleteIfExists(p)
      }
      assert(deleted > 0)
      val e = intercept[Exception] { out.collect() }
      assertDiagnosable(e)
    }
  }

  test("connected components: checkpoint files vanishing MID-RUN abort " +
      "the iteration loudly (label fronts cannot be silently rebuilt)") {
    withReliable {
      val before = rddDirs()
      @volatile var deleted = 0
      @volatile var stop = false
      val watcher = new Thread(() => {
        // wait until the edge pin AND the first label front exist, then
        // delete every part file they hold — the next round's join must
        // blow up, not re-derive labels from a lineage that was cut
        while (!stop && deleted == 0) {
          val fresh = rddDirs().diff(before)
          if (fresh.size >= 2)
            deleted = fresh.toSeq.flatMap(partFilesIn).count { p =>
              try java.nio.file.Files.deleteIfExists(p)
              catch { case _: java.io.IOException => false }
            }
          else Thread.sleep(2)
        }
      }, "chaos-ckpt-killer")
      watcher.start()
      try {
        // a 160-node path graph: label propagation needs many rounds, so
        // the deletion always lands mid-iteration
        val edges = (1 to 160).map(i => (i.toLong, i.toLong + 1))
          .toDF("d1", "d2")
        val e = intercept[Exception] {
          Dedup.connectedComponents(edges).collect()
        }
        assertDiagnosable(e)
      } finally { stop = true; watcher.join(5000) }
      assert(deleted > 0,
        "the watcher never deleted anything — the run was not mid-flight")
    }
  }

  test("distributed prefix-sum completes identically with a mid-run task " +
      "failure (reliable mode)") {
    val rows = (1 to 5000).map(i => (s"g${i % 3}", (i * 37 % 900).toLong))
    val rollup = rows.toDF("g", "v").groupBy("g", "v")
      .agg(count(lit(1)).as("__c"))
    val clean = canon(
      graft.core.Stats.withGroupedCumSum(rollup, "g", "v", distributed = true))
    withReliable {
      // explicit repartition(6) below the bomb (see the rank test: AQE
      // would coalesce the rollup shuffle to one partition)
      val bombed = rollup.repartition(6).as[(String, Long, Long)]
        .mapPartitions { it => ChaosBomb.touch(); it }.toDF("g", "v", "__c")
      ChaosBomb.arm(6 + 2)
      assert(canon(graft.core.Stats.withGroupedCumSum(
        bombed, "g", "v", distributed = true)) === clean)
      ChaosBomb.assertFired()
    }
  }
}

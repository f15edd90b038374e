package graft

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import graft.core.Checkpoints
import graft.operators.{Dedup, Ranking}

/** Reliable-checkpoint fallback (VERDICT r6 #4): with
  * `spark.graft.checkpointDir` set, every Checkpoints.pin site switches
  * from executor-local blocks to reliable `checkpoint()` files that
  * survive executor loss — same outputs, checkpoint data observed on
  * disk.
  *
  * The SparkContext checkpoint dir is JVM-global once initialized, so
  * the suite uses ONE directory and asserts file-count growth per
  * operation rather than per-test dirs.
  */
class CheckpointSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ckptDir: Path = SparkSpec.reliableCkptDir

  private def nFiles(dir: Path): Int =
    if (!Files.isDirectory(dir)) 0
    else Files.walk(dir).iterator().asScala.count(Files.isRegularFile(_)).toInt

  private def withReliable[A](f: => A): A = {
    spark.conf.set(Checkpoints.ConfKey, ckptDir.toString)
    try f
    finally spark.conf.unset(Checkpoints.ConfKey)
  }

  test("globalRowNumber: reliable checkpoint gives identical ranks and writes files") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 2000).map(_ => (rnd.nextInt(500), rnd.nextLong()))
      .toDF("k", "id").distinct()
    def canon(out: org.apache.spark.sql.DataFrame) =
      out.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
        .sortBy(r => (r._1, r._2))
    val local = canon(Ranking.globalRowNumber(df, Seq($"k", $"id"), partitions = 7))
    val before = nFiles(ckptDir)
    val reliable = withReliable {
      canon(Ranking.globalRowNumber(df, Seq($"k", $"id"), partitions = 7))
    }
    assert(reliable === local)
    assert(nFiles(ckptDir) > before,
      "reliable mode must write checkpoint files under the configured dir")
  }

  test("connectedComponents: identical clusters under the reliable flavor") {
    // two chains + a clique
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L),
      (20L, 22L)).toDF("d1", "d2")
    def canon(out: org.apache.spark.sql.DataFrame) =
      out.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val local = canon(Dedup.connectedComponents(pairs))
    val before = nFiles(ckptDir)
    val reliable = withReliable { canon(Dedup.connectedComponents(pairs)) }
    assert(reliable === local)
    assert(nFiles(ckptDir) > before)
  }

  test("connectedComponents: superseded iteration checkpoints are deleted") {
    // a 5-node chain needs several label rounds; every superseded front
    // (and the pinned edge list) must release its rdd-N dir — only the
    // FINAL labels' checkpoint may remain on disk
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("d1", "d2")
    def rddDirs(dir: Path): Set[String] =
      if (!Files.isDirectory(dir)) Set.empty
      else Files.walk(dir).iterator().asScala
        .filter(p => Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("rdd-"))
        .map(_.toString).toSet
    val before = rddDirs(ckptDir)
    val out = withReliable {
      Dedup.connectedComponents(pairs).collect()
    }
    assert(out.forall(_.getLong(1) == 1L)) // one chain, min-id root
    val added = rddDirs(ckptDir) -- before
    assert(added.size <= 1,
      s"only the final label front may keep its checkpoint (got $added)")
  }

  test("connectedComponents: non-convergence releases EVERY checkpoint") {
    // a 6-node chain cannot converge in one propagation round; the
    // abnormal exit must leave nothing behind — superseded fronts, the
    // in-flight front, and the pinned edge list all release
    def rddDirs(dir: Path): Set[String] =
      if (!Files.isDirectory(dir)) Set.empty
      else Files.walk(dir).iterator().asScala
        .filter(p => Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("rdd-"))
        .map(_.toString).toSet
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("d1", "d2")
    val before = rddDirs(ckptDir)
    intercept[IllegalStateException] {
      withReliable { Dedup.connectedComponents(pairs, maxIter = 2) }
    }
    assert((rddDirs(ckptDir) -- before).isEmpty,
      "abnormal exit must not orphan any rdd-N checkpoint dir")
  }

  test("connectedComponents: local flavor releases superseded blocks") {
    val before = spark.sparkContext.getPersistentRDDs.size
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("d1", "d2")
    Dedup.connectedComponents(pairs).collect()
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 1,
      s"superseded localCheckpoint blocks must unpersist (delta ${after - before})")
  }

  test("without the option, pin stays executor-local (no files written)") {
    val before = nFiles(ckptDir)
    val df = (1 to 100).map(i => (i % 5, i.toLong)).toDF("k", "id")
    assert(Checkpoints.pin(df).count() == 100)
    assert(nFiles(ckptDir) == before,
      "local flavor must not touch the checkpoint dir")
  }

  test("reliable pin survives block eviction: re-reads files, never " +
      "recomputes") {
    // the cluster-mode failure this flavor exists for: executor memory
    // (block-manager state) vanishes mid-query. A rand() column makes
    // recomputation DETECTABLE — a recomputed partition would draw new
    // values — so value equality across an aggressive unpersist of every
    // persistent RDD proves the second consumer re-read checkpoint
    // FILES.
    val before = nFiles(ckptDir)
    val pinned = withReliable {
      Checkpoints.pin(
        (1 to 5000).toDF("id").repartition(8).withColumn("r", rand()))
    }
    assert(nFiles(ckptDir) > before, "the pin must write checkpoint files")
    try {
      val first = pinned.collect().map(_.toSeq.map(String.valueOf))
        .sortBy(_.mkString("|"))
      // simulate executor loss: evict every block-manager entry the JVM
      // holds (this is what destroys a localCheckpoint pin)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      val second = pinned.collect().map(_.toSeq.map(String.valueOf))
        .sortBy(_.mkString("|"))
      assert(second === first,
        "post-eviction read must come from checkpoint files bit-for-bit")
    } finally Checkpoints.release(pinned)
    assert(nFiles(ckptDir) == before,
      "release() must delete the pin's rdd-N checkpoint directory")
  }
}

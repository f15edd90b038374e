package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM-wide session; cheap). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  def sfDir = "/root/testdata/sf0.001"
}

object SparkSpec {
  // maxTaskFailures = 2 so ChaosSpec can inject one task failure and
  // assert recovery; a genuinely broken task still fails the suite
  // (after one extra attempt)
  lazy val session: SparkSession = graft.core.GraftSession.local(8, maxTaskFailures = 2)

  /** Temp dirs created by specs, removed by ONE shutdown hook when the
    * test JVM exits. Every spec temp dir goes through here: the r13
    * anchor-A incident (1115 stale `/tmp/graft-*` dirs, ~16 GB, +15%
    * bench wall from page-cache/inode pressure) was exactly this leak
    * accumulating across suite runs. Tracking only OUR paths keeps the
    * cleanup safe beside any concurrently running JVM. */
  private val trackedTmp =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]
  private lazy val tmpHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      trackedTmp.forEach { p =>
        try {
          import java.nio.file.{Files, Path}
          import scala.jdk.CollectionConverters._
          if (Files.exists(p)) {
            val all = Files.walk(p).iterator().asScala.toSeq.reverse
            all.foreach(f => try Files.deleteIfExists(f)
              catch { case _: java.io.IOException => () })
          }
        } catch { case _: Throwable => () }
      }
    }, "graft-spec-tmp-cleanup"))

  /** Create a tracked temp directory (use instead of
    * `Files.createTempDirectory` in every spec). */
  def tempDir(prefix: String): java.nio.file.Path = {
    tmpHook
    val p = java.nio.file.Files.createTempDirectory(prefix)
    trackedTmp.add(p)
    p
  }

  /** THE reliable-checkpoint directory for every suite that exercises
    * `spark.graft.checkpointDir`. The SparkContext checkpoint dir is
    * JVM-global and first-setter-wins (Checkpoints.pin only initializes
    * it when unset), so two suites creating their own dirs would leave
    * the loser counting files in a directory nothing writes to. */
  lazy val reliableCkptDir: java.nio.file.Path = {
    val d = tempDir("graft-ckpt")
    session.sparkContext.setCheckpointDir(d.toString)
    d
  }
}

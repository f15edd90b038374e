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

  /** THE reliable-checkpoint directory for every suite that exercises
    * `spark.graft.checkpointDir`. The SparkContext checkpoint dir is
    * JVM-global and first-setter-wins (Checkpoints.pin only initializes
    * it when unset), so two suites creating their own dirs would leave
    * the loser counting files in a directory nothing writes to. */
  lazy val reliableCkptDir: java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory("graft-ckpt")
    session.sparkContext.setCheckpointDir(d.toString)
    d
  }
}

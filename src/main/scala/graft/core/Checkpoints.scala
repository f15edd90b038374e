package graft.core

import org.apache.spark.sql.DataFrame

/** Materialization pin for multi-consumer intermediates whose
  * recomputation would be WRONG, not just slow: re-sampled range
  * boundaries (two-phase rank, distributed prefix-sum) and iterative
  * label fronts (connected components) must be computed exactly once.
  *
  * Two flavors, selected by session config:
  *
  *  - default: `localCheckpoint(eager = true)` — executor-local blocks,
  *    no filesystem dependency, the right call in local mode and for
  *    short-lived jobs. Fragile on a real cluster: losing an executor
  *    loses its blocks, and the lineage needed to rebuild them was cut.
  *  - `spark.graft.checkpointDir = <path>`: reliable `checkpoint()` to
  *    that directory (HDFS/object store on a cluster) — survives
  *    executor loss, the production form for long jobs at scale. The
  *    session's RDD checkpoint dir is initialized from the option on
  *    first use (an explicitly pre-set `sparkContext.setCheckpointDir`
  *    wins).
  *
  * Both flavors are eager, so callers can rely on the returned frame
  * being pinned before any consumer runs.
  */
object Checkpoints {

  val ConfKey = "spark.graft.checkpointDir"

  def pin(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey) match {
      case Some(dir) if dir.nonEmpty =>
        if (spark.sparkContext.getCheckpointDir.isEmpty)
          spark.sparkContext.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case _ => df.localCheckpoint(eager = true)
    }
  }
}

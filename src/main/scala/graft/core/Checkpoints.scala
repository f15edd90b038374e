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

  /** Free a pinned frame's backing storage once it is SUPERSEDED — after
    * this, any further action on `df` fails or recomputes nothing (its
    * lineage was cut at the pin), so only call when no consumer remains.
    * Without it, iterative pinners (connected components pins a fresh
    * label front every round) grow the checkpoint dir / block store by
    * one full copy per iteration for the job's lifetime.
    *
    *  - reliable flavor: deletes the pin's `rdd-N` checkpoint directory
    *    through the Hadoop filesystem of the configured dir (HDFS/object
    *    store on a cluster, local fs in tests).
    *  - local flavor: drops the executor-local blocks
    *    (`unpersist` on the checkpointed RDD).
    *
    * The pinned RDD sits a couple of deserialization wrappers below
    * `df.rdd`; the walk stops at the first checkpointed or persisted
    * node, so it never touches storage owned by an unrelated plan.
    */
  def release(df: DataFrame): Unit = {
    def walk(r: org.apache.spark.rdd.RDD[_]): Unit =
      r.getCheckpointFile match {
        case Some(p) =>
          val path = new org.apache.hadoop.fs.Path(p)
          val fs = path.getFileSystem(
            df.sparkSession.sparkContext.hadoopConfiguration)
          fs.delete(path, true); ()
        case None =>
          if (r.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE) {
            r.unpersist(blocking = false); ()
          } else r.dependencies.foreach(d => walk(d.rdd))
      }
    walk(df.rdd)
  }
}

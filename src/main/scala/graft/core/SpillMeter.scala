package graft.core

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Task-metrics accumulator for the bench tools: spill and peak
  * execution memory per measured query. At 100 TB / 1000 executors
  * per-task memory is scarce and every big aggregation/join must be able
  * to spill; the constrained-heap validation (SCALE.md) needs the
  * numbers, not the assumption — a query that "passes" under an 8 GiB
  * heap WITHOUT spilling never exercised the path.
  *
  * Listener delivery is asynchronous, so [[settle]] polls until two
  * consecutive snapshots agree (bounded) before a reading is taken.
  */
class SpillMeter extends SparkListener {
  private val memSpill = new AtomicLong(0L)
  private val diskSpill = new AtomicLong(0L)
  private val peakExec = new AtomicLong(0L)
  private val cpuMs = new AtomicLong(0L)

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m != null) {
      memSpill.addAndGet(m.memoryBytesSpilled)
      diskSpill.addAndGet(m.diskBytesSpilled)
      peakExec.accumulateAndGet(m.peakExecutionMemory, Math.max(_: Long, _: Long))
      // executorCpuTime (ns→ms): ACTUAL cpu cycles, the number neither
      // idle cores nor GC stalls can distort. The r11 lesson, twice
      // over: a quadratic pair blow-up read as wall exponent 1.2 while
      // CPU grew at 2.2 (idle threads absorbed it, q177) — and
      // executorRunTime in turn over-reads the exponent on scan-heavy
      // queries because it is thread-wall including the GC/memory-
      // bandwidth stalls of a fuller machine (q67 ran at 1.9 by
      // runTime, ~1.1 by cpuTime). Scale verdicts use cpuTime.
      cpuMs.addAndGet(m.executorCpuTime / 1000000L)
      ()
    }
  }

  def reset(): Unit = {
    memSpill.set(0L); diskSpill.set(0L); peakExec.set(0L); cpuMs.set(0L)
  }

  /** (memoryBytesSpilled, diskBytesSpilled, max peakExecutionMemory,
    * executorCpuTime ms). */
  def snapshot(): (Long, Long, Long, Long) =
    (memSpill.get(), diskSpill.get(), peakExec.get(), cpuMs.get())

  /** Wait (bounded) for the async listener queue to drain: returns once
    * two `intervalMs`-apart snapshots agree, or after ~40 polls. The
    * Bench variance pass settles twice per query (cpu_s bookends) — at
    * 212 queries the default 50 ms cadence would eat ~40 s of the rep
    * budget, so that caller polls at 10 ms. */
  def settle(intervalMs: Long = 50L): (Long, Long, Long, Long) = {
    var prev = snapshot()
    var i = 0
    while (i < 40) {
      Thread.sleep(intervalMs)
      val cur = snapshot()
      if (cur == prev) return cur
      prev = cur
      i += 1
    }
    prev
  }
}

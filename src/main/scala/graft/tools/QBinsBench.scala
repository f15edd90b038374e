package graft.tools

import graft.functions.{QuantileBins, QuantileBinsAggregator}

/** Micro-bench for the QuantileBins reduce/merge hot path (the r11
  * verdict's "immutable Map per row" note): rows/s through reduce() in
  * the three regimes — small-distinct exact (the DSL's common case),
  * cap-straddling, and collapsed — plus a partial-merge storm. Decides
  * measure-vs-refactor with numbers instead of vibes. */
object QBinsBench {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 20000000L
    val agg = new QuantileBinsAggregator
    def run(tag: String, distinct: Int): Unit = {
      // warm
      var b = agg.zero
      var i = 0L
      while (i < math.min(rows / 10, 2000000L)) {
        b = agg.reduce(b, (i % distinct, 1L)); i += 1
      }
      val t0 = System.nanoTime()
      b = agg.zero
      i = 0L
      while (i < rows) { b = agg.reduce(b, (i % distinct, 1L)); i += 1 }
      val dt = (System.nanoTime() - t0) / 1e9
      val res = QuantileBins.finishPcts(b)
      println(f"$tag%-28s ${rows / dt / 1e6}%8.2f M rows/s  (p50=${res(50)})")
    }
    run("exact (64 distinct)", 64)
    run("exact (4096 distinct)", 4096)
    run("collapsed (1M distinct)", 1000000)
    // merge storm: 4096 block partials of 4Ki rows each, folded serially
    val parts = Array.tabulate(4096) { p =>
      var b = agg.zero
      var i = 0L
      while (i < 4096) { b = agg.reduce(b, (p * 4096L + i, 1L)); i += 1 }
      b
    }
    val t0 = System.nanoTime()
    var acc = agg.zero
    var p = 0
    while (p < parts.length) { acc = agg.merge(acc, parts(p)); p += 1 }
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"merge 4096 partials         $dt%8.3f s      (n=${acc.n})")
  }
}

package graft

import graft.core.Stats

/** Randomized differential tests for the exact quantile family: every
  * operator vs a naive driver-side reference over seeded corpora with
  * deliberate tie mass, negative values, and skewed group sizes.
  */
class QuantileFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(seed: Int): Seq[(String, Double)] = {
    val rnd = new scala.util.Random(seed)
    val groups = 1 + rnd.nextInt(4)
    (0 until 800 + rnd.nextInt(400)).map { _ =>
      val g = s"g${rnd.nextInt(groups)}"
      // mixture: heavy tie mass at a few values + continuous tail + negatives
      val v = rnd.nextInt(4) match {
        case 0 => rnd.nextInt(3).toDouble * 10
        case 1 => -rnd.nextInt(5).toDouble
        case _ => math.round(rnd.nextDouble() * 1e6) / 1e3
      }
      (g, v)
    }
  }

  private def lowerQuantileRef(vs: Seq[Double], num: Int, den: Int): Double = {
    val sorted = vs.sorted
    val n = sorted.length.toLong
    // smallest v with cum*den >= n*num over the sorted multiset
    var cum = 0L
    val it = sorted.iterator
    var res = sorted.last
    var found = false
    while (it.hasNext && !found) {
      val v = it.next(); cum += 1
      if (cum * den >= n * num) { res = v; found = true }
    }
    res
  }

  test("lowerQuantiles == driver-side reference over 8 seeded corpora") {
    for (seed <- 1 to 8) {
      val data = corpus(seed)
      val df = data.toDF("grp", "v")
      val got = Stats.lowerQuantiles(df, "grp", "v",
          Seq(("p10", 1, 10), ("p50", 1, 2), ("p90", 9, 10), ("p100", 1, 1)))
        .as[(String, Long, Double, Double, Double, Double)].collect()
        .map(r => r._1 -> r).toMap
      val byG = data.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
      for ((g, vs) <- byG) {
        val (_, n, p10, p50, p90, p100) = got(g)
        assert(n == vs.length, s"seed=$seed g=$g n")
        assert(p10 == lowerQuantileRef(vs, 1, 10), s"seed=$seed g=$g p10")
        assert(p50 == lowerQuantileRef(vs, 1, 2), s"seed=$seed g=$g p50")
        assert(p90 == lowerQuantileRef(vs, 9, 10), s"seed=$seed g=$g p90")
        assert(p100 == vs.max, s"seed=$seed g=$g p100")
      }
    }
  }

  test("madOutliers == driver-side reference over 8 seeded corpora") {
    for (seed <- 11 to 18) {
      val data = corpus(seed)
      val got = Stats.madOutliers(data.toDF("grp", "v"), "grp", "v", k = 3.0)
        .as[(String, Long, Double, Double, Long)].collect()
        .map(r => r._1 -> r).toMap
      for ((g, pairs) <- data.groupBy(_._1)) {
        val vs = pairs.map(_._2).toSeq
        val med = lowerQuantileRef(vs, 1, 2)
        val devs = vs.map(v => math.abs(v - med))
        val mad = lowerQuantileRef(devs, 1, 2)
        val outliers = devs.count(_ > 3.0 * mad)
        val (_, n, gm, gmad, gout) = got(g)
        assert(n == vs.length && gm == med && gmad == mad && gout == outliers,
          s"seed=$seed g=$g: got ($n,$gm,$gmad,$gout) want (${vs.length},$med,$mad,$outliers)")
      }
    }
  }

  test("equidepthHist == driver-side reference over 8 seeded corpora") {
    for (seed <- 21 to 28; buckets <- Seq(4, 8)) {
      val data = corpus(seed)
      val got = Stats.equidepthHist(data.toDF("grp", "v"), "grp", "v", buckets)
        .as[(String, Long, Double, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3, r._4)).sortBy(_._1)).toMap
      for ((g, pairs) <- data.groupBy(_._1)) {
        val vs = pairs.map(_._2).toSeq
        val n = vs.length.toLong
        // reference: walk distinct values in order, assign start-based buckets
        val byV = vs.groupBy(identity).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
        var cumBefore = 0L
        val assign = byV.map { case (v, c) =>
          val b = (cumBefore * buckets) / n + 1
          cumBefore += c
          (b, v, c)
        }
        val ref = assign.groupBy(_._1).map { case (b, rows) =>
          (b, rows.map(_._2).max, rows.map(_._3).sum)
        }.toSeq.sortBy(_._1)
        assert(got(g).toSeq == ref, s"seed=$seed g=$g buckets=$buckets")
        assert(ref.map(_._3).sum == n)
      }
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Randomized differential fuzz for the sampling/split/quantile family:
  * random skewed corpora vs in-memory references. The two-phase quota
  * cap's salt-bucket algebra, the purged split's integer span fractions
  * and entity purge set, and the weighted median's cum-crossing rule are
  * each one boundary comparison away from silently wrong at parameters
  * the fixed catalog never visits.
  */
class SamplingFuzzSpec extends SparkSpec {
  import spark.implicits._

  test("quotaCapTwoPhase fuzz: salted two-phase cap == exact per-key " +
      "top-k under a total order, at every (k, buckets)") {
    for (seed <- Seq(3, 41); (k, buckets) <- Seq((3, 4), (7, 32), (1, 2))) {
      val rnd = new scala.util.Random(seed)
      // skewed: key 0 hot (half the rows), the rest uniform
      val rows = (1L to 400L).map { id =>
        val key = if (rnd.nextBoolean()) 0L else rnd.nextInt(20).toLong
        (id, key, rnd.nextInt(50).toLong)
      }
      val want = rows.groupBy(_._2).flatMap { case (_, rs) =>
        rs.sortBy(r => (r._3, r._1)).take(k).map(_._1)
      }.toSeq.sorted
      val got = Sampling.quotaCapTwoPhase(rows.toDF("id", "key", "ts"),
          "key", Seq(col("ts"), col("id")), k, saltCol = col("id"), buckets)
        .collect().map(_.getAs[Long]("id")).toSeq.sorted
      assert(got === want, s"seed $seed k $k buckets $buckets")
    }
  }

  test("purgedTemporalSplit fuzz: zone boundaries, purge set, and " +
      "per-label counts == in-memory replay") {
    for (seed <- Seq(11, 29); (tp, ep) <- Seq((60, 5), (50, 0), (30, 40))) {
      val rnd = new scala.util.Random(seed)
      val rows = (1 to 300).map { _ =>
        (rnd.nextInt(40).toLong, (100000 + rnd.nextInt(5000)).toLong,
          s"lbl${rnd.nextInt(3)}")
      }
      val lo = rows.map(_._2).min
      val hi = rows.map(_._2).max
      val t1 = lo + (hi - lo) * tp / 100
      val t2 = lo + (hi - lo) * (tp + ep) / 100
      def zone(s: Long) =
        if (s <= t1) "train" else if (s < t2) "embargo" else "test"
      val purged = rows.filter(r => zone(r._2) == "embargo").map(_._1).toSet
      val want = rows.groupBy(_._3).map { case (lbl, rs) =>
        Seq(lbl,
          rs.count(r => zone(r._2) == "train").toString,
          rs.count(r => zone(r._2) == "embargo").toString,
          rs.count(r => zone(r._2) == "test" && !purged(r._1)).toString,
          rs.count(r => zone(r._2) == "test" && purged(r._1)).toString,
          t1.toString, t2.toString)
      }.toSeq.sortBy(_.head)
      val got = Sampling.purgedTemporalSplit(
          rows.toDF("entity", "ts", "lbl"), "entity", col("ts"), "lbl",
          trainPctOfSpan = tp, embargoPctOfSpan = ep)
        .collect().map(_.toSeq.map(String.valueOf).toSeq)
        .sortBy(_.head).toSeq
      assert(got === want, s"seed $seed train $tp embargo $ep")
    }
  }

  test("groupedWeightedMedian fuzz: cum-crossing rule == brute weighted " +
      "median over random integer weights (zeros included)") {
    for (seed <- Seq(7, 23)) {
      val rnd = new scala.util.Random(seed)
      val rows = (1 to 400).map { _ =>
        (s"g${rnd.nextInt(6)}", rnd.nextInt(30).toLong,
          rnd.nextInt(5).toLong) // weights 0..4
      }
      val want = rows.groupBy(_._1).map { case (g, rs) =>
        val byVal = rs.groupBy(_._2).view
          .mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
        val tot = byVal.map(_._2).sum
        var cum = 0L
        val med = byVal.collectFirst {
          case (v, c) if { cum += c; cum * 2 >= tot } => v
        }.get
        g -> (tot, med)
      }
      val got = graft.core.Stats.groupedWeightedMedian(
          rows.toDF("g", "v", "w"), "g", "v", "w")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2))).toMap
      assert(got === want, s"seed $seed")
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, TextAnalysis}

/** Round-15 operators: the Gopher rule bundle and the curation
  * waterfall.
  */
class Round15OpsSpec extends SparkSpec {
  import spark.implicits._

  test("gopherRules: each rule fires on its own pathology") {
    val docs = Seq(
      (1L, "the cat sat of the mat and it is that good"), // passes all
      (2L, "zebra quokka wombat dingo koala possum"),     // no stopwords
      (3L, "the a go go go go go go go go go go"),        // repetition
      (4L, "the a is"),                                   // too short
      (5L, "the a of 1 2 3 4 5 6 7 8 9"))                 // low alpha frac
      .toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(docs, "doc_id", "text",
      minWords = 5, maxTopBigramFrac = 0.3)
      .orderBy("doc_id").collect()
    def flags(i: Int) = (r(i).getBoolean(6), r(i).getBoolean(7),
      r(i).getBoolean(8), r(i).getBoolean(9), r(i).getBoolean(10),
      r(i).getBoolean(11))
    assert(flags(0) === ((true, true, true, true, true, true)))
    assert(flags(1) === ((true, true, false, true, true, false)))
    // doc 3: "go go" occurs 9 times of 11 bigrams > 0.3
    assert(!r(2).getBoolean(10) && !r(2).getBoolean(11))
    assert(!r(3).getBoolean(6) && !r(3).getBoolean(11))
    assert(!r(4).getBoolean(9) && !r(4).getBoolean(11))
    // exact metrics for doc 1: 11 words, 4 distinct stopwords among
    // {the, of, and, is, it(not), that}
    assert(r(0).getLong(1) === 11L)
    assert(r(0).getLong(3) === 5L, "the, of, and, is, that")
    assert(r(0).getDouble(4) === 1.0)
  }

  test("gopherRules: top-bigram run counting matches the exact group count") {
    // "x y x y x y": bigrams [x y, y x, x y, y x, x y] → top 'x y' ×3 of 5
    val docs = Seq((1L, "x y x y x y")).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(docs, "doc_id", "text", minWords = 1,
      minDistinctStopwords = 0).collect()
    assert(r(0).getDouble(5) === 3.0 / 5.0)
  }

  test("waterfall: conjunctive stage survival with exact retention") {
    val df = Seq(
      (1L, 10L, true, true, true),
      (2L, 20L, true, true, false),
      (3L, 30L, true, false, true), // dropped at stage 2 → never reaches 3
      (4L, 40L, false, true, true)) // dropped at stage 1
      .toDF("id", "tok", "s1", "s2", "s3")
    val r = Curation.waterfall(df, col("tok"), Seq("s1", "s2", "s3"))
      .orderBy("stage").collect()
    assert(r.map(x => (x.getLong(0), x.getString(1), x.getLong(2),
      x.getLong(3))).toSeq === Seq(
      (0L, "input", 4L, 100L),
      (1L, "s1", 3L, 60L),
      (2L, "s2", 2L, 30L),
      (3L, "s3", 1L, 10L)))
    assert(r(0).isNullAt(4))
    assert(r(1).getDouble(4) === 3.0 / 4.0)
    assert(r(2).getDouble(4) === 2.0 / 3.0)
    assert(r(3).getDouble(4) === 0.5)
  }

  test("cusumChangepoint: hand-walked step series, exact integer alarms") {
    // 8 days: [1,1,1,1,5,5,5,5] → D=8, T=24, c·D−T = ±16
    // up path:   0,0,0,0,16,32,48,64 → alarm (>2T=48) at day 7
    // down path: 16,32,48,64,48,32,16,0 → alarm at day 3
    val ev = (0 until 4).flatMap(d => Seq(("x", d.toLong * 86400))) ++
      (4 until 8).flatMap(d => (0 until 5).map(_ => ("x", d.toLong * 86400)))
    val df = ev.toDF("event_type", "s")
    val r = graft.operators.Events.cusumChangepoint(df, "event_type",
      col("s"), bucketSec = 86400L, h = 2L).collect()
    assert(r.length === 1)
    assert(r(0).getLong(1) === 8L && r(0).getLong(2) === 24L)
    assert(r(0).getLong(3) === 64L, "max up CUSUM")
    assert(r(0).getLong(4) === 7L, "up alarm on the last step day")
    assert(r(0).getLong(5) === 64L, "max down CUSUM")
    assert(r(0).getLong(6) === 3L, "down alarm before the rate recovers")
  }

  test("cusumChangepoint: a flat series never alarms") {
    val ev = (0 until 10).map(d => ("x", d.toLong * 86400))
      .toDF("event_type", "s")
    val r = graft.operators.Events.cusumChangepoint(ev, "event_type",
      col("s"), bucketSec = 86400L).collect()
    assert(r(0).getLong(3) === 0L && r(0).isNullAt(4))
    assert(r(0).getLong(5) === 0L && r(0).isNullAt(6))
  }

  test("sessionSequences: gap split, ordered sequence string, duration") {
    val ev = Seq(
      (1L, 0L, 100L, "view"), (1L, 10L, 101L, "click"),
      (1L, 20L, 102L, "purchase"),
      (1L, 4000L, 103L, "view"),
      (2L, 5L, 200L, "error"))
      .toDF("user_id", "s", "event_id", "event_type")
    val r = graft.operators.Events.sessionSequences(ev, "user_id", "s",
      "event_id", "event_type", gapSecs = 1800L, topK = 10)
      .collect()
    assert(r.length === 3)
    assert(r(0).getLong(2) === 3L &&
      r(0).getString(4) === "view>click>purchase")
    assert(r(0).getLong(3) === 20L)
    val singles = r.drop(1).map(_.getString(4)).toSet
    assert(singles === Set("view", "error"))
  }

  test("burrowsDelta: the style-shifted slice stands apart, twins sit at 0") {
    // a and b share identical function-word rates; c doubles up on "the"
    val docs = Seq(
      ("a", "the cat of the mat"), ("a", "the dog of a hill"),
      ("b", "the cow of the barn"), ("b", "the hen of a coop"),
      ("c", "the the the the fox"), ("c", "the the the a den"))
      .toDF("source", "text")
    val r = graft.operators.TextAnalysis.burrowsDelta(docs, "source",
      "text", topWords = 3).orderBy("src_a", "src_b").collect()
    assert(r.length === 3)
    val d = r.map(x => (x.getString(0), x.getString(1)) -> x.getDouble(3))
      .toMap
    assert(d(("a", "b")) === 0.0,
      "identical top-word rates → Delta exactly 0")
    assert(d(("a", "c")) > 1.0 && d(("b", "c")) > 1.0,
      "the shifted slice is far from both twins")
    assert(d(("a", "c")) === d(("b", "c")),
      "twins are equidistant from the outlier")
    assert(r.forall(_.getLong(2) === 3L))
  }

  test("ewmaLevel: exact halving walk, first bucket seeds the level") {
    // daily counts 4, 8, 2: s = 4 → (4+8)/2 = 6 → (6+2)/2 = 4
    val ev = (Seq.fill(4)(0L) ++ Seq.fill(8)(86400L) ++
      Seq.fill(2)(2 * 86400L)).map(("x", _)).toDF("event_type", "s")
    val r = graft.operators.Events.ewmaLevel(ev, "event_type", col("s"),
      bucketSec = 86400L).collect()
    assert(r.length === 1)
    assert(r(0).getLong(1) === 3L && r(0).getLong(2) === 14L)
    assert(r(0).getDouble(3) === 4.0, "every step is exact at halving alpha")
    assert(r(0).getLong(4) === 2L)
    assert(r(0).getDouble(5) === 0.5, "last/level = 2/4 exactly")
  }

  test("labelConsistency: planted tight clusters read 1, a mislabeled " +
      "point reads 0") {
    def around(center: Int, jitterDim: Int): Array[Float] = {
      val a = (0 until 64).map(d =>
        planeW(center, d).toFloat).toArray
      a(jitterDim) = a(jitterDim) + 0.01f; a
    }
    // cluster A = label 0 (ids 0..4), cluster B = label 1 (ids 5..9),
    // id 0 probes A, id 5 probes B; id 9 carries label 0 but sits in B
    val rows = ((0L to 4L).map(i => (i, 0, around(1, i.toInt))) ++
      (5L to 8L).map(i => (i, 1, around(2, i.toInt))) ++
      Seq((9L, 0, around(2, 9)))).toDF("vec_id", "label", "embedding")
    val r = graft.operators.Similarity.labelConsistency(rows, "vec_id",
      "embedding", "label", probeIds = Seq(0L, 5L, 9L), k = 4)
      .orderBy("probe_id").collect()
    assert(r.length === 3)
    val byId = r.map(x => x.getLong(0) -> x).toMap
    assert(byId(0L).getDouble(4) === 1.0, "probe inside its own cluster")
    // probe 5's 4 nearest: ids 6,7,8 (label 1) and 9 (label 0) → 3/4
    assert(byId(5L).getDouble(4) === 0.75)
    assert(byId(9L).getDouble(4) === 0.0,
      "the mislabeled point's neighborhood disagrees entirely")
  }

  private def planeW(seed: Int, d: Int): Double =
    graft.operators.Similarity.planeWeight(seed, 1, d)

  test("lshCandidateRecall: the planted same-bucket twin is always recalled") {
    val base = (0 until 64).map(d => planeW(333, d).toFloat).toArray
    val rows = (Seq(
      (0L, base),
      (1L, base.map(_ * 1.001f))) ++          // twin: identical signs
      (2L to 9L).map(i => (i,
        (0 until 64).map(d => planeW(400 + i.toInt, d).toFloat).toArray)))
      .toDF("vec_id", "embedding")
    val r = graft.operators.Similarity.lshCandidateRecall(rows, "vec_id",
      "embedding", queryIds = Seq(0L), k = 1, planes = 6, seed = 42,
      dims = 64, probes = 2).collect()
    assert(r.length === 1)
    assert(r(0).getLong(2) === 1L && r(0).getLong(3) === 1L)
    assert(r(0).getDouble(4) === 1.0,
      "the scaled twin shares every projection sign, so bucket recall " +
        "at k=1 is exact")
    assert(r(0).getLong(1) >= 1L, "the twin is among the candidates")
  }

  test("triangleCounts: K4 yields 4 triangles, every node in 3") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)).toDF("src", "dst")
    val r = graft.operators.Graph.triangleCounts(k4, "src", "dst")
      .orderBy("node").collect()
    assert(r.length === 4)
    assert(r.forall(_.getLong(1) === 3L))
    // duplicate + reversed edges change nothing
    val noisy = k4.unionAll(Seq((2L, 1L), (3L, 1L)).toDF("src", "dst"))
    val r2 = graft.operators.Graph.triangleCounts(noisy, "src", "dst")
      .orderBy("node").collect()
    assert(r2.map(_.getLong(1)).toSeq === r.map(_.getLong(1)).toSeq)
  }
}

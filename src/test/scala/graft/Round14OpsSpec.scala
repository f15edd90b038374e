package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Round-14 operators: duplicated-span reporting, centroid silhouette,
  * containment pairs, margin mining.
  */
class Round14OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- Dedup.dupSpans -----------------------------------------------------

  test("dupSpans: a shared run of L tokens merges into ONE span of L") {
    // docs 1 and 2 share the 8-token run "a b c d e f g h"; doc 3 is clean
    val docs = Seq(
      (1L, "a b c d e f g h x1 y1 z1"),
      (2L, "p q a b c d e f g h"),
      (3L, "u v w only here once at all")).toDF("doc_id", "text")
    val r = Dedup.dupSpans(docs, "doc_id", "text", k = 5, minDf = 2L)
      .orderBy("doc_id").collect()
    assert(r.length === 2, "the clean doc reports nothing")
    // L=8, k=5 → 4 duplicated starts merging into one span of exactly 8
    assert(r(0).getLong(0) === 1L && r(0).getLong(2) === 1L)
    assert(r(0).getLong(3) === 8L && r(0).getLong(4) === 8L)
    assert(r(0).getDouble(5) === 8.0 / 11.0)
    assert(r(1).getLong(0) === 2L && r(1).getLong(3) === 8L)
  }

  test("dupSpans: disjoint repeats stay separate spans") {
    // two repeated 5-gram islands separated by unique tokens
    val docs = Seq(
      (1L, "a b c d e xx1 xx2 xx3 f g h i j"),
      (2L, "a b c d e yy1 yy2 yy3 f g h i j")).toDF("doc_id", "text")
    val r = Dedup.dupSpans(docs, "doc_id", "text", k = 5, minDf = 2L)
      .orderBy("doc_id").collect()
    assert(r.length === 2)
    assert(r(0).getLong(2) === 2L, "two islands → two spans")
    assert(r(0).getLong(3) === 10L && r(0).getLong(4) === 5L)
  }

  // ---- Dedup.containmentPairs ---------------------------------------------

  test("containmentPairs: quote-inside-article has containment 1 one way") {
    val quote = "the quick brown fox jumps over the lazy dog"
    val docs = Seq(
      (1L, quote),
      (2L, s"filler1 filler2 $quote filler3 filler4 filler5"),
      (3L, "entirely different text with no overlap at all ok"))
      .toDF("doc_id", "text")
    val r = Dedup.containmentPairs(docs, "doc_id", "text",
      n = 3, maxDf = 50L, minContainment = 0.3, topK = 10)
      .orderBy("id_a", "id_b").collect()
    val fwd = r.find(x => x.getLong(0) === 1L && x.getLong(1) === 2L).get
    assert(fwd.getDouble(5) === 1.0, "every 3-gram of the quote is in the article")
    val rev = r.find(x => x.getLong(0) === 2L && x.getLong(1) === 1L)
    // article → quote containment is |∩|/|article grams| < 1
    rev.foreach(x => assert(x.getDouble(5) < 1.0))
    assert(!r.exists(x => x.getLong(0) === 3L || x.getLong(1) === 3L))
  }

  test("containmentPairs: df cap drops boilerplate grams from evidence") {
    // the shared gram appears in ALL 4 docs → df=4 > maxDf=3 → no pairs
    val docs = (1L to 4L).map(i => (i, s"common shared gram unique$i"))
      .toDF("doc_id", "text")
    val r = Dedup.containmentPairs(docs, "doc_id", "text",
      n = 3, maxDf = 3L, minContainment = 0.1, topK = 10).collect()
    assert(r.isEmpty)
  }

  // ---- Similarity.centroidSilhouette --------------------------------------

  test("centroidSilhouette: tight separated clusters score near 1") {
    // centroids: ids 0,1 far apart; members hug their centroid
    def vec(base: Double, jitter: Double): Array[Float] =
      (0 until 64).map(d => (base + (if (d == 0) jitter else 0.0)).toFloat)
        .toArray
    val emb = (Seq((0L, vec(0.0, 0.0)), (1L, vec(10.0, 0.0))) ++
      (2L to 6L).map(i => (i, vec(0.0, 0.01 * i))) ++
      (7L to 11L).map(i => (i, vec(10.0, 0.01 * i))))
      .toDF("vec_id", "embedding")
    val r = Similarity.centroidSilhouette(emb, "vec_id", "embedding",
      nClusters = 2).orderBy("cluster").collect()
    assert(r.length === 2)
    r.foreach { row =>
      assert(row.getDouble(2) > 0.95,
        s"tight separated clusters must score ~1, got ${row.getDouble(2)}")
    }
    assert(r.map(_.getLong(1)).sum === 12L, "every vector is scored")
  }

  test("centroidSilhouette: a point midway between centroids scores ~0") {
    def const(v: Double): Array[Float] = Array.fill(64)(v.toFloat)
    val emb = Seq((0L, const(0.0)), (1L, const(10.0)), (2L, const(5.0)))
      .toDF("vec_id", "embedding")
    val r = Similarity.centroidSilhouette(emb, "vec_id", "embedding",
      nClusters = 2).collect()
    // the midway point scores exactly 0 (a = b) and is tie-broken into
    // cluster 0, whose mean becomes (1 + 0)/2 = 0.5; cluster 1 keeps 1.0
    val byCluster = r.map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(byCluster(0L) === 0.5 && byCluster(1L) === 1.0)
  }

  // ---- Similarity.marginMining --------------------------------------------

  test("marginMining: the planted cross-label twin wins on margin") {
    // mutually orthogonal basis fillers (cos = 0 across every non-twin
    // pair), one planted near-identical twin across the labels
    def basis(dim: Int): Array[Float] = {
      val a = Array.fill(64)(0.0f); a(dim) = 1.0f; a
    }
    val twin = (0 until 64).map(d =>
      Similarity.planeWeight(7000, 1, d).toFloat).toArray
    val rows = (
      Seq((100L, 0, twin)) ++
      (101L to 104L).map(i => (i, 0, basis(i.toInt - 101))) ++
      Seq((200L, 1, twin.map(x => x * 1.001f))) ++
      (201L to 204L).map(i => (i, 1, basis(i.toInt - 201 + 10))))
      .toDF("vec_id", "label", "embedding")
    val r = Similarity.marginMining(rows, "vec_id", "embedding", "label",
      srcLabel = 0, tgtLabel = 1, kNeigh = 2, topK = 3).collect()
    assert(r.nonEmpty)
    assert(r(0).getLong(0) === 100L && r(0).getLong(1) === 200L,
      "the planted twin pair must rank first by margin")
    assert(r(0).getDouble(2) > 0.99, "twin cosine ~1")
    assert(r(0).getDouble(3) > 1.0, "margin > 1 = stands out from neighbors")
  }

  test("dupSpans: span algebra invariants hold on a randomized corpus") {
    // deterministic "random" corpus: overlapping slices of a shared
    // token pool force repeated k-grams at varying offsets
    val pool = (0 until 120).map(i =>
      s"w${(i * 2654435761L % 37).toInt}")
    val docs = (0 until 40).map { d =>
      val start = (d * 7) % 60
      val len = 20 + (d % 11)
      (d.toLong, pool.slice(start, start + len).mkString(" "))
    }.toDF("doc_id", "text")
    val r = Dedup.dupSpans(docs, "doc_id", "text", k = 5, minDf = 2L)
      .collect()
    assert(r.nonEmpty, "overlapping slices must produce duplicated spans")
    r.foreach { row =>
      val (n, spans, dup, longest) = (row.getLong(1), row.getLong(2),
        row.getLong(3), row.getLong(4))
      assert(dup <= n, "span token mass cannot exceed the doc")
      assert(longest <= dup && longest >= 5,
        "longest span is at least one k-gram and within the mass")
      assert(spans >= 1 && dup >= spans * 5,
        "every span covers at least k tokens")
      assert(row.getDouble(5) === dup.toDouble / n.toDouble)
    }
  }

  test("containment and jaccardVerify agree on the same gram sets " +
      "(cross-operator law)") {
    val pool = (0 until 90).map(i => s"t${(i * 2654435761L % 23).toInt}")
    val docs = (0 until 25).map { d =>
      (d.toLong, pool.slice((d * 5) % 50, (d * 5) % 50 + 18 + d % 7)
        .mkString(" "))
    }.toDF("doc_id", "text")
    val cp = Dedup.containmentPairs(docs, "doc_id", "text",
      n = 3, maxDf = 1000000L, minContainment = 0.0, topK = 1000000)
      .filter(col("id_a") < col("id_b"))
    val cand = cp.select(col("id_a").as("d1"), col("id_b").as("d2"))
    val jv = Dedup.jaccardVerify(docs, cand, "doc_id", "text",
      threshold = 0.0)
    val joined = cp.join(jv,
      cp("id_a") === jv("d1") && cp("id_b") === jv("d2")).collect()
    assert(joined.nonEmpty, "overlapping slices must produce pairs")
    joined.foreach { r =>
      val (common, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val expected = common.toDouble / (na + nb - common).toDouble
      assert(r.getDouble(r.fieldIndex("jaccard")) === expected,
        "identical hashed gram sets ⇒ jaccard derives exactly from " +
          "containment's intersection and sizes")
      assert(common <= math.min(na, nb))
    }
  }

  // ---- Dedup.crossSourceDupMatrix -----------------------------------------

  test("crossSourceDupMatrix: shared grams count once, disjoint pairs absent") {
    val docs = Seq(
      ("a", "one two three four"),
      ("a", "one two three five"),   // re-states a's "one two three"
      ("b", "zz one two three ww"),
      ("c", "totally different text here")).toDF("source", "text")
    val r = Dedup.crossSourceDupMatrix(docs, "source", "text", n = 3)
      .orderBy("src_a", "src_b").collect()
    assert(r.length === 1, "only (a,b) share grams")
    val ab = r(0)
    assert(ab.getString(0) === "a" && ab.getString(1) === "b")
    assert(ab.getLong(2) === 1L, "the one shared gram is 'one two three'")
    // a: {one two three, two three four, two three five} = 3 distinct
    // b: {zz one two, one two three, two three ww} = 3 distinct
    assert(ab.getLong(3) === 3L && ab.getLong(4) === 3L)
    assert(ab.getDouble(5) === 1.0 / 3.0)
  }

  // ---- Stats.theilSenTrend ------------------------------------------------

  test("theilSenTrend: one wild outlier day cannot move the median slope") {
    val roll = (Seq((0L, 0L), (1L, 1L), (2L, 2L), (3L, 3L), (4L, 1000L))
      .map { case (x, y) => ("g", x, y) })
      .toDF("grp", "x", "y")
    val r = graft.core.Stats.theilSenTrend(roll, "grp", "x", "y").collect()
    assert(r.length === 1)
    assert(r(0).getLong(1) === 10L, "C(5,2) pairwise slopes")
    assert(r(0).getDouble(2) === 1.0,
      "median of [1x6, 250, 333, 499, 997] is exactly 1")
    // least squares on the same points is dragged far above 1
    val ls = graft.core.Stats.groupedTrend(roll, "grp", "x", "y").collect()
    assert(ls(0).getDouble(ls(0).fieldIndex("slope")) > 100.0)
  }

  test("theilSenTrend: even slope count averages the two middles") {
    // points (0,0),(1,0),(2,6): slopes 0, 3, 6 → median 3 (odd);
    // add (3,6): slopes 0,3,2,6,3,0 sorted [0,0,2,3,3,6] → (2+3)/2
    val roll = Seq(("g", 0L, 0L), ("g", 1L, 0L), ("g", 2L, 6L),
      ("g", 3L, 6L)).toDF("grp", "x", "y")
    val r = graft.core.Stats.theilSenTrend(roll, "grp", "x", "y").collect()
    assert(r(0).getLong(1) === 6L && r(0).getDouble(2) === 2.5)
  }

  // ---- Events.hourOfWeekProfile -------------------------------------------

  test("hourOfWeekProfile: exact lifts and means on a hand profile") {
    val ev = Seq(
      ("x", 5L * 3600 + 10, 2.0), ("x", 5L * 3600 + 900, 4.0),
      ("x", 173L * 3600, 6.0),   // 173 % 168 = 5 → same hour-of-week
      ("x", 10L * 3600, 10.0))
      .toDF("event_type", "s", "value")
    val r = graft.operators.Events.hourOfWeekProfile(ev, "event_type",
      org.apache.spark.sql.functions.col("s"),
      org.apache.spark.sql.functions.col("value"))
      .orderBy("how").collect()
    assert(r.length === 2)
    val h5 = r(0)
    assert(h5.getLong(1) === 5L && h5.getLong(2) === 3L)
    assert(h5.getDouble(3) === 4.0, "(2+4+6)/3 exactly")
    assert(h5.getDouble(4) === 168.0 * 3 / 4)
    val h10 = r(1)
    assert(h10.getLong(1) === 10L && h10.getDouble(4) === 42.0)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graph, Linkage, Sampling, Similarity}

/** Round-13 operators: PageRank, DSIR importance weights, JL distortion,
  * purged temporal splits, and Fellegi–Sunter record linkage.
  */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- Graph.pageRank -----------------------------------------------------

  test("pageRank: one hand-computed iteration on a 3-node cycle") {
    // 1→2, 1→3, 2→3, 3→1; N=3, r0=1/3, outdeg 1:2, 2:1, 3:1
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val r = Graph.pageRank(edges, "src", "dst", iterations = 1)
      .orderBy("node").collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    val base = 0.15 / 3
    // inflow: 1 ← 1/3; 2 ← 1/6; 3 ← 1/6 + 1/3 (decimal-rounded per term,
    // so compare at 1e-9 — the rounding grain is 1e-12)
    assert(math.abs(r(0).getDouble(1) - (base + 0.85 * (1.0 / 3))) < 1e-9)
    assert(math.abs(r(1).getDouble(1) - (base + 0.85 * (1.0 / 6))) < 1e-9)
    assert(math.abs(r(2).getDouble(1) - (base + 0.85 * (1.0 / 2))) < 1e-9)
  }

  test("pageRank: parallel edges weight contributions; runs are bit-stable") {
    val edges = Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
      .toDF("src", "dst")
    val once = Graph.pageRank(edges, "src", "dst", iterations = 2)
      .orderBy("node").collect()
    // node 2 receives 2/3 of node 1's share each round, node 3 only 1/3
    assert(once(1).getDouble(1) > once(2).getDouble(1))
    val again = Graph.pageRank(edges, "src", "dst", iterations = 2)
      .orderBy("node").collect()
    assert(once.map(_.getDouble(1)).toSeq ===
      again.map(_.getDouble(1)).toSeq, "bit-identical across runs")
  }

  test("pageRank: sinks leak mass, totals stay below 1 and above base") {
    // 1→2, 2 is a sink
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val r = Graph.pageRank(edges, "src", "dst", iterations = 3)
      .orderBy("node").collect()
    val total = r.map(_.getDouble(1)).sum
    assert(total < 1.0 && total > 0.15, s"leaked-mass total was $total")
    intercept[IllegalArgumentException] {
      Graph.pageRank(edges, "src", "dst", iterations = 0)
    }
  }

  // ---- Sampling.dsirWeights -----------------------------------------------

  /** The engine's portable bucket hash, reimplemented for expectations. */
  private def dsirBucket(tok: String, salt: String, buckets: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$salt:$tok".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16) % buckets
  }

  test("dsirWeights: exact integer num/den on a 3-doc corpus") {
    val docs = Seq(
      (1L, "en", "aa aa bb"), (2L, "en", "aa bb"), (3L, "de", "cc cc cc"))
      .toDF("doc_id", "lang", "text")
    val out = Sampling.dsirWeights(docs, "doc_id", "text",
      col("lang") === "en", buckets = 64, salt = "t", topK = 10)
      .orderBy("doc_id").collect()
    assert(out.length === 3)
    val b = Map("aa" -> dsirBucket("aa", "t", 64),
      "bb" -> dsirBucket("bb", "t", 64), "cc" -> dsirBucket("cc", "t", 64))
    assume(b.values.toSet.size === 3, "no bucket collisions in fixture")
    // target tokens: aa x3, bb x2 (T=5); raw adds cc x3 (R=8)
    val tf = Map(b("aa") -> 3L, b("bb") -> 2L).withDefaultValue(0L)
    val rf = Map(b("aa") -> 3L, b("bb") -> 2L, b("cc") -> 3L)
    def exp(toks: Seq[String]): (Long, Long) = {
      val cs = toks.groupBy(identity).map { case (t, g) => (b(t), g.size.toLong) }
      (cs.map { case (k, c) => c * (tf(k) + 1) }.sum,
        cs.map { case (k, c) => c * (rf(k) + 1) }.sum)
    }
    val d1 = out(0); val (n1, de1) = exp(Seq("aa", "aa", "bb"))
    assert(d1.getLong(2) === n1 && d1.getLong(3) === de1)
    assert(d1.getDouble(4) ===
      (n1.toDouble / (5L + 64L).toDouble) / (de1.toDouble / (8L + 64L).toDouble))
    // the pure-target doc outranks the pure-background doc
    val score = out.map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(score(1L) > score(3L) && score(2L) > score(3L))
  }

  // ---- Sampling.purgedTemporalSplit ---------------------------------------

  test("purgedTemporalSplit: embargo purges straddling users from test") {
    // span 0..1000 → t1=600, t2=650
    val ev = Seq(
      (1L, 0L, "a"), (1L, 700L, "a"),           // clean train + test
      (2L, 620L, "a"), (2L, 900L, "a"),          // embargo → purged test
      (3L, 200L, "b"), (3L, 1000L, "b"))         // clean; pins the max
      .toDF("user_id", "s", "event_type")
    val r = Sampling.purgedTemporalSplit(ev, "user_id", col("s"),
        "event_type", trainPctOfSpan = 60, embargoPctOfSpan = 5)
      .orderBy("event_type").collect()
    val a = r(0)
    assert(a.getString(0) === "a")
    assert(a.getLong(1) === 1L, "train: u1@0")
    assert(a.getLong(2) === 1L, "embargo: u2@620")
    assert(a.getLong(3) === 1L, "test kept: u1@700")
    assert(a.getLong(4) === 1L, "test purged: u2@900")
    assert(a.getLong(5) === 600L && a.getLong(6) === 650L)
    val bb = r(1)
    assert(bb.getString(0) === "b")
    assert(bb.getLong(1) === 1L && bb.getLong(3) === 1L &&
      bb.getLong(2) === 0L && bb.getLong(4) === 0L)
  }

  // ---- Similarity.jlDistortion --------------------------------------------

  test("jlDistortion: ratios bounded, zero-distance pair yields null ratio") {
    val vecs = (0L until 6L).map { i =>
      (i, (0 until 64).map(d =>
        Similarity.planeWeight(900 + i.toInt, 3, d).toFloat).toArray)
    } :+ (6L, (0 until 64).map(d =>
      Similarity.planeWeight(905, 3, d).toFloat).toArray) // dup of id 5
    val emb = vecs.toDF("vec_id", "embedding")
    val out = Similarity.jlDistortion(emb, "vec_id", "embedding",
      probeIds = (0L to 6L).toSeq, outDims = 16, seed = 7, dims = 64)
    val rows = out.orderBy("id_a", "id_b").collect()
    assert(rows.length === 21)
    val dup = rows.find(r => r.getLong(0) === 5L && r.getLong(1) === 6L).get
    assert(dup.getDouble(2) === 0.0 && dup.isNullAt(4))
    val ratios = rows.filter(!_.isNullAt(4)).map(_.getDouble(4))
    assert(ratios.forall(r => r > 0.05 && r < 20.0),
      s"JL ratios wildly off: ${ratios.min} .. ${ratios.max}")
    assert(rows.forall(r => r.getDouble(2) >= 0.0))
  }

  // ---- Linkage.fsLink -----------------------------------------------------

  test("fsLink: blocked pairs, per-rule flags, integer scores, threshold") {
    val a = Seq((1L, "ALICE", 10L, "X"), (2L, "BOB", 20L, "Y"))
      .toDF("id", "name", "v", "block")
    val b = Seq((11L, "ALICE", 10L, "X"), (12L, "CARL", 99L, "X"),
      (13L, "BOB", 20L, "Z"))
      .toDF("rid", "name", "v", "block")
    val out = Linkage.fsLink(a, "id", b, "rid", Seq("block"),
      rules = Seq(
        Linkage.FieldRule("name", col("name") === col("name_b"), 4, -2),
        Linkage.FieldRule("v", col("v") === col("v_b"), 2, -1)),
      threshold = 5)
    val rows = out.orderBy("id_a", "id_b").collect()
    // block X pairs: (1,11), (1,12); Y has no b-side; Z no a-side
    assert(rows.length === 2)
    val m = rows(0)
    assert(m.getLong(0) === 1L && m.getLong(1) === 11L)
    assert(m.getBoolean(2) && m.getBoolean(3))
    assert(m.getLong(4) === 6L && m.getBoolean(5))
    val n = rows(1)
    assert(n.getLong(1) === 12L && !n.getBoolean(2) && !n.getBoolean(3))
    assert(n.getLong(4) === -3L && !n.getBoolean(5))
    intercept[IllegalArgumentException] {
      Linkage.fsLink(a, "id", b, "rid", Seq("block"), Seq.empty, 0)
    }
  }
}

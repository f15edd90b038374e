package graft

import org.apache.spark.sql.functions._

import graft.core.Stats
import graft.operators.{Dedup, Sampling}

/** Round-9 additions: substring-window dedup, temperature-scaled mixture
  * weights, two-period distribution drift. */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- windowDedup -------------------------------------------------------

  test("windowDedup flags exactly the windows whose hash repeats") {
    // doc 1 and doc 2 share the 4-token run "p q r s" at different
    // offsets; doc 3 is unique; doc 4 is too short for one window.
    val docs = Seq(
      (1L, "a b p q r s c d"),
      (2L, "p q r s x y z w"),
      (3L, "m n o t u v h i"),
      (4L, "j k")
    ).toDF("doc_id", "text")
    val out = Dedup.windowDedup(docs, "doc_id", "text", windowTokens = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // k=4 over 8 tokens -> 5 windows per full doc. The shared run is one
    // window long, at positions 2 (doc 1) and 0 (doc 2).
    assert(out(0) === ((1L, 5L, 1L, 0.2)))
    assert(out(1) === ((2L, 5L, 1L, 0.2)))
    assert(out(2) === ((3L, 5L, 0L, 0.0)))
    assert(out(3) === ((4L, 0L, 0L, 0.0)))
  }

  test("windowDedup counts within-doc repeats as duplicates") {
    // "a b a b a b": k=2 -> windows "a b","b a","a b","b a","a b";
    // every window's hash occurs >= 2 times
    val docs = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val out = Dedup.windowDedup(docs, "doc_id", "text", 2).collect()
    assert(out(0).getLong(1) === 5L)
    assert(out(0).getLong(2) === 5L)
    assert(out(0).getDouble(3) === 1.0)
    // boundary: exactly one window when size == k
    val one = Seq((1L, "x y z w")).toDF("doc_id", "text")
    assert(Dedup.windowDedup(one, "doc_id", "text", 4)
      .collect()(0).getLong(1) === 1L)
  }

  test("windowDedup content-defined sampling is alignment-proof") {
    // the same run at different offsets (and phases) in the two docs:
    // whatever subset of its windows the sampler keeps, it keeps the SAME
    // subset in both docs, so their duplicated-window counts agree
    val run = (1 to 12).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 $run"),                 // run at offset 1
      (2L, s"b1 b2 $run"),              // run at offset 2
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8")   // unique doc
    ).toDF("doc_id", "text")
    for (m <- Seq(2, 4)) {
      val out = Dedup.windowDedup(docs, "doc_id", "text", 4, m)
        .orderBy("doc_id").collect()
      // doc 1's windows inside the run == doc 2's (same text, same
      // hashes, same selection); prefix windows differ. The run is 12
      // tokens = 9 windows, so at m=2 some survive with near-certainty —
      // assert the invariant (equal counts), not a particular value.
      assert(out(0).getLong(2) === out(1).getLong(2),
        s"sampleMod=$m: dup counts must agree across alignments")
      assert(out(2).getLong(2) === 0L)
    }
    // and with sampling off, the shared windows are all caught
    val full = Dedup.windowDedup(docs, "doc_id", "text", 4)
      .orderBy("doc_id").collect()
    assert(full(0).getLong(2) === 9L)
    assert(full(1).getLong(2) === 9L)
  }

  test("windowDedup sampler keeps ~1/mod of windows and only by own hash") {
    // 200 distinct windows; selection must depend on the window hash
    // alone: kept(m=4) is a subset of kept(m=2), sizes shrink ~2x
    val text = (1 to 203).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val n = Seq(1, 2, 4).map { m =>
      Dedup.windowDedup(docs, "doc_id", "text", 4, m).collect()(0).getLong(1)
    }
    assert(n(0) === 200L)
    // loose band: binomial(200, 1/2) and (200, 1/4) stay well inside
    assert(n(1) > 60 && n(1) < 140, s"m=2 kept ${n(1)}")
    assert(n(2) > 20 && n(2) < 80, s"m=4 kept ${n(2)}")
    assert(n(2) <= n(1))
  }

  test("windowDedup matches a brute-force reference on seeded corpora") {
    for (seed <- Seq(11, 42, 77)) {
      val rnd = new scala.util.Random(seed)
      // small vocab + short docs -> plenty of genuine window collisions
      val corpus = (1L to 40L).map { id =>
        val n = 4 + rnd.nextInt(12)
        (id, (1 to n).map(_ => s"w${rnd.nextInt(9)}").mkString(" "))
      }
      val k = 3
      // reference: every doc's sliding k-windows, global multiset count
      val wins = corpus.map { case (id, text) =>
        id -> text.split(" ").sliding(k).filter(_.length == k)
          .map(_.mkString(" ")).toSeq
      }.toMap
      val global = wins.values.flatten
        .groupBy(identity).view.mapValues(_.size).toMap
      val expected = corpus.map { case (id, _) =>
        val w = wins(id)
        (id, w.size.toLong, w.count(global(_) > 1).toLong)
      }.sortBy(_._1)
      val got = Dedup.windowDedup(corpus.toDF("doc_id", "text"),
          "doc_id", "text", k)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got === expected, s"seed=$seed")
    }
  }

  test("graft_window_md5_all equals the HOF md5(array_join(slice)) " +
      "bit-for-bit") {
    // r18: windowDedup's fused native pass must reproduce the interpreted
    // HOF formulation EXACTLY — the content-defined sampler (and the
    // oracle) key on the md5 hex digits, so a single differing byte flips
    // selection verdicts. Vocab includes multi-byte UTF-8 and the empty
    // token (consecutive spaces under split), the nasty join edges.
    val rnd = new scala.util.Random(7)
    val vocab = Seq("a", "bb", "héllo", "日本語", "", "x9", "zzz")
    val docs = (1L to 30L).map { id =>
      val n = 1 + rnd.nextInt(14)
      (id, (1 to n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    for (k <- Seq(1, 3, 8)) {
      val rows = docs.select(split(col("text"), " ").as("tk"))
        .filter(size(col("tk")) >= k)
        .select(
          call_function("graft_window_md5_all", col("tk"), lit(k))
            .as("fused"),
          expr(s"transform(sequence(0, size(tk) - $k, 1), " +
            s"p -> md5(array_join(slice(tk, p + 1, $k), ' ')))").as("hof"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getSeq[String](0) === r.getSeq[String](1), s"k=$k")
      }
    }
  }

  // ---- mixtureWeights ----------------------------------------------------

  private def mixDocs = Seq(
    ("a", 100), ("a", 156), ("b", 16), ("c", 1)   // tokens: a=256, b=16, c=1
  ).map { case (s, n) => (s, (1 to n).map(_ => "t").mkString(" ")) }
    .toDF("source", "text")

  test("mixtureWeights: quarter temperatures compose exactly from sqrt") {
    def weights(tq: Int): Map[String, (Long, Double, Long)] =
      Sampling.mixtureWeights(mixDocs, "source",
          size(split(col("text"), " ")), 1000000L, tq)
        .collect()
        .map(r => r.getString(0) ->
          ((r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    // α=1: proportional to tokens
    val p = weights(4)
    assert(p("a")._1 === 256L && p("b")._1 === 16L && p("c")._1 === 1L)
    assert(p("a")._2 === 256.0 / 273.0)
    // α=0: uniform thirds
    val u = weights(0)
    assert(u("a")._2 === 1.0 / 3 && u("c")._2 === 1.0 / 3)
    // α=1/2: sqrt damping -> 16:4:1
    val h = weights(2)
    assert(h("a")._2 === 16.0 / 21 && h("b")._2 === 4.0 / 21)
    // α=3/4 matches the sqrt(sqrt(x))*sqrt(x) composition on powers of 2
    val q3 = weights(3)
    val wa = math.sqrt(math.sqrt(256.0)) * math.sqrt(256.0) // 64
    val wb = math.sqrt(math.sqrt(16.0)) * math.sqrt(16.0)   // 8
    assert(q3("a")._2 === wa / (wa + wb + 1.0))
    // budget split: floor(weight * budget), never exceeding the budget
    assert(q3("a")._3 === math.floor(wa / (wa + wb + 1.0) * 1000000.0).toLong)
    Seq(p, u, h, q3).foreach { m =>
      assert(m.values.map(_._3).sum <= 1000000L)
      assert(math.abs(m.values.map(_._2).sum - 1.0) < 1e-12)
    }
  }

  // ---- driftReport -------------------------------------------------------

  test("driftReport: hand-checked bins, shares, and TVD") {
    // time range [0, 100], midpoint 50: rows at t<50 are period a.
    // values span [0, 10]; 2 bins -> bin 0 = [0,5), bin 1 = [5,10].
    // period a: values 0, 2, 8      -> bins 0,0,1
    // period b: values 5, 10, 50->? (t=50 is period b), value 4 -> bin 0
    val df = Seq(
      (0L, 0.0), (10L, 2.0), (49L, 8.0),
      (50L, 4.0), (80L, 5.0), (100L, 10.0)
    ).toDF("t", "v")
    val out = Stats.driftReport(df, "v", "t", bins = 2).collect()
    assert(out.length === 2)
    val b0 = out(0); val b1 = out(1)
    assert((b0.getLong(0), b0.getLong(1), b0.getLong(2)) === ((0L, 2L, 1L)))
    assert((b1.getLong(0), b1.getLong(1), b1.getLong(2)) === ((1L, 1L, 2L)))
    assert(b0.getDouble(3) === 2.0 / 3) // frac_a bin 0
    assert(b0.getDouble(4) === 1.0 / 3)
    // TVD = 0.5 * (|2/3-1/3| + |1/3-2/3|) = 1/3; constant on every row
    assert(math.abs(b0.getDouble(6) - 1.0 / 3) < 1e-15)
    assert(b0.getDouble(6) === b1.getDouble(6))
  }

  test("driftReport: max value clamps into the last bin; constant column is bin 0") {
    val df = Seq((0L, 1.0), (10L, 1.0), (100L, 1.0)).toDF("t", "v")
    val out = Stats.driftReport(df, "v", "t", bins = 5).collect()
    assert(out.length === 1)
    assert(out(0).getLong(0) === 0L)
    // identical distributions -> zero drift
    assert(out(0).getDouble(6) === 0.0)
    // clamp: v == vmax lands in bins-1, not bins
    val df2 = Seq((0L, 0.0), (100L, 10.0)).toDF("t", "v")
    val bins = Stats.driftReport(df2, "v", "t", bins = 4)
      .collect().map(_.getLong(0)).toSet
    assert(bins === Set(0L, 3L))
  }

  test("driftReport: empty period reports zero shares, not NaN") {
    // tmin == tmax -> midpoint == t -> everything lands in period b
    val df = Seq((5L, 1.0), (5L, 2.0)).toDF("t", "v")
    val out = Stats.driftReport(df, "v", "t", bins = 2).collect()
    assert(out.forall(_.getDouble(3) === 0.0)) // frac_a
    assert(out.map(r => r.getLong(2)).sum === 2L)
    // the 0.5 sentinel (maximal TVD: one side holds ALL the mass) is the
    // pinned value on BOTH engines — the q131 oracle SQL guards its tvd
    // CTE with the same CASE so a degenerate range can't hash-mismatch
    assert(out.forall(r => r.getDouble(6) === 0.5))
  }

  // ---- groupedGini -------------------------------------------------------

  private def bruteGini(vs: Seq[Long]): Double = {
    val s = vs.map(BigInt(_)).sum
    if (vs.size <= 1 || s <= 0) 0.0
    else {
      val num = (for (i <- vs.indices; j <- vs.indices if i < j)
        yield (BigInt(vs(i)) - BigInt(vs(j))).abs).sum
      BigDecimal(num).toDouble / BigDecimal(BigInt(vs.size) * s).toDouble
    }
  }

  test("groupedGini matches the brute-force pairwise definition exactly") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 300).map(_ =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(40).toLong))
    val out = Stats.groupedGini(rows.toDF("grp", "v"), "grp", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val vs = grp.map(_._2)
      assert(out(g) === ((vs.size.toLong, vs.sum, bruteGini(vs))),
        s"group $g")
    }
  }

  test("groupedGini: distributed and serial cum paths agree") {
    val rnd = new scala.util.Random(7)
    val df = (0 until 500).map(_ =>
      (s"g${rnd.nextInt(2)}", rnd.nextInt(25).toLong)).toDF("grp", "v")
    val serial = Stats.groupedGini(df, "grp", "v",
      distributedCum = Some(false)).orderBy("grp").collect()
    val dist = Stats.groupedGini(df, "grp", "v",
      distributedCum = Some(true)).orderBy("grp").collect()
    assert(serial.map(_.toSeq).toSeq === dist.map(_.toSeq).toSeq)
  }

  test("groupedGini rejects non-integral value columns at plan time") {
    val df = Seq(("g", 1.5), ("g", 2.5)).toDF("grp", "v")
    val ex = intercept[IllegalArgumentException] {
      Stats.groupedGini(df, "grp", "v")
    }
    assert(ex.getMessage.contains("integer-valued"))
  }

  test("groupedGini rejects NULL values mixed into a group loudly") {
    // min() skips NULLs, so a vmin-only guard would pass while the null
    // rows count in n but drop out of the moments — silently wrong
    val df = Seq(("g", Some(5L)), ("g", None), ("g", Some(2L)))
      .toDF("grp", "v")
    val ex = intercept[Exception] {
      Stats.groupedGini(df, "grp", "v").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("non-null")))
  }

  test("groupedGini rejects negative values loudly at runtime") {
    // mixed signs break the pairwise-difference identity (Σx is no
    // longer a scale) — must fail, not report a plausible coefficient
    val df = Seq(("g", 5L), ("g", -3L), ("g", 2L)).toDF("grp", "v")
    val ex = intercept[Exception] {
      Stats.groupedGini(df, "grp", "v").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("non-negative")))
  }

  test("groupedGini: degenerate groups report 0.0, never NaN") {
    val df = Seq(("one", 9L), ("zeros", 0L), ("zeros", 0L), ("eq", 4L),
      ("eq", 4L), ("eq", 4L)).toDF("grp", "v")
    val out = Stats.groupedGini(df, "grp", "v").collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out === Map("one" -> 0.0, "zeros" -> 0.0, "eq" -> 0.0))
  }

  // ---- ksDrift -----------------------------------------------------------

  test("ksDrift matches the brute-force sup-CDF-gap definition exactly") {
    val rnd = new scala.util.Random(11)
    // group g0 drifts (late values shifted +5), g1 is stationary
    val rows = (0 until 400).map { i =>
      val t = i.toLong // midpoint: (0 + 399) div 2 = 199
      val g = s"g${i % 2}"
      val v = if (g == "g0" && t >= 199) rnd.nextInt(20) + 5.0
      else rnd.nextInt(20).toDouble
      (g, v, t)
    }
    val out = Stats.ksDrift(rows.toDF("grp", "v", "t"), "grp", "v", "t")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    def brute(grp: Seq[(String, Double, Long)]): (Long, Long, Double) = {
      val (a, b) = grp.partition(_._3 < 199)
      val d = (a.map(_._2) ++ b.map(_._2)).distinct.map { v =>
        math.abs(
          a.count(_._2 <= v).toLong * b.size - b.count(_._2 <= v).toLong * a.size)
      }.max
      (a.size.toLong, b.size.toLong, d.toDouble / (a.size.toLong * b.size))
    }
    rows.groupBy(_._1).foreach { case (g, grp) =>
      assert(out(g) === brute(grp), s"group $g")
    }
    assert(out("g0")._3 > out("g1")._3) // the planted drift is visible
  }

  test("ksDrift: distributed and serial cum paths agree") {
    val rnd = new scala.util.Random(3)
    val df = (0 until 600).map(i =>
      (s"g${i % 3}", rnd.nextInt(30).toDouble, i.toLong)).toDF("g", "v", "t")
    val serial = Stats.ksDrift(df, "g", "v", "t",
      distributedCum = Some(false)).orderBy("g").collect()
    val dist = Stats.ksDrift(df, "g", "v", "t",
      distributedCum = Some(true)).orderBy("g").collect()
    assert(serial.map(_.toSeq).toSeq === dist.map(_.toSeq).toSeq)
  }

  test("ksDrift: a group empty on one side reports the 1.0 sentinel") {
    // all of g's rows sit at/after the global midpoint -> side a empty
    val df = Seq(("g", 1.0, 100L), ("g", 2.0, 100L),
      ("h", 1.0, 0L), ("h", 3.0, 100L)).toDF("g", "v", "t")
    val out = Stats.ksDrift(df, "g", "v", "t").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    assert(out("g") === ((0L, 1.0)))
    assert(out("h")._2 === 1.0) // 1 vs 1 row, disjoint values -> D = 1
  }

  // ---- crossCorpusNearDups -----------------------------------------------

  test("crossCorpusNearDups reports only new-against-old matches") {
    val newD = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "totally different content with no match"),
      (3L, "alpha beta gamma delta epsilon zeta") // new×new dup of 1
    ).toDF("doc_id", "text")
    val oldD = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"), // matches new 1 and 3
      (2L, "some other unrelated existing body")    // id collides with new 2
    ).toDF("doc_id", "text")
    val out = Dedup.crossCorpusNearDups(newD, oldD, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // new×new and old×old pairs never appear; colliding ids are harmless
    // (each side brings its own shingle source)
    assert(out.map(p => (p._1, p._2)).toSet === Set((1L, 10L), (3L, 10L)))
    assert(out.forall(_._3 === 1.0))
  }

  // ---- embeddingDrift ----------------------------------------------------

  test("embeddingDrift matches the brute-force quantized-centroid cosine") {
    import graft.operators.Similarity
    val rnd = new scala.util.Random(5)
    // label 0: late half flipped against the shared bias (drift);
    // label 1: same distribution both halves. The bias dominates the
    // noise so the planted flip must show as centroid_cos ≈ -1.
    val bias = Array(1.0f, 0.5f, -0.25f, 0.75f)
    val rows = (0 until 80).map { i =>
      val label = i % 2
      val base = bias.map(b => b + rnd.nextGaussian().toFloat * 0.1f)
      val v = if (label == 0 && i >= 40) base.map(x => -x) else base
      (i.toLong, v.toSeq, label)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = Similarity.embeddingDrift(df, "vec_id", "embedding", "label")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    def brute(label: Int): (Long, Long, Double) = {
      val mine = rows.filter(_._3 == label)
      val (a, b) = mine.partition(_._1 < (0L + 79L) / 2L)
      def sums(side: Seq[(Long, Seq[Float], Int)]): Seq[Double] =
        (0 until 4).map(d => side.map(r =>
          BigInt(math.floor(r._2(d).toDouble * 1000000.0).toLong))
          .sum.toDouble)
      val (va, vb) = (sums(a), sums(b))
      val dot = va.zip(vb).map { case (x, y) => x * y }.foldLeft(0.0)(_ + _)
      val na2 = va.map(x => x * x).foldLeft(0.0)(_ + _)
      val nb2 = vb.map(x => x * x).foldLeft(0.0)(_ + _)
      (a.size.toLong, b.size.toLong, dot / (math.sqrt(na2) * math.sqrt(nb2)))
    }
    for (l <- Seq(0, 1)) assert(out(l) === brute(l), s"label $l")
    assert(out(0)._3 < -0.5 && out(1)._3 > 0.5) // planted flip is visible
  }

  test("embeddingDrift: a label empty on one side reports NULL, not NaN") {
    // ids 50/60 both >= midpoint (0+60)/2=30 -> label 9 has no early rows
    val df = Seq(
      (0L, Seq(1.0f, 0.0f), 1), (60L, Seq(1.0f, 0.1f), 1),
      (50L, Seq(0.5f, 0.5f), 9), (55L, Seq(0.5f, 0.4f), 9)
    ).toDF("vec_id", "embedding", "label")
    val out = graft.operators.Similarity
      .embeddingDrift(df, "vec_id", "embedding", "label")
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out(9).isNullAt(3))
    assert(!out(1).isNullAt(3))
  }

  // ---- splitLeakageAudit -------------------------------------------------

  test("splitLeakageAudit counts exactly the verified pairs that straddle") {
    val docs = Seq(
      (1L, "the quick brown fox jumps high today"),
      (2L, "the quick brown fox jumps high today"), // dup of 1
      (3L, "completely different words appear here now"),
      (4L, "completely different words appear here now"), // dup of 3
      (5L, "unrelated single document nothing shared at")
    ).toDF("doc_id", "text")
    val splits = Seq((1L, "train"), (2L, "test"), (3L, "train"),
      (4L, "train"), (5L, "val")).toDF("doc_id", "split")
    val out = Sampling.splitLeakageAudit(docs, "doc_id", "text", splits)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    // pair (1,2) straddles train/test; pair (3,4) is train-internal;
    // doc 5 pairs with nobody — one leaked split pair, two leaked docs
    assert(out.toSeq === Seq(("test", "train", 1L, 2L)))
  }

  test("clusterAwareSplit's own assignment audits leak-free") {
    // near-dup clusters (exact dups band-collide trivially) plus
    // singletons: the cluster-keyed split must produce ZERO crossing
    // verified pairs — the guarantee q121 constructs, audited by q133
    val docs = (0 until 30).map { i =>
      val cluster = i % 6
      (i.toLong, s"cluster $cluster shares this exact sentence body")
    }.toDF("doc_id", "text")
    val assign = Sampling.clusterAwareSplit(docs, "doc_id", "text")
      .select(col("doc_id"), col("split"))
    assert(Sampling.splitLeakageAudit(docs, "doc_id", "text", assign)
      .count() === 0L)
  }
}

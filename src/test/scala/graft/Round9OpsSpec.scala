package graft

import org.apache.spark.sql.functions._

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
}

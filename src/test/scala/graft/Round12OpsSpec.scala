package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Round-12 operators: collocation mining (PMI-lift) and the further
  * pipeline audits added this round.
  */
class Round12OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- pmiCollocations ----------------------------------------------------

  test("pmiCollocations: exact lift values, minCount prune, tie-safe order") {
    // tokens: x appears 4x, y 3x, z 1x (N_tok = 8)
    // bigrams: (x,y)x3, (y,x)x2, (x,z)x1 (N_bg = 6)
    val docs = Seq("x y x y x y", "x z").toDF("text")
    val rows = TextAnalysis.pmiCollocations(docs, "text",
      minCount = 2L, topK = 10).collect()
    assert(rows.length === 2, "the hapax pair (x,z) is pruned by minCount")
    // lift(x,y) = (3/6) / ((4/8)*(3/8)); lift(y,x) = (2/6) / ((3/8)*(4/8))
    val lxy = (3.0 / 6) / ((4.0 / 8) * (3.0 / 8))
    val lyx = (2.0 / 6) / ((3.0 / 8) * (4.0 / 8))
    assert(rows(0).getString(0) === "x" && rows(0).getString(1) === "y")
    assert(rows(0).getLong(2) === 3L)
    assert(rows(0).getDouble(3) === lxy, "lift is IEEE-exact, not approximate")
    assert(rows(1).getString(0) === "y" && rows(1).getString(1) === "x")
    assert(rows(1).getDouble(3) === lyx)
  }

  test("pmiCollocations: single-token docs contribute unigrams, no pairs") {
    val docs = Seq("a", "a", "a b", "a b").toDF("text")
    val rows = TextAnalysis.pmiCollocations(docs, "text",
      minCount = 2L, topK = 10).collect()
    assert(rows.length === 1)
    // c(a)=4 of N_tok=6, c(b)=2; pair (a,b)x2 of N_bg=2
    val lab = (2.0 / 2) / ((4.0 / 6) * (2.0 / 6))
    assert(rows(0).getString(0) === "a" && rows(0).getString(1) === "b")
    assert(rows(0).getLong(2) === 2L)
    assert(rows(0).getDouble(3) === lab)
  }

  // ---- naiveBayesScore ----------------------------------------------------

  test("naiveBayesScore: hand-computed log-odds on a 4-doc corpus") {
    val docs = Seq(
      (1L, "en", "good good"), (2L, "en", "good bad"),
      (3L, "de", "bad bad"), (4L, "de", "bad")
    ).toDF("doc_id", "lang", "text")
    val rows = graft.operators.Classifier
      .naiveBayesScore(docs, "doc_id", "text", col("lang") === "en")
      .orderBy("doc_id").collect()
    assert(rows.length === 4)
    // pos tokens: good,good,good,bad (n_pos=4); neg: bad,bad,bad (n_neg=3)
    // V=2; c_pos(good)=3,c_neg(good)=0; c_pos(bad)=1,c_neg(bad)=3
    val lrGood = math.log(4.0 / 6) - math.log(1.0 / 5)
    val lrBad = math.log(2.0 / 6) - math.log(4.0 / 5)
    val prior = math.log(2.0 / 2)
    def score(terms: Double*): Double = {
      val s = terms.foldLeft(0.0)(_ + _)
      BigDecimal(prior + s).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    assert(rows(0).getDouble(3) === score(lrGood, lrGood))
    assert(rows(0).getBoolean(4), "all-good doc predicts positive")
    assert(rows(1).getDouble(3) === score(lrGood, lrBad))
    assert(rows(3).getDouble(3) === score(lrBad))
    assert(!rows(3).getBoolean(4), "all-bad doc predicts negative")
    assert(rows.forall(_.getLong(2) > 0))
  }

  test("naiveBayesScore: separable corpus classifies itself correctly") {
    val docs = (1L to 40L).map { i =>
      if (i % 2 == 0) (i, "en", s"alpha beta common")
      else (i, "de", s"gamma delta common")
    }.toDF("doc_id", "lang", "text")
    val scored = graft.operators.Classifier
      .naiveBayesScore(docs, "doc_id", "text", col("lang") === "en")
    val agree = scored.filter(col("pred") === col("is_pos")).count()
    assert(agree === 40L, "fully separable vocab must classify exactly")
    val rep = graft.operators.Classifier.naiveBayesReport(scored)
      .orderBy("is_pos", "pred").collect()
    assert(rep.length === 2, "only the two diagonal confusion cells exist")
    assert(rep.forall(_.getLong(2) === 20L))
  }

  test("naiveBayesScore: single-class corpus fails loudly") {
    val docs = Seq((1L, "en", "a b"), (2L, "en", "c")).toDF(
      "doc_id", "lang", "text")
    val e = intercept[Exception] {
      graft.operators.Classifier
        .naiveBayesScore(docs, "doc_id", "text", col("lang") === "en")
        .collect()
    }
    assert(e.getMessage != null)
  }

  // ---- lengthBucketBatches ------------------------------------------------

  test("lengthBucketBatches: matches the naive per-bucket window on 500 docs") {
    val docs = (1L to 500L).map(i => (i, "w " * (i % 90).toInt + "end"))
      .toDF("doc_id", "text")
    val lenE = size(split(col("text"), " "))
    val got = graft.operators.Sampling.lengthBucketBatches(
        docs, "doc_id", lenE, bucketWidth = 8, batchSize = 4, salt = "s1")
      .orderBy("bucket", "batch").collect()
    // naive reference: one global window per bucket
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("__k"), col("doc_id"))
    val want = docs.select(col("doc_id"), lenE.cast("long").as("len"))
      .withColumn("bucket", expr("len div 8"))
      .withColumn("__k", md5(concat(lit("s1:"), col("doc_id").cast("string"))))
      .withColumn("rn", row_number().over(w))
      .withColumn("batch", expr("(rn - 1) div 4"))
      .groupBy("bucket", "batch")
      .agg(count(lit(1)).as("n_seqs"), max("len").as("max_len"),
        sum("len").as("sum_len"))
      .orderBy("bucket", "batch").collect()
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, e) =>
      assert(g.getLong(0) === e.getLong(0) && g.getLong(1) === e.getLong(1))
      assert(g.getLong(2) === e.getLong(2), s"n_seqs for bucket ${g.getLong(0)}")
      assert(g.getLong(3) === e.getLong(3) && g.getLong(4) === e.getLong(4))
      // padding identities
      assert(g.getLong(5) === g.getLong(2) * g.getLong(3) - g.getLong(4))
    }
    // every batch holds at most batchSize sequences and padding is sane
    assert(got.forall(r => r.getLong(2) <= 4 && r.getLong(5) >= 0))
    assert(got.forall(r => r.getDouble(6) >= 0.0 && r.getDouble(6) < 1.0))
  }

  test("lengthBucketBatches: salt changes the permutation, not the shape") {
    val docs = (1L to 200L).map(i => (i, ("w " * 20) + "end"))
      .toDF("doc_id", "text")
    val lenE = size(split(col("text"), " "))
    def run(salt: String) = graft.operators.Sampling.lengthBucketBatches(
      docs, "doc_id", lenE, 8, 16, salt).orderBy("bucket", "batch").collect()
    val a = run("epoch1")
    val b = run("epoch1")
    assert(a.toSeq === b.toSeq, "same salt is bit-reproducible")
    // equal-length corpus: padding is zero regardless of permutation
    assert(a.forall(_.getLong(5) === 0L))
    // 200 docs, batch 16 -> 13 batches, last holds 8
    assert(a.length === 13 && a.last.getLong(2) === 8L)
  }

  // ---- graft_boot_counts --------------------------------------------------

  test("graft_boot_counts matches the md5 hex-quad reference definition") {
    // reference: draw r reads hex quad (r%8) of md5(salt|id#(r/8)),
    // thresholds round(CDF(k)*65536)
    def ref(id: String, salt: String, reps: Int): Seq[Int] =
      (0 until reps).map { r =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$salt|$id#${r / 8}".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        val b = Integer.parseInt(hex.substring((r % 8) * 4, (r % 8) * 4 + 4), 16)
        if (b < 24109) 0 else if (b < 48219) 1 else if (b < 60273) 2
        else if (b < 64292) 3 else if (b < 65296) 4 else 5
      }
    val ids = Seq("1-1", "42-7", "xyz", "")
    val got = ids.toDF("id")
      .select(col("id"), call_function("graft_boot_counts",
        col("id"), lit("boot1"), lit(19)).as("cs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    ids.foreach { id =>
      assert(got(id) === ref(id, "boot1", 19), s"id=$id")
    }
    // distribution sanity on many ids: mean count ~ 0.9997
    val n = 20000
    val big = (1 to n).map(_.toString).toDF("id")
      .select(explode(call_function("graft_boot_counts",
        col("id"), lit("s"), lit(8))).as("c"))
      .agg(sum(col("c")), count(lit(1))).head()
    val mean = big.getLong(0).toDouble / big.getLong(1)
    assert(math.abs(mean - 1.0) < 0.02, s"mean draw $mean should be ~1")
  }

  // ---- scriptMix ----------------------------------------------------------

  test("scriptMix: exact char-class fractions on known mixed-script text") {
    val docs = Seq(
      ("en", "ab 12"),          // 2 latin, 2 digit, 1 space
      ("zh", "你好 a"), // 2 cjk, 1 latin, 1 space
      ("ru", "да")    // 2 cyrillic
    ).toDF("lang", "text")
    val rows = graft.operators.TextAnalysis.scriptMix(docs, "lang", "text")
      .orderBy("lang").collect()
    val byLang = rows.map(r => r.getString(0) -> r).toMap
    val en = byLang("en")
    assert(en.getLong(2) === 5L)
    assert(en.getDouble(3) === 2.0 / 5) // latin
    assert(en.getDouble(7) === 2.0 / 5) // digit
    assert(en.getDouble(8) === 1.0 / 5) // space
    assert(en.getDouble(9) === 0.0)     // other
    val zh = byLang("zh")
    assert(zh.getLong(2) === 4L)
    assert(zh.getDouble(5) === 2.0 / 4) // cjk
    assert(zh.getDouble(3) === 1.0 / 4) // latin
    val ru = byLang("ru")
    assert(ru.getDouble(6) === 1.0)     // cyrillic
    // fractions partition the text: sum of all classes = 1 for each group
    rows.foreach { r =>
      val total = (3 to 9).map(r.getDouble).sum
      assert(math.abs(total - 1.0) < 1e-12, s"lang ${r.getString(0)}")
    }
  }

  // ---- keywordInContext ---------------------------------------------------

  test("keywordInContext: edge clamps, every occurrence, window shape") {
    val docs = Seq(
      (1L, "hit a b c hit d e f g hit"),
      (2L, "nothing here at all")
    ).toDF("doc_id", "text")
    val rows = graft.operators.TextAnalysis
      .keywordInContext(docs, "doc_id", "text", "hit", window = 2, topK = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(rows.length === 3, "all three occurrences surface")
    assert(rows(0) === ((1L, 0, "hit a b")), "left edge clamps")
    assert(rows(1) === ((1L, 4, "b c hit d e")), "interior is symmetric")
    assert(rows(2) === ((1L, 9, "f g hit")), "right edge clamps")
  }

  // ---- tokenBudgetThreshold -----------------------------------------------

  test("tokenBudgetThreshold: greedy group-atomic cut, exact counts") {
    // scores 3,2,1 with token masses 10, 10, 10 (two docs of 5 at s=2)
    val docs = Seq((3, 10L), (2, 5L), (2, 5L), (1, 10L)).toDF("s", "tk")
    def run(b: Long) = graft.operators.Curation
      .tokenBudgetThreshold(docs, col("s"), col("tk"), b).head()
    val r20 = run(20L)
    assert(r20.getInt(0) === 2 && r20.getLong(1) === 3L &&
      r20.getLong(2) === 20L)
    val r25 = run(25L)
    assert(r25.getInt(0) === 2 && r25.getLong(2) === 20L,
      "the s=1 group overflows 25 and is excluded atomically")
    val r5 = run(5L)
    assert(r5.isNullAt(0) && r5.getLong(1) === 0L,
      "an unspendable budget reports null threshold, zero kept")
    val rAll = run(100L)
    assert(rAll.getInt(0) === 1 && rAll.getLong(2) === 30L)
  }

  // ---- survivalCurve ------------------------------------------------------

  test("survivalCurve: hand-computed KM with censoring") {
    // horizon = 5000. users: A converts at +1h, B at +2h, C never
    // (censored), D signs up late and never converts (censored early)
    val ev = Seq(
      (1L, 0L, "signup"), (1L, 3600L, "purchase"),
      (2L, 0L, "signup"), (2L, 7200L, "purchase"),
      (3L, 0L, "signup"),
      (4L, 3600L, "signup"),
      (9L, 10800L, "click") // horizon carrier, no cohort membership
    ).toDF("user_id", "ts_sec", "event_type")
    val rows = graft.operators.Events.survivalCurve(
        ev, "user_id", "ts_sec", "event_type", "signup", "purchase",
        bucketSec = 3600L)
      .orderBy("t").collect()
    // t=1: risk {A,B,C,D} minus departures before 1h: D censors at
    // (10800-3600)/3600 = 2, C at 3, so none depart before t=1 -> n=4,
    // d=1, S = 3/4. t=2: departures before 2h: A(converted at 1) -> n=3,
    // d=1, S = 3/4 * 2/3 = 1/2
    assert(rows.length === 2)
    assert(rows(0).getLong(0) === 1L && rows(0).getLong(1) === 4L)
    assert(rows(0).getDouble(3) === 0.75)
    assert(rows(1).getLong(0) === 2L && rows(1).getLong(1) === 3L)
    assert(rows(1).getDouble(3) === 0.75 * (1.0 - 1.0 / 3))
  }

  test("survivalCurve: conversionless cohort yields an empty curve, not " +
      "a crash") {
    val ev = Seq((1L, 0L, "signup"), (2L, 100L, "signup"))
      .toDF("user_id", "ts_sec", "event_type")
    val rows = graft.operators.Events.survivalCurve(
      ev, "user_id", "ts_sec", "event_type", "signup", "purchase").collect()
    assert(rows.isEmpty)
  }

  // ---- burstiness ---------------------------------------------------------

  test("burstiness: periodic -> -1, bursty > 0, gap multiset is tie-proof") {
    val ev =
      // user 1: metronome every 10s (sd 0 -> B = -1)
      (0 to 10).map(i => (1L, 1000L + 10L * i)) ++
      // user 2: burst of 1s gaps then one huge gap -> B > 0
      ((0 to 8).map(i => (2L, 2000L + i)) :+ ((2L, 20000L))) ++
      // user 3: ties at the same second plus spread
      Seq((3L, 100L), (3L, 100L), (3L, 100L), (3L, 200L), (3L, 300L),
        (3L, 400L))
    val df = ev.toDF("user_id", "ts_sec")
    val rows = graft.operators.Events
      .burstiness(df, "user_id", "ts_sec", minGaps = 5L, topK = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(4))).toMap
    assert(rows(1L)._3 === -1.0, "zero variance is exactly -1")
    assert(rows(1L)._2 === 10.0)
    assert(rows(2L)._3 > 0.4, s"burst pattern should score high: ${rows(2L)}")
    assert(rows(3L)._1 === 5L, "ties produce zero-gaps, not lost events")
  }

  // ---- rankBiasedOverlap --------------------------------------------------

  test("rankBiasedOverlap: identical rankings -> 1, disjoint -> 0, " +
      "top-heavy in between") {
    val df = (1L to 100L).map(i => (i, i.toDouble, 101.0 - i, i.toDouble))
      .toDF("id", "s1", "s2", "s3")
    def rbo(a: String, b: String): Double =
      graft.core.Stats.rankBiasedOverlap(df, "id", col(a), col(b), k = 10)
        .head().getDouble(0)
    val same = rbo("s1", "s3")
    // sum_{d=1..k} 2^-(d-1)/d * d/d ... identical lists: overlap@d = d, so
    // RBO@10 = 0.5 * sum 2^-(d-1) * 1 -> 0.5 * (2 - 2^-9) ~ 0.999
    assert(same > 0.99 && same <= 1.0, s"identical rankings gave $same")
    assert(rbo("s1", "s2") === 0.0, "reversed top-100: top-10s are disjoint")
    // swap two mid elements: rbo dips below identical but stays high
    val df2 = df.withColumn("s4",
      when(col("id") === 95L, 96.0).when(col("id") === 96L, 95.0)
        .otherwise(col("s1")))
    val swapped = graft.core.Stats
      .rankBiasedOverlap(df2, "id", col("s1"), col("s4"), k = 10)
      .head().getDouble(0)
    assert(swapped < same && swapped > 0.9)
  }

  // ---- decayedScore -------------------------------------------------------

  test("decayedScore: exact power-of-two half-life weighting, ranked") {
    val hl = 100L
    val base = 1000000L
    val ev = Seq(
      // user 1: 8.0 now, 8.0 one half-life ago -> 8 + 4 = 12
      (1L, base, 8.0), (1L, base - 100, 8.0),
      // user 2: 16.0 two half-lives ago -> 4; raw 16
      (2L, base - 200, 16.0),
      // user 3: huge but ancient (clamped at 2^-62) -> ~0
      (3L, base - 100 * 1000, 1e6)
    ).toDF("user_id", "ts_sec", "value")
    val rows = graft.operators.Events
      .decayedScore(ev, "user_id", "ts_sec", "value", hl, topK = 10)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L),
      "ranking follows the decayed score, not the raw sum")
    assert(rows(0).getDouble(1) === 12.0, "halving is exact, not approximate")
    assert(rows(1).getDouble(1) === 4.0)
    assert(rows(1).getDouble(2) === 16.0)
    assert(rows(2).getDouble(1) < 1e-9,
      "ancient events clamp to 2^-62, they never overflow the shift")
  }

  // ---- annMultiProbe ------------------------------------------------------

  test("annMultiProbe: probing raises recall over the single bucket at " +
      "1x index cost") {
    val emb = graft.core.Tables.load(spark, sfDir, "embeddings")
    val qids = Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L)
    val truth = qids.flatMap { q =>
      graft.operators.Similarity
        .cosineTopK(emb, "vec_id", "embedding", q, k = 4)
        .collect().map(r => (q, r.getLong(0)))
    }.toSet
    def recall(probes: Int): Double = {
      val got = graft.operators.Similarity
        .annMultiProbe(emb, "vec_id", "embedding", qids, k = 4,
          planes = 8, probes = probes)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & truth).size.toDouble / truth.size
    }
    val r0 = recall(0)
    val r3 = recall(3)
    assert(r3 >= r0, s"probing must not lose candidates: $r3 vs $r0")
    assert(r3 > 0.0, "some true neighbors must be found")
  }

  test("annMultiProbe: probes=0 equals the plain single-bucket LSH join") {
    val emb = graft.core.Tables.load(spark, sfDir, "embeddings")
    val qids = Seq(0L, 1L, 2L)
    val multi = graft.operators.Similarity
      .annMultiProbe(emb, "vec_id", "embedding", qids, k = 5,
        planes = 8, probes = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // reference: same-bucket candidates via lshBuckets + exact cosine
    val b = graft.operators.Similarity
      .lshBuckets(emb, "vec_id", "embedding", planes = 8)
    val qb = b.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("qid"), col("bucket"))
    val cands = b.join(qb, Seq("bucket")).filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"))
    assert(multi.map(t => (t._1, t._2)).subsetOf(
      cands.collect().map(r => (r.getLong(0), r.getLong(1))).toSet))
  }

  // ---- quantileNormalize --------------------------------------------------

  test("quantileNormalize: exact ECDF per group, ties share a position") {
    val df = Seq(("g", 10), ("g", 10), ("g", 20), ("g", 30),
      ("h", 5)).toDF("grp", "v")
    val rows = graft.core.Stats.quantileNormalize(df, "grp", "v")
      .orderBy("grp", "v").collect()
    val g = rows.filter(_.getString(0) == "g")
      .map(r => r.getInt(1) -> (r.getLong(2), r.getDouble(4))).toMap
    assert(g(10) === ((2L, 0.5)), "both tied rows count below-or-equal")
    assert(g(20) === ((3L, 0.75)))
    assert(g(30) === ((4L, 1.0)), "the max always normalizes to exactly 1")
    val h = rows.find(_.getString(0) == "h").get
    assert(h.getDouble(4) === 1.0)
    // serial and distributed paths agree
    val ser = graft.core.Stats.quantileNormalize(df, "grp", "v",
      distributedCum = Some(false)).orderBy("grp", "v").collect()
    val dist = graft.core.Stats.quantileNormalize(df, "grp", "v",
      distributedCum = Some(true)).orderBy("grp", "v").collect()
    assert(ser.toSeq === dist.toSeq)
  }

  // ---- tfidfKeywords ------------------------------------------------------

  test("tfidfKeywords: rare repeated terms outrank common ones; k caps rows") {
    val docs = Seq(
      (1L, "rare rare rare common filler"),
      (2L, "common filler other words"),
      (3L, "common filler more stuff here")
    ).toDF("doc_id", "text")
    val rows = graft.operators.TextAnalysis
      .tfidfKeywords(docs, "doc_id", "text", topK = 2)
      .orderBy("doc_id", "rank").collect()
    assert(rows.count(_.getLong(0) == 1L) === 2)
    val top1 = rows.find(_.getLong(0) == 1L).get
    assert(top1.getString(1) === "rare",
      "tf=3 on a df=1 term must outrank corpus-wide terms")
    assert(top1.getLong(2) === 3L)
    // 'common'/'filler' appear in all docs: idf = ln(4/4) = 0 -> score 0;
    // every doc's top terms are its own distinctive ones
    assert(rows.filter(_.getLong(0) == 1L).forall(r =>
      r.getString(1) != "common" || r.getDouble(3) === 0.0))
    assert(rows.forall(_.getLong(4) <= 2L))
  }

  // ---- exciseBenchmarkSpans -----------------------------------------------

  test("exciseBenchmarkSpans: exact span removal, overlaps merge, rest kept") {
    val bench = Seq((100L, "secret eval question here")).toDF("doc_id", "text")
    val corpus = Seq(
      // quotes the benchmark 4-gram: two overlapping 3-gram matches cover
      // tokens 2..6 (0-based 2..5... the 4 matched tokens + span rules)
      (1L, "intro words secret eval question here outro tail"),
      (2L, "completely unrelated content with no overlap at all"),
      (3L, "secret eval question")  // the doc IS a benchmark 3-gram
    ).toDF("doc_id", "text")
    val rows = graft.operators.Decontam
      .exciseBenchmarkSpans(corpus, bench, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
    val r1 = rows(0)
    assert(r1.getString(1) === "intro words outro tail",
      s"matched spans must excise exactly, got '${r1.getString(1)}'")
    assert(r1.getLong(2) === 8L && r1.getLong(3) === 4L && r1.getLong(4) === 2L)
    val r2 = rows(1)
    assert(r2.getLong(3) === 0L && r2.getLong(4) === 0L)
    assert(r2.getString(1) === r2.getString(1))
    val r3 = rows(2)
    assert(r3.getString(1) === "" && r3.getLong(3) === 3L,
      "a fully-quoted doc excises to empty, it does not vanish")
  }

  // ---- cmsJoinSizeEstimate ------------------------------------------------

  test("cmsJoinSizeEstimate: one-sided, exact on wide sketches, 0 on disjoint") {
    val a = (1L to 300L).map(i => i % 50).toDF("k")
    val b = (1L to 200L).map(i => i % 50).toDF("k")
    // exact join size: sum over keys of ca*cb = 50 * 6 * 4 = 1200
    val r = graft.operators.Joins.cmsJoinSizeEstimate(
      a, col("k"), b, col("k"), depth = 4, width = 512).head()
    assert(r.getLong(0) === 1200L)
    assert(r.getLong(1) >= 1200L, "CMS inner product is one-sided (>= exact)")
    // 50 keys in 512 buckets: collisions possible but bounded; the
    // estimate must stay within the epsilon*Na*Nb CMS bound
    assert(r.getLong(1) <= 1200L + (300L * 200L * 4) / 512,
      s"estimate ${r.getLong(1)} exceeds the CMS error bound")
    val disjoint = graft.operators.Joins.cmsJoinSizeEstimate(
      (1L to 50L).toDF("k"), col("k"),
      (1000L to 1050L).toDF("k"), col("k"), depth = 4, width = 2048).head()
    assert(disjoint.getLong(0) === 0L)
    assert(disjoint.isNullAt(2), "zero exact -> null ratio, never NaN")
  }

  // ---- dataCard -----------------------------------------------------------

  test("dataCard: exact volumes, majority lang, Simpson, dup fraction") {
    val docs = Seq(
      ("s1", "en", "one two three"),        // 3 tokens
      ("s1", "en", "dup dup dup dup"),      // 4 tokens, duplicated below
      ("s1", "de", "dup dup dup dup"),
      ("s2", "zh", "a b")
    ).toDF("source", "lang", "text")
    val rows = graft.operators.Curation
      .dataCard(docs, "source", "lang", "text", shortTokens = 4)
      .orderBy("source").collect()
    val s1 = rows(0)
    assert(s1.getLong(1) === 3L && s1.getLong(2) === 11L)
    assert(s1.getDouble(4) === 11.0 / 3)
    assert(s1.getDouble(6) === 1.0 / 3, "one doc under 4 tokens")
    assert(s1.getDouble(7) === 2.0 / 3, "two docs share identical bytes")
    assert(s1.getLong(8) === 2L && s1.getString(9) === "en")
    assert(s1.getDouble(10) === 2.0 / 3)
    // Simpson: 1 - (2^2 + 1^2)/3^2 = 4/9
    assert(s1.getDouble(11) === 1.0 - 5.0 / 9)
    val s2 = rows(1)
    assert(s2.getLong(1) === 1L && s2.getDouble(11) === 0.0)
  }

  // ---- normalizedDedup ----------------------------------------------------

  test("normalizedDedup: case/accent/punct/space variants collapse; " +
      "near-exact-only flag set where raw bytes differ") {
    val docs = Seq(
      (1L, "Héllo,  World!"),
      (2L, "hello world"),       // same after normalization, raw differs
      (3L, "hello world"),       // exact dup of 2
      (4L, "something else")
    ).toDF("doc_id", "text")
    val rows = graft.operators.Dedup.normalizedDedup(docs, "doc_id", "text")
      .collect()
    assert(rows.length === 1, "one dup group; the unique doc is absent")
    val r = rows(0)
    assert(r.getLong(1) === 1L, "keeper is the smallest id")
    assert(r.getLong(2) === 3L && r.getLong(3) === 2L)
    assert(r.getBoolean(4), "raw variants differ -> invisible to exact dedup")
  }

  // ---- labelCentroidCosines -----------------------------------------------

  test("labelCentroidCosines: aligned, orthogonal, and opposite classes") {
    val emb = Seq(
      (0, Array(1.0f, 0.0f)), (0, Array(2.0f, 0.0f)),   // centroid +x
      (1, Array(0.0f, 3.0f)),                            // centroid +y
      (2, Array(-1.0f, 0.0f)),                           // centroid -x
      (3, Array(4.0f, 0.0f))                             // centroid +x
    ).toDF("label", "embedding")
    val rows = graft.operators.Similarity
      .labelCentroidCosines(emb, "label", "embedding")
      .orderBy("label_a", "label_b").collect()
    assert(rows.length === 6, "4 labels -> 6 pairs")
    val byPair = rows.map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(4)).toMap
    assert(math.abs(byPair((0, 1))) < 1e-12, "x vs y is orthogonal")
    assert(math.abs(byPair((0, 2)) + 1.0) < 1e-12, "x vs -x is opposite")
    assert(math.abs(byPair((0, 3)) - 1.0) < 1e-12, "same direction -> 1")
    assert(rows.find(r => r.getInt(0) == 0).get.getLong(2) === 2L)
  }

  // ---- cdcChunkDedup ------------------------------------------------------

  test("cdcChunkDedup: boundaries survive a prefix insertion (shift-proof)") {
    val text = (1 to 60).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, text), (2L, "inserted prefix paragraph " + text))
      .toDF("doc_id", "text")
    val rows = graft.operators.Dedup
      .cdcChunkDedup(docs, "doc_id", "text", avgTokens = 8)
      .orderBy("doc_id").collect()
    // every chunk of doc 1 that starts after doc 2's first boundary is
    // byte-identical in doc 2 -> most of doc 1 must be flagged dup
    assert(rows(0).getDouble(3) > 0.5,
      s"shifted copy should share most chunks, got ${rows(0).getDouble(3)}")
    // sanity: fixed-stride chunking (q76 semantics, 3-token chunks at a
    // 3-token shift... use 8) on the same pair shares NO chunk because
    // the prefix shifts every stride window by 3 tokens
    val fixedShared = graft.operators.Dedup
      .chunkDedupGlobal(docs, "doc_id", "text", chunkTokens = 8)
      .filter(col("doc_id") === 2L).head().getLong(3) // n_dropped
    assert(fixedShared === 0L,
      "fixed-stride chunking must miss every shifted duplicate here")
  }

  test("cdcChunkDedup: chunk counts partition the tokens; unique corpus -> 0") {
    val docs = (1L to 20L).map(i =>
      (i, (1 to 30).map(j => s"u${i}_$j").mkString(" "))).toDF("doc_id", "text")
    val rows = graft.operators.Dedup
      .cdcChunkDedup(docs, "doc_id", "text", avgTokens = 8).collect()
    assert(rows.length === 20)
    assert(rows.forall(_.getLong(2) === 0L), "all-unique corpus has no dups")
    assert(rows.forall(r => r.getLong(1) >= 1L))
  }

  // ---- BPE ----------------------------------------------------------------

  test("learnMerges: hand-computed merges on the classic low/lower corpus") {
    // word freqs: low x3, lower x2, newest x4, widest x1
    val docs = Seq(
      "low low low lower lower newest newest newest newest widest"
    ).toDF("text")
    val got = graft.operators.Bpe.learnMerges(docs, "text", merges = 4)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // pair counts by hand: (w,e)=lower2+newest4=6 first; then the 5-count
    // tie (l,o) vs (s,t) breaks lexicographically; after (s,t) the merged
    // 'st' pairs with the end marker at 5
    assert(got(0) === ((1L, "w", "e", 6L)))
    assert(got(1) === ((2L, "l", "o", 5L)))
    assert(got(2) === ((3L, "s", "t", 5L)))
    assert(got(3) === ((4L, "st", "</w>", 5L)))
  }

  test("segmentStats: fertility from the learned merges, weighted by freq") {
    val docs = Seq(("all",
      "low low low lower lower newest newest newest newest widest"
    )).toDF("g", "text")
    val merges = Seq(("w", "e"), ("l", "o"), ("s", "t"), ("st", "</w>"))
    val r = graft.operators.Bpe.segmentStats(docs, "g", "text", merges)
      .head()
    // pieces incl. end marker: low->3 (lo,w,</w>), lower->4 (lo,we,r,</w>),
    // newest->4 (n,e,we,st</w>), widest->5 (w,i,d,e,st</w>)
    assert(r.getLong(1) === 10L)
    assert(r.getLong(2) === (3 * 3 + 4 * 2 + 4 * 4 + 5 * 1).toLong)
    assert(r.getDouble(3) === 3.8)
  }

  test("learnMerges stops early when the dictionary runs out of pairs") {
    val docs = Seq("a a a").toDF("text") // one word 'a': single pair (a,</w>)
    val got = graft.operators.Bpe.learnMerges(docs, "text", merges = 5)
      .collect()
    // merge 1: (a,</w>); then every word is one symbol -> no pairs left
    assert(got.length === 1)
    assert(got(0).getString(1) === "a" && got(0).getString(2) === "</w>")
  }

  // ---- epochPlan ----------------------------------------------------------

  test("epochPlan: cap binds exactly where epochs exceed it; integers exact") {
    // source a: 10 tokens, source b: 1000 tokens; budget 2000 at
    // temperature 4/4 (proportional): a gets ~2000*10/1010=19 tokens
    // -> 1.9 epochs? No: proportional weights keep epochs equal (~1.98),
    // so use temperature 0 (uniform): each source targets 1000 tokens ->
    // a needs 100 epochs (capped at 4 -> granted 40), b needs 1 epoch.
    val docs = (1 to 1).map(i => ("a", ("w " * 9) + "w")) ++
      (1 to 100).map(i => ("b", ("w " * 9) + "w"))
    val df = docs.toDF("source", "text")
    val rows = graft.operators.Sampling.epochPlan(df, "source",
        size(split(col("text"), " ")), budgetTokens = 2000L,
        temperatureQuarters = 0, maxEpochs = 4)
      .orderBy("source").collect()
    val a = rows(0); val b = rows(1)
    assert(a.getLong(2) === 10L && b.getLong(2) === 1000L)
    assert(a.getLong(4) === 1000L, "uniform weights split the budget evenly")
    assert(a.getDouble(5) === 100.0)
    assert(a.getBoolean(6), "100 epochs exceeds the 4-epoch cap")
    assert(a.getLong(7) === 40L && a.getLong(8) === 960L)
    assert(b.getDouble(5) === 1.0 && !b.getBoolean(6))
    assert(b.getLong(7) === 1000L && b.getLong(8) === 0L)
  }

  // ---- selfSimilarity -----------------------------------------------------

  test("selfSimilarity: identical docs -> 1.0, disjoint docs -> 0.0") {
    val twins = Seq((1L, "a b c d e"), (2L, "a b c d e")).toDF("doc_id", "text")
    val r1 = graft.operators.TextAnalysis
      .selfSimilarity(twins, "doc_id", "text", k = 2, n = 2).head()
    assert(r1.getLong(0) === 1L)
    assert(r1.getDouble(1) === 1.0 && r1.getDouble(2) === 1.0)
    val disjoint = Seq((1L, "a b c"), (2L, "x y z")).toDF("doc_id", "text")
    val r2 = graft.operators.TextAnalysis
      .selfSimilarity(disjoint, "doc_id", "text", k = 2, n = 2).head()
    assert(r2.getDouble(1) === 0.0 && r2.getDouble(3) === 0.0)
  }

  test("selfSimilarity: k caps the pair count; sample is deterministic") {
    val docs = (1L to 50L).map(i => (i, s"w$i x$i y$i z$i common tail"))
      .toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis
      .selfSimilarity(docs, "doc_id", "text", k = 10, n = 2)
    val row = r.head()
    assert(row.getLong(0) === 45L, "10 sampled docs -> 45 pairs")
    // shared 'common tail' bigram: strictly between 0 and 1
    assert(row.getDouble(1) > 0.0 && row.getDouble(1) < 1.0)
    assert(r.head() === row, "re-evaluation is bit-identical")
  }

  // ---- grouped bootstrap --------------------------------------------------

  test("bootstrapGroupMeans slices the global bootstrap by group") {
    val df = (1L to 4000L).map(i => (if (i % 2 == 0) "a" else "b", i, i % 97))
      .toDF("g", "id", "v")
    val rows = graft.core.Stats.bootstrapGroupMeans(df, col("g"), col("id"),
      col("v"), reps = 10, salt = "t").collect()
    assert(rows.length === 20, "2 groups x 10 reps")
    // per-group draws equal the single-group bootstrap run on that slice
    val aOnly = graft.core.Stats.bootstrapMeans(df.filter(col("g") === "a"),
      col("id"), col("v"), reps = 10, salt = "t")
      .orderBy("rep").collect().map(r => (r.getLong(1), r.getDouble(2)))
    val aGrouped = rows.filter(_.getString(0) == "a").sortBy(_.getInt(1))
      .map(r => (r.getLong(2), r.getDouble(3)))
    assert(aGrouped.toSeq === aOnly.toSeq)
  }

  test("bootstrapGroupCi: CI brackets the point estimate, bounds ordered") {
    val df = (1L to 6000L).map(i =>
      (s"g${i % 3}", i, 100 + (i * 37) % 1000)).toDF("g", "id", "v")
    val rows = graft.core.Stats.bootstrapGroupCi(df, col("g"), col("id"),
      col("v"), reps = 40, salt = "ci").orderBy("grp").collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      val (nReps, est, lo, hi) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(nReps === 40L)
      assert(lo < hi, "a real sampling distribution has width")
      assert(lo < est && est < hi,
        s"point $est should fall inside [$lo, $hi] for 2000-row groups")
    }
  }

  // ---- winnowing ----------------------------------------------------------

  test("winnowFingerprints: the k+w-1 shared-substring guarantee holds") {
    // doc 1 and 2 share the 6-token run "a b c d e f" (k=3, w=4:
    // guarantee kicks in at k+w-1 = 6); doc 3 shares nothing
    val docs = Seq(
      (1L, "a b c d e f p q r s t u"),
      (2L, "x y z a b c d e f m n"),
      (3L, "one two three four five six seven")
    ).toDF("doc_id", "text")
    val fps = graft.operators.Dedup
      .winnowFingerprints(docs, "doc_id", "text", k = 3, w = 4)
    val byDoc = fps.collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getString(1)).toSet).toMap
    assert((byDoc(1L) & byDoc(2L)).nonEmpty,
      "a shared 6-token substring must yield a common fingerprint")
    assert((byDoc(1L) & byDoc(3L)).isEmpty)
    assert((byDoc(2L) & byDoc(3L)).isEmpty)
  }

  test("winnowFingerprints: short docs — none below k, one window under w") {
    val docs = Seq(
      (1L, "a b"),          // < k tokens: absent
      (2L, "a b c"),        // exactly one gram: one fingerprint
      (3L, "a b c d")       // two grams < w windows: still one window
    ).toDF("doc_id", "text")
    val fps = graft.operators.Dedup
      .winnowFingerprints(docs, "doc_id", "text", k = 3, w = 4).collect()
    val byDoc = fps.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(!byDoc.contains(1L))
    assert(byDoc(2L) === 1)
    assert(byDoc(3L) === 1, "min over the clamped tail window")
  }

  test("graft_winnow matches the HOF reference formulation bit-for-bit") {
    // the HOF form is O(n^2) (CollapseProject inlines the hash array into
    // the window lambda) — correct on small inputs, which makes it the
    // reference the native O(n) deque implementation must match
    val docs = Seq(
      (1L, (1 to 40).map(i => s"t${i % 17}").mkString(" ")),
      (2L, "a b c"), (3L, "a b c d e"), (4L, "x")
    ).toDF("doc_id", "text")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val native = norm(graft.operators.Dedup
      .winnowFingerprints(docs, "doc_id", "text", k = 3, w = 4, salt = "win"))
    val hof = norm(docs
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"), explode(expr(
        """array_distinct(transform(
          |  sequence(1, greatest(size(tk) - 2 - 3, 1)),
          |  j -> array_min(slice(
          |    transform(sequence(1, size(tk) - 2),
          |      i -> md5(concat('win:', array_join(slice(tk, i, 3), ' ')))),
          |    j, 4))))""".stripMargin)).as("fp")))
    assert(native === hof)
  }

  test("winnowPairs: copies rank first; overlap is the containment ratio") {
    val shared = (1 to 10).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, shared + " uniq1 uniq2 uniq3"),
      (2L, shared + " other4 other5 other6"),
      (3L, "completely different words here nothing shared at all")
    ).toDF("doc_id", "text")
    val rows = graft.operators.Dedup.winnowPairs(docs, "doc_id", "text",
      k = 3, w = 4, maxDf = 20L, minShared = 1L, topK = 10).collect()
    assert(rows.nonEmpty)
    assert(rows(0).getLong(0) === 1L && rows(0).getLong(1) === 2L)
    assert(rows(0).getDouble(3) > 0 && rows(0).getDouble(3) <= 1.0)
    assert(!rows.exists(r => r.getLong(0) === 3L || r.getLong(1) === 3L))
  }

  test("pmiCollocations: topK truncates on the deterministic tie order") {
    // two pairs with IDENTICAL lift: (a,b) and (c,d) are symmetric worlds
    val docs = Seq("a b", "a b", "c d", "c d").toDF("text")
    val one = TextAnalysis.pmiCollocations(docs, "text",
      minCount = 2L, topK = 1).collect()
    assert(one.length === 1)
    // tie broken by (w1, w2) ascending: (a,b) wins
    assert(one(0).getString(0) === "a" && one(0).getString(1) === "b")
  }
}

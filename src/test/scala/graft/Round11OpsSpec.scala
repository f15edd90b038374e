package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.core.Tables
import graft.operators.{Sampling, TextAnalysis}

/** Round-11 operators: corpus-overlap report, DSIR-style domain relevance,
  * vocabulary-coverage audit, priority sampling — plus the events `ts`
  * physical-type normalization they all sit on top of.
  */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- events ts normalization -------------------------------------------

  test("Tables.events normalizes ts to epoch-nano longs on the shipped file") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType === LongType,
      "ts must be epoch nanos regardless of the file's physical type")
    // ts_sec is the exact floor of the nano value, and the range is sane
    // (the generator writes 2024 timestamps: seconds ~1.7e9, nanos ~1.7e18)
    val row = ev.select(min(col("ts")), max(col("ts")),
      sum((col("ts_sec") - expr("ts div 1000000000")).cast("long"))).head()
    assert(row.getLong(0) > 1500000000L * 1000000000L,
      s"nanos lower bound looks wrong: ${row.getLong(0)}")
    assert(row.getLong(1) < 2200000000L * 1000000000L,
      s"nanos upper bound looks wrong: ${row.getLong(1)}")
    assert(row.getLong(2) === 0L, "ts_sec must equal ts div 1e9 exactly")
  }

  // ---- corpusOverlap ------------------------------------------------------

  private val overlapDocs = Seq(
    (1L, "g1", "a b"), (2L, "g1", "b c"),
    (3L, "g2", "b c"), (4L, "g2", "c d"),
    (5L, "g3", "x y")
  ).toDF("doc_id", "grp", "text")

  test("corpusOverlap: exact vocab sizes, shared terms, jaccard, content dups") {
    val rows = TextAnalysis.corpusOverlap(overlapDocs, "grp", "text", n = 1)
      .orderBy("src_a", "src_b").collect()
    assert(rows.length === 3, "all pairs appear, including zero-overlap ones")
    val byPair = rows.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val r12 = byPair(("g1", "g2"))
    // g1 vocab {a,b,c}, g2 vocab {b,c,d}: common {b,c}, jaccard 2/4
    assert(r12.getLong(2) === 3L && r12.getLong(3) === 3L)
    assert(r12.getLong(4) === 2L)
    assert(r12.getDouble(5) === 0.5)
    // doc 2 and doc 3 are byte-identical across g1/g2
    assert(r12.getLong(6) === 1L)
    val r13 = byPair(("g1", "g3"))
    assert(r13.getLong(4) === 0L && r13.getDouble(5) === 0.0 &&
      r13.getLong(6) === 0L)
  }

  test("corpusOverlap: bigram mode separates groups a shared unigram vocab cannot") {
    val docs = Seq(
      (1L, "g1", "a b c"), (2L, "g2", "a b c"), (3L, "g3", "c b a")
    ).toDF("doc_id", "grp", "text")
    val rows = TextAnalysis.corpusOverlap(docs, "grp", "text", n = 2)
      .orderBy("src_a", "src_b").collect()
    val byPair = rows.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // g1/g2 share both bigrams {"a b","b c"}; g3's bigrams {"c b","b a"}
    // share nothing despite the identical unigram vocabulary
    assert(byPair(("g1", "g2")).getDouble(5) === 1.0)
    assert(byPair(("g1", "g3")).getDouble(5) === 0.0)
    assert(byPair(("g2", "g3")).getDouble(5) === 0.0)
  }

  test("corpusOverlapApprox tracks the exact report within HLL tolerance") {
    val docs = Tables.load(spark, sfDir, "documents")
    val key = (r: org.apache.spark.sql.Row) => (r.getString(0), r.getString(1))
    val exact = TextAnalysis.corpusOverlap(docs, "lang", "text", n = 2)
      .collect().map(r => key(r) -> r).toMap
    val approx = TextAnalysis.corpusOverlapApprox(docs, "lang", "text", n = 2)
      .collect().map(r => key(r) -> r).toMap
    assert(approx.keySet === exact.keySet, "same pair skeleton")
    for ((k, a) <- approx) {
      val e = exact(k)
      // per-sketch HLL error is ~2%; the inclusion–exclusion subtraction
      // amplifies it, so the bound here is deliberately loose (10%)
      def within(est: Double, want: Long): Unit =
        assert(math.abs(est - want) <= math.max(5.0, 0.10 * want),
          s"$k: estimate $est too far from exact $want")
      within(a.getDouble(2), e.getLong(2))
      within(a.getDouble(3), e.getLong(3))
      within(a.getDouble(4), e.getLong(4))
      // content overlap is exact in BOTH modes
      assert(a.getLong(6) === e.getLong(6))
    }
  }

  // ---- domainRelevance ----------------------------------------------------

  test("domainRelevance: exact df-rate votes, target docs excluded") {
    // target (2 docs): both contain "t"; one contains "shared"
    // raw (2 docs): A has {t, shared}, B has {shared, other}
    val docs = Seq(
      (1L, true, "t shared"), (2L, true, "t t"),
      (10L, false, "t shared"), (11L, false, "shared other")
    ).toDF("doc_id", "is_t", "text")
    val out = TextAnalysis.domainRelevance(docs, "doc_id", "text", col("is_t"))
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(10L, 11L),
      "only non-target docs are scored")
    // N_t = 2, N_r = 2. df_t: t→2, shared→1, other→0. df_r: t→1, shared→2,
    // other→1. vote(w) = df_t·N_r − df_r·N_t:
    //   t: 2·2−1·2 = 2; shared: 1·2−2·2 = −2; other: 0·2−1·2 = −2
    val scores = out.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scores(10L) === 0L, "doc 10: t(+2) + shared(−2) = 0")
    assert(scores(11L) === -4L, "doc 11: shared(−2) + other(−2) = −4")
    // the doc leaning toward the target vocabulary outranks the one that
    // does not — the importance-resampling readout
    assert(scores(10L) > scores(11L))
  }

  // ---- vocabCoverage ------------------------------------------------------

  test("vocabCoverage: top-V cut with deterministic tiebreak, exact OOV rates") {
    // counts: a×4, b×3, c×3, z×1 — V=2 keeps {a, b} (b beats c on the
    // token tiebreak at equal count)
    val docs = Seq(
      (1L, "g1", "a a b c"), (2L, "g1", "a b"),
      (3L, "g2", "a b c c z")
    ).toDF("doc_id", "grp", "text")
    val rows = TextAnalysis.vocabCoverage(docs, "grp", "text", vocabSize = 2)
      .orderBy("grp").collect()
    val g1 = rows(0); val g2 = rows(1)
    // g1: 6 tokens, OOV = {c} → 1
    assert(g1.getLong(1) === 6L && g1.getLong(2) === 1L)
    assert(g1.getDouble(3) === 1.0 / 6.0)
    // g2: 5 tokens, OOV = {c,c,z} → 3
    assert(g2.getLong(1) === 5L && g2.getLong(2) === 3L)
    assert(g2.getDouble(3) === 3.0 / 5.0)
  }

  // ---- prioritySample -----------------------------------------------------

  test("prioritySample equals an independent window-based formulation") {
    val orders = Tables.load(spark, sfDir, "orders")
    val n = 25
    val got = Sampling.prioritySample(orders, "o_orderkey",
      floor(col("o_totalprice") * lit(100)), n = n, salt = "prio1")
    // naive reference: same priority expression, one global window
    val b = conv(substring(
      md5(concat(lit("prio1"), col("o_orderkey").cast("string"))), 1, 8),
      16, 10).cast(LongType)
    val w = floor(col("o_totalprice") * lit(100)).cast(LongType)
    val q = (w * lit(4294967296L)).cast("double") /
      (b + lit(1L)).cast("double")
    val ranked = orders.select(col("o_orderkey"), w.as("w"), q.as("q"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("q").desc, col("o_orderkey").asc)))
    val tau = ranked.filter(col("rn") === n + 1).select("q").head().getDouble(0)
    val want = ranked.filter(col("rn") <= n)
      .select(col("o_orderkey"), col("w").as("weight"), col("q").as("priority"),
        greatest(col("w").cast("double"), lit(tau)).as("est_weight"))
      .orderBy(col("priority").desc, col("o_orderkey").asc)
      .collect().toSeq
    assert(got.collect().toSeq === want)
    // DLT invariant: the estimator weight never shrinks a sampled row
    assert(want.forall(r => r.getDouble(3) >= r.getLong(1).toDouble))
  }

  test("prioritySample keeps everything when the input fits the sample") {
    val tiny = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "w")
    val out = Sampling.prioritySample(tiny, "id", col("w"), n = 5,
      salt = "s").collect()
    assert(out.length === 3)
    // τ = 0 ⇒ est_weight is the raw weight: the sample is a census
    assert(out.forall(r => r.getDouble(3) === r.getLong(1).toDouble))
  }

  test("prioritySamplePerGroup equals a single-window formulation, salt-invariant") {
    val docs = Tables.load(spark, sfDir, "documents")
    val n = 3
    val got = Sampling.prioritySamplePerGroup(docs, "source", "doc_id",
      col("n_chars"), n = n, salt = "prio2")
    // independent reference: one global window per group, no pre-cap
    val b = conv(substring(
      md5(concat(lit("prio2"), col("doc_id").cast("string"))), 1, 8),
      16, 10).cast(LongType)
    val w = col("n_chars").cast(LongType)
    val q = (w * lit(4294967296L)).cast("double") / (b + lit(1L)).cast("double")
    val winG = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("q").desc, col("doc_id").asc)
    val ranked = docs.select(col("source"), col("doc_id"), w.as("w"), q.as("q"))
      .withColumn("rn", row_number().over(winG))
    val tauG = ranked.filter(col("rn") === n + 1)
      .select(col("source"), col("q").as("tau"))
    val want = ranked.filter(col("rn") <= n)
      .join(tauG, Seq("source"), "left")
      .select(col("source"), col("doc_id"), col("w").as("weight"),
        col("q").as("priority"),
        greatest(col("w").cast("double"),
          coalesce(col("tau"), lit(0.0))).as("est_weight"))
      .orderBy(col("source").asc, col("priority").desc, col("doc_id").asc)
      .collect().toSeq
    assert(got.collect().toSeq === want)
    // the two-phase pre-cap is exact: any bucketing gives the same answer
    val oneBucket = Sampling.prioritySamplePerGroup(docs, "source", "doc_id",
      col("n_chars"), n = n, salt = "prio2", buckets = 1)
    assert(oneBucket.collect().toSeq === want)
    // every source contributes exactly n (all sf0.001 sources have > n docs)
    val sizes = got.groupBy("source").count().collect()
    assert(sizes.forall(_.getLong(1) === n.toLong))
  }

  test("prioritySamplePerGroup: undersized groups are a census with tau 0") {
    val tiny = Seq(
      ("g1", 1L, 10L), ("g1", 2L, 20L),
      ("g2", 3L, 30L), ("g2", 4L, 40L), ("g2", 5L, 50L), ("g2", 6L, 60L)
    ).toDF("grp", "id", "w")
    val out = Sampling.prioritySamplePerGroup(tiny, "grp", "id", col("w"),
      n = 3, salt = "s").collect()
    val g1 = out.filter(_.getString(0) == "g1")
    assert(g1.length === 2, "a group smaller than n is kept whole")
    assert(g1.forall(r => r.getDouble(4) === r.getLong(2).toDouble),
      "census group: est_weight is the raw weight")
    assert(out.count(_.getString(0) == "g2") === 3)
  }

  // ---- compressionRatio ---------------------------------------------------

  test("graft_deflate_len: exact round-trip lengths, determinism, null") {
    // correctness of the length: inflating the deflated stream must give
    // the bytes back — checked against a driver-side Deflater/Inflater
    // round trip using the expression's own helper
    val samples = Seq("", "a", "abab" * 50, "the quick brown fox",
      (1 to 200).map(i => (i * 2654435761L % 251).toChar).mkString)
    for (s <- samples) {
      val bytes = s.getBytes("UTF-8")
      val n = graft.expressions.DeflateLen.lengthOf(bytes)
      assert(n === graft.expressions.DeflateLen.lengthOf(bytes),
        "deterministic")
      // independent round trip: re-deflate with a fresh raw Deflater at
      // the same level and inflate back
      val d = new java.util.zip.Deflater(6, true)
      d.setInput(bytes); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](256)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      assert(out.size === n, s"helper length must equal a fresh stream's")
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(out.toByteArray)
      val back = new java.io.ByteArrayOutputStream()
      while (!inf.finished()) back.write(buf, 0, inf.inflate(buf))
      inf.end()
      assert(back.toByteArray.toSeq === bytes.toSeq, "lossless stream")
    }
    val viaSql = spark.sql(
      "SELECT graft_deflate_len('abababab'), " +
        "graft_deflate_len(CAST(NULL AS STRING))").head()
    assert(viaSql.getInt(0) ===
      graft.expressions.DeflateLen.lengthOf("abababab".getBytes("UTF-8")))
    assert(viaSql.isNullAt(1))
  }

  test("compressionRatio orders repetitive < natural < noise") {
    val rnd = new scala.util.Random(11)
    val docs = Seq(
      (1L, "rep", "spam spam spam spam " * 40),
      (2L, "nat", "the quick brown fox jumps over the lazy dog and " +
        "then wanders off looking for something new to chase " * 8),
      (3L, "noise", (1 to 800).map(_ => (33 + rnd.nextInt(94)).toChar)
        .mkString),
      (4L, "empty", "")
    ).toDF("id", "kind", "text")
    val r = docs.select(col("kind"),
        graft.operators.TextAnalysis.compressionRatio(col("text")).as("r"))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("rep") < r("nat") && r("nat") < r("noise"),
      s"expected rep < nat < noise, got $r")
    assert(r("rep") < 0.1, s"heavy repetition must compress hard: ${r("rep")}")
    assert(r("noise") > 0.8, s"printable noise barely compresses: ${r("noise")}")
    assert(r("empty") === 1.0, "empty text is defined as 1.0")
  }

  // ---- bootstrapMeans -----------------------------------------------------

  test("bootstrapMeans: partitioning-invariant, unbiased, real spread") {
    val li = Tables.load(spark, sfDir, "lineitem")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.core.Stats.bootstrapMeans(df,
        concat(col("l_orderkey"), lit("-"), col("l_linenumber")),
        floor(col("l_extendedprice") * lit(100)), reps = 30, salt = "t")
        .orderBy("rep").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    val a = run(li.repartition(1))
    val b = run(li.repartition(13))
    assert(a === b, "draws are a pure function of the row, not the layout")
    assert(a.length === 30)
    val nRows = li.count()
    // E[n_drawn] = 0.9997·rows: each replicate within a few percent
    assert(a.forall(r => math.abs(r._2 - nRows) < 0.1 * nRows),
      s"replicate sizes should hover near $nRows: ${a.map(_._2).toList}")
    val trueMean = li.select(
      (sum(floor(col("l_extendedprice") * lit(100))).cast("double") /
        count(lit(1)).cast("double")).as("m")).head().getDouble(0)
    val means = a.map(_._3)
    val grand = means.sum / means.length
    // CLT sanity: sd of a replicate mean ≈ sd/sqrt(n) — percent-level here
    assert(math.abs(grand - trueMean) / trueMean < 0.01,
      s"grand mean $grand vs true $trueMean")
    assert(means.max > means.min, "replicates must actually vary")
  }

  test("bootstrapMeans: null values are excluded, not a crash") {
    // a null value (or failed long cast) used to reach graft_vecsum as a
    // null array element and abort the query — the contract is that the
    // resample covers the non-null population only
    val df = Seq(("a", Some(10L)), ("b", None), ("c", Some(30L)),
      ("d", None), ("e", Some(50L))).toDF("id", "v")
    val got = graft.core.Stats.bootstrapMeans(df, col("id"), col("v"),
      reps = 8, salt = "n").orderBy("rep").collect()
      .map(r => (r.getInt(0), r.getLong(1), Option(r.get(2)))).toSeq
    val nonNull = graft.core.Stats.bootstrapMeans(
      df.filter(col("v").isNotNull), col("id"), col("v"),
      reps = 8, salt = "n").orderBy("rep").collect()
      .map(r => (r.getInt(0), r.getLong(1), Option(r.get(2)))).toSeq
    assert(got === nonNull, "null rows must contribute to neither count nor sum")
    val ci = graft.core.Stats.bootstrapGroupCi(
      df.withColumn("g", lit("g")), col("g"), col("id"), col("v"),
      reps = 8, salt = "n").collect()
    assert(ci.length === 1)
    // point estimate divides by the non-null count (3), not the row count
    assert(ci.head.getAs[Double]("mean_est") === 30.0)
  }

  // ---- snapshotDiff -------------------------------------------------------

  test("snapshotDiff classifies added/removed/changed/unchanged exactly") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val nw = Seq((2L, "b"), (3L, "C2"), (4L, "d")).toDF("id", "text")
    val got = graft.operators.Curation.snapshotDiff(old, nw, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  // ---- groupedAuc ---------------------------------------------------------

  test("groupedAuc: perfect, inverted, and all-tied separations") {
    val df = Seq(
      // g1: every positive scores above every negative -> 1.0
      ("g1", 10, true), ("g1", 9, true), ("g1", 2, false), ("g1", 1, false),
      // g2: every positive scores below every negative -> 0.0
      ("g2", 1, true), ("g2", 2, true), ("g2", 9, false), ("g2", 10, false),
      // g3: one score for everyone -> ties only -> 0.5
      ("g3", 5, true), ("g3", 5, true), ("g3", 5, false),
      // g4: single class -> undefined
      ("g4", 3, true), ("g4", 4, true)
    ).toDF("grp", "s", "y")
    val got = graft.core.Stats.groupedAuc(df, "grp", "s", col("y"))
      .orderBy("grp").collect()
    val byG = got.map(r => r.getString(0) -> r).toMap
    assert(byG("g1").getDouble(3) === 1.0)
    assert(byG("g2").getDouble(3) === 0.0)
    assert(byG("g3").getDouble(3) === 0.5)
    assert(byG("g4").isNullAt(3), "single-class AUC is undefined")
    assert(byG("g1").getLong(1) === 2L && byG("g1").getLong(2) === 2L)
  }

  test("groupedAuc equals brute-force pair counting; serial == distributed") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map { i =>
      val g = s"g${i % 3}"
      val s = rnd.nextInt(12) // heavy ties on purpose
      val y = rnd.nextDouble() < (0.2 + 0.05 * s) // correlated label
      (g, s, y)
    }
    val df = rows.toDF("grp", "s", "y")
    def brute(g: String): Double = {
      val in = rows.filter(_._1 == g)
      val pos = in.filter(_._3).map(_._2); val neg = in.filterNot(_._3).map(_._2)
      val wins = (for (p <- pos; n <- neg)
        yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
      wins / (pos.size.toDouble * neg.size.toDouble)
    }
    for (dist <- Seq(Some(false), Some(true))) {
      val got = graft.core.Stats.groupedAuc(df, "grp", "s", col("y"), dist)
        .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
      for (g <- Seq("g0", "g1", "g2"))
        assert(math.abs(got(g) - brute(g)) < 1e-12,
          s"$g dist=$dist: ${got(g)} vs brute ${brute(g)}")
    }
  }

  test("groupedAuc fails loudly on null labels") {
    val df = Seq(("g", 1, java.lang.Boolean.TRUE),
      ("g", 2, null.asInstanceOf[java.lang.Boolean])).toDF("grp", "s", "y")
    val e = intercept[Exception] {
      graft.core.Stats.groupedAuc(df, "grp", "s", col("y")).collect()
    }
    assert(e.toString.contains("groupedAuc") ||
      (e.getCause != null && e.getCause.toString.contains("groupedAuc")),
      s"expected the named guard, got: $e")
  }

  test("prioritySample fails loudly on non-positive weights") {
    val bad = Seq((1L, 5L), (2L, 0L)).toDF("id", "w")
    val e = intercept[Exception] {
      Sampling.prioritySample(bad, "id", col("w"), n = 1, salt = "s").collect()
    }
    assert(e.getMessage != null &&
      e.toString.contains("prioritySample") ||
      e.getCause != null && e.getCause.toString.contains("prioritySample"),
      s"expected the named guard, got: $e")
  }
}

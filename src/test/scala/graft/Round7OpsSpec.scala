package graft

import org.apache.spark.sql.functions._

import graft.functions.MisraGriesAggregator
import graft.operators.{Dedup, Similarity, TextAnalysis}
import graft.sources.Bucketing

/** Round-7 additions: prefix-filtered set-similarity join, z-order layout,
  * char entropy, semantic dedup, heavy hitters (exact + Misra-Gries).
  */
class Round7OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- setSimJoin --------------------------------------------------------

  test("setSimJoin equals brute-force all-pairs Jaccard (completeness)") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "a completely different document about spark engines"),
      (4L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
      (5L, "spark engines are completely different documents"),
      (6L, "to be or not to be that is the question"),
      (7L, "to be or not to be that was the question")
    ).toDF("doc_id", "text")
    for (t <- Seq(0.3, 0.5, 0.8); n <- Seq(1, 2, 3)) {
      val fast = Dedup.setSimJoin(docs, "doc_id", "text", t, n)
        .orderBy("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // brute force over the same shingle sets
      val tk = docs.select(col("doc_id"),
        call_function("graft_shingles", split(col("text"), " "), lit(n)).as("tk"))
      val a = tk.select(col("doc_id").as("d1"), col("tk").as("t1"))
      val b = tk.select(col("doc_id").as("d2"), col("tk").as("t2"))
      val inter = size(array_intersect(col("t1"), col("t2")))
      val brute = a.join(b, col("d1") < col("d2"))
        .filter(size(col("t1")) > 0 && size(col("t2")) > 0)
        .select(col("d1"), col("d2"), (inter.cast("double") /
          (size(col("t1")) + size(col("t2")) - inter)).as("j"))
        .filter(col("j") >= t)
        .orderBy("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(fast.toSeq == brute.toSeq, s"t=$t shingle=$n")
    }
  }

  test("setSimJoin randomized differential: 12 seeded corpora × thresholds vs brute force") {
    for (seed <- 1 to 12) {
      val rnd = new scala.util.Random(seed)
      val vocab = (0 until 30).map(i => s"w$i")
      // dup-heavy corpus: half the docs are mutations of earlier ones
      val base = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
      val docs = (0 until 40).map { i =>
        val toks =
          if (i > 0 && rnd.nextBoolean() && base.nonEmpty) {
            val src = base(rnd.nextInt(base.size))
            src.map(t => if (rnd.nextDouble() < 0.15) vocab(rnd.nextInt(vocab.size)) else t)
          } else Seq.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
        base += toks
        (i.toLong, toks.mkString(" "))
      }.toDF("doc_id", "text")
      val t = Seq(0.35, 0.6, 0.85)(seed % 3)
      val n = 1 + seed % 3
      val fast = Dedup.setSimJoin(docs, "doc_id", "text", t, n)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val tk = docs.select(col("doc_id"),
        call_function("graft_shingle_hash", split(col("text"), " "), lit(n)).as("tk"))
      val inter = size(array_intersect(col("t1"), col("t2")))
      val brute = tk.select(col("doc_id").as("d1"), col("tk").as("t1"))
        .join(tk.select(col("doc_id").as("d2"), col("tk").as("t2")),
          col("d1") < col("d2"))
        .filter(size(col("t1")) > 0 && size(col("t2")) > 0)
        .select(col("d1"), col("d2"), (inter.cast("double") /
          (size(col("t1")) + size(col("t2")) - inter)).as("j"))
        .filter(col("j") >= t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(fast == brute, s"seed=$seed t=$t shingle=$n")
    }
  }

  test("setSimJoin boundary threshold: exact-integer jaccard pairs survive") {
    // J(1,2) = 2/(3+3-2) = 0.5 on unigram sets {a,b,c} vs {a,b,d}
    val docs = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val out = Dedup.setSimJoin(docs, "doc_id", "text", 0.5, 1).collect()
    assert(out.length == 1 && out(0).getDouble(2) == 0.5)
  }

  // ---- z-order -----------------------------------------------------------

  test("zorder2 interleaves bits (known values)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L), (255L, 255L))
      .toDF("x", "y")
      .select(Bucketing.zorder2(col("x"), col("y"), 8).as("z"))
    // z(5,3) = interleave(x=101, y=011) = y2x2 y1x1 y0x0 = 0 1 1 0 1 1 = 27? walk:
    // bit0(x)=1->z0, bit0(y)=1->z1, bit1(x)=0->z2, bit1(y)=1->z3, bit2(x)=1->z4, bit2(y)=0->z5
    // z = 1 + 2 + 0 + 8 + 16 + 0 = 27
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L, 27L, 65535L))
  }

  test("writeZOrdered clusters BOTH dimensions into narrow per-file tiles") {
    val dir = SparkSpec.tempDir("zorder").toString
    val n = 20000
    val df = spark.range(n).select(
      (rand(7) * 1000).cast("long").as("x"),
      (rand(11) * 1000).cast("long").as("y"))
    Bucketing.writeZOrdered(df, s"$dir/z", "x", "y", partitions = 16, bits = 8)
    val got = spark.read.parquet(s"$dir/z")
    assert(got.count() == n)
    // per-FILE extents: both dims must be much narrower than global range
    val byFile = got
      .select(input_file_name().as("f"), col("x"), col("y"))
      .groupBy("f")
      .agg((max("x") - min("x")).as("xr"), (max("y") - min("y")).as("yr"))
      .agg(avg("xr"), avg("yr")).collect()(0)
    assert(byFile.getDouble(0) < 500.0, s"x tile width ${byFile.getDouble(0)}")
    assert(byFile.getDouble(1) < 500.0, s"y tile width ${byFile.getDouble(1)}")
    // single-key sort clusters x but scatters y — z-order must beat it on y
    df.orderBy("x").write.mode("overwrite").parquet(s"$dir/xsort")
    val xsort = spark.read.parquet(s"$dir/xsort")
      .select(input_file_name().as("f"), col("y"))
      .groupBy("f").agg((max("y") - min("y")).as("yr"))
      .agg(avg("yr")).collect()(0).getDouble(0)
    assert(byFile.getDouble(1) < xsort * 0.7,
      s"z-order y width ${byFile.getDouble(1)} vs x-sort $xsort")
  }

  test("zorder2 property: matches a reference bit-interleave on 500 random pairs") {
    val rnd = new scala.util.Random(11)
    val pairs = Seq.fill(500)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    def ref(x: Long, y: Long): Long =
      (0 until 16).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val got = pairs.toDF("x", "y")
      .select(Bucketing.zorder2(col("x"), col("y"), 16).as("z"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == pairs.map { case (x, y) => ref(x, y) })
  }

  test("chunkForRag: full coverage with overlap, short docs, exact boundaries") {
    val docs = Seq(
      (1L, (1 to 20).map(i => s"t$i").mkString(" ")), // 20 toks: windows 0..2 @ step 8
      (2L, "a b c"),                                   // shorter than one window
      (3L, (1 to 10).map(i => s"s$i").mkString(" "))   // exactly size
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkForRag(docs, "doc_id", "text", size = 10, overlap = 2)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
    val d1 = out.filter(_._1 == 1L)
    assert(d1.length == 3 && d1(0)._4 == 10 && d1(1)._4 == 10 && d1(2)._4 == 4)
    assert(d1(1)._3.startsWith("t9 "), "overlap: second window starts at token 9")
    // every token appears in at least one chunk (coverage)
    val covered = d1.flatMap(_._3.split(" ")).toSet
    assert((1 to 20).map(i => s"t$i").forall(covered))
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0, "a b c", 3L)))
    assert(out.filter(_._1 == 3L).length == 1)
  }

  // ---- char entropy ------------------------------------------------------

  test("charEntropy: hand-computed values") {
    val df = Seq("aaaa", "aabb", "abcd", "a", "", "abéé")
      .toDF("text")
      .select(TextAnalysis.charEntropy(col("text")).as("e"))
    val got = df.collect().map(_.getDouble(0))
    assert(got(0) == 0.0)                       // one symbol
    assert(math.abs(got(1) - 1.0) < 1e-12)      // two symbols 50/50
    assert(math.abs(got(2) - 2.0) < 1e-12)      // four symbols uniform
    assert(got(3) == 0.0)
    assert(got(4) == 0.0)                       // empty
    assert(math.abs(got(5) - 1.5) < 1e-12)      // a,b,é,é -> 1/4,1/4,1/2
  }

  test("charEntropy null propagates") {
    val got = Seq((1L, Option.empty[String])).toDF("id", "text")
      .select(TextAnalysis.charEntropy(col("text"))).collect()(0)
    assert(got.isNullAt(0))
  }

  // ---- semantic dedup ----------------------------------------------------

  test("semanticDedup drops within-cluster near-duplicates, keeps lowest id") {
    // 2 clusters along axes; ids 0,1 are the seed centroids (nClusters=2)
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val emb = Seq(
      (0L, v(1, 0, 0, 0)),   // centroid A
      (1L, v(0, 1, 0, 0)),   // centroid B
      (2L, v(0.99, 0.14, 0, 0)), // near 0 -> dup of 0 (cos ~0.99)
      (3L, v(0, 0.99, 0.14, 0)), // near 1 -> dup of 1
      (4L, v(0.7, 0, 0.71, 0))   // cluster A but far from 0 -> kept
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(emb, "vec_id", "embedding",
      nClusters = 2, minCos = 0.95).orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 0L), (1L, 0L), (2L, 1L), (3L, 1L), (4L, 0L)))
  }

  // ---- heavy hitters -----------------------------------------------------

  test("heavyHitters equals the naive single-window top-k") {
    val docs = Tables_load("documents")
    val fast = TextAnalysis.heavyHitters(docs, "lang", "text", 5)
      .orderBy("lang", "token").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val counts = docs.select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .groupBy("lang", "token").agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("cnt").desc, col("token"))
    val naive = counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5).drop("rk")
      .orderBy("lang", "token").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(fast.toSeq == naive.toSeq)
  }

  private def Tables_load(name: String) =
    graft.core.Tables.load(spark, sfDir, name)

  // ---- Misra-Gries sketch ------------------------------------------------

  test("MisraGries guarantee: est <= true <= est + n/(capacity+1); frequent items present") {
    val rnd = new scala.util.Random(42)
    // zipf-ish stream over 200 distinct items
    val items = Seq.fill(20000)(s"w${(math.pow(rnd.nextDouble(), 3) * 200).toInt}")
    val capacity = 20
    val agg = new MisraGriesAggregator(capacity)
    // simulate distributed partial aggregation: 8 shards merged pairwise
    val shards = items.grouped(2500).map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
    val merged = shards.reduce(agg.merge)
    val result = agg.finish(merged).map(e => e.item -> e.count).toMap
    val exact = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = items.size.toLong
    val bound = n / (capacity + 1)
    assert(result.size <= capacity)
    for ((item, est) <- result) {
      val tru = exact.getOrElse(item, 0L)
      assert(est <= tru, s"$item overestimated: $est > $tru")
      assert(tru - est <= bound, s"$item error ${tru - est} > $bound")
    }
    for ((item, tru) <- exact if tru > bound)
      assert(result.contains(item), s"frequent item $item (count $tru) missing")
  }

  test("lastTouchAttribution: picks the latest touch, honors the window, ties break by max id") {
    val events = Seq(
      // user 1: clicks at 100 and 200, purchase at 250 -> attributed to 200
      (1L, 100L, 10L, "click"), (1L, 200L, 11L, "click"),
      (1L, 250L, 12L, "purchase"),
      // user 2: click at 0, purchase at 5000 with window 1000 -> unattributed
      (2L, 0L, 20L, "click"), (2L, 5000L, 21L, "purchase"),
      // user 3: two clicks at the same second -> max event_id wins
      (3L, 100L, 30L, "click"), (3L, 100L, 31L, "click"),
      (3L, 100L, 32L, "purchase"),
      // user 4: purchase with no click at all
      (4L, 50L, 40L, "purchase")
    ).toDF("user_id", "ts_sec", "event_id", "event_type")
    val out = graft.operators.Events.lastTouchAttribution(events, "user_id",
      "ts_sec", "event_id", "event_type", "purchase", "click", 1000L)
      .orderBy("conv_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq((12L, 11L, 50L), (32L, 31L, 0L)))
  }

  test("keySkew reports exact counts and shares") {
    val df = (Seq.fill(60)("hot") ++ Seq.fill(30)("warm") ++
      (0 until 10).map(i => s"cold$i")).toDF("k")
    val r = graft.core.Stats.keySkew(df, "k", k = 2).collect()(0)
    assert(r.getLong(0) == 100 && r.getLong(1) == 12)
    assert(r.getLong(2) == 60 && r.getLong(3) == 90)
    assert(r.getDouble(4) == 0.6 && r.getDouble(5) == 0.9)
  }

  test("cumulativeDistinct counts each user once, at its first bucket") {
    val events = Seq(
      (1L, 10L), (1L, 7210L), (2L, 20L), (3L, 3700L), (3L, 7300L)
    ).toDF("user_id", "ts_sec")
    val out = graft.operators.Events.cumulativeDistinct(events, "user_id",
      "ts_sec", 3600L).orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 2L, 2L), (3600L, 1L, 3L)))
  }

  test("cohortRetention: users counted in every active bucket under their first-seen cohort") {
    val events = Seq(
      (1L, 10L), (1L, 3700L), (2L, 3650L), (2L, 3660L)
    ).toDF("user_id", "ts_sec")
    val out = graft.operators.Events.cohortRetention(events, "user_id",
      "ts_sec", 3600L).orderBy("cohort", "bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 0L, 1L), (0L, 3600L, 1L), (3600L, 3600L, 1L)))
  }

  test("MisraGries as a grouped Spark aggregation matches the guarantee") {
    val docs = Tables_load("documents")
    val sk = docs
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .groupBy("lang")
      .agg(graft.functions.FreqSketch.sketch(col("token"), 30).as("top"),
        count(lit(1)).as("n"))
    val rows = sk.collect()
    assert(rows.nonEmpty)
    val exact = docs
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .groupBy("lang", "token").agg(count(lit(1)).as("cnt"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (l, rs) => l -> rs.map(r => r.getString(1) -> r.getLong(2)).toMap }
    for (r <- rows) {
      val lang = r.getString(0)
      val n = r.getLong(2)
      val bound = n / 31
      val entries = r.getSeq[org.apache.spark.sql.Row](1)
        .map(e => e.getString(0) -> e.getLong(1)).toMap
      assert(entries.size <= 30)
      for ((tok, est) <- entries) {
        val tru = exact(lang).getOrElse(tok, 0L)
        assert(est <= tru && tru - est <= bound,
          s"$lang/$tok est=$est true=$tru bound=$bound")
      }
    }
  }
}

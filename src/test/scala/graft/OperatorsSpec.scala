package graft

import org.apache.spark.sql.functions._

import graft.core.Stats
import graft.functions.LogHist
import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Text analysis, dedup, similarity, log-hist, and ICC operator semantics. */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the cat sat on the mat and the dog sat too"),
    (1L, "the cat sat on the mat and the dog sat too"), // exact dup of 0
    (2L, "the cat sat on the mat and the dog stood up"), // near dup of 0
    (3L, "el perro que corre por la calle de la ciudad"),
    (4L, "completely different words about spark engines and columns"),
    (5L, "der hund und die katze sind in das haus gegangen")
  ).toDF("doc_id", "text")

  test("token counts / fingerprint / quality signals") {
    val r = TextAnalysis.annotate(docs).orderBy("doc_id").collect()
    assert(r(0).getAs[Int]("token_count") === 11)
    assert(r(0).getAs[Int]("unique_tokens") === 8)
    // identical docs → identical fingerprint & simhash
    assert(r(0).getAs[String]("fingerprint") === r(1).getAs[String]("fingerprint"))
    assert(r(0).getAs[Long]("simhash") === r(1).getAs[Long]("simhash"))
    val q = r(0).getAs[org.apache.spark.sql.Row]("quality")
    // array_intersect dedupes: ratio counts DISTINCT stopwords ("the","and")
    assert(q.getAs[Double]("stopword_ratio") === 2.0 / 11)
    assert(q.getAs[Double]("type_token_ratio") < 1.0)
  }

  test("language-ID picks the language with most marker hits") {
    val r = docs.select(col("doc_id"), TextAnalysis.langIdGuess(col("text")).as("g"))
      .orderBy("doc_id").collect().map(_.getAs[String]("g"))
    assert(r(0) === "en" && r(3) === "es" && r(5) === "de")
  }

  test("simhash: near-dups differ in few bits, unrelated docs in more") {
    val sigs = docs.select(col("doc_id"), TextAnalysis.simhash(col("text"), 16).as("sh"))
      .orderBy("doc_id").collect().map(_.getAs[Long]("sh"))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(0), sigs(1)) === 0)
    assert(ham(sigs(0), sigs(2)) < ham(sigs(0), sigs(4)),
      s"near-dup ${ham(sigs(0), sigs(2))} vs unrelated ${ham(sigs(0), sigs(4))}")
  }

  test("exact dedup groups identical content; simhash dedup groups 0 and 1") {
    val exact = Dedup.exactDedup(docs, "doc_id", "text")
    assert(exact.filter(col("copies") === 2).count() === 1)
    assert(exact.filter(col("copies") === 2).collect()(0).getAs[Long]("keep_id") === 0)
    val sh = Dedup.simhashDedup(docs, "doc_id", "text")
    assert(sh.filter(col("copies") >= 2).count() >= 1)
  }

  test("minhash LSH finds the near-dup pair; jaccard verifies it") {
    val cands = Dedup.lshCandidates(
      Dedup.minhashBands(docs, "doc_id", "text"), "doc_id")
    val pairs = cands.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // exact dup always collides
    val verified = Dedup.jaccardVerify(docs, cands, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(verified.exists(p => p._1 == 0 && p._2 == 1 && p._3 === 1.0))
  }

  test("distinctive terms: unique terms outrank corpus-wide stopwords") {
    val r = TextAnalysis.distinctiveTerms(docs, "doc_id", "text", k = 3)
      .filter(col("doc_id") === 4).orderBy(col("score").desc, col("term")).collect()
    assert(r.length === 3)
    // doc 4's unique terms score tf/df = 1/1; its "and" is shared (df > 1)
    assert(r(0).getString(1) === "about" && r(0).getDouble(2) === 1.0)
    assert(r.forall(_.getDouble(2) === 1.0))
    assert(!r.map(_.getString(1)).contains("and"))
  }

  test("simhash banded near-dup == brute-force pairs (pigeonhole completeness)") {
    // a corpus with exact dups, near dups, and unrelated docs; the banded
    // plan (join on maxHamming+1 bands) must find EXACTLY the pairs a
    // brute-force all-pairs popcount finds
    val corpus = (docs.collect().map(r => (r.getLong(0), r.getString(1))) ++
      Seq((6L, "the cat sat on the mat and the dog sat down"),
        (7L, "el perro que corre por la calle de la plaza"),
        (8L, "spark engines and columns with completely different words about"))
      ).toSeq.toDF("doc_id", "text")
    for (maxH <- Seq(1, 3)) {
      val banded = Dedup.simhashNearDupPairs(corpus, "doc_id", "text",
          bits = 48, maxHamming = maxH)
        .orderBy("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val sigs = corpus.select(col("doc_id"),
        TextAnalysis.simhash(col("text"), 48).as("sh"))
      val brute = sigs.as("a").crossJoin(sigs.as("b"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
          bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).cast("long").as("hamming"))
        .filter(col("hamming") <= maxH)
        .orderBy("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(banded === brute, s"maxHamming=$maxH")
      if (maxH == 3) assert(brute.nonEmpty, "corpus must exercise the tolerant path")
    }
  }

  test("applyDedup keeps keepers; nearDedup removes verified near-dups") {
    val keepers = Dedup.exactDedup(docs, "doc_id", "text")
    val kept = Dedup.applyDedup(docs, keepers, "doc_id")
    // doc 1 is the exact dup of doc 0 → dropped; everything else kept
    assert(kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      docs.select("doc_id").collect().map(_.getLong(0)).filterNot(_ == 1L).sorted.toSeq)
    val near = Dedup.nearDedup(docs, "doc_id", "text", threshold = 0.5)
    val nearIds = near.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!nearIds.contains(1L), "exact dup must be removed")
    assert(nearIds.contains(0L), "the smallest id of a dup group is kept")
  }

  test("cosine topK and LSH buckets on synthetic embeddings") {
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)), (1L, Array(0.9f, 0.1f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)), (3L, Array(-1f, 0f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.cosineTopK(vecs, "vec_id", "embedding", 0L, 2).collect()
    assert(top(0).getAs[Long]("vec_id") === 1) // most similar
    assert(top(0).getAs[Double]("sim") > 0.98)
    assert(top.last.getAs[Double]("sim") >= -1.0 && top.length === 2)
    // all-pairs within a block
    val blocked = Similarity.blockedPairs(
      vecs.withColumn("b", lit(1)), "vec_id", "embedding", "b", -2.0)
    assert(blocked.count() === 6) // 4 choose 2
  }

  test("ANN multi-table LSH: recall@10 vs brute-force ground truth") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val ids = emb.select("vec_id").orderBy("vec_id").limit(8)
      .collect().map(_.getLong(0)).toSeq
    // ground truth: exact top-10 per query (one windowed cross join)
    val q = emb.filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    val gt = emb.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        Similarity.cosine(col("embedding"), col("qv")).as("sim"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // this synthetic data's top-10 neighbors are weak (~0.3 cosine), so
    // selectivity must be low: planes=4, tables=16 → analytic expected
    // recall 1-(1-p^4)^16 ≈ 0.88 over the measured angle distribution
    val ann = Similarity.annTopK(emb, "vec_id", "embedding", ids, k = 10,
        planes = 4, tables = 16, dims = 64)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ann intersect gt).size.toDouble / gt.size
    info(f"ANN recall@10 over ${ids.size} queries: $recall%.3f")
    assert(recall >= 0.7, f"recall@10 $recall%.3f below floor 0.7")
  }

  test("PQ: codes stay in range; ADC rerank recall@10 vs brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val encoded = Similarity.pqEncode(emb, "vec_id", "embedding", m = 8, k = 16)
    for (s <- 0 until 8) {
      val bad = encoded.filter(col(s"code_$s") < 0 || col(s"code_$s") >= 16).count()
      assert(bad === 0, s"subspace $s has out-of-range codes")
    }
    val ids = (100L to 107L)
    val q = emb.filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    val gt = emb.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        Similarity.cosine(col("embedding"), col("qv")).as("sim"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqTopK(emb, "vec_id", "embedding", ids, kNN = 10,
        m = 8, k = 16, rerank = 100)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (pq intersect gt).size.toDouble / gt.size
    info(f"PQ+ADC recall@10 (rerank=100) over ${ids.size} queries: $recall%.3f")
    // 16 seeded centroids over weak-neighbor synthetic data: the ADC
    // ordering is coarse, the exact rerank recovers what it surfaces
    assert(recall >= 0.4, f"recall@10 $recall%.3f below floor 0.4")
    // rerank = corpus size -> exact: recall must be 1.0 (candidates = all)
    val full = Similarity.pqTopK(emb, "vec_id", "embedding", ids, kNN = 10,
        m = 8, k = 16, rerank = emb.count().toInt)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == gt, "full-rerank PQ must equal brute force exactly")
  }

  test("IVF: assignment is the true argmax; probe-limited topK has recall") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    // assignment correctness: spot-check 25 vectors against a brute-force
    // argmax over all centroid dots (same tiebreak: max sim, then min cid)
    val cents = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val brute = emb.limit(25).crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        Similarity.dot(col("embedding"), col("cv")).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("sim").desc, col("cid"))
    val bruteAssign = brute.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1).select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivf = Similarity.ivfAssign(emb, "vec_id", "embedding", nClusters = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    bruteAssign.foreach { case (id, cid) =>
      assert(ivf(id) === cid, s"vec $id assigned ${ivf(id)}, brute-force says $cid")
    }
    // recall: probing 4/16 clusters must beat the 25% a random probe gives
    val ids = (100L to 107L)
    val q = emb.filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    val gt = emb.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        Similarity.cosine(col("embedding"), col("qv")).as("sim"))
      .withColumn("rk", row_number().over(wq)).filter(col("rk") <= 10)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(nProbe: Int): Double = {
      val got = Similarity.ivfTopK(emb, "vec_id", "embedding", ids, k = 10,
          nClusters = 16, nProbe = nProbe)
        .select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (got intersect gt).size.toDouble / gt.size
    }
    val r4 = recallAt(4); val r8 = recallAt(8); val r16 = recallAt(16)
    info(f"IVF recall@10 over ${ids.size} queries: nProbe=4 $r4%.3f, 8 $r8%.3f, 16 $r16%.3f")
    assert(r4 >= 0.4, f"recall@10 $r4%.3f below floor 0.4")
    // the IVF knob: recall must rise with nProbe, reaching exact at full probe
    assert(r8 >= r4 && r16 >= r8, "recall must be monotone in nProbe")
    assert(r16 === 1.0, "probing every cluster IS the exact scan")

    // TRAINED codebook: a Lloyd iteration moves the centroids but cannot
    // break exactness at full probe (partitioning changes, the union of
    // partitions does not); trained recall at the working point is logged
    // beside seeded recall — the harness that justifies paying for training
    val trained4 = {
      val got = Similarity.ivfTopK(emb, "vec_id", "embedding", ids, k = 10,
          nClusters = 16, nProbe = 4, trainIters = 1)
        .select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (got intersect gt).size.toDouble / gt.size
    }
    val trainedFull = Similarity.ivfTopK(emb, "vec_id", "embedding", ids,
        k = 10, nClusters = 16, nProbe = 16, trainIters = 1)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    info(f"trained-IVF recall@10: nProbe=4 $trained4%.3f (seeded $r4%.3f)")
    assert(trainedFull === gt, "trained codebook at full probe must stay exact")

    // SPARSE seed ids (vec_ids 3 and 7 removed): centroid positions no
    // longer equal centroid ids, so a positional probe index would
    // mis-join clusters — full probe must still equal the exact scan
    val sparse = emb.filter(!col("vec_id").isin(3L, 7L))
    val q2 = sparse.filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val gt2 = sparse.crossJoin(broadcast(q2)).filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        Similarity.cosine(col("embedding"), col("qv")).as("sim"))
      .withColumn("rk", row_number().over(wq)).filter(col("rk") <= 10)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotSparse = Similarity.ivfTopK(sparse, "vec_id", "embedding", ids,
        k = 10, nClusters = 16, nProbe = 14) // 14 centroids remain → full probe
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotSparse === gt2, "sparse centroid ids: full probe must equal exact scan")
  }

  test("l2 normalize and int8 quantize round-trip on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").limit(100)
    // normalized vectors have unit norm
    val norms = emb.select(Similarity.l2Normalize(col("embedding")).as("nv"))
      .select(sqrt(aggregate(transform(col("nv"), x => x * x),
        lit(0.0), (a, v) => a + v)).as("n")).collect().map(_.getDouble(0))
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-12))
    // quantize→dequantize preserves direction (cosine vs original > 0.999)
    val qz = emb.select(col("vec_id"), col("embedding"),
        Similarity.quantizeInt8(col("embedding")).as("qz"))
      .select(col("vec_id"),
        (Similarity.dot(col("embedding"),
          Similarity.dequantize(col("qz")).cast("array<float>")) /
          (sqrt(Similarity.dot(col("embedding"), col("embedding"))) *
           sqrt(aggregate(transform(Similarity.dequantize(col("qz")), x => x * x),
             lit(0.0), (a, v) => a + v)))).as("cos"))
      .collect().map(_.getDouble(1))
    assert(qz.forall(_ > 0.999), s"min cosine after int8 round-trip: ${qz.min}")
  }

  test("lshBuckets fails fast on mismatched embedding dimensionality") {
    val vecs = Seq((0L, Array(1f, 0f, 0f))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Similarity.lshBuckets(vecs, "vec_id", "embedding", dims = 64).collect()
    }
    assert(ex.getMessage != null)
  }

  test("log-hist: percentiles within one log-bucket; merge matches flat") {
    val rnd = new scala.util.Random(5)
    // heavy-tailed values — the case log buckets exist for
    val values = Seq.fill(4000)(math.exp(rnd.nextDouble() * 10).toLong)
    val mx = values.max
    val df = values.toDF("v")
    val r = df.agg(LogHist.logHist(col("v"), lit(1L), 0L, mx).as("h"))
      .select("h.*").collect()(0)
    assert(r.getAs[Long]("count") === 4000)
    val sorted = values.sorted
    val pcts = r.getAs[collection.Seq[Long]]("percentiles")
    for (p <- Seq(25, 50, 90)) {
      val exact = sorted((p / 100.0 * (sorted.size - 1)).toInt).toDouble
      val got = pcts(p).toDouble
      // log buckets: relative error bounded by one tick (2^(1/16) ≈ 4.4%)
      assert(got <= exact * 1.05 + 1 && got >= exact / 1.1 - 1,
        s"p$p got=$got exact=$exact")
    }
  }

  test("ICC: separated groups → high, identical groups → ~0") {
    val rnd = new scala.util.Random(9)
    val separated = (0 until 3000).map { i =>
      val g = i % 3
      (s"g$g", g * 100.0 + rnd.nextDouble())
    }.toDF("g", "v")
    val iccHigh = Stats.icc(separated, "g", "v").collect()(0).getAs[Double]("icc")
    assert(iccHigh > 0.99, s"separated icc=$iccHigh")
    // identical VALUE MULTISETS per group → between-group variance exactly 0
    // (with random draws MSB estimates sigma^2 and icc → ~0.5 by definition)
    val identical = (0 until 3000).map(i => (s"g${i % 3}", (i / 3 % 100).toDouble))
      .toDF("g", "v")
    val iccLow = Stats.icc(identical, "g", "v").collect()(0).getAs[Double]("icc")
    assert(iccLow < 0.01, s"identical icc=$iccLow")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.{Decontam, Events, Sampling, TextAnalysis}

/** Round-5 pipeline operators: sessionization, funnels, deterministic
  * sampling, decontamination, repetition signals, boilerplate. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("sessionize splits on gaps > gapSecs, per user") {
    val ev = Seq(
      (1L, 0L, 1L), (2L, 100L, 1L), (3L, 3000L, 1L), (4L, 3100L, 1L),
      (5L, 10000L, 1L),
      (6L, 50L, 2L))
      .toDF("event_id", "ts_sec", "user_id")
    val out = Events.sessionize(ev, "user_id", "ts_sec", "event_id", 1800L)
      .orderBy("user_id", "session_idx")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out === Array(
      (1L, 1L, 0L, 100L, 2L, 100L),
      (1L, 2L, 3000L, 3100L, 2L, 100L),
      (1L, 3L, 10000L, 10000L, 1L, 0L),
      (2L, 1L, 50L, 50L, 1L, 0L)))
  }

  test("sessionize ties on ts break deterministically by order column") {
    val ev = Seq((2L, 10L, 1L), (1L, 10L, 1L), (3L, 5000L, 1L))
      .toDF("event_id", "ts_sec", "user_id")
    val out = Events.sessionize(ev, "user_id", "ts_sec", "event_id", 1800L)
      .orderBy("session_idx").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("n_events") === 2L)
  }

  test("funnel requires strict order and honors the step window") {
    // u1 completes; u2's click precedes its first view (not counted);
    // u3's purchase falls outside the 100-unit step window
    val ev = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "click", 5L), (2L, "view", 10L),
      (3L, "view", 10L), (3L, "click", 50L), (3L, "purchase", 500L))
      .toDF("user_id", "event_type", "ts")
    val out = Events.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), stepWindow = Some(100L))
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out === Array((1L, "view", 3L), (2L, "click", 2L),
      (3L, "purchase", 1L)))
    // no window: u3's late purchase now counts
    val open = Events.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("step").collect().map(_.getLong(2))
    assert(open === Array(3L, 2L, 2L))
  }

  test("funnel strictness: step event at exactly the frontier time is excluded") {
    val ev = Seq((1L, "view", 10L), (1L, "click", 10L))
      .toDF("user_id", "event_type", "ts")
    val out = Events.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click")).orderBy("step").collect().map(_.getLong(2))
    assert(out === Array(1L, 0L))
  }

  test("stratifiedHashSample is deterministic, stratified, and re-weighted") {
    val docs = spark.range(0, 2000).select(col("id").as("doc_id"),
      when(col("id") % 3 === 0, "en").otherwise("de").as("lang"))
    def run() = Sampling.stratifiedHashSample(docs, "doc_id", "lang",
      Map("en" -> 2500), defaultBp = 7500, salt = "s")
    val a = run().collect().map(r => (r.getLong(0), r.getDouble(2))).sorted
    val b = run().repartition(13).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).sorted
    assert(a === b, "hash sampling must not depend on partitioning/run")
    val byLang = run().groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // ~25% of 667 en docs, ~75% of 1333 de docs; the md5 bucket is uniform
    assert(byLang("en") > 100 && byLang("en") < 230, s"en=${byLang("en")}")
    assert(byLang("de") > 900 && byLang("de") < 1100, s"de=${byLang("de")}")
    val weights = run().select("lang", "sample_weight").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(weights === Map("en" -> 4.0, "de" -> (10000.0 / 7500.0)))
  }

  test("stratifiedHashSample with threshold 10000 keeps everything") {
    val docs = spark.range(0, 50).select(col("id").as("doc_id"),
      lit("x").as("lang"))
    assert(Sampling.stratifiedHashSample(docs, "doc_id", "lang",
      Map.empty, defaultBp = 10000, salt = "s").count() === 50)
  }

  test("overlapWithBenchmark counts shared n-grams, excludes bench docs") {
    val docs = Seq(
      (0L, "a b c d e"),          // benchmark
      (1L, "x a b c y"),          // shares 3-gram "a b c"
      (2L, "a b c d q"),          // shares "a b c" and "b c d"
      (3L, "p q r s t"))          // no overlap
      .toDF("doc_id", "text")
    val bench = docs.filter($"doc_id" === 0)
    val out = Decontam.overlapWithBenchmark(docs, bench, "doc_id", "text", 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out === Array((1L, 1L), (2L, 2L)))
  }

  test("repetitionSignals: dup-word and top-bigram fractions") {
    val docs = Seq(
      (1L, "a a b"),   // 3 words, 2 distinct → dup 1/3; bigrams aa, ab → 1/2
      (2L, "x y z"),   // no repeats → dup 0; all bigrams unique → 1/2
      (3L, "w w w w")) // dup 3/4; bigram "w w" ×3 of 3 → 1.0
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out === Array(
      (1L, 3L, 1.0 / 3, 0.5),
      (2L, 3L, 0.0, 0.5),
      (3L, 4L, 0.75, 1.0)))
  }

  test("repetitionSignals: single-word doc has zero bigram fraction") {
    val out = TextAnalysis.repetitionSignals(
        Seq((1L, "solo")).toDF("doc_id", "text"), "doc_id", "text")
      .collect()(0)
    assert(out.getLong(1) === 1L && out.getDouble(3) === 0.0)
  }

  test("boilerplateNgrams counts distinct-doc frequency with threshold") {
    val docs = Seq(
      (1L, "x y z a b"), (2L, "q x y z r"), (3L, "x y z x y z"),
      (4L, "m n o p q"))
      .toDF("doc_id", "text")
    val out = Decontam.boilerplateNgrams(docs, "text", 3, minDocs = 3L)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // "x y z" appears in docs 1,2,3 (doc 3 twice — counted once)
    assert(out === Array(("x y z", 3L)))
  }

  test("graft_shingle_hash honors the n parameter") {
    val n2 = spark.sql(
      "SELECT size(graft_shingle_hash(array('a','b','c','d'), 2)) AS n")
      .collect()(0).getInt(0)
    val n3 = spark.sql(
      "SELECT size(graft_shingle_hash(array('a','b','c','d'))) AS n")
      .collect()(0).getInt(0)
    assert(n2 === 3 && n3 === 2)
    // width > length → empty, not error
    val empty = spark.sql(
      "SELECT size(graft_shingle_hash(array('a','b'), 5)) AS n")
      .collect()(0).getInt(0)
    assert(empty === 0)
  }

  test("connectedComponents finds exact transitive closure incl. chains") {
    import graft.operators.Dedup
    // two components: a 4-node chain 1-2-3-4 (diameter 3 — beats the
    // single-pass approximation) and a pair 10-11; 20-20 self-loop no-op
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L), (20L, 20L))
      .toDF("d1", "d2")
    val out = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(out === Array((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 10L), (11L, 10L), (20L, 20L)))
  }

  test("clusterDedup keeps exactly one doc per verified duplicate cluster") {
    import graft.operators.Dedup
    // docs 1,2,3 share a long identical prefix (only the final word
    // differs), so every minhash minimum comes from the shared shingles
    // and all three land in the same LSH buckets; 4 is unique
    val prefix = (1 to 30).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"$prefix dog"), (2L, s"$prefix cat"), (3L, s"$prefix cow"),
      (4L, "completely different words here nothing shared at all"))
      .toDF("doc_id", "text")
    val kept = Dedup.clusterDedup(docs, "doc_id", "text", threshold = 0.3)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    // whatever clusters LSH+verify finds, doc 4 must survive and the
    // 1-2-3 cluster must collapse to its minimum member only
    assert(kept.contains(4L))
    assert(kept.contains(1L))
    assert(!kept.contains(2L) && !kept.contains(3L))
  }

  test("Pii.scan counts and Pii.redact replaces all three categories") {
    import graft.operators.Pii
    val docs = Seq(
      (1L, "mail a@b.com and c.d+x@e.org call 25-989-741-2988 ip 10.0.0.1"),
      (2L, "no pii here at all"),
      (3L, "edge 999.999.999.999 still redacts; 1-23-456-7890 does not"))
      .toDF("id", "txt")
    val s = Pii.scan(docs, "id", "txt").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(s === Array((1L, 2L, 1L, 1L, 4L), (2L, 0L, 0L, 0L, 0L),
      (3L, 0L, 0L, 1L, 1L)))
    val r = Pii.redact(docs, "id", "txt").orderBy("id").collect()
      .map(_.getString(1))
    assert(r(0) === "mail <EMAIL> and <EMAIL> call <PHONE> ip <IP>")
    assert(r(1) === "no pii here at all")
    assert(r(2) === "edge <IP> still redacts; 1-23-456-7890 does not")
  }

  test("packSequences: straddling docs keep the bin of their first token") {
    import graft.operators.Sampling
    // one pack partition; budget 10; docs of 4,4,5 tokens:
    // starts 0,4,8 → bins 0,0,0 with offsets 0,4,8 (doc 3 straddles)
    val docs = Seq((0L, 4L), (8L, 4L), (16L, 5L), (24L, 3L))
      .toDF("doc_id", "nt")
    val out = Sampling.packSequences(docs, "doc_id", col("nt"),
        budget = 10L, parts = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(out === Array((0L, 0L, 0L), (8L, 0L, 4L), (16L, 0L, 8L),
      (24L, 1L, 3L)))
  }

  test("packSequences shards by pack_part with independent streams") {
    import graft.operators.Sampling
    val docs = Seq((0L, 7L), (1L, 7L), (2L, 7L), (3L, 7L))
      .toDF("doc_id", "nt")
    val out = Sampling.packSequences(docs, "doc_id", col("nt"),
        budget = 10L, parts = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    // parts: {0,2} and {1,3}; each stream starts at 0 independently
    assert(out === Array((0L, 0L, 0L, 0L), (1L, 1L, 0L, 0L),
      (2L, 0L, 0L, 7L), (3L, 1L, 0L, 7L)))
  }

  test("transitions counts consecutive type pairs per user with gap stats") {
    import graft.operators.Events
    val ev = Seq(
      (1L, 0L, 1L, "view"), (2L, 10L, 1L, "click"), (3L, 15L, 1L, "view"),
      (4L, 40L, 1L, "click"),
      (5L, 0L, 2L, "view"), (6L, 3L, 2L, "click"))
      .toDF("event_id", "ts_sec", "user_id", "event_type")
    val out = Events.transitions(ev, "user_id", "ts_sec", "event_id", "event_type")
      .orderBy("prev_type", "next_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out === Array(
      ("click", "view", 1L, 5L, 5L),          // u1: click@10 -> view@15
      ("view", "click", 3L, 3L, 25L)))        // u1: 0->10, 15->40; u2: 0->3
  }

  test("quotaCap keeps at most k rows per key with deterministic order") {
    val docs = Seq(
      (1L, "a", 100L), (2L, "a", 300L), (3L, "a", 200L), (4L, "a", 300L),
      (5L, "b", 50L))
      .toDF("doc_id", "source", "n_chars")
    val kept = Sampling.quotaCap(docs, "source",
        Seq(col("n_chars").desc, col("doc_id").asc), k = 2)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    // source a: 300(id2), 300(id4 loses tie to id2? no — both kept: k=2
    // ranks are id2 then id4), so ids 2,4 survive; source b: id 5
    assert(kept === Array(2L, 4L, 5L))
  }

  test("weightedHashSample: integer membership, HT weights, w=max keeps all") {
    val docs = Seq((1L, 1000L), (2L, 500L), (3L, 1L), (4L, 1000L))
      .toDF("doc_id", "w")
    val out = Sampling.weightedHashSample(docs, "doc_id", col("w"),
        maxWeight = 1000L, salt = "t")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    // weight = maxWeight → bucket*1000 < 10000*1000 always → kept, HT = 1.0
    assert(out.contains(1L) && out(1L) === 1.0)
    assert(out.contains(4L) && out(4L) === 1.0)
    // kept rows carry maxW/w exactly
    out.get(2L).foreach(sw => assert(sw === 2.0))
    // zero-probability tail: w=1 → P=1e-4; almost surely dropped for this
    // salt (and if kept, weight must be 1000.0)
    out.get(3L).foreach(sw => assert(sw === 1000.0))
  }

  test("quotaCapTwoPhase equals quotaCap on skewed keys, any salt width") {
    // hot key with 500 rows, cold key with 3 — the shape that serializes
    // a single-window cap into one task
    val rows = (1L to 500L).map(i => (i, "hot", (i * 7919) % 1000)) ++
      Seq((501L, "cold", 5L), (502L, "cold", 9L), (503L, "cold", 1L))
    val docs = rows.toDF("doc_id", "source", "score")
    val order = Seq(col("score").desc, col("doc_id").asc)
    val exact = Sampling.quotaCap(docs, "source", order, k = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    for (buckets <- Seq(1, 4, 32)) {
      val twoPhase = Sampling.quotaCapTwoPhase(docs, "source", order,
          k = 10, saltCol = col("doc_id"), buckets = buckets)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
      assert(twoPhase === exact, s"buckets=$buckets must be salt-invariant")
    }
  }

  test("editDistanceVerify computes exact levenshtein on candidates only") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick brown fax"), // 1 substitution
      (3L, "unrelated"))
      .toDF("doc_id", "text")
    val cands = Seq((1L, 2L), (1L, 3L)).toDF("d1", "d2")
    val out = Dedup.editDistanceVerify(docs, cands, "doc_id", "text",
        maxDist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out === Array((1L, 2L, 1L))) // (1,3) filtered: dist > 5
  }

  test("normalizeText lowers, strips punctuation, collapses whitespace") {
    val docs = Seq(
      (1L, "  Hello,   WORLD!! (x=1)  "),
      (2L, "already clean"),
      (3L, "###"))
      .toDF("id", "t")
    val out = docs.select(TextAnalysis.normalizeText(col("t")))
      .collect().map(_.getString(0))
    assert(out === Array("hello world x 1", "already clean", ""))
  }

  test("kmeansFit: decimal-exact means and stable assignment") {
    import graft.operators.Similarity
    // two tight groups along dims 0/1, padded to 4 dims; seed centroids
    // are ids 0 (group A) and 1 (group B)
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (3L, Array(0.95f, 0.05f, 0.0f, 0.0f)),
      (4L, Array(0.1f, 0.9f, 0.0f, 0.0f)),
      (5L, Array(0.05f, 0.95f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.kmeansFit(emb, "vec_id", "embedding",
      nClusters = 2, iters = 2)
    assert(cents.map(_._1) === Seq(0L, 1L))
    // cluster 0 holds ids {0,2,3}: mean dim0 = (1.0+0.9f+0.95f)/3 up to
    // the DECIMAL(38,9) rounding of each addend
    val c0 = cents(0)._2
    assert(math.abs(c0(0) - (1.0 + 0.9f.toDouble + 0.95f.toDouble) / 3) < 1e-8)
    val assigned = Similarity.kmeansAssign(emb, "vec_id", "embedding",
        nClusters = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(assigned === Array((0L, 0L), (1L, 1L), (2L, 0L), (3L, 0L),
      (4L, 1L), (5L, 1L)))
  }

  test("Curation.report: dup rank on normalized content, verdict composes") {
    import graft.operators.Curation
    val docs = Seq(
      (1L, "The quick, brown fox! jumps high today"),   // canonical
      (2L, "the QUICK brown fox jumps high today"),      // dup of 1 after norm
      (3L, "short"),                                     // too few tokens
      (4L, "contact me at a@b.com please do it now"),    // PII
      (5L, "good good good good good good good good"))   // low diversity
      .toDF("doc_id", "text")
    val out = Curation.report(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getBoolean(5)))
    assert(out === Array((1L, 1L, true), (2L, 2L, false), (3L, 1L, false),
      (4L, 1L, false), (5L, 1L, false)))
  }

  test("kmeansFit: an emptied cluster keeps its previous centroid") {
    import graft.operators.Similarity
    // every vector (including seed 1 itself) is nearer seed 0, so cluster
    // 1 receives no members — its centroid must survive unchanged
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.5f, 0.0f)),
      (2L, Array(0.9f, 0.0f)),
      (3L, Array(0.8f, 0.0f)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.kmeansFit(emb, "vec_id", "embedding",
      nClusters = 2, iters = 2)
    assert(cents(1)._1 === 1L)
    assert(cents(1)._2 === Seq(0.5f.toDouble, 0.0))
  }

  test("removeCommonUnits drops frequent units, reassembles in order") {
    import graft.operators.Decontam
    val docs = Seq(
      (1L, "COMMON alpha COMMON beta"),
      (2L, "gamma COMMON delta"),
      (3L, "COMMON epsilon"),
      (4L, "COMMON"))
      .toDF("doc_id", "text")
    // COMMON in 4/4 docs >= 60%; everything else in 1/4
    val out = Decontam.removeCommonUnits(docs, "doc_id", "text", " ", 0.6)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out === Array(
      (1L, "alpha beta", 2L, 2L),
      (2L, "gamma delta", 2L, 1L),
      (3L, "epsilon", 1L, 1L),
      (4L, "", 0L, 1L)))
  }
}

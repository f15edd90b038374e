package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Decontam, Dedup, Events, LanguageModel}

/** Round-6 operators: bigram LM scoring, global chunk dedup, bucketed
  * interval join, Bloom-prefiltered decontam, exact score bands. */
class Round6OpsSpec extends SparkSpec {
  import spark.implicits._

  test("bigramScore: MLE transition probabilities, in-order mean") {
    // corpus: "a b a b" and "a b c"
    //   bigrams: (a,b)x2+(a,b)=3? doc1: (a,b),(b,a),(a,b); doc2: (a,b),(b,c)
    //   c(a,.)=4 -> wait: w1 counts: a:3, b:3 over both docs
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = LanguageModel.bigramScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // c2: (a,b)=3, (b,a)=1, (b,c)=1 ; c1: a=3, b=2... recompute:
    //   doc1 bigrams: (a,b),(b,a),(a,b); doc2: (a,b),(b,c)
    //   c1: a -> 3 (two in doc1 + one in doc2), b -> 2
    //   p(a,b)=3/3=1.0, p(b,a)=1/2=0.5, p(b,c)=1/2=0.5
    val d1 = out(0)
    assert(d1.getLong(1) === 3L) // n_bigrams
    assert(d1.getDouble(2) === (1.0 + 0.5 + 1.0) / 3) // avg_p in order
    assert(d1.getDouble(3) === 0.5) // min_p
    val d2 = out(1)
    assert(d2.getLong(1) === 2L)
    assert(d2.getDouble(2) === (1.0 + 0.5) / 2)
  }

  test("bigramScore: single-token docs produce no row") {
    val docs = Seq((1L, "only"), (2L, "a a")).toDF("doc_id", "text")
    val out = LanguageModel.bigramScore(docs, "doc_id", "text").collect()
    assert(out.map(_.getLong(0)).toSet === Set(2L))
  }

  test("chunkDedupGlobal keeps the (id, pos)-first occurrence only") {
    val docs = Seq(
      (1L, "x y z a b c"),   // chunks: "x y z", "a b c"
      (2L, "a b c x y z"),   // both chunks seen in doc 1 -> all dropped
      (3L, "a b c q r s")    // "a b c" dropped, "q r s" kept
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDedupGlobal(docs, "doc_id", "text", 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out === Array(
      (1L, "x y z a b c", 2L, 0L),
      (2L, "", 0L, 2L),
      (3L, "q r s", 1L, 1L)))
  }

  test("chunkDedupGlobal: trailing partial chunk is its own unit") {
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val out = Dedup.chunkDedupGlobal(docs, "doc_id", "text", 3).collect()
    assert(out(0).getString(1) === "a b c d") // "a b c" + "d"
    assert(out(0).getLong(2) === 2L)
  }

  test("intervalPairs: cross-bucket pairs found, window edge inclusive") {
    val ev = Seq(
      // bucket 0: s=59 ; bucket 1: s=61 -> cross-bucket pair, gap 2
      (1L, 59L, 10L, "a"), (1L, 61L, 11L, "b"),
      // exactly windowSec apart -> included (gap 60)
      (2L, 0L, 20L, "a"), (2L, 60L, 21L, "b"),
      // beyond the window -> excluded
      (3L, 0L, 30L, "a"), (3L, 61L, 31L, "b"),
      // tie on ts: ordered by event_id, counted once
      (4L, 5L, 40L, "c"), (4L, 5L, 41L, "c"))
      .toDF("user_id", "ts_sec", "event_id", "event_type")
    val out = Events.intervalPairs(ev, "user_id", "ts_sec", "event_id",
        "event_type", 60L)
      .orderBy("t1", "t2").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out === Array(
      ("a", "b", 2L, 2L, 60L),
      ("c", "c", 1L, 0L, 0L)))
  }

  test("intervalPairs never double-counts a same-bucket pair") {
    val ev = Seq((1L, 10L, 1L, "a"), (1L, 20L, 2L, "a"))
      .toDF("user_id", "ts_sec", "event_id", "event_type")
    val out = Events.intervalPairs(ev, "user_id", "ts_sec", "event_id",
      "event_type", 60L).collect()
    assert(out.length === 1 && out(0).getLong(2) === 1L)
  }

  test("overlapViaBloom output equals the exact broadcast-set form") {
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val bench = docs.filter(pmod(col("doc_id"), lit(40)) === 0)
    val exact = Decontam.overlapWithBenchmark(docs, bench, "doc_id", "text", 4)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val bloom = Decontam.overlapViaBloom(docs, bench, "doc_id", "text", 4)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(bloom === exact)
  }

  test("hardNegatives excludes the query's own label and ranks by cosine") {
    val emb = graft.core.Tables.load(spark, sfDir, "embeddings")
    val out = graft.operators.Similarity.hardNegatives(
      emb, "vec_id", "embedding", "label", queryIds = Seq(0L, 1L), k = 5)
      .collect()
    val qLabels = emb.filter(col("vec_id").isin(0L, 1L))
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.length === 10) // 2 queries x 5
    out.foreach { r =>
      val qid = r.getLong(0)
      assert(r.getInt(2) !== qLabels(qid), "negative must have a different label")
    }
    // per query, sims are non-increasing in rank order
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sims = rows.map(_.getDouble(3))
      assert(sims.sorted.reverse.sameElements(sims) || sims.length <= 1 ||
        rows.sortBy(r => (-r.getDouble(3), r.getLong(1)))
          .map(_.getLong(1)).sameElements(rows.map(_.getLong(1))))
    }
  }

  test("groupedMedian: lower median, exact on even and odd group sizes") {
    val df = Seq(
      ("a", 1L), ("a", 3L), ("a", 5L),             // odd: median 3
      ("b", 2L), ("b", 4L),                        // even: lower median 2
      ("c", 7L), ("c", 7L), ("c", 7L), ("c", 9L))  // ties: 7
      .toDF("g", "v")
    val out = graft.core.Stats.groupedMedian(df, "g", "v")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out === Array(("a", 3L, 3L), ("b", 2L, 2L), ("c", 4L, 7L)))
  }

  test("exactScoreBands: ties share a bucket, cutoffs are exact") {
    // scores: 9,9,9,9,8,8,7,7,7,5 (n=10, buckets=2)
    val df = (1L to 10L).zip(Seq(9, 9, 9, 9, 8, 8, 7, 7, 7, 5))
      .toDF("id", "score")
    val out = Curation.exactScoreBands(df, "id", "score", buckets = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // higher-counts: 9->0, 8->4, 7->6, 5->9 ; bucket = (2*higher) div 10
    val expected = Map(9 -> 0L, 8 -> 0L, 7 -> 1L, 5 -> 1L)
    out.foreach { case (_, s, b) => assert(b === expected(s), s"score $s") }
  }
}

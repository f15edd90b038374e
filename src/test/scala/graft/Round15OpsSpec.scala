package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, TextAnalysis}

/** Round-15 operators: the Gopher rule bundle and the curation
  * waterfall.
  */
class Round15OpsSpec extends SparkSpec {
  import spark.implicits._

  test("gopherRules: each rule fires on its own pathology") {
    val docs = Seq(
      (1L, "the cat sat of the mat and it is that good"), // passes all
      (2L, "zebra quokka wombat dingo koala possum"),     // no stopwords
      (3L, "the a go go go go go go go go go go"),        // repetition
      (4L, "the a is"),                                   // too short
      (5L, "the a of 1 2 3 4 5 6 7 8 9"))                 // low alpha frac
      .toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(docs, "doc_id", "text",
      minWords = 5, maxTopBigramFrac = 0.3)
      .orderBy("doc_id").collect()
    def flags(i: Int) = (r(i).getBoolean(6), r(i).getBoolean(7),
      r(i).getBoolean(8), r(i).getBoolean(9), r(i).getBoolean(10),
      r(i).getBoolean(11))
    assert(flags(0) === ((true, true, true, true, true, true)))
    assert(flags(1) === ((true, true, false, true, true, false)))
    // doc 3: "go go" occurs 9 times of 11 bigrams > 0.3
    assert(!r(2).getBoolean(10) && !r(2).getBoolean(11))
    assert(!r(3).getBoolean(6) && !r(3).getBoolean(11))
    assert(!r(4).getBoolean(9) && !r(4).getBoolean(11))
    // exact metrics for doc 1: 11 words, 4 distinct stopwords among
    // {the, of, and, is, it(not), that}
    assert(r(0).getLong(1) === 11L)
    assert(r(0).getLong(3) === 5L, "the, of, and, is, that")
    assert(r(0).getDouble(4) === 1.0)
  }

  test("gopherRules: top-bigram run counting matches the exact group count") {
    // "x y x y x y": bigrams [x y, y x, x y, y x, x y] → top 'x y' ×3 of 5
    val docs = Seq((1L, "x y x y x y")).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(docs, "doc_id", "text", minWords = 1,
      minDistinctStopwords = 0).collect()
    assert(r(0).getDouble(5) === 3.0 / 5.0)
  }

  test("waterfall: conjunctive stage survival with exact retention") {
    val df = Seq(
      (1L, 10L, true, true, true),
      (2L, 20L, true, true, false),
      (3L, 30L, true, false, true), // dropped at stage 2 → never reaches 3
      (4L, 40L, false, true, true)) // dropped at stage 1
      .toDF("id", "tok", "s1", "s2", "s3")
    val r = Curation.waterfall(df, col("tok"), Seq("s1", "s2", "s3"))
      .orderBy("stage").collect()
    assert(r.map(x => (x.getLong(0), x.getString(1), x.getLong(2),
      x.getLong(3))).toSeq === Seq(
      (0L, "input", 4L, 100L),
      (1L, "s1", 3L, 60L),
      (2L, "s2", 2L, 30L),
      (3L, "s3", 1L, 10L)))
    assert(r(0).isNullAt(4))
    assert(r(1).getDouble(4) === 3.0 / 4.0)
    assert(r(2).getDouble(4) === 2.0 / 3.0)
    assert(r(3).getDouble(4) === 0.5)
  }
}

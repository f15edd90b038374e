package graft

import org.apache.spark.sql.functions._

import graft.operators.Unigram

/** Differential verification of the unigram-LM tokenizer trainer: the
  * distributed hard-EM (Viterbi kernel + bounded model frames) must
  * reproduce a plain in-memory reference EXACTLY — same seed ranking,
  * same DP tie-break (longest piece on equal score), same Laplace
  * smoothing, same pruning — across random corpora. Scores compare by
  * equality, not tolerance: both sides run the same Math.log on the
  * same exact integers. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def refSeed(words: Map[String, Long], maxLen: Int,
      v: Int): Seq[(String, Long)] = {
    val cnt = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    for {
      (w, f) <- words
      i <- 0 until w.length
      l <- 1 to math.min(maxLen, w.length - i)
    } cnt(w.substring(i, i + l)) += f
    val chars = cnt.filter(_._1.length == 1).toSeq.sortBy(_._1)
    val multi = cnt.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(v - chars.size)
    chars ++ multi
  }

  private def refViterbi(w: String, vocab: Map[String, Double]): List[String] = {
    val maxLen = vocab.keys.map(_.length).max
    val n = w.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0.0
    for {
      i <- 1 to n
      j <- math.max(0, i - maxLen) until i
      if j == 0 || back(j) >= 0
      sc <- vocab.get(w.substring(j, i))
      if best(j) + sc > best(i)
    } { best(i) = best(j) + sc; back(i) = j }
    require(back(n) >= 0 || n == 0, s"unsegmentable: $w")
    var cuts = List.empty[Int]
    var k = n
    while (k > 0) { cuts = k :: cuts; k = back(k) }
    var prev = 0
    cuts.map { c => val p = w.substring(prev, c); prev = c; p }
  }

  private def refTrain(words: Map[String, Long], maxLen: Int, v: Int,
      iters: Int): Seq[(String, Long, Double)] = {
    var vocab = refSeed(words, maxLen, v).sortBy(_._1)
    val nChars = vocab.count(_._1.length == 1)
    var last = Map.empty[String, Long]
    for (_ <- 1 to iters) {
      val total = vocab.map(_._2).sum
      val scores = vocab.map { case (p, c) =>
        p -> math.log((c + 1).toDouble / (total + vocab.size).toDouble)
      }.toMap
      val counted = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      for ((w, f) <- words; p <- refViterbi(w, scores)) counted(p) += f
      val chars = vocab.collect { case (p, _) if p.length == 1 =>
        p -> counted.getOrElse(p, 0L)
      }
      val multi = vocab.collect { case (p, _) if p.length > 1 =>
        p -> counted.getOrElse(p, 0L)
      }.sortBy { case (p, c) => (-c, p) }.take(v - nChars)
      vocab = chars ++ multi
      last = counted.toMap
    }
    val total = vocab.map(x => last.getOrElse(x._1, 0L)).sum
    vocab.map { case (p, _) =>
      val c = last.getOrElse(p, 0L)
      (p, c, math.log((c + 1).toDouble / (total + vocab.size).toDouble))
    }
  }

  private def corpus(seed: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val alphabet = "abcdef"
    val stems = Seq.fill(12)(
      (1 to (2 + rnd.nextInt(4))).map(_ => alphabet(rnd.nextInt(6))).mkString)
    val suffixes = Seq("", "ing", "ed", "s")
    Seq.fill(80)(
      (1 to (3 + rnd.nextInt(6))).map { _ =>
        stems(rnd.nextInt(stems.size)) + suffixes(rnd.nextInt(4))
      }.mkString(" "))
  }

  test("unigram trainer fuzz: distributed hard-EM == in-memory reference " +
      "(seed ranking, DP tie-break, smoothing, pruning) on random corpora") {
    for (seed <- Seq(5, 17); (v, iters) <- Seq((40, 1), (40, 3), (60, 2))) {
      val docs = corpus(seed)
      val words = docs.flatMap(_.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val want = refTrain(words, maxLen = 4, v = v, iters = iters)
        .sortBy(_._1)
      val got = Unigram.train(docs.toDF("text"), "text", maxLen = 4,
          vocabSize = v, iterations = iters)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .toSeq.sortBy(_._1)
      assert(got.map(x => (x._1, x._2)) === want.map(x => (x._1, x._2)),
        s"seed $seed v $v iters $iters pieces/counts")
      for ((g, w) <- got.zip(want))
        assert(g._3 === w._3, s"seed $seed score for ${g._1}")
    }
  }

  test("viterbi kernel: tie-break keeps the longest piece; coverage " +
      "fallback to characters; missing char -> null") {
    val r = spark.sql(
      """SELECT
        |  graft_viterbi_segment('abab',
        |    array('a','b','ab','abab'),
        |    array(-1.0D, -1.0D, -2.0D, -4.0D)) AS tie,
        |  graft_viterbi_segment('axb',
        |    array('a','x','b','ax'), array(-1.0D,-9.0D,-1.0D,-2.0D))
        |    AS greedy,
        |  graft_viterbi_segment('aqz',
        |    array('a','q'), array(-1.0D,-1.0D)) AS missing,
        |  graft_viterbi_segment('', array('a'), array(-1.0D)) AS empty
        |""".stripMargin).collect()(0)
    // 'abab': a+b+a+b = -4, ab+ab = -4, abab = -4 — the longest-piece
    // tie-break must pick the single 4-char piece
    assert(r.getSeq[String](0) === Seq("abab"))
    // 'axb': ax+b = -3 beats a+x+b = -11
    assert(r.getSeq[String](1) === Seq("ax", "b"))
    assert(r.isNullAt(2), "a word with an uncovered char is null")
    assert(r.getSeq[String](3) === Seq.empty)
  }

  test("viterbi kernel: null piece/score elements are skipped, not " +
      "crashed on") {
    val r = spark.sql(
      """SELECT graft_viterbi_segment('ab',
        |  array('a', CAST(NULL AS STRING), 'b'),
        |  array(-1.0D, -1.0D, -2.0D)) AS s""".stripMargin).collect()(0)
    assert(r.getSeq[String](0) === Seq("a", "b"))
  }

  test("supplementary-plane characters keep their force-keep coverage " +
      "(codepoints, not UTF-16 units)") {
    // U+1D11E (musical G clef) is 2 UTF-16 units but ONE character: the
    // trainer must classify it as a force-kept char, or every word
    // containing it silently drops from the counts after pruning
    val astral = "𝄞"
    val docs = Seq.fill(30)(s"abc${astral}d abc abc abc${astral}d")
    val vocabDf = Unigram.train(docs.toDF("text"), "text",
      vocabSize = 8, iterations = 2)
    val rows = vocabDf.collect().map(r =>
      r.getString(0) -> r.getLong(1)).toMap
    assert(rows.contains(astral), s"astral char pruned: ${rows.keySet}")
    // the word containing it was actually counted, not dropped
    assert(rows(astral) > 0L)
  }

  test("trained tokenizer segments the whole corpus (character coverage " +
      "survives pruning) and conserves counts") {
    val docs = corpus(23)
    val vocabDf = Unigram.train(docs.toDF("text"), "text",
      vocabSize = 40, iterations = 2)
    val vocab = vocabDf.collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val words = docs.flatMap(_.split(" ")).filter(_.nonEmpty)
    for (w <- words.distinct) {
      val segs = refViterbi(w, vocab)
      assert(segs.mkString === w, s"lossless round trip for $w")
    }
    // every piece the final counts claim is actually in the vocabulary
    val counted = vocabDf.collect().map(r => r.getString(0)).toSet
    assert(counted.size === 40)
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Byte-pair-encoding merge learning (Sennrich et al. 2016) — the
  * subword-vocabulary stage of a training pipeline, trained the way real
  * BPE trainers train: on the WORD-FREQUENCY DICTIONARY, not the raw
  * corpus. The dictionary is vocabulary-bounded (shuffle once on the
  * token, map-side partials), so every learning iteration afterwards
  * costs O(|vocab|) regardless of corpus size — the property that makes
  * BPE trainable at 100 TB at all.
  *
  * Representation: each word is a separator-delimited symbol string
  * `␁c₁␁c₂␁…␁</w>␁` (U+0001 separator, `</w>` end-of-word marker). A
  * merge of pair (a,b) is `replace(s, "␁a␁b␁", "␁ab␁")` — single-pass,
  * non-overlapping, left-to-right, IDENTICAL semantics in Spark and
  * DuckDB's `replace`, which makes the whole learner (including its
  * data-dependent iteration) oracle-checkable. On a same-symbol run of
  * length ≥ 4 this grouping can differ from the classic skip-scan by one
  * position (documented variant; affects only `aaaa…` runs).
  *
  * Each iteration runs ONE bounded job: pair counts partial-aggregate on
  * the (a,b) key and the argmax comes back as a single collected row
  * (ties break on (count desc, a, b) — deterministic). That is the
  * k-means-style bounded model fetch, not a data collect.
  */
object Bpe {

  val Sep = "\u0001"
  val EndMark = "</w>"

  /** The word-frequency dictionary with initial symbol strings. */
  private[operators] def wordDict(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .withColumn("s",
        concat(lit(Sep), array_join(concat(expr(
            "transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
          array(lit(EndMark))), Sep), lit(Sep)))
      // sequence(1, 0) would generate DESCENDING for the empty word; its
      // char list must be empty, leaving only the end marker
      .withColumn("s", when(col("w") === "",
        concat(lit(Sep), lit(EndMark), lit(Sep))).otherwise(col("s")))

  /** Adjacent symbol pairs of dictionary `d` weighted by word frequency:
    * `(a, b, cnt)`. Symbols sit at positions 2..n-1 of the split (the
    * separator-delimited string splits with empty edges). */
  private def pairCounts(d: DataFrame): DataFrame =
    d.select(col("freq"), split(col("s"), Sep).as("arr"))
      .select(col("freq"), explode(expr(
        "transform(sequence(2, greatest(size(arr) - 2, 1)), " +
          "i -> struct(arr[i - 1] AS a, arr[i] AS b))")).as("p"))
      // single-symbol words produce the degenerate (sym, '') pair at the
      // guard index; real pairs never have an empty side
      .filter(col("p.a") =!= "" && col("p.b") =!= "")
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))

  /** Learn `merges` BPE merges; returns `(rank, lhs, rhs, pair_count)`
    * with rank 1 = first (most frequent) merge. Stops early if the
    * dictionary runs out of pairs.
    *
    * Rounds are BATCHED: each Spark job collects the top-B pair counts
    * (a bounded model frame) and the driver then accepts a PREFIX of
    * candidates that is provably identical to running the classic
    * one-merge-per-job loop — so a 32k-merge study launches jobs
    * proportional to the conflict structure of the data, not 32k of
    * them, while every output stays bit-equal to the sequential learner
    * (the DuckDB oracle replays that sequential learner level by
    * level). Acceptance of candidate i after earlier in-batch merges is
    * allowed only when the sequential learner would certainly still
    * pick it:
    *
    *  - it shares NO symbol with an accepted merge (its count is then
    *    provably unchanged by them), and the scan stops at the first
    *    sharing candidate (whose stale count can no longer be ranked);
    *  - its count strictly exceeds an upper bound on every count an
    *    accepted merge can have changed or created: a merge (a,b)→S can
    *    only create pairs (x,S)/(S,y) with multiplicity ≤ the old
    *    (x,a)/(b,y) counts, on top of any pre-existing pairs touching
    *    S — all bounded by collected counts of rows touching those
    *    symbols, with `cLast` (the B-th count) bounding anything
    *    uncollected.
    *
    * A stop just ends the round — the next job recounts exactly, so the
    * bound is a THROUGHPUT heuristic, never a correctness assumption.
    * Each round accepts at least one merge (the global argmax is always
    * exact), so job count never exceeds the sequential learner's. */
  def learnMerges(docs: DataFrame, textCol: String, merges: Int): DataFrame = {
    require(merges >= 1, "learnMerges: need at least one merge")
    val spark = docs.sparkSession
    var dict = wordDict(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val learned = scala.collection.mutable.ListBuffer.empty[Row]
    try {
      var rank = 1
      var exhausted = false
      while (rank <= merges && !exhausted) {
        val remaining = merges - rank + 1
        // bounded model fetch: B rows of (a, b, cnt), not data
        val batchSize = math.min(math.max(256, 4 * remaining), 4096)
        val top = pairCounts(dict)
          .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
          .limit(batchSize).collect()
        if (top.isEmpty) exhausted = true
        else {
          // anything uncollected has count <= the last collected count
          val cLast = if (top.length == batchSize)
            top.last.getLong(2) else 0L
          val rows = top.map(r =>
            (r.getString(0), r.getString(1), r.getLong(2)))
          // directional count bounds from the collected frame, floored
          // by cLast for anything uncollected: a merge (a,b)→S creates
          // (x,S) pairs with multiplicity ≤ the old (x,a) counts (a as
          // RIGHT element) and (S,y) pairs ≤ the old (b,y) counts (b as
          // LEFT element)
          def maxAsRight(sym: String): Long = rows.iterator
            .filter(_._2 == sym).map(_._3)
            .foldLeft(cLast)(math.max)
          def maxAsLeft(sym: String): Long = rows.iterator
            .filter(_._1 == sym).map(_._3)
            .foldLeft(cLast)(math.max)
          val accepted = scala.collection.mutable
            .ListBuffer.empty[(String, String, Long)]
          val dirty = scala.collection.mutable.Set.empty[String]
          // Σ over accepted merges of their max creation mass, plus the
          // largest pre-existing count touching a created symbol
          var createSum = 0L
          var preExist = 0L
          var stopped = false
          val it = rows.iterator
          while (!stopped && accepted.size < remaining && it.hasNext) {
            val (a, b, c) = it.next()
            if (dirty.contains(a) || dirty.contains(b)) stopped = true
            else if (accepted.nonEmpty && c <= preExist + createSum)
              stopped = true
            else {
              accepted += ((a, b, c))
              dirty ++= Seq(a, b, a + b)
              createSum += math.max(maxAsRight(a), maxAsLeft(b))
              preExist = math.max(preExist,
                math.max(maxAsRight(a + b), maxAsLeft(a + b)))
            }
          }
          for ((a, b, c) <- accepted) {
            learned += Row(rank.toLong, a, b, c)
            dict = dict.withColumn("s",
              call_function("replace", col("s"),
                lit(Sep + a + Sep + b + Sep), lit(Sep + a + b + Sep)))
            rank += 1
          }
        }
      }
    } finally dict.unpersist(blocking = false)
    spark.createDataFrame(
      java.util.Arrays.asList(learned.toList: _*),
      StructType(Seq(
        StructField("rank", LongType, nullable = false),
        StructField("lhs", StringType, nullable = false),
        StructField("rhs", StringType, nullable = false),
        StructField("pair_count", LongType, nullable = false))))
  }

  /** Apply a learned merge list to the corpus and report segmentation
    * fertility per group: words, resulting BPE pieces, pieces-per-word.
    * The merge list is a bounded driver-side list (it IS the model);
    * application is the same `replace` chain fused into the scan.
    */
  def segmentStats(docs: DataFrame, groupCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val dict = wordDict(docs, textCol)
    // count pieces per DISTINCT word, then weight by frequency — the
    // merge chain runs |vocab| times, not |corpus| times
    val segmented = merges.foldLeft(dict) { case (d, (a, b)) =>
      d.withColumn("s", call_function("replace", col("s"),
        lit(Sep + a + Sep + b + Sep), lit(Sep + a + b + Sep)))
    }.select(col("w"), col("freq"),
      (size(split(col("s"), Sep)) - 2).cast("long").as("pieces"))
    val perWord = broadcast(segmented)
    docs.select(col(groupCol), explode(split(col(textCol), " ")).as("w"))
      .join(perWord, "w")
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_words"), sum(col("pieces")).as("n_pieces"))
      .withColumn("pieces_per_word",
        col("n_pieces").cast("double") / col("n_words").cast("double"))
  }
}

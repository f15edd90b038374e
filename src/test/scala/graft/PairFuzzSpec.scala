package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

/** Randomized differential fuzz for the pair-finding family (the r9
  * containment-join template, Round16OpsSpec): random corpora with
  * spliced substrings × random parameters, each draw checked for SET
  * EQUALITY against an independent brute-force reference. The prefix
  * lengths, band layouts, df caps, and completeness slacks in these
  * operators are exactly the code where an off-by-one silently drops
  * boundary pairs at parameters the fixed catalog never visits.
  *
  * The reference implementations deliberately share only the hash
  * EXPRESSIONS (graft_shingle_hash / graft_minhash / graft_winnow /
  * simhash — the fuzz targets the join/prefix/band machinery, not the
  * hash functions, which have their own specs) and reimplement all pair
  * logic naively: all-pairs in driver Scala or a bare explode-join.
  */
class PairFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def canon(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq

  /** Random corpus: `nBase` independent docs over a seed-sized vocab plus
    * `nSplice` docs built from another doc's tail + random padding, so
    * boundary pairs land on every threshold (the r9 template's shape). */
  private def corpus(seed: Int, nBase: Int = 40, nSplice: Int = 15) = {
    val rnd = new scala.util.Random(seed)
    val vocab = 20 + rnd.nextInt(300)
    val base = (1L to nBase.toLong).map { i =>
      (i, Seq.fill(8 + rnd.nextInt(40))(s"v${rnd.nextInt(vocab)}")
        .mkString(" "))
    }
    val spliced = ((nBase + 1).toLong to (nBase + nSplice).toLong).map { i =>
      val src = base(rnd.nextInt(base.size))._2.split(" ")
      val take = src.slice(rnd.nextInt(math.max(1, src.length - 4)),
        src.length)
      val pad = Seq.fill(rnd.nextInt(25))(s"v${rnd.nextInt(vocab)}")
      (i, (take ++ pad).mkString(" "))
    }
    // one exact duplicate pair per corpus: hamming 0 / jaccard 1.0 rows
    // must always surface
    val dup = Seq(((nBase + nSplice + 1).toLong, base.head._2))
    (base ++ spliced ++ dup).toDF("doc_id", "text")
  }

  test("setSimJoin fuzz: PPJoin == brute all-pairs Jaccard over random " +
      "corpora, thresholds, shingle sizes") {
    for (seed <- Seq(13, 29); shingle <- Seq(1, 3)) {
      val docs = corpus(seed)
      // brute force: explode the distinct gram-hash sets, join on the
      // gram, count intersections, Jaccard from set sizes — no prefix,
      // no positional filter, no size prune
      val tok = docs.select(col("doc_id"),
        call_function("graft_shingle_hash", split(col("text"), " "),
          lit(shingle)).as("tk"))
        .filter(size(col("tk")) > 0)
      val ex = tok.select(col("doc_id"), size(col("tk")).as("s"),
        explode(col("tk")).as("h"))
      val brute = ex.select(col("doc_id").as("d1"), col("s").as("s1"), col("h"))
        .join(ex.select(col("doc_id").as("d2"), col("s").as("s2"), col("h")), "h")
        .filter(col("d1") < col("d2"))
        .groupBy("d1", "d2").agg(count(lit(1)).as("i"),
          first(col("s1")).as("s1"), first(col("s2")).as("s2"))
        .select(col("d1"), col("d2"), (col("i").cast("double") /
          (col("s1") + col("s2") - col("i"))).as("jaccard"))
      for (t <- Seq(0.2, 0.5, 0.8)) {
        val got = canon(Dedup.setSimJoin(docs, "doc_id", "text", t, shingle))
        val want = canon(brute.filter(col("jaccard") >= t))
        assert(got === want, s"seed $seed shingle $shingle threshold $t")
      }
    }
  }

  test("LSH banding fuzz: lshCandidates == brute signature-band collisions " +
      "for every (bands, rows) layout") {
    for (seed <- Seq(17, 31); (bands, rows) <- Seq((2, 2), (4, 2), (3, 3))) {
      val docs = corpus(seed)
      val k = bands * rows
      // reference: signatures collected (shared expression), banding and
      // all-pairs collision in plain Scala. Band key mirrors the
      // operator's string-concat convention (Long.toString concat).
      val sigs = docs
        .filter(size(split(col("text"), " ")) >= 3)
        .select(col("doc_id"), call_function("graft_minhash",
          split(col("text"), " "), lit(k)).as("mh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toIndexedSeq)
      val want = (for {
        (ida, sa) <- sigs; (idb, sb) <- sigs
        if ida < idb
        if (0 until bands).exists(b =>
          sa.slice(b * rows, (b + 1) * rows).mkString ==
            sb.slice(b * rows, (b + 1) * rows).mkString)
      } yield Seq(ida.toString, idb.toString)).sortBy(_.mkString("|")).toSeq
      val got = canon(Dedup.lshCandidates(
        Dedup.minhashBands(docs, "doc_id", "text", bands, rows), "doc_id"))
      assert(got === want, s"seed $seed bands $bands rows $rows")
    }
  }

  test("winnowPairs fuzz: df-capped shared-fingerprint ranking == naive " +
      "multiset reference") {
    for (seed <- Seq(19, 37); (k, w) <- Seq((2, 3), (3, 4));
         maxDf <- Seq(5L, 20L); minShared <- Seq(1L, 2L)) {
      val docs = corpus(seed)
      // reference: fingerprint MULTISETS collected (shared expression),
      // then df cap / shared counts / overlap ratio in plain Scala
      val fps = docs.select(col("doc_id"),
          call_function("graft_winnow", split(col("text"), " "),
            lit(k), lit(w), lit("win")).as("fps"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1).toIndexedSeq)
        .filter(_._2.nonEmpty)
      val dfreq = fps.flatMap(_._2).groupBy(identity).map {
        case (fp, occ) => fp -> occ.size.toLong
      }
      val keptCnt: Map[Long, Map[String, Long]] = fps.map { case (id, l) =>
        id -> l.filter(fp => dfreq(fp) <= maxDf).groupBy(identity)
          .map { case (fp, occ) => fp -> occ.size.toLong }
      }.toMap
      val ids = fps.map(_._1).filter(id => keptCnt(id).nonEmpty).sorted
      val want = (for {
        a <- ids; b <- ids if a < b
        shared = keptCnt(a).keySet.intersect(keptCnt(b).keySet).toSeq
          .map(fp => keptCnt(a)(fp) * keptCnt(b)(fp)).sum
        if shared >= minShared
      } yield {
        val na = keptCnt(a).values.sum
        val nb = keptCnt(b).values.sum
        Seq(a.toString, b.toString, shared.toString,
          String.valueOf(shared.toDouble / math.min(na, nb)))
      }).sortBy(_.mkString("|")).toSeq
      val got = canon(Dedup.winnowPairs(docs, "doc_id", "text", k, w,
        maxDf, minShared, topK = 100000))
      assert(got === want,
        s"seed $seed k $k w $w maxDf $maxDf minShared $minShared")
    }
  }

  test("simhash banding fuzz: pigeonhole bands find EVERY pair at " +
      "hamming <= max, for every (bits, maxHamming)") {
    for (seed <- Seq(23, 41); (bits, maxH) <- Seq((16, 3), (16, 1), (32, 3))) {
      val docs = corpus(seed)
      val sigs = docs
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"),
          coalesce(TextAnalysis.simhash(col("text"), bits), lit(0L)).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      val want = (for {
        (ida, sa) <- sigs; (idb, sb) <- sigs
        if ida < idb
        h = java.lang.Long.bitCount(sa ^ sb)
        if h <= maxH
      } yield Seq(ida.toString, idb.toString, h.toString))
        .sortBy(_.mkString("|")).toSeq
      val got = canon(Dedup.simhashNearDupPairs(docs, "doc_id", "text",
        bits, maxH))
      assert(got === want, s"seed $seed bits $bits maxHamming $maxH")
    }
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Dedup

/** Catalog entries: Hamming-tolerant SimHash near-duplicate detection —
  * the banded tolerance the r1 verdict noted as comment-only.
  */
object Queries6 {

  /** Near-dup pairs within hamming distance 3 of a 48-bit SimHash. Spark
    * runs the scalable pigeonhole-banded plan
    * ([[Dedup.simhashNearDupPairs]]: equi-join on 12-bit bands, popcount
    * prune); the oracle brute-forces ALL pairs — the two must agree
    * exactly, which is a proof-by-oracle that the banding loses no pair.
    */
  val q51SimhashNearDup: (String, QueryDef) = "q51_simhash_neardup" -> QueryDef(
    (s: SparkSession, dir: String) =>
      Dedup.simhashNearDupPairs(Tables.load(s, dir, "documents"),
          "doc_id", "text", bits = 48, maxHamming = 3)
        .orderBy(col("d1"), col("d2"))
        .limit(300),
    Some {
      val bitTerms = (0 until 48).map { b =>
        s"CASE WHEN list_reduce(list_transform(hs, h -> CASE WHEN (h >> $b) % 2 = 1 THEN 1 ELSE -1 END), (x, y) -> x + y) > 0 THEN ${1L << b} ELSE 0 END"
      }.mkString(" +\n")
      s"""WITH h AS (
         |  SELECT doc_id, list_transform(list_distinct(string_split(text, ' ')),
         |    t -> CAST('0x' || substring(md5(t), 1, 15) AS BIGINT)) AS hs
         |  FROM documents),
         |s AS (SELECT doc_id, $bitTerms AS sh FROM h)
         |SELECT a.doc_id AS d1, b.doc_id AS d2,
         |  CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
         |FROM s a JOIN s b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sh, b.sh)) <= 3
         |ORDER BY d1, d2 LIMIT 300""".stripMargin
    })

  /** IVF ANN top-k ([[graft.operators.Similarity.ivfTopK]]): assign every
    * vector to its nearest seeded centroid, probe the 4 nearest centroids
    * per query, exact cosine on probed clusters only. The oracle replicates
    * every stage in SQL — centroids come from the table itself
    * (vec_id < 16), dots are the same in-order folds, argmax/top-k use the
    * same (desc, id) tie-breaks — so the probe-limited candidate set must
    * match exactly.
    */
  val q52AnnIvf: (String, QueryDef) = "q52_ann_ivf" -> QueryDef(
    (s: SparkSession, dir: String) =>
      graft.operators.Similarity.ivfTopK(
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          queryIds = (100L to 107L), k = 10, nClusters = 16, nProbe = 4)
        .orderBy(col("qid"), col("sim").desc, col("vec_id")),
    Some {
      def dotSql(a: String, b: String): String =
        s"list_reduce(list_transform(generate_series(1, 64), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"
      s"""WITH cents AS (
         |  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 16),
         |sims AS (
         |  SELECT e.vec_id, c.cid, ${dotSql("e.embedding", "c.cv")} AS sim
         |  FROM embeddings e CROSS JOIN cents c),
         |assigned AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rk
         |    FROM sims) WHERE rk = 1),
         |probes AS (
         |  SELECT vec_id AS qid, cid FROM (
         |    SELECT vec_id, cid,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rk
         |    FROM sims WHERE vec_id BETWEEN 100 AND 107) WHERE rk <= 4),
         |cand AS (
         |  SELECT p.qid, a.vec_id FROM assigned a JOIN probes p
         |    ON a.cid = p.cid AND a.vec_id <> p.qid),
         |scored AS (
         |  SELECT c.qid, c.vec_id,
         |    ${dotSql("e.embedding", "qe.embedding")} /
         |    (SQRT(${dotSql("e.embedding", "e.embedding")}) *
         |     SQRT(${dotSql("qe.embedding", "qe.embedding")})) AS sim
         |  FROM cand c
         |  JOIN embeddings e ON e.vec_id = c.vec_id
         |  JOIN embeddings qe ON qe.vec_id = c.qid),
         |ranked AS (
         |  SELECT qid, vec_id, sim,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rk
         |  FROM scored)
         |SELECT qid, vec_id, sim FROM ranked WHERE rk <= 10
         |ORDER BY qid, sim DESC, vec_id""".stripMargin
    })

  /** Distinctive terms per document
    * ([[graft.operators.TextAnalysis.distinctiveTerms]]): tf/df scoring
    * with df over the FULL corpus, top-3 per doc, reported for the first
    * 50 docs. The score is one IEEE division of two ints — bit-exact in
    * both engines, no rounding convention needed.
    */
  val q53TfIdf: (String, QueryDef) = "q53_distinctive_terms" -> QueryDef(
    (s: SparkSession, dir: String) =>
      graft.operators.TextAnalysis.distinctiveTerms(
          Tables.load(s, dir, "documents"), "doc_id", "text", k = 3)
        .filter(col("doc_id") < 50)
        .orderBy(col("doc_id"), col("score").desc, col("term")),
    Some(
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
        |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |scored AS (
        |  SELECT t.doc_id, t.term, CAST(t.tf AS DOUBLE) / d.df AS score
        |  FROM tf t JOIN dfreq d USING (term)),
        |ranked AS (
        |  SELECT doc_id, term, score,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
        |  FROM scored)
        |SELECT doc_id, term, score FROM ranked WHERE rk <= 3 AND doc_id < 50
        |ORDER BY doc_id, score DESC, term""".stripMargin))

  val catalog: Seq[(String, QueryDef)] =
    Seq(q51SimhashNearDup, q52AnnIvf, q53TfIdf)
}

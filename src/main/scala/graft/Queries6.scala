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

  val catalog: Seq[(String, QueryDef)] = Seq(q51SimhashNearDup)
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.AsOfJoin

/** Catalog entries: as-of join (verified against DuckDB's native
  * ASOF JOIN). */
object Queries5 {

  /** For each event, the most recent order (by day) of the same customer at
    * or before the event — backward as-of enrichment. Right side is
    * pre-reduced to unique (key, time) with max(o_orderkey) so ties are
    * deterministic in both engines.
    */
  val q46AsOf: (String, QueryDef) = "q46_asof_join" -> QueryDef(
    (s: SparkSession, dir: String) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          expr("ts_sec div 86400").as("ev_day"))
      val ord = Tables.load(s, dir, "orders")
        .select(col("o_custkey"),
          datediff(col("o_orderdate").cast("date"), lit("1970-01-01")).as("o_day"),
          col("o_orderkey"))
        .groupBy(col("o_custkey"), col("o_day"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
      AsOfJoin.backward(ev, ord, "user_id", "o_custkey", "ev_day", "o_day",
          Seq("o_orderkey"))
        .select(col("event_id"), col("user_id"), col("o_orderkey"))
        .orderBy(col("event_id"))
        .limit(100)
    },
    Some("""WITH ord AS (
       |  SELECT o_custkey,
       |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS o_day,
       |    MAX(o_orderkey) AS o_orderkey
       |  FROM orders GROUP BY o_custkey, o_day),
       |ev AS (
       |  SELECT event_id, user_id,
       |    (epoch_ns(ts) // 1000000000) // 86400 AS ev_day
       |  FROM events)
       |SELECT event_id, user_id, o_orderkey
       |FROM ev ASOF JOIN ord
       |  ON ev.user_id = ord.o_custkey AND ev.ev_day >= ord.o_day
       |ORDER BY event_id LIMIT 100""".stripMargin))

  /** ANN scale path: random-hyperplane LSH bucket histogram. The planes
    * are deterministic (splitmix hash of (seed, plane, dim)), so the oracle
    * embeds the identical weight literals and replicates the projection as
    * an in-order left fold — double ops on identical operands in identical
    * order are bit-identical across engines, so every sign bit matches. */
  val q47AnnLsh: (String, QueryDef) = "q47_ann_lsh_buckets" -> QueryDef(
    (s: SparkSession, dir: String) =>
      graft.operators.Similarity.lshBuckets(
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          planes = 8, seed = 42, dims = 64)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("cnt"), min(col("vec_id")).as("min_id"))
        .orderBy(col("bucket")),
    Some {
      def projSql(p: Int): String = {
        val w = (0 until 64).map(d =>
          java.lang.Double.toString(graft.operators.Similarity.planeWeight(42, p, d)))
          .mkString("[", ",", "]")
        // in-order left fold of CAST(float AS DOUBLE) * literal — matches
        // Spark's aggregate(zip_with(...)) fold bit-for-bit
        s"list_reduce(list_transform(generate_series(1, 64), i -> CAST(embedding[i] AS DOUBLE) * ($w)[i]), (a, b) -> a + b)"
      }
      val bucket = (0 until 8).map(p =>
        s"(CASE WHEN ${projSql(p)} > 0 THEN ${1L << p} ELSE 0 END)").mkString(" + ")
      s"""WITH b AS (SELECT vec_id, CAST($bucket AS BIGINT) AS bucket FROM embeddings)
         |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt, MIN(vec_id) AS min_id
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin
    })

  val catalog: Seq[(String, QueryDef)] = Seq(q46AsOf, q47AnnLsh)
}

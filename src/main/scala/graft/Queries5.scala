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

  /** TRUE nested MultiHist (halving subranges from the top,
    * hist_multi.go:223-257) over event value cents — the oracle embeds the
    * integer subrange layout as literals and replicates the merged bucket
    * walk, like q44's threshold trick. */
  val q48NestedHist: (String, QueryDef) = "q48_nested_hist" -> QueryDef(
    (s: SparkSession, dir: String) => {
      val ev = Tables.events(s, dir)
      val h = graft.functions.NestedHist.nestedHist(
        expr("CAST(value * 100 AS LONG)"), lit(1L), 1L, 49002L)
      ev.groupBy(col("event_type"))
        .agg(h.as("h"))
        .selectExpr("event_type", "h.count AS cnt", "ROUND(h.mean, 6) AS mean",
          "h.percentiles[50] AS p50_cents", "ROUND(h.stddev, 6) AS stddev")
        .orderBy(col("event_type"))
    },
    Some {
      val lay = graft.functions.NestedHist.layout(1L, 49002L, 1000)
      val mins = lay.map(_._1).mkString("[", ",", "]")
      val widths = lay.map(_._3).mkString("[", ",", "]")
      s"""WITH v AS (
         |  SELECT event_type, CAST(trunc(value * 100) AS BIGINT) AS cents
         |  FROM events WHERE value * 100 >= 1 AND value * 100 < 490021),
         |kept AS (
         |  SELECT event_type, cents,
         |    -- overflow band (infoMax, 10*infoMax]: counted (m) but NOT
         |    -- bucketed, mirroring NestedHistAggregator.reduce — low stays
         |    -- NULL so bk/cum/p50/sd never see phantom top-subrange lows
         |    CASE WHEN cents <= 49002 THEN
         |      ($mins)[len(list_filter($mins, a -> a <= cents))] +
         |      ((cents - ($mins)[len(list_filter($mins, a -> a <= cents))]) //
         |        ($widths)[len(list_filter($mins, a -> a <= cents))]) *
         |        ($widths)[len(list_filter($mins, a -> a <= cents))]
         |    END AS low
         |  FROM v),
         |bk AS (SELECT event_type, low, COUNT(*) AS c FROM kept
         |  WHERE low IS NOT NULL GROUP BY 1, 2),
         |cum AS (
         |  SELECT event_type, low, c,
         |    SUM(c) OVER (PARTITION BY event_type ORDER BY low) AS cm,
         |    SUM(c) OVER (PARTITION BY event_type) AS tot
         |  FROM bk),
         |p50 AS (
         |  SELECT event_type, MIN(low) AS p50_cents FROM cum
         |  WHERE 100 * cm >= 50 * tot GROUP BY 1),
         |m AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt,
         |    CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS mean
         |  FROM kept GROUP BY 1),
         |sd AS (
         |  SELECT b.event_type,
         |    SQRT(SUM((b.low - m.mean) * (b.low - m.mean) *
         |      (b.c / CAST(m.cnt AS DOUBLE)))) AS sdv
         |  FROM bk b JOIN m ON b.event_type = m.event_type
         |  GROUP BY 1, m.cnt, m.mean)
         |SELECT m.event_type, m.cnt, ROUND(m.mean, 6) AS mean,
         |  p50.p50_cents, ROUND(sd.sdv, 6) AS stddev
         |FROM m JOIN p50 ON m.event_type = p50.event_type
         |JOIN sd ON m.event_type = sd.event_type
         |ORDER BY m.event_type""".stripMargin
    })

  /** End-to-end ANN: multi-table LSH candidate generation + exact cosine
    * on candidates + per-query top-k — the full
    * [[graft.operators.Similarity.annTopK]] pipeline, oracle-checked. The
    * SQL twin replicates every stage: per-table bucket from literal plane
    * weights (in-order folds — bit-identical projections), candidate join
    * on (table, bucket), cosine as dot/sqrt of in-order folds, ROW_NUMBER
    * top-k with the same (sim desc, id) tie-break. */
  val q49AnnTopK: (String, QueryDef) = "q49_ann_topk" -> QueryDef(
    (s: SparkSession, dir: String) =>
      graft.operators.Similarity.annTopK(
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          queryIds = Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L), k = 10,
          planes = 4, tables = 4, seed = 42, dims = 64)
        .orderBy(col("qid"), col("sim").desc, col("vec_id")),
    Some {
      import graft.operators.Similarity.planeWeight
      def dotSql(a: String, b: String): String =
        s"list_reduce(list_transform(generate_series(1, 64), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"
      def projSql(tbl: Int, p: Int): String = {
        val w = (0 until 64).map(d =>
          java.lang.Double.toString(planeWeight(42 + 1000 * tbl, p, d)))
          .mkString("[", ",", "]")
        s"list_reduce(list_transform(generate_series(1, 64), i -> CAST(embedding[i] AS DOUBLE) * ($w)[i]), (a, b) -> a + b)"
      }
      def bucketSql(tbl: Int): String = (0 until 4).map(p =>
        s"(CASE WHEN ${projSql(tbl, p)} > 0 THEN ${1L << p} ELSE 0 END)").mkString(" + ")
      val sigSelects = (0 until 4).map(t =>
        s"SELECT vec_id, $t AS tbl, ${bucketSql(t)} AS bucket FROM embeddings")
        .mkString("\nUNION ALL\n")
      s"""WITH sigs AS (
         |$sigSelects
         |),
         |qs AS (SELECT * FROM sigs WHERE vec_id IN (0,1,2,3,4,5,6,7)),
         |cand AS (
         |  SELECT DISTINCT q.vec_id AS qid, s.vec_id
         |  FROM sigs s JOIN qs q
         |    ON s.tbl = q.tbl AND s.bucket = q.bucket AND s.vec_id <> q.vec_id),
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

  /** Embedding norms + symmetric int8 quantization (the 4x storage cut a
    * 100 TB embedding pipeline applies before shuffling/sinking vectors).
    * The floor(x*scale + 0.5) formulation rounds identically in both
    * engines; norm/scale ROUND(,6) per the cross-engine convention. */
  val q50EmbedQuantize: (String, QueryDef) = "q50_embed_quantize" -> QueryDef(
    (s: SparkSession, dir: String) =>
      Tables.load(s, dir, "embeddings")
        .select(col("vec_id"),
          round(sqrt(graft.operators.Similarity.dot(col("embedding"), col("embedding"))), 6)
            .as("norm"),
          graft.operators.Similarity.quantizeInt8(col("embedding")).as("qz"))
        .select(col("vec_id"), col("norm"),
          round(col("qz.scale"), 6).as("scale"),
          expr("CAST(aggregate(qz.q, 0L, (a, x) -> a + CAST(x AS LONG)) AS BIGINT)")
            .as("q_sum"))
        .orderBy(col("vec_id")),
    Some {
      val dot = "list_reduce(list_transform(generate_series(1, 64), i -> " +
        "CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), (a, b) -> a + b)"
      s"""WITH m AS (
         |  SELECT vec_id, embedding,
         |    CAST(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS DOUBLE) AS maxabs
         |  FROM embeddings)
         |SELECT vec_id,
         |  ROUND(SQRT($dot), 6) AS norm,
         |  ROUND(127.0 / maxabs, 6) AS scale,
         |  CAST(list_reduce(list_transform(generate_series(1, 64), i ->
         |    FLOOR(CAST(embedding[i] AS DOUBLE) * (127.0 / maxabs) + 0.5)),
         |    (a, b) -> a + b) AS BIGINT) AS q_sum
         |FROM m ORDER BY vec_id""".stripMargin
    })

  val catalog: Seq[(String, QueryDef)] =
    Seq(q46AsOf, q47AnnLsh, q48NestedHist, q49AnnTopK, q50EmbedQuantize)
}

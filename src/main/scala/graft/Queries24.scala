package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Catalog entries: round-11 additions — the zero-dependency PNG decode
  * anchored through the existing raster kernels, and the Unigram
  * trainer's EM round pinned on an analytically-forced fixture.
  */
object Queries24 {

  private def t(name: String)(implicit env: (SparkSession, String)): DataFrame =
    Tables.load(env._1, env._2, name)

  private def q(name: String, sql: String = null)(
      body: (SparkSession, String) => DataFrame): (String, QueryDef) =
    name -> QueryDef(body, Option(sql))

  /** PNG decode round trip ([[graft.expressions.PngRaster]]): synthesize
    * a standards-valid PNG per document — per-scanline filter cycling
    * through ALL FIVE predictors (`doc_id % 6`, incl. the per-row-cycle
    * mode) and both gray/RGB color types — then decode with the
    * zero-dependency Inflater+defilter kernel into the P5/P6 interchange
    * form and hash with the EXISTING `graft_ppm_phash` / `graft_ppm_resize`
    * kernels. The oracle replays the PIXEL FORMULA (the q199 convention)
    * and never mentions the filter or color type: any defilter or
    * conversion bug breaks the hash. */
  val q209PngPhash: (String, QueryDef) = q(
    "q209_png_phash",
    """WITH p AS (
      |  SELECT doc_id, 16 + doc_id % 37 AS w, 12 + (doc_id*3) % 31 AS h,
      |         1 + doc_id % 7 AS a, 1 + doc_id % 11 AS b
      |  FROM documents WHERE doc_id < 150),
      |xs AS (SELECT p.*, unnest(generate_series(0, w-1)) AS x FROM p),
      |px AS (SELECT doc_id, w, h, a, b, x,
      |         unnest(generate_series(0, h-1)) AS y FROM xs),
      |v AS (SELECT doc_id, w, h, x, y, (x*a + y*b) % 256 AS v,
      |        (x*8)//w AS ci, (y*8)//h AS cj FROM px),
      |cells AS (SELECT doc_id, ci, cj, SUM(v) AS cs, COUNT(*) AS ca
      |          FROM v GROUP BY 1, 2, 3),
      |tot AS (SELECT doc_id, w, h, SUM(v) AS ts, w*h AS ta
      |        FROM v GROUP BY doc_id, w, h),
      |ahp AS (SELECT c.doc_id,
      |  SUM(CASE WHEN c.cj*8+c.ci < 32 AND c.cs * t.ta >= t.ts * c.ca
      |      THEN CAST(POWER(2, c.cj*8 + c.ci) AS BIGINT) ELSE 0 END) AS lo,
      |  SUM(CASE WHEN c.cj*8+c.ci >= 32 AND c.cs * t.ta >= t.ts * c.ca
      |      THEN CAST(POWER(2, c.cj*8 + c.ci - 32) AS BIGINT) ELSE 0 END)
      |    AS hi
      |  FROM cells c JOIN tot t USING (doc_id) GROUP BY c.doc_id),
      |ah AS (SELECT doc_id,
      |  (CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
      |    * 4294967296 + lo AS ahash FROM ahp),
      |dh AS (SELECT l.doc_id,
      |  SUM(CASE WHEN r.cs * l.ca > l.cs * r.ca
      |      THEN CAST(POWER(2, l.cj*7 + l.ci) AS BIGINT) ELSE 0 END)
      |    AS dhash
      |  FROM cells l JOIN cells r ON r.doc_id = l.doc_id AND r.cj = l.cj
      |    AND r.ci = l.ci + 1
      |  WHERE l.ci < 7 GROUP BY l.doc_id),
      |rcell AS (SELECT doc_id, (x*10)//w AS u, (y*9)//h AS rv,
      |    SUM(v) AS cs, COUNT(*) AS ca FROM v GROUP BY 1, 2, 3),
      |rz AS (SELECT doc_id, SUM(cs // ca) AS rz_total FROM rcell
      |       GROUP BY doc_id)
      |SELECT t.doc_id, CAST(t.w AS INT) AS width, CAST(t.h AS INT) AS height,
      |  CAST(t.ts AS BIGINT) AS gray_total, CAST(ah.ahash AS BIGINT) AS ahash,
      |  CAST(dh.dhash AS BIGINT) AS dhash,
      |  CAST(rz.rz_total AS BIGINT) AS rz_total
      |FROM tot t JOIN ah USING (doc_id) JOIN dh USING (doc_id)
      |  JOIN rz USING (doc_id)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val ppm = call_function("graft_png_to_ppm",
      call_function("graft_synth_png",
        lit(16L) + d % 37, lit(12L) + (d * 3) % 31,
        lit(1L) + d % 7, lit(1L) + d % 11,
        d % 6, (d % 2) * 2))
    t("documents").filter(d < 150)
      .select(d,
        call_function("graft_ppm_phash", ppm).as("ph"),
        call_function("graft_ppm_phash",
          call_function("graft_ppm_resize", ppm, lit(10L), lit(9L)))
          .as("rz"))
      .select(d, col("ph.width").as("width"), col("ph.height").as("height"),
        col("ph.gray_total").as("gray_total"), col("ph.ahash").as("ahash"),
        col("ph.dhash").as("dhash"), col("rz.gray_total").as("rz_total"))
      .orderBy(d)
  }

  val catalog: Seq[(String, QueryDef)] = Seq(q209PngPhash)
}

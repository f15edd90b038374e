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
    * mode), both gray/RGB color types, and (r12) both interlace modes ×
    * both bit depths (`doc_id` bits 2/3: plain/Adam7 × 8/16-bit — a
    * 16-bit sample's high byte carries the same formula value, so every
    * variant decodes to IDENTICAL pixels) — then decode with the
    * zero-dependency Inflater+defilter kernel into the P5/P6 interchange
    * form and hash with the EXISTING `graft_ppm_phash` / `graft_ppm_resize`
    * kernels. The oracle replays the PIXEL FORMULA (the q199 convention)
    * and never mentions filter, color type, interlace, or depth: any
    * defilter, deinterlace, or sample-width bug breaks the hash. */
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
        d % 6, (d % 2) * 2,
        (d % 4 >= 2).cast("long"), // interlace: none / Adam7
        lit(8L) + (d % 8 >= 4).cast("long") * 8)) // bit depth 8 / 16
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

  /** Unigram trainer EM round, catalog-anchored
    * ([[graft.operators.Unigram.train]] — closes the "seed stage only"
    * gap next to q208): the fixture is built so the Viterbi segmentation
    * is ANALYTICALLY FORCED, which lets a SQL oracle replay what no SQL
    * engine can compute in general (the DP). Construction: four
    * CHARACTER-DISJOINT pieces `ab cd ef gh`; each doc's word is the
    * concatenation of three pieces chosen by `doc_id` digits
    * (`d%4, d//4%4, d//16%4`). With `maxLen = 2` the seed holds only
    * 1/2-grams; each intended piece occurs ≥ 148 times while ANY
    * cross-boundary 2-gram (last-char × first-char, 16 possible) occurs
    * ≤ ~26, so the top-4 multi-char cut (`vocabSize = 12` − 8 chars)
    * keeps exactly the four pieces. Inside a word, vocabulary 2-grams
    * then exist ONLY at even offsets (disjointness kills every other
    * substring), so each piece slot independently chooses piece vs two
    * chars — and `log p(piece) > log p(c1) + log p(c2)` by orders of
    * magnitude, so the full tiling wins every slot: segment counts ARE
    * the slot counts, chars count 0. Round 2 re-derives the same
    * vocabulary from those counts (a fixed point), so `iterations = 2`
    * proves the loop, not just one pass. The oracle replays the slot
    * arithmetic; `score` (a transcendental log) is excluded per the
    * engine-portability convention — `cnt` is the exact anchor. */
  val q210UnigramTrain: (String, QueryDef) = q(
    "q210_unigram_train",
    """WITH p AS (SELECT doc_id FROM documents WHERE doc_id < 200),
      |s AS (SELECT doc_id, unnest([doc_id % 4, (doc_id // 4) % 4,
      |         (doc_id // 16) % 4]) AS slot FROM p),
      |pc AS (SELECT ['ab','cd','ef','gh'][CAST(slot AS INT) + 1] AS piece,
      |         COUNT(*) AS cnt FROM s GROUP BY 1),
      |ch AS (SELECT unnest(['a','b','c','d','e','f','g','h']) AS piece,
      |         0 AS cnt)
      |SELECT piece, CAST(cnt AS BIGINT) AS cnt
      |FROM (SELECT * FROM ch UNION ALL SELECT * FROM pc)
      |ORDER BY piece""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val pieces = Seq("ab", "cd", "ef", "gh")
    val pieceAt = (slot: org.apache.spark.sql.Column) =>
      element_at(typedlit(pieces), (slot + 1).cast("int"))
    val docs = t("documents").filter(d < 200)
      .select(concat(
        pieceAt(d % 4),
        pieceAt(expr("doc_id div 4") % 4),
        pieceAt(expr("doc_id div 16") % 4)).as("t"))
    graft.operators.Unigram.train(docs, "t",
        maxLen = 2, vocabSize = 12, iterations = 2)
      .select(col("piece"), col("cnt"))
      .orderBy(col("piece"))
  }

  /** Baseline JPEG decode round trip ([[graft.expressions.JpegRaster]] —
    * r12 closes the last high-frequency codec stub): synthesize a
    * block-constant baseline JPEG per document (gray/YCbCr by `doc_id`
    * parity — DC-only blocks at quant 8 make the LOSSY codec's decode
    * EXACT, see JpegRaster.synth), decode with the zero-dependency
    * Huffman+IDCT kernel, and hash with the existing `graft_ppm_phash` /
    * `graft_ppm_resize` kernels. The oracle replays the BLOCK formula
    * `v = ((x//8)·a + (y//8)·b) mod 256` and never mentions the codec:
    * any Huffman, dequant, IDCT, or color-transform bug breaks the
    * hash. */
  val q211JpegPhash: (String, QueryDef) = q(
    "q211_jpeg_phash",
    """WITH p AS (
      |  SELECT doc_id, 16 + doc_id % 37 AS w, 12 + (doc_id*3) % 31 AS h,
      |         1 + doc_id % 7 AS a, 1 + doc_id % 11 AS b
      |  FROM documents WHERE doc_id < 150),
      |xs AS (SELECT p.*, unnest(generate_series(0, w-1)) AS x FROM p),
      |px AS (SELECT doc_id, w, h, a, b, x,
      |         unnest(generate_series(0, h-1)) AS y FROM xs),
      |v AS (SELECT doc_id, w, h, x, y,
      |        ((x//8)*a + (y//8)*b) % 256 AS v,
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
    val ppm = call_function("graft_jpeg_to_ppm",
      call_function("graft_synth_jpeg",
        lit(16L) + d % 37, lit(12L) + (d * 3) % 31,
        lit(1L) + d % 7, lit(1L) + d % 11,
        (d % 2) * 2))
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

  val catalog: Seq[(String, QueryDef)] =
    Seq(q209PngPhash, q210UnigramTrain, q211JpegPhash)
}

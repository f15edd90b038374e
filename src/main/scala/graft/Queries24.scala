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
    * mode), both gray/RGB color types, both interlace modes, and (r12)
    * EVERY gray bit depth — 8/16 (a 16-bit sample's high byte carries
    * the formula value) and the sub-byte depths 4/2/1 (the synth
    * quantizes to d bits, the decode re-expands by the spec's exact
    * 255/(2^d−1) factor, and the oracle replays that CASE) — then
    * decode with the
    * zero-dependency Inflater+defilter kernel into the P5/P6 interchange
    * form and hash with the EXISTING `graft_ppm_phash` / `graft_ppm_resize`
    * kernels. The oracle replays the PIXEL FORMULA (the q199 convention)
    * and never mentions filter, color type, interlace, or depth: any
    * defilter, deinterlace, or sample-width bug breaks the hash. */
  val q209PngPhash: (String, QueryDef) = q(
    "q209_png_phash",
    """WITH p AS (
      |  SELECT doc_id, 16 + doc_id % 37 AS w, 12 + (doc_id*3) % 31 AS h,
      |         1 + doc_id % 7 AS a, 1 + doc_id % 11 AS b,
      |         CASE WHEN doc_id % 2 = 0 THEN
      |           CASE (doc_id // 2) % 5 WHEN 0 THEN 8 WHEN 1 THEN 16
      |                WHEN 2 THEN 4 WHEN 3 THEN 2 ELSE 1 END
      |         ELSE 8 END AS dep
      |  FROM documents WHERE doc_id < 150),
      |xs AS (SELECT p.*, unnest(generate_series(0, w-1)) AS x FROM p),
      |px AS (SELECT doc_id, w, h, a, b, dep, x,
      |         unnest(generate_series(0, h-1)) AS y FROM xs),
      |v AS (SELECT doc_id, w, h, x, y,
      |        CASE dep WHEN 4 THEN (((x*a + y*b) % 256) // 16) * 17
      |                 WHEN 2 THEN (((x*a + y*b) % 256) // 64) * 85
      |                 WHEN 1 THEN (((x*a + y*b) % 256) // 128) * 255
      |                 ELSE (x*a + y*b) % 256 END AS v,
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
        // depth: gray docs sweep 8/16/4/2/1 (sub-byte is gray-only per
        // the spec's valid combinations), RGB docs keep 8; the oracle's
        // pixel CASE quantizes+re-expands by 255/(2^d−1) in lockstep
        when(d % 2 === 0,
          when(expr("doc_id div 2") % 5 === 0, 8L)
            .when(expr("doc_id div 2") % 5 === 1, 16L)
            .when(expr("doc_id div 2") % 5 === 2, 4L)
            .when(expr("doc_id div 2") % 5 === 3, 2L)
            .otherwise(1L))
          .otherwise(lit(8L))))
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

  /** JPEG decode round trip ([[graft.expressions.JpegRaster]] — r12
    * closes the last high-frequency codec stub): synthesize a
    * block-constant JPEG per document — gray/YCbCr by `doc_id` parity,
    * BASELINE (SOF0) or PROGRESSIVE (SOF2, multi-scan successive
    * approximation with EOB-run batching) by `doc_id` bit 1 — DC-only
    * blocks at quant 8 make the LOSSY codec's decode EXACT in both
    * framings (JpegRaster.synth), decode with the zero-dependency
    * Huffman+IDCT kernel, and hash with the existing `graft_ppm_phash` /
    * `graft_ppm_resize` kernels. The oracle replays the BLOCK formula
    * `v = ((x//8)·a + (y//8)·b) mod 256` and never mentions the codec or
    * the scan structure: any Huffman, dequant, IDCT, color-transform,
    * or progressive-scan bug breaks the hash. */
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
        // gray/YCbCr by parity; every other pair takes the PROGRESSIVE
        // (SOF2) framing of the same pixels (+4) — the oracle is frame-
        // agnostic because both framings decode bit-identically
        (d % 2) * 2 + (d % 4 >= 2).cast("long") * 4))
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

  /** FLAC decode round trip ([[graft.expressions.FlacPcm]] — the
    * LOSSLESS compressed-audio format, so unlike MP3/AAC the decode is
    * bit-exact by spec and an arithmetic oracle can hash it): synthesize
    * a standards-valid FLAC per document with `doc_id % 8` cycling
    * every encoding path the decoder owns — verbatim / fixed / LPC /
    * per-frame-cycle subframes × mono and all four stereo channel
    * assignments (independent, left/side, right/side, mid/side) — then
    * decode to the WAV interchange form and run the EXISTING
    * `graft_wav_pcm_stats` / `graft_audio_meta` kernels on it. The
    * oracle replays the SAMPLE FORMULA only (the q206 convention —
    * interleaving stereo channels arithmetically) and never mentions
    * subframe types, Rice coding, or CRCs: any prediction, residual,
    * decorrelation, or checksum bug breaks the hash. The first 8 docs
    * get ≥ 2944 samples = 6 frames at SynthBlock=576, so ALL six
    * per-frame cycle kinds (verbatim, fixed-1, fixed-2, lpc-2,
    * constant/wasted-bits, escaped-partition) appear in-anchor. */
  val q212FlacPcm: (String, QueryDef) = q(
    "q212_flac_pcm",
    """WITH p AS (
      |  SELECT doc_id,
      |    64 + (doc_id * 7) % 193 +
      |      CASE WHEN doc_id < 8 THEN 2880 ELSE 0 END AS n,
      |    251 + (doc_id * 37) % 997 AS a, (doc_id * 13) % 4096 AS b,
      |    CASE WHEN doc_id % 8 >= 4 THEN 2 ELSE 1 END AS ch
      |  FROM documents WHERE doc_id < 160),
      |s AS (
      |  SELECT doc_id, j,
      |    (((j // ch) * (a + 3 * (j % ch)) + b + 7 * (j % ch)) % 65536)
      |      - 32768 AS v
      |  FROM (SELECT p.*, unnest(generate_series(0,
      |          CAST(n * ch - 1 AS BIGINT))) AS j FROM p)),
      |sl AS (
      |  SELECT doc_id, j, v,
      |    LAG(v) OVER (PARTITION BY doc_id ORDER BY j) AS pv FROM s),
      |st AS (
      |  SELECT doc_id, COUNT(*) AS n_samples, MAX(ABS(v)) AS peak,
      |    SUM(ABS(v)) AS sum_abs, SUM(v * v) AS sum_sq,
      |    SUM(CASE WHEN pv IS NOT NULL AND ((v < 0) <> (pv < 0))
      |        THEN 1 ELSE 0 END) AS zero_crossings
      |  FROM sl GROUP BY doc_id)
      |SELECT p.doc_id AS doc_id, CAST(p.ch AS INT) AS channels,
      |  CAST(8000 AS INT) AS sample_rate,
      |  CAST((p.n * 1000) // 8000 AS BIGINT) AS duration_ms,
      |  CAST(st.n_samples AS BIGINT) AS n_samples,
      |  CAST(peak AS BIGINT) AS peak, CAST(sum_abs AS BIGINT) AS sum_abs,
      |  CAST(sum_sq AS BIGINT) AS sum_sq,
      |  CAST(zero_crossings AS BIGINT) AS zero_crossings
      |FROM p JOIN st USING (doc_id)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    implicit val env: (SparkSession, String) = (s, dir)
    val d = col("doc_id")
    val wav = call_function("graft_flac_to_wav",
      call_function("graft_synth_flac",
        lit(64L) + (d * 7) % 193 +
          when(d < 8, lit(2880L)).otherwise(lit(0L)),
        lit(8000L),
        lit(251L) + (d * 37) % 997, (d * 13) % 4096, d % 8))
    t("documents").filter(d < 160)
      .select(d,
        call_function("graft_audio_meta", wav).as("meta"),
        call_function("graft_wav_pcm_stats", wav).as("st"))
      .select(d, col("meta.channels").as("channels"),
        col("meta.sample_rate").as("sample_rate"),
        col("meta.duration_ms").as("duration_ms"),
        col("st.n_samples").as("n_samples"), col("st.peak").as("peak"),
        col("st.sum_abs").as("sum_abs"), col("st.sum_sq").as("sum_sq"),
        col("st.zero_crossings").as("zero_crossings"))
      .orderBy(d)
  }

  val catalog: Seq[(String, QueryDef)] =
    Seq(q209PngPhash, q210UnigramTrain, q211JpegPhash, q212FlacPcm)
}

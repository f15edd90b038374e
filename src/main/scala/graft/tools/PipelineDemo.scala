package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.core.GraftSession
import graft.dsl.SybilQuery
import graft.operators.Multimodal
import graft.sources.{GraftTable, Ingest}
import graft.streaming.Streams

/** Dev scratch: drive the full library surface end-to-end — ingest JSONL
  * with sybil coercions, digest into a GraftTable, query via the DSL,
  * streaming-digest a second directory, run the multimodal feature path.
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    import spark.implicits._

    // 1. JSON ingest with coercions
    val src = Files.createTempDirectory("demo-src")
    Files.writeString(src.resolve("batch1.jsonl"),
      (0 until 1000).map(i =>
        s"""{"host":"h${i % 5}","status":"${200 + (i % 3) * 100}","ping":${50 + i % 40}.7,"ok":${i % 2 == 0},"time":${1700000000L + i}}""")
        .mkString("\n"))
    val df = Ingest.readJson(spark, src.resolve("batch1.jsonl").toString)
    println("== ingested schema"); df.printSchema()

    // 2. table lifecycle
    val root = Files.createTempDirectory("demo-table")
    val table = new GraftTable(spark, root.toString)
    table.ingest(df)
    table.digest()
    println(s"== table info: ${table.info()}")

    // 3. sybil-style query over the digested table
    val q = SybilQuery().groupBy("host", "status").aggregate("ping")
      .withOp(graft.dsl.AggOp.AvgOp).intFilterGt("ping", 55).limitTo(5)
    q.run(table.read()).show(5, false)

    // 4. streaming digest of a second directory
    val src2 = Files.createTempDirectory("demo-stream")
    Files.writeString(src2.resolve("more.jsonl"),
      (1000 until 1500).map(i => s"""{"host":"h9","status":"500","ping":9,"ok":false,"time":${1700000000L + i}}""").mkString("\n"))
    val schema = StructType(Seq(StructField("host", StringType),
      StructField("status", StringType), StructField("ping", LongType),
      StructField("ok", LongType), StructField("time", LongType)))
    Streams.digestStream(spark, src2.toString, table,
      Files.createTempDirectory("demo-ckpt").toString, schema)
    println(s"== after streaming digest: rows=${table.info().rowCount}")
    require(table.info().rowCount == 1500, "expected 1500 rows after streaming digest")

    // 5. multimodal feature path
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize((0L until 50L).map(i =>
        Row(i, "image", Array.tabulate[Byte](64)(j => ((i + j) % 256).toByte),
          Row(64, 64, null))), 4),
      Multimodal.mediaSchema)
    val feats = Multimodal.extractFeatures(Multimodal.filterValid(media))
    feats.select(col("media_id"), col("features")).show(3, false)
    require(feats.count() == 50)

    // 6. crawl path (r13): WARC bytes → records → HTML text + outlinks →
    //    boilerplate filter — the pre-ingest hop of a training-data run
    val pages = (0L until 40L).map { i =>
      val body =
        if (i % 4 == 0) "<div>" + ("""<a href="/u">w</a> """ * 6) + "</div>"
        else s"""<p>article $i body text</p><a href="/r?a=1&amp;i=$i">ref</a>"""
      val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
      val warc = s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: " +
        s"<http://ex${i % 3}.test/p$i>\r\nContent-Length: ${http.length}" +
        s"\r\n\r\n$http\r\n\r\n"
      (i, warc.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    }.toDF("page_id", "payload")
    val recs = Multimodal.warcRecords(pages)
      .select(col("page_id"), col("warc_rec.uri").as("uri"),
        col("warc_rec.body").cast("string").as("html"))
    val kept2 = graft.operators.HtmlExtract.dropBoilerplate(recs, "html",
      maxLinkDensity = 0.5)
    val nKept = kept2.count()
    require(nKept == 30, s"expected 30 non-boilerplate pages, got $nKept")
    val outEdges = graft.operators.HtmlExtract.outlinks(kept2, "html")
      .select(call_function("graft_canon_url",
        concat(lit("http://ex.test"), col("href"))).as("canon"))
      .groupBy("canon").count()
    require(outEdges.count() == 30, "expected 30 distinct canonical outlinks")
    println("== crawl path: 40 pages -> 30 articles, link farm dropped")

    // 7. index tier (r17): per-record gzip members → buildIndex over the
    //    COMPRESSED archives (member-coordinate offsets) → revisit
    //    collapse → member-sliced replay → curation — the archive-backed
    //    production shape, one plan
    def warcRec(i: Long, date: String, extra: String, http: String) =
      s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Date: $date\r\n$extra" +
        s"WARC-Target-URI: <http://idx.test/p$i>\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n$http\r\n\r\n"
    val idxPages = (0L until 30L).map { i =>
      val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
        s"<p>indexed article $i with plenty of prose words here</p>"
      (s"a${i % 3}.warc.gz", i,
        warcRec(i, "2026-01-01T00:00:00Z", "", http)
          .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    }.toDF("filename", "rnk", "rec")
    val gzArchives = idxPages
      .withColumn("member", call_function("graft_gzip", col("rec")))
      .groupBy(col("filename"))
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("rnk"), col("member")))),
          x => x.getField("member")),
        lit(Array.emptyByteArray), (acc, x) => concat(acc, x))
        .as("payload"))
    val index7 = graft.operators.Crawl.buildIndex(gzArchives)
    val collapsed7 = graft.operators.Crawl.collapseRevisits(index7)
      .filter(col("status") === 200)
    val curated7 = graft.operators.Crawl.cleanCorpus(
      graft.operators.Crawl.fetchRecords(
        collapsed7.select(col("filename"), col("offset"), col("length")),
        gzArchives, sliceCol = "rec_bytes")
        .select(col("rec_bytes")),
      payloadCol = "rec_bytes", minTextBytes = 10L)
    val nCurated = curated7.count()
    require(nCurated == 30, s"expected 30 replayed articles, got $nCurated")
    println("== index tier: 30 gzip members -> index -> replay -> corpus")

    println("PIPELINE DEMO OK")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal binary-column plumbing: schema, batched feature extraction,
  * frame sampling, validity filtering. The decode itself is a deterministic
  * stub (no codecs here); the Spark-side path is real. */
class MultimodalSpec extends SparkSpec {

  private lazy val media = {
    val rows = (0L until 200L).map { i =>
      val payload =
        if (i % 17 == 0) null
        else Array.tabulate[Byte]((i % 50 + 10).toInt)(j => ((i * 31 + j) % 256).toByte)
      Row(i, if (i % 3 == 0) "image" else "audio", payload,
        Row(if (i % 3 == 0) 640 else null, if (i % 3 == 0) 480 else null,
          if (i % 3 == 0) null else java.lang.Long.valueOf(i * 1000)))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), Multimodal.mediaSchema)
  }

  test("extractFeatures appends an 8-dim float vector per row, distributed") {
    val out = Multimodal.extractFeatures(Multimodal.filterValid(media))
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val f = r.getAs[collection.Seq[Float]]("features")
      assert(f.length === 8)
      assert(math.abs(f.sum - 1.0f) < 1e-3) // byte histogram normalizes to 1
    }
    // deterministic: same input → same features
    val again = Multimodal.extractFeatures(Multimodal.filterValid(media)).collect()
    assert(rows.map(_.getAs[collection.Seq[Float]]("features")).toSeq ===
      again.map(_.getAs[collection.Seq[Float]]("features")).toSeq)
  }

  test("sampleFrames slices payload into n non-empty frames") {
    val out = Multimodal.sampleFrames(Multimodal.filterValid(media), 4)
    out.collect().foreach { r =>
      val frames = r.getAs[collection.Seq[Array[Byte]]]("frames")
      assert(frames.length === 4)
      val payload = r.getAs[Array[Byte]]("payload")
      assert(frames.forall(_.nonEmpty))
      // first frame starts at the payload start
      assert(frames.head.head === payload.head)
    }
  }

  test("filterValid drops null payloads and keeps dimensioned images") {
    val kept = Multimodal.filterValid(media)
    assert(kept.filter(col("payload").isNull).count() === 0)
    assert(kept.count() < media.count())
    assert(kept.filter(col("kind") === "image").count() > 0)
  }
}

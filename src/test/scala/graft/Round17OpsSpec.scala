package graft

import org.apache.spark.sql.functions._

/** Round-10 hardening: chunked cusum densification, span caps. */
class Round17OpsSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Events

  test("cusumChangepoint: chunked densify is seamless across 64Ki block " +
      "boundaries and for negative bucket ids") {
    // spans straddling the shiftright(_,16) block edges: 65530..65545
    // (block 0→1) and -6..+9 (block -1→0). n_buckets must be the full
    // span and totals must survive the two-level explode.
    val rows = (
      (65530L to 65545L by 5L).map(b => ("hi", b * 60L)) ++
      (-6L to 9L by 5L).map(b => ("neg", b * 60L))
    ).toDF("label", "ts")
    val r = Events.cusumChangepoint(rows, "label", col("ts"),
      bucketSec = 60L, h = 2L).collect()
      .map(x => x.getAs[String]("label") ->
        (x.getAs[Long]("n_buckets"), x.getAs[Long]("total"))).toMap
    assert(r("hi") === ((16L, 4L)), "65530..65545 = 16 buckets, 4 events")
    assert(r("neg") === ((16L, 4L)), "-6..9 = 16 buckets, 4 events")
  }

  test("marginMiningLsh == exact marginMining when one bucket holds " +
      "everything (candidate set = cross product)") {
    import graft.operators.Similarity
    // near-parallel positive vectors: every plane projection keeps the
    // direction's sign, so ALL vectors share one LSH bucket and the
    // candidate join IS the |S|x|T| cross product — the LSH path must
    // then reproduce the exact form's ranking (shared marginScore tail)
    val dims = 8
    val base = (0 until dims).map(_ => 1.0f)
    val rows = (0 until 12).map { j =>
      val v = base.zipWithIndex.map { case (x, d) =>
        x * (1.0f + 0.05f * j) + (if (d == j % dims) 0.01f * j else 0f)
      }
      (j.toLong, v, j % 2)
    }.toDF("vec_id", "embedding", "label")
    val exact = Similarity.marginMining(rows, "vec_id", "embedding",
      "label", srcLabel = 0, tgtLabel = 1, kNeigh = 2, topK = 20)
    val lsh = Similarity.marginMiningLsh(rows, "vec_id", "embedding",
      "label", srcLabel = 0, tgtLabel = 1, kNeigh = 2, topK = 20,
      planes = 4, seed = 42, dims = dims)
    // single-bucket precondition (else the fixture, not the code, failed)
    val buckets = Similarity.lshBuckets(rows, "vec_id", "embedding",
      planes = 4, seed = 42, dims = dims)
      .select("bucket").distinct().count()
    assert(buckets === 1L, "fixture must collapse to one bucket")
    val e = exact.collect().map(r => (r.getLong(0), r.getLong(1)))
    val l = lsh.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(e.toSeq === l.toSeq, "identical candidate set -> identical ranking")
  }

  test("hammingNearDupPairs: signed narrow hashes mask to the declared " +
      "width; bits=64 single-band stays correct") {
    import graft.operators.Dedup
    // 0x80000000 as a signed int sign-extends through cast('long'); the
    // declared 32-bit width must judge hamming on the masked value
    // (true distance 1), not the sign-extended 64-bit pattern (33)
    val narrow = Seq((1L, 0x80000000.toInt), (2L, 0)).toDF("id", "h")
    val got = Dedup.hammingNearDupPairs(narrow, "id", "h",
      bits = 32, maxHamming = 1).collect()
    assert(got.length === 1 && got(0).getAs[Long]("hamming") === 1L)
    // bits=64, maxHamming=0: the (1L<<64) wrap must not zero the band
    // mask; exact duplicates pair, near-misses don't
    val wide = Seq((1L, 42L), (2L, 42L), (3L, 43L)).toDF("id", "h")
    val dup = Dedup.hammingNearDupPairs(wide, "id", "h",
      bits = 64, maxHamming = 0).collect()
    assert(dup.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 2L)))
  }

  test("cusumChangepoint: a span past maxSpanBuckets aborts loudly") {
    val rows = Seq(("svc", 0L), ("svc", 100L * 60L)).toDF("label", "ts")
    val e = intercept[Exception] {
      Events.cusumChangepoint(rows, "label", col("ts"), bucketSec = 60L,
        h = 2L, maxSpanBuckets = 50L).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " " + msgs(t.getCause)
    assert(msgs(e).contains("maxSpanBuckets"))
  }
}

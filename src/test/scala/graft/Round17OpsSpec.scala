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

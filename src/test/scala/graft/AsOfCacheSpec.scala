package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.dsl.{AggOp, SybilQuery}
import graft.operators.AsOfJoin
import graft.sources.{GraftTable, QueryCache}

/** As-of join semantics + the timestamp-resistant per-block query cache. */
class AsOfCacheSpec extends SparkSpec {
  import spark.implicits._

  test("asof backward: greatest right time <= left time per key") {
    val left = Seq(("a", 5L, 100L), ("a", 10L, 101L), ("a", 3L, 102L), ("b", 3L, 103L))
      .toDF("k", "t", "lid")
    val right = Seq(("a", 4L, "x"), ("a", 10L, "y"), ("b", 99L, "z"))
      .toDF("k2", "t2", "v")
    val out = AsOfJoin.backward(left, right, "k", "k2", "t", "t2", Seq("v"))
      .select(col("lid"), col("v")).collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out === Map(100L -> "x", 101L -> "y")) // equal time matches; (a,3) and (b,3) have no prior right row
  }

  test("query cache: hits on rolling time filters, exact results, zone-map skip") {
    val root = Files.createTempDirectory("graft-qc").toString
    val t = new GraftTable(spark, root)
    // three blocks with disjoint time ranges: [0,999], [1000,1999], [2000,2999]
    for (b <- 0 until 3) {
      t.ingest((0 until 1000).map(i =>
        (s"k${i % 4}", (b * 1000 + i).toLong, (i % 50).toLong)).toDF("k", "time", "v"))
      t.digest()
    }
    assert(t.blockIds.size === 3)
    val cache = new QueryCache(spark, t)

    def q(cutoff: Long) = SybilQuery().groupBy("k").aggregate("v")
      .withOp(AggOp.AvgOp).intFilterGt("time", cutoff).limitTo(100)

    // cutoff 500: block0 partial, blocks 1+2 fully covered → 2 misses
    val (r1, o1) = cache.run(q(500))
    assert(o1 === graft.sources.CacheOutcome(hits = 0, misses = 2, uncacheable = 1, skipped = 0))
    // rolling cutoff 700: blocks 1+2 still fully covered → 2 HITS (resistance)
    val (r2, o2) = cache.run(q(700))
    assert(o2.hits === 2 && o2.misses === 0 && o2.uncacheable === 1)
    // cutoff 2500: blocks 0,1 always-false → skipped; block2 partial
    val (_, o3) = cache.run(q(2500))
    assert(o3.skipped === 2 && o3.uncacheable === 1 && o3.hits === 0)

    // exactness vs the uncached DSL on the same data
    val direct = q(700).run(t.read()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3))).sortBy(_._1)
    val cached = r2.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3))).sortBy(_._1)
    assert(direct === cached)
  }

  test("query cache: weighted avg partials merge exactly") {
    val root = Files.createTempDirectory("graft-qc2").toString
    val t = new GraftTable(spark, root)
    for (b <- 0 until 2) {
      t.ingest((0 until 500).map(i =>
        (s"k${i % 3}", (b * 500 + i).toLong, (i % 20).toLong, (i % 5 + 1).toLong))
        .toDF("k", "time", "v", "w"))
      t.digest()
    }
    val cache = new QueryCache(spark, t)
    val q = SybilQuery().groupBy("k").aggregate("v").weighted("w")
      .withOp(AggOp.AvgOp).limitTo(10)
    val (res, _) = cache.run(q)
    val direct = q.run(t.read())
    val a = res.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3))).sortBy(_._1)
    val b = direct.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3))).sortBy(_._1)
    assert(a === b)
  }
}

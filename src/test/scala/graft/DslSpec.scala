package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.dsl.{AggOp, SybilQuery}

/** DSL semantics, replicating the reference's unit-test scheme
  * (/root/reference/src/lib/aggregate_test.go, filter_test.go, and the
  * helpers_test.go synthetic table: id / age / age_str / age_set / time —
  * FIXTURES.md §1): group-by a stringified copy of the agg column so the
  * query is self-checking.
  */
class DslSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = {
    val rnd = new scala.util.Random(42)
    val now = 1700000000L
    (0 until 2000).map { i =>
      val age = rnd.nextInt(20) + 10
      val time = now - rnd.nextInt(50 * 3600)
      (i.toLong, age.toLong, age.toString, Seq(age.toString), time,
        (rnd.nextInt(3) * 10 + 1).toLong)
    }.toDF("id", "age", "age_str", "age_set", "time", "weight")
  }

  test("group-by avg is self-consistent: avg(age) over group age_str == age_str") {
    // aggregate_test.go:58-91
    val rows = SybilQuery().groupBy("age_str").aggregate("age")
      .withOp(AggOp.AvgOp).limitTo(100).run(df).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      assert(r.getAs[Double]("age_avg") === r.getAs[String]("age_str").toDouble)
    }
  }

  test("filters: eq/neq/lt/gt counts (filter_test.go:108-115 scheme)") {
    def cnt(q: SybilQuery): Long =
      q.withOp(AggOp.CountOp).limitTo(1000).run(df)
        .agg(sum("Count")).collect()(0).getLong(0)
    val all = df.count()
    val eq20 = cnt(SybilQuery().groupBy("age_str").intFilterEq("age", 20))
    val neq20 = cnt(SybilQuery().groupBy("age_str").intFilterNeq("age", 20))
    assert(eq20 + neq20 === all)
    assert(SybilQuery().groupBy("age_str").intFilterNeq("age", 20)
      .limitTo(1000).run(df).count() === 19)
    val lt = cnt(SybilQuery().intFilterLt("age", 20))
    val gt = cnt(SybilQuery().intFilterGt("age", 20))
    assert(lt + gt + eq20 === all)
    // str + regex filters agree with int filters on the mirrored column
    assert(cnt(SybilQuery().strFilterEq("age_str", "20")) === eq20)
    assert(cnt(SybilQuery().strFilterRe("age_str", "^2")) ===
      cnt(SybilQuery().intFilterGt("age", 19)))
    assert(cnt(SybilQuery().strFilterNre("age_str", "^2")) ===
      cnt(SybilQuery().intFilterLt("age", 20)))
    // set membership
    assert(cnt(SybilQuery().setFilterIn("age_set", "20")) === eq20)
    assert(cnt(SybilQuery().setFilterNin("age_set", "20")) === neq20)
  }

  test("missing values fail every filter and group as empty string") {
    // filter.go:172-174; aggregate.go:305-313
    val withNulls = df.withColumn("age",
      when(col("id") % 2 === 0, col("age"))) // odd ids → null age
      .withColumn("age_str", when(col("id") % 2 === 0, col("age_str")))
    val evens = withNulls.filter(col("id") % 2 === 0).count()
    assert(SybilQuery().intFilterGt("age", 0).limitTo(10000)
      .run(withNulls).agg(sum("Count")).collect()(0).getLong(0) === evens)
    // neq also fails on missing (no null-rescue)
    assert(SybilQuery().intFilterNeq("age", -1).limitTo(10000)
      .run(withNulls).agg(sum("Count")).collect()(0).getLong(0) === evens)
    val groups = SybilQuery().groupBy("age_str").limitTo(1000)
      .run(withNulls).collect()
    val empty = groups.find(_.getAs[String]("age_str") == "")
    assert(empty.isDefined && empty.get.getAs[Long]("Count") === df.count() - evens)
  }

  test("weighted count: Count=sum(weight), Samples=rows (aggregate.go:68,100-102)") {
    val r = SybilQuery().weighted("weight").limitTo(10).run(df).collect()(0)
    val wsum = df.agg(sum("weight")).collect()(0).getLong(0)
    assert(r.getAs[Long]("Count") === wsum)
    assert(r.getAs[Long]("Samples") === df.count())
  }

  test("time series buckets are aligned, non-empty, and partition the data") {
    // aggregate_test.go:227-239
    val bucket = 3600L
    val rows = SybilQuery().timeSeries("time", bucket).limitTo(1000)
      .run(df).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("time_bucket") % bucket === 0))
    assert(rows.map(_.getAs[Long]("Count")).sum === df.count())
  }

  test("time filters are floored to the bucket boundary (filter.go:86-95)") {
    val bucket = 3600L
    val cutoff = 1700000000L - 7 * 3600 + 1234 // not aligned
    val aligned = cutoff / bucket * bucket
    val got = SybilQuery().timeSeries("time", bucket)
      .intFilterGt("time", cutoff).limitTo(10000).run(df)
      .agg(sum("Count")).collect()(0).getLong(0)
    assert(got === df.filter(col("time") > aligned).count())
  }

  test("order by $COUNT desc default; -sort-asc flips (aggregate.go:33-54)") {
    val desc = SybilQuery().groupBy("age_str").limitTo(100).run(df)
      .collect().map(_.getAs[Long]("Count"))
    assert(desc.zip(desc.tail).forall { case (a, b) => a >= b })
    val asc = SybilQuery().groupBy("age_str").ascending.limitTo(100).run(df)
      .collect().map(_.getAs[Long]("Count"))
    assert(asc.zip(asc.tail).forall { case (a, b) => a <= b })
  }

  test("limit and samples mode") {
    assert(SybilQuery().groupBy("age_str").limitTo(5).run(df).count() === 5)
    val s = SybilQuery().takeSamples("id", "age", "time").limitTo(7)
      .intFilterGt("age", 15).run(df).collect()
    assert(s.length === 7)
    // newest first
    val times = s.map(_.getAs[Long]("time"))
    assert(times.zip(times.tail).forall { case (a, b) => a >= b })
    assert(s.forall(_.getAs[Long]("age") > 15))
  }

  test("sample sort by arbitrary column (printer.go:388-414 -sort)") {
    // default: newest-first by the time column (above); with -sort, by the
    // named column — desc by default, -sort-asc flips
    val byAge = SybilQuery().takeSamples("id", "age", "time").sort("age")
      .limitTo(10).run(df).collect().map(_.getAs[Long]("age"))
    assert(byAge.zip(byAge.tail).forall { case (a, b) => a >= b })
    val asc = SybilQuery().takeSamples("id", "age", "time").sort("age").ascending
      .limitTo(10).run(df).collect().map(_.getAs[Long]("age"))
    assert(asc.zip(asc.tail).forall { case (a, b) => a <= b })
  }

  test("str-replace rewrites before grouping (table_query.go:34-51)") {
    val rows = SybilQuery().replace("age_str", "^1", "X").groupBy("age_str")
      .limitTo(100).run(df).collect()
    val keys = rows.map(_.getAs[String]("age_str")).toSet
    assert(keys.forall(k => k.startsWith("X") || k.startsWith("2")))
    assert(keys.count(_.startsWith("X")) === 10)
  }

  test("distinct op: exact and approximate within HLL tolerance") {
    val exact = SybilQuery().distinct("age_str")
      .withOp(AggOp.DistinctOp(exact = true)).limitTo(10).run(df)
      .collect()(0).getAs[Long]("Distinct")
    assert(exact === 20)
    val approx = SybilQuery().distinct("age_str").limitTo(10).run(df)
      .collect()(0).getAs[Long]("Distinct")
    assert(math.abs(approx - 20) <= 2) // HLL rsd default 5%
  }

  test("hist op end-to-end per group") {
    val rows = SybilQuery().groupBy("age_str").aggregate("age")
      .withOp(AggOp.HistOp).limitTo(100).run(df).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val h = r.getAs[Row]("age_hist")
      val expected = r.getAs[String]("age_str").toLong
      assert(h.getAs[Double]("mean") === expected.toDouble)
      assert(h.getAs[Long]("min") === expected)
      assert(h.getAs[Long]("max") === expected)
      val pcts = h.getAs[collection.Seq[Long]]("percentiles")
      assert(pcts(25) === expected && pcts(50) === expected && pcts(75) === expected)
    }
  }

  test("null discipline: hist skips unpopulated rows, avg divides by the " +
      "populated weight, approx distinct excludes any-null tuples") {
    val nd = Seq(
      ("g", Some(10L), Some("a"), Some("x")),
      ("g", Some(20L), Some("a"), None),
      ("g", None, None, Some("x")),   // unpopulated v
      ("g", Some(30L), Some("b"), Some("y")))
      .toDF("g", "v", "s1", "s2")
    // hist: sybil skips unpopulated records per column
    // (aggregate.go:246-259) — a null must not crash the typed aggregator
    // nor pollute min/count
    val h = SybilQuery().groupBy("g").aggregate("v")
      .withOp(AggOp.HistOp).limitTo(10).run(nd).collect()(0)
      .getAs[Row]("v_hist")
    assert(h.getAs[Long]("count") === 3L && h.getAs[Long]("min") === 10L)
    assert(h.getAs[Double]("mean") === 20.0)
    // avg: the populated-rows denominator (20, not 15 over 4 rows)
    val a = SybilQuery().groupBy("g").aggregate("v")
      .withOp(AggOp.AvgOp).limitTo(10).run(nd).collect()(0)
    assert(a.getAs[Double]("v_avg") === 20.0)
    assert(a.getAs[Long]("Count") === 4L, "Count stays the group weight")
    // approx distinct matches exact on null-tuple handling: ('a', null)
    // and (null, 'x') are excluded by both, not conflated
    val exact = SybilQuery().distinct("s1", "s2")
      .withOp(AggOp.DistinctOp(exact = true)).limitTo(10).run(nd)
      .collect()(0).getAs[Long]("Distinct")
    val approx = SybilQuery().distinct("s1", "s2").limitTo(10).run(nd)
      .collect()(0).getAs[Long]("Distinct")
    assert(exact === 2L && approx === 2L)
    // hist queries sort by the hist mean (reference aggregate.go:51-52)
    val sorted = SybilQuery().groupBy("age_str").aggregate("age")
      .withOp(AggOp.HistOp).sort("age").ascending.limitTo(3).run(df)
      .collect().map(_.getAs[Row]("age_hist").getAs[Double]("mean"))
    assert(sorted.toSeq === sorted.sorted.toSeq && sorted.head === 10.0)
  }

  test("tdigest hist flavor: percentiles within sketch tolerance of exact") {
    // the -tdigest flavor of the hist op (hist_tdigest.go) mapped onto
    // percentile_approx: same output surface, quantiles from the
    // mergeable sketch. At accuracy 10000 the rank error bound is
    // 1/10000, far under one value step on this fixture, so every
    // reported percentile must equal the exact one.
    val rows = SybilQuery().aggregate("age").tDigestHistogram
      .limitTo(10).run(df).collect()
    assert(rows.length === 1)
    val h = rows(0).getAs[Row]("age_hist")
    assert(h.getAs[Long]("count") === 2000L)
    assert(h.getAs[Long]("samples") === 2000L)
    assert(h.getAs[Double]("stddev") === 0.0, "hist_tdigest.go:93-95 surface")
    val pcts = h.getAs[collection.Seq[Long]]("percentiles")
    assert(pcts.length === 100)
    val exact = df.stat.approxQuantile("age", (0 until 100).map(_ / 100.0).toArray, 0.0)
    for (i <- 0 until 100)
      assert(pcts(i) === exact(i).toLong, s"p$i")
    // mean mirrors the reference's Quantile(0.5) quirk
    assert(h.getAs[Double]("mean") === exact(50))
    assert(h.getAs[Long]("min") === df.agg(min("age")).head().getLong(0))
    assert(h.getAs[Long]("max") === df.agg(max("age")).head().getLong(0))
    // weighted + tdigest is a loud error, never a silently unweighted sketch
    intercept[IllegalArgumentException] {
      SybilQuery().aggregate("age").weighted("weight")
        .tDigestHistogram.run(df).collect()
    }
  }

  test("tdigest count/samples are per-column POPULATED, not whole-group") {
    // hist_tdigest increments per added sample — a null-containing agg
    // column must not inherit the group's row count
    val nd = Seq[(String, java.lang.Long)](
      ("a", 1L), ("a", 2L), ("a", null), ("a", 4L), ("a", null))
      .toDF("g", "v")
    val r = SybilQuery().groupBy("g").aggregate("v").tDigestHistogram
      .limitTo(10).run(nd).collect()(0)
    assert(r.getAs[Long]("Count") === 5L && r.getAs[Long]("Samples") === 5L)
    val h = r.getAs[Row]("v_hist")
    assert(h.getAs[Long]("count") === 3L, "populated rows only")
    assert(h.getAs[Long]("samples") === 3L)
  }

  test("hist: negative integer weights fail LOUDLY, never the silent " +
      "sentinel path") {
    // finish()'s percentile walk / stddev / empty guard all assume
    // non-negative bucket masses — a -2 weight must abort with the
    // negative-weight message, not vanish into the null-row skip (which
    // would leave Count summing what hist dropped) and not crash the
    // percentile walk downstream
    val nd = Seq((10L, 3L), (10L, -2L), (20L, 5L)).toDF("v", "w")
    val e = intercept[Exception] {
      SybilQuery().aggregate("v").weighted("w")
        .withOp(AggOp.HistOp).limitTo(10).run(nd).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " " + msgs(t.getCause)
    assert(msgs(e).contains("negative weights"))
  }

  test("hist: a genuine zero-weight row is a real sample (not the null sentinel)") {
    // a zero weight adds no bucket weight but still counts toward
    // samples and min/max — only NULL agg values are skipped entirely
    val zd = Seq(
      (5L, 0L), (10L, 2L), (20L, 3L), (100L, 0L)) // (v, w)
      .toDF("v", "w")
    val r = SybilQuery().aggregate("v").weighted("w")
      .withOp(AggOp.HistOp).limitTo(10).run(zd).collect()(0)
    val h = r.getAs[Row]("v_hist")
    assert(h.getAs[Long]("samples") === 4L, "zero-weight rows are samples")
    assert(h.getAs[Long]("count") === 5L, "weights still sum to 5")
    assert(h.getAs[Long]("min") === 5L && h.getAs[Long]("max") === 100L,
      "zero-weight rows drive min/max")
  }

  test("hist: an ALL-zero-weight group keeps its samples and extents " +
      "(count 0, no mass statistics)") {
    // the empty-buffer guard must not zero a group whose rows are all
    // real but weightless — samples and observed min/max are data; only
    // mean/stddev/percentiles have no mass to stand on
    val zd = Seq((5L, 0L), (100L, 0L)).toDF("v", "w")
    val r = SybilQuery().aggregate("v").weighted("w")
      .withOp(AggOp.HistOp).limitTo(10).run(zd).collect()(0)
    val h = r.getAs[Row]("v_hist")
    assert(h.getAs[Long]("count") === 0L)
    assert(h.getAs[Long]("samples") === 2L, "weightless rows are samples")
    assert(h.getAs[Long]("min") === 5L && h.getAs[Long]("max") === 100L)
    assert(h.getAs[Double]("mean") === 0.0 &&
      h.getAs[Double]("stddev") === 0.0)
  }

  test("hist: a data weight of Long.MinValue cannot forge the null-row " +
      "sentinel — it rejects like every other negative") {
    val md = Seq((10L, 3L), (20L, Long.MinValue)).toDF("v", "w")
    val e = intercept[Exception] {
      SybilQuery().aggregate("v").weighted("w")
        .withOp(AggOp.HistOp).limitTo(10).run(md).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " " + msgs(t.getCause)
    assert(msgs(e).contains("negative weights"))
  }

  test("hist: a non-castable string agg value takes the null path, not bin 0") {
    // "populated" is judged on the CAST result: under non-ANSI (where
    // cast('xyz') nulls instead of throwing) the row must be skipped like
    // a null, not binned at value 0 with full weight. Under the default
    // ANSI mode the cast fails loudly — also correct; toggle it off to
    // exercise the silent path.
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val sd = Seq(("10"), ("20"), ("xyz"), ("30")).toDF("v")
      val r = SybilQuery().aggregate("v")
        .withOp(AggOp.HistOp).limitTo(10).run(sd).collect()(0)
      val h = r.getAs[Row]("v_hist")
      assert(h.getAs[Long]("samples") === 3L && h.getAs[Long]("count") === 3L)
      assert(h.getAs[Long]("min") === 10L, "no phantom 0 bin")
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }
}

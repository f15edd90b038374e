package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.dsl.{AggOp, IntFilter, QFilter, SetFilter, StrFilter, SybilQuery}

/** Seeded randomized differential test of the DSL: every random query runs
  * through `SybilQuery.run` AND through an independently-written naive
  * formulation (SQL-string predicates, decimal-cast sums instead of
  * graft_dsum, plain groupBy) — results must match as exact row multisets.
  * This is the API-fuzz role of the reference's api_test.go, with the
  * naive twin as the oracle instead of a recorded fixture.
  */
class DslFuzzSpec extends SparkSpec {
  import spark.implicits._

  // 2000 rows; nulls in every column kind; negative values; skewed groups
  private lazy val data: DataFrame = {
    val rnd = new scala.util.Random(1234)
    val rows = (0 until 2000).map { i =>
      val g1 = if (rnd.nextInt(10) == 0) null else ("abcde" (rnd.nextInt(5))).toString
      val g2 = if (rnd.nextInt(12) == 0) null else java.lang.Long.valueOf(rnd.nextInt(4).toLong)
      val v = if (rnd.nextInt(15) == 0) null
        else java.lang.Long.valueOf((rnd.nextInt(2001) - 1000).toLong)
      val w = java.lang.Long.valueOf((rnd.nextInt(5) + 1).toLong)
      val tags = if (rnd.nextInt(8) == 0) null
        else Seq.fill(rnd.nextInt(3))("t" + rnd.nextInt(4))
      (i.toLong, 1700000000L + i, g1, g2, v, w, tags)
    }
    rows.toDF("id", "time", "g1", "g2", "v", "w", "tags")
  }

  /** Independent re-derivation of the query semantics with different
    * mechanisms (SQL-string filters, decimal sums). */
  private def naive(df: DataFrame, q: SybilQuery): DataFrame = {
    var d = q.strReplace.foldLeft(df) { case (acc, (c, (pat, rep))) =>
      acc.withColumn(c, regexp_replace(col(c), pat, rep))
    }
    val aligned: Seq[QFilter] = q.timeBucket match {
      case Some(b) => q.filters.map {
        case IntFilter(c, o, v) if c == q.timeCol => IntFilter(c, o, v / b * b)
        case f => f
      }
      case None => q.filters
    }
    val preds = aligned.map {
      case IntFilter(c, "gt", v)  => s"$c > $v"
      case IntFilter(c, "lt", v)  => s"$c < $v"
      case IntFilter(c, "eq", v)  => s"$c = $v"
      case IntFilter(c, "neq", v) => s"$c != $v"
      case StrFilter(c, "eq", v)  => s"$c = '$v'"
      case StrFilter(c, "neq", v) => s"$c != '$v'"
      case StrFilter(c, "re", v)  => s"$c rlike '$v'"
      case StrFilter(c, "nre", v) => s"not ($c rlike '$v')"
      case SetFilter(c, "in", v)  => s"array_contains($c, '$v')"
      case SetFilter(c, "nin", v) => s"not array_contains($c, '$v')"
      case f => sys.error(s"unhandled $f")
    }
    preds.foreach(p => d = d.where(p))
    val w: Column = q.weightCol.map(col).getOrElse(lit(1L))
    val keys = q.timeBucket.map(b =>
        ((col(q.timeCol).cast(LongType) / b).cast(LongType) * b).as("time_bucket")).toSeq ++
      q.groups.map(g => coalesce(col(g).cast("string"), lit("")).as(g))
    def dsum(c: String): Column =
      sum(col(c).cast(DecimalType(38, 6)) * w).cast(DoubleType)
    val aggs: Seq[Column] = (q.op match {
      case AggOp.CountOp => Nil
      // per-column denominator: the average runs over records where the
      // column is POPULATED (sybil aggregate.go:246-259) — null rows are
      // not zeros
      case AggOp.AvgOp => q.aggCols.map(c => (dsum(c) /
        sum(when(col(c).isNotNull, w).otherwise(lit(0L)))).as(s"${c}_avg"))
      case AggOp.SumOp => q.aggCols.map(c => dsum(c).as(s"${c}_sum"))
      case AggOp.DistinctOp(true) =>
        val dc = (if (q.distinctCols.nonEmpty) q.distinctCols else q.aggCols).map(col)
        Seq(countDistinct(dc.head, dc.tail: _*).as("Distinct"))
      case other => sys.error(s"fuzz does not cover $other")
    })
    val all = Seq(sum(w).cast(LongType).as("Count"), count(lit(1)).as("Samples")) ++ aggs
    if (keys.nonEmpty) d.groupBy(keys: _*).agg(all.head, all.tail: _*)
    else d.agg(all.head, all.tail: _*)
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map {
      case null => "∅"
      case d: Double => java.lang.Double.toString(d) // bit-exact repr
      case x => x.toString
    }.mkString("|")).sorted.toSeq

  test("randomized differential: SybilQuery == naive twin over 60 seeded queries") {
    val rnd = new scala.util.Random(99)
    for (qi <- 0 until 60) {
      var q = SybilQuery().limitTo(1000000) // no truncation: compare full sets
      // random op
      q = rnd.nextInt(4) match {
        case 0 => q.withOp(AggOp.CountOp)
        case 1 => q.aggregate("v").withOp(AggOp.AvgOp)
        case 2 => q.aggregate("v").withOp(AggOp.SumOp)
        case 3 => q.distinct("g1").copy(op = AggOp.DistinctOp(exact = true))
      }
      // random groups
      rnd.nextInt(3) match {
        case 0 => ()
        case 1 => q = q.groupBy("g1")
        case 2 => q = q.groupBy("g1", "g2")
      }
      // random time bucket (the data's time col spans 2000 secs)
      if (rnd.nextInt(3) == 0) q = q.timeSeries("time", 300)
      // random weight
      if (rnd.nextBoolean()) q = q.weighted("w")
      // random str-replace before anything else sees g1
      if (rnd.nextInt(4) == 0) q = q.replace("g1", "a", "z")
      // 0-3 random filters
      for (_ <- 0 until rnd.nextInt(4)) {
        q = rnd.nextInt(7) match {
          case 0 => q.intFilterGt("v", rnd.nextInt(1200) - 600)
          case 1 => q.intFilterLt("v", rnd.nextInt(1200) - 600)
          case 2 => q.intFilterNeq("g2", rnd.nextInt(4))
          case 3 => q.strFilterEq("g1", ("abcdez" (rnd.nextInt(6))).toString)
          case 4 => q.strFilterRe("g1", "[abz]")
          case 5 => q.setFilterIn("tags", "t" + rnd.nextInt(4))
          case 6 => q.setFilterNin("tags", "t" + rnd.nextInt(4))
        }
      }
      // time filters get bucket-aligned in both paths
      if (rnd.nextInt(4) == 0) q = q.intFilterGt("time", 1700000000 + rnd.nextInt(2000))
      val got = canon(q.run(data))
      val want = canon(naive(data, q))
      assert(got === want, s"query #$qi diverged: $q")
    }
  }
}

package graft.dsl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.functions.BasicHist

/** Aggregation operators of the reference engine (`-op`,
  * /root/reference/src/cmd/cmd_query.go:242-328). */
sealed trait AggOp
object AggOp {
  case object CountOp extends AggOp
  case object AvgOp extends AggOp
  case object SumOp extends AggOp
  case object HistOp extends AggOp
  /** count-distinct; exact=false → HLL (sybil's LogLogBeta path). */
  final case class DistinctOp(exact: Boolean = false) extends AggOp
}

/** One conjunct of the filter list. Missing column values (nulls) fail every
  * filter, including negated ones — sybil semantics
  * (/root/reference/src/lib/filter.go:172-174,200-202): SQL three-valued
  * logic already drops null comparisons, and we intentionally do NOT add
  * null-rescue for `neq`/`nre`/`nin`.
  */
sealed trait QFilter { def toColumn: Column }
final case class IntFilter(name: String, op: String, v: Long) extends QFilter {
  def toColumn: Column = op match {
    case "gt"  => col(name) > v
    case "lt"  => col(name) < v
    case "eq"  => col(name) === v
    case "neq" => col(name) =!= v
    case other => throw new IllegalArgumentException(s"int filter op $other")
  }
}
final case class StrFilter(name: String, op: String, v: String) extends QFilter {
  def toColumn: Column = op match {
    case "eq"  => col(name) === v
    case "neq" => col(name) =!= v
    case "re"  => col(name).rlike(v)
    case "nre" => !col(name).rlike(v)
    case other => throw new IllegalArgumentException(s"str filter op $other")
  }
}
final case class SetFilter(name: String, op: String, v: String) extends QFilter {
  def toColumn: Column = op match {
    case "in"  => array_contains(col(name), v)
    case "nin" => !array_contains(col(name), v)
    case other => throw new IllegalArgumentException(s"set filter op $other")
  }
}

/** Declarative query mirroring the reference's public query surface (the Go
  * client builder, /root/reference/src/api/cmd_query.go:37-152:
  * `Query().GroupBy(...).Aggregate(...).IntFilterGt(...).TimeSeries(...)`),
  * compiled to a single DataFrame expression tree so Catalyst gets the
  * whole plan (pushdown, pruning, partial aggregation — SURVEY.md §4).
  *
  * Intentionally NOT replicated from the reference: the lossy top-k prune
  * (aggregate.go:469-495) and the 100k group cap (aggregate.go:15) — Spark
  * computes exact results with bounded memory via spillable hash
  * aggregation, so the approximations would only lose correctness.
  */
final case class SybilQuery(
    groups: Seq[String] = Nil,
    aggCols: Seq[String] = Nil,
    op: AggOp = AggOp.CountOp,
    filters: Seq[QFilter] = Nil,
    distinctCols: Seq[String] = Nil,
    timeCol: String = "time",
    timeBucket: Option[Long] = None,
    weightCol: Option[String] = None,
    strReplace: Map[String, (String, String)] = Map.empty,
    sortBy: Option[String] = None, // None → $COUNT (sybil default)
    sortAsc: Boolean = false,
    limit: Option[Int] = Some(100),
    samples: Boolean = false,
    sampleCols: Seq[String] = Nil,
    histBuckets: Int = 1000,
    histExtents: Map[String, (Long, Long)] = Map.empty,
    useLogHist: Boolean = false,
    useNestedHist: Boolean = false,
    useTDigest: Boolean = false,
    distinctLimit: Option[Int] = None) {

  def groupBy(cols: String*): SybilQuery = copy(groups = groups ++ cols)
  def aggregate(cols: String*): SybilQuery = copy(aggCols = aggCols ++ cols)
  def withOp(o: AggOp): SybilQuery = copy(op = o)
  def intFilterGt(c: String, v: Long): SybilQuery = copy(filters = filters :+ IntFilter(c, "gt", v))
  def intFilterLt(c: String, v: Long): SybilQuery = copy(filters = filters :+ IntFilter(c, "lt", v))
  def intFilterEq(c: String, v: Long): SybilQuery = copy(filters = filters :+ IntFilter(c, "eq", v))
  def intFilterNeq(c: String, v: Long): SybilQuery = copy(filters = filters :+ IntFilter(c, "neq", v))
  def strFilterEq(c: String, v: String): SybilQuery = copy(filters = filters :+ StrFilter(c, "eq", v))
  def strFilterNeq(c: String, v: String): SybilQuery = copy(filters = filters :+ StrFilter(c, "neq", v))
  def strFilterRe(c: String, v: String): SybilQuery = copy(filters = filters :+ StrFilter(c, "re", v))
  def strFilterNre(c: String, v: String): SybilQuery = copy(filters = filters :+ StrFilter(c, "nre", v))
  def setFilterIn(c: String, v: String): SybilQuery = copy(filters = filters :+ SetFilter(c, "in", v))
  def setFilterNin(c: String, v: String): SybilQuery = copy(filters = filters :+ SetFilter(c, "nin", v))
  def distinct(cols: String*): SybilQuery = copy(distinctCols = cols, op = AggOp.DistinctOp())
  /** `-distinct-limit` (aggregate.go:19; table_query.go:259-280): short
    * the distinct query at `n` elements — returns the distinct KEY
    * tuples themselves (up to n, early-exit per scan partition via
    * [[graft.operators.Sampling.distinctSample]]), not counts. Which
    * tuples come back is scan-order dependent, as in the reference;
    * `n >= `#distinct is deterministic. */
  def distinctLimitTo(n: Int): SybilQuery =
    copy(op = AggOp.DistinctOp(), distinctLimit = Some(n))
  def timeSeries(col: String, bucketSecs: Long): SybilQuery =
    copy(timeCol = col, timeBucket = Some(bucketSecs))
  /** Designate the time column without turning on time-series bucketing
    * (sybil `-time-col`, cmd_query.go:39). */
  def timeColumn(col: String): SybilQuery = copy(timeCol = col)
  def weighted(col: String): SybilQuery = copy(weightCol = Some(col))
  def replace(col: String, pattern: String, replacement: String): SybilQuery =
    copy(strReplace = strReplace + (col -> (pattern, replacement)))
  def sort(col: String): SybilQuery = copy(sortBy = Some(col))
  def ascending: SybilQuery = copy(sortAsc = true)
  def limitTo(n: Int): SybilQuery = copy(limit = Some(n))
  def takeSamples(cols: String*): SybilQuery = copy(samples = true, sampleCols = cols)
  /** Supply known column extents for hist bucketing (the stored-IntInfo
    * path, table_column_info.go) — avoids the extent pre-scan entirely.
    * GraftTable.query injects its sidecar extents through this. */
  def withExtents(m: Map[String, (Long, Long)]): SybilQuery =
    copy(histExtents = histExtents ++ m)
  /** `-loghist` (cmd_query.go:45): hist op uses log-scaled buckets. */
  def logHistogram: SybilQuery = copy(op = AggOp.HistOp, useLogHist = true)
  /** The reference's TRUE `-loghist` structure — nested MultiHist with
    * halving subranges (hist_multi.go:223-257) — as a hist-op variant:
    * fine absolute resolution at the bottom of the range, cheap wide tail.
    */
  def nestedHistogram: SybilQuery = copy(op = AggOp.HistOp, useNestedHist = true)
  /** `-int-bucket` (cmd_query.go:52): hist bucket count override. */
  def bucketCount(n: Int): SybilQuery = copy(histBuckets = n)
  /** `-tdigest` (hist_tdigest.go): the hist op's quantile-sketch flavor,
    * mapped onto the engine's deterministic mergeable quantile summary
    * ([[graft.functions.QuantileBins]]: exact value map up to 8192
    * distinct, then fixed log-tick bins — no extent pre-scan, the same
    * role the reference's t-digest plays; the summary bytes differ by
    * design, and determinism is chosen over the randomized
    * t-digest/KLL/GK family so per-block cache partials merge to the
    * bit-identical single-pass answer). The output surface mirrors
    * hist_tdigest.go
    * faithfully, quirks included: `percentiles` = approx q(0.00..0.99)
    * (GetPercentiles, hist_tdigest.go:97-106), `mean` = the approx
    * MEDIAN (Mean() returns Quantile(0.5), hist_tdigest.go:62-64),
    * `min`/`max` = q(0)/q(1) (hist_tdigest.go:49-56), `stddev` = 0
    * (unimplemented there, hist_tdigest.go:93-95); `count`/`samples`
    * exact. Weighted queries must use the exact hist flavors —
    * Spark's sketch takes no weight, and a silently unweighted
    * quantile would be wrong, so the combination throws. */
  def tDigestHistogram: SybilQuery = copy(op = AggOp.HistOp, useTDigest = true)

  /** Compile and run against a table DataFrame. */
  def run(df: DataFrame): DataFrame = {
    // set (array) columns cannot be group-by keys — explicit rejection like
    // the reference (aggregate.go group-by only binds int/str columns; a
    // set key would need an explode the user must opt into)
    for (g <- groups; f <- df.schema.fields.find(_.name == g))
      if (f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
        throw new IllegalArgumentException(
          s"cannot group by set column '$g' (explode it first)")
    // str-replace pre-transform (table_query.go:34-51): rewrite the column
    // before any filter/group sees it.
    var d = strReplace.foldLeft(df) { case (acc, (c, (pat, rep))) =>
      acc.withColumn(c, regexp_replace(col(c), pat, rep))
    }

    // time-filter bucket alignment (filter.go:86-95): int filters on the
    // time column are floored to the bucket boundary.
    val aligned = timeBucket match {
      case Some(b) => filters.map {
        case IntFilter(c, o, v) if c == timeCol => IntFilter(c, o, v / b * b)
        case f => f
      }
      case None => filters
    }
    if (aligned.nonEmpty) d = d.filter(aligned.map(_.toColumn).reduce(_ && _))

    if (samples) {
      // `-samples` (table_query.go:96-103; printer.go:388-455): newest
      // first by default, or by an arbitrary column when `-sort` is set
      // (printer.go:388-414 SortBlocksByCol). Remaining columns break ties
      // so the result is fully deterministic (the reference's block order is
      // not; exactness wins for the oracle gate).
      val names = if (sampleCols.nonEmpty) sampleCols else d.columns.toSeq
      val primary = sortBy.filterNot(_ == "$COUNT").getOrElse(timeCol)
      val head = if (sortAsc) col(primary).asc else col(primary).desc
      return d.select(names.map(col): _*)
        .orderBy(head +: names.filterNot(_ == primary).map(col(_).asc): _*)
        .limit(limit.getOrElse(100))
    }

    // `-distinct-limit`: early-exit distinct key sample — bypasses the
    // aggregate machinery entirely (the reference shorts its group-by
    // block loop; we short each scan partition's iterator)
    for (n <- distinctLimit) {
      val cols = if (distinctCols.nonEmpty) distinctCols else aggCols
      require(cols.nonEmpty,
        "-distinct-limit needs -distinct (or agg) columns")
      return graft.operators.Sampling.distinctSample(d, cols, n)
    }

    val w: Column = weightCol.map(col).getOrElse(lit(1L))
    // group keys; missing group value renders as "" (aggregate.go:305-313)
    val keyCols = groups.map(g => coalesce(col(g).cast("string"), lit("")).as(g))
    val bucketCol = timeBucket.map { b =>
      (col(timeCol).cast(LongType) / b).cast(LongType) * b
    }
    val allKeys = bucketCol.map(_.as("time_bucket")).toSeq ++ keyCols

    val countAgg = sum(w).cast(LongType).as("Count")
    val samplesAgg = count(lit(1)).as("Samples")
    // exact accumulation at decimal(_,6) semantics via the native int128
    // sum (expressions/DecimalSum.scala) — bit-identical to
    // sum(cast(c as decimal(38,6)) [* w]) cast double, ~3.5x faster
    def wsum(c: String): Column = weightCol match {
      case Some(wc) => call_function("graft_dsum", col(c), lit(6), col(wc))
      case None     => call_function("graft_dsum", col(c), lit(6))
    }

    val aggs: Seq[Column] = op match {
      case AggOp.CountOp => Seq(countAgg, samplesAgg)
      case AggOp.AvgOp =>
        Seq(countAgg, samplesAgg) ++ aggCols.map { c =>
          // per-column denominator: sybil averages each column over the
          // records where it is POPULATED (aggregate.go:246-259) — a
          // whole-group sum(w) denominator would count null rows as
          // zeros (the numerator's decimal sum skips them)
          (wsum(c).cast(DoubleType) /
            sum(when(col(c).isNotNull, w).otherwise(lit(0L))))
            .as(s"${c}_avg")
        }
      case AggOp.SumOp =>
        Seq(countAgg, samplesAgg) ++ aggCols.map { c =>
          wsum(c).cast(DoubleType).as(s"${c}_sum")
        }
      case AggOp.HistOp if useTDigest =>
        // quantile-sketch flavor: no extent pre-scan at all (the sketch
        // needs no bounds — the property the reference's t-digest flavor
        // exists for); one mergeable GK sketch per agg column, reshaped
        // into the hist surface after aggregation (see below)
        require(weightCol.isEmpty,
          "-tdigest does not support -weight-col (the quantile sketch " +
            "takes no weight); use the exact hist flavors for weighted " +
            "histograms")
        // one flavor at a time — silently preferring the sketch over a
        // requested bucket structure would be wrong twice over
        require(!useLogHist && !useNestedHist,
          "-tdigest cannot combine with -loghist/-nested-hist: pick one " +
            "hist flavor")
        Seq(countAgg, samplesAgg) ++ aggCols.flatMap { c =>
          // per-column POPULATED count: the reference's hist_tdigest
          // increments count/samples once per added sample, so a column
          // with nulls must not inherit the whole-group Count/Samples.
          // Populated = the cast succeeds (same rule as the exact hist
          // flavors); with -tdigest weight is forbidden, so count ==
          // samples == count(cast).
          // Quantiles come from the deterministic mergeable summary
          // (QuantileBins) rather than percentile_approx/KLL: the
          // randomized sketches are insertion-order dependent, so the
          // query cache's per-block partials could never merge to the
          // bit-identical single-pass answer (the engine's cached ==
          // uncached invariant). Exact for ≤8192 distinct values per
          // group, ≤1/64 relative bin error past that.
          val cv = col(c).cast(LongType)
          Seq(graft.functions.QuantileBins.qpcts(
              coalesce(cv, lit(0L)),
              when(cv.isNotNull, lit(1L)).otherwise(lit(0L))).as(s"__pcts_$c"),
            count(cv).as(s"__n_$c"))
        }
      case AggOp.HistOp =>
        // extents from the sidecar when supplied (GraftTable.query — the
        // reference's stored IntInfo, table_column_info.go); otherwise ONE
        // batched min/max job over every agg column, never one per column
        val missing = aggCols.filterNot(histExtents.contains)
        val scanned: Map[String, (Long, Long)] =
          if (missing.isEmpty) Map.empty
          else {
            val aggsMM = missing.flatMap(c => Seq(
              min(col(c).cast(LongType)).as(s"__mn_$c"),
              max(col(c).cast(LongType)).as(s"__mx_$c")))
            val r = d.agg(aggsMM.head, aggsMM.tail: _*).collect()(0)
            missing.map { c =>
              val mn = Option(r.getAs[Any](s"__mn_$c")).map(_.asInstanceOf[Long]).getOrElse(0L)
              val mx = Option(r.getAs[Any](s"__mx_$c")).map(_.asInstanceOf[Long]).getOrElse(0L)
              c -> (mn, mx)
            }.toMap
          }
        val extents = histExtents ++ scanned
        Seq(countAgg, samplesAgg) ++ aggCols.map { c =>
          val (mn, mx) = extents(c)
          // null-populated rows reach the typed (Long, Long) aggregator
          // as the Long.MinValue SENTINEL (which it skips entirely) — a
          // raw null would crash the tuple deserializer, where sybil
          // silently skips unpopulated records per column
          // (aggregate.go:246-259). Long.MinValue, not 0 or -1: zero and
          // negative weights are REAL records in a weighted query (they
          // count toward samples/min/max), so the sentinel must sit
          // outside the plausible weight range. "Populated" is judged on
          // the CAST result, not the raw column — a non-numeric string
          // casts to null and must take the sentinel path rather than
          // silently binning at value 0 with full weight.
          val cv = col(c).cast(LongType)
          val v = coalesce(cv, lit(0L))
          // a DATA weight of Long.MinValue would forge the sentinel and
          // vanish silently (while Count still summed it); remap it to -1
          // so the aggregator's negative-weight rejection fires loudly
          // like every other negative
          val rawW = coalesce(w.cast(LongType), lit(0L))
          val wv = when(cv.isNotNull,
            when(rawW === lit(Long.MinValue), lit(-1L)).otherwise(rawW))
            .otherwise(lit(Long.MinValue))
          (if (useNestedHist)
            graft.functions.NestedHist.nestedHist(v, wv, mn, mx, histBuckets)
          else if (useLogHist)
            graft.functions.LogHist.logHist(v, wv, mn, mx)
          else
            BasicHist.hist(v, wv, mn, mx, histBuckets)).as(s"${c}_hist")
        }
      case AggOp.DistinctOp(exact) =>
        require(distinctCols.nonEmpty || aggCols.nonEmpty,
          "distinct op needs -distinct (or agg) columns")
        val dcols = (if (distinctCols.nonEmpty) distinctCols else aggCols).map(col)
        // approx path: DataSketches HLL (hll_sketch_agg) rather than
        // approx_count_distinct — the binary sketch is a first-class value,
        // so the query cache persists per-block sketches and the merged
        // estimate (union = register-wise max, deterministic) is IDENTICAL
        // to the single-pass estimate: cached and uncached runs agree
        // bit-for-bit even for the approximate op (AsOfCacheSpec).
        Seq(countAgg, samplesAgg,
          (if (exact) countDistinct(dcols.head, dcols.tail: _*)
           // any-null tuples are EXCLUDED, matching the exact branch
           // (SQL COUNT DISTINCT skips them) — a bare concat_ws would
           // silently drop the null component and conflate ('x', null)
           // with (null, 'x')
           else hll_sketch_estimate(hll_sketch_agg(
             when(dcols.map(_.isNotNull).reduce(_ && _),
               concat_ws("\u0001", dcols: _*)))))
            .as("Distinct"))
    }

    val grouped0 =
      if (allKeys.nonEmpty) d.groupBy(allKeys: _*).agg(aggs.head, aggs.tail: _*)
      else d.agg(aggs.head, aggs.tail: _*)

    // tdigest flavor: reshape each column's 101-quantile array into the
    // hist output surface (one sketch per column feeds every field —
    // aggregating mean/min/max separately would triple the sketch work)
    val grouped =
      if (op == AggOp.HistOp && useTDigest)
        aggCols.foldLeft(grouped0)((g, c) => g
          .withColumn(s"${c}_hist", SybilQuery.tdigestHistStruct(
            col(s"__pcts_$c"), col(s"__n_$c")))
          .drop(s"__pcts_$c", s"__n_$c"))
      else grouped0

    // order: by $COUNT desc by default (aggregate.go:33-54), -sort-asc flips
    val sortCol = sortBy match {
      case None | Some("$COUNT") => col("Count")
      case Some(c) =>
        if (grouped.columns.contains(s"${c}_avg")) col(s"${c}_avg")
        else if (grouped.columns.contains(s"${c}_sum")) col(s"${c}_sum")
        // hist queries sort by the hist's mean (the reference's
        // SortResults compares Hists[col].Mean(), aggregate.go:51-52)
        else if (grouped.columns.contains(s"${c}_hist"))
          col(s"${c}_hist").getField("mean")
        else col(c)
    }
    val keyNames = bucketCol.map(_ => "time_bucket").toSeq ++ groups
    val ordered = grouped.orderBy(
      (if (sortAsc) sortCol.asc else sortCol.desc) +:
        keyNames.map(col(_).asc): _*)
    limit.map(ordered.limit).getOrElse(ordered)
  }
}

object SybilQuery {
  /** `Query()` — entry point matching the reference client. */
  def apply(): SybilQuery = new SybilQuery()

  /** The `-tdigest` hist output struct from a 101-quantile array + the
    * per-column populated count — the ONE copy of the hist_tdigest.go
    * surface mapping (count/samples exact, mean = q(0.5), min/max =
    * q(0)/q(1), stddev = 0, percentiles = q(0.00..0.99)), shared by the
    * uncached run and the query cache's merge path so the two can never
    * desynchronize. */
  private[graft] def tdigestHistStruct(pcts: Column, n: Column): Column =
    struct(
      n.as("count"),
      n.as("samples"),
      element_at(pcts, 51).cast(DoubleType).as("mean"),
      element_at(pcts, 1).as("min"),
      element_at(pcts, 101).as("max"),
      lit(0.0).as("stddev"),
      slice(pcts, 1, 100).as("percentiles"))
}

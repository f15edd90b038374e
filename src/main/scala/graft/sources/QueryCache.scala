package graft.sources

import java.nio.file.{Files, Path, StandardCopyOption}
import java.security.MessageDigest
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.dsl.{AggOp, IntFilter, QFilter, SybilQuery}
import graft.functions.BasicHist

/** Outcome counters for one cached run. */
case class CacheOutcome(hits: Int, misses: Int, uncacheable: Int, skipped: Int)

/** The reference's "timestamp resistant" per-block query cache
  * (/root/reference/src/lib/query_cache.go:30-144, README.md:24):
  * per-block partial aggregates keyed by the query WITH block-trivial time
  * filters removed, so a rolling time window still hits cache on interior
  * blocks — only the edge blocks recompute.
  *
  * Per block, each time filter is classified against the block's time
  * extent FROM THE SIDECAR (recorded once at digest time — zero Spark jobs
  * here, pure driver arithmetic over segment stats):
  *   - always-true on the block  → dropped from that block's cache key;
  *   - always-false              → the whole block is skipped (zone map);
  *   - partially overlapping     → block computed fresh, not cached.
  *
  * Partials are parquet under `table/cache/<queryKey>/<blockId>` —
  * block dirs are immutable after digest, so a cache entry never goes
  * stale; trim/digest producing new block ids naturally miss.
  *
  * Job structure is O(1) in the block count: all cache misses are computed
  * in ONE job (multi-path scan, block id recovered from the input file
  * path, partitioned write into the cache layout); all partially-covered
  * blocks in one more; hits are one multi-path read. The driver never
  * loops jobs over blocks — the pattern that melts down at 100 TB.
  *
  * Supported ops: Count / Sum / Avg (sums are decimal partials, so the
  * merge is exact) and Hist — flat, log-scaled, nested AND the tdigest
  * quantile flavor: the exact flavors persist their RAW mergeable buffer
  * ([[graft.functions.HistBuf]]: bucket counts + moments + outlier
  * side-arrays) with the flavor and bucket layout pinned by the sidecar
  * extents and folded into the cache key, so the merged result is
  * bit-identical to a single-pass hist and layout drift invalidates
  * naturally; tdigest persists [[graft.functions.QBinsBuf]] (the
  * deterministic extent-free quantile summary — a multiset homomorphism,
  * so per-block merge is bit-identical to single-pass too). str-replace
  * pre-transforms are applied inside each partial and folded into the
  * cache key; sort/limit follow the DSL's ordering rules at merge time.
  */
class QueryCache(spark: SparkSession, table: GraftTable) {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Canonical cache key for the query minus the given filters. Hist
    * entries also key on the bucket layout (extents + bucket count): a
    * table whose sidecar extents moved must not merge old-layout partials.
    */
  private def queryKey(q: SybilQuery, dropped: Seq[QFilter],
      extents: Map[String, (Long, Long)] = Map.empty): String = {
    val kept = q.filters.filterNot(dropped.contains)
    md5hex(Seq(
      "v=5", // partial-format version: bump on schema/convention changes
             // (v4: hist null-row sentinel Long.MinValue; zero and
             // negative weights are real records. v5: a data weight of
             // Long.MinValue rejects loudly instead of forging the
             // sentinel; all-zero-weight groups keep samples/extents)
      "g=" + q.groups.mkString(","),
      "a=" + q.aggCols.mkString(","),
      "d=" + q.distinctCols.mkString(","),
      "op=" + q.op.toString,
      "w=" + q.weightCol.getOrElse(""),
      "r=" + q.strReplace.toSeq.sortBy(_._1)
        .map { case (c, (p, r)) => s"$c:$p:$r" }.mkString("&"),
      "h=" + (if (q.op == AggOp.HistOp && q.useTDigest)
        // layout constants (exact cap / ticks) are the whole bucket
        // geometry — fold the versioned key so a constant change can
        // never merge old-layout partials. No extents: the summary is
        // extent-free by design (the flavor's reason to exist).
        graft.functions.QuantileBins.LayoutKey
      else if (q.op == AggOp.HistOp) {
        // the log flavor ignores histBuckets (fixed ticksPerOctave) — keying
        // it would force spurious misses when -int-bucket changes. The tick
        // count comes from the SAME constant the bucket function uses: a
        // hardcoded "t16" here would keep matching old-layout partials if
        // the default ever changed, merging incompatible buckets.
        val layout = if (q.useLogHist && !q.useNestedHist)
          "t" + graft.functions.LogHist.DefaultTicksPerOctave
          else q.histBuckets.toString
        (if (q.useNestedHist) "nested" else if (q.useLogHist) "log" else "flat") +
          ";" + layout + ";" + extents.toSeq.sorted.mkString(",")
      } else ""),
      "f=" + kept.map(_.toString).sorted.mkString("&")).mkString("|"))
  }

  private sealed trait TimeFilterClass
  private case object AlwaysTrue extends TimeFilterClass
  private case object AlwaysFalse extends TimeFilterClass
  private case object Partial extends TimeFilterClass

  private def classify(f: IntFilter, lo: Long, hi: Long): TimeFilterClass = f.op match {
    case "gt" => if (lo > f.v) AlwaysTrue else if (hi <= f.v) AlwaysFalse else Partial
    case "lt" => if (hi < f.v) AlwaysTrue else if (lo >= f.v) AlwaysFalse else Partial
    case "eq" => if (lo == f.v && hi == f.v) AlwaysTrue
                 else if (f.v < lo || f.v > hi) AlwaysFalse else Partial
    case "neq" => if (f.v < lo || f.v > hi) AlwaysTrue
                  else if (lo == f.v && hi == f.v) AlwaysFalse else Partial
    case _ => Partial
  }

  /** Partial aggregate under the query's groups/filters, optionally keyed
    * by an extra (non-output) grouping column such as the block id. The
    * DSL's str-replace pre-transform runs first so replaced columns filter
    * and group identically to `q.run` (query_cache key parity). */
  private def partial(df: DataFrame, q: SybilQuery, filters: Seq[QFilter],
      extents: Map[String, (Long, Long)], extraKeys: Seq[String] = Nil): DataFrame = {
    val replaced = q.strReplace.foldLeft(df) { case (acc, (c, (pat, rep))) =>
      acc.withColumn(c, regexp_replace(col(c), pat, rep))
    }
    val filtered =
      if (filters.nonEmpty) replaced.filter(filters.map(_.toColumn).reduce(_ && _))
      else replaced
    val w = q.weightCol.map(col).getOrElse(lit(1L))
    val keys = extraKeys.map(col) ++
      q.groups.map(g => coalesce(col(g).cast("string"), lit("")).as(g))
    def wsum(c: String) = q.weightCol match {
      case Some(wc) => sum(col(c).cast(DecimalType(38, 6)) * col(wc))
      case None     => sum(col(c).cast(DecimalType(38, 6)))
    }
    val aggs =
      Seq(sum(w).cast(LongType).as("Count"), count(lit(1)).as("Samples")) ++
        (q.op match {
          case AggOp.HistOp if q.useTDigest => q.aggCols.flatMap { c =>
            // the SybilQuery.run tdigest convention, kept in lockstep:
            // populated judged on the CAST result, explicit flag instead
            // of an in-band sentinel (every long is legal quantile data)
            val cv = col(c).cast(LongType)
            Seq(graft.functions.QuantileBins.qpctsPartial(
                coalesce(cv, lit(0L)),
                when(cv.isNotNull, lit(1L)).otherwise(lit(0L)))
                .as(s"__qb_$c"),
              count(cv).as(s"__tdn_$c"))
          }
          case AggOp.HistOp => q.aggCols.map { c =>
            val (mn, mx) = extents(c)
            // null-populated rows become the Long.MinValue sentinel
            // (skipped by the aggregator; zero/negative weights stay real
            // records), judged on the CAST result — the SybilQuery.run
            // convention, kept in lockstep for cache parity
            val cv = col(c).cast(LongType)
            val v = coalesce(cv, lit(0L))
            // sentinel-forgery guard in lockstep with SybilQuery.run: a
            // data weight of Long.MinValue remaps to -1 (loud rejection)
            val rawW = coalesce(w.cast(LongType), lit(0L))
            val wv = when(cv.isNotNull,
              when(rawW === lit(Long.MinValue), lit(-1L)).otherwise(rawW))
              .otherwise(lit(Long.MinValue))
            (if (q.useNestedHist)
              graft.functions.NestedHist.nestedHistPartial(
                v, wv, mn, mx, q.histBuckets)
            else if (q.useLogHist)
              graft.functions.LogHist.logHistPartial(v, wv, mn, mx)
            else
              BasicHist.histPartial(v, wv, mn, mx, q.histBuckets))
              .as(s"__hist_$c")
          }
          case AggOp.DistinctOp(_) =>
            val dcols = (if (q.distinctCols.nonEmpty) q.distinctCols
                         else q.aggCols).map(col)
            // any-null tuples excluded, matching SybilQuery.run's convention
            Seq(hll_sketch_agg(
              when(dcols.map(_.isNotNull).reduce(_ && _),
                concat_ws("\u0001", dcols: _*))).as("__hll"))
          case AggOp.AvgOp => q.aggCols.flatMap(c => Seq(
            wsum(c).as(s"__sum_$c"),
            // per-column populated weight: the avg denominator (the
            // SybilQuery.run convention — null rows are not zeros)
            sum(when(col(c).isNotNull, w).otherwise(lit(0L)))
              .as(s"__wn_$c")))
          case _ => q.aggCols.map(c => wsum(c).as(s"__sum_$c"))
        })
    if (keys.nonEmpty) filtered.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
    else filtered.agg(aggs.head, aggs.tail: _*)
  }

  /** Run `q` against the table with per-block partial caching. Supports
    * Count/Sum/Avg ops without time bucketing/samples (others: use
    * `q.run(table.read())`).
    */
  def run(q: SybilQuery): (DataFrame, CacheOutcome) = {
    require(!q.samples && q.timeBucket.isEmpty, "cache supports plain aggregations")
    // distinct-limit returns scan-order-dependent key tuples, not a
    // mergeable partial — caching per-block HLL partials for it would
    // silently answer the wrong query shape
    require(q.distinctLimit.isEmpty,
      "-distinct-limit is not cacheable (early-exit key sample, not an " +
        "aggregate); run uncached")
    require(q.op == AggOp.CountOp || q.op == AggOp.AvgOp || q.op == AggOp.SumOp ||
      q.op == AggOp.HistOp || q.op == AggOp.DistinctOp(false),
      s"op ${q.op} not cacheable (exact distinct partials are the full value" +
        " sets — cache the approx flavor, or run uncached)")
    // the tdigest flavor caches its own deterministic partial
    // (QuantileBins — the randomized-sketch order-dependence that made it
    // uncacheable through r10 is designed out); weight stays forbidden,
    // the same rule the uncached run enforces
    if (q.useTDigest) require(q.weightCol.isEmpty,
      "-tdigest does not support -weight-col (the quantile summary " +
        "takes no weight); use the exact hist flavors for weighted " +
        "histograms")
    // weighted parity holds only for integer weights: per-block Counts
    // are long sums, and a fractional weight would truncate per block
    // where the uncached run truncates once globally
    for (wc <- q.weightCol) {
      val dt = table.read().schema.fields.find(_.name == wc).map(_.dataType)
      require(QueryCache.integerWeightType(dt),
        s"cache requires an integer weight column; $wc is " +
        s"${dt.getOrElse("missing")} (per-block long truncation would " +
        "diverge from the uncached run); run uncached")
    }
    // loghist caches its OWN partial flavor (LogHistPartialAggregator) and
    // the flavor is part of the cache key, so flat and log partials for the
    // same filters can never merge into each other
    // hist partials need a SHARED bucket layout across blocks and runs:
    // extents come from the sidecar (the stored-IntInfo path) and key the
    // cache, so layout drift invalidates naturally
    val extents: Map[String, (Long, Long)] =
      if (q.op != AggOp.HistOp || q.useTDigest) Map.empty
      else {
        val fromInfo = table.info().columns.collect {
          case ColumnInfo(n, _, Some(mn), Some(mx)) if q.aggCols.contains(n) =>
            n -> (mn, mx)
        }.toMap
        q.aggCols.foreach(c => require(fromInfo.contains(c),
          s"hist cache needs sidecar extents for '$c' (run rebuild)"))
        fromInfo
      }

    val (timeFilters, rest) = q.filters.partition {
      case IntFilter(n, _, _) => n == q.timeCol
      case _ => false
    }
    // a cacheable block drops ALL time filters, so every cacheable block
    // shares one key
    val key = queryKey(q, timeFilters, extents)

    // zero-job classification: block time extents come from segment stats
    // recorded at digest
    var hitPaths = List.empty[Path]
    var missIds = List.empty[String]
    var uncacheableIds = List.empty[String]
    var skipped = 0
    for (s <- table.blockSegments) {
      val extent = s.stat(q.timeCol).flatMap(c => c.min.zip(c.max))
      val classes = timeFilters.map(f =>
        extent.map { case (lo, hi) => classify(f.asInstanceOf[IntFilter], lo, hi) }
          .getOrElse(Partial))
      // AlwaysTrue additionally demands a null-free time column in the
      // block (cnt == rows): the extents describe non-null values only,
      // and dropping the time filter would admit null-time rows the
      // batch filter excludes (null-fails-every-filter semantics)
      val noNullTimes = timeFilters.isEmpty ||
        s.stat(q.timeCol).exists(_.cnt == s.rows)
      if (classes.contains(AlwaysFalse)) skipped += 1
      else if (classes.forall(_ == AlwaysTrue) && noNullTimes) {
        val dest = table.cacheRoot.resolve(key).resolve(s.id)
        if (Files.exists(dest)) hitPaths ::= dest else missIds ::= s.id
      } else uncacheableIds ::= s.id
    }

    // ONE job computes every miss block's partial: multi-path scan, block
    // id recovered from the file path, partitioned write straight into the
    // cache layout (cache/<key>/<blockId>).
    val missPartials: Option[DataFrame] =
      if (missIds.isEmpty) None
      else {
        val dirs = missIds.map(id => table.blockPath(id).toString)
        // greedy .* pins the LAST /blocks/ component (a table rooted
        // under a path containing "blocks" would otherwise extract the
        // root segment and silently drop every miss block's rows — the
        // GraftTable.rebuild regex discipline)
        val withBlock = spark.read.parquet(dirs: _*)
          .withColumn("__block",
            regexp_extract(input_file_name(), ".*/blocks/([^/]+)/", 1))
        val p = partial(withBlock, q, rest, extents, extraKeys = Seq("__block"))
        val tmp = table.cacheRoot.resolve(key).resolve(s".tmp-${java.util.UUID.randomUUID()}")
        p.write.partitionBy("__block").mode(SaveMode.Overwrite).parquet(tmp.toString)
        val written = {
          val s = Files.list(tmp)
          try s.iterator().asScala
            .filter(d => d.getFileName.toString.startsWith("__block=")).toSeq
          finally s.close()
        }
        written.foreach { d =>
          val id = d.getFileName.toString.stripPrefix("__block=")
          val dest = table.cacheRoot.resolve(key).resolve(id)
          // a concurrent run may have published the same partial between
          // our existence check and the move — the loser just discards
          // (block partials for the same key are identical by construction).
          // POSIX surfaces the lost race as any FileSystemException
          // (FileAlreadyExists, DirectoryNotEmpty, ...) — benign iff dest
          // now exists; anything else is a real I/O failure and propagates.
          if (!Files.exists(dest))
            try Files.move(d, dest, StandardCopyOption.ATOMIC_MOVE)
            catch {
              case e: java.nio.file.FileSystemException =>
                if (!Files.exists(dest)) throw e
            }
        }
        locally {
          val s = Files.walk(tmp)
          try s.sorted(java.util.Comparator.reverseOrder[Path]())
            .iterator().asScala.foreach(Files.delete)
          finally s.close()
        }
        // a block whose partial has zero groups writes no dir — read only
        // what exists (it will recompute next run; empty is cheap anyway)
        val readable = missIds.map(id => table.cacheRoot.resolve(key).resolve(id))
          .filter(Files.exists(_)).map(_.toString)
        if (readable.isEmpty) None else Some(spark.read.parquet(readable: _*))
      }

    // hits: one multi-path read over all cached partials
    val hitPartials: Option[DataFrame] =
      if (hitPaths.isEmpty) None else Some(spark.read.parquet(hitPaths.map(_.toString): _*))

    // partially-covered blocks: one job with the FULL filter set
    val uncachedPartials: Option[DataFrame] =
      if (uncacheableIds.isEmpty) None
      else Some(partial(
        spark.read.parquet(uncacheableIds.map(id => table.blockPath(id).toString): _*),
        q, q.filters, extents))

    // all-blocks-skipped still takes the normal merge path over an EMPTY
    // partial frame, so the zero-row result carries the MERGED output
    // schema (x_avg/x_hist/Distinct), not the partial-stage one — a
    // caller selecting output columns from an empty result must not
    // throw
    val parts0 = Seq(missPartials, hitPartials, uncachedPartials).flatten
    val parts =
      if (parts0.nonEmpty) parts0
      else Seq(partial(table.read().limit(0), q, q.filters, extents))
    val out = {
      val merged = parts.reduce((a, b) => a.unionByName(b, allowMissingColumns = false))
      val keys = q.groups.map(col)
      val sums =
        Seq(sum(col("Count")).cast(LongType).as("Count"),
          sum(col("Samples")).cast(LongType).as("Samples")) ++
          (q.op match {
            case AggOp.SumOp => q.aggCols.map(c =>
              sum(col(s"__sum_$c")).cast(DoubleType).as(s"${c}_sum"))
            case AggOp.AvgOp => q.aggCols.map(c =>
              (sum(col(s"__sum_$c")).cast(DoubleType) /
                sum(col(s"__wn_$c"))).as(s"${c}_avg"))
            case AggOp.HistOp if q.useTDigest => q.aggCols.flatMap(c => Seq(
              graft.functions.QuantileBins.qpctsMerge(col(s"__qb_$c"))
                .as(s"__pcts_$c"),
              sum(col(s"__tdn_$c")).cast(LongType).as(s"__n_$c")))
            case AggOp.HistOp => q.aggCols.map { c =>
              val (mn, mx) = extents(c)
              (if (q.useNestedHist)
                graft.functions.NestedHist.nestedHistMerge(
                  col(s"__hist_$c"), mn, mx, q.histBuckets)
              else if (q.useLogHist)
                graft.functions.LogHist.logHistMerge(col(s"__hist_$c"), mn, mx)
              else
                BasicHist.histMerge(col(s"__hist_$c"), mn, mx, q.histBuckets))
                .as(s"${c}_hist")
            }
            case AggOp.DistinctOp(_) =>
              // union = register-wise max -> merged estimate identical to
              // the single-pass sketch over the same rows
              Seq(hll_sketch_estimate(hll_union_agg(col("__hll")))
                .as("Distinct"))
            case _ => Nil
          })
      val g0 = if (keys.nonEmpty) merged.groupBy(keys: _*).agg(sums.head, sums.tail: _*)
               else merged.agg(sums.head, sums.tail: _*)
      // tdigest: reshape merged quantiles into the hist output surface —
      // the SAME helper the uncached run uses (SybilQuery.tdigestHistStruct),
      // so the cached struct can never drift from the single-pass one
      val g =
        if (q.op == AggOp.HistOp && q.useTDigest)
          q.aggCols.foldLeft(g0)((d, c) => d
            .withColumn(s"${c}_hist", SybilQuery.tdigestHistStruct(
              col(s"__pcts_$c"), col(s"__n_$c")))
            .drop(s"__pcts_$c", s"__n_$c"))
        else g0
      // same ordering rules as SybilQuery.run: $COUNT desc default, -sort /
      // -sort-asc honored, group keys break ties
      val sortCol = q.sortBy match {
        case None | Some("$COUNT") => col("Count")
        case Some(c) =>
          if (g.columns.contains(s"${c}_avg")) col(s"${c}_avg")
          else if (g.columns.contains(s"${c}_sum")) col(s"${c}_sum")
          else col(c)
      }
      val ordered = g.orderBy(
        (if (q.sortAsc) sortCol.asc else sortCol.desc) +: q.groups.map(col(_).asc): _*)
      q.limit.map(ordered.limit).getOrElse(ordered)
    }
    (out, CacheOutcome(hitPaths.size, missIds.size, uncacheableIds.size, skipped))
  }
}

object QueryCache {
  /** THE integer-weight type gate — shared by [[QueryCache.run]]'s
    * loud precondition and Cli's silent fall-back-to-uncached predicate
    * (one copy: a widened/narrowed cache gate must move both sites or
    * the CLI either aborts with the cache's exception or needlessly
    * skips it). Absent column (None) passes — the run will fail on its
    * own terms. */
  def integerWeightType(
      dt: Option[org.apache.spark.sql.types.DataType]): Boolean =
    dt.forall {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }
}

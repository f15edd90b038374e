package graft.sources

import java.nio.file.Files
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.dsl.{AggOp, IntFilter, QFilter, SybilQuery}

/** Outcome counters for one cached run. */
case class CacheOutcome(hits: Int, misses: Int, uncacheable: Int, skipped: Int)

/** The reference's "timestamp resistant" per-block query cache
  * (/root/reference/src/lib/query_cache.go:30-144, README.md:24):
  * per-block partial aggregates keyed by the query WITH block-trivial time
  * filters removed, so a rolling time window still hits cache on interior
  * blocks — only the edge blocks recompute.
  *
  * Per block, each time filter is classified against the block's time
  * extent (parquet footer min/max — free with aggregate pushdown):
  *   - always-true on the block  → dropped from that block's cache key;
  *   - always-false              → the whole block is skipped (zone map);
  *   - partially overlapping     → block computed fresh, not cached.
  *
  * Partials are parquet under `table/cache/<queryKey>/<blockId>` —
  * block dirs are immutable after digest, so a cache entry never goes
  * stale; trim/digest producing new block ids naturally miss.
  *
  * Supported ops: Count / Sum / Avg (sums are decimal partials, so the
  * merge is exact). Hist/distinct partials have sketch buffers — they go
  * through the normal uncached path.
  */
class QueryCache(spark: SparkSession, table: GraftTable) {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Canonical cache key for the query minus the given filters. */
  private def queryKey(q: SybilQuery, dropped: Seq[QFilter]): String = {
    val kept = q.filters.filterNot(dropped.contains)
    md5hex(Seq(
      "g=" + q.groups.mkString(","),
      "a=" + q.aggCols.mkString(","),
      "op=" + q.op.toString,
      "w=" + q.weightCol.getOrElse(""),
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

  /** Partial aggregate of one block under the query's groups/filters. */
  private def partial(df: DataFrame, q: SybilQuery, filters: Seq[QFilter]): DataFrame = {
    val filtered =
      if (filters.nonEmpty) df.filter(filters.map(_.toColumn).reduce(_ && _)) else df
    val w = q.weightCol.map(col).getOrElse(lit(1L))
    val keys = q.groups.map(g => coalesce(col(g).cast("string"), lit("")).as(g))
    def wsum(c: String) = q.weightCol match {
      case Some(wc) => sum(col(c).cast(DecimalType(38, 6)) * col(wc))
      case None     => sum(col(c).cast(DecimalType(38, 6)))
    }
    val aggs =
      Seq(sum(w).cast(LongType).as("Count"), count(lit(1)).as("Samples")) ++
        q.aggCols.map(c => wsum(c).as(s"__sum_$c"))
    if (keys.nonEmpty) filtered.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
    else filtered.agg(aggs.head, aggs.tail: _*)
  }

  /** Run `q` against the table with per-block partial caching. Supports
    * Count/Sum/Avg ops without time bucketing/samples (others: use
    * `q.run(table.read())`).
    */
  def run(q: SybilQuery): (DataFrame, CacheOutcome) = {
    require(!q.samples && q.timeBucket.isEmpty, "cache supports plain aggregations")
    require(q.op == AggOp.CountOp || q.op == AggOp.AvgOp || q.op == AggOp.SumOp,
      s"op ${q.op} not cacheable")

    var hits, misses, uncacheable, skipped = 0
    val partials = table.blockIds.flatMap { id =>
      val block = table.readBlock(id)
      val (timeFilters, rest) = q.filters.partition {
        case IntFilter(n, _, _) => n == q.timeCol
        case _ => false
      }
      val extent: Option[(Long, Long)] =
        if (timeFilters.isEmpty) None
        else {
          val r = block.agg(min(col(q.timeCol)), max(col(q.timeCol))).collect()(0)
          if (r.isNullAt(0)) None else Some((r.getLong(0), r.getLong(1)))
        }
      val classes = timeFilters.map(f =>
        f -> extent.map { case (lo, hi) => classify(f.asInstanceOf[IntFilter], lo, hi) }
          .getOrElse(Partial))
      if (classes.exists(_._2 == AlwaysFalse)) { skipped += 1; None }
      else if (classes.forall(_._2 == AlwaysTrue)) {
        // all time filters trivially true here → drop them from the key
        val key = queryKey(q, classes.map(_._1))
        val dest = table.cacheRoot.resolve(key).resolve(id)
        if (Files.exists(dest)) { hits += 1; Some(spark.read.parquet(dest.toString)) }
        else {
          misses += 1
          val p = partial(block, q, rest)
          p.coalesce(1).write.mode(SaveMode.Overwrite).parquet(dest.toString)
          Some(spark.read.parquet(dest.toString))
        }
      } else {
        uncacheable += 1
        Some(partial(block, q, q.filters))
      }
    }

    val out = if (partials.isEmpty) {
      partial(table.read(), q, q.filters).limit(0)
    } else {
      val merged = partials.reduce(_ unionByName _)
      val keys = q.groups.map(col)
      val sums =
        Seq(sum(col("Count")).cast(LongType).as("Count"),
          sum(col("Samples")).cast(LongType).as("Samples")) ++
          (q.op match {
            case AggOp.SumOp => q.aggCols.map(c =>
              sum(col(s"__sum_$c")).cast(DoubleType).as(s"${c}_sum"))
            case AggOp.AvgOp => q.aggCols.map(c =>
              (sum(col(s"__sum_$c")).cast(DoubleType) / sum(col("Count"))).as(s"${c}_avg"))
            case _ => Nil
          })
      val g = if (keys.nonEmpty) merged.groupBy(keys: _*).agg(sums.head, sums.tail: _*)
              else merged.agg(sums.head, sums.tail: _*)
      val ordered = g.orderBy(col("Count").desc +: q.groups.map(col(_).asc): _*)
      q.limit.map(ordered.limit).getOrElse(ordered)
    }
    (out, CacheOutcome(hits, misses, uncacheable, skipped))
  }
}

package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import scala.util.Try

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-column stats sidecar — the role of the reference's `info.db`
  * (table_io.go:26-78): column types, int extents, row count. JSON on disk
  * so it is human-inspectable and engine-agnostic.
  */
case class ColumnInfo(name: String, dtype: String, min: Option[Long], max: Option[Long])
case class TableInfo(rowCount: Long, columns: Seq[ColumnInfo])

/** A graft table on disk: append-only ingest log + immutable digested
  * blocks, coordinated purely via the filesystem — the Spark-native
  * re-expression of the reference's row-store/column-store split
  * (SURVEY.md §1.5, §3.2, §3.3):
  *
  * {{{
  *   root/
  *     ingest/<uuid>/   parquet appended by ingest() (the row-store log)
  *     blocks/<uuid>/   64Ki-row-group parquet written by digest()
  *     info.json        TableInfo sidecar
  * }}}
  *
  *  - `ingest()` appends a parquet directory per call — atomic at the
  *    directory level (write to `.tmp-*`, rename), like the reference's
  *    temp+rename log append (row_store.go:197-259).
  *  - `digest()` drains the log into block dirs with 64Ki-row row groups
  *    (CHUNK_SIZE, table.go:44) and deletes consumed log dirs — the
  *    `stomache` collation pass (table_ingest.go:287-331).
  *  - `read()` unions blocks, optionally including the undigested log
  *    (`-read-log`, cmd_query.go:66).
  *  - `trim()` deletes oldest blocks by age/size (table_trim.go:5-58).
  *  - schema evolution is merge-with-first-type-wins: a column whose type
  *    conflicts with the sidecar is rejected with a warning
  *    (set_key_type, table.go:155-170).
  *
  * At scale each block dir maps to a partition of a distributed filesystem;
  * all data paths stay distributed (no driver-side row handling) — only the
  * tiny sidecar and directory renames touch the driver.
  */
class GraftTable(spark: SparkSession, root: String) {
  private val rootP = Paths.get(root)
  private val ingestP = rootP.resolve("ingest")
  private val blocksP = rootP.resolve("blocks")
  private val infoP = rootP.resolve("info.json")
  Files.createDirectories(ingestP)
  Files.createDirectories(blocksP)

  val ChunkSize = 65536 // records per block, = reference CHUNK_SIZE (table.go:44)

  // ---- schema registry ---------------------------------------------------

  private def typeName(dt: DataType): String = dt.simpleString

  /** First-type-wins conflict check: returns the columns of `df` that are
    * new or type-consistent; conflicting columns are dropped with a warning
    * (the reference refuses the field but keeps the record, record.go:113-115).
    */
  private def checkSchema(df: DataFrame): DataFrame = {
    val known = info().columns.map(c => c.name -> c.dtype).toMap
    val (ok, bad) = df.schema.fields.partition(f =>
      known.get(f.name).forall(_ == typeName(f.dataType)))
    bad.foreach(f => System.err.println(
      s"[graft] column ${f.name}: type ${typeName(f.dataType)} conflicts with ${known(f.name)}; dropping"))
    if (bad.isEmpty) df else df.select(ok.map(f => col(s"`${f.name}`")).toSeq: _*)
  }

  private def writeInfo(i: TableInfo): Unit = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val cols = i.columns.map { c =>
      s"""{"name":${q(c.name)},"dtype":${q(c.dtype)},"min":${c.min.getOrElse("null")},"max":${c.max.getOrElse("null")}}"""
    }.mkString("[", ",", "]")
    val tmp = rootP.resolve("info.json.tmp")
    Files.writeString(tmp, s"""{"rowCount":${i.rowCount},"columns":$cols}""")
    Files.move(tmp, infoP, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Parse info.json (tiny, driver-side) without a JSON library. */
  def info(): TableInfo = {
    if (!Files.exists(infoP)) return TableInfo(0, Nil)
    val txt = Files.readString(infoP)
    val rowCount = "\"rowCount\":(\\d+)".r.findFirstMatchIn(txt).map(_.group(1).toLong).getOrElse(0L)
    val colRe = "\\{\"name\":\"((?:[^\"\\\\]|\\\\.)*)\",\"dtype\":\"((?:[^\"\\\\]|\\\\.)*)\",\"min\":(null|-?\\d+),\"max\":(null|-?\\d+)\\}".r
    val cols = colRe.findAllMatchIn(txt).map { m =>
      def unq(s: String) = s.replace("\\\"", "\"").replace("\\\\", "\\")
      ColumnInfo(unq(m.group(1)), unq(m.group(2)),
        Option(m.group(3)).filter(_ != "null").map(_.toLong),
        Option(m.group(4)).filter(_ != "null").map(_.toLong))
    }.toSeq
    TableInfo(rowCount, cols)
  }

  /** Recompute the sidecar by scanning current data (the reference's
    * `rebuild` command — table_recover_info.go). */
  def rebuild(): TableInfo = {
    val d = Try(read(readLog = true)).toOption
    val i = d match {
      case None => TableInfo(0, Nil)
      case Some(df) if df.isEmpty => TableInfo(0, Nil)
      case Some(df) =>
        val intCols = df.schema.fields.filter(_.dataType == LongType).map(_.name)
        val aggs = intCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
        val extents: Map[String, (Option[Long], Option[Long])] =
          if (aggs.isEmpty) Map.empty
          else {
            val r = df.agg(aggs.head, aggs.tail.toSeq: _*).collect()(0)
            intCols.map(c => c -> ((
              Option(r.getAs[Any](s"min_$c")).map(_.asInstanceOf[Long]),
              Option(r.getAs[Any](s"max_$c")).map(_.asInstanceOf[Long])))).toMap
          }
        TableInfo(df.count(),
          df.schema.fields.toSeq.map(f => ColumnInfo(f.name, typeName(f.dataType),
            extents.get(f.name).flatMap(_._1), extents.get(f.name).flatMap(_._2))))
    }
    writeInfo(i)
    i
  }

  // ---- ingest / digest ---------------------------------------------------

  /** Append records to the ingest log (one parquet dir per call). */
  def ingest(df: DataFrame): Unit = {
    val clean = checkSchema(df)
    val dest = ingestP.resolve(java.util.UUID.randomUUID().toString)
    clean.write.mode(SaveMode.ErrorIfExists).parquet(dest.toString)
    rebuild()
  }

  private def listDirs(p: Path): Seq[Path] =
    if (!Files.exists(p)) Nil
    else Files.list(p).iterator().asScala.filter(Files.isDirectory(_))
      .filterNot(_.getFileName.toString.startsWith(".tmp")).toSeq.sortBy(_.toString)

  /** Drain the ingest log into immutable blocks: read all log dirs, write
    * 64Ki-row-group parquet into a new block dir, delete consumed logs.
    * Crash-safe ordering: the block is fully written and renamed before any
    * log dir is deleted (worst case after a crash: duplicate digestion of a
    * log — same recovery tradeoff as the reference's stomache lock
    * recovery, table_ingest.go:208-244).
    */
  def digest(): Unit = {
    val logs = listDirs(ingestP)
    if (logs.isEmpty) return
    val df = logs.map(p => spark.read.parquet(p.toString))
      .reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
    val n = df.count()
    val tmp = blocksP.resolve(s".tmp-${java.util.UUID.randomUUID()}")
    df.repartition(math.max(1, (n / ChunkSize).toInt + (if (n % ChunkSize > 0) 1 else 0)))
      .write
      .option("parquet.block.size", (8L * 1024 * 1024).toString)
      .mode(SaveMode.ErrorIfExists)
      .parquet(tmp.toString)
    Files.move(tmp, blocksP.resolve(java.util.UUID.randomUUID().toString),
      StandardCopyOption.ATOMIC_MOVE)
    logs.foreach(deleteRecursively)
    rebuild()
  }

  /** Block ids (immutable once digested) — the unit of cache/skip logic. */
  def blockIds: Seq[String] = listDirs(blocksP).map(_.getFileName.toString)

  /** Read one block by id. */
  def readBlock(id: String): DataFrame =
    spark.read.parquet(blocksP.resolve(id).toString)

  /** Root directory for per-block query-cache entries. */
  private[sources] def cacheRoot: Path = rootP.resolve("cache")

  /** All digested blocks, optionally + the undigested ingest log. */
  def read(readLog: Boolean = false): DataFrame = {
    val dirs = listDirs(blocksP) ++ (if (readLog) listDirs(ingestP) else Nil)
    require(dirs.nonEmpty, s"table $root is empty")
    dirs.map(p => spark.read.parquet(p.toString))
      .reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
  }

  /** Delete oldest blocks until the table fits `maxBytes`, or drop blocks
    * whose newest `timeCol` value is older than `olderThan` (unix secs). */
  def trim(maxBytes: Option[Long] = None, olderThan: Option[Long] = None,
      timeCol: String = "time"): Seq[String] = {
    var removed = List.empty[String]
    olderThan.foreach { cutoff =>
      for (b <- listDirs(blocksP)) {
        val newest = Try(spark.read.parquet(b.toString)
          .agg(max(col(timeCol))).collect()(0).getLong(0)).toOption
        if (newest.exists(_ < cutoff)) { deleteRecursively(b); removed ::= b.toString }
      }
    }
    maxBytes.foreach { budget =>
      def size(p: Path): Long =
        Files.walk(p).iterator().asScala.filter(Files.isRegularFile(_)).map(Files.size).sum
      // oldest-first by modification time (block dirs are immutable after write)
      var dirs = listDirs(blocksP).sortBy(p => Files.getLastModifiedTime(p).toMillis)
      var total = dirs.map(size).sum
      while (total > budget && dirs.length > 1) {
        val victim = dirs.head
        total -= size(victim)
        deleteRecursively(victim)
        removed ::= victim.toString
        dirs = dirs.tail
      }
    }
    if (removed.nonEmpty) rebuild()
    removed
  }

  /** Gzipped TSV export of matching records (ExportBlockData,
    * table_block_io.go:356-398). */
  def exportTsv(outDir: String, readLog: Boolean = false): Unit =
    read(readLog)
      .write.mode(SaveMode.Overwrite)
      .option("sep", "\t").option("header", "true")
      .option("compression", "gzip")
      .csv(outDir)

  private def deleteRecursively(p: Path): Unit =
    Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
      .iterator().asScala.foreach(Files.delete)
}

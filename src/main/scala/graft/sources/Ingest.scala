package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON/CSV ingest with the reference engine's coercion rules
  * (/root/reference/src/cmd/cmd_ingest.go:26-91,95-143):
  *
  *  - nested objects are flattened with `_`-joined key prefixes (`a.b` →
  *    `a_b`, cmd_ingest.go:34,68-70);
  *  - float64 → int64 by truncation (59-60); bool → 0/1 (61-66);
  *  - JSON arrays become "set" columns: arrays of strings (numbers are
  *    stringified, 72-85);
  *  - `ints` forces string→int parse (46-52; unparseable → null, i.e. the
  *    reference's "skip field");
  *  - `timestamps` parses string timestamps to unix seconds (37-45);
  *  - `exclude` drops columns (30-32).
  *
  * Everything is a column expression over `spark.read.json`'s inferred
  * schema — the coercions run inside the scan's codegen, no row-level UDFs.
  * A `sybilCompat = false` mode keeps doubles as DoubleType instead of
  * truncating (the "do the right thing" escape hatch, SURVEY.md §7.4).
  */
object Ingest {

  def readJson(
      spark: SparkSession,
      path: String,
      ints: Set[String] = Set.empty,
      timestamps: Set[String] = Set.empty,
      timestampFormat: String = "yyyy-MM-dd HH:mm:ss",
      exclude: Set[String] = Set.empty,
      jsonPath: Option[String] = None,
      sybilCompat: Boolean = true): DataFrame = {
    val raw = spark.read.json(path)
    // `-path $.foo.bar` (cmd_ingest.go:145-186): re-root each record at a
    // nested object before flattening
    val rooted = jsonPath match {
      case None => raw
      case Some(p) =>
        val steps = p.stripPrefix("$").split("\\.").filter(_.nonEmpty).toSeq
        val rootCol = steps.tail.foldLeft(col(steps.head))((c, s) => c.getField(s))
        raw.select(rootCol.as("__root")).select(col("__root.*"))
    }
    coerce(rooted, ints, timestamps, timestampFormat, exclude, sybilCompat)
  }

  /** CSV: header row names columns; numeric-looking → int else str
    * (cmd_ingest.go:95-143 parses each cell as float, truncates). We let
    * Spark infer, then apply the same coercions. */
  def readCsv(
      spark: SparkSession,
      path: String,
      exclude: Set[String] = Set.empty,
      sybilCompat: Boolean = true): DataFrame =
    coerce(
      spark.read.option("header", "true").option("inferSchema", "true").csv(path),
      Set.empty, Set.empty, "", exclude, sybilCompat)

  /** Flatten nested structs and apply sybil type coercions. */
  def coerce(
      raw: DataFrame,
      ints: Set[String],
      timestamps: Set[String],
      timestampFormat: String,
      exclude: Set[String],
      sybilCompat: Boolean): DataFrame = {

    def flatten(prefix: String, field: StructField, path: Column): Seq[(String, Column, DataType)] = {
      val name = if (prefix.isEmpty) field.name else s"${prefix}_${field.name}"
      field.dataType match {
        case st: StructType =>
          st.fields.toSeq.flatMap(f => flatten(name, f, path.getField(f.name)))
        case dt => Seq((name, path, dt))
      }
    }

    val flat = raw.schema.fields.toSeq.flatMap(f => flatten("", f, col(s"`${f.name}`")))

    val cols = flat.collect {
      case (name, c, _) if exclude.contains(name) => None
      case (name, c, StringType) if timestamps.contains(name) =>
        // try_*: parse failures → null (reference skips the field, 40-42);
        // plain cast would throw under Spark 4's default ANSI mode
        Some(try_to_timestamp(c, lit(timestampFormat)).cast(LongType).as(name))
      case (name, c, StringType) if ints.contains(name) =>
        Some(c.try_cast(LongType).as(name))
      case (name, c, StringType) => Some(c.as(name))
      case (name, c, BooleanType) => Some(c.cast(LongType).as(name))
      case (name, c, _: DoubleType | _: FloatType | _: DecimalType) =>
        // try_cast: NaN/Infinity/out-of-range → null (the reference skips
        // the field); a plain cast would abort the whole ingest under
        // Spark 4's default ANSI mode
        Some((if (sybilCompat) c.try_cast(LongType) else c.cast(DoubleType)).as(name))
      case (name, c, _: LongType | _: IntegerType | _: ShortType | _: ByteType) =>
        Some(c.cast(LongType).as(name))
      case (name, c, ArrayType(et, _)) =>
        // set column: stringify elements; floats printed without decimals
        // (cmd_ingest.go:77-80 "%.0f")
        val elems = et match {
          case _: DoubleType | _: FloatType =>
            transform(c, e => format_string("%.0f", e))
          case _ => transform(c, e => e.cast(StringType))
        }
        Some(elems.as(name))
      case (name, c, _) => Some(c.cast(StringType).as(name))
    }.flatten

    raw.select(cols: _*)
  }
}

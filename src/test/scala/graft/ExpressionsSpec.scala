package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Native expression semantics — above all graft_dsum, which must be
  * BIT-IDENTICAL to the decimal-exact sum pipeline it replaces. */
class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def decimalSum(c: String, s: Int) =
    sum(col(c).cast(DecimalType(38, s))).cast(DoubleType)
  private def graftSum(c: String, s: Int) =
    call_function("graft_dsum", col(c), lit(s))

  test("graft_dsum == decimal-exact sum on adversarial values, all scales") {
    val rnd = new scala.util.Random(7)
    // magnitudes spread over 9 decades, signs mixed, plus boundary-hugging
    // values (k + 0.00005-ish patterns that sit near the scale-4 round edge)
    val values =
      Seq.fill(20000)(rnd.nextDouble() * math.pow(10, rnd.nextInt(9)) *
        (if (rnd.nextBoolean()) 1 else -1)) ++
      Seq.tabulate(5000)(i => i + 0.00005) ++
      Seq.tabulate(5000)(i => -(i + 0.000049999999999)) ++
      Seq(0.0, -0.0, 1e-12, -1e-12, 123456789.0001, 0.00004999999999999999)
    val df = values.zipWithIndex.map { case (v, i) => (i % 7, v) }.toDF("g", "x")
    for (s <- Seq(0, 2, 4, 6)) {
      val r = df.groupBy("g").agg(
        decimalSum("x", s).as("dec"), graftSum("x", s).as("graft")).collect()
      r.foreach { row =>
        assert(row.getDouble(1) === row.getDouble(2),
          s"scale $s group ${row.getInt(0)}: dec=${row.getDouble(1)} graft=${row.getDouble(2)}")
      }
    }
  }

  test("graft_dsum weighted == decimal(c,6)*w exact sum") {
    val rnd = new scala.util.Random(13)
    val df = Seq.fill(30000)((rnd.nextInt(5),
        rnd.nextDouble() * math.pow(10, rnd.nextInt(7)),
        (rnd.nextInt(1000) + 1).toLong))
      .toDF("g", "x", "w")
    val r = df.groupBy("g").agg(
      sum(col("x").cast(DecimalType(38, 6)) * col("w")).cast(DoubleType).as("dec"),
      call_function("graft_dsum", col("x"), lit(6), col("w")).as("graft"))
      .collect()
    r.foreach(row => assert(row.getDouble(1) === row.getDouble(2),
      s"group ${row.getInt(0)}"))
  }

  test("graft_dsum null semantics match decimal SUM") {
    val df = Seq((1, Some(1.5)), (1, None), (2, None), (2, None))
      .toDF("g", "x")
    val r = df.groupBy("g").agg(
      decimalSum("x", 4).as("dec"), graftSum("x", 4).as("graft"))
      .orderBy("g").collect()
    assert(!r(0).isNullAt(1) && r(0).getDouble(1) === r(0).getDouble(2))
    assert(r(1).isNullAt(1) && r(1).isNullAt(2), "all-null group must be null")
  }

  test("graft_dsum int128 buffer survives huge partial sums") {
    // 2M values of ~9e12 scaled magnitude: the long-sum would overflow at
    // ~1e6 such rows x larger data; int128 must not
    val df = spark.range(0, 2000000, 1, 32)
      .select((col("id") % 1000 + 9e8).as("x"))
    val dec = df.agg(decimalSum("x", 4)).collect()(0).getDouble(0)
    val g = df.agg(graftSum("x", 4)).collect()(0).getDouble(0)
    assert(dec === g)
  }
}

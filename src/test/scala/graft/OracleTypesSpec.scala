package graft

import java.nio.file.{Files, Paths}
import scala.sys.process._
import org.scalatest.funsuite.AnyFunSuite

/** Oracle-contract type guard (VERDICT r6 #2): the driver's hasher
  * normalizes INTEGER↔BIGINT but NOT int128, so an oracle column DuckDB
  * types as HUGEINT (an un-cast `SUM(BIGINT)`) hash-mismatches even when
  * every value is identical — exactly the failure mode of the 12
  * driver-red queries in round 6. This spec DESCRIBEs every
  * [[SparkEntry.oracleSql]] statement via `scripts/check_oracle_types.py`
  * and fails on any HUGEINT/UHUGEINT output column.
  *
  * Needs python3 + duckdb + the sf0.001 testdata; cancels (does not
  * fail) where those are absent so `sbt test` stays portable.
  */
class OracleTypesSpec extends AnyFunSuite {

  test("no oracle SQL output column is HUGEINT-typed") {
    val sfDir = "/root/testdata/sf0.001"
    assume(Files.isDirectory(Paths.get(sfDir)), "testdata not present")
    val duckdbOk =
      try Seq("python3", "-c", "import duckdb").! == 0
      catch { case _: java.io.IOException => false }
    assume(duckdbOk, "python3+duckdb not available")

    val json = SparkSpec.tempDir("oracle-types")
      .resolve("oracle_sql.json").toString
    Verify.main(Array("--sql-only", json))

    val out = new StringBuilder
    val code = Seq("python3", "scripts/check_oracle_types.py", json, sfDir)
      .!(ProcessLogger(l => out.append(l).append('\n')))
    assert(code == 0, s"HUGEINT guard failed:\n$out")
    assert(out.toString.contains("no HUGEINT output columns"))
  }

  test("guard catches a seeded HUGEINT regression") {
    val sfDir = "/root/testdata/sf0.001"
    assume(Files.isDirectory(Paths.get(sfDir)), "testdata not present")
    val duckdbOk =
      try Seq("python3", "-c", "import duckdb").! == 0
      catch { case _: java.io.IOException => false }
    assume(duckdbOk, "python3+duckdb not available")

    // the exact shape of round 6's bug: SUM over a BIGINT with no cast
    val seeded = """{"seeded": "SELECT l_returnflag, SUM(l_orderkey) AS s
      |FROM lineitem GROUP BY 1"}""".stripMargin.replace("\n", " ")
    val json = SparkSpec.tempDir("oracle-types-seed")
      .resolve("oracle_sql.json")
    Files.writeString(json, seeded)
    val out = new StringBuilder
    val code = Seq("python3", "scripts/check_oracle_types.py",
      json.toString, sfDir).!(ProcessLogger(l => out.append(l).append('\n')))
    assert(code == 1, "guard must exit 1 on a HUGEINT column")
    assert(out.toString.contains("seeded"))
  }
}

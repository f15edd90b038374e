package graft

import org.apache.spark.sql.functions._

import graft.tools.CatalogAudit

/** The catalog-wide plan audit as a FAILING gate (the `runMain` tool
  * prints the same findings for interactive review): any catalog entry
  * whose physical plan grows a non-allowlisted scale-killer — unbounded
  * cartesian, partitionless window over unbounded input, global sort
  * over known-big input — turns this suite red. Plus red-on-injection
  * probes proving the detector actually fires.
  */
class CatalogAuditSpec extends SparkSpec {

  private def withStaticPlans[T](body: => T): T = {
    // AdaptiveSparkPlanExec hides its children until execution; the audit
    // walks static plans
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("every catalog query plan is free of non-allowlisted scale-killers") {
    val findings = withStaticPlans(CatalogAudit.auditAll(spark, sfDir))
    assert(findings.size === SparkEntry.queries.size)
    val bad = findings.filterNot(_.ok)
    assert(bad.isEmpty, "flagged plans:\n" + bad.mkString("\n"))
  }

  test("the detector fires on an injected partitionless window") {
    // spark.range carries a KNOWN size estimate (8 bytes/row): 100M rows
    // ≈ 800 MB sits far over the 64 MB bounded-frame cutoff. Plan-only —
    // nothing executes.
    val f = withStaticPlans(CatalogAudit.auditOne(
      "injected_window", spark, sfDir, (s, _) =>
        s.range(100000000L).withColumn("rn",
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("id"))))))
    assert(f.error.isEmpty && f.bigWin >= 1 && !f.ok,
      s"expected a window flag, got $f")
  }

  test("the detector fires on a constant-partition (foldable) window") {
    // partitionBy(lit(1)) is physically the same single task as no
    // partition at all and must count the same
    val f = withStaticPlans(CatalogAudit.auditOne(
      "injected_const_window", spark, sfDir, (s, _) =>
        s.range(100000000L).withColumn("rn",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy(lit(1)).orderBy(col("id"))))))
    assert(f.error.isEmpty && f.bigWin >= 1 && !f.ok,
      s"expected a window flag, got $f")
  }

  test("the detector fires on an injected unbounded global sort") {
    val f = withStaticPlans(CatalogAudit.auditOne(
      "injected_sort", spark, sfDir, (s, _) =>
        s.range(100000000L).toDF().orderBy(col("id").desc)))
    assert(f.error.isEmpty && f.bigSort >= 1 && !f.ok,
      s"expected a sort flag, got $f")
  }

  test("the detector fires on an injected unbounded cartesian") {
    val f = withStaticPlans(CatalogAudit.auditOne(
      "injected_cartesian", spark, sfDir, (s, _) => {
        val big = s.range(100000000L)
        big.crossJoin(big.select(col("id").as("id2")))
      }))
    assert(f.error.isEmpty && f.bigCart >= 1 && !f.ok,
      s"expected a cartesian flag, got $f")
  }

  test("bounded shapes stay quiet: known-small sort, top-k over big input") {
    val quiet = withStaticPlans(CatalogAudit.auditOne(
      "bounded_sort", spark, sfDir, (s, _) =>
        s.range(100L).toDF().orderBy(col("id").desc)))
    assert(quiet.ok, s"known-small sort must not flag: $quiet")
    val topk = withStaticPlans(CatalogAudit.auditOne(
      "topk", spark, sfDir, (s, _) =>
        s.range(100000000L).toDF().orderBy(col("id").desc).limit(5)))
    assert(topk.ok, s"top-k compiles to TakeOrdered, must not flag: $topk")
  }
}

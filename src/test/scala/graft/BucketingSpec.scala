package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Bucketing

/** Bucketed co-located joins: the write-time layout must eliminate the
  * join/aggregation shuffle entirely, and results must equal the plain
  * shuffled form. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    SparkSpec.tempDir(prefix).toString

  test("bucketed big-big join plans with zero Exchange, same results") {
    val events = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("value"))
    val users = events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    Bucketing.writeBucketed(events, "b_events", tmp("graft-bkt-ev"),
      "user_id", buckets = 8)
    Bucketing.writeBucketed(users, "b_users", tmp("graft-bkt-us"),
      "user_id", buckets = 8)
    val be = Bucketing.readBucketed(spark, "b_events")
    val bu = Bucketing.readBucketed(spark, "b_users")
    // force a non-broadcast join so the shuffle would be visible if present
    val joined = be.join(bu.hint("shuffle_hash"), Seq("user_id"))
    val plan = joined.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"),
      s"bucketed join must be shuffle-free, got:\n$plan")
    // and the answer matches the plain (shuffling) formulation
    val expected = events.join(users.hint("shuffle_hash"), Seq("user_id"))
      .agg(count(lit(1)), sum(col("n_events"))).collect()(0)
    val got = joined.agg(count(lit(1)), sum(col("n_events"))).collect()(0)
    assert(got === expected)
  }

  test("aggregation on the bucket key is also shuffle-free") {
    val be = Bucketing.readBucketed(spark, "b_events")
    val agg = be.groupBy(col("user_id")).agg(sum(col("value")).as("s"))
    val plan = agg.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"),
      s"groupBy on the bucket key must reuse the write-time layout:\n$plan")
  }

  test("mismatched bucket counts fall back to a correct shuffled join") {
    val dim = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id")).distinct()
    Bucketing.writeBucketed(dim, "b_users_4", tmp("graft-bkt-u4"),
      "user_id", buckets = 4)
    val be = Bucketing.readBucketed(spark, "b_events")
    val bu4 = Bucketing.readBucketed(spark, "b_users_4")
    val joined = be.join(bu4.hint("shuffle_hash"), Seq("user_id"))
    // correctness never depends on the layout
    assert(joined.count() === be.count())
  }
}

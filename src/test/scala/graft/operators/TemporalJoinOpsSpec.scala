package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TemporalJoinOpsSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("leftAsof: latest-at-or-before semantics, inclusive ties, null when none") {
    import spark.implicits._
    val build = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, ts("2024-01-01 12:00:00"), 12.0),
      (2L, ts("2024-01-01 11:00:00"), 99.0)
    ).toDF("k", "t", "v")
    val probe = Seq(
      (1L, ts("2024-01-01 09:00:00"), "before-any"),
      (1L, ts("2024-01-01 10:00:00"), "tie-inclusive"),
      (1L, ts("2024-01-01 11:30:00"), "between"),
      (1L, ts("2024-01-01 13:00:00"), "after-all"),
      (3L, ts("2024-01-01 13:00:00"), "no-build-key")
    ).toDF("k", "t", "tag")
    val out = AsofJoin.leftAsof(probe, build, "k", "t", Seq("v"))
      .select(col("tag"), col("asof.v"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap
    assert(out("before-any") == null)
    assert(out("tie-inclusive") == 10.0) // build at equal ts IS visible
    assert(out("between") == 10.0)
    assert(out("after-all") == 12.0)
    assert(out("no-build-key") == null)
    assert(out.size == 5) // every probe row survives (left semantics)
  }

  test("pointsInIntervals: half-open [lo, hi), cross-bucket intervals, overlap") {
    import spark.implicits._
    val iv = Seq(
      (1L, ts("2024-01-01 06:00:00"), ts("2024-01-03 06:00:00")), // spans 3 day-buckets
      (2L, ts("2024-01-02 00:00:00"), ts("2024-01-02 12:00:00"))  // overlaps iv 1
    ).toDF("window_id", "lo", "hi")
    val pts = Seq(
      ts("2024-01-01 05:59:59"), // before iv1
      ts("2024-01-01 06:00:00"), // == lo: included
      ts("2024-01-02 06:00:00"), // inside both
      ts("2024-01-03 06:00:00"), // == hi of iv1: excluded
      ts("2024-01-05 00:00:00")  // outside all
    ).toDF("p")
    val got = RangeJoin.pointsInIntervals(pts, "p", iv, "lo", "hi")
      .groupBy("window_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 1L))
  }

  test("pointsInIntervals plans an equi-join, not a nested-loop join") {
    import spark.implicits._
    val iv = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")))
      .toDF("window_id", "lo", "hi")
    val pts = Seq(ts("2024-01-01 12:00:00")).toDF("p")
    val plan = RangeJoin.pointsInIntervals(pts, "p", iv, "lo", "hi")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to an all-pairs plan:\n$plan")
  }
}

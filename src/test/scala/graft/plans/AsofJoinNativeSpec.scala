package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.TemporalJoins

class AsofJoinNativeSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("native asof: latest-at-or-before, inclusive ties, null when none") {
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
    val out = AsofJoinNative.leftAsof(probe, build, "k", "t", Seq("v"))
      .select(col("tag"), col("v"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap
    assert(out("before-any") == null)
    assert(out("tie-inclusive") == 10.0)
    assert(out("between") == 10.0)
    assert(out("after-all") == 12.0)
    assert(out("no-build-key") == null)
    assert(out.size == 5)
  }

  test("native asof matches the union+window rewrite on the events table") {
    val a = TemporalJoins.q26_asof_join.run(spark, "/root/testdata/sf0.001")
    val b = TemporalJoins.q26b_asof_native.run(spark, "/root/testdata/sf0.001")
    assert(a.columns.toSeq == b.columns.toSeq)
    val aRows = a.collect().toSeq
    val bRows = b.collect().toSeq
    assert(aRows.nonEmpty && aRows == bRows)
  }

  test("native asof plans AsofJoinExec: one exchange per side, no window, no BNLJ") {
    val plan = TemporalJoins.q26b_asof_native.run(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"strategy did not plan the native node:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"all-pairs plan:\n$plan")
    // the rewrite's cost the operator removes: a Window over the unioned rows
    assert(!plan.contains("Window"), s"window survived in the native plan:\n$plan")
    // 3 = one per join side + the build side's own (user_id, ts) pre-agg,
    // which belongs to the query (build-side uniqueness), not the operator
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 3, s"expected exactly 3 hash exchanges, got $exchanges:\n$plan")
  }

  test("native asof itself costs one exchange + sort per side") {
    import spark.implicits._
    val build = Seq((1L, ts("2024-01-01 10:00:00"), 10.0)).toDF("k", "t", "v")
    val probe = Seq((1L, ts("2024-01-01 11:00:00"), "x")).toDF("k", "t", "tag")
    val plan = AsofJoinNative.leftAsof(probe, build, "k", "t", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected exactly 2 hash exchanges, got $exchanges:\n$plan")
    assert(!plan.contains("Window"))
  }

  test("probe-side filter still reaches the parquet scan below the native node") {
    val plan = TemporalJoins.q26b_asof_native.run(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert("PushedFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined,
      s"scan lost its pushed filters:\n$plan")
  }
}

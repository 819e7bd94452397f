package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.Tables

/** q39_bucket_join's claim is physical, not semantic: the fact-fact join
  * must consume the bucketed layout — no exchange on the join key, scans
  * bucket-aware — and still agree with the plain (shuffled) join.
  */
class BucketJoinSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("q39 joins bucketed tables with no exchange on the join key") {
    val df = graft.SparkEntry.queries("q39_bucket_join")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(c_custkey"),
      s"bucketed join must not shuffle the join key:\n$plan")
    assert(plan.contains("Bucketed: true"),
      s"scans must be bucket-aware:\n$plan")
    assert(plan.contains("SortMergeJoin"),
      s"co-located plan should be a sort-merge join:\n$plan")
  }

  test("q39 result equals the plain shuffled join") {
    val got = graft.SparkEntry.queries("q39_bucket_join")(spark, sfDir)
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val want = Tables.load(spark, sfDir, "customer")
      .join(Tables.load(spark, sfDir, "orders"),
        col("c_custkey") === col("o_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("rev"))
      .orderBy("c_mktsegment")
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got == want)
  }
}

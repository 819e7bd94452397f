package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** g_pagerank: exact-integer PageRank over the near-dup graph — the
  * canonical-representative scorer. The oracle proves the values; these
  * pin the plan shape and the structural invariants.
  */
class PageRankSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("feed is the stored signature index: no text, no simhash kernel in the plan") {
    val df = graft.SparkEntry.queries("g_pagerank")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("simhash63"), s"pair feed must not re-kernel:\n$plan")
    assert(!plan.toLowerCase.contains("text#"), s"plan must never read text:\n$plan")
  }

  test("nodes are exactly the duplicate-graph members; scores sit above the teleport base") {
    val pr = graft.SparkEntry.queries("g_pagerank")(spark, sfDir)
    val rows = pr.collect()
    assert(rows.nonEmpty)
    // every node keeps at least the teleport mass (all-positive algebra)
    assert(rows.forall(_.getLong(1) >= 150000000000L))
    // node set == docs having at least one near-dup edge == docs whose
    // d_dup_clusters cluster has >1 member
    val nodes = rows.map(_.getLong(0)).toSet
    val cl = graft.SparkEntry.queries("d_dup_clusters")(spark, sfDir)
      .groupBy("cluster").agg(collect_list("doc_id").as("ms"))
      .filter(size(col("ms")) > 1)
      .select(explode(col("ms")).as("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(nodes == cl,
      s"PageRank node set must equal multi-member cluster membership: ${nodes.size} vs ${cl.size}")
  }

  test("deterministic: two evaluations byte-identical") {
    val a = graft.SparkEntry.queries("g_pagerank")(spark, sfDir).collect().toSeq
    val b = graft.SparkEntry.queries("g_pagerank")(spark, sfDir).collect().toSeq
    assert(a == b)
  }
}

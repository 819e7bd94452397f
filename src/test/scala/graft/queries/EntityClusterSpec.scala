package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The entity cluster-resolution composition (d_entity_clusters /
  * d_entity_golden): the planted fixture's structure holds — every
  * 3-member group resolves to ONE cluster even though the (member 1,
  * member 2) pair is edit distance 2 and therefore ABSENT from the
  * ed<=1 pair feed (the closure, not the matcher, finds it) — and the
  * golden record's survivorship is deterministic.
  */
class EntityClusterSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("planted groups resolve to one cluster; the dist-2 member pair is closure-only") {
    val ents = NorthStar.clusterEnts(
      graft.tables.Tables.load(spark, sfDir, "customer"))
    // the pair feed (in-query kernel here; the query row uses the stored
    // index, whose equality to the in-query kernel FastSsIndexSpec pins)
    val pairs = NorthStar.fastSsMatch(ents, tau = 1)
    val pairSet = pairs.select("a_key", "b_key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // members 1 and 2 of (almost) every group are dist 2 — not a pair
    val names = ents.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val groups = names.keys.groupBy(_ / 3).filter(_._2.size == 3)
    val closureOnly = groups.keys.count { g =>
      val m1 = g * 3 + 1; val m2 = g * 3 + 2
      !pairSet.contains((m1, m2))
    }
    assert(closureOnly > groups.size / 2,
      "fixture degenerated: most (m1, m2) pairs should be closure-only (ed 2)")
    // the resolution puts all three members in one cluster anyway
    val d = NorthStar.d_entity_clusters.run(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    groups.keys.foreach { g =>
      val labels = (0L to 2L).map(m => d.get(g * 3 + m))
      assert(labels.forall(_.isDefined) && labels.distinct.size == 1,
        s"group $g not resolved to one cluster: $labels")
      assert(labels.head.get == g * 3, s"cluster label must be the min key of group $g")
    }
  }

  test("golden record survivorship: rep attributes + cluster max balance, one row per cluster") {
    val golden = NorthStar.d_entity_golden.run(spark, sfDir).collect()
    val cust = graft.tables.Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_nationkey").cast("long"),
        col("c_mktsegment"), expr("cast(round(c_acctbal * 100) as bigint)"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getLong(3)))).toMap
    assert(golden.nonEmpty)
    assert(golden.map(_.getLong(0)).distinct.length == golden.length,
      "one golden record per cluster")
    golden.foreach { r =>
      val cluster = r.getLong(0)
      val (repNat, repSeg, _) = cust(cluster)
      assert(r.getLong(1) == repNat && r.getString(2) == repSeg,
        s"rep attributes must come from the min-key member of $cluster")
      val members = (cluster until cluster + r.getLong(4)).map(cust(_)._3)
      assert(r.getLong(3) == members.max,
        s"max_acctbal_cents must be the cluster max for $cluster")
    }
  }
}

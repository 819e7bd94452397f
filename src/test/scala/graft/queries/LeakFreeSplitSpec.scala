package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The leakage-free split's defining property: no near-duplicate pair may
  * straddle a split boundary — the failure mode of plain hash splits that
  * silently inflates eval scores with memorized train content.
  */
class LeakFreeSplitSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("no near-dup pair straddles a split; singletons follow the plain hash rule") {
    val split = graft.SparkEntry.queries("t_split_leakfree")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    // the resolved clusters (same pair graph the split keyed on)
    val clusters = graft.SparkEntry.queries("d_dup_clusters")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val multi = clusters.groupBy(_._2).filter(_._2.length > 1)
    assert(multi.nonEmpty, "fixture must contain multi-member clusters")
    multi.foreach { case (cluster, members) =>
      val splits = members.map(m => split(m._1)).distinct
      assert(splits.size == 1,
        s"cluster $cluster straddles splits $splits (members ${members.map(_._1).toSeq})")
    }

    // clustered docs deviate from the plain doc_id % 10 rule exactly when
    // their representative differs — singletons never do
    val clustered = clusters.map(_._1).toSet
    def ruleOf(key: Long): String =
      if (key % 10 < 8) "train" else if (key % 10 == 8) "val" else "test"
    split.foreach { case (doc, sp) =>
      if (!clustered.contains(doc))
        assert(sp == ruleOf(doc), s"singleton $doc split $sp != ${ruleOf(doc)}")
    }

    // and the split is non-degenerate: all three splits populated
    assert(split.values.toSet == Set("train", "val", "test"))
  }
}

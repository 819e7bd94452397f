package graft.queries

import graft.SparkSpec

/** The Bloom pre-filter is pruning, never semantics: t_decontam_bloom must
  * return byte-identical rows to t_decontam (no false negatives — the
  * filter's guarantee — and false positives die in the exact join).
  */
class DecontamBloomSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("bloom-prefiltered decontamination equals the exact join") {
    val exact = graft.SparkEntry.queries("t_decontam")(spark, sfDir)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    val bloom = graft.SparkEntry.queries("t_decontam_bloom")(spark, sfDir)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    assert(bloom == exact)
  }
}

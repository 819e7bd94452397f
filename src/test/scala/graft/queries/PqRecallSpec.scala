package graft.queries

import graft.SparkSpec

/** PQ behavior proof: a vector nearly identical to the probe must encode to
  * the probe's own codes in every subspace, so its ADC score ties the
  * probe's — the planted near-duplicate is always retrieved.
  */
class PqRecallSpec extends SparkSpec {

  test("s_ann_pq retrieves a planted near-duplicate at the probe's own score") {
    import spark.implicits._
    val dim = 64
    def base(seed: Int): Seq[Float] =
      Seq.tabulate(dim)(d => math.sin(d * 0.37 + seed * 2.1).toFloat)
    val probe = base(1)
    val planted = probe.updated(5, probe(5) + 1e-5f)
    // ids 1..8 form the codebook (probe itself is id 1); 9 = planted near-dup;
    // 10..12 = far fillers
    val rows =
      (1 to 8).map(i => (i.toLong, base(i), i)) ++
        Seq((9L, planted, 9)) ++
        (10 to 12).map(i => (i.toLong, base(i * 7 + 3), i))
    val tmp = java.nio.file.Files.createTempDirectory("graft_pq_").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val got = NorthStar.s_ann_pq.run(spark, tmp).collect()
    val byId = got.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byId.contains(1L) && byId.contains(9L),
      s"probe and planted near-dup must be in the top-5, got ${got.mkString(", ")}")
    assert(byId(1L) == byId(9L),
      s"identical codes must tie the ADC score: probe=${byId(1L)} planted=${byId(9L)}")
    assert(got.take(2).map(_.getLong(0)).toSet == Set(1L, 9L),
      s"probe + planted should rank top-2, got ${got.mkString(", ")}")
  }
}

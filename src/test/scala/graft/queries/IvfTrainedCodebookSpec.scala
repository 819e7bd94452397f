package graft.queries

import graft.SparkSpec
import graft.operators.IvfIndex

/** The frozen codebook must BE the trained artifact: a fresh
  * IvfIndex.train run on the sf0.01 embeddings (deterministic sample /
  * init / iterations) has to reproduce [[TrainedIvfCodebook.centroids]]
  * bit-for-bit, which is what entitles s_ann_ivf_trained's oracle to call
  * itself a check of the TRAINED index. If training or the testdata
  * changes, rerun `runMain graft.tools.FreezeIvfCodebook` and re-freeze.
  */
class IvfTrainedCodebookSpec extends SparkSpec {

  test("frozen literals == fresh k-means train at sf0.01, bit-for-bit") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val got = IvfIndex.train(emb, "vec_id", "embedding", k = 16)
      .centroids.map(_.map(_.toFloat).toSeq)
    assert(got.length == TrainedIvfCodebook.centroids.length)
    for (c <- got.indices)
      assert(got(c) == TrainedIvfCodebook.centroids(c), s"centroid $c diverged")
  }

  test("s_ann_ivf_trained returns the probe itself first at sf0.001") {
    val out = NorthStar.s_ann_ivf_trained.run(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 5)
    assert(out.head.getLong(0) == 1L, "probe vec_id=1 must be its own nearest neighbor")
    assert(out.head.getDouble(1) == 1.0)
  }
}

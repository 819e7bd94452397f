package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Vectors
import graft.tables.Tables

/** Measured ANN recall vs the exact cosine top-k (round 1 flagged recall as
  * unknown). On this corpus the probe's true neighbors sit barely above the
  * background similarity (~0.37 vs ~0.35), which is the regime where
  * hyperplane LSH has provably weak discrimination — the IVF index (argmax
  * coarse quantization + nProbe=2) is the structure that still achieves
  * full recall, and that asymmetry is the point of shipping both.
  */
class AnnRecallSpec extends SparkSpec {

  private def exactTopK(sfDir: String, k: Int): Seq[Long] = {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val probe = emb.filter(col("vec_id") === 1).select(col("embedding").as("pe"))
    emb.crossJoin(broadcast(probe))
      .select(col("vec_id"), Vectors.cosineSim(col("embedding"), col("pe")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k).collect().map(_.getLong(0)).toSeq
  }

  private def recall(got: Seq[Long], want: Seq[Long]): Double =
    want.count(got.contains(_)).toDouble / want.size

  for (sfDir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    val sf = sfDir.split('/').last

    test(s"IVF achieves full top-5 recall at $sf") {
      val want = exactTopK(sfDir, 5)
      val got = NorthStar.s_ann_ivf.run(spark, sfDir).collect().map(_.getLong(0)).toSeq
      val r = recall(got, want)
      info(s"s_ann_ivf recall@5 at $sf = $r (got=$got want=$want)")
      assert(r == 1.0, s"IVF nProbe=2 should recover the exact top-5 here; recall=$r")
    }

    test(s"multi-probe LSH recall at $sf is measured and finds the probe") {
      val want = exactTopK(sfDir, 5)
      val got = NorthStar.s_ann_lsh.run(spark, sfDir).collect().map(_.getLong(0)).toSeq
      val r = recall(got, want)
      info(s"s_ann_lsh recall@5 at $sf = $r (got=$got want=$want)")
      // near-orthogonal neighbors defeat sign-bit LSH; the floor we pin is
      // that the probe itself (sim=1) is always recovered
      assert(got.contains(1L))
      assert(r >= 0.2)
    }
  }
}

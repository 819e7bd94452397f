package graft.tools

import graft.operators.IvfIndex

/** Regenerates the frozen [[graft.queries.TrainedIvfCodebook]] literals:
  * trains the K=16 spherical k-means coarse quantizer (IvfIndex.train —
  * deterministic sample, init, iteration count) on an embeddings table and
  * prints the centroid rows as Scala source, float-cast exactly as
  * IvfIndex.assign would cast them. Run with the sf dir as the argument
  * (default /root/testdata/sf0.01, the correctness-gate scale);
  * IvfTrainedCodebookSpec asserts the checked-in literals match a fresh
  * train run bit-for-bit.
  */
object FreezeIvfCodebook {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.engine.Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cb = IvfIndex.train(emb, "vec_id", "embedding", k = 16)
    val rows = cb.centroids.map(c =>
      c.map(v => s"${v.toFloat}f").mkString("    Seq(", ", ", ")"))
    println(rows.mkString("  val centroids: Seq[Seq[Float]] = Seq(\n", ",\n", ")"))
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Vectors
import graft.operators.PqIndex
import graft.tables.Tables

/** Measures the filtered-vector-search regimes (VERDICT r10 task 4: "the
  * pre/post-filter trade measured once"):
  *
  *   1. inline pre-filter  — exact cosine over the label-filtered RAW
  *      embeddings (s_ann_filtered's plan): exact, but rescans float
  *      vectors per query;
  *   2. stored pre-filter  — label-partitioned PQ code table, pruning +
  *      ADC (s_ann_filtered_index's plan): reads ~1/|labels| of an
  *      M-bytes-a-vector table;
  *   3. post-filter        — ADC shortlist over the WHOLE code table,
  *      label filter applied to the shortlist afterwards: index-speed but
  *      recall-lossy (shortlist members outside the label are wasted
  *      slots) — the count of surviving answers quantifies the loss.
  *
  * Usage: runMain graft.tools.FilteredAnnRun [sfDir]
  */
object FilteredAnnRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.engine.Sessions.local()
    val emb = Tables.load(spark, sfDir, "embeddings")
    val cb = PqIndex.codebookOf(emb)
    val probeV: Seq[Float] = emb.filter(col("vec_id") === 1)
      .select("embedding").collect().head.getSeq[Float](0)
    val lut = PqIndex.adcLut(probeV, cb)

    val lblPath = java.nio.file.Files.createTempDirectory("graft_fann_lbl_").toString + "/idx"
    PqIndex.buildPartitioned(emb, cb, lblPath, partCol = "label")
    val flatPath = java.nio.file.Files.createTempDirectory("graft_fann_flat_").toString + "/idx"
    PqIndex.build(emb, cb, flatPath)

    def inlinePre: DataFrame = {
      val probe = emb.filter(col("vec_id") === 1).select(col("embedding").as("pe"))
      emb.filter(col("label") === 3).crossJoin(broadcast(probe))
        .select(col("vec_id"),
          round(Vectors.cosineSim(col("embedding"), col("pe")), 3).as("sim"))
        .orderBy(col("sim").desc, col("vec_id")).limit(5)
    }
    def storedPre: DataFrame =
      PqIndex.queryWhere(spark, lblPath, lut, topN = 5, pred = col("label") === 3)
    def postFilter: DataFrame = {
      // shortlist from the whole table, THEN filter — the lossy regime
      val short = PqIndex.query(spark, flatPath, lut, topN = 5)
      short.join(emb.select("vec_id", "label"), "vec_id")
        .filter(col("label") === 3).select("vec_id", "asim")
    }

    def timeMedian(name: String, mk: () => DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val ts = (1 to 5).map(_ => once()).sorted
      println(f"[filtered-ann] $name%-12s median ${ts(2)}%.3f s  (runs: ${ts.map(t => f"$t%.3f").mkString(" ")})")
      ts(2)
    }

    timeMedian("inline-pre", () => inlinePre)
    timeMedian("stored-pre", () => storedPre)
    timeMedian("post-filter", () => postFilter)
    val surviving = postFilter.count()
    println(s"[filtered-ann] post-filter recall loss: $surviving of 5 shortlist slots survive the label filter")
    spark.stop()
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** On-disk IVF-PQ — the composed production vector index (FAISS IndexIVFPQ
  * persisted): the PQ code table of [[PqIndex]] written PARTITIONED BY the
  * coarse inverted-list id, so a query's nProbe list restriction is not a
  * post-scan filter but literal PARTITION PRUNING — unmatched list
  * directories are never listed into tasks, and the scan reads ~nProbe/K
  * of the stored bytes. At 100 TB that directory structure IS the inverted
  * index: each list's codes are co-located, M bytes a vector, and a query
  * touches nProbe directories of small files.
  *
  * Same determinism lattice as `s_ann_ivfpq` (9-dp quantized cosine
  * assignment with ties to the smaller centroid id; 9-dp ADC) — the stored
  * lifecycle returns byte-identical results to the inline query, which
  * IvfPqIndexSpec asserts along with the pruned-scan plan shape.
  */
object IvfPqIndex {
  val KCoarse = 16
  val NProbe = 2

  /** Frozen coarse centroids: embedding rows vec_id <= KCoarse (bounded
    * collect, the TrainedIvfCodebook discipline).
    */
  def centroidsOf(emb: DataFrame): Array[(Long, Seq[Float])] =
    emb.filter(col("vec_id") <= KCoarse).orderBy("vec_id")
      .select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))

  /** Coarse assignment column: argmax of 9-dp-quantized cosine, ties to
    * the smaller centroid id (negated-id struct max).
    */
  def coarseList(cents: Array[(Long, Seq[Float])]): Column = {
    val simStructs = cents.map { case (ccid, v) =>
      struct(round(Vectors.cosineSim(col("embedding"), typedlit(v)), 9).as("sim"),
        lit(-ccid).as("nccid"))
    }
    -array_max(array(simStructs.toSeq: _*)).getField("nccid")
  }

  private def codeTable(emb: DataFrame, cents: Array[(Long, Seq[Float])],
                        cb: Array[Seq[Float]]): DataFrame =
    emb.withColumn("list", coarseList(cents))
      .select(col("vec_id") +: col("list") +: PqIndex.codeColumns(cb): _*)

  /** Assign + encode the corpus once; write the code table partitioned by
    * coarse list. One pass: K cosine + M x KC sub-distances per vector,
    * never again after build.
    */
  def build(emb: DataFrame, cents: Array[(Long, Seq[Float])],
            cb: Array[Seq[Float]], path: String): Unit =
    codeTable(emb, cents, cb)
      .write.partitionBy("list").mode("overwrite").parquet(path)

  /** Assign + encode ONLY a delta against the FROZEN coarse centroids and
    * codebook; append its codes into the same list directories. Both
    * quantizers are frozen by design, so appended rows land in the correct
    * partition directory and partition pruning keeps working unchanged —
    * per-crawl cost is delta-sized, not corpus-sized (the
    * [[SignatureIndex.ingest]] discipline; IvfPqIndexSpec chains batches
    * and pins byte-equality with a from-scratch build).
    */
  def ingest(emb: DataFrame, cents: Array[(Long, Seq[Float])],
             cb: Array[Seq[Float]], path: String): Unit =
    codeTable(emb, cents, cb)
      .write.partitionBy("list").mode("append").parquet(path)

  /** The probe's top-nProbe coarse lists, on the same 9-dp lattice the
    * build assigned with — K cosines on the driver.
    */
  def probeLists(probe: Seq[Float], cents: Array[(Long, Seq[Float])]): Seq[Long] = {
    def round9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    cents.map { case (ccid, v) => (ccid, round9(cos(probe, v))) }
      .sortBy { case (ccid, sim) => (-sim, ccid) }
      .take(NProbe).map(_._1).toSeq
  }

  /** Approximate top-N for one probe from the STORED table: the list
    * restriction prunes partitions at planning (PartitionFilters, not a
    * post-scan filter), then ADC ranks the surviving codes.
    */
  def query(spark: SparkSession, path: String, probe: Seq[Float],
            cents: Array[(Long, Seq[Float])], cb: Array[Seq[Float]],
            topN: Int): DataFrame =
    PqIndex.adcRank(
      spark.read.parquet(path).filter(col("list").isin(probeLists(probe, cents): _*)),
      PqIndex.adcLut(probe, cb), topN)
}

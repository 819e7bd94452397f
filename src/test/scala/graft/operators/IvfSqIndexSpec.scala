package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.Tables

/** IVF-SQ's composition guarantees: the probe reads only its nProbe
  * `list=` partitions (structural pruning), answers match the inline
  * assign-filter-encode-rank twin, both frozen quantizers make ingest
  * append-only, and forget follows the family contract.
  */
class IvfSqIndexSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def emb = Tables.load(spark, sfDir, "embeddings")
  private def cents = IvfPqIndex.centroidsOf(emb)

  private def probeVec: Seq[Float] = cents.find(_._1 == 1L).get._2

  private def inlineTwin(topN: Int): Seq[org.apache.spark.sql.Row] = {
    val cs = cents
    val scale = SqIndex.train(emb)
    val cand = emb.withColumn("list", IvfPqIndex.coarseList(cs))
      .filter(col("list").isin(IvfPqIndex.probeLists(probeVec, cs): _*))
    SqIndex.rank(SqIndex.encode(cand, scale),
      SqIndex.encodeVec(probeVec, scale), topN).collect().toSeq
  }

  test("stored query equals the inline assign-filter-encode-rank twin") {
    val path = Files.createTempDirectory("graft_ivfsq_par_").toString
    IvfSqIndex.build(emb, cents, SqIndex.train(emb), path)
    assert(IvfSqIndex.query(spark, path, probeVec, cents, topN = 5)
      .collect().toSeq == inlineTwin(5))
  }

  test("the probe scan is partition-pruned to <= nProbe list directories") {
    val path = Files.createTempDirectory("graft_ivfsq_prune_").toString
    IvfSqIndex.build(emb, cents, SqIndex.train(emb), path)
    val df = IvfSqIndex.query(spark, path, probeVec, cents, topN = 5)
    val scans = fileScans(df).filter(
      _.relation.location.rootPaths.exists(_.toString.contains("graft_ivfsq_prune_")))
    assert(scans.nonEmpty, "no code-table scan found")
    scans.foreach { scan =>
      assert(scan.partitionFilters.exists(_.toString.contains("list")),
        s"no list pruning: ${scan.partitionFilters}")
      assert(scan.selectedPartitions.partitionCount <= IvfPqIndex.NProbe,
        s"expected <= ${IvfPqIndex.NProbe} partitions, got ${scan.selectedPartitions.partitionCount}")
      assert(!scan.schema.fieldNames.contains("embedding"),
        "probe must never read the embedding column")
    }
  }

  test("build + ingest against both frozen quantizers equals from-scratch") {
    val cs = cents
    val scale = SqIndex.train(emb)
    val grown = Files.createTempDirectory("graft_ivfsq_grown_").toString
    IvfSqIndex.build(emb.filter(col("vec_id") % 2 === 0), cs, scale, grown)
    IvfSqIndex.ingest(emb.filter(col("vec_id") % 2 === 1), cs, grown)
    val scratch = Files.createTempDirectory("graft_ivfsq_scratch_").toString
    IvfSqIndex.build(emb, cs, scale, scratch)
    assert(spark.read.parquet(grown).orderBy("vec_id").collect().toSeq ==
      spark.read.parquet(scratch).orderBy("vec_id").collect().toSeq)
  }

  test("forget equals never-ingested; compact reclaims, keeps layout + scale") {
    val cs = cents
    val scale = SqIndex.train(emb)
    val full = Files.createTempDirectory("graft_ivfsq_fgt_").toString
    IvfSqIndex.build(emb, cs, scale, full)
    IvfSqIndex.forget(spark, full,
      emb.filter(col("vec_id") % 2 === 0).select("vec_id"))
    val half = Files.createTempDirectory("graft_ivfsq_half_").toString
    IvfSqIndex.build(emb.filter(col("vec_id") % 2 === 1), cs, scale, half)
    val afterForget = IvfSqIndex.query(spark, full, probeVec, cs, topN = 5).collect().toSeq
    assert(afterForget == IvfSqIndex.query(spark, half, probeVec, cs, topN = 5).collect().toSeq)
    IndexMaintenance.compact(spark, full, partitionCols = Seq("list"))
    assert(SqIndex.readScale(spark, full) == scale,
      "_scale sidecar must survive the list-partitioned compaction")
    assert(new java.io.File(full).listFiles().exists(_.getName.startsWith("list=")),
      "compaction must preserve the list= partition layout")
    assert(IvfSqIndex.query(spark, full, probeVec, cs, topN = 5)
      .collect().toSeq == afterForget)
    assert(spark.read.parquet(full).filter(col("vec_id") % 2 === 0).count() == 0,
      "tombstoned rows must be physically reclaimed")
  }
}

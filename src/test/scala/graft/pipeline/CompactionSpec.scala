package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** p_compact's file-count claim — the oracle proves data fidelity; this
  * proves the files actually collapsed to the byte-derived target.
  */
class CompactionSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("compaction collapses an over-partitioned directory to the byte-sized target") {
    val base = Files.createTempDirectory("graft_compact_spec_").toString
    spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(64).write.parquet(s"$base/small")
    def parquetFiles(p: String): Array[org.apache.hadoop.fs.FileStatus] = {
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(path).filter(_.getPath.getName.endsWith(".parquet"))
    }
    val small = parquetFiles(s"$base/small")
    assert(small.length == 64, s"expected 64 small files, got ${small.length}")

    val totalBytes = small.map(_.getLen).sum
    val target = 4L * 1024 * 1024
    val nFiles = math.max(1L, (totalBytes + target - 1) / target).toInt
    spark.read.parquet(s"$base/small").repartition(nFiles)
      .write.parquet(s"$base/compacted")
    val compacted = parquetFiles(s"$base/compacted")
    assert(compacted.length == nFiles,
      s"expected $nFiles compacted files, got ${compacted.length}")
    assert(compacted.length < small.length)

    // byte-faithful: same rows, same content hash
    val a = spark.read.parquet(s"$base/small")
      .agg(count(lit(1)), sum(crc32(col("text")))).collect().head
    val b = spark.read.parquet(s"$base/compacted")
      .agg(count(lit(1)), sum(crc32(col("text")))).collect().head
    assert(a == b, s"content drift after compaction: $a vs $b")
  }
}

package graft.sinks

import org.apache.spark.sql.DataFrame

/** Parquet sink with the reference's output contract (operators R5/R6, O4/O5/
  * O10/O11): gzip compression, INT96 timestamps for Spectrum compatibility,
  * bounded output file size, optional Hive-style partitioning (R14).
  *
  * Row-group sizing (the reference's 250k-row chunks, convert.py:25-31) is
  * Spark's parquet.block.size — left at the 128 MB default, which supersedes
  * the reference's heuristic (SURVEY §6).
  */
object ParquetSink {

  def write(df: DataFrame,
            path: String,
            partitionBy: Seq[String] = Nil,
            maxRecordsPerFile: Long = 0L,
            compression: String = "gzip",
            int96Timestamps: Boolean = true): Unit = {
    val spark = df.sparkSession
    val key = "spark.sql.parquet.outputTimestampType"
    val previous = spark.conf.getOption(key)
    if (int96Timestamps) spark.conf.set(key, "INT96")
    try {
      var w = df.write.mode("overwrite").option("compression", compression)
      if (maxRecordsPerFile > 0) w = w.option("maxRecordsPerFile", maxRecordsPerFile)
      if (partitionBy.nonEmpty) w = w.partitionBy(partitionBy: _*)
      w.parquet(path)
    } finally {
      previous match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}

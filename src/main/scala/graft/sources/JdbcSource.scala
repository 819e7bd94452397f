package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Live-database source (reference operator R1's real entry point: the
  * reference runs `UNLOAD ('select * from {table}')` over a DB connection,
  * export.py:10-17, 28-34 — its predicate-pushdown extension point is a
  * WHERE clause spliced into that SQL, examples/weekly_partitions.py:77-104).
  *
  * Spark-first equivalent: a JDBC relation. Catalyst pushes filters and
  * column pruning into the generated remote SQL (R13 for free — check
  * `PushedFilters` on the scan), and `partitionOptions` turns the single
  * remote cursor into N parallel range-partitioned cursors — the knob that
  * matters at scale, where one connection is the bottleneck.
  */
object JdbcSource {

  def read(spark: SparkSession, url: String, table: String,
           options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(options)
      .load()

  /** Parallel read: one task per `numPartitions` range slice of
    * `partitionColumn` — the JDBC equivalent of one-task-per-file.
    */
  def partitionOptions(partitionColumn: String, lowerBound: Long,
                       upperBound: Long, numPartitions: Int): Map[String, String] =
    Map(
      "partitionColumn" -> partitionColumn,
      "lowerBound" -> lowerBound.toString,
      "upperBound" -> upperBound.toString,
      "numPartitions" -> numPartitions.toString)
}

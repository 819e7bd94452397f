package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{EventAnalytics, NorthStar, PipelineQueries, Query, Relational, StreamingQueries, TemporalJoins}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine's committed query surface: SURVEY §2.3 Q1–Q24 (relational +
  * north-star) plus the training-data-pipeline operators (dedup families,
  * similarity search, text analysis, windowing, binary plumbing).
  */
object SparkEntry {

  val catalog: Seq[Query] =
    Relational.all ++ NorthStar.all ++ TemporalJoins.all ++
      EventAnalytics.all ++ PipelineQueries.all ++ StreamingQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q5_agg.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for ops whose hashing primitives
    * (xxhash64) DuckDB lacks — driver records a rows-only check for those.
    */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Subset benchmarked per round (Bench.scala). */
  def headlineQueries: Seq[Query] = catalog.filter(_.headline)
}

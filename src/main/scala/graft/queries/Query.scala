package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named engine query: a Spark DataFrame program plus (optionally) the
  * equivalent ANSI SQL the DuckDB oracle runs on the same parquet tables.
  *
  * Contract discipline (SURVEY.md §2.3): total ORDER BY over output columns,
  * ROUND on floating aggregates, identical output column names on both sides,
  * and explicit casts wherever Spark and DuckDB result types diverge
  * (row_number/length/extract -> BIGINT, FLOOR instead of CAST(double AS
  * BIGINT) because DuckDB rounds while Spark truncates, SUM(int) cast back to
  * BIGINT because DuckDB widens to HUGEINT).
  */
final case class Query(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * The reference engine's only "source" is a schema-driven scan
  * (reference: spectrify/export.py:10-17 delegates the scan to the source DB);
  * here the scan is a native parquet read so Catalyst gets column pruning and
  * filter pushdown for free — at 100 TB these tables would be directories of
  * many files and every query below still holds (scans parallelize per split).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEvents(df) else df
  }

  /** Normalize events.ts to a session-zoned TIMESTAMP whatever the parquet
    * physical type the generator chose (it has shipped both):
    *
    *   - timestamp[ns] surfaces as LongType under
    *     spark.sql.legacy.parquet.nanosAsLong=true (set in Sessions) —
    *     convert with `div 1000` integer division: `/` on two longs is
    *     Double division in Spark, and epoch nanos (~1e18) exceed Double's
    *     53-bit exact range, so a float round-trip can flip a microsecond
    *     and silently diverge from DuckDB's exact ns->us integer cast;
    *   - timestamp[us] (isAdjustedToUTC=false) surfaces as TIMESTAMP_NTZ —
    *     cast to TimestampType, value-preserving because the session zone
    *     is pinned to UTC (Sessions) and downstream functions
    *     (unix_micros, watermarks) require the zoned type.
    */
  def normalizeEvents(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema.find(_.name == "ts") match {
      case Some(f) if f.dataType == LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(f) if f.dataType == TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  /** Register every table as a temp view (used by tests and the CLI). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}

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

  /** events.ts is parquet timestamp[ns]; Spark reads nanos as LongType only
    * with spark.sql.legacy.parquet.nanosAsLong=true (set in Sessions). When it
    * arrives as a long, convert to a microsecond timestamp. `div` (integer
    * division) is essential: `/` on two longs is Double division in Spark, and
    * epoch nanos (~1e18) exceed Double's 53-bit exact range, so a float
    * round-trip can flip a microsecond and silently diverge from DuckDB's
    * exact ns->us integer cast.
    */
  private def normalizeEvents(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.LongType
    df.schema.find(_.name == "ts") match {
      case Some(f) if f.dataType == LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
  }

  /** Register every table as a temp view (used by tests and the CLI). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}

package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{PgBool, UnloadDialect}
import graft.schema.{RedshiftType, TableSchema}

/** Reader for the Redshift-unload CSV dialect (reference operators R2/R3/R4):
  * pipe-delimited, backslash-escaped, unquoted, gzipped, empty-string-as-NULL,
  * 't'/'f' booleans, ISO-8601 timestamps — optionally enumerated by a JSON
  * manifest {"entries": [{"url": ...}]} (reference spectrify/convert.py:97-99,
  * utils/s3.py:81-123).
  *
  * Scale notes: the file list feeds one DataFrameReader.csv(paths*) — Spark
  * schedules one task per split (the reference's multiprocessing.Pool
  * becomes task scheduling, R7); decompression streams (O6); the typed cast
  * layer is a per-column projection fused into the scan stage by codegen.
  * Corrupt values fail the job (FAILFAST + ANSI casts), matching the
  * reference's ValueError-on-bad-cell policy (convert.py:55).
  */
object UnloadCsv {

  /** Parse a JSON manifest into its entry URLs. Spark-side JSON reader keeps
    * this distributed-storage-agnostic (works on any Hadoop FS scheme).
    */
  def manifestEntries(spark: SparkSession, manifestPath: String): Seq[String] = {
    import spark.implicits._
    spark.read
      .option("multiLine", "true")
      .json(manifestPath)
      .select(explode(col("entries.url")).as("url"))
      .as[String]
      .collect()
      .toSeq
  }

  /** Read unload-dialect CSV files, applying the typed conversion layer.
    * The dialect (unquoted + backslash escapes) is parsed by the UnloadSplit
    * kernel over a plain text scan — general CSV parsers only honor escapes
    * inside quotes. Gzip decompression streams per split; empty -> NULL and
    * fail-fast-on-garbage live in the kernel + ANSI casts.
    */
  def read(spark: SparkSession, schema: TableSchema, paths: Seq[String],
           delimiter: Char = '|'): DataFrame = {
    val n = schema.fields.length
    val raw = spark.read.text(paths: _*)
      .select(UnloadDialect.unloadSplit(col("value"), delimiter, n).as("f"))
    val named = raw.select(schema.names.zipWithIndex.map {
      case (name, i) => col("f").getItem(i).as(name)
    }: _*)
    named.select(schema.fields.map { case (name, t) => typed(col(name), t).as(name) }: _*)
  }

  /** Read via a manifest, like the reference's ConcurrentManifestConverter. */
  def readManifest(spark: SparkSession, schema: TableSchema, manifestPath: String,
                   delimiter: Char = '|'): DataFrame =
    read(spark, schema, manifestEntries(spark, manifestPath), delimiter)

  /** The per-column cast expression table (reference convert.py:65-72,
    * timestamps.py:9-37). ANSI mode makes each cast fail-fast on garbage.
    */
  private[graft] def typed(c: Column, t: RedshiftType): Column = t match {
    case RedshiftType.RsBoolean => PgBool.pgBool(c)
    case other => c.cast(other.spark)
  }

  /** List part files under a CSV directory (non-manifest layout). */
  def listCsvParts(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq
      .filter(_.isFile)
      .map(_.getPath.toString)
      .filter(f => f.endsWith(".gz") || f.endsWith(".csv"))
      .sorted
  }
}

package graft.pipeline

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DateType, TimestampType}

import graft.ddl.SpectrumDdl
import graft.schema.TableSchema
import graft.sinks.ParquetSink
import graft.sources.UnloadCsv

/** Output-path layout mirroring the reference's SimpleS3Config
  * (utils/s3.py:51-78): `{base}/csv/` (+ `manifest`), `{base}/spectrum/`.
  * Plain paths — any Hadoop-FS scheme works (file://, s3a://, hdfs://).
  */
final case class PathConfig(basePath: String) {
  val csvDir: String = s"$basePath/csv"
  val manifestPath: String = s"$csvDir/manifest"
  val spectrumDir: String = s"$basePath/spectrum"
}

/** Unload-style CSV export (reference operator R1 re-expressed): instead of a
  * remote `UNLOAD` statement, any DataFrame is written in the exact unload
  * dialect (pipe-delimited, backslash-escaped, unquoted, gzip, 't'/'f'
  * booleans, empty-as-null) plus the JSON manifest enumerating part files
  * (export.py:10-17's output contract, manifest shape convert.py:97-99).
  */
object CsvExporter {

  def export(df: DataFrame, paths: PathConfig,
             maxRecordsPerFile: Long = 0L): Seq[String] = {
    val spark = df.sparkSession
    val stringified = df.select(df.schema.fields.toSeq.map { f =>
      val c = col(f.name)
      (f.dataType match {
        case BooleanType => when(c, "t").when(!c, "f") // null stays null -> ''
        case TimestampType => date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
        case DateType => date_format(c, "yyyy-MM-dd")
        case _ => c.cast("string")
      }).as(f.name)
    }: _*)
    // UNLOAD ESCAPE semantics: backslash-escape backslash + delimiter in
    // unquoted fields, NULL -> '' (embedded newlines are out of scope — the
    // reader is line-oriented, as is the reference's CSV stream).
    val escaped = stringified.schema.fieldNames.toSeq.map { n =>
      coalesce(regexp_replace(regexp_replace(col(n),
        "\\\\", "\\\\\\\\"), "\\|", "\\\\|"), lit(""))
    }
    val lines = stringified.select(concat_ws("|", escaped: _*).as("value"))
    var w = lines.write.mode("overwrite").option("compression", "gzip")
    if (maxRecordsPerFile > 0) w = w.option("maxRecordsPerFile", maxRecordsPerFile)
    w.text(paths.csvDir)
    writeManifest(spark, paths)
  }

  /** Enumerate written part files and emit the JSON manifest. */
  private def writeManifest(spark: SparkSession, paths: PathConfig): Seq[String] = {
    val parts = UnloadCsv.listCsvParts(spark, paths.csvDir)
    val entries = parts.map(p => s"""{"url": "$p"}""").mkString(", ")
    val json = s"""{"entries": [$entries]}"""
    val mp = new Path(paths.manifestPath)
    val fs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(mp, true)
    try out.write(json.getBytes(StandardCharsets.UTF_8)) finally out.close()
    parts
  }
}

/** The flagship three-stage pipeline (reference operator R11, transform.py:
  * 9-41): export -> convert -> create, sharing one reflected schema.
  *
  * Stage boundaries in Spark terms: each stage is a distributed job; the
  * reference's per-file multiprocessing Pool (R7) becomes task scheduling.
  */
final class TableTransformer(spark: SparkSession, sourceParquet: String,
                             paths: PathConfig, schemaName: String, tableName: String) {

  /** Schema reflected once from the source, shared by all stages
    * (transform.py:16) — validated against the supported-type whitelist.
    */
  lazy val schema: TableSchema =
    TableSchema.fromStructType(spark.read.parquet(sourceParquet).schema)

  /** Stage 1: source table -> unload-dialect CSV + manifest. */
  def exportToCsv(): Seq[String] = {
    schema // force fail-fast validation before any work (schema.py:38-44)
    CsvExporter.export(spark.read.parquet(sourceParquet), paths)
  }

  /** Stage 2: manifest-driven CSV -> typed, gzip, INT96 Parquet. */
  def convertToParquet(): Unit = {
    val typed = UnloadCsv.readManifest(spark, schema, paths.manifestPath)
    ParquetSink.write(typed, paths.spectrumDir)
  }

  /** Stage 3: external-table DDL over the converted data. */
  def createTableDdl(): String =
    SpectrumDdl.parquetTable(schemaName, tableName, schema, paths.spectrumDir)

  /** Run all three stages; returns the DDL (the reference executes it against
    * Redshift after an interactive confirm — here the caller decides).
    */
  def transform(): String = {
    exportToCsv()
    convertToParquet()
    createTableDdl()
  }
}

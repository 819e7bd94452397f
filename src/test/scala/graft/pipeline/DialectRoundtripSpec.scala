package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.schema.TableSchema
import graft.sources.UnloadCsv

/** Adversarial dialect round-trips: every character UNLOAD ESCAPE escapes
  * (delimiter, backslash, LF, CR) embedded in values, plus the byte-bounded
  * output-file contract (export.py:16's MAXFILESIZE).
  */
class DialectRoundtripSpec extends SparkSpec {

  test("values containing newline, CR, pipe and backslash round-trip") {
    import spark.implicits._
    val values = Seq(
      (1L, "plain"),
      (2L, "pipe|inside"),
      (3L, "back\\slash"),
      (4L, "line\nbreak"),
      (5L, "cr\rreturn"),
      (6L, "crlf\r\nboth"),
      (7L, "all|of\\them\nat\ronce\\|"),
      (8L, "trailing backslash\\"),
      (9L, null))
    val df = values.toDF("id", "s")
    val base = Files.createTempDirectory("dialect_rt_").toString
    val paths = PathConfig(base)
    CsvExporter.export(df, paths)
    val schema = TableSchema.fromStructType(df.schema)
    val back = UnloadCsv.readManifest(spark, schema, paths.manifestPath)
      .orderBy("id").collect()
    assert(back.length == values.length)
    values.sortBy(_._1).zip(back).foreach { case ((id, s), row) =>
      assert(row.getLong(0) == id)
      if (s == null) assert(row.isNullAt(1), s"id=$id expected null")
      else assert(row.getString(1) == s, s"id=$id")
    }
  }

  test("empty string exports as NULL (the universal ''-null rule)") {
    import spark.implicits._
    // the unload dialect cannot distinguish '' from NULL (convert.py:140-144)
    val df = Seq((1L, ""), (2L, "x")).toDF("id", "s")
    val base = Files.createTempDirectory("dialect_rt_").toString
    CsvExporter.export(df, PathConfig(base))
    val back = UnloadCsv.readManifest(spark, TableSchema.fromStructType(df.schema),
      PathConfig(base).manifestPath).orderBy("id").collect()
    assert(back(0).isNullAt(1) && back(1).getString(1) == "x")
  }

  test("maxFileBytes bounds output part files (MAXFILESIZE analog)") {
    import spark.implicits._
    val df = (1 to 10000).map(i => (i.toLong, "x" * 100)).toDF("id", "s").coalesce(1)
    val base = Files.createTempDirectory("dialect_rt_").toString
    // ~1 MB of 104-byte lines with a 64 KB bound -> many parts even from one task
    val parts = CsvExporter.export(df, PathConfig(base), maxFileBytes = 64 * 1024)
    assert(parts.size > 1, s"expected multiple bounded parts, got ${parts.size}")
    val back = UnloadCsv.readManifest(spark, TableSchema.fromStructType(df.schema),
      PathConfig(base).manifestPath)
    assert(back.count() == 10000)
  }
}

package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec

/** End-to-end pipeline test (R11): parquet source -> unload CSV + manifest ->
  * typed conversion -> spectrum parquet -> DDL, equality against the source.
  */
class TransformerSpec extends SparkSpec {

  test("transform() runs all three stages and round-trips the data") {
    val base = Files.createTempDirectory("transformer_").toString
    val src = "/root/testdata/sf0.001/nation.parquet"
    val t = new TableTransformer(spark, src, PathConfig(base), "spectrum", "nation")

    val ddl = t.transform()
    assert(ddl.contains("create external table spectrum.nation ("))
    assert(ddl.contains("stored as parquet"))

    // manifest exists and enumerates the gzip parts
    assert(new java.io.File(s"$base/csv/manifest").exists())
    val manifest = Files.readString(java.nio.file.Paths.get(s"$base/csv/manifest"))
    assert(manifest.contains("\"entries\""))
    assert(manifest.contains(".gz"))

    val source = spark.read.parquet(src).orderBy("n_nationkey").collect()
    val result = spark.read.parquet(s"$base/spectrum").orderBy("n_nationkey").collect()
    assert(source.length == result.length)
    source.zip(result).foreach { case (a, b) => assert(a == b) }
  }

  test("schema validation fails fast before any work (schema.py:38-44)") {
    val base = Files.createTempDirectory("transformer_").toString
    val src = "/root/testdata/sf0.001/embeddings.parquet" // has array<float>
    val t = new TableTransformer(spark, src, PathConfig(base), "s", "t")
    intercept[IllegalArgumentException](t.exportToCsv())
    assert(!new java.io.File(s"$base/csv").exists()) // no partial output
  }
}

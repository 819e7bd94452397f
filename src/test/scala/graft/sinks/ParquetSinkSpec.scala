package graft.sinks

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

import graft.SparkSpec

/** FIXTURES.md A1 row shape — top-level so Spark can derive an Encoder. */
final case class A1(real_col: Option[Float], bigint_col: Option[Long],
                    int_col: Option[Int], smallint_col: Option[Short],
                    bool_col: Option[Boolean], str_col: Option[String],
                    timestamp_col: Option[Timestamp], plaintext_col: Option[String],
                    float64_col: Option[Double], dec_col: Option[BigDecimal])

/** FIXTURES.md A1: full scalar-type round-trip incl. NULLs, plus the writer
  * contract (gzip codec, INT96 timestamps — reference utils/parquet.py:93-101,
  * tests/test_parquet.py:29-98).
  */
class ParquetSinkSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = Seq(
    A1(Some(17.124f), Some(1L), Some(1), Some(1: Short), Some(true), Some("string 1"),
      Some(Timestamp.valueOf("2007-07-13 01:23:34.123456")), Some("Test Text"),
      Some(1.5), Some(BigDecimal("1.500000000"))),
    A1(Some(1.12f), Some(2L), Some(2), Some(2: Short), None, Some("string 2"),
      None, Some("Some#More#Test#  Text"), None, None),
    A1(Some(3.14f), Some(3L), Some(3), Some(3: Short), Some(false), None,
      Some(Timestamp.valueOf("2006-01-13 12:34:56.432539")), Some("!@#$%%^&*&"),
      Some(-2.25), Some(BigDecimal("-0.000000001"))),
    A1(Some(13.37f), Some(4L), Some(4), Some(4: Short), Some(true), Some("string 3"),
      Some(Timestamp.valueOf("2010-08-13 05:46:57.437699")), None,
      Some(0.0), Some(BigDecimal("123456789.987654321"))))

  test("A1: all scalar types incl. nulls round-trip; gzip + INT96 on disk") {
    val out = Files.createTempDirectory("parquet_sink_").toString + "/t"
    val df = fixture.toDF()
      .withColumn("dec_col", $"dec_col".cast("decimal(38,9)"))
    ParquetSink.write(df, out)

    val back = spark.read.parquet(out).orderBy("bigint_col")
    val a = df.orderBy("bigint_col").collect()
    val b = back.collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"row mismatch: $x vs $y") }

    // physical contract: gzip codec + INT96 timestamp (parquet.py:98-99)
    val file = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).head
    val footer = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file.toString), new Configuration())).getFooter
    val codecs = footer.getBlocks.get(0).getColumns
    assert(codecs.asScala.forall(_.getCodec.name() == "GZIP"))
    val tsCol = footer.getFileMetaData.getSchema.getColumns.asScala
      .find(_.getPath.mkString == "timestamp_col").get
    assert(tsCol.getPrimitiveType.getPrimitiveTypeName.name() == "INT96")
  }

  test("maxRecordsPerFile bounds output files (O4, export.py:16 analog)") {
    val out = Files.createTempDirectory("parquet_sink_").toString + "/t"
    ParquetSink.write(spark.range(100).toDF("id"), out, maxRecordsPerFile = 25)
    val parts = new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parts >= 4)
  }

  test("maxFileBytes bounds parquet part files (MAXFILESIZE analog)") {
    val out = Files.createTempDirectory("parquet_sink_").toString + "/t"
    val df = (1 to 20000).map(i => (i.toLong, "y" * 200)).toDF("id", "payload").coalesce(1)
    ParquetSink.write(df, out, maxFileBytes = 128 * 1024)
    val parts = new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parts > 1, s"expected multiple bounded part files, got $parts")
    assert(spark.read.parquet(out).count() == 20000)
  }

  test("hive-style partitionBy layout (R14)") {
    val out = Files.createTempDirectory("parquet_sink_").toString + "/t"
    val df = Seq((1, "2020-01-01"), (2, "2020-01-02"), (3, "2020-01-01"))
      .toDF("id", "partition_key")
    ParquetSink.write(df, out, partitionBy = Seq("partition_key"))
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("partition_key=2020-01-01", "partition_key=2020-01-02"))
    assert(spark.read.parquet(out).count() == 3)
  }

  private implicit class JavaListOps[T](l: java.util.List[T]) {
    def asScala: Seq[T] = {
      import scala.jdk.CollectionConverters._
      l.iterator().asScala.toSeq
    }
  }
}

package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.pipeline.{PathConfig, TableTransformer}

/** The reference's own pipeline (R1/R2/R3/R4/R5/R6/R11) exposed as a
  * differentially-checked query: orders -> unload-dialect gzip CSV + manifest
  * -> typed conversion -> gzip/INT96 parquet -> read back. If any stage
  * mangles a value (dialect, escaping, ''-null rule, timestamp parse, INT96
  * write), the DuckDB oracle (identity projection of the source) catches it.
  */
object PipelineQueries {

  val r_unload_roundtrip: Query = Query(
    "r_unload_roundtrip",
    (s, dir) => {
      val base = Files.createTempDirectory("graft_roundtrip_").toString
      val t = new TableTransformer(s, s"$dir/orders.parquet", PathConfig(base), "spectrum", "orders")
      t.exportToCsv()
      t.convertToParquet()
      s.read.parquet(PathConfig(base).spectrumDir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          round(col("o_totalprice"), 2).as("price"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("od"),
          col("o_orderpriority"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_orderstatus,
           |       ROUND(o_totalprice, 2) AS price,
           |       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS od,
           |       o_orderpriority
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** Multimodal stub pipeline — deterministic md5-derived fake decode; the
    * oracle recomputes every feature column from md5(payload) in DuckDB.
    */
  val m_image_features: Query = Query(
    "m_image_features",
    (s, dir) => Multimodal.imageFeatures(s, dir),
    Some(Multimodal.oracleSql))

  val all: Seq[Query] = Seq(r_unload_roundtrip, m_image_features)
}

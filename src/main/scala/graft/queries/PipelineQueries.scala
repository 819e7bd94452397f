package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.pipeline.{PathConfig, TableTransformer}
import graft.sources.JdbcSource
import graft.tables.Tables

/** The reference's own pipeline (R1/R2/R3/R4/R5/R6/R11) exposed as
  * differentially-checked queries.
  */
object PipelineQueries {

  /** orders (+ a derived BOOLEAN column, so the 't'/'f'/''-null dialect rule
    * is hash-checked, not just unit-tested; + a derived DECIMAL(12,2)
    * column, so the reference's `Decimal()` parse path — convert.py:69
    * under the 38-digit ceiling, convert.py:20-23 — is exercised end to
    * end through the dialect) -> unload-dialect gzip CSV + manifest ->
    * typed conversion -> gzip/INT96 parquet -> registered external table
    * -> read back BY NAME through the session catalog (stage 3 executes
    * its DDL, reference create.py:59-73). If any stage mangles a value
    * (dialect, escaping, ''-null rule, bool parse, decimal parse,
    * timestamp parse, INT96 write, catalog registration), the DuckDB
    * oracle (identity projection of the source) catches it.
    */
  val r_unload_roundtrip: Query = Query(
    "r_unload_roundtrip",
    (s, dir) => {
      val base = Files.createTempDirectory("graft_roundtrip_").toString
      val t = TableTransformer.ofDataFrame(s,
        s.read.parquet(s"$dir/orders.parquet")
          .withColumn("o_flag", (col("o_orderkey") % 2) === 0)
          .withColumn("o_dec", col("o_totalprice").cast("decimal(12,2)")),
        PathConfig(base), "spectrum", "orders_rt")
      t.exportToCsv()
      t.convertToParquet()
      val name = t.createTable()
      s.table(name)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          round(col("o_totalprice"), 2).as("price"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("od"),
          col("o_orderpriority"), col("o_flag"),
          col("o_dec").cast("string").as("o_dec"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_orderstatus,
           |       ROUND(o_totalprice, 2) AS price,
           |       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS od,
           |       o_orderpriority, (o_orderkey % 2 = 0) AS o_flag,
           |       CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS o_dec
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** Live-source path (reference R1's actual stage 1 is a DB connection,
    * export.py:28-34): orders is loaded into an embedded Derby database over
    * JDBC, then read back through [[JdbcSource]] with a range predicate that
    * Catalyst pushes into the remote SQL. The oracle is the equivalent scan
    * of the original parquet — divergence anywhere in the JDBC write/read
    * dialect (types, nulls, timestamps) breaks the hash.
    */
  val r_jdbc_roundtrip: Query = Query(
    "r_jdbc_roundtrip",
    (s, dir) => {
      val dbDir = Files.createTempDirectory("graft_derby_").toString
      val url = s"jdbc:derby:$dbDir/db;create=true"
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority"))
        .write.format("jdbc")
        .option("url", url).option("dbtable", "orders_src").save()
      JdbcSource.read(s, url, "orders_src")
        .filter(col("o_custkey") < 500) // pushed into the remote WHERE
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("price"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("od"),
          col("o_orderpriority"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS price,
           |       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS od,
           |       o_orderpriority
           |FROM orders WHERE o_custkey < 500 ORDER BY o_orderkey""".stripMargin))

  /** Multimodal stub pipeline — deterministic md5-derived fake decode; the
    * oracle recomputes every feature column from md5(payload) in DuckDB.
    */
  val m_image_features: Query = Query(
    "m_image_features",
    (s, dir) => Multimodal.imageFeatures(s, dir),
    Some(Multimodal.oracleSql))

  /** Resize planning downstream of decode (aspect-preserving integer math). */
  val m_resize: Query = Query(
    "m_resize",
    (s, dir) => Multimodal.resizePlan(Multimodal.imageFeatures(s, dir)).orderBy("doc_id"),
    Some(Multimodal.resizeOracleSql))

  /** Evenly-spaced frame sampling downstream of decode (one row per frame). */
  val m_frame_sample: Query = Query(
    "m_frame_sample",
    (s, dir) => Multimodal.frameSample(Multimodal.imageFeatures(s, dir))
      .orderBy("doc_id", "frame_idx"),
    Some(Multimodal.frameSampleOracleSql))

  /** JSONL source/sink roundtrip — the interchange format of web-scrape
    * corpora (and the reference CSV path's modern sibling): orders -> gzip
    * JSON-lines -> read back under an EXPLICIT schema -> projected scan.
    * The explicit schema matters at 100 TB: schema inference is a full
    * extra pass over the data before the real job starts; a declared
    * schema makes the read single-pass with one task per gzip file.
    * Timestamps roundtrip through ISO-8601 under the session's UTC zone;
    * the DuckDB oracle (identity scan of the source) catches any
    * serialization drift.
    */
  val r_jsonl_roundtrip: Query = Query(
    "r_jsonl_roundtrip",
    (s, dir) => {
      val base = Files.createTempDirectory("graft_jsonl_").toString
      val src = s.read.parquet(s"$dir/orders.parquet")
      src.write.mode("overwrite").option("compression", "gzip").json(s"$base/json")
      s.read.schema(src.schema).json(s"$base/json")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          round(col("o_totalprice"), 2).as("price"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("od"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_orderstatus,
           |       ROUND(o_totalprice, 2) AS price,
           |       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS od
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** XML source/sink roundtrip — the row-markup format Spark 4 ships
    * natively (the spark-xml package merged into core). Unlike
    * parquet/ORC there is no pushdown or pruning to claim — XML is a
    * row-synchronous text format, every row parses whole — so the scale
    * posture is the same as gzip CSV/JSONL: schema declared up front (no
    * inference pass over 100 TB), one streamed task per file, and the
    * conversion's job is to land the data in a columnar format once.
    * Values must survive the markup roundtrip bit-exactly vs the
    * parquet-scan oracle.
    */
  val r_xml_roundtrip: Query = Query(
    "r_xml_roundtrip",
    (s, dir) => {
      val base = Files.createTempDirectory("graft_xml_").toString
      val src = s.read.parquet(s"$dir/part.parquet")
      src.write.mode("overwrite").option("rowTag", "part")
        .option("compression", "gzip").xml(s"$base/xml")
      s.read.schema(src.schema).option("rowTag", "part").xml(s"$base/xml")
        .select(col("p_partkey"), col("p_name"), col("p_brand"),
          col("p_type"), col("p_size"), round(col("p_retailprice"), 2).as("price"))
        .orderBy("p_partkey")
    },
    Some("""SELECT p_partkey, p_name, p_brand, p_type, p_size,
           |       ROUND(p_retailprice, 2) AS price
           |FROM part ORDER BY p_partkey""".stripMargin))

  /** ORC source/sink roundtrip — the second columnar format Spark ships
    * natively (zlib, column pruning + predicate pushdown like parquet).
    * The pushed range predicate on the read side is the part worth
    * checking: the filter must reach the ORC scan, and the values must
    * survive the format conversion bit-exactly vs the parquet-scan oracle.
    */
  val r_orc_roundtrip: Query = Query(
    "r_orc_roundtrip",
    (s, dir) => {
      val base = Files.createTempDirectory("graft_orc_").toString
      s.read.parquet(s"$dir/customer.parquet")
        .write.mode("overwrite").option("compression", "zlib").orc(s"$base/orc")
      s.read.orc(s"$base/orc")
        .filter(col("c_acctbal") > 0) // pushed to the ORC scan
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          round(col("c_acctbal"), 2).as("bal"), col("c_mktsegment"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name, c_nationkey, ROUND(c_acctbal, 2) AS bal,
           |       c_mktsegment
           |FROM customer WHERE c_acctbal > 0 ORDER BY c_custkey""".stripMargin))

  /** Small-files compaction — the table-maintenance operator every long-
    * lived 100 TB dataset needs (streaming ingest and over-parallel writes
    * leave thousands of KB-sized files; each costs a task + an open/close +
    * a footer read, and at some point scheduling dominates scanning). The
    * query fabricates the problem (64-way over-partitioned write), sizes
    * the target file count from the ACTUAL on-disk bytes via the Hadoop
    * FileSystem API (ceil(total / 4 MiB)), and rewrites with repartition(n)
    * — one shuffle, no driver data movement. The oracle (identity scan
    * with an md5 text fingerprint) proves compaction is byte-faithful;
    * CompactionSpec asserts the file count actually collapsed.
    */
  val p_compact: Query = Query(
    "p_compact",
    (s, dir) => {
      val base = Files.createTempDirectory("graft_compact_").toString
      s.read.parquet(s"$dir/documents.parquet")
        .repartition(64)
        .write.mode("overwrite").parquet(s"$base/small")
      val smallPath = new org.apache.hadoop.fs.Path(s"$base/small")
      val fs = smallPath.getFileSystem(s.sparkContext.hadoopConfiguration)
      val totalBytes = fs.listStatus(smallPath)
        .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
      val targetBytes = 4L * 1024 * 1024
      val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
      s.read.parquet(s"$base/small")
        .repartition(nFiles)
        .write.mode("overwrite").parquet(s"$base/compacted")
      s.read.parquet(s"$base/compacted")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          md5(col("text")).as("fp"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, lang, source, n_chars, md5(text) AS fp
           |FROM documents ORDER BY doc_id""".stripMargin))

  /** Audio chunking downstream of the stub decode — one row per 10-second
    * window with exact sample offsets.
    */
  val m_audio_chunks: Query = Query(
    "m_audio_chunks",
    (s, dir) => Multimodal.audioChunks(s, dir),
    Some(Multimodal.audioChunksOracleSql))

  val all: Seq[Query] = Seq(r_unload_roundtrip, r_jdbc_roundtrip, r_jsonl_roundtrip,
    r_orc_roundtrip, r_xml_roundtrip, p_compact, m_image_features, m_resize,
    m_frame_sample, m_audio_chunks)
}

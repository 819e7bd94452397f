package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.SharedHash
import graft.tables.Tables

/** Multimodal-column plumbing: media as opaque binary columns with typed
  * metadata, decoded/feature-extracted per partition.
  *
  * The container has no image/audio codecs, so `decodeStub` is a clearly
  * marked deterministic FAKE of the decode step (in production: swap in a
  * JNI/javacv decoder — the Spark-side plumbing is what this operator
  * proves: binary column handling, per-partition batching via mapPartitions,
  * typed output schema, and partition-parallel scaling).
  *
  * The fake metadata is md5-derived (SharedHash) so that, unlike a codec,
  * it IS differentially checkable: the DuckDB oracle recomputes every output
  * column from md5(payload) — the mapPartitions plumbing (encoders, batch
  * iteration, schema) gets a real hash-checked correctness row, not just a
  * rows-only count.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Long,
                                 height: Long, n_frames: Long, brightness: Double)

  /** STUB decoder: deterministic pseudo-metadata from md5 of the payload
    * bytes. A real implementation would parse the container format here.
    */
  private[operators] def decodeStub(payload: Array[Byte]): (Long, Long, Long, Double) = {
    val h = SharedHash.md5Hex(payload)
    def hv(i: Int): Int = SharedHash.HexDigits.indexOf(h.charAt(i))
    val width = 320L + (hv(0) * 16 + hv(1)) % 5 * 160
    val height = 240L + (hv(2) * 16 + hv(3)) % 5 * 120
    val frames = 1L + (hv(4) * 16 + hv(5)) % 24
    val brightness = ((hv(6) * 4096 + hv(7) * 256 + hv(8) * 16 + hv(9)) % 1000) / 1000.0
    (width, height, frames, brightness)
  }

  final case class AudioMeta(doc_id: Long, n_bytes: Long, sample_rate: Long,
                             n_samples: Long)

  /** STUB audio decoder: sample rate in {8, 16, 24} kHz and a 1-60 s sample
    * count (plus a non-multiple remainder so the last chunk is partial)
    * from md5 of the payload — a real implementation would parse the WAV/
    * OGG header here.
    */
  private[operators] def decodeAudioStub(payload: Array[Byte]): (Long, Long) = {
    val h = SharedHash.md5Hex(payload)
    def hv(i: Int): Int = SharedHash.HexDigits.indexOf(h.charAt(i))
    val sr = 8000L * (1 + hv(7) % 3)
    val ns = sr * (1 + (hv(8) * 16 + hv(9)) % 60) + (hv(10) * 16 + hv(11)) * 7L
    (sr, ns)
  }

  /** Audio chunking: decode (sample_rate, n_samples) per payload, then cut
    * into fixed 10-second windows — one row per chunk with exact sample
    * offsets (the shape a transcription/feature pipeline fans out over).
    * Same mapPartitions decoder amortization as [[imageFeatures]]; the
    * chunk explode is linear in audio duration.
    */
  def audioChunks(spark: SparkSession, sfDir: String, chunkSec: Int = 10): DataFrame = {
    import spark.implicits._
    val media: Dataset[MediaRecord] = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
    val meta = media.mapPartitions { records =>
      records.map { r =>
        val (sr, ns) = decodeAudioStub(r.payload)
        AudioMeta(r.doc_id, r.payload.length.toLong, sr, ns)
      }
    }.toDF()
    meta
      .withColumn("cs", col("sample_rate") * chunkSec)
      .select(col("doc_id"), col("sample_rate"), col("n_samples"),
        explode(expr("sequence(CAST(0 AS BIGINT), (n_samples + cs - 1) div cs - 1)"))
          .as("chunk_idx"), col("cs"))
      .select(col("doc_id"), col("sample_rate"), col("n_samples"), col("chunk_idx"),
        (col("chunk_idx") * col("cs")).as("start_sample"),
        least(col("cs"), col("n_samples") - col("chunk_idx") * col("cs")).as("n_in_chunk"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** DuckDB twin of [[decodeAudioStub]] + [[audioChunks]] (hex position i in
    * Scala = digit position i+1 in SQL).
    */
  val audioChunksOracleSql: String = {
    def d(i: Int): String = SharedHash.digitSql("m", i.toString)
    s"""WITH h AS (SELECT doc_id, md5(text) AS m FROM documents),
       |a AS (SELECT doc_id,
       |        CAST(8000 * (1 + ${d(8)} % 3) AS BIGINT) AS sample_rate,
       |        CAST(8000 * (1 + ${d(8)} % 3) * (1 + (${d(9)} * 16 + ${d(10)}) % 60)
       |             + (${d(11)} * 16 + ${d(12)}) * 7 AS BIGINT) AS n_samples
       |      FROM h),
       |c AS (SELECT doc_id, sample_rate, n_samples, sample_rate * 10 AS cs,
       |             unnest(range(0, (n_samples + sample_rate * 10 - 1) // (sample_rate * 10)))
       |               AS chunk_idx
       |      FROM a)
       |SELECT doc_id, sample_rate, n_samples, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       |       CAST(chunk_idx * cs AS BIGINT) AS start_sample,
       |       CAST(LEAST(cs, n_samples - chunk_idx * cs) AS BIGINT) AS n_in_chunk
       |FROM c ORDER BY doc_id, chunk_idx""".stripMargin
  }

  /** The DuckDB twin of [[decodeStub]] + [[imageFeatures]] over the documents
    * table (payload = utf-8 bytes of text, exactly what `encode` produces).
    */
  val oracleSql: String = {
    def d(i: Int): String = SharedHash.digitSql("m", i.toString)
    s"""WITH h AS (
       |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       |         md5(text) AS m
       |  FROM documents)
       |SELECT doc_id, n_bytes,
       |       320 + (${d(1)} * 16 + ${d(2)}) % 5 * 160 AS width,
       |       240 + (${d(3)} * 16 + ${d(4)}) % 5 * 120 AS height,
       |       1 + (${d(5)} * 16 + ${d(6)}) % 24 AS n_frames,
       |       CAST((${d(7)} * 4096 + ${d(8)} * 256 + ${d(9)} * 16 + ${d(10)}) % 1000 AS DOUBLE) / 1000.0 AS brightness
       |FROM h ORDER BY doc_id""".stripMargin
  }

  /** DuckDB twin of [[resizePlan]] over [[imageFeatures]]. */
  val resizeOracleSql: String = {
    def d(i: Int): String = SharedHash.digitSql("m", i.toString)
    s"""WITH h AS (SELECT doc_id, md5(text) AS m FROM documents),
       |dd AS (SELECT doc_id,
       |       320 + (${d(1)} * 16 + ${d(2)}) % 5 * 160 AS width,
       |       240 + (${d(3)} * 16 + ${d(4)}) % 5 * 120 AS height
       |       FROM h)
       |SELECT doc_id, width, height,
       |       CASE WHEN width >= height THEN 224 ELSE (width * 224) // height END AS out_w,
       |       CASE WHEN height >= width THEN 224 ELSE (height * 224) // width END AS out_h
       |FROM dd ORDER BY doc_id""".stripMargin
  }

  /** DuckDB twin of [[frameSample]] over [[imageFeatures]]. */
  val frameSampleOracleSql: String = {
    def d(i: Int): String = SharedHash.digitSql("m", i.toString)
    s"""WITH h AS (SELECT doc_id, md5(text) AS m FROM documents),
       |dd AS (SELECT doc_id, 1 + (${d(5)} * 16 + ${d(6)}) % 24 AS n_frames FROM h),
       |f AS (SELECT doc_id, n_frames, unnest(range(0, least(n_frames, 4))) AS i FROM dd)
       |SELECT doc_id, n_frames, (i * n_frames) // least(n_frames, 4) AS frame_idx
       |FROM f ORDER BY doc_id, frame_idx""".stripMargin
  }

  /** Aspect-preserving resize planning: given decoded (width, height), the
    * target box is 224x224; the scaled dims keep aspect ratio (long side =
    * 224) using exact integer arithmetic — `(short * 224) div long` — so the
    * DuckDB oracle reproduces it bit-for-bit. The arithmetic IS the real
    * resize-plan logic; only the pixel resample behind it is codec work.
    */
  def resizePlan(features: DataFrame, target: Int = 224): DataFrame =
    features.select(col("doc_id"), col("width"), col("height"),
      // `div`, not `/`: Spark `/` on BIGINT is Double division
      expr(s"CASE WHEN width >= height THEN CAST($target AS BIGINT) " +
        s"ELSE (width * $target) div height END").as("out_w"),
      expr(s"CASE WHEN height >= width THEN CAST($target AS BIGINT) " +
        s"ELSE (height * $target) div width END").as("out_h"))

  /** Deterministic frame sampling: up to 4 evenly-spaced frame indices from
    * [0, n_frames) — `i * n_frames div 4` for i < min(n_frames, 4) — the
    * index math a video pipeline runs before handing offsets to the decoder.
    * One output row per (doc, frame): the explode is the Spark-side shape
    * (frame-level rows downstream of clip-level rows).
    */
  def frameSample(features: DataFrame, maxFrames: Int = 4): DataFrame =
    features.select(col("doc_id"), col("n_frames"),
      explode(expr(
        s"transform(sequence(0, CAST(least(n_frames, $maxFrames) - 1 AS INT))," +
          s" i -> (i * n_frames) div least(n_frames, $maxFrames))")).as("frame_idx"))

  /** documents.text encoded to a binary column stands in for the media
    * payload; the operator shape (binary in -> struct of features out, one
    * decoder instance per partition) is the real thing.
    */
  def imageFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media: Dataset[MediaRecord] = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
    media.mapPartitions { records =>
      // per-partition setup cost (decoder init) amortized across the batch
      records.map { r =>
        val (w, h, f, b) = decodeStub(r.payload)
        MediaFeatures(r.doc_id, r.payload.length.toLong, w, h, f, b)
      }
    }.toDF()
      .orderBy("doc_id")
  }
}

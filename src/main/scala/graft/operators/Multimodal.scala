package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Multimodal-column plumbing: media as opaque binary columns with typed
  * metadata, decoded/feature-extracted per partition.
  *
  * The container has no image/audio codecs, so `decodeStub` is a clearly
  * marked deterministic FAKE of the decode step (in production: swap in a
  * JNI/javacv decoder — the Spark-side plumbing is what this operator
  * proves: binary column handling, per-partition batching via mapPartitions,
  * typed output schema, and partition-parallel scaling).
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Int,
                                 height: Int, n_frames: Int, brightness: Double)

  /** STUB decoder: deterministic pseudo-metadata from the payload bytes.
    * Real implementation would parse the container format here (???).
    */
  private[operators] def decodeStub(payload: Array[Byte]): (Int, Int, Int, Double) = {
    var h = 1125899906842597L // deterministic FNV-ish fold over the bytes
    var i = 0
    while (i < payload.length) { h = 31 * h + (payload(i) & 0xff); i += 1 }
    val width = 320 + math.floorMod(h, 5L).toInt * 160
    val height = 240 + math.floorMod(h >> 8, 5L).toInt * 120
    val frames = 1 + math.floorMod(h >> 16, 24L).toInt
    val brightness = math.floorMod(h >> 24, 1000L) / 1000.0
    (width, height, frames, brightness)
  }

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
        MediaFeatures(r.doc_id, r.payload.length.toLong, w, h, f,
          math.rint(b * 10000) / 10000)
      }
    }.toDF()
      .orderBy("doc_id")
  }
}

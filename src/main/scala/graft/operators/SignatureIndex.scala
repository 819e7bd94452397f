package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.SimHash

/** Persisted simhash signature index — the production lifecycle behind
  * incremental near-duplicate dedup of a continuously-crawled corpus.
  *
  * [[graft.queries.NorthStar]]'s `d_dedup_incremental` demonstrates the
  * QUERY shape (delta-only probe side) but recomputes the base corpus's
  * signatures from text on every batch — at 100 TB that is a full-corpus
  * kernel pass per crawl increment. This operator makes the index a
  * first-class stored artifact instead:
  *
  *   - [[build]] runs the fused simhash kernel over the base corpus ONCE
  *     and writes `(doc_id, simhash, batch=0)` to parquet;
  *   - [[ingest]] kernels ONLY the new batch and appends its signatures
  *     under a monotonically increasing batch id;
  *   - [[probe]] answers "which docs of batch N are near-dups of anything
  *     ingested before them" from the STORED table alone: banding a stored
  *     signature is seven shift-and-mask ops, so neither join side touches
  *     text or the kernel — per-batch cost is O(index scan + bucket
  *     collisions) with zero re-kerneling, and the index parquet (16 bytes
  *     a doc + batch) is ~6 orders of magnitude smaller than a 100 TB
  *     corpus.
  *
  * Keep-first semantics match `d_dedup_incremental`: a batch-N doc's
  * witness (`dup_of`) is the minimum doc_id among earlier-batch matches
  * and lower-id same-batch matches; NULL if novel. With 7 bands of 9 bits
  * over the 63-bit signature, pigeonhole guarantees any pair within
  * hamming distance 6 shares at least one exact band, so the match set
  * provably equals an all-pairs scan's (the `d_simhash` argument).
  *
  * Reference analog: the manifest-driven incremental convert
  * (spectrify/convert.py:97-99, examples/weekly_partitions.py:77-129)
  * re-exports only new partitions; the signature table is the analogous
  * persisted state for dedup.
  */
object SignatureIndex {
  val Bands = 7
  val BandBits = 9

  /** `(doc_id, simhash)` from raw `(doc_id, text)` — the ONLY place the
    * text kernel runs in this lifecycle.
    */
  def signatures(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), SimHash.simhash63Occ(col("text")).as("simhash"))

  /** Kernel the base corpus once; write the index as batch 0. */
  def build(docs: DataFrame, path: String): Unit =
    signatures(docs).withColumn("batch", lit(0))
      .write.mode("overwrite").parquet(path)

  /** Kernel ONLY the delta; append its signatures as `batch`. */
  def ingest(docs: DataFrame, path: String, batch: Int): Unit =
    signatures(docs).withColumn("batch", lit(batch))
      .write.mode("append").parquet(path)

  /** Forget documents — the GDPR/right-to-be-forgotten lifecycle step a
    * training-data index must support; the shared [[Tombstones]]
    * delete-vector machinery (O(deletes) per request, probes anti-join
    * the live view, physical reclamation rides the tombstone-aware
    * [[IndexMaintenance.compact]]).
    */
  def forget(spark: SparkSession, path: String, ids: DataFrame): Unit =
    Tombstones.forget(spark, path, ids)

  private[graft] def readIndex(spark: SparkSession, path: String): DataFrame =
    Tombstones.live(spark, path)

  /** The next free batch id in a stored index — max(batch) + 1, or 0 for a
    * fresh/empty path: the monotone base offset a streamed appender adds to
    * its micro-batch ids so stream batches continue the batch-API sequence.
    *
    * READ-ONLY by design (ADVICE r10): this is called from probe/read-side
    * paths that may race a live in-stream compaction, so it must never run
    * [[IndexMaintenance.recover]]'s destructive renames itself — a reader
    * could delete the writer's fully-written tmp mid-swap. A stranded
    * crashed-swap state (live dir missing, tmp/trash remnants present)
    * fails LOUDLY instead of reading as "fresh index" and handing out
    * batch 0; writer entry points ([[IndexStream.appendWithBatchIds]],
    * [[probeStream]], [[IndexMaintenance.compact]]) heal it first.
    *
    * Consults the [[IndexMaintenance.MaxBatchMarker]] sidecar too: a
    * tombstone-aware compaction may have reclaimed every row of the
    * highest batch, and its id must never be re-issued.
    */
  def nextBatch(spark: SparkSession, path: String): Int = {
    val dataMax: Option[Int] =
      try {
        val r = spark.read.parquet(path).agg(max("batch")).first()
        if (r.isNullAt(0)) None else Some(r.getInt(0))
      } catch {
        // ONLY a genuinely absent path means "fresh index". Any other
        // analysis failure — corrupt footer, missing batch column — must
        // fail loudly: starting over at base 0 would hand out batch ids an
        // existing half-written index already uses, silently corrupting
        // the same-batch witness rule.
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "PATH_NOT_FOUND" =>
          if (IndexMaintenance.crashRemnants(spark, path))
            throw new IllegalStateException(
              s"stranded crashed-compaction state at $path: the live directory is " +
                "absent but .compact_tmp/.compact_trash remnants exist. Refusing to " +
                "answer batch 0 for a non-fresh index; heal via a writer entry point " +
                "(IndexMaintenance.recover / compact / a restarted ingest stream).")
          None
        // A dir holding ONLY underscore sidecars (no data file at all) is
        // the known marker-before-data crash window of [[FastSsIndex]]'s
        // build/streamed entry points (r14 ADVICE: the `_graft_tau` radius
        // marker lands first so a tau-mismatched writer fails loudly even
        // on a half-built index). Zero data files means zero batch ids in
        // use — answering from the max-batch marker alone (or 0) cannot
        // collide with data. The data-file listing is the defense against
        // mistaking a CORRUPT-footer failure for this window: any data
        // file present keeps the loud failure.
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "UNABLE_TO_INFER_SCHEMA" &&
              !IndexMaintenance.crashRemnants(spark, path) &&
              IndexMaintenance.dataFileCount(spark, path) == 0 =>
          None
      }
    val markerMax = IndexMaintenance.readMaxBatchMarker(spark, path)
    (dataMax ++ markerMax).reduceOption(_ max _).map(_ + 1).getOrElse(0)
  }

  /** Streamed ingest of a documents stream: the fused kernel runs per
    * micro-batch (stateless — no watermark, no aggregation state) and each
    * micro-batch appends under batch = base + batchId — REAL, distinct,
    * monotone ids, so `probe(n)` can treat earlier micro-batches as index
    * side and the streamed path reaches the same delta-sized-probe cost
    * model as batch ingest.
    *
    * Sink choice, the checkpoint-pinned base offset, and the single-writer
    * contract are [[IndexStream]]'s (shared with the substring index). A
    * recomputed base on restart would land a replayed micro-batch under a
    * fresh id — the same doc in two batches, turning at-least-once replay
    * (harmless: probe's min-witness is duplicate-insensitive) into a
    * semantic shift (the doc's earlier copy becomes index side for its
    * later one); the restart spec pins the pinned-base behavior.
    */
  def ingestStream(docs: DataFrame, path: String, checkpoint: String,
                   autoCompactFragments: Int = IndexStream.DefaultAutoCompactFragments): org.apache.spark.sql.streaming.StreamingQuery =
    IndexStream.appendWithBatchIds(signatures(docs),
      nextBatch(docs.sparkSession, path), path, checkpoint, autoCompactFragments)

  /** Streamed ingest AND probe — the in-flight crawl-dedup shape. Each
    * micro-batch's signatures land in the index under a real batch id
    * (the [[IndexStream]] checkpoint-pinned-base discipline), and the SAME
    * foreachBatch then answers the batch's novelty from the stored table:
    * `(doc_id, dup_of, batch)` rows append to `outPath`, `dup_of` the
    * minimum doc_id among earlier-batch matches and lower-id same-batch
    * peers, NULL for a novel doc. The crawl's dedup verdicts are available
    * the moment the increment commits — no second pass over the index.
    *
    * At-least-once replay is safe end to end: a replayed micro-batch
    * re-appends signature rows ([[probe]] is duplicate-insensitive) and
    * re-appends witness rows with IDENTICAL values — `probe(b)` filters
    * `batch <= b`, so batches ingested after the original attempt cannot
    * change a replayed verdict, and the min witness ignores row
    * multiplicity. Consumers restore set semantics with a
    * `dropDuplicates("doc_id")`, exactly the ingest queries' contract.
    */
  def probeStream(docs: DataFrame, path: String, outPath: String,
                  checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = docs.sparkSession
    // writer entry point: heal a crashed swap BEFORE reading or appending
    // (nextBatch itself is read-only and must not — ADVICE r10)
    IndexMaintenance.recover(spark, path)
    val base = IndexStream.pinnedBase(docs, nextBatch(spark, path), checkpoint)
    signatures(docs).writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        val b = base + batchId.toInt
        df.withColumn("batch", lit(b)).write.mode("append").parquet(path)
        probe(spark, path, b).withColumn("batch", lit(b))
          .write.mode("append").parquet(outPath)
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }

  // unrolled, not transform(sequence(...)): higher-order functions don't
  // codegen and would drag the banding Project out of WholeStageCodegen
  private val bandArray: Column = expr(
    (0 until Bands)
      .map(b => s"shiftright(simhash, ${b * BandBits}) & ${(1 << BandBits) - 1}")
      .mkString("array(", ", ", ")"))

  /** Band a stored signature relation — pure bit ops, no text, no kernel. */
  def banded(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"), col("simhash"), col("batch"),
      posexplode(bandArray).as(Seq("band", "bucket")))

  /** Near-dup witnesses for batch `batch`, entirely from the stored index.
    *
    * The (band, bucket) equi-join probes the delta's banded rows against
    * the whole banded index; the SHUFFLE_HASH hint on the delta side makes
    * it the hash-build side of a shuffled join (the delta is batch-sized;
    * broadcasting the INDEX side would ship the whole corpus's signatures
    * to every task). AQE splits skewed buckets at runtime. Returns
    * `(doc_id, dup_of)` for every batch-`batch` doc, dup_of NULL if novel.
    */
  def probe(spark: SparkSession, path: String, batch: Int,
            maxHamming: Int = 6): DataFrame = {
    // pigeonhole recall guarantee: hamming <= Bands-1 forces >= 1 shared
    // band. A larger maxHamming would SILENTLY lose matches the scaladoc
    // promises (pairs differing in maxHamming bits spread across all bands
    // never collide), so refuse it loudly.
    require(maxHamming < Bands,
      s"maxHamming=$maxHamming breaks the $Bands-band pigeonhole recall bound (max ${Bands - 1})")
    // pre-filter batch <= probed batch: the disjunctive join condition
    // below is not inferable as a pushable b-side predicate, so without
    // this a historical-batch probe would band and shuffle every LATER
    // batch's rows only to drop them in the join
    val idx = banded(readIndex(spark, path).filter(col("batch") <= batch))
    val a = idx.filter(col("batch") === batch).hint("SHUFFLE_HASH").as("a")
    val b = idx.as("b")
    // a.doc_id != b.doc_id: a doc re-ingested under a LATER batch (an
    // upstream that crawled it twice) must not witness itself through its
    // earlier copy — same-doc rows are never duplicates of each other,
    // matching the incremental-dedup oracle's a.doc_id != b.doc_id
    val matches = a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") =!= col("b.doc_id") &&
          (col("b.batch") < batch ||
            (col("b.batch") === batch && col("b.doc_id") < col("a.doc_id"))) &&
          expr(s"bit_count(a.simhash ^ b.simhash) <= $maxHamming"))
      .groupBy(col("a.doc_id").as("doc_id"))
      .agg(min(col("b.doc_id")).as("dup_of"))
    // distinct: the probe is DUPLICATE-INSENSITIVE end to end (the min
    // witness doesn't care how many index rows repeat a signature), which
    // is what makes at-least-once appenders — a replayed streaming
    // micro-batch (st_sig_ingest), a retried batch ingest — safe without
    // any sink-side exactly-once machinery
    readIndex(spark, path).filter(col("batch") === batch)
      .select(col("doc_id")).distinct()
      .join(matches, Seq("doc_id"), "left")
  }
}

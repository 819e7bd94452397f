package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted PassJoin segment index — the CROSS-LENGTH cell of the
  * stored entity-resolution family ([[EntityBlockIndex]] covers equal
  * lengths via the parity pigeonhole; this covers edit distance <= 1
  * including insert/delete typos, the most common real case), so the
  * continuous record-linkage gate screens ALL single-edit variants, not
  * just substitutions.
  *
  * Blocking is PassJoin at tau = 1 (Li, Deng, Feng: VLDB'11; the same
  * scheme as the in-query `d_entity_match_xlen` — [[segments]]/[[probes]]
  * are THE single copy both paths run): each INDEXED string stores its 2
  * contiguous segments; a PROBE emits, for each candidate indexed length
  * Lt in {Ls-1, Ls, Ls+1}, each segment's substrings at the +-1 position
  * window, and the equi-join on (seg_no, Lt, segment) provably contains
  * every pair within edit distance 1.
  *
  * Lifecycle = [[EntityBlockIndex]]'s: build/ingest segment base/delta
  * only (each entity segmented ONCE in its lifetime; stored rows carry
  * the name so candidates and verification never read a source table);
  * [[candidates]] probe-emits from the BATCH rows alone (batch-sized
  * kernel) against the stored segments; [[screenStream]] wires a record
  * stream through ingest+probe per micro-batch under real pinned batch
  * ids; forget/compact ride the shared [[Tombstones]]/
  * [[IndexMaintenance]] machinery.
  */
object PassJoinIndex {

  /** Block-bucket count for the stored `bb=` layout ([[EntityBlockIndex
    * .BB]]'s rationale in the cross-length family): the stored side of a
    * probe is partition-pruned to the buckets the batch's probe rows
    * hash into, so a small screening batch reads a sliver of the master
    * index instead of scanning and shuffling all of it.
    */
  val BB = 64

  private def bbCol: org.apache.spark.sql.Column =
    pmod(xxhash64(col("seg_no"), col("lt"), col("seg")), lit(BB)).cast("int")

  /** The 2 stored segment rows per entity: `(key, name, lt, seg_no,
    * seg, bb)` with lt the full string length — the indexed side of the
    * PassJoin equi-join, and the ONLY place the segment kernel runs for
    * a stored entity.
    */
  def segments(ents: DataFrame): DataFrame =
    ents.select(col("key"), col("name"), length(col("name")).as("lt"),
        explode(array(
          struct(lit(1).as("seg_no"),
            expr("substring(name, 1, length(name) div 2)").as("seg")),
          struct(lit(2).as("seg_no"),
            expr("substring(name, length(name) div 2 + 1)").as("seg")))).as("x"))
      .select(col("key"), col("name"), col("lt"),
        col("x.seg_no").as("seg_no"), col("x.seg").as("seg"))
      .withColumn("bb", bbCol)

  /** Probe rows for `(key, name)` entities: for each candidate indexed
    * length Lt in {Ls-1, Ls, Ls+1}, each segment's substrings of s at
    * the +-1 position window (clamped to valid starts; `sequence()` is
    * descending when hi < lo, hence the guards) — <= 15 rows per entity
    * before the dedup.
    */
  def probes(ents: DataFrame): DataFrame = {
    val withLt = ents.select(col("key"), col("name"), length(col("name")).as("ls"),
        explode(expr("sequence(-1, 1)")).as("dl"))
      .withColumn("lt", col("ls") + col("dl"))
      .filter(col("lt") >= 1)
      .withColumn("len1", expr("lt div 2"))
      .withColumn("len2", col("lt") - col("len1"))
    val seg1 = withLt.select(col("key"), col("name"), col("lt"),
      lit(1).as("seg_no"), col("len1").as("slen"),
      explode(expr("sequence(0, greatest(least(ls - len1, 1), 0))")).as("p"))
    val seg2 = withLt.select(col("key"), col("name"), col("lt"),
      lit(2).as("seg_no"), col("len2").as("slen"),
      explode(expr(
        """CASE WHEN least(ls - len2, len1 + 1) >= greatest(len1 - 1, 0)
          |THEN sequence(greatest(len1 - 1, 0), least(ls - len2, len1 + 1))
          |ELSE array() END""".stripMargin)).as("p"))
    seg1.unionByName(seg2)
      .select(col("key"), col("name"), col("lt"), col("seg_no"),
        expr("substring(name, p + 1, slen)").as("seg"))
      .dropDuplicates("key", "lt", "seg_no", "seg")
      .withColumn("bb", bbCol)
  }

  /** Segment the base master list once; write the index as batch 0 under
    * the `bb=` bucket layout.
    */
  def build(entities: DataFrame, path: String): Unit =
    segments(entities).withColumn("batch", lit(0))
      .write.partitionBy("bb").mode("overwrite").parquet(path)

  /** Segment ONLY the delta; append its rows as `batch`. */
  def ingest(entities: DataFrame, path: String, batch: Int): Unit =
    segments(entities).withColumn("batch", lit(batch))
      .write.partitionBy("bb").mode("append").parquet(path)

  /** Next free batch id — the shared fail-loud implementation. */
  def nextBatch(spark: SparkSession, path: String): Int =
    SignatureIndex.nextBatch(spark, path)

  /** Candidate cross-length pairs for batch `batch`, from stored state:
    * the batch's entities (recovered from their own stored rows — no
    * source table) are probe-emitted (a batch-sized kernel) and
    * equi-joined against the stored segments of `batch <=` rows, with
    * the later-member rule making each pair surface exactly once.
    * Normalized `(a_key, b_key, a_name, b_name)`; DISTINCT folds
    * multi-slot agreement and replayed index rows.
    */
  def candidates(spark: SparkSession, path: String, batch: Int): DataFrame =
    candidates(spark, path, batch, batchEntities = None)

  /** As [[candidates]], with the probe entities supplied IN MEMORY when
    * the caller holds them ([[screenStream]]) — no per-trigger index
    * re-read to rediscover rows the trigger just wrote
    * ([[EntityBlockIndex.candidates]]'s rationale).
    */
  def candidates(spark: SparkSession, path: String, batch: Int,
                 batchEntities: Option[DataFrame]): DataFrame = {
    val live = Tombstones.live(spark, path, idCol = "key")
      .filter(col("batch") <= batch)
    val batchEnts = batchEntities.getOrElse(
      live.filter(col("batch") === batch).select("key", "name").dropDuplicates("key"))
    val probeRows = probes(batchEnts)
    // bucket pruning ([[EntityBlockIndex.candidates]]'s discipline): only
    // stored segments in a bucket some probe row hashes into can join —
    // restrict the stored scan at planning time (PartitionFilters).
    // Bounded collect: <= min(probe rows, BB) distinct bucket ids.
    val buckets = probeRows.select("bb").distinct().collect().map(_.getInt(0))
    val a = probeRows.hint("SHUFFLE_HASH").as("a")
    val b = live.filter(col("bb").isin(buckets.map(Int.box): _*)).as("b")
    val first = col("a.key") < col("b.key")
    a.join(b,
        col("a.seg_no") === col("b.seg_no") && col("a.lt") === col("b.lt") &&
          col("a.seg") === col("b.seg") &&
          col("a.key") =!= col("b.key") &&
          (col("b.batch") < batch ||
            (col("b.batch") === batch && col("b.key") < col("a.key"))))
      .select(
        when(first, col("a.key")).otherwise(col("b.key")).as("a_key"),
        when(first, col("b.key")).otherwise(col("a.key")).as("b_key"),
        when(first, col("a.name")).otherwise(col("b.name")).as("a_name"),
        when(first, col("b.name")).otherwise(col("a.name")).as("b_name"))
      .dropDuplicates("a_key", "b_key")
  }

  /** Streamed ingest AND cross-length screen — [[EntityBlockIndex
    * .screenStream]]'s discipline with PassJoin blocking: per trigger,
    * the batch alone is segmented and appended under a real pinned batch
    * id, then its verified pairs (exact levenshtein <= 1, the shared
    * [[EntityBlockIndex.verifyTypo]] lattice) land in `outPath`.
    * At-least-once replay safe for the same reasons (candidate-
    * insensitive DISTINCT, byte-identical deterministic verification).
    */
  def screenStream(entities: DataFrame, path: String, outPath: String,
                   checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = entities.sparkSession
    IndexMaintenance.recover(spark, path)
    val base = IndexStream.pinnedBase(entities, nextBatch(spark, path), checkpoint)
    entities.writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        val b = base + batchId.toInt
        segments(df).withColumn("batch", lit(b))
          .write.partitionBy("bb").mode("append").parquet(path)
        EntityBlockIndex.verifyTypo(
            candidates(df.sparkSession, path, b, Some(df.select("key", "name"))))
          .withColumn("batch", lit(b))
          .write.mode("append").parquet(outPath)
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** Right-to-be-forgotten: tombstone the entity ([[Tombstones]]);
    * reclamation rides [[compact]].
    */
  def forget(spark: SparkSession, path: String, ids: DataFrame): Unit =
    Tombstones.forget(spark, path, ids, idCol = "key")

  def compact(spark: SparkSession, path: String): Unit =
    IndexMaintenance.compact(spark, path, partitionCols = Seq("bb"))
}

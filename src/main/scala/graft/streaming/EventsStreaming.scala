package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the events table.
  *
  * The reference is batch-only (SURVEY §1.1: "no streams... everything is
  * one-shot batch", transform.py:18-21); this module is the north-star
  * streaming axis: the same windowed aggregations the batch inventory
  * declares (q23/w_sliding/w_session) expressed as incremental queries, plus
  * a custom stateful operator via mapGroupsWithState.
  *
  * At scale: watermarks bound state; session/tumbling state is partitioned by
  * group key across executors; parquet-directory sources become Kafka/queue
  * sources with no change to the transforms.
  */
object EventsStreaming {

  /** events.parquet physical schema as a FALLBACK: ts as INT64
    * timestamp[ns] surfaced under spark.sql.legacy.parquet.nanosAsLong (see
    * Sessions). [[readStream]] prefers the schema a batch read reports for
    * the actual file — the generator has shipped both timestamp[ns] and
    * timestamp[us] — because a streaming source cannot infer it and a
    * mis-declared LongType would reinterpret microseconds as nanoseconds.
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def readStream(spark: SparkSession, sfDir: String): DataFrame = {
    // declare the schema the file actually has (one bounded footer read),
    // then share the batch path's ts normalization — ns-as-long and us-NTZ
    // files both land on the session-zoned TIMESTAMP the watermarks need
    val fileSchema =
      try spark.read.parquet(s"$sfDir/events.parquet").schema
      catch { case _: org.apache.spark.sql.AnalysisException => rawSchema }
    graft.tables.Tables.normalizeEvents(
      spark.readStream
        .schema(fileSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sfDir))
  }

  /** Tumbling 1-hour windows with a watermark — streaming twin of
    * q23_time_bucket.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      // DECIMAL-exact money sum (FLOAT_AUDIT.md): the streaming state
      // merges per-batch partials — decimal keeps every merge exact, so
      // sv is independent of how the stream happened to be batched
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("value").cast("decimal(18,2)")), 2).cast("double").as("sv"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("h"),
        col("event_type"), col("cnt"), col("sv"))

  /** Session windows (30 min gap) — streaming twin of w_session_window. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"))

  /** Stream-static join: the event stream enriched against a static
    * dimension (customer segment), then aggregated. The static side is
    * broadcast — each micro-batch joins map-side with no stream shuffle
    * before the aggregation, the canonical enrichment plan at scale (the
    * dimension re-reads per micro-batch and may be refreshed between them).
    */
  def enrichedSegmentTotals(events: DataFrame, dim: DataFrame): DataFrame =
    events
      .join(broadcast(dim), "user_id")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("value").cast("decimal(18,2)")), 2).cast("double").as("sv"))

  /** Exactly-once ingestion over an at-least-once source: duplicate
    * deliveries of the same event (retries, replayed offsets) are suppressed
    * by key within the watermark horizon. dropDuplicatesWithinWatermark is
    * the bounded-state form of streaming dedup: per-key state is evicted
    * once the watermark passes its event time, so state size tracks the
    * in-flight window, not the full key universe — the production semantics
    * for delivery dedup, where duplicates arrive close together. (Plain
    * dropDuplicates on a non-event-time key never evicts: unbounded state.)
    */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: clicks joined to the same user's
    * purchases within [click, click + 30 min]. Both sides carry watermarks
    * and the join condition is time-bounded — the two requirements that let
    * Spark evict join state: a click's state can be dropped once the
    * purchase watermark passes click + 30 min, so state size tracks the
    * 2.5 h in-flight window, not the stream's history. Without the time
    * bound this join would be rejected (unbounded state) — that contract
    * is the whole design at 100 TB/day.
    */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
                        joinType: String = "inner"): DataFrame = {
    val c = clicks.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "2 hours")
    val p = purchases.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"), col("value"))
      .withWatermark("p_ts", "2 hours")
    c.join(p,
      col("user_id") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"),
      joinType)
  }

  /** total_cents carries the running sum EXACTLY (the 2-dp value lattice
    * scaled to integers — FLOAT_AUDIT.md); total_value is derived once per
    * emission, so the running total cannot drift with accumulation order.
    */
  final case class UserTotal(user_id: Long, n_events: Long, total_cents: Long,
                             total_value: Double)

  /** Custom stateful aggregation via flatMapGroupsWithState: per-user running
    * totals maintained in executor state across micro-batches.
    *
    * State is BOUNDED: an event-time timeout expires users idle for
    * `idleTimeoutMs` past the watermark — without a timeout, per-key state
    * grows with the key universe forever (on an unbounded user population
    * that is an executor OOM; this is the streaming analog of never
    * compacting). Event-time (not processing-time) timeouts keep the query
    * deterministic and let a finite source drain: processing-time timeouts
    * keep scheduling wall-clock batches, so processAllAvailable never
    * returns.
    *
    * Semantics under expiry: "running totals" are per state lifetime. A key
    * whose state expired restarts from zero when it next appears, so on a
    * stream where a user idles > idleTimeoutMs past the watermark, later
    * totals are per-burst, not whole-history (the deliberate trade for
    * bounded state — whole-history exactness at 100 TB means state per key
    * forever). The st_user_totals batch-parity check holds because the
    * finite test source drains in one micro-batch, where no state expires
    * mid-stream.
    */
  def userRunningTotals(spark: SparkSession, events: DataFrame,
                        idleTimeoutMs: Long = 30 * 60 * 1000L): Dataset[UserTotal] = {
    import spark.implicits._
    events
      .withWatermark("ts", "2 hours")
      .select(col("user_id"), col("value"), col("ts"))
      .as[(Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[(Long, Double, java.sql.Timestamp)],
         state: GroupState[UserTotal]) =>
          if (state.hasTimedOut) {
            state.remove() // idle key: release state, nothing new to emit
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(UserTotal(userId, 0L, 0L, 0.0))
            var n = prev.n_events
            var c = prev.total_cents
            var maxTs = 0L
            rows.foreach { r =>
              n += 1; c += math.round(r._2 * 100); maxTs = math.max(maxTs, r._3.getTime)
            }
            val next = UserTotal(userId, n, c, c / 100.0)
            state.update(next)
            state.setTimeoutTimestamp(maxTs + idleTimeoutMs)
            Iterator.single(next)
          }
      }
  }

  /** Incremental ETL sink: stream -> foreachBatch -> date-partitioned
    * parquet with DYNAMIC partition overwrite — each micro-batch replaces
    * only the partitions it touches, so replaying a batch (failure
    * recovery, at-least-once upstream) is idempotent at the partition
    * level. This is the production sink pattern when the target is a plain
    * parquet table (no transactional log): correctness comes from
    * partition-granular overwrite + deterministic partition assignment.
    * Returns the path written.
    */
  def incrementalPartitionedSink(spark: SparkSession, events: DataFrame,
                                 outDir: String): Unit = {
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val q = events.writeStream
        .outputMode(OutputMode.Append)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batch.withColumn("d", to_date(col("ts")))
            .write.mode("overwrite").partitionBy("d").parquet(outDir)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  /** Run a streaming query to completion against the (finite) parquet source
    * and return the materialized result — used by tests and the batch-parity
    * checks.
    */
  def runToBatch(spark: SparkSession, streamed: DataFrame, mode: OutputMode,
                 name: String): DataFrame = {
    val q = streamed.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }
}

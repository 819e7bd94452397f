package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.tables.Tables

/** Streaming/batch parity. In Append mode a window is emitted only once the
  * watermark passes its end — windows still open when the finite stream ends
  * are (correctly) never emitted. Parity is therefore two-sided:
  * every emitted row must equal a batch row, and every batch window that
  * closed before the final watermark must have been emitted.
  */
class EventsStreamingSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val finalWatermark: Timestamp = {
    val maxTs = Tables.load(spark, sfDir, "events")
      .agg(max(col("ts"))).collect().head.getTimestamp(0)
    new Timestamp(maxTs.getTime - 2 * 3600 * 1000) // the 2h watermark delay
  }

  test("tumbling window counts match the batch aggregation") {
    val streamed = EventsStreaming.runToBatch(spark,
      EventsStreaming.tumblingCounts(EventsStreaming.readStream(spark, sfDir)),
      OutputMode.Append, "t_tumbling")
    val batch = Tables.load(spark, sfDir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sv"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("h"),
        col("event_type"), col("cnt"), col("sv"),
        col("window.end").as("wend"))
    val out = batch.drop("wend")
    // emitted rows are all correct
    assert(streamed.exceptAll(out).isEmpty)
    // every closed window was emitted
    val closed = batch.filter(col("wend") <= lit(finalWatermark)).drop("wend")
    assert(closed.exceptAll(streamed).isEmpty)
    assert(streamed.count() > 0 && closed.count() > 0)
  }

  test("session windows match the batch session_window aggregation") {
    val streamed = EventsStreaming.runToBatch(spark,
      EventsStreaming.sessionCounts(EventsStreaming.readStream(spark, sfDir)),
      OutputMode.Append, "t_sessions")
    val batch = Tables.load(spark, sfDir, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"), col("session_window.end").as("wend"))
    val out = batch.drop("wend")
    assert(streamed.exceptAll(out).isEmpty)
    val closed = batch.filter(col("wend") <= lit(finalWatermark)).drop("wend")
    assert(closed.exceptAll(streamed).isEmpty)
    assert(streamed.count() > 0 && closed.count() > 0)
  }

  test("mapGroupsWithState running totals equal the batch group-by") {
    val streamed = EventsStreaming.runToBatch(spark,
      EventsStreaming.userRunningTotals(spark,
        EventsStreaming.readStream(spark, sfDir)).toDF(),
      OutputMode.Update, "t_totals")
    // final state per user (last update) must equal the batch totals
    val finalState = streamed.groupBy("user_id")
      .agg(max(col("n_events")).as("n_events"))
    val batch = Tables.load(spark, sfDir, "events")
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
    assert(finalState.exceptAll(batch).isEmpty && batch.exceptAll(finalState).isEmpty)
  }
}

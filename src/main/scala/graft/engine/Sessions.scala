package graft.engine

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale-oriented defaults.
  *
  * Tuned for local[N] testing but every knob generalizes to a cluster:
  * AQE (runtime join re-selection, skew handling, partition coalescing) is the
  * mechanism that keeps the declared query surface efficient at 100 TB without
  * per-query hand-tuning.
  */
object Sessions {
  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
              shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.engine.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // let AQE coalesce CACHED plan output too (r19; default false): the
      // CDC/IVM operators pin their batch-scoped state intermediates
      // (persist), and with this off every pinned frame materializes at
      // the full spark.sql.shuffle.partitions count and every consumer
      // stage pays that many tasks regardless of data size — measured as
      // dozens of 32-task stages over KB-sized cached deltas per
      // lifecycle. Size-adaptive at any scale: big caches stay parallel
      // (64 MB advisory target), tiny ones stop fanning out.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def local(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.AggIndex
import graft.tables.Tables

/** Scale evidence for the incremental-aggregate lifecycle (AggIndex):
  * stands up a long-lived rollup over an on-disk event log — one base
  * build plus SPARK_GRAFT_AGG_BATCHES incremental refreshes (default 64,
  * "two months of twice-daily loads") — and times the three costs that
  * matter:
  *
  *   1. the NAIVE refresh (re-aggregate the whole stored log) vs the
  *      incremental refresh (aggregate the newest delta directory, append
  *      partials) — the per-refresh bill the operator exists to remove;
  *   2. the merge-on-read query over the accreted per-batch partials;
  *   3. the same query after AggIndex.compact (one row per key).
  *
  * The log is MATERIALIZED to parquet partitioned by load batch — the
  * production shape (each day's load is its own directory; nothing keeps
  * a 100 TB log in executor memory): the naive side pays the full-log
  * scan a real refresh would pay, the incremental side reads only its
  * delta directory. SPARK_GRAFT_AGG_COPIES duplicates the log (disjoint
  * event/user ids, the ScaleRun discipline) to expose how the two
  * refresh costs scale with log size. Findings live in SCALE.md.
  *
  * Usage: SPARK_GRAFT_AGG_COPIES=10 runMain graft.tools.AggScaleRun
  */
object AggScaleRun {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_AGG_BATCHES", "64").toInt
    val copies = sys.env.getOrElse("SPARK_GRAFT_AGG_COPIES", "1").toInt
    require(nBatches >= 2, s"need >= 2 batches to time an incremental refresh: $nBatches")
    val spark = graft.engine.Sessions.builder(master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the on-disk log, one directory per load batch
    val logDir = s"/tmp/graft_aggscale_log_${copies}x_$nBatches"
    if (!new java.io.File(logDir).exists()) {
      val ev0 = Tables.load(spark, base, "events")
      (0 until copies)
        .map(k => ev0
          .withColumn("event_id", col("event_id") + lit(k * 100000000L))
          .withColumn("user_id", col("user_id") + lit(k * 100000000L)))
        .reduce(_ unionByName _)
        .withColumn("load", pmod(col("event_id"), lit(nBatches)).cast("int"))
        .repartition(32)
        .write.partitionBy("load").mode("overwrite").parquet(logDir)
    }
    def log() = spark.read.parquet(logDir)
    val nRows = log().count()

    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body; (a, (System.nanoTime() - t0) / 1e9)
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    val path = java.nio.file.Files.createTempDirectory("graft_aggscale_").toString
    val (_, tBuild) = time(AggIndex.build(log().filter(col("load") === 0), path))
    val ingestTimes = (1 until nBatches).map { b =>
      // partition pruning makes this a one-directory scan — the delta
      time(AggIndex.ingest(log().filter(col("load") === b), path, b))._2
    }
    // noop-format writes, not count(): count() lets Catalyst prune every
    // aggregate expression (the DECIMAL sum, min/max, the HLL sketch) and
    // the timing would measure a keys-only scan instead of the rollup
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // the naive alternative each refresh pays: re-aggregate the WHOLE log
    val naiveTimes = (1 to 5).map(_ => time(exec(AggIndex.partials(log())))._2)

    val mergedTimes = (1 to 5).map(_ => time(exec(AggIndex.merged(spark, path)))._2)
    val storedRows = spark.read.parquet(path).count()
    val (_, tCompact) = time(AggIndex.compact(spark, path))
    val compactRows = spark.read.parquet(path).count()
    val compactedTimes = (1 to 5).map(_ => time(exec(AggIndex.merged(spark, path)))._2)

    println(f"[aggscale] log rows=$nRows copies=$copies batches=$nBatches build=${tBuild}%.2f s")
    println(f"[aggscale] refresh: naive-recompute med=${median(naiveTimes)}%.2f s " +
      f"vs incremental-ingest med=${median(ingestTimes)}%.2f s " +
      f"(x${median(naiveTimes) / median(ingestTimes)}%.1f)")
    println(f"[aggscale] merged query: $storedRows partial rows med=${median(mergedTimes)}%.2f s; " +
      f"after compact ($compactRows rows, ${tCompact}%.2f s): med=${median(compactedTimes)}%.2f s")
    spark.stop()
  }
}

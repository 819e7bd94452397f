package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.{AggIndex, JoinView}

/** Scratch profiler for the composed CDC pipeline: per-stage wall times at
  * a given SF, with and without the pd= day layout — the measurement
  * behind the r18 state-read pruning work.
  */
object CdcPipelineProfile {
  def main(args: Array[String]): Unit = {
    val useDay = args.headOption.contains("day")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.Sessions.builder(master = "local[32]",
      shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val ord = graft.tables.Tables.load(s, sfDir, "orders")
    val a0 = ord.select(col("o_orderkey").as("key"), col("o_orderdate").as("ts"),
      col("o_custkey").as("user_id"), col("o_totalprice").as("value"))
    val b0 = ord.select(col("o_orderkey").as("key"), col("o_orderpriority").as("prio"))
    val keys = ord.select(col("o_orderkey").as("key"))
    val r = java.nio.file.Files.createTempDirectory("graft_cdcprof_").toString
    def feed(n: Int) =
      s.read.parquet(s"$r/jv/view").filter(col("batch") === n)
        .select(col("prio").as("event_type"), col("ts"),
          col("value"), col("user_id"), col("sgn"))
    def stateFull = JoinView.merged(s, s"$r/jv")
      .select(col("prio").as("event_type"), col("ts"), col("value"), col("user_id"))
    def stateDays(days: Seq[String]) = JoinView.mergedForDays(s, s"$r/jv", days)
      .select(col("prio").as("event_type"), col("ts"), col("value"), col("user_id"))
    if (args.headOption.contains("local")) {
      // day-LOCALIZED corrections: the production cadence, and where the
      // pd= pruning shows — one single-day correction, timed with the
      // pruned stateForDays read vs the full-state read
      JoinView.build(a0, b0, "key", s"$r/jv", cdc = true, dayCol = "ts")
      AggIndex.build(feed(0).drop("sgn"), s"$r/agg", cdc = true)
      val days = Seq("1995-03-15", "1995-03-16", "1995-03-17")
      for ((d, i) <- days.zipWithIndex) {
        t(s"jv.cdc$i(1day)") { JoinView.ingestCdc(
          a0.filter(to_date(col("ts")) === lit(d))
            .withColumn("value", col("value") + 100),
          b0.limit(0), "key", s"$r/jv") }
        if (i % 2 == 0)
          t(s"agg.cdc$i PRUNED") { AggIndex.ingestCdc(feed(i + 1), null,
            s"$r/agg", i + 1, stateForDays = stateDays) }
        else
          t(s"agg.cdc$i FULL") { AggIndex.ingestCdc(feed(i + 1), stateFull,
            s"$r/agg", i + 1) }
      }
      // the scale evidence: partitions/files selected by the pruned read
      // vs the full merge (wall time at sf0.1 is job-overhead-bound; the
      // scan fraction is what survives a 100x scale-up)
      def scanStats(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
        import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
        df.collect() // finalize AQE
        def go(p: SparkPlan): Seq[FileSourceScanExec] =
          p.collect {
            case f: FileSourceScanExec => Seq(f)
            case q: QueryStageExec => go(q.plan)
          }.flatten
        val root = df.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
        val scans = go(root).filter(
          _.relation.location.rootPaths.exists(_.toString.endsWith("/view")))
        (scans.map(_.selectedPartitions.partitionCount.toLong).sum,
          scans.map(_.selectedPartitions.totalFileSize).sum)
      }
      val (pp, pb) = scanStats(JoinView.mergedForDays(s, s"$r/jv", days.take(1)))
      val (fp, fb) = scanStats(JoinView.merged(s, s"$r/jv"))
      println(s"[prof] 1-day pruned view read: $pp partitions / $pb bytes; " +
        s"full merge: $fp partitions / $fb bytes")
      spark.stop(); return
    }
    t("jv.build") {
      if (useDay) JoinView.build(a0, b0, "key", s"$r/jv", cdc = true, dayCol = "ts")
      else JoinView.build(a0, b0, "key", s"$r/jv", cdc = true)
    }
    t("agg.build") { AggIndex.build(feed(0).drop("sgn"), s"$r/agg", cdc = true) }
    t("jv.cdc1") { JoinView.ingestCdc(
      a0.filter(col("key") % 7 === 3).withColumn("value", col("value") + 100),
      b0.limit(0), "key", s"$r/jv") }
    t("agg.cdc1") {
      if (useDay) AggIndex.ingestCdc(feed(1), null, s"$r/agg", 1, stateForDays = stateDays)
      else AggIndex.ingestCdc(feed(1), stateFull, s"$r/agg", 1)
    }
    t("jv.cdc2") { JoinView.ingestCdc(a0.limit(0), b0.limit(0), "key", s"$r/jv",
      delA = keys.filter(col("key") % 13 === 2),
      delB = keys.filter(col("key") % 17 === 5)) }
    t("agg.cdc2") {
      if (useDay) AggIndex.ingestCdc(feed(2), null, s"$r/agg", 2, stateForDays = stateDays)
      else AggIndex.ingestCdc(feed(2), stateFull, s"$r/agg", 2)
    }
    t("jv.cdc3") { JoinView.ingestCdc(a0.limit(0),
      b0.filter(col("key") % 5 === 1).select(col("key"), lit("P9").as("prio")),
      "key", s"$r/jv") }
    t("agg.cdc3") {
      if (useDay) AggIndex.ingestCdc(feed(3), null, s"$r/agg", 3, stateForDays = stateDays)
      else AggIndex.ingestCdc(feed(3), stateFull, s"$r/agg", 3)
    }
    t("merged.read") { AggIndex.merged(s, s"$r/agg")
      .write.format("noop").mode("overwrite").save() }
    val viewFiles = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(s"$r/jv/view")).iterator().asScala
        .count(p => p.toString.endsWith(".parquet"))
    }
    println(s"[prof] view parquet files: $viewFiles")
    spark.stop()
  }
}

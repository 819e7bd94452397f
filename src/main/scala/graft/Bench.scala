package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Sessions.builder(
        master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Execute through the noop sink: the whole physical plan runs — including
    // final global sorts, which a count() lets Catalyst eliminate — with zero
    // driver-side materialization.
    def exec(q: queries.Query): Unit =
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
    // CONVERGENCE warmup, per slot, immediately before its timed runs
    // (r11 verdict task 1): a single warmup pass under-warms JIT/
    // codegen-heavy slots — the r11 record showed q5_agg at 1.37 s where
    // the steady state (reached only after ~6 executions) is ~0.5 s, so
    // the published medians depended on where in the warmup curve the
    // timed runs landed. Warm each slot until two CONSECUTIVE warm runs
    // agree within 10% (capped at 5 passes — a slot that hasn't converged
    // by then is measured as-is rather than stalling the harness), THEN
    // take the timed median: the timed runs sample the steady-state
    // plateau, not the JIT ramp. Warm-run times go to stderr so the ramp
    // stays inspectable.
    def warmConverged(q: queries.Query): Unit = {
      val maxWarm = 5
      var prev = -1.0
      var i = 0
      var converged = false
      while (i < maxWarm && !converged) {
        val t0 = System.nanoTime()
        try {
          exec(q)
          val t = (System.nanoTime() - t0) / 1e9
          System.err.println(f"[bench-warm] ${q.name} pass ${i + 1}: $t%.2f")
          if (prev > 0 && math.abs(t - prev) <= 0.10 * math.min(t, prev))
            converged = true
          prev = t
        } catch {
          case e: Throwable => System.err.println(s"[bench-warm] ${q.name}: $e")
        }
        i += 1
      }
    }
    // Median of 5 timed runs per query (3 until r11): single-shot slots let
    // one-off environmental outliers (GC pause, page-cache miss, a straggler
    // scheduled last) into the round record — r6 shipped a 6x outlier for
    // w_session_window that two re-runs couldn't reproduce, and r11 MEASURED
    // the median-of-3 noise floor by benching identical code twice on an
    // idle machine: median slot-level spread 1.13x, tail to 1.65x
    // (q14_window_rank 0.365 vs 0.600 s) — larger than most round-over-round
    // deltas being adjudicated. Median-of-5 tightens the estimator (two bad
    // runs in the same direction no longer move it); per-run times go to
    // stderr so spread stays inspectable.
    val timedRuns = 5
    // LOAD SENTINELS (r15 verdict task 4): two fixed-cost slots whose
    // work is INDEPENDENT of engine code — a pure-codegen CPU burn and a
    // fixed parquet write+read — measured under the same warm+median
    // protocol and recorded in the queries map (excluded from "total").
    // Round-over-round they are constants, so a contention-polluted run
    // (the BENCH_r15 record: a 3.4x-loaded machine inflating FS-heavy
    // slots 2-10x on untouched code) self-identifies: sentinel drift
    // marks the RECORD suspect before any per-slot adjudication.
    def medianOf(label: String, runs: Int, f: () => Unit): Double = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime(); f()
        System.err.println(f"[bench-warm] $label pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f")
      }
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }.sorted
      System.err.println(f"[bench-runs] $label: ${times.map(t => f"$t%.2f").mkString(" ")}")
      times(times.size / 2)
    }
    val sentinelCpu = medianOf("sentinel_cpu", timedRuns, () =>
      spark.range(0, 400000000L, 1, cpus.toInt)
        .selectExpr("sum(id * 2 + 1) as s")
        .write.format("noop").mode("overwrite").save())
    val sentinelDir = java.nio.file.Files.createTempDirectory("graft_bench_sent_").toString
    val sentinelFs = medianOf("sentinel_fs", timedRuns, () => {
      spark.range(0, 2000000L, 1, cpus.toInt)
        .selectExpr("id", "cast(id % 97 as string) as v")
        .write.mode("overwrite").parquet(s"$sentinelDir/t")
      spark.read.parquet(s"$sentinelDir/t")
        .write.format("noop").mode("overwrite").save()
    })
    val results = SparkEntry.headlineQueries.map { query =>
      warmConverged(query)
      val times = (1 to timedRuns).flatMap { _ =>
        val t0 = System.nanoTime()
        try { exec(query); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${query.name}: $e"); None
        }
      }.sorted
      System.err.println(f"[bench-runs] ${query.name}: ${times.map(t => f"$t%.2f").mkString(" ")}")
      // median of the SUCCESSFUL runs when successes hold the MAJORITY: a
      // single transient fault must not void the slot that median-of-3
      // exists to protect (with 2 successes the upper one is taken —
      // conservative). Majority failure records the unambiguous -1
      // sentinel — a state-dependent regression (first run works, warm
      // runs throw) must never enter the round record as one healthy
      // number, and a FAST failure must never read as a speedup.
      query.name -> (if (times.size * 2 <= timedRuns) -1.0 else times(times.size / 2))
    }
    val qs = (("sentinel_cpu" -> sentinelCpu) +: ("sentinel_fs" -> sentinelFs) +: results)
      .map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // sentinels are diagnostics, not engine cost: excluded from the total
    val total = results.map(_._2).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // Record contract (r18 verdict item 1): the driver's parser has read
    // null from the sbt-wrapped stdout since r15. Ship the record on two
    // redundant channels: (a) a file the driver (and the round log) can
    // read back verbatim, (b) the bare JSON as the process's final stdout
    // line — build.sbt routes forked run output straight through
    // (StdoutOutput), so the line is no longer "[info]"-prefixed.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "./bench_last.json")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[bench] write $outFile: $e") }
    spark.stop()
    println(json)
  }
}

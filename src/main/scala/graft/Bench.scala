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
    // Untimed warmup pass over EVERY headline query: absorbs Janino codegen
    // compilation, session setup, and FS-cache warmup that would otherwise
    // land in the timed slots, making round-over-round deltas on unchanged
    // queries pure noise (r4/r5 verdicts observed +-30% drift on
    // byte-identical code). Timed runs below measure steady-state plans.
    SparkEntry.headlineQueries.foreach { q =>
      try exec(q)
      catch { case e: Throwable => System.err.println(s"[bench-warm] ${q.name}: $e") }
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
    val results = SparkEntry.headlineQueries.map { query =>
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
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

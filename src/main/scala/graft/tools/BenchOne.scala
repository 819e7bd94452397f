package graft.tools

/** Per-query timing harness for perf iteration: `runMain graft.tools.BenchOne
  * <query> [n]` runs one `SparkEntry.queries` entry n times (default 5, one
  * untimed warm run) through the noop sink at the bench session shape
  * (local[32], sp=32) and prints the per-run times + median — the
  * single-slot view Bench.scala's full headline sweep doesn't give.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0); val n = if (args.length > 1) args(1).toInt else 5
    // warm passes before timing (default 3): a single warm run under-warms
    // JIT/codegen-heavy lifecycle slots (Bench.scala's convergence-warmup
    // rationale) — A/B medians taken at warm=1 showed a descending ramp
    // inside the timed runs themselves
    val warm = if (args.length > 2) args(2).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.engine.Sessions.builder(master = s"local[$cpus]",
      shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.SparkEntry.queries(name)
    def exec(): Double = {
      val t0 = System.nanoTime()
      q(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    (1 to warm).foreach { i =>
      val t = exec()
      System.err.println(f"[benchone-warm] $name pass $i: $t%.2f")
    }
    val ts = (1 to n).map(_ => exec())
    println(f"[benchone] $name: ${ts.map(t => f"$t%.2f").mkString(" ")} median=${ts.sorted.apply(n/2)}%.2f")
    spark.stop()
  }
}

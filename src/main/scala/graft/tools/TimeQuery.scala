package graft.tools

/** Dev-loop timer: median-of-3 (after one warmup) for NAMED queries, same
  * noop-sink execution discipline as [[graft.Bench]] — for sizing a query
  * before promoting it to the headline set, without paying a full bench run.
  *
  * Usage: runMain graft.tools.TimeQuery <sfDir> <name>[,<name>...]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeQuery <sfDir> <q1>[,<q2>...]")
    val sfDir = args(0)
    val names = args(1).split(',').toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Sessions.builder(
        master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val byName = graft.SparkEntry.catalog.map(q => q.name -> q).toMap
    for (name <- names) {
      val query = byName.getOrElse(name, sys.error(s"unknown query: $name"))
      def exec(): Unit =
        query.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      exec() // warmup
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        exec()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[time] $name: median ${times(1)}%.2f s (runs ${times.map(t => f"$t%.2f").mkString(" ")})")
    }
    spark.stop()
  }
}

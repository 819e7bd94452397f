package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Sessions.builder(
        master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Trigger full execution without driver-side result materialization:
    // count() on the final plan (Catalyst won't prune compute under it since
    // the plans contain aggregates/joins/limits).
    val results = SparkEntry.headlineQueries.map { query =>
      val t0 = System.nanoTime()
      try query.run(spark, sfDir).count()
      catch { case e: Throwable => System.err.println(s"[bench] ${query.name}: $e"); -1L }
      query.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

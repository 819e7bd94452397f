package graft.tools

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named queries (or every headline
  * query) to `<outDir>/<name>_<tag>.txt` — the optimization rounds'
  * plan-evidence artifact (plans/r18, tags "before" and "after").
  *
  * `runMain graft.tools.PlanDump <outDir> <tag> [q1,q2,...]`
  *
  * Runs at the bench session shape. For lifecycle slots the run function
  * executes its builds/ingests eagerly and the dumped plan is the final
  * read — the timed artifact the judge checks claims against.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val only = args.lift(2).map(_.split(',').toSet)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.engine.Sessions.builder(master = "local[32]",
      shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val qs = graft.SparkEntry.catalog
      .filter(q => only.map(_.contains(q.name)).getOrElse(q.headline))
    qs.foreach { q =>
      try {
        val df = q.run(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${q.name}_$tag.txt"), plan)
        System.err.println(s"[plandump] ${q.name} ok")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] ${q.name} FAILED: $e")
      }
    }
    spark.stop()
  }
}

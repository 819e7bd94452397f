package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Per-job wall-time attribution for one query: runs a `SparkEntry.queries`
  * entry once (warm) + once measured with a listener that logs every job's
  * duration, task count and total task time — the stage-level view the
  * disabled UI would give. `runMain graft.tools.JobProfile <query>`.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.engine.Sessions.builder(master = s"local[$cpus]",
      shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.SparkEntry.queries(name)
    def exec(): Unit =
      q(spark, sfDir).write.format("noop").mode("overwrite").save()
    exec() // warm
    val jobs = mutable.Map[Int, (Long, String)]()
    val stageTasks = mutable.Map[Int, (Int, Long)]() // stageId -> (tasks, taskTimeMs)
    val jobStages = mutable.Map[Int, Seq[Int]]()
    val lines = mutable.ArrayBuffer[String]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs(js.jobId) = (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description")).getOrElse(""))
        jobStages(js.jobId) = js.stageIds.map(_.toInt)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stageTasks(si.stageId) =
          (si.numTasks, si.taskMetrics.executorRunTime)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        jobs.get(je.jobId).foreach { case (t0, desc) =>
          val wall = (System.nanoTime() - t0) / 1e9
          val (nt, tt) = jobStages(je.jobId)
            .flatMap(stageTasks.get).foldLeft((0, 0L)) {
              case ((a, b), (c, d)) => (a + c, b + d)
            }
          lines += f"[job] ${je.jobId}%4d ${wall}%7.2fs tasks=$nt%4d taskTime=${tt / 1000.0}%8.1fs  $desc"
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    exec()
    val total = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500)
    lines.foreach(println)
    println(f"[job] TOTAL $total%.2f s, ${lines.size} jobs")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Scale evidence beyond the sf0.1 gate: duplicate the documents table
  * COPIES times (disjoint doc_id ranges, identical text — "the same web,
  * crawled COPIES times", the worst case for near-dup machinery: every
  * banded bucket carries COPIES x its sf0.1 rows, so in-bucket pair work
  * grows COPIES^2 while input grows COPIES), run the dedup headliners
  * once, and report wall time plus per-stage task skew (max vs median
  * task ms of the stage owning the slowest task). Findings live in
  * SCALE.md.
  *
  * Usage: SPARK_GRAFT_SCALE_COPIES=10 runMain graft.tools.ScaleRun
  */
object ScaleRun {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
    val dir = s"/tmp/graft_scale${copies}x"
    val spark = graft.engine.Sessions.builder(master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (!new java.io.File(s"$dir/documents.parquet").exists()) {
      val docs = spark.read.parquet(s"$base/documents.parquet")
      (0 until copies)
        .map(k => docs.withColumn("doc_id", col("doc_id") + lit(k * 10000000L)))
        .reduce(_ unionByName _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    }

    // per-stage task durations, reset per query
    val stageTasks = new java.util.concurrent.ConcurrentHashMap[Int, java.util.List[Long]]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        stageTasks
          .computeIfAbsent(t.stageId, _ => java.util.Collections.synchronizedList(
            new java.util.ArrayList[Long]()))
          .add(t.taskInfo.duration)
      }
    })

    val byName = graft.SparkEntry.catalog.map(q => q.name -> q).toMap
    val defaultSet = Seq("d_simhash", "d_simhash_weighted", "d_minhash_lsh", "d_dup_clusters",
      "d_minhash_collapse", "p_collapse_neardup", "d_substring_dedup",
      "d_substring_index", "d_dedup_index", "p_cut_spans", "p_pipeline_neardup")
    // SPARK_GRAFT_SCALE_QUERIES: comma-separated subset for re-measuring
    // one operator without paying the whole sweep
    val names = sys.env.get("SPARK_GRAFT_SCALE_QUERIES")
      .map(_.split(',').toSeq).getOrElse(defaultSet)
    for (name <- names) {
      stageTasks.clear()
      val t0 = System.nanoTime()
      val rows = byName(name).run(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // the listener bus is async — the slowest task's end event (the one
      // the skew stat exists to capture) is the likeliest to still be
      // queued when count() returns; give the bus a moment to drain
      Thread.sleep(1000)
      import scala.jdk.CollectionConverters._
      val stats = stageTasks.asScala.toSeq.map { case (sid, l) =>
        val d = l.asScala.toSeq.sorted
        (sid, d.size, d.last, d(d.size / 2))
      }.sortBy(-_._3).take(3)
      val skew = stats.map { case (sid, n, mx, med) =>
        f"stage$sid(tasks=$n max=${mx}ms med=${med}ms)"
      }.mkString(" ")
      println(f"[scale] $name%-20s wall=$wall%7.1f s rows=$rows%9d  top-task-stages: $skew")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.EntityBlockIndex
import graft.tables.Tables

/** Scale measurement for the r13 entity-screen rework: per-trigger probe
  * cost against a master list of N vs 10N entities, comparing
  *
  *   - OLD (pre-r13 st_entity_screen trigger body): parity-block the
  *     FULL master-plus-batch and self-join — a master-sized kernel and
  *     shuffle per trigger;
  *   - NEW (EntityBlockIndex): candidates from the STORED bb=-bucketed
  *     block index — kernel-free, text-free, partition-pruned to the
  *     batch's buckets.
  *
  * The batch is 5 synthetic non-matching names (so candidate output is
  * ~empty and the measurement isolates scan/kernel/shuffle cost, not
  * verification of real pairs). Master replicas carry 4-char suffixes
  * differing pairwise by >= 3 edits, so replication adds no cross-replica
  * pairs and the blow-up axis is pure corpus size.
  *
  * Usage: runMain graft.tools.EntityScaleRun [sfDir]
  */
object EntityScaleRun {

  private def timeMedian(name: String, runs: Int = 5)(body: => Unit): Double = {
    body // warm
    val ts = (1 to runs).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }.sorted
    val med = ts(runs / 2)
    println(f"[entity-scale] $name%-34s median $med%.3f s  (runs: ${ts.map(t => f"$t%.3f").mkString(" ")})")
    med
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.engine.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey").as("key"), col("c_name").as("name"))
    val n = base.count()

    def master(copies: Int): DataFrame =
      (0 until copies).map { i =>
        base.select((col("key") + lit(i.toLong * 10_000_000L)).as("key"),
          concat(col("name"), lit(s"$i${i}q$i")).as("name"))
      }.reduce(_ unionByName _)

    // 5 synthetic names that match nothing (hex-ish, unique shapes)
    val batch = Seq(
      (900000001L, "zq9x7-kkfh3-aa01"), (900000002L, "m2nnb-0pq8r-ty55"),
      (900000003L, "ghw4c-11zvd-op92"), (900000004L, "rr6ss-e3jut-bn37"),
      (900000005L, "cvb81-yy2lk-qd64")).toDF("key", "name")

    for (copies <- Seq(1, 10)) {
      val m = master(copies).cache(); m.count()
      val label = s"master=${copies}x$n"

      // NEW: stored index built once (ingest cost is per-entity-lifetime,
      // not per-trigger); the measured body is the per-trigger probe
      val p = java.nio.file.Files.createTempDirectory("graft_entscale_").toString + "/idx"
      EntityBlockIndex.build(m, p)
      EntityBlockIndex.ingest(batch, p, batch = 1)
      // the streamed-trigger shape: probe with the in-memory batch blocks
      // (screenStream's path — no index re-read for the batch rows)
      timeMedian(s"$label NEW stored+pruned probe") {
        EntityBlockIndex.verifyTypo(EntityBlockIndex.candidates(
            spark, p, 1, Some(EntityBlockIndex.blocks(batch))))
          .write.format("noop").mode("overwrite").save()
      }

      // BATCH-probe shape (d_entity_index: no in-memory blocks): bucket
      // discovery from the r14 _batch_buckets manifest vs the pre-r14
      // index-wide footer scan (manifest deleted -> counted fallback)
      def batchProbe(): Unit =
        EntityBlockIndex.verifyTypo(EntityBlockIndex.candidates(spark, p, 1))
          .write.format("noop").mode("overwrite").save()
      timeMedian(s"$label batch probe, manifest discovery")(batchProbe())
      val md = new org.apache.hadoop.fs.Path(p + "/_batch_buckets")
      val mfs = md.getFileSystem(spark.sessionState.newHadoopConf())
      mfs.delete(md, true)
      timeMedian(s"$label batch probe, index-wide discovery")(batchProbe())

      // OLD: the pre-r13 trigger body — kernel master+batch every trigger
      timeMedian(s"$label OLD re-kernel master") {
        val pa = EntityBlockIndex.blocks(batch).as("a")
        val pb = EntityBlockIndex.blocks(m.unionByName(batch)).as("b")
        val first = col("a.key") < col("b.key")
        val cands = pa.join(pb,
            col("a.part") === col("b.part") && col("a.v") === col("b.v") &&
              col("a.len") === col("b.len") && col("a.key") =!= col("b.key"))
          .select(
            when(first, col("a.key")).otherwise(col("b.key")).as("a_key"),
            when(first, col("b.key")).otherwise(col("a.key")).as("b_key"),
            when(first, col("a.name")).otherwise(col("b.name")).as("a_name"),
            when(first, col("b.name")).otherwise(col("a.name")).as("b_name"))
        EntityBlockIndex.verifyTypo(cands)
          .write.format("noop").mode("overwrite").save()
      }
      m.unpersist()
    }
    spark.stop()
  }
}

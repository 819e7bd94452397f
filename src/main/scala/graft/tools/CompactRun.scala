package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.{IndexMaintenance, SignatureIndex}

/** Measured evidence for index compaction: build a signature index the
  * shape a long-lived stream leaves behind — one file per micro-batch —
  * then time the same probe against the fragmented and the compacted
  * layout. `SPARK_GRAFT_COMPACT_BATCHES` (default 128) controls the
  * fragment count; sf dir via `SPARK_GRAFT_SF_DIR`.
  */
object CompactRun {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_COMPACT_BATCHES", "128").toInt
    val spark = graft.engine.Sessions.builder(
      master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.tables.Tables.load(spark, sfDir, "documents")
    val path = java.nio.file.Files.createTempDirectory("graft_cmprun_").toString + "/idx"
    val b = pmod(col("doc_id"), lit(nBatches)).cast("int")

    // ONE kernel pass, then carve the signature relation into per-batch
    // appends so the fragment count, not the kernel, is what we stand up
    val sigs = SignatureIndex.signatures(docs).withColumn("batch", b)
    sigs.cache().count()
    (0 until nBatches).foreach { i =>
      sigs.filter(col("batch") === i).coalesce(1)
        .write.mode("append").parquet(path)
    }
    sigs.unpersist()

    def timeProbe(label: String): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        SignatureIndex.probe(spark, path, batch = nBatches - 1)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      val ts = (1 to 5).map(_ => once())
      println(f"[compact] probe($label): ${ts.map(t => f"$t%.2f").mkString(" ")} " +
        f"median=${ts.sorted.apply(2)}%.2f")
    }

    timeProbe(s"fragmented, $nBatches files")
    val t0 = System.nanoTime()
    val (nb, na) = IndexMaintenance.compact(spark, path)
    println(f"[compact] compact: $nb -> $na files in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    timeProbe(s"compacted, $na files")
    spark.stop()
  }
}

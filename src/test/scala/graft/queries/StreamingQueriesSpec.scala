package graft.queries

import graft.SparkSpec

/** The streaming CORRECTNESS entries must terminate and produce rows (the
  * value-level check is the DuckDB differential).
  */
class StreamingQueriesSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  StreamingQueries.all.foreach { q =>
    test(s"${q.name} terminates with rows") {
      val n = q.run(spark, sfDir).count()
      assert(n > 0)
    }
  }

  test("streamed vector probes equal the batch stored-index answers") {
    // the in-flight matrix's equality contract, query side: each probe
    // answered per micro-batch must match the same probe asked of a
    // batch-built index — streaming changes WHEN a query is answered,
    // never WHAT it answers
    import org.apache.spark.sql.functions.col
    import graft.operators.{IvfPqIndex, PqIndex}
    val emb = graft.tables.Tables.load(spark, sfDir, "embeddings")
    val cb = PqIndex.codebookOf(emb)
    val cents = IvfPqIndex.centroidsOf(emb)
    val pqTwin = java.nio.file.Files.createTempDirectory("graft_pqprobe_twin_").toString
    PqIndex.build(emb, cb, pqTwin)
    val ivfTwin = java.nio.file.Files.createTempDirectory("graft_ivfpqprobe_twin_").toString
    IvfPqIndex.build(emb, cents, cb, ivfTwin)
    val probes = (1L to 3L).map(i => i -> emb.filter(col("vec_id") === i)
      .select("embedding").collect().head.getSeq[Float](0))
    def batch(answer: Seq[Float] => org.apache.spark.sql.DataFrame) =
      probes.flatMap { case (qid, pv) =>
        answer(pv).collect().map(r => (qid, r.getLong(0), r.getDouble(1)))
      }.toSet
    def streamed(q: Query) = q.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed(StreamingQueries.st_pq_probe) ==
      batch(pv => PqIndex.query(spark, pqTwin, PqIndex.adcLut(pv, cb), topN = 5)))
    assert(streamed(StreamingQueries.st_ivfpq_probe) ==
      batch(pv => IvfPqIndex.query(spark, ivfTwin, pv, cents, cb, topN = 5)))
  }
}

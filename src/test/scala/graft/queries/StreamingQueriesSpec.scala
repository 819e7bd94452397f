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
}

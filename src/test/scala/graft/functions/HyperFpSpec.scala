package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The codegen kernel must agree bit-for-bit with the declarative
  * higher-order-function formulation of the same fingerprint (which is also
  * what the DuckDB oracle implements in SQL).
  */
class HyperFpSpec extends SparkSpec {

  private def hofFp(nBits: Int, dim: Int) = {
    val planes = typedlit(SharedHash.planes(nBits, dim))
    def dot(j: org.apache.spark.sql.Column) =
      aggregate(sequence(lit(0), lit(dim - 1)), lit(0.0),
        (acc, d) => acc + get(col("embedding"), d).cast("double") * get(get(planes, j), d))
    aggregate(sequence(lit(nBits - 1), lit(0), lit(-1)), lit(0L),
      (acc, j) => acc * 2 + when(dot(j) > 0, 1L).otherwise(0L))
  }

  for (nBits <- Seq(8, 63)) test(s"kernel == HOF formulation on real embeddings (nBits=$nBits)") {
    val emb = graft.tables.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val mismatches = emb.select(
      HyperFp.hyperFp(col("embedding"), nBits).as("kernel"),
      hofFp(nBits, 64).as("hof"))
      .filter(col("kernel") =!= col("hof"))
      .count()
    assert(mismatches == 0)
  }

  test("fingerprint is deterministic and uses all requested bits") {
    val emb = graft.tables.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val distinct = emb.select(HyperFp.hyperFp(col("embedding"), 63).as("f"))
      .distinct().count()
    assert(distinct > 1) // spread across buckets
    def fps(): Seq[Long] = emb.orderBy("vec_id")
      .select(HyperFp.hyperFp(col("embedding"), 63).as("f"))
      .collect().map(_.getLong(0)).toSeq
    assert(fps() == fps())
  }
}

package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.Tables

/** d_entity_match's pigeonhole exactness: the parity-blocked candidate
  * set must reproduce the BRUTE-FORCE Hamming<=1 pair set (blocking
  * governs recall — the one property the DuckDB oracle cannot localize
  * if it fails), and planted typos behave at the threshold boundary.
  */
class EntityMatchSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("parity blocking reproduces the brute-force pair set exactly") {
    val c = Tables.load(spark, sfDir, "customer").select(col("c_custkey"), col("c_name"))
    val banded = graft.SparkEntry.queries("d_entity_match")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = c.as("a").join(c.as("b"),
        col("a.c_custkey") < col("b.c_custkey") &&
          length(col("a.c_name")) === length(col("b.c_name")) &&
          levenshtein(col("a.c_name"), col("b.c_name")) <= 1)
      .select(col("a.c_custkey"), col("b.c_custkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == brute,
      s"missed=${(brute -- banded).take(5)} extra=${(banded -- brute).take(5)}")
    assert(brute.nonEmpty, "fixture must produce pairs or the test is vacuous")
  }

  test("a single substitution matches; two do not; agree-on-both-parities dedups") {
    val spark0 = spark
    import spark0.implicits._
    val rows = Seq(
      (1L, "Customer#000000001"),
      (2L, "Customer#000000002"), // 1 sub vs id 1 -> pair
      (3L, "Customer#000000033"), // 2 subs vs id 1 -> no pair with 1
      (4L, "Customer#000000001")) // identical to id 1 -> dist 0, both parities
      .toDF("c_custkey", "c_name")
    val dir = java.nio.file.Files.createTempDirectory("graft_em_fix_").toString
    rows.write.parquet(s"$dir/customer.parquet")
    // reuse the real sf layout expectations: region etc. not needed here
    val out = graft.SparkEntry.queries("d_entity_match")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out.contains((1L, 2L, 1L)), s"one substitution must match: $out")
    assert(out.contains((1L, 4L, 0L)), "identical names must match once (dist 0)")
    assert(out.count { case (a, b, _) => (a, b) == (1L, 4L) } == 1,
      "agree-on-both-parities pair must be deduplicated")
    assert(!out.exists { case (a, b, _) => (a, b) == (1L, 3L) },
      "distance-2 pair must not match")
  }
}

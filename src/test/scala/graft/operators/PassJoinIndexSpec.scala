package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The stored PassJoin lifecycle: incremental probes must equal brute
  * force across batch splits, pairs split across batches surface at the
  * later member, forget hides, compact preserves, mixed radii fail
  * loudly.
  */
class PassJoinIndexSpec extends SparkSpec {

  private def ents(rows: Seq[(Long, String)]): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    rows.toDF("key", "name")
  }

  private val corpus: Seq[(Long, String)] = {
    val base = Seq(
      "partition pruning keeps the scan bounded while the optimizer reorders joins",
      "columnar formats amortize decode cost across vectorized reader batches",
      "the shuffle service spills sorted runs and merges them on fetch",
      "broadcast joins trade driver memory for a shuffle-free probe side")
    base.zipWithIndex.flatMap { case (s, i) =>
      val k = i.toLong * 10
      Seq((k, s), (k + 1, s.patch(8, "", 2)), (k + 2, s.patch(4, "qq", 0)))
    }
  }

  private def brute(rows: Seq[(Long, String)], tau: Int): Set[(Long, Long, Long)] = {
    val df = ents(rows)
    df.as("a").join(df.as("b"), col("a.key") < col("b.key"))
      .select(col("a.key"), col("b.key"),
        levenshtein(col("a.name"), col("b.name")).cast("long").as("d"))
      .filter(col("d") <= tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def probeAll(path: String, upTo: Int): Set[(Long, Long, Long)] =
    (0 to upTo).map(b => EntityBlockIndex.verifyTypo(
        PassJoinIndex.candidates(spark, path, b), tau = 2))
      .reduce(_ unionByName _)
      .dropDuplicates("a_key", "b_key")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("incremental stored probes equal brute force; cross-batch pairs surface once") {
    val p = Files.createTempDirectory("graft_pjidx_").toString + "/idx"
    // split so several true pairs STRADDLE the batch boundary
    val (b0, b1) = corpus.partition(_._1 % 10 != 1)
    PassJoinIndex.build(ents(b0), p, tau = 2)
    PassJoinIndex.ingest(ents(b1), p, batch = 1, tau = 2)
    assert(probeAll(p, 1) == brute(corpus, 2))
  }

  test("forget hides an entity from probes; compact reclaims, answers unchanged") {
    val p = Files.createTempDirectory("graft_pjidx_fgt_").toString + "/idx"
    PassJoinIndex.build(ents(corpus), p, tau = 2)
    val spark0 = spark
    import spark0.implicits._
    PassJoinIndex.forget(spark, p, Seq(1L).toDF("key"))
    val expected = brute(corpus.filterNot(_._1 == 1L), 2)
    assert(probeAll(p, 0) == expected, "tombstoned key must vanish from pairs")
    PassJoinIndex.compact(spark, p)
    assert(probeAll(p, 0) == expected, "compaction must not change answers")
    assert(spark.read.parquet(p).filter(col("key") === 1L).isEmpty,
      "compaction must physically reclaim the tombstoned rows")
  }

  test("the in-memory batch probe honors the forget contract") {
    val p = Files.createTempDirectory("graft_pjidx_mem_").toString + "/idx"
    PassJoinIndex.build(ents(corpus), p, tau = 2)
    val spark0 = spark
    import spark0.implicits._
    PassJoinIndex.forget(spark, p, Seq(2L).toDF("key"))
    // a tombstoned entity re-arriving as an IN-MEMORY probe batch must
    // stay hidden (the family-wide re-registration contract)
    val rearrival = ents(corpus.filter(_._1 == 2L))
    val pairs = EntityBlockIndex.verifyTypo(
        PassJoinIndex.candidates(spark, p, batch = 1, Some(rearrival)), tau = 2)
      .collect()
    assert(pairs.isEmpty, s"tombstoned re-arrival produced pairs: ${pairs.toSeq}")
  }

  test("a mixed-radius writer fails loudly") {
    val p = Files.createTempDirectory("graft_pjidx_tau_").toString + "/idx"
    PassJoinIndex.build(ents(corpus), p, tau = 2)
    val ex = intercept[IllegalArgumentException] {
      PassJoinIndex.ingest(ents(corpus.take(2)), p, batch = 1, tau = 1)
    }
    assert(ex.getMessage.contains("tau"), s"wrong failure: ${ex.getMessage}")
  }
}

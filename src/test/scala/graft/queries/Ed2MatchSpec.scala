package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.Tables

/** FastSS tau = 2 blocking exactness: signature-collision candidates must
  * be a superset of EVERY pair within edit distance 2 — transpositions
  * (= two substitutions), double inserts/deletes, mixed edits — with the
  * exact levenshtein verify restoring precision (a collision only bounds
  * ed <= 4). Pinned against brute force on the fixture corpus AND a
  * hand-built adversarial set covering the two-edit position classes.
  */
class Ed2MatchSpec extends SparkSpec {

  private def brute(ents: DataFrame): Set[(Long, Long, Long)] =
    ents.as("a").join(ents.as("b"), col("a.key") < col("b.key"))
      .select(col("a.key").as("a_key"), col("b.key").as("b_key"),
        levenshtein(col("a.name"), col("b.name")).cast("long").as("dist"))
      .filter(col("dist") <= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def ed2(ents: DataFrame): Set[(Long, Long, Long)] =
    NorthStar.ed2Match(ents)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("equals brute force on the customer corpus") {
    val ents = Tables.load(spark, "/root/testdata/sf0.001", "customer")
      .select(col("c_custkey").as("key"), col("c_name").as("name"))
    val got = ed2(ents)
    assert(got == brute(ents))
    assert(got.exists(_._3 == 2L), "corpus must contain distance-2 pairs")
  }

  test("equals brute force on adversarial two-edit cases") {
    import spark.implicits._
    val names = Seq(
      "abcdef",   // base
      "bacdef",   // transposition at front (two substitutions)
      "abcdfe",   // transposition at end
      "XbcdeX",   // two substitutions, both ends
      "abXdYf",   // two substitutions, middle
      "XYabcdef", // double insert at front
      "abcdefXY", // double append
      "abXcdYef", // two inserts, separated
      "cdef",     // double delete at front
      "abcd",     // double delete at end
      "acdf",     // two deletes, separated
      "Xabcde",   // insert + delete (still ed 2)
      "Xbcdefg",  // sub + append
      "XYZdef",   // ed 3 — must NOT match base
      "fedcba",   // full reversal — far
      "ab", "ba", // swap on a tiny string (ed 2)
      "a", ""     // tiny/empty (ed("", "ab") = 2)
    )
    val ents = names.zipWithIndex
      .map { case (n, i) => (i.toLong, n) }.toDF("key", "name")
    val want = brute(ents)
    assert(ed2(ents) == want)
    // the cases the tau = 1 family cannot see are actually present
    assert(want.exists(_._3 == 2L))
  }
}

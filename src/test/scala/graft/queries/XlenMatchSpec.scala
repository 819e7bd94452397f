package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.Tables

/** Deletion-neighborhood (FastSS, tau = 1) blocking exactness: the
  * signature-intersection join must emit a candidate superset of EVERY
  * pair within edit distance 1 — across lengths, which is the whole
  * point (the parity pigeonhole covers equal lengths only). Pinned
  * against brute force on the fixture corpus AND a hand-built
  * adversarial set covering each edit position class.
  */
class XlenMatchSpec extends SparkSpec {

  private def brute(ents: DataFrame): Set[(Long, Long, Long)] =
    ents.as("a").join(ents.as("b"), col("a.key") < col("b.key"))
      .select(col("a.key").as("a_key"), col("b.key").as("b_key"),
        levenshtein(col("a.name"), col("b.name")).cast("long").as("dist"))
      .filter(col("dist") <= 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def fastSs(ents: DataFrame): Set[(Long, Long, Long)] =
    NorthStar.xlenMatch(ents)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("equals brute force on the customer corpus (cross-length included)") {
    val ents = Tables.load(spark, "/root/testdata/sf0.001", "customer")
      .select(col("c_custkey").as("key"), col("c_name").as("name"))
    assert(fastSs(ents) == brute(ents))
  }

  test("equals brute force on adversarial edits at every position class") {
    import spark.implicits._
    // every structural case for one edit on "abcdef": substitution at
    // front/middle/end, insert/delete at front / middle / end, exact
    // duplicates, tiny strings (single-char, empty), and near-misses at
    // distance 2 that blocking is allowed to emit (a shared deletion
    // implies only ed <= 2) but verification must kill
    val names = Seq(
      "abcdef",            // base
      "Xbcdef",            // sub at pos 0
      "abcdeX",            // sub at last pos
      "abXdef",            // sub in the middle
      "Xabcdef",           // insert at front (shifts everything)
      "abcXdef",           // insert in the middle
      "abcdefX",           // append
      "bcdef",             // delete at front
      "abdef",             // delete in the middle
      "abcde",             // delete at end
      "abcdef",            // exact duplicate (distance 0)
      "XYcdef",            // distance 2 — must NOT match base
      "a", "b", "ab",      // tiny strings
      "ba",                // distance 2 from "ab" (swap = 2 edits)
      ""                   // empty string (distance 1 from "a" and "b")
    )
    val ents = names.zipWithIndex
      .map { case (n, i) => (i.toLong, n) }.toDF("key", "name")
    assert(fastSs(ents) == brute(ents))
  }

  test("the typo-perturbed gate is NON-VACUOUS: genuine cross-length pairs, still exact") {
    // the r13 verdict's defect: every fixture name is exactly 18 chars,
    // so an unperturbed xlen gate hash-matches the equal-length answer
    // set. This pin keeps the perturbed gate honest: the perturbation
    // must produce pairs the equal-length parity blocks are structurally
    // blind to, and the kernel must still equal brute force on it.
    val ents = NorthStar.typoPerturbed(
      Tables.load(spark, "/root/testdata/sf0.001", "customer")
        .select(col("c_custkey").as("key"), col("c_name").as("name")))
    val got = fastSs(ents)
    assert(got == brute(ents))
    val lens = ents.select(col("key"), length(col("name")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val cross = got.count { case (a, b, _) => lens(a) != lens(b) }
    assert(cross > 0,
      "perturbed gate is vacuous — no cross-length pair in the answer set")
  }
}

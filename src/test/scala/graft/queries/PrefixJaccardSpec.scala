package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.CharNgrams

/** The prefix-filtered similarity join claims EXACT recall — every pair at
  * 5-gram Jaccard >= 0.7 survives indexing only each doc's rarest
  * n - ceil(0.7n) + 1 grams. These specs check the claim against a
  * brute-force all-pairs computation, on corpora built to break a sloppy
  * prefix: near-identical docs whose shared grams are the CORPUS-HOTTEST
  * ones (so the qualifying overlap is exactly the part of each doc most
  * likely to be pruned), plus boundary sizes around the ceil arithmetic.
  */
class PrefixJaccardSpec extends SparkSpec {

  private def bruteForce(docs: DataFrame, gram: Int = 5,
                         t: Double = 0.7): Set[(Long, Long, Double)] = {
    val sh = docs.select(col("doc_id"), CharNgrams.charNgrams(col("text"), gram).as("s"))
    val a = sh.as("a"); val b = sh.as("b")
    val jac = size(array_intersect(col("a.s"), col("b.s"))).cast("double") /
      size(array_union(col("a.s"), col("b.s")))
    a.crossJoin(b).filter(col("a.doc_id") < col("b.doc_id")).filter(jac >= t)
      .select(col("a.doc_id"), col("b.doc_id"), round(jac, 3))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  private def prefixResult(docs: DataFrame, gram: Int = 5,
                           tNum: Int = 7, tDen: Int = 10): Set[(Long, Long, Double)] =
    NorthStar.prefixJaccard(docs, gram, tNum, tDen)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def toDf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("hot-gram near-dups: qualifying overlap is the corpus-hottest grams") {
    // Ten unrelated docs all containing the hot phrase; three docs that are
    // the hot phrase plus a one-char twist — their intersection is EXACTLY
    // the hot grams a frequency-ordered prefix puts last. A generator that
    // indexed the rarest grams of each doc but applied the lemma wrong
    // (e.g. prefix too short by one) drops these pairs.
    val hot = "the quick brown fox jumps over the lazy dog again and again"
    val rows: Seq[(Long, String)] =
      (1L to 10L).map(i => i -> s"unique-$i-padding-${"x" * i.toInt} $hot tail-$i") ++
        Seq(101L -> hot, 102L -> (hot + "!"), 103L -> (hot + "?"))
    val docs = toDf(rows)
    assert(prefixResult(docs) === bruteForce(docs))
    // sanity: the adversarial pairs actually qualify (the test has teeth)
    assert(bruteForce(docs).exists(p => p._1 >= 101L))
  }

  test("prefix boundary sizes: n where ceil(0.7n) rounding bites") {
    // texts sized so n (distinct 5-gram count) lands on values where
    // 0.7n is integral vs fractional — the div-arithmetic edge
    val base = "abcdefghijklmnopqrstuvwxyz0123456789"
    val rows: Seq[(Long, String)] = Seq(
      1L -> base, 2L -> base, // identical: jac = 1.0
      3L -> base.dropRight(1), 4L -> (base + "zz"),
      5L -> "tiny", 6L -> "tiny", // shorter than one gram: single-gram sets
      7L -> "abcd") // < 5 chars
    val docs = toDf(rows)
    assert(prefixResult(docs) === bruteForce(docs))
    assert(bruteForce(docs).nonEmpty)
  }

  test("matches brute force on the sf0.001 corpus") {
    val docs = graft.tables.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    assert(prefixResult(docs) === bruteForce(docs))
  }

  test("exact recall holds across thresholds and gram sizes (sf0.001)") {
    // the prefix length, size-ratio, and positional-alpha bounds are all
    // integer rational arithmetic in (tNum, tDen) — exercise thresholds
    // where ceil() rounding and the alpha denominator differ from 7/10,
    // and an 8-gram shingle where set sizes shift
    val docs = graft.tables.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    for ((g, tn, td) <- Seq((5, 1, 2), (5, 9, 10), (8, 1, 4))) {
      val t = tn.toDouble / td
      assert(prefixResult(docs, g, tn, td) === bruteForce(docs, g, t),
        s"mismatch at gram=$g t=$tn/$td")
    }
  }
}

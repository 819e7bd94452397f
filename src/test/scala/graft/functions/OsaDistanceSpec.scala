package graft.functions

import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** The OSA kernel against an independent full-matrix reference, the
  * adversarial cases that separate OSA from plain levenshtein and from
  * unrestricted Damerau-Levenshtein, and the blocking-completeness claim
  * the d_entity_match_osa row rests on: tau = 1 deletion neighborhoods
  * catch every OSA<=1 pair (transpositions included).
  */
class OsaDistanceSpec extends SparkSpec {

  private def osa(a: String, b: String): Int =
    EditDistanceImpl.osa(UTF8String.fromString(a), UTF8String.fromString(b))

  /** Independent reference: full-matrix OSA DP (no rolling rows). */
  private def ref(s: String, t: String): Int = {
    val n = s.length; val m = t.length
    val d = Array.ofDim[Int](n + 1, m + 1)
    for (i <- 0 to n) d(i)(0) = i
    for (j <- 0 to m) d(0)(j) = j
    for (i <- 1 to n; j <- 1 to m) {
      val cost = if (s(i - 1) == t(j - 1)) 0 else 1
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + cost)
      if (i > 1 && j > 1 && s(i - 1) == t(j - 2) && s(i - 2) == t(j - 1))
        d(i)(j) = math.min(d(i)(j), d(i - 2)(j - 2) + 1)
    }
    d(n)(m)
  }

  test("adversarial cases: transposition is ONE edit; OSA vs DL divergence at 2+") {
    assert(osa("Customer", "Customer") == 0)
    assert(osa("", "abc") == 3 && osa("abc", "") == 3)
    // adjacent transpositions: one edit (levenshtein charges 2)
    assert(osa("ab", "ba") == 1)
    assert(osa("Custoemr", "Customer") == 1)
    assert(osa("Customer#12", "Customer#21") == 1)
    // non-adjacent swap is NOT a transposition
    assert(osa("abc", "cba") == 2)
    // the OSA restriction: no edit inside a transposed pair —
    // unrestricted DL("CA","ABC") = 2, OSA = 3 (why the DuckDB
    // damerau_levenshtein oracle is only valid at threshold <= 1)
    assert(osa("CA", "ABC") == 3)
    // plain single edits unchanged from levenshtein
    assert(osa("abcdef", "abXdef") == 1)
    assert(osa("abcdef", "abdef") == 1)
    assert(osa("abcdef", "abcXdef") == 1)
    // double transposition = two edits
    assert(osa("abcd", "badc") == 2)
  }

  test("rolling-row kernel equals the full-matrix reference on random short strings") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcd" // small alphabet forces collisions/transpositions
    def word() = (0 until rnd.nextInt(9)).map(_ => alpha(rnd.nextInt(4))).mkString
    for (_ <- 1 to 2000) {
      val a = word(); val b = word()
      assert(osa(a, b) == ref(a, b), s"osa('$a','$b')")
    }
  }

  test("codegen path: the expression evaluates inside a DataFrame plan") {
    val spark0 = spark
    import spark0.implicits._
    val got = Seq(("Custoemr", "Customer"), ("ab", "ba"), ("abc", "xyz"))
      .toDF("a", "b")
      .select(EditDistances.osa(org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b")).as("d"))
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(1, 1, 3))
  }

  test("tau=1 deletion neighborhoods catch every OSA<=1 pair (blocking completeness)") {
    val spark0 = spark
    import spark0.implicits._
    // adversarial corpus: transposed variants, single edits, decoys
    val ents = Seq(
      1L -> "abcdef", 2L -> "bacdef", 3L -> "abcdfe", 4L -> "abdcef",
      5L -> "abcde", 6L -> "abcdefg", 7L -> "Xbcdef", 8L -> "ab",
      9L -> "ba", 10L -> "azcdef", 11L -> "zzzzzz").toDF("key", "name")
    val names = ents.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val truth = (for {
      (ka, na) <- names; (kb, nb) <- names if ka < kb && ref(na, nb) <= 1
    } yield (ka, kb)).toSet
    assert(truth.exists { case (a, b) => ref(names(a), names(b)) == 1 &&
      names(a).length == names(b).length &&
      names(a).toSet == names(b).toSet }, "fixture must contain transposed pairs")
    val sigs = graft.operators.FastSsIndex.signatures(ents)
    val cands = sigs.as("a").join(sigs.as("b"),
        org.apache.spark.sql.functions.expr("a.sig = b.sig AND a.key < b.key"))
      .select(org.apache.spark.sql.functions.col("a.key").as("a_key"),
        org.apache.spark.sql.functions.col("b.key").as("b_key"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.subsetOf(cands),
      s"deletion-neighborhood blocking missed OSA<=1 pairs: ${truth.diff(cands)}")
  }
}

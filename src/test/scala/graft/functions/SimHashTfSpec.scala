package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pins the byte-level fused kernel ([[SimHashTfImpl.weightedFromText]])
  * to an independent straight-line reimplementation of the declared
  * semantics: split(" ", -1) over the decoded string, string-keyed tf,
  * weight = bitlength(tf), md5-hex votes. The kernel must match on every
  * input, including empty strings, runs of spaces, and multi-byte UTF-8.
  */
class SimHashTfSpec extends AnyFunSuite {

  // seeded Gen sampling, same pattern as UnloadDialectPropertySpec —
  // the scalatestplus forAll bridge is not in the offline cache.
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  /** The declared semantics, written the obvious (slow) way. */
  private def reference(text: String): Long = {
    val tf = text.split(" ", -1).groupBy(identity).view.mapValues(_.length)
    val acc = new Array[Int](64)
    tf.foreach { case (tok, cnt) =>
      val w = 32 - Integer.numberOfLeadingZeros(cnt)
      val h = SharedHash.md5Hex(tok)
      for (d <- 0 until 16) {
        val nib = SharedHash.HexDigits.indexOf(h.charAt(d))
        for (j <- 0 until 4) {
          if (((nib >> j) & 1) == 1) acc(d * 4 + j) += w else acc(d * 4 + j) -= w
        }
      }
    }
    (0 until 63).foldLeft(0L)((r, i) => if (acc(i) > 0) r | (1L << i) else r)
  }

  private def kernel(text: String): Long =
    SimHashTfImpl.weightedFromText(UTF8String.fromString(text))

  test("fixed edge cases match the reference semantics") {
    val cases = Seq(
      "",
      " ",
      "  ",
      "a",
      "a a",
      "a a a b b c",
      " leading and  double  spaces ",
      "café café naïve 日本語 日本語 日本語",
      "😀 emoji 😀 emoji",
      ("tok " * 100).trim,
      (1 to 50).map(i => s"w$i").mkString(" ")
    )
    cases.foreach(c => assert(kernel(c) === reference(c), s"input: '$c'"))
  }

  test("random strings (words, spaces, unicode) match the reference") {
    val word = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.oneOf("café", "日本", "über", "😀", ""))
    val doc = Gen.listOf(word).map(_.mkString(" "))
    samples(doc, 200).foreach { text =>
      assert(kernel(text) === reference(text), s"input: '$text'")
    }
  }

  test("tf weighting is sublinear: repeated token weight saturates by doubling") {
    // same token 1x vs 2x vs 3x: bitlength(1)=1, bitlength(2)=bitlength(3)=2
    val one = kernel("x")
    val two = kernel("x x")
    val three = kernel("x x x")
    assert(two === three) // same weight -> same signature
    assert(one === two)   // single distinct token: sign of +-w is w-invariant
  }
}

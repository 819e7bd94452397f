package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pins the fused per-occurrence kernel ([[SimHashTfImpl.occFromText]]) to
  * an independent straight-line reimplementation of the ORIGINAL declared
  * semantics: every token occurrence votes +-1 by its md5-hex bits (the
  * `simhash63(transform(split(text, ' '), md5))` formulation the oracles
  * still compute). The kernel folds k identical occurrences into one +-k
  * vote — this spec is what makes that algebraic shortcut checked, not
  * assumed, across empties, space runs, and multi-byte UTF-8.
  */
class SimHashOccSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  /** Per-occurrence semantics, written the obvious (slow) way. */
  private def reference(text: String): Long = {
    val acc = new Array[Int](64)
    text.split(" ", -1).foreach { tok =>
      val h = SharedHash.md5Hex(tok)
      for (d <- 0 until 16) {
        val nib = SharedHash.HexDigits.indexOf(h.charAt(d))
        for (j <- 0 until 4) {
          if (((nib >> j) & 1) == 1) acc(d * 4 + j) += 1 else acc(d * 4 + j) -= 1
        }
      }
    }
    (0 until 63).foldLeft(0L)((r, i) => if (acc(i) > 0) r | (1L << i) else r)
  }

  private def kernel(text: String): Long =
    SimHashTfImpl.occFromText(UTF8String.fromString(text))

  test("fixed edge cases match the per-occurrence reference") {
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
      Gen.oneOf("café", "日本", "a", "", "x y"),
      Gen.listOfN(3, Gen.choose('a', 'e')).map(_.mkString))
    val text = Gen.choose(0, 40).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    samples(text, 300).foreach(t => assert(kernel(t) === reference(t), s"input: '$t'"))
  }
}

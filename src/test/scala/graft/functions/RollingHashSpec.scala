package graft.functions

import java.math.BigInteger

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The rolling update must equal the direct polynomial, and the Mersenne
  * mulmod must equal BigInteger arithmetic — checked against an independent
  * BigInteger oracle over adversarial and random inputs.
  */
class RollingHashSpec extends AnyFunSuite {

  private val M = BigInteger.valueOf(RollingHashImpl.M)
  private val B = BigInteger.valueOf(RollingHashImpl.B)

  /** Direct (non-rolling) recompute: sum t(i+j) * B^(W-1-j) mod M. */
  private def direct(text: String, w: Int): Seq[Long] = {
    val toks = text.split(" ", -1)
    if (toks.length < w) return Seq.empty
    (0 to toks.length - w).map { off =>
      var h = BigInteger.ZERO
      for (j <- 0 until w) {
        val t = BigInteger.valueOf(tokHash(toks(off + j)))
        h = h.multiply(B).add(t).mod(M)
      }
      h.longValueExact()
    }
  }

  private def tokHash(tok: String): Long = {
    val h = SharedHash.md5Hex(tok)
    java.lang.Long.parseLong(h.substring(0, 7), 16)
  }

  test("rolling equals direct polynomial on random token streams") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 50) {
      val n = 1 + rnd.nextInt(120)
      val toks = Seq.fill(n)(rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString)
      val text = toks.mkString(" ")
      for (w <- Seq(1, 3, 20, 50)) {
        val got = RollingHashImpl.windowHashes(UTF8String.fromString(text), w)
          .toLongArray().toSeq
        assert(got == direct(text, w), s"w=$w text=$text")
      }
    }
  }

  test("empty tokens, repeated runs, and short docs") {
    for (text <- Seq("", " ", "a  b", "x x x x x x", "lone", "a b c",
         "é 中文 token"); w <- Seq(1, 2, 3, 5)) {
      val got = RollingHashImpl.windowHashes(UTF8String.fromString(text), w)
        .toLongArray().toSeq
      assert(got == direct(text, w), s"w=$w text='$text'")
    }
  }

  test("identical windows at different offsets collide (the dedup property)") {
    val text = "p q r SAME SPAN HERE x y z SAME SPAN HERE t u v"
    val hs = RollingHashImpl.windowHashes(UTF8String.fromString(text), 3).toLongArray()
    assert(hs(3) == hs(9)) // both "SAME SPAN HERE"
    assert(hs(0) != hs(3))
  }
}

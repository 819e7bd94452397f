package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Shared one-pass shingling machinery for the n-gram kernels.
  *
  * `substringSQL(i, n)` locates the i-th code point by scanning from the
  * string head, so a per-position loop is O(len^2) bytes scanned per
  * document — measured as the dominant cost of the signature/shingle scans
  * at sf0.1. One linear pass over the UTF-8 bytes records every code-point
  * start offset; each n-gram is then a zero-scan byte-range slice.
  */
private[functions] object Shingling {

  /** Byte offsets of each code-point start in `bytes`, plus an end sentinel
    * (length nChars + 1).
    */
  def charStarts(bytes: Array[Byte]): Array[Int] = {
    val nb = bytes.length
    var nChars = 0
    var off = 0
    while (off < nb) { off += UTF8String.numBytesForFirstByte(bytes(off)); nChars += 1 }
    val starts = new Array[Int](nChars + 1)
    off = 0
    var i = 0
    while (off < nb) {
      starts(i) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      i += 1
    }
    starts(nChars) = nb
    starts
  }

  /** Visit the character n-grams of `s` in order — code-point semantics
    * identical to `substringSQL(i, n)` for i in 1..max(chars-n+1, 1),
    * including the shorter-than-n rule (a short string yields itself).
    */
  @inline def foreachNgram(s: UTF8String, n: Int)(f: UTF8String => Unit): Unit = {
    val bytes = s.getBytes
    val starts = charStarts(bytes)
    val chars = starts.length - 1
    val count = math.max(chars - n + 1, 1)
    var i = 0
    while (i < count) {
      val end = starts(math.min(i + n, chars))
      f(UTF8String.fromBytes(bytes, starts(i), end - starts(i)))
      i += 1
    }
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** O(n) rolling polynomial hash over a document's token stream — the
  * substring-dedup primitive (Lee et al. 2022, "Deduplicating Training Data
  * Makes Language Models Better": repeated >= 50-token spans are removed
  * from the corpus, not just whole near-duplicate documents).
  *
  * For window size W, emits one 61-bit hash per token offset:
  *
  *   h(i) = sum_{j=0..W-1} t(i+j) * B^(W-1-j)  mod  M
  *
  * with M = 2^61 - 1 (Mersenne, so 128-bit products reduce with two
  * shift-adds — no BigInteger), B = 1000003, and t(k) = the first 7 hex
  * digits (28 bits) of md5(token) — the [[SharedHash]] doctrine: md5 exists
  * in both engines, so the DuckDB oracle recomputes the identical value
  * with HUGEINT modular arithmetic. The rolling update makes the whole
  * array O(n) per document (one md5 per token + constant work per window),
  * vs O(n * W) for hashing each window's text independently — at W = 50
  * that factor is the difference between a map pass and fifty.
  *
  * 61-bit space: ~10^12 windows (a 100 TB corpus) collide with probability
  * ~ 10^24 / 2^62 ≈ 2e-4 corpus-wide — collisions mark a span as duplicated
  * spuriously but can never be missed, and a production pipeline verifies
  * spans before cutting (the Lee et al. procedure) — so the hash is the
  * candidate generator, exactly like banding in the near-dup family.
  */
object RollingHashImpl {
  val M: Long = (1L << 61) - 1
  val B: Long = 1000003L

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** (a * b) mod M for a, b < M, via Mersenne folding of the 122-bit
    * product: 2^61 = 1 (mod M), so p = hi61 * 2^61 + lo61 = hi61 + lo61.
    */
  private def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    var r = (lo & M) + ((hi << 3) | (lo >>> 61))
    r = (r & M) + (r >>> 61)
    if (r >= M) r - M else r
  }

  /** B^e mod M, cached per exponent (one entry per distinct window size). */
  private val powCache = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
  private def powB(e: Int): Long =
    powCache.computeIfAbsent(e, { ee =>
      var p = 1L; var i = 0
      while (i < ee) { p = mulmod(p, B); i += 1 }
      java.lang.Long.valueOf(p)
    }).longValue()

  /** All W-token window hashes of `text`, index = token offset; empty when
    * the document has fewer than W tokens. Tokenization is byte-split on
    * 0x20 with empties kept — exactly `split(text, ' ')` / DuckDB
    * `string_split(text, ' ')`, and exactly [[SimHashTfImpl]]'s.
    */
  def windowHashes(text: org.apache.spark.unsafe.types.UTF8String, w: Int): GenericArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    var nTok = 1
    var i = 0
    while (i < n) { if (bytes(i) == ' ') nTok += 1; i += 1 }
    if (nTok < w) return new GenericArrayData(Array.emptyLongArray)
    // token hashes: first 7 md5 hex digits = top 28 bits of the digest
    val th = new Array[Long](nTok)
    val md = digests.get()
    var t = 0
    var s = 0
    i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        md.reset()
        md.update(bytes, s, i - s)
        val d = md.digest()
        th(t) = ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
          ((d(2) & 0xffL) << 4) | ((d(3) & 0xffL) >>> 4)
        t += 1
        s = i + 1
      }
      i += 1
    }
    val out = new Array[Long](nTok - w + 1)
    var h = 0L
    i = 0
    while (i < w) { h = (mulmod(h, B) + th(i)) % M; i += 1 }
    out(0) = h
    val bw = powB(w - 1)
    i = w
    while (i < nTok) {
      val without = (h + (M - mulmod(th(i - w), bw))) % M
      h = (mulmod(without, B) + th(i)) % M
      out(i - w + 1) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `rolling_window_hash(text)` for a fixed window size `w` (an operator
  * parameter, not a column — it shapes the output arity).
  */
case class RollingWindowHash(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"window size must be >= 1, got $w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_window_hash"

  override def nullSafeEval(input: Any): Any =
    RollingHashImpl.windowHashes(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHashImpl.windowHashes($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): RollingWindowHash =
    copy(child = newChild)
}

object RollingHash {
  def windowHashes(text: Column, w: Int): Column =
    Bridge.column(RollingWindowHash(Bridge.expression(text), w))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native 63-bit SimHash vote kernel over md5-hex token hashes.
  *
  * Semantics are identical to the higher-order-function formulation the
  * NorthStar queries originally used (and the DuckDB oracles still use):
  * bit i of a token's vote = bit (i % 4) of hex digit (i div 4) of its md5
  * (value = instr('0123456789abcdef', c) - 1); result bit i = 1 iff the
  * +-w vote sum is > 0.
  *
  * Catalyst cannot codegen nested `aggregate` lambdas — the old expression
  * interpreted 63 x tokens lambda steps per document (the dominant cost of
  * d_simhash_weighted and d_dup_clusters at sf0.1). This kernel is one
  * tight JVM loop per document inside whole-stage codegen: 16 hex-nibble
  * reads + 63 integer adds per token.
  */
object SimHashImpl {

  private def hexVal(b: Byte): Int =
    if (b <= '9') b - '0' else b - 'a' + 10

  /** Weighted vote sum; `weights == null` means weight 1 per entry
    * (per-occurrence, the unweighted d_simhash semantics).
    */
  def simhash(hashes: ArrayData, weights: ArrayData): Long = {
    val n = hashes.numElements()
    val acc = new Array[Int](64)
    var t = 0
    while (t < n) {
      val h = hashes.getUTF8String(t)
      val w = if (weights == null) 1 else weights.getInt(t)
      var d = 0
      while (d < 16) {
        val nib = hexVal(h.getByte(d))
        val base = d * 4
        var j = 0
        while (j < 4) {
          if (((nib >> j) & 1) == 1) acc(base + j) += w else acc(base + j) -= w
          j += 1
        }
        d += 1
      }
      t += 1
    }
    var res = 0L
    var i = 0
    while (i < 63) { // bit 63 unused: 63-bit hash keeps BIGINT arithmetic safe
      if (acc(i) > 0) res |= 1L << i
      i += 1
    }
    res
  }
}

object SimHashTfImpl {

  /** MD5 instances are stateful and not thread-safe; one per executor thread,
    * reset-by-digest, instead of `MessageDigest.getInstance` per token (which
    * was the dominant cost of the first version of this kernel — a provider
    * lookup plus two allocations per distinct token per document).
    */
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Fused text -> sublinear-tf weighted 63-bit SimHash, entirely on the
    * UTF-8 bytes of the input (token equality over valid UTF-8 bytes is
    * string equality, and md5 is defined over those same bytes — so no
    * `toString` decode, no `String.split`, no hex round-trip anywhere):
    *
    *  1. tokenize on the 0x20 byte (empties kept, exactly Spark's
    *     `split(text, ' ')` — ASCII space never occurs inside a multi-byte
    *     UTF-8 sequence, so byte-splitting is character-splitting);
    *  2. count term frequency in an open-addressed (slice -> count) table —
    *     int arrays, byte-wise key compare, no boxing;
    *  3. per DISTINCT token: weight = bitlength(tf), md5 the byte slice via
    *     the thread-local digest, read the 16 vote nibbles straight off the
    *     raw digest bytes;
    *  4. +-w votes over 63 bit positions.
    *
    * Term frequency is per-document state, so none of this needs a shuffle —
    * the explode -> groupBy formulation this kernel replaces moved every
    * token through an exchange to compute what one pass over the row
    * already knows.
    */
  def weightedFromText(text: org.apache.spark.unsafe.types.UTF8String): Long =
    fromText(text, sublinear = true)

  /** Fused text -> UNWEIGHTED (per-occurrence) 63-bit SimHash: identical
    * semantics to `simhash63(transform(split(text, ' '), t -> md5(t)))` —
    * k occurrences of a token each voting +-1 by the same md5 bits sum to
    * one +-tf vote, so the tf table both dedupes the md5 work (one digest
    * per DISTINCT token vs one per occurrence in the HOF formulation) and
    * skips the per-token hash-array materialization the interpreted
    * `transform` lambda paid. Feeds simhashPairs (d_simhash,
    * d_dup_clusters, p_neardup_prune), where the HOF md5 pass previously
    * ran once per self-join side.
    */
  def occFromText(text: org.apache.spark.unsafe.types.UTF8String): Long =
    fromText(text, sublinear = false)

  private def fromText(text: org.apache.spark.unsafe.types.UTF8String,
                       sublinear: Boolean): Long = {
    val bytes = text.getBytes // zero-copy when array-backed, one copy otherwise
    val n = bytes.length
    // token boundaries: nTok = spaces + 1 (split(" ", -1) keeps empties)
    var nTok = 1
    var i = 0
    while (i < n) { if (bytes(i) == ' ') nTok += 1; i += 1 }
    val starts = new Array[Int](nTok)
    val lens = new Array[Int](nTok)
    var t = 0
    var s = 0
    i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') { starts(t) = s; lens(t) = i - s; t += 1; s = i + 1 }
      i += 1
    }
    // open-addressed tf table, load factor <= 0.5, linear probing
    var cap = Integer.highestOneBit(nTok) << 2
    if (cap < 8) cap = 8
    val mask = cap - 1
    val slotTok = new Array[Int](cap) // index of the first token in the slot
    val slotCnt = new Array[Int](cap) // 0 = empty
    t = 0
    while (t < nTok) {
      val st = starts(t)
      val ln = lens(t)
      var h = 0x811c9dc5 // FNV-1a over the slice
      var j = st
      val end = st + ln
      while (j < end) { h = (h ^ (bytes(j) & 0xff)) * 0x01000193; j += 1 }
      var slot = h & mask
      var placed = false
      while (!placed) {
        if (slotCnt(slot) == 0) { slotTok(slot) = t; slotCnt(slot) = 1; placed = true }
        else {
          val o = slotTok(slot)
          if (lens(o) == ln &&
              java.util.Arrays.equals(bytes, starts(o), starts(o) + ln, bytes, st, end)) {
            slotCnt(slot) += 1; placed = true
          } else slot = (slot + 1) & mask
        }
      }
      t += 1
    }
    val md = digests.get()
    val out = new Array[Byte](16)
    val acc = new Array[Int](64)
    var slot = 0
    while (slot < cap) {
      val cnt = slotCnt(slot)
      if (cnt > 0) {
        val o = slotTok(slot)
        // sublinear: bitlength(tf) damped weight; else tf itself (the sum
        // of tf per-occurrence +-1 votes — per-occurrence semantics)
        val w = if (sublinear) 32 - Integer.numberOfLeadingZeros(cnt) else cnt
        md.update(bytes, starts(o), lens(o))
        md.digest(out, 0, 16) // fills out, resets md
        // hex digit d of md5Hex = nibble d of the raw digest, high-first
        var d = 0
        while (d < 16) {
          val b = out(d >> 1)
          val nib = if ((d & 1) == 0) (b >> 4) & 0xf else b & 0xf
          val base = d * 4
          var j = 0
          while (j < 4) {
            if (((nib >> j) & 1) == 1) acc(base + j) += w else acc(base + j) -= w
            j += 1
          }
          d += 1
        }
      }
      slot += 1
    }
    var res = 0L
    i = 0
    while (i < 63) { if (acc(i) > 0) res |= 1L << i; i += 1 }
    res
  }
}

/** `simhash63_tf(text)` — fused tokenizer + tf + weighted SimHash. */
case class SimHash63Tf(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash63_tf"

  override def nullSafeEval(input: Any): Any =
    SimHashTfImpl.weightedFromText(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashTfImpl.weightedFromText($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash63Tf =
    copy(child = newChild)
}

/** `simhash63_occ(text)` — fused tokenizer + per-occurrence SimHash. */
case class SimHash63Occ(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash63_occ"

  override def nullSafeEval(input: Any): Any =
    SimHashTfImpl.occFromText(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashTfImpl.occFromText($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash63Occ =
    copy(child = newChild)
}

/** `simhash63(array<string>)` — per-occurrence votes, weight 1 each. */
case class SimHash63(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash63"

  override def nullSafeEval(input: Any): Any =
    SimHashImpl.simhash(input.asInstanceOf[ArrayData], null)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashImpl.simhash($c, null)")

  override protected def withNewChildInternal(newChild: Expression): SimHash63 =
    copy(child = newChild)
}

/** `simhash63_weighted(array<string>, array<int>)` — per-entry vote weights
  * (entries are distinct tokens, weights their damped term frequencies).
  */
case class SimHash63Weighted(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash63_weighted"

  override def nullSafeEval(h: Any, w: Any): Any =
    SimHashImpl.simhash(h.asInstanceOf[ArrayData], w.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (h, w) => s"graft.functions.SimHashImpl.simhash($h, $w)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SimHash63Weighted =
    copy(left = newLeft, right = newRight)
}

object SimHash {
  def simhash63(hashes: Column): Column =
    Bridge.column(SimHash63(Bridge.expression(hashes)))

  def simhash63Weighted(hashes: Column, weights: Column): Column =
    Bridge.column(SimHash63Weighted(Bridge.expression(hashes), Bridge.expression(weights)))

  def simhash63Tf(text: Column): Column =
    Bridge.column(SimHash63Tf(Bridge.expression(text)))

  def simhash63Occ(text: Column): Column =
    Bridge.column(SimHash63Occ(Bridge.expression(text)))
}

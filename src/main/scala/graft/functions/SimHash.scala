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
  /** Fused text -> sublinear-tf weighted 63-bit SimHash: split on single
    * spaces (empties kept, exactly Spark's `split(text, ' ')`), count term
    * frequency in a local map, weight = bitlength(tf), md5 each DISTINCT
    * token once, accumulate the +-w votes. Term frequency is per-document
    * state, so none of this needs a shuffle — the explode -> groupBy
    * formulation this kernel replaces moved every token through an
    * exchange to compute what one pass over the row already knows.
    */
  def weightedFromText(text: org.apache.spark.unsafe.types.UTF8String): Long = {
    val toks = text.toString.split(" ", -1)
    val tf = new java.util.HashMap[String, Integer]()
    var t = 0
    while (t < toks.length) {
      tf.merge(toks(t), 1, (a, b) => a + b)
      t += 1
    }
    val acc = new Array[Int](64)
    val it = tf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val w = 32 - Integer.numberOfLeadingZeros(e.getValue) // bitlength(tf)
      val h = SharedHash.md5Hex(e.getKey)
      var d = 0
      while (d < 16) {
        val c = h.charAt(d)
        val nib = if (c <= '9') c - '0' else c - 'a' + 10
        val base = d * 4
        var j = 0
        while (j < 4) {
          if (((nib >> j) & 1) == 1) acc(base + j) += w else acc(base + j) -= w
          j += 1
        }
        d += 1
      }
    }
    var res = 0L
    var i = 0
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
}

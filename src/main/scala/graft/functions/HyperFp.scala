package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native hyperplane-fingerprint kernel: bit j of the result = sign of the
  * dot product of the embedding with pseudo-random plane j, planes derived
  * from md5 exactly as [[SharedHash.planeValue]] (so the DuckDB oracle
  * recomputes identical bits from SQL).
  *
  * This replaces the higher-order-function formulation (nested `aggregate`
  * lambdas), which Catalyst cannot codegen — per row it is nBits x dim fused
  * multiply-adds on the primitive float array, whole-stage-codegen friendly
  * like [[MinHashImpl]].
  */
object HyperFpImpl {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]

  private def planes(nBits: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((nBits, dim), { case (b, d) =>
      Array.tabulate(b, d)(SharedHash.planeValue)
    })

  def fp(arr: ArrayData, nBits: Int): Long = {
    val dim = arr.numElements()
    val p = planes(nBits, dim)
    var acc = 0L
    var j = 0
    while (j < nBits) {
      val pj = p(j)
      var dot = 0.0
      var d = 0
      while (d < dim) { dot += arr.getFloat(d).toDouble * pj(d); d += 1 }
      // sign decided on the 9-dp-quantized dot so a summation-order rounding
      // difference vs the oracle's (order-free) SUM can't flip a bit when a
      // dot sits within float noise of 0 — both engines compare ROUND(dot, 9)
      if (math.rint(dot * 1e9) > 0.0) acc |= 1L << j
      j += 1
    }
    acc
  }
}

/** `hyper_fp(array<float>, nBits)` -> bigint of nBits sign bits. */
case class HyperFp(child: Expression, nBits: Int) extends UnaryExpression {
  require(nBits > 0 && nBits <= 63, "hyper_fp: nBits must be in [1, 63]")
  override def dataType: DataType = LongType
  override def prettyName: String = "hyper_fp"

  override def nullSafeEval(input: Any): Any =
    HyperFpImpl.fp(input.asInstanceOf[ArrayData], nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HyperFpImpl.fp($c, $nBits)")

  override protected def withNewChildInternal(newChild: Expression): HyperFp =
    copy(child = newChild)
}

object HyperFp {
  def hyperFp(embedding: Column, nBits: Int): Column =
    Bridge.column(HyperFp(Bridge.expression(embedding), nBits))
}

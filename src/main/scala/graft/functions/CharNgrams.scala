package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct character n-gram kernel: equivalent to
  * `array_distinct(transform(sequence(1, greatest(length(s)-n+1, 1)),
  * i -> substring(s, i, n)))` but whole-stage-codegen friendly — the HOF
  * formulation walks interpreted lambda machinery per shingle (measured
  * ~1.8 s per scan over 5k docs at sf0.1; this kernel is one linear pass).
  *
  * Code-point semantics match SQL `substring` (substringSQL), including the
  * shorter-than-n tail rule: a string shorter than n yields itself.
  */
object CharNgramsImpl {
  def ngrams(s: UTF8String, n: Int): GenericArrayData = {
    val seen = new java.util.LinkedHashSet[UTF8String](64)
    Shingling.foreachNgram(s, n)(seen.add(_))
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}

/** `char_ngrams(string, n)` -> `array<string>` of distinct n-grams in
  * first-occurrence order.
  */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "char_ngrams: n must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def nullSafeEval(input: Any): Any =
    CharNgramsImpl.ngrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharNgramsImpl.ngrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

object CharNgrams {
  def charNgrams(text: Column, n: Int): Column =
    Bridge.column(CharNgrams(Bridge.expression(text), n))
}

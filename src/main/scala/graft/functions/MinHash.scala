package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature kernel.
  *
  * Double-hashing construction (h_j = h1 + j*h2): two xxHash64 passes per
  * shingle instead of k, then k fused multiply-mins. This is the operation the
  * reference cannot express at all (dedup is a north-star extension, SURVEY.md
  * §2.4) and the HOF formulation (k full passes through interpreted lambda
  * machinery) is ~30x slower — measured 61s -> <1s on 5k docs x 500 shingles.
  */
object MinHashImpl {
  private[functions] val Seed1 = 42L
  private[functions] val Seed2 = 7L

  def sig(arr: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h1 = XxHash64Function.hash(s, StringType, Seed1)
      val h2 = XxHash64Function.hash(s, StringType, Seed2)
      var j = 0
      while (j < k) {
        val v = h1 + j * h2
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** Fused text -> MinHash kernel: computes the signature directly from the
  * distinct character n-grams of the input in ONE pass, without ever
  * materializing the shingle array (MinHash is duplicate-insensitive — min
  * over a multiset equals min over its set — so only the dedup bookkeeping
  * needs the set). Returns struct(n: int, sig: array<bigint>) where n is the
  * distinct-shingle count (feeds the exact-safe size-ratio prune).
  * Signature values are identical to MinHashImpl.sig over
  * CharNgramsImpl.ngrams (same shingles, same double-hash).
  */
object MinHashNgramImpl {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  def sig(s: UTF8String, n: Int, k: Int): InternalRow = {
    val seen = new java.util.HashSet[UTF8String](256)
    val mins = Array.fill(k)(Long.MaxValue)
    Shingling.foreachNgram(s, n) { sh =>
      if (seen.add(sh)) {
        val h1 = XxHash64Function.hash(sh, StringType, MinHashImpl.Seed1)
        val h2 = XxHash64Function.hash(sh, StringType, MinHashImpl.Seed2)
        var j = 0
        while (j < k) {
          val v = h1 + j * h2
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
    }
    new GenericInternalRow(Array[Any](seen.size, new GenericArrayData(mins)))
  }
}

/** `min_hash_ngram_sig(string, n, k)` -> `struct<n: int, sig: array<bigint>>`. */
case class MinHashNgramSig(child: Expression, n: Int, k: Int)
    extends UnaryExpression {
  require(n > 0 && k > 0, "min_hash_ngram_sig: n and k must be positive")
  override def dataType: DataType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("sig", ArrayType(LongType, containsNull = false), nullable = false)))
  override def prettyName: String = "min_hash_ngram_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashNgramImpl.sig(input.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashNgramImpl.sig($c, $n, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashNgramSig =
    copy(child = newChild)
}

/** `min_hash_sig(array<string>, k)` -> `array<bigint>` — whole-stage-codegen
  * friendly (doGenCode emits a static call, no CodegenFallback row boxing).
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {
  require(k > 0, "min_hash_sig: k must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "min_hash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashImpl.sig(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashImpl.sig($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHash {
  /** Column API: MinHash signature of a shingle array with k permutations. */
  def minHashSig(shingles: Column, k: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(shingles), k))

  /** Fused text -> (distinct n-gram count, signature) kernel. */
  def ngramSig(text: Column, n: Int, k: Int): Column =
    Bridge.column(MinHashNgramSig(Bridge.expression(text), n, k))
}

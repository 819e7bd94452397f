package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native edit-distance kernel treating an adjacent TRANSPOSITION as ONE
  * edit — the record-linkage convention (a swapped digit pair or a
  * "Custoemr" keyboard slip is a single error, not two): Optimal String
  * Alignment distance (the restricted Damerau–Levenshtein — each
  * substring may participate in at most one transposition), the
  * rolling-three-row DP. Spark ships `levenshtein` but no transposition
  * variant, so this is the [[CosineSim]]/[[graft.functions.PgBool]]
  * discipline: a codegen `BinaryExpression` whose generated code calls
  * one static kernel — no UDF boundary, stays inside whole-stage codegen.
  *
  * OSA vs unrestricted Damerau–Levenshtein: they diverge only at
  * distance >= 2 (DL("CA","ABC") = 2 via transpose-then-insert INSIDE the
  * transposed pair, OSA = 3) — at the <= 1 threshold the entity family
  * gates on they are provably identical (a distance-1 pair is one
  * ins/del/sub/adjacent-swap under either metric), which is what lets
  * DuckDB's native `damerau_levenshtein` (the unrestricted variant)
  * oracle the OSA row exactly.
  *
  * Unit is UTF-16 code units (String.charAt) — identical to Spark's own
  * `levenshtein` on BMP text and byte-for-byte equal to DuckDB on the
  * ASCII fixture names.
  */
object EditDistanceImpl {
  /** OSA distance of two strings; rolling three-row DP, O(|a|·|b|). */
  def osa(au: UTF8String, bu: UTF8String): Int = {
    val s = au.toString; val t = bu.toString
    val n = s.length; val m = t.length
    if (n == 0) return m
    if (m == 0) return n
    var prev2 = new Array[Int](m + 1) // row i-2
    var prev = new Array[Int](m + 1) // row i-1
    var cur = new Array[Int](m + 1) // row i
    var j = 0
    while (j <= m) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      cur(0) = i
      val si = s.charAt(i - 1)
      j = 1
      while (j <= m) {
        val cost = if (si == t.charAt(j - 1)) 0 else 1
        var d = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), prev(j - 1) + cost)
        if (i > 1 && j > 1 && si == t.charAt(j - 2) && s.charAt(i - 2) == t.charAt(j - 1))
          d = math.min(d, prev2(j - 2) + 1)
        cur(j) = d
        j += 1
      }
      val tmp = prev2; prev2 = prev; prev = cur; cur = tmp
      i += 1
    }
    prev(m)
  }
}

/** `osa_distance(string, string)` -> `int`, codegen'd. */
case class OsaDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "osa_distance"

  override def nullSafeEval(a: Any, b: Any): Any =
    EditDistanceImpl.osa(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.EditDistanceImpl.osa($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): OsaDistance =
    copy(left = l, right = r)
}

object EditDistances {
  /** OSA (restricted Damerau–Levenshtein) distance of two string columns.
    *
    * UNIT: UTF-16 code units (`String.charAt`), like Spark's own
    * `levenshtein` — NOT code points. On non-BMP input (surrogate pairs:
    * emoji, rare CJK) one code point counts as two units, so results can
    * diverge from code-point-counting engines (DuckDB's
    * `damerau_levenshtein`). Identical on BMP text, byte-for-byte equal
    * to DuckDB on ASCII; callers feeding arbitrary text should normalize
    * or accept the unit (r15 ADVICE).
    */
  def osa(a: Column, b: Column): Column =
    Bridge.column(OsaDistance(Bridge.expression(a), Bridge.expression(b)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Postgres/Redshift-unload boolean parsing: 't' -> true, 'f' -> false,
  * '' -> null, anything else -> error (reference spectrify/convert.py:41-56 —
  * unparseable input raises, matching the ValueError there; the empty-string
  * null rule is convert.py:140-144).
  */
object PgBoolImpl {
  def parse(s: UTF8String): java.lang.Boolean = {
    if (s.numBytes() == 0) return null
    if (s.numBytes() == 1) {
      val b = s.getByte(0)
      if (b == 't') return java.lang.Boolean.TRUE
      if (b == 'f') return java.lang.Boolean.FALSE
    }
    throw new IllegalArgumentException(s"Cannot parse boolean value: '$s'")
  }
}

case class PgBoolParse(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "pg_bool"

  override def nullSafeEval(input: Any): Any =
    PgBoolImpl.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Boolean ${ev.value}_r = graft.functions.PgBoolImpl.parse($c);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.booleanValue(); }
    """)

  override protected def withNewChildInternal(newChild: Expression): PgBoolParse =
    copy(child = newChild)
}

object PgBool {
  /** Column API: parse a Redshift-unload boolean string column. */
  def pgBool(c: Column): Column = Bridge.column(PgBoolParse(Bridge.expression(c)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The Redshift UNLOAD ESCAPE line dialect as a native expression.
  *
  * UNLOAD ... ESCAPE emits unquoted fields where the delimiter, backslash and
  * newline are backslash-escaped (reference spectrify/convert.py:83-89 parses
  * it with escapechar='\\' and QUOTE_NONE). General-purpose CSV parsers
  * (univocity) only honor escapes inside quoted fields, so the dialect gets
  * its own kernel: one linear scan per line, unescaping as it splits.
  * Empty field -> NULL (the universal ''-as-null rule, convert.py:140-144);
  * wrong field count -> error (fail-fast, convert.py:55).
  */
object UnloadDialectImpl {
  def split(line: UTF8String, delim: Char, expected: Int): GenericArrayData = {
    val s = line.toString
    val out = new Array[Any](expected)
    val sb = new java.lang.StringBuilder
    var field = 0
    var i = 0
    def close(): Unit = {
      if (field >= expected)
        throw new IllegalArgumentException(
          s"Expected $expected fields but found more in line: $s")
      out(field) = if (sb.length == 0) null else UTF8String.fromString(sb.toString)
      sb.setLength(0)
      field += 1
    }
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) { sb.append(s.charAt(i + 1)); i += 2 }
      else if (c == delim) { close(); i += 1 }
      else { sb.append(c); i += 1 }
    }
    close()
    if (field != expected)
      throw new IllegalArgumentException(
        s"Expected $expected fields but found $field in line: $s")
    new GenericArrayData(out)
  }
}

case class UnloadSplit(child: Expression, delimiter: Char, numFields: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "unload_split"

  override def nullSafeEval(input: Any): Any =
    UnloadDialectImpl.split(input.asInstanceOf[UTF8String], delimiter, numFields)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnloadDialectImpl.split($c, (char) ${delimiter.toInt}, $numFields)")

  override protected def withNewChildInternal(newChild: Expression): UnloadSplit =
    copy(child = newChild)
}

/** Writer-side twin of [[UnloadSplit]]: one linear scan placing a backslash
  * before the delimiter, backslash, LF and CR — the exact UNLOAD ESCAPE
  * character set (reference export.py:10-17's ESCAPE option; the reader at
  * convert.py:83-89 unescapes with escapechar='\\').
  */
object UnloadEscapeImpl {
  def escape(s: UTF8String, delim: Char): UTF8String = {
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length + 8)
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c == '\\' || c == delim || c == '\n' || c == '\r') sb.append('\\')
      sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

case class UnloadEscape(child: Expression, delimiter: Char)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "unload_escape"

  override def nullSafeEval(input: Any): Any =
    UnloadEscapeImpl.escape(input.asInstanceOf[UTF8String], delimiter)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnloadEscapeImpl.escape($c, (char) ${delimiter.toInt})")

  override protected def withNewChildInternal(newChild: Expression): UnloadEscape =
    copy(child = newChild)
}

object UnloadDialect {
  def unloadSplit(line: Column, delimiter: Char, numFields: Int): Column =
    Bridge.column(UnloadSplit(Bridge.expression(line), delimiter, numFields))

  def unloadEscape(value: Column, delimiter: Char): Column =
    Bridge.column(UnloadEscape(Bridge.expression(value), delimiter))
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge.
  *
  * Spark 4 made the Column/Expression conversion utilities private[sql]; the
  * supported pattern for extension libraries that ship native Catalyst
  * expressions is a small shim inside the org.apache.spark.sql namespace
  * (same approach as frameless / spark-daria). Everything referenced here is
  * Spark's own public-jar bytecode; no behavior is modified.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

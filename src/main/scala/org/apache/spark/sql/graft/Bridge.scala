package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.{classic, Column, DataFrame, SparkSession}

/** Column <-> Expression and LogicalPlan <-> DataFrame bridge.
  *
  * Spark 4 made the Column/Expression conversion utilities (and
  * `Dataset.ofRows`, the only way to lift a hand-built [[LogicalPlan]] into a
  * [[DataFrame]]) private[sql]; the supported pattern for extension libraries
  * that ship native Catalyst expressions/operators is a small shim inside the
  * org.apache.spark.sql namespace (same approach as frameless / spark-daria).
  * Everything referenced here is Spark's own public-jar bytecode; no behavior
  * is modified.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap an analyzed logical plan as a DataFrame on the given session. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan backing a DataFrame (resolved attributes). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed
}

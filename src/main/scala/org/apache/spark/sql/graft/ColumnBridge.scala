package org.apache.spark.sql.graft

import org.apache.spark.sql.{AnalysisException, Column}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters (Spark 4 moved the
  * public `new Column(expr)` constructor behind `classic.ExpressionUtils`). Lives in the
  * `org.apache.spark.sql` namespace solely to access them; keep this the ONLY such file.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** A user-facing AnalysisException (the public constructors are error-class based).
    * USER_RAISED_EXCEPTION (SQLSTATE P0001) frames argument-validation failures as user
    * errors; INTERNAL_ERROR would print Spark's "please report a bug" banner for what is
    * a caller mistake.
    */
  def analysisError(msg: String): AnalysisException =
    new AnalysisException("USER_RAISED_EXCEPTION", Map("errorMessage" -> msg))
}

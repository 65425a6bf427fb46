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

  /** A DataFrame over an already-resolved logical plan (`Dataset.ofRows` moved
    * behind `private[sql]` in Spark 4) — how the row-level SQL rewrite hands a
    * resolved MERGE source plan to the DataFrame-based commit paths.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** A user-facing AnalysisException (the public constructors are error-class based).
    * USER_RAISED_EXCEPTION (SQLSTATE P0001) frames argument-validation failures as user
    * errors; INTERNAL_ERROR would print Spark's "please report a bug" banner for what is
    * a caller mistake.
    */
  def analysisError(msg: String): AnalysisException =
    new AnalysisException("USER_RAISED_EXCEPTION", Map("errorMessage" -> msg))

  /** Re-root a batch DataFrame as a streaming one (`isStreaming = true`) — what a v1
    * streaming `Source.getBatch` must return, and exactly how Delta's source serves
    * file batches: the batch plan is optimized normally (pushdown, codegen), its
    * InternalRow RDD is wrapped in a `LogicalRDD` flagged streaming, and
    * MicroBatchExecution splices that into the incremental plan.
    */
  def asStreamingBatch(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    reroot(df, isStreaming = true)

  /** The inverse — what `ForeachBatchSink` does to hand user code a writable
    * DataFrame inside `Sink.addBatch`: the micro-batch's already-planned RDD is
    * re-rooted as a BATCH plan, so ordinary `df.write` works on it (the raw
    * streaming plan would throw "must be executed with writeStream.start()").
    */
  def asWritableBatch(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    reroot(df, isStreaming = false)

  private def reroot(df: org.apache.spark.sql.DataFrame,
      isStreaming: Boolean): org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val plan = org.apache.spark.sql.execution.LogicalRDD.fromDataset(
      ds.queryExecution.toRdd, ds, isStreaming)
    org.apache.spark.sql.classic.Dataset.ofRows(ds.sparkSession, plan)
  }
}

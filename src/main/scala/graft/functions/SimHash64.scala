package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of whitespace-tokenized text as a single native expression.
  *
  * Semantics match the shuffle-based formulation exactly (tokens = `split(trim(s),
  * "\\s+")`, token hash = `xxhash64(token)` with Spark's default seed 42, bit b set iff
  * Σ ±1 over tokens' bit b is positive) — but computed in ONE per-row pass: no explode,
  * no 64 aggregate columns, no shuffle at all. At 100 TB this turns SimHash signatures
  * from a shuffle-bound job into scan-speed map work. Codegen emits a static call, so the
  * expression stays inside whole-stage codegen.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  /** Tokenize exactly as `split(trim(s), "\\s+")` does: Spark `trim` strips only SPACE
    * (U+0020) from the ends (Java `String.trim` strips all ≤ U+0020), and Spark `split`
    * keeps trailing empty tokens (Java's default drops them). Shared with WordShingles.
    */
  private[graft] def sparkTokens(s: UTF8String): Array[String] = {
    val str = s.toString
    var from = 0
    var to = str.length
    while (from < to && str.charAt(from) == ' ') from += 1
    while (to > from && str.charAt(to - 1) == ' ') to -= 1
    str.substring(from, to).split("\\s+", -1)
  }

  /** Static kernel shared by eval and codegen. */
  def compute(s: UTF8String): Long = {
    val tokens = sparkTokens(s)
    val counts = new Array[Int](64)
    var t = 0
    while (t < tokens.length) {
      val h = XxHash64Function.hash(
        UTF8String.fromString(tokens(t)), StringType, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  def simhash64(c: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text column as one native kernel.
  *
  * Equivalent to `array_distinct(transform(sequence(...), i => concat_ws(" ",
  * slice(tokens, i, n))))` — but that HOF chain evaluates five interpreted lambdas per
  * shingle and dominated the near-dup pipeline (≈75% of `ngramJaccardPairs` wall time at
  * sf0.1). This expression does tokenize → slide → dedup in a single pass per row and
  * stays inside whole-stage codegen via a static kernel call.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires STRING input and n >= 1, got " +
        s"${child.dataType.catalogString}, n=$n")

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {

  /** Static kernel: whitespace tokens → n-gram shingles, first-occurrence distinct.
    * Tokenization mirrors Spark `split(trim(s), "\\s+")` exactly (see
    * [[SimHash64.sparkTokens]]).
    */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val tokens = SimHash64.sparkTokens(s)
    if (tokens.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]((tokens.length - n + 1) * 2)
    var i = 0
    val sb = new java.lang.StringBuilder(64)
    while (i <= tokens.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  def word_shingles(c: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(c), n))
}

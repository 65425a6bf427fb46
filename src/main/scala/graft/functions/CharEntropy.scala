package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-string character Shannon entropy as ONE native expression — the fused
  * form of [[graft.ops.TextAnalysis.charEntropy]]'s composed plan (explode one
  * row per character → two aggregations). Computing the per-char counts in a
  * per-row map eliminates the Generate AND both exchanges entirely: at 100 TB
  * the quality signal becomes scan-speed map work instead of a shuffle of
  * (doc, char) rows.
  *
  * Bit-identical to the composed formulation by construction: characters are
  * the code points `split(text, '')` emits; each `c·log2(c)` addend is
  * computed as `c * (ln c / ln 2)` (Spark's `LOG(2, c)` evaluation order) and
  * rounded to 8 dp through the same scala BigDecimal HALF_UP path Spark's
  * `round` uses, so the addends live on the 1e-8 grid that makes their sum
  * order-independent; the final entropy rounds to 6 dp the same way.
  * NativeExprSpec pins the equality on real and fuzzed input.
  *
  * Returns `struct(n_chars BIGINT, distinct_chars BIGINT, entropy DOUBLE)`;
  * an empty string yields (0, 0, 0.0) — callers drop the no-chars rows the
  * composed formulation never emitted.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = CharEntropy.outType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_entropy requires STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    CharEntropy.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharEntropy.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {

  val outType: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("distinct_chars", LongType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))

  private val Ln2 = Math.log(2.0)

  // the exact double path Spark's Round(expr, scale) takes for DoubleType
  private def roundTo(x: Double, scale: Int): Double =
    if (x.isNaN || x.isInfinite) x
    else BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Static kernel shared by eval and codegen. */
  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    // counts per CODE POINT — the units split(text, '') emits (the Java regex
    // engine never splits inside a surrogate pair); sorted keys give the fold
    // a canonical order (any order sums equal on the 1e-8 grid — this one is
    // also reproducible)
    val counts = new java.util.TreeMap[Integer, java.lang.Long]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      val prev = counts.get(cp)
      counts.put(cp, if (prev == null) 1L else prev + 1L)
      n += 1L
    }
    if (n == 0L) return InternalRow(0L, 0L, 0.0)
    var clogc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toDouble
      clogc += roundTo(c * (Math.log(c) / Ln2), 8)
    }
    val entropy = roundTo(Math.log(n.toDouble) / Ln2 - clogc / n.toDouble, 6)
    InternalRow(n, counts.size().toLong, entropy)
  }

  def charEntropy(c: Column): Column =
    ColumnBridge.column(CharEntropy(ColumnBridge.expression(c)))
}

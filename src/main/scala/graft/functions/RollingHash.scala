package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint as a native Catalyst expression.
  *
  * h = Σ bytes(s): h*base + b  (mod 2^61−1), over UTF-8 bytes — a classic Rabin-Karp
  * style fingerprint for cheap document identity/near-identity bucketing in training-data
  * pipelines.
  *
  * Spark-first notes: a native `Expression` with `doGenCode` keeps fingerprinting inside
  * whole-stage codegen (one fused loop over the string bytes per row, no UDF
  * serialization, no boxing) — the preferred extension tier after built-ins
  * (SURVEY.md §7 / spark guide: Expression beats UDF).
  */
case class RollingHash(child: Expression, base: Long = 1000003L)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash requires STRING input, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    RollingHash.hashBytes(input.asInstanceOf[UTF8String].getBytes, base)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = java.lang.Math.floorMod(
         |    $h * ${base}L + ($bytes[$i] & 0xFF), ${RollingHash.MOD}L);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** 2^61 − 1 (Mersenne prime). */
  val MOD: Long = 2305843009213693951L

  private[graft] def hashBytes(bytes: Array[Byte], base: Long): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = java.lang.Math.floorMod(h * base + (bytes(i) & 0xff), MOD)
      i += 1
    }
    h
  }

  /** Reference implementation for tests. */
  private[graft] def hashString(s: String, base: Long = 1000003L): Long =
    hashBytes(s.getBytes("UTF-8"), base)

  def rolling_hash(c: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))
}

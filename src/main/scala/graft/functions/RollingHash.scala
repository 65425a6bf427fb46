package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint as a native Catalyst expression.
  *
  * Two independent 31-bit polynomial streams over the UTF-8 bytes, packed into one
  * 62-bit value: hᵢ ← hᵢ·baseᵢ + b (mod pᵢ) with p₁ = 2³¹−1, p₂ = 2147483629. Each
  * stream keeps h < 2³¹ so h·base < 2⁶¹ — the update NEVER overflows a signed 64-bit
  * long (a single 61-bit modulus would: h·base ≈ 2⁸¹ wraps before the mod applies,
  * destroying the modular structure). Result is in [0, 2⁶²).
  *
  * Spark-first notes: a native `Expression` with codegen keeps fingerprinting inside
  * whole-stage codegen (one fused loop over the string bytes per row, no UDF
  * serialization) — the preferred extension tier after built-ins.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

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
    RollingHash.hashUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.hashUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** Stream moduli (both prime) and bases; each stream stays < 2³¹. */
  val MOD1: Long = 2147483647L // 2^31 − 1
  val MOD2: Long = 2147483629L
  val BASE1: Long = 1000003L
  val BASE2: Long = 998244353L
  /** Exclusive upper bound of the packed fingerprint. */
  val RANGE: Long = 1L << 62

  def hashBytes(bytes: Array[Byte]): Long = {
    var h1 = 0L
    var h2 = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      h1 = (h1 * BASE1 + b) % MOD1
      h2 = (h2 * BASE2 + b) % MOD2
      i += 1
    }
    (h1 << 31) | h2
  }

  /** Static kernel shared by eval and codegen. */
  def hashUtf8(s: UTF8String): Long = hashBytes(s.getBytes)

  /** Reference implementation for tests. */
  private[graft] def hashString(s: String): Long = hashBytes(s.getBytes("UTF-8"))

  def rolling_hash(c: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))
}

package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch as a mergeable `TypedImperativeAggregate`:
  * `approx_top_items(expr, k)` returns `array<struct<item, est_count>>` — at most k
  * items whose estimated counts undercount true counts by at most n/(k+1).
  *
  * The guarantee that matters at 100 TB: EVERY item with true frequency above
  * n/(k+1) is present in the result (the sketch can only lose counts, never a
  * genuinely frequent item), so it is a sound candidate generator for exact
  * heavy-hitters ([[graft.ops.HeavyHitters]]) — one bounded k-entry buffer per
  * partition shuffles instead of one row per distinct value, which for a
  * high-cardinality column (user ids, URLs, shingles) is the difference between a
  * k-sized reduce and a full groupBy of billions of keys.
  *
  * Merging follows Agarwal et al., "Mergeable Summaries" (PODS'12): sum counters,
  * then subtract the (k+1)-th largest count and drop non-positive entries — the
  * combined error stays ≤ n/(k+1), so partial aggregation across any partitioning
  * is sound (order-dependent only in WHICH sub-threshold items remain, never in
  * whether a true heavy hitter survives).
  */
case class ApproxTopItems(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override val dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est_count", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"approx_top_items requires (STRING, k > 0); got " +
        s"${child.dataType.catalogString}, k=$k")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.toString
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < k => buf.update(item, 1L)
        case None =>
          // classic MG decrement-all on a miss with a full table: O(k), but each
          // unit removed here was a prior O(1) increment — amortized constant
          val dead = mutable.ArrayBuffer.empty[String]
          buf.keysIterator.foreach { key =>
            val c = buf(key) - 1
            if (c <= 0) dead += key else buf.update(key, c)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (item, c) =>
      buf.update(item, buf.getOrElse(item, 0L) + c)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count; ≤ k entries stay strictly positive
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val m = counts(counts.length - (k + 1))
      val dead = mutable.ArrayBuffer.empty[String]
      buf.keysIterator.foreach { key =>
        val c = buf(key) - m
        if (c <= 0) dead += key else buf.update(key, c)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.toSeq.sortBy { case (item, c) => (-c, item) }.map { case (item, c) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(item), c))
      }.toArray[Any])

  private def writeStr(out: DataOutputStream, s: String): Unit = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    out.writeInt(b.length)
    out.write(b)
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    val out = new DataOutputStream(baos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) => writeStr(out, item); out.writeLong(c) }
    out.flush()
    baos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach { _ =>
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ApproxTopItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ApproxTopItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ApproxTopItems =
    copy(child = newChildren(0))
}

object ApproxTopItems {
  /** ≤ k (item, est_count) pairs, descending by estimated count; every item with
    * true count > n/(k+1) is guaranteed present.
    */
  def approx_top_items(item: Column, k: Int): Column =
    ColumnBridge.column(
      ApproxTopItems(ColumnBridge.expression(item), k).toAggregateExpression())
}

package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic per-group bottom-k sampler as a custom `TypedImperativeAggregate`.
  *
  * Keeps the k payloads with the lexicographically smallest sort keys per group. With a
  * content hash as the key (`md5(text)`), this is CONSISTENT SAMPLING: the same k
  * documents are chosen regardless of partitioning, row order, cluster size, or reruns —
  * the property a training-data pipeline needs for reproducible subset selection.
  *
  * Spark-first notes: the aggregate tier matters at 100 TB — each task reduces its
  * partition to ≤ k candidates map-side (a bounded heap), and only k-sized buffers
  * shuffle, versus the window-function formulation (`row_number() OVER (ORDER BY hash)`)
  * which shuffles and sorts EVERY row of every group. Verified row-identical to the
  * window formulation by the DuckDB oracle.
  */
case class BottomKByKey(
    key: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(String, String)]] {

  override def children: Seq[Expression] = Seq(key, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (key.dataType == StringType && payload.dataType == StringType && k > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bottom_k_by_key requires (STRING key, STRING payload, k > 0); got " +
        s"${key.dataType.catalogString}, ${payload.dataType.catalogString}, k=$k")

  // max-heap on (key, payload): the head is the LARGEST retained entry, evicted first
  private val ord: Ordering[(String, String)] = Ordering.Tuple2[String, String]

  override def createAggregationBuffer(): mutable.PriorityQueue[(String, String)] =
    mutable.PriorityQueue.empty[(String, String)](ord)

  override def update(
      buf: mutable.PriorityQueue[(String, String)],
      input: InternalRow): mutable.PriorityQueue[(String, String)] = {
    val kv = key.eval(input)
    val pv = payload.eval(input)
    if (kv != null && pv != null) {
      val entry = (kv.toString, pv.toString)
      if (buf.size < k) buf.enqueue(entry)
      else if (ord.lt(entry, buf.head)) { buf.dequeue(); buf.enqueue(entry) }
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(String, String)],
      other: mutable.PriorityQueue[(String, String)]): mutable.PriorityQueue[(String, String)] = {
    other.foreach { entry =>
      if (buf.size < k) buf.enqueue(entry)
      else if (ord.lt(entry, buf.head)) { buf.dequeue(); buf.enqueue(entry) }
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(String, String)]): Any =
    new GenericArrayData(
      buf.toSeq.sorted(ord).map(e => UTF8String.fromString(e._2)).toArray[Any])

  // length-prefixed UTF-8 byte arrays, NOT DataOutputStream.writeUTF: writeUTF caps
  // strings at 65535 encoded bytes and the payload here is full document text — a
  // single >64 KB document would crash every partial-aggregate shuffle
  private def writeStr(out: DataOutputStream, s: String): Unit = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    out.writeInt(b.length)
    out.write(b)
  }

  private def readStr(in: DataInputStream): String = {
    val b = new Array[Byte](in.readInt())
    in.readFully(b)
    new String(b, java.nio.charset.StandardCharsets.UTF_8)
  }

  override def serialize(buf: mutable.PriorityQueue[(String, String)]): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    val out = new DataOutputStream(baos)
    out.writeInt(buf.size)
    buf.foreach { case (a, b) => writeStr(out, a); writeStr(out, b) }
    out.flush()
    baos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(String, String)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue((readStr(in), readStr(in))))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKByKey =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKByKey =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKByKey =
    copy(key = newChildren(0), payload = newChildren(1))
}

object BottomKByKey {
  /** Array of the k payloads with smallest keys per group, ascending by key. */
  def bottom_k_by_key(key: Column, payload: Column, k: Int): Column =
    ColumnBridge.column(
      BottomKByKey(ColumnBridge.expression(key), ColumnBridge.expression(payload), k)
        .toAggregateExpression())
}

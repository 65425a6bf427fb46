package graft.sources.avro

import scala.collection.JavaConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.TaskAttemptContext
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.execution.datasources.OutputWriter
import org.apache.spark.sql.types._

/** One Avro container file per write task — the write half of the `format("avro")`
  * surface. The Catalyst → Avro value conversion mirrors [[AvroDeserializer]] so a
  * write/read round trip is schema- and value-exact (decimals as unscaled big-endian
  * bytes, timestamps as timestamp-micros, dates as epoch-day ints).
  */
final class AvroOutputWriter(
    val path: String,
    dataSchema: StructType,
    avroSchemaJson: String,
    context: TaskAttemptContext) extends OutputWriter {

  private val avroSchema = new Schema.Parser().parse(avroSchemaJson)
  private val writer = {
    val p = new Path(path)
    val out = p.getFileSystem(context.getConfiguration).create(p, false)
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](avroSchema))
    w.create(avroSchema, out)
    w
  }

  override def write(row: InternalRow): Unit =
    writer.append(AvroCatalystWriter.rowToRecord(row, dataSchema, avroSchema))

  override def close(): Unit = writer.close()
}

private[avro] object AvroCatalystWriter {

  def rowToRecord(row: InternalRow, st: StructType, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    var i = 0
    while (i < st.length) {
      val f = st.fields(i)
      val target = nonNull(schema.getFields.get(i).schema())
      rec.put(i,
        if (row.isNullAt(i)) null
        else convert(row.get(i, f.dataType), f.dataType, target))
      i += 1
    }
    rec
  }

  private def convert(v: Any, dt: DataType, target: Schema): AnyRef = (v, dt) match {
    case (null, _) => null
    case (r: InternalRow, st: StructType) => rowToRecord(r, st, target)
    case (b: Boolean, BooleanType) => java.lang.Boolean.valueOf(b)
    case (x: Int, IntegerType | DateType) => java.lang.Integer.valueOf(x)
    case (x: Long, LongType | TimestampType) => java.lang.Long.valueOf(x)
    case (x: Float, FloatType) => java.lang.Float.valueOf(x)
    case (x: Double, DoubleType) => java.lang.Double.valueOf(x)
    case (s: AnyRef, StringType) => s.toString
    case (b: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(b)
    case (d: Decimal, dec: DecimalType) =>
      java.nio.ByteBuffer.wrap(
        d.toJavaBigDecimal.setScale(dec.scale).unscaledValue().toByteArray)
    case (a: ArrayData, ArrayType(et, _)) =>
      val elemTarget = nonNull(target.getElementType)
      val out = new java.util.ArrayList[AnyRef](a.numElements())
      var i = 0
      while (i < a.numElements()) {
        out.add(if (a.isNullAt(i)) null else convert(a.get(i, et), et, elemTarget))
        i += 1
      }
      out
    case (m: MapData, MapType(StringType, vt, _)) =>
      val valueTarget = nonNull(target.getValueType)
      val out = new java.util.LinkedHashMap[String, AnyRef](m.numElements())
      val keys = m.keyArray()
      val values = m.valueArray()
      var i = 0
      while (i < m.numElements()) {
        out.put(keys.getUTF8String(i).toString,
          if (values.isNullAt(i)) null else convert(values.get(i, vt), vt, valueTarget))
        i += 1
      }
      out
    case (other, t) => throw new IllegalArgumentException(
      s"unsupported catalyst value ${other.getClass} for avro ${t.catalogString}")
  }

  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    else s
}

package graft.sources.avro

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}
import java.nio.ByteBuffer

import scala.collection.JavaConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericFixed, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.FileStatus
import org.apache.hadoop.mapreduce.{Job, TaskAttemptContext}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.execution.datasources.{FileFormat, OutputWriter, OutputWriterFactory, PartitionedFile}
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `spark.read.format("avro")` / `df.write.format("avro")` without the spark-avro
  * module — the reference reads its landed CDC envelopes with exactly this syntax
  * (`curated/dq_kafka.py:140-141`), and the offline environment ships avro-1.12.1 but
  * not spark-avro, so the DataSource surface is rebuilt here on the public
  * `FileFormat`/`DataSourceRegister` SPI (registered via META-INF/services, like any
  * third-party format).
  *
  * Semantics match [[graft.sources.AvroEnvelopeIO]]: Debezium logical decimals
  * (bytes + decimal logicalType) decode to DecimalType, epoch-day ints with only a
  * `connect.name` annotation stay IntegerType, nullable unions become nullable fields.
  *
  * Scale notes: container files are read whole (`isSplitable = false` — Avro blocks
  * need the sync-marker scan the full DataSource v2 reader does; at 100 TB keep files
  * ~128 MB so file-count parallelism does the work). Column pruning IS honored — the
  * deserializer materializes only `requiredSchema` fields, so `select(two cols)` off a
  * wide envelope skips decoding the rest. Filters stay in Spark (no pushdown; Avro has
  * no row-group statistics to push into anyway).
  */
class AvroFileFormat extends FileFormat with DataSourceRegister with Serializable {

  override def shortName(): String = "avro"

  override def toString: String = "GraftAvro"

  override def isSplitable(spark: SparkSession, options: Map[String, String],
      path: org.apache.hadoop.fs.Path): Boolean = false

  override def inferSchema(spark: SparkSession, options: Map[String, String],
      files: Seq[FileStatus]): Option[StructType] = {
    val conf = spark.sessionState.newHadoopConf()
    // one header read on the driver; files of one table share a writer schema, so the
    // first container's header is authoritative (schema evolution would union here)
    files.filter(f => f.isFile && f.getLen > 0).sortBy(_.getPath.toString)
      .headOption.map { f =>
        val reader = new DataFileReader[GenericRecord](
          new FsInput(f.getPath, conf), new GenericDatumReader[GenericRecord]())
        try AvroSchemaConverter.toSqlType(reader.getSchema).asInstanceOf[StructType]
        finally reader.close()
      }
  }

  override def buildReader(
      spark: SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[Filter],
      options: Map[String, String],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] = {
    val confBc = spark.sparkContext.broadcast(new SerializableHadoopConf(hadoopConf))
    val required = requiredSchema
    (file: PartitionedFile) => {
      val reader = new DataFileReader[GenericRecord](
        new FsInput(file.toPath, confBc.value.value),
        new GenericDatumReader[GenericRecord]())
      val deser = new AvroDeserializer(required)
      new Iterator[InternalRow] {
        private var closed = false
        override def hasNext: Boolean = {
          val more = !closed && reader.hasNext
          if (!more && !closed) { reader.close(); closed = true }
          more
        }
        override def next(): InternalRow = deser.deserialize(reader.next())
      }
    }
  }

  override def prepareWrite(spark: SparkSession, job: Job,
      options: Map[String, String], dataSchema: StructType): OutputWriterFactory = {
    val avroJson = AvroSchemaConverter.toAvroType(dataSchema, "topLevelRecord",
      "graft.avro").toString
    new OutputWriterFactory {
      override def getFileExtension(context: TaskAttemptContext): String = ".avro"
      override def newInstance(path: String, schema: StructType,
          context: TaskAttemptContext): OutputWriter =
        new AvroOutputWriter(path, schema, avroJson, context)
    }
  }

  override def supportDataType(dataType: DataType): Boolean = dataType match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType | FloatType |
        DoubleType | StringType | BinaryType | DateType | TimestampType => true
    case _: DecimalType => true
    case st: StructType => st.fields.forall(f => supportDataType(f.dataType))
    case ArrayType(et, _) => supportDataType(et)
    case MapType(StringType, vt, _) => supportDataType(vt)
    case NullType => true
    case _ => false
  }

  override def equals(other: Any): Boolean = other.isInstanceOf[AvroFileFormat]
  override def hashCode(): Int = getClass.hashCode()
}

/** Minimal serializable Configuration carrier (the Spark-internal one is
  * `private[spark]`); Hadoop's Writable protocol does the actual (de)serialization.
  */
private[avro] class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  @throws[IOException]
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  @throws[IOException]
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

/** Avro schema ⇄ Catalyst schema, covering the types Debezium/analytics data uses:
  * primitives, decimal/date/timestamp logical types, nullable unions, records,
  * arrays, string-keyed maps, enums and fixed.
  */
object AvroSchemaConverter {

  def toSqlType(schema: Schema): DataType = schema.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT =>
      if (schema.getLogicalType.isInstanceOf[LogicalTypes.Date]) DateType
      else IntegerType
    case Schema.Type.LONG => schema.getLogicalType match {
      case _: LogicalTypes.TimestampMillis | _: LogicalTypes.TimestampMicros => TimestampType
      case _ => LongType
    }
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.BYTES | Schema.Type.FIXED => schema.getLogicalType match {
      case d: LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
      case _ => BinaryType
    }
    case Schema.Type.NULL => NullType
    case Schema.Type.RECORD => StructType(schema.getFields.asScala.toSeq.map { f =>
      val (dt, nullable) = fieldType(f.schema())
      StructField(f.name(), dt, nullable)
    })
    case Schema.Type.ARRAY =>
      val (dt, nullable) = fieldType(schema.getElementType)
      ArrayType(dt, containsNull = nullable)
    case Schema.Type.MAP =>
      val (dt, nullable) = fieldType(schema.getValueType)
      MapType(StringType, dt, valueContainsNull = nullable)
    case Schema.Type.UNION => fieldType(schema)._1
  }

  /** Resolves `["null", X]` unions to (X's type, nullable = true). */
  private def fieldType(s: Schema): (DataType, Boolean) =
    if (s.getType == Schema.Type.UNION) {
      val branches = s.getTypes.asScala
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1,
        s"only unions of null with one type are supported, got $s")
      (toSqlType(nonNull.head), branches.size > nonNull.size)
    } else (toSqlType(s), false)

  def toAvroType(dt: DataType, recordName: String, namespace: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case d: DecimalType =>
      LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
    case st: StructType =>
      val builder = SchemaBuilder.record(recordName).namespace(namespace).fields()
      st.fields.foldLeft(builder) { (b, f) =>
        val fieldSchema = toAvroType(f.dataType, f.name, s"$namespace.$recordName")
        if (f.nullable)
          b.name(f.name).`type`(Schema.createUnion(
            Schema.create(Schema.Type.NULL), fieldSchema)).withDefault(null)
        else b.name(f.name).`type`(fieldSchema).noDefault()
      }.endRecord()
    case ArrayType(et, containsNull) =>
      val elem = toAvroType(et, s"${recordName}_item", namespace)
      Schema.createArray(
        if (containsNull) Schema.createUnion(Schema.create(Schema.Type.NULL), elem)
        else elem)
    case MapType(StringType, vt, valueContainsNull) =>
      val value = toAvroType(vt, s"${recordName}_value", namespace)
      Schema.createMap(
        if (valueContainsNull) Schema.createUnion(Schema.create(Schema.Type.NULL), value)
        else value)
    case NullType => Schema.create(Schema.Type.NULL)
    case other => throw new IllegalArgumentException(
      s"cannot convert ${other.catalogString} to an Avro type")
  }
}

/** GenericRecord → InternalRow for a (possibly pruned/reordered) required schema.
  * Field lookup is by name, so the reader tolerates writer-side column order and
  * extra columns; a required field absent from the record decodes to null.
  */
final class AvroDeserializer(requiredSchema: StructType) extends Serializable {

  def deserialize(rec: GenericRecord): InternalRow = recordToRow(rec, requiredSchema)

  private def recordToRow(rec: GenericRecord, st: StructType): GenericInternalRow = {
    val values = new Array[Any](st.length)
    var i = 0
    while (i < st.length) {
      val f = st.fields(i)
      val avroField = rec.getSchema.getField(f.name)
      values(i) =
        if (avroField == null) null
        else convert(rec.get(avroField.pos()), f.dataType, avroField.schema())
      i += 1
    }
    new GenericInternalRow(values)
  }

  private def convert(v: AnyRef, dt: DataType, schema: Schema): Any = (v, dt) match {
    case (null, _) => null
    case (r: GenericRecord, st: StructType) => recordToRow(r, st)
    case (b: java.lang.Boolean, BooleanType) => b.booleanValue()
    case (n: java.lang.Number, IntegerType) => n.intValue()
    case (n: java.lang.Number, DateType) => n.intValue()
    case (n: java.lang.Number, LongType) => n.longValue()
    case (n: java.lang.Number, TimestampType) =>
      nonNull(schema).getLogicalType match {
        case _: LogicalTypes.TimestampMillis => java.lang.Math.multiplyExact(n.longValue(), 1000L)
        case _ => n.longValue() // timestamp-micros, Catalyst's native unit
      }
    case (n: java.lang.Number, FloatType) => n.floatValue()
    case (n: java.lang.Number, DoubleType) => n.doubleValue()
    case (s: AnyRef, StringType) => UTF8String.fromString(s.toString)
    case (b: ByteBuffer, d: DecimalType) => decimalFromBytes(byteArray(b), d)
    case (b: ByteBuffer, BinaryType) => byteArray(b)
    case (f: GenericFixed, d: DecimalType) => decimalFromBytes(f.bytes(), d)
    case (f: GenericFixed, BinaryType) => f.bytes()
    case (c: java.util.Collection[_], ArrayType(et, _)) =>
      val elemSchema = nonNull(nonNull(schema).getElementType)
      new GenericArrayData(
        c.asScala.map(e => convert(e.asInstanceOf[AnyRef], et, elemSchema)).toArray)
    case (m: java.util.Map[_, _], MapType(StringType, vt, _)) =>
      val valueSchema = nonNull(nonNull(schema).getValueType)
      val entries = m.asScala.toSeq
      ArrayBasedMapData(
        entries.map(e => UTF8String.fromString(e._1.toString)).toArray[Any],
        entries.map(e => convert(e._2.asInstanceOf[AnyRef], vt, valueSchema)).toArray[Any])
    case (other, t) => throw new IllegalArgumentException(
      s"unsupported avro value ${other.getClass} for catalyst ${t.catalogString}")
  }

  private def byteArray(b: ByteBuffer): Array[Byte] = {
    val arr = new Array[Byte](b.remaining())
    b.duplicate().get(arr)
    arr
  }

  private def decimalFromBytes(bytes: Array[Byte], d: DecimalType): Decimal =
    Decimal(new java.math.BigDecimal(new java.math.BigInteger(bytes), d.scale),
      d.precision, d.scale)

  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    else s
}

package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import scala.collection.JavaConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.model.Schemas

/** Distributed Avro reader/writer for Debezium CDC envelopes, built on the bundled
  * avro-1.12.1 (`spark-avro` DataSource is not available offline — SURVEY.md §7.4).
  *
  * Faithful to the reference's landed-CDC layout: one container file per partition of
  * envelope records (`curated/dq_kafka.py:140-141` reads them with `format("avro")`), with
  * Debezium logical types — `order_date` as epoch-days int (`io.debezium.time.Date`) and
  * `order_amount` as big-endian unscaled decimal(10,2) bytes — per the writer schemas in
  * the reference's `testing/streaming.public.order.avro`.
  *
  * Spark-first notes: both directions run on executors via `mapPartitions` — the driver
  * only lists file paths. Read parallelism = one task per container file (Avro container
  * blocks are not splittable without the DataSource; at 100 TB keep files ~128 MB so the
  * file-level parallelism matches executor count). Decimal/date decode happens once per
  * record into Catalyst-native types, so everything downstream is codegen-friendly.
  */
object AvroEnvelopeIO {

  /** Avro writer schema for the orders envelope (subset of the Debezium envelope carrying
    * the fields the pipeline consumes: before/after/op/ts_ms).
    */
  val ordersEnvelopeSchemaJson: String =
    """{"type":"record","name":"Envelope","namespace":"streaming.public.order","fields":[
      |{"name":"before","type":["null",{"type":"record","name":"Value","fields":[
      |  {"name":"order_id","type":"long"},
      |  {"name":"order_date","type":{"type":"int","connect.name":"io.debezium.time.Date"}},
      |  {"name":"order_amount","type":{"type":"bytes","logicalType":"decimal","precision":10,"scale":2}},
      |  {"name":"customer_id","type":"long"}]}],"default":null},
      |{"name":"after","type":["null","Value"],"default":null},
      |{"name":"op","type":"string"},
      |{"name":"ts_ms","type":["null","long"],"default":null}]}""".stripMargin

  /** Spark-side schema of what [[readOrdersEnvelopes]] produces. */
  val ordersEnvelopeStructType: StructType = StructType(Seq(
    StructField("before", Schemas.orderCdcValue, nullable = true),
    StructField("after", Schemas.orderCdcValue, nullable = true),
    StructField("op", StringType, nullable = false),
    StructField("ts_ms", LongType, nullable = true)))

  private def decimalToBytes(d: java.math.BigDecimal, scale: Int): ByteBuffer =
    ByteBuffer.wrap(d.setScale(scale).unscaledValue().toByteArray)

  private def bytesToDecimal(b: ByteBuffer, scale: Int): java.math.BigDecimal = {
    val arr = new Array[Byte](b.remaining())
    b.duplicate().get(arr)
    new java.math.BigDecimal(new java.math.BigInteger(arr), scale)
  }

  // ---- generic Avro ⇄ Catalyst conversion (types the Debezium envelopes use:
  // long/int/string/decimal-bytes/nullable record) --------------------------------------

  /** GenericRecord → Row, driven by the target StructType. */
  private[sources] def recordToRow(rec: GenericRecord, schema: StructType): Row =
    if (rec == null) null
    else Row.fromSeq(schema.fields.toSeq.map(f => avroToCatalyst(rec.get(f.name), f.dataType)))

  private def avroToCatalyst(v: AnyRef, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (r: GenericRecord, s: StructType) => recordToRow(r, s)
    case (b: ByteBuffer, d: DecimalType) => bytesToDecimal(b, d.scale)
    case (n: java.lang.Number, LongType) => n.longValue()
    case (n: java.lang.Number, IntegerType) => n.intValue()
    case (s: AnyRef, StringType) => s.toString
    case (other, t) => throw new IllegalArgumentException(
      s"unsupported avro value ${other.getClass} for catalyst type ${t.catalogString}")
  }

  /** Row → GenericRecord, driven by the Avro writer schema (unions resolved to their
    * non-null branch).
    */
  private[sources] def rowToRecord(row: Row, schema: Schema, structType: StructType): GenericRecord = {
    val rec = new GenericData.Record(schema)
    structType.fields.zipWithIndex.foreach { case (f, i) =>
      val fieldSchema = nonNull(schema.getField(f.name).schema())
      rec.put(f.name, catalystToAvro(if (row.isNullAt(i)) null else row.get(i),
        f.dataType, fieldSchema))
    }
    rec
  }

  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  private def catalystToAvro(v: Any, dt: DataType, target: Schema): AnyRef = (v, dt) match {
    case (null, _) => null
    case (r: Row, s: StructType) => rowToRecord(r, target, s)
    case (d: java.math.BigDecimal, dec: DecimalType) => decimalToBytes(d, dec.scale)
    case (x: Long, LongType) => java.lang.Long.valueOf(x)
    case (x: Int, IntegerType) => java.lang.Integer.valueOf(x)
    case (s: String, StringType) => s
    case (other, t) => throw new IllegalArgumentException(
      s"unsupported catalyst value ${other.getClass} for avro ${t.catalogString}")
  }

  /** Envelope schema JSON for an arbitrary entity value schema. */
  def envelopeSchemaJson(namespace: String, valueFieldsJson: String): String =
    s"""{"type":"record","name":"Envelope","namespace":"$namespace","fields":[
       |{"name":"before","type":["null",{"type":"record","name":"Value","fields":[
       |$valueFieldsJson]}],"default":null},
       |{"name":"after","type":["null","Value"],"default":null},
       |{"name":"op","type":"string"},
       |{"name":"ts_ms","type":["null","long"],"default":null}]}""".stripMargin

  /** Spark-side envelope schema for an entity payload. */
  def envelopeStructType(value: StructType): StructType = StructType(Seq(
    StructField("before", value, nullable = true),
    StructField("after", value, nullable = true),
    StructField("op", StringType, nullable = false),
    StructField("ts_ms", LongType, nullable = true)))

  /** Write a DataFrame of envelope-shaped rows (before/after/op/ts_ms) as Avro container
    * files, one per partition — works for ANY entity value schema.
    */
  def writeEnvelopes(envelopes: DataFrame, schemaJson: String, outDir: String): Unit = {
    val structType = envelopes.schema
    envelopes.rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (rows.isEmpty) Iterator.empty
      else {
        val schema = new Schema.Parser().parse(schemaJson)
        val conf = new Configuration()
        val path = new Path(s"$outDir/part-$pid.avro")
        val fs = path.getFileSystem(conf)
        val out = fs.create(path, true)
        val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
        writer.create(schema, out)
        var n = 0L
        rows.foreach { r => writer.append(rowToRecord(r, schema, structType)); n += 1 }
        writer.close()
        Iterator.single(n)
      }
    }.count(): Unit
  }

  /** Read a directory of envelope container files into the given Spark schema — works
    * for ANY entity value schema.
    */
  def readEnvelopes(spark: SparkSession, dir: String, structType: StructType): DataFrame = {
    val conf = new Configuration()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val files = fs.listStatus(root).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".avro"))
      .map(_.getPath.toString)
      .sorted
    val rows = spark.sparkContext
      .parallelize(files, math.max(1, files.size))
      .mapPartitions { paths =>
        val conf = new Configuration()
        paths.flatMap { p =>
          val reader = new DataFileReader[GenericRecord](
            new FsInput(new Path(p), conf), new GenericDatumReader[GenericRecord]())
          val out = reader.iterator().asScala
            .map(rec => recordToRow(rec, structType)).toVector
          reader.close()
          out
        }
      }
    spark.createDataFrame(rows, structType)
  }

  /** Customers CDC value schema (reference testing/streaming.public.customers.avro). */
  val customersCdcValue: StructType = StructType(Seq(
    StructField("customer_id", LongType),
    StructField("name", StringType, nullable = true),
    StructField("email", StringType, nullable = true),
    StructField("region", StringType, nullable = true),
    StructField("customer_tenure_days", IntegerType, nullable = true)))

  val customersEnvelopeSchemaJson: String = envelopeSchemaJson(
    "streaming.public.customers",
    """{"name":"customer_id","type":"long"},
      |{"name":"name","type":["null","string"],"default":null},
      |{"name":"email","type":["null","string"],"default":null},
      |{"name":"region","type":["null","string"],"default":null},
      |{"name":"customer_tenure_days","type":["null","int"],"default":null}""".stripMargin)

  /** Write reference-flat orders (order_id, order_date TIMESTAMP/DATE, order_amount,
    * customer_id) as insert (`op="c"`) envelope container files, one per input partition.
    */
  def writeOrdersEnvelopes(flatOrders: DataFrame, outDir: String): Unit = {
    val schemaJson = ordersEnvelopeSchemaJson
    import org.apache.spark.sql.functions._
    val prepared = flatOrders.select(
      col("order_id").cast(LongType),
      datediff(col("order_date"), to_date(lit("1970-01-01"))).as("epoch_days"),
      col("order_amount").cast(DecimalType(10, 2)),
      col("customer_id").cast(LongType),
      (unix_timestamp(col("order_date")) * 1000).as("ts_ms"))
    prepared.rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (rows.isEmpty) Iterator.empty
      else {
        val schema = new Schema.Parser().parse(schemaJson)
        val valueSchema = schema.getField("after").schema().getTypes.get(1)
        val conf = new Configuration()
        val path = new Path(s"$outDir/part-$pid.avro")
        val fs = path.getFileSystem(conf)
        val out = fs.create(path, true)
        val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
        writer.create(schema, out)
        var n = 0L
        rows.foreach { r =>
          val value = new GenericData.Record(valueSchema)
          value.put("order_id", r.getLong(0))
          value.put("order_date", r.getInt(1))
          value.put("order_amount", decimalToBytes(r.getDecimal(2), 2))
          value.put("customer_id", r.getLong(3))
          val env = new GenericData.Record(schema)
          env.put("before", null)
          env.put("after", value)
          env.put("op", "c")
          env.put("ts_ms", r.getLong(4))
          writer.append(env)
          n += 1
        }
        writer.close()
        Iterator.single(n)
      }
    }.count(): Unit
  }

  /** Read a directory of envelope container files into a DataFrame with the nested
    * envelope schema — the stand-in for `spark.read.format("avro").load(dir)`.
    */
  def readOrdersEnvelopes(spark: SparkSession, dir: String): DataFrame = {
    val conf = new Configuration()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val files = fs.listStatus(root).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".avro"))
      .map(_.getPath.toString)
      .sorted
    val parallelism = math.max(1, files.size)
    val rows = spark.sparkContext
      .parallelize(files, parallelism)
      .mapPartitions { paths =>
        val conf = new Configuration()
        paths.flatMap { p =>
          val reader = new DataFileReader[GenericRecord](
            new FsInput(new Path(p), conf), new GenericDatumReader[GenericRecord]())
          val out = reader.iterator().asScala.map(envelopeToRow).toVector
          reader.close()
          out
        }
      }
    spark.createDataFrame(rows, ordersEnvelopeStructType)
  }

  private def envelopeToRow(rec: GenericRecord): Row = {
    def valueRow(v: AnyRef): Row = v match {
      case null => null
      case r: GenericRecord => Row(
        r.get("order_id").asInstanceOf[Long],
        r.get("order_date").asInstanceOf[Int],
        bytesToDecimal(r.get("order_amount").asInstanceOf[ByteBuffer], 2),
        r.get("customer_id").asInstanceOf[Long])
    }
    Row(
      valueRow(rec.get("before")),
      valueRow(rec.get("after")),
      rec.get("op").toString,
      rec.get("ts_ms") match {
        // null.asInstanceOf[Long] silently unboxes to 0L — keep nulls null
        case null => null
        case n: java.lang.Number => n.longValue()
      })
  }

  /** Round-trip helper for tests: envelope bytes in memory. */
  private[graft] def roundTripBytes(records: Seq[GenericRecord], schema: Schema): Seq[GenericRecord] = {
    val baos = new ByteArrayOutputStream()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, baos)
    records.foreach(w.append)
    w.close()
    val r = new DataFileReader[GenericRecord](
      new org.apache.avro.file.SeekableByteArrayInput(baos.toByteArray),
      new GenericDatumReader[GenericRecord]())
    val out = r.iterator().asScala.toVector
    r.close()
    out
  }
}

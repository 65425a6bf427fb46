package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.Flatten
import graft.model.RefAdapter
import graft.sources.{AvroEnvelopeIO, FlatFiles, Synthetic}

class SourcesSpec extends AnyFunSuite with SharedSpark {

  private def o = RefAdapter.orders(Tables.orders(spark, sf))

  test("avro CDC roundtrip: envelope files reproduce flat orders exactly") {
    val out = Files.createTempDirectory("avro_rt").toString
    AvroEnvelopeIO.writeOrdersEnvelopes(o, out)
    val env = AvroEnvelopeIO.readOrdersEnvelopes(spark, out)
    assert(env.count() === o.count())
    // envelope shape: before null, op = c, after populated
    assert(env.filter(col("before").isNotNull).count() === 0)
    assert(env.filter(col("op") =!= "c").count() === 0)
    val flat = Flatten.ordersAfter(env)
    val expected = o.select(
      col("order_id"),
      to_date(col("order_date")).as("order_date"),
      col("order_amount").cast("decimal(10,2)").as("order_amount"),
      col("customer_id"))
    assert(flat.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(flat).count() === 0)
  }

  test("avro read parallelism: one file per input partition, all readable") {
    val out = Files.createTempDirectory("avro_par").toString
    AvroEnvelopeIO.writeOrdersEnvelopes(o.repartition(3), out)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length === 3)
    assert(AvroEnvelopeIO.readOrdersEnvelopes(spark, out).rdd.getNumPartitions === 3)
  }

  test("csv roundtrip preserves values including doubles") {
    val src = Tables.customer(spark, sf)
    val out = Files.createTempDirectory("csv_rt").toString
    FlatFiles.writeCsv(src, out)
    val back = FlatFiles.readCsv(spark, out, src.schema)
    assert(back.exceptAll(src).count() === 0)
    assert(src.exceptAll(back).count() === 0)
  }

  test("partitioned json: hive layout on disk, partition values survive read") {
    val src = o.withColumn("sale_date", date_format(col("order_date"), "yyyy-MM-dd"))
    val out = Files.createTempDirectory("json_rt").toString
    FlatFiles.writePartitionedJson(src, out, "sale_date")
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("sale_date=")))
    val schema = org.apache.spark.sql.types.StructType(
      src.schema.fields.filterNot(_.name == "sale_date"))
      .add("sale_date", org.apache.spark.sql.types.StringType)
    val back = FlatFiles.readPartitionedJson(spark, out, schema)
    assert(back.count() === src.count())
    assert(back.select("order_id", "sale_date")
      .exceptAll(src.select("order_id", "sale_date")).count() === 0)
  }

  test("synthetic generator is deterministic and respects bounds") {
    val a = Synthetic.orders(spark, 1000)
    val b = Synthetic.orders(spark, 1000)
    assert(a.exceptAll(b).count() === 0)
    assert(a.filter(col("order_amount") < 1 || col("order_amount") > 1000).count() === 0)
    assert(a.filter(col("customer_id") < 1 || col("customer_id") > 50).count() === 0)
    val c = Synthetic.customers(spark, 50)
    assert(c.count() === 50)
    assert(c.filter(col("region").isNull).count() === 0)
  }
}

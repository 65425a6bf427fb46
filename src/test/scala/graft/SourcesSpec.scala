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

  test("format(avro): DataSource syntax reads the Debezium envelope fixtures") {
    val out = Files.createTempDirectory("avro_ds").toString
    AvroEnvelopeIO.writeOrdersEnvelopes(o, out)
    // the reference's own read syntax (curated/dq_kafka.py:140-141)
    val env = spark.read.format("avro").load(out)
    // inferred schema matches the hand-built envelope StructType, including the
    // decimal logical type buried two records deep
    assert(env.schema.catalogString ===
      AvroEnvelopeIO.ordersEnvelopeStructType.catalogString)
    val viaDs = Flatten.ordersAfter(env)
    val viaIo = Flatten.ordersAfter(AvroEnvelopeIO.readOrdersEnvelopes(spark, out))
    assert(viaDs.exceptAll(viaIo).count() === 0)
    assert(viaIo.exceptAll(viaDs).count() === 0)
  }

  test("format(avro): column pruning decodes only selected fields") {
    val out = Files.createTempDirectory("avro_prune").toString
    AvroEnvelopeIO.writeOrdersEnvelopes(o, out)
    val pruned = spark.read.format("avro").load(out).select("op", "ts_ms")
    assert(pruned.schema.fieldNames.toSeq === Seq("op", "ts_ms"))
    assert(pruned.filter(col("op") === "c").count() === o.count())
    // the pruned schema reaches the SCAN — the nested before/after records are
    // never requested from the deserializer
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    val readSchema = scan.metadata("ReadSchema")
    assert(readSchema.contains("op") && readSchema.contains("ts_ms"))
    assert(!readSchema.contains("before") && !readSchema.contains("after"),
      s"nested envelope columns must be pruned from the scan: $readSchema")
  }

  test("format(avro): write/read roundtrip with nested, decimal and array columns") {
    import spark.implicits._
    val src = Seq(
      (1L, "alpha", BigDecimal("12.34"), Seq(1, 2, 3), ("x", 10L)),
      (2L, "beta", BigDecimal("0.05"), Seq.empty[Int], ("y", 20L)))
      .toDF("id", "name", "amount", "xs", "kv")
      .withColumn("amount", col("amount").cast("decimal(10,2)"))
      .withColumn("d", to_date(lit("2024-03-01")))
    val out = Files.createTempDirectory("avro_wr").toString + "/t"
    src.write.format("avro").save(out)
    val back = spark.read.format("avro").load(out)
    assert(back.exceptAll(src).count() === 0)
    assert(src.exceptAll(back).count() === 0)
  }

  test("format(avro): hive-partitioned write and SQL DDL USING avro") {
    import spark.implicits._
    val src = Seq((1L, "a", "2024-01-01"), (2L, "b", "2024-01-02"),
      (3L, "c", "2024-01-02")).toDF("id", "tag", "d")
    val out = Files.createTempDirectory("avro_part").toString + "/t"
    src.write.format("avro").partitionBy("d").save(out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.sorted.toSeq === Seq("d=2024-01-01", "d=2024-01-02"))
    val back = spark.read.format("avro").load(out)
    assert(back.columns.toSet === Set("id", "tag", "d"))
    assert(back.orderBy("id").select("id", "tag", "d").as[(Long, String, String)]
      .collect().toSeq === Seq((1L, "a", "2024-01-01"), (2L, "b", "2024-01-02"),
        (3L, "c", "2024-01-02")))
    // SQL-first users get the same surface through DDL
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW avro_t USING avro OPTIONS (path '$out')")
    assert(spark.sql("SELECT count(*) FROM avro_t WHERE d = '2024-01-02'")
      .first().getLong(0) === 2)
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

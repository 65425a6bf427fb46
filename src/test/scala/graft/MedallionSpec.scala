package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.RefAdapter
import graft.pipeline.Medallion

class MedallionSpec extends AnyFunSuite with SharedSpark {

  private def o = RefAdapter.orders(Tables.orders(spark, sf))
  private def c = RefAdapter.customers(Tables.customer(spark, sf))

  test("full E1 run: bronze lineage, DQ-pass silver, both gold tables") {
    val root = Files.createTempDirectory("medallion").toString
    val summary = Medallion.run(spark, o, c, root)
    assert(!summary.quarantined)
    assert(summary.bronzeRows === o.count())
    assert(summary.silverRows === o.count())
    assert(summary.customersSilverRows === c.count())
    assert(summary.dailySalesRows > 0 && summary.clvRows > 0)
    // customers flowed through their own DQ-gated silver layer
    assert(spark.read.parquet(s"$root/silver/customers").count() === c.count())
    assert(spark.read.json(s"$root/reports/dq_customers").count() === 1)

    val bronze = spark.read.parquet(s"$root/bronze/orders")
    assert(bronze.columns.toSet.contains("ingestion_timestamp"))
    assert(bronze.filter(col("ingestion_layer") =!= "bronze").count() === 0)
    // partitioned layout on disk
    val dirs = new java.io.File(s"$root/bronze/orders").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("ingest_date=")))
    // gold totals match a direct computation over silver
    val goldTotal = spark.read.parquet(s"$root/gold/daily_sales")
      .agg(sum("total_revenue")).first().getDouble(0)
    val direct = spark.read.parquet(s"$root/silver/orders")
      .join(c.select("customer_id"), Seq("customer_id"))
      .agg(sum(col("order_amount").cast("decimal(18,2)")).cast("double"))
      .first().getDouble(0)
    assert(math.abs(goldTotal - direct) < 1e-6)
    // ingest log recorded both layer commits
    assert(spark.read.json(s"$root/bronze/orders/_ingest_log").count() === 1)
    assert(spark.read.json(s"$root/silver/orders/_ingest_log").count() === 1)
    // DQ report written
    assert(spark.read.json(s"$root/reports/dq_orders").count() === 1)
  }

  test("dirty data is quarantined and gold is never written") {
    val root = Files.createTempDirectory("medallion_dirty").toString
    // flip most amounts negative → accuracy check fails hard
    val dirty = o.withColumn("order_amount",
      when(col("order_id") % 2 === 0, -col("order_amount"))
        .otherwise(col("order_amount")))
    val summary = Medallion.run(spark, dirty, c, root)
    assert(summary.quarantined)
    assert(new java.io.File(s"$root/quarantine/orders").exists())
    assert(!new java.io.File(s"$root/gold/daily_sales").exists())
    assert(spark.read.json(s"$root/quarantine/orders").count() === dirty.count())
  }

  test("bronze lineage falls back cleanly for non-file sources") {
    import spark.implicits._
    // locally-created frame has no _metadata column — must not throw
    val local = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10.0, 1L))
      .toDF("order_id", "order_date", "order_amount", "customer_id")
    val root = Files.createTempDirectory("medallion_local").toString
    val n = Medallion.toBronze(local, s"$root/bronze")
    assert(n === 1)
    val bronze = spark.read.parquet(s"$root/bronze")
    assert(bronze.select("source_file").first().getString(0) === "unknown")
  }

  test("CDC envelope input flows through the same silver path") {
    val root = Files.createTempDirectory("medallion_cdc").toString
    val p = Medallion.Paths(root)
    // build an envelope frame, write as bronze directly (E2's bronze is landed CDC)
    val env = o.select(
      struct(col("order_id"), col("order_date"), col("order_amount"),
        col("customer_id")).as("after"),
      lit("c").as("op"))
    env.write.mode("overwrite").parquet(p.bronze)
    val (v, ok, _) = Medallion.toSilver(spark, p.bronze, c, p)
    assert(ok && v.passed)
    assert(spark.read.parquet(p.silver).count() === o.count())
  }
}

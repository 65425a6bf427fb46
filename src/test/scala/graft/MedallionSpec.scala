package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.VersionedTable
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
    assert(VersionedTable.read(spark, s"$root/silver/customers").count() === c.count())
    assert(spark.read.json(s"$root/reports/dq_customers").count() === 1)

    val bronze = VersionedTable.read(spark, s"$root/bronze/orders")
    assert(bronze.columns.toSet.contains("ingestion_timestamp"))
    assert(bronze.filter(col("ingestion_layer") =!= "bronze").count() === 0)
    // partitioned layout on disk, inside the commit's data dir
    val commitDir = VersionedTable.commits(spark, s"$root/bronze/orders").head.data_dir
    val dirs = new java.io.File(s"$root/bronze/orders/_data/$commitDir").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("ingest_date=")))
    // gold totals match a direct computation over silver
    val goldTotal = VersionedTable.read(spark, s"$root/gold/daily_sales")
      .agg(sum("total_revenue")).first().getDouble(0)
    val direct = VersionedTable.read(spark, s"$root/silver/orders")
      .join(c.select("customer_id"), Seq("customer_id"))
      .agg(sum(col("order_amount").cast("decimal(18,2)")).cast("double"))
      .first().getDouble(0)
    assert(math.abs(goldTotal - direct) < 1e-6)
    // every layer is a versioned table with exactly one commit after one run
    for (t <- Seq("bronze/orders", "silver/orders", "silver/customers",
        "gold/daily_sales", "gold/customer_lifetime_value"))
      assert(VersionedTable.history(spark, s"$root/$t").count() === 1, t)
    // DQ report written
    assert(spark.read.json(s"$root/reports/dq_orders").count() === 1)
  }

  test("re-running the pipeline versions every layer: silver reads as-of the prior run") {
    val root = Files.createTempDirectory("medallion_tt").toString
    // run 1: only the first half of the orders
    val firstHalf = o.filter(col("order_id") % 2 === 0)
    Medallion.run(spark, firstHalf, c, root)
    val silverV0 = VersionedTable.commits(spark, s"$root/silver/orders").last.version
    // run 2: the full order set overwrites every layer with a new commit
    Medallion.run(spark, o, c, root)
    val silver = s"$root/silver/orders"
    assert(VersionedTable.history(spark, silver).count() === 2)
    assert(VersionedTable.read(spark, silver).count() === o.count())
    // time travel: the silver table exactly as the previous DQ gate published it
    assert(VersionedTable.readAsOf(spark, silver, silverV0).count() === firstHalf.count())
    // gold history advanced in lockstep
    assert(VersionedTable.history(spark, s"$root/gold/daily_sales").count() === 2)
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
    val bronze = VersionedTable.read(spark, s"$root/bronze")
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
    VersionedTable.write(env, p.bronze, "overwrite")
    val (v, ok, _) = Medallion.toSilver(spark, p.bronze, c, p)
    assert(ok && v.passed)
    assert(VersionedTable.read(spark, p.silver).count() === o.count())
  }
}

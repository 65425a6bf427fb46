package graft.pipeline

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.VersionedTable
import graft.cdc.Flatten
import graft.dq.DqValidator
import graft.gold.{CustomerLifetimeValue, DailySales}

/** Medallion-lake orchestration: landed → bronze → DQ-gated silver → gold, the
  * reference's two end-to-end paths (SURVEY.md §3 E1/E2) as one library API.
  *
  * Reference mapping: bronze lineage columns (`ingestion_timestamp`, `source_file`,
  * `ingestion_layer`) from `mage-programs/orders_delta_lake.py:42-50`; the conditional
  * CDC flatten and DQ gate from `mage-programs/data_quality.py:157-235`; gold writes from
  * `enriched/daily_sales_aggregation.py:29-32` / `customer_lifetime_value.py:82`.
  *
  * Spark-first notes: `_metadata.file_path` supplies lineage without the legacy
  * `input_file_name()` (correct under file-source v2); every layer write is partitioned
  * parquet so downstream scans prune. Every layer is a [[VersionedTable]]: each run's
  * write is one commit, so the pipeline tables themselves carry Delta-parity history
  * and as-of reads (the reference calls `history()`/version reads on its *pipeline*
  * tables, `mage-programs/delta_metadata.py:114-116`) — no separate ingest-log sidecar.
  * Each layer is a pure DataFrame→write step: at scale each becomes its own job with
  * no driver-side data movement.
  */
object Medallion {

  final case class Paths(root: String) {
    val bronze = s"$root/bronze/orders"
    val silver = s"$root/silver/orders"
    val quarantine = s"$root/quarantine/orders"
    val customersBronze = s"$root/bronze/customers"
    val customersSilver = s"$root/silver/customers"
    val customersQuarantine = s"$root/quarantine/customers"
    val goldDailySales = s"$root/gold/daily_sales"
    val goldClv = s"$root/gold/customer_lifetime_value"
    val reports = s"$root/reports"
  }

  final case class RunSummary(
      bronzeRows: Long, silverRows: Long, customersSilverRows: Long,
      quarantined: Boolean, dailySalesRows: Long, clvRows: Long)

  /** Landed (JSON-lines dir or any DataFrame source) → bronze parquet with lineage.
    * `partitionDate` derives the Hive partition column when the entity has an event
    * date (facts); dimension bronzes go unpartitioned.
    */
  def toBronze(landed: DataFrame, bronzePath: String,
      sourceFile: Option[String] = None,
      partitionDate: Option[org.apache.spark.sql.Column] = None): Long = {
    // _metadata.file_path only resolves for file-source frames; probing with a select
    // forces analysis NOW (col() alone is lazy and would throw later at withColumn)
    val lineageCol = sourceFile.map(lit).getOrElse {
      if (landed.isStreaming) lit("stream")
      else try {
        landed.select(col("_metadata.file_path")); col("_metadata.file_path")
      } catch { case _: org.apache.spark.sql.AnalysisException => lit("unknown") }
    }
    // observe() piggybacks the row count on the write job itself — the previous
    // read-back-and-count cost a second full scan of the layer per run
    val obs = Observation()
    val withLineage = landed
      .withColumn("ingestion_timestamp", current_timestamp())
      .withColumn("source_file", lineageCol)
      .withColumn("ingestion_layer", lit("bronze"))
      .observe(obs, count(lit(1)).as("rows"))
    partitionDate match {
      case Some(d) =>
        VersionedTable.write(withLineage.withColumn("ingest_date", d), bronzePath,
          "overwrite", partitionBy = Seq("ingest_date"))
      case None =>
        VersionedTable.write(withLineage, bronzePath, "overwrite")
    }
    obs.get("rows").asInstanceOf[Long]
  }

  /** Customers bronze → silver through their own DQ gate (completeness + tenure range).
    * Returns (validator, curatedOk, rows written by the taken branch).
    */
  def customersToSilver(spark: SparkSession, bronzePath: String, p: Paths):
      (DqValidator, Boolean, Long) = {
    val bronze = VersionedTable.read(spark, bronzePath)
    val flat = Flatten.after(bronze)
      .select("customer_id", "name", "email", "region", "customer_tenure_days")
    val v = new DqValidator()
      .checkCompleteness(flat, "customers",
        Seq("customer_id", "name", "email", "region"))
      .checkAccuracy(flat, "customers", Seq(
        "tenure_1_100" -> col("customer_tenure_days").between(1, 100)))
    val (ok, rows) = DqValidator.gateCounted(flat, v, p.customersSilver,
      p.customersQuarantine, versioned = true)
    DqValidator.writeReport(spark, v.report(), s"${p.reports}/dq_customers")
    (v, ok, rows)
  }

  /** Bronze → silver through the DQ gate (flattening CDC envelopes if present).
    * Returns (validator, curatedOk, rows written by the taken branch).
    */
  def toSilver(spark: SparkSession, bronzePath: String, customers: DataFrame,
      p: Paths): (DqValidator, Boolean, Long) = {
    val bronze = VersionedTable.read(spark, bronzePath)
    val flat = Flatten.after(bronze) // no-op unless an `after` envelope column exists
      .select("order_id", "order_date", "order_amount", "customer_id")
    val v = new DqValidator()
      .checkCompleteness(flat, "orders",
        Seq("order_id", "order_date", "order_amount", "customer_id"))
      .checkAccuracy(flat, "orders", Seq(
        "amount_positive" -> (col("order_amount") > 0)))
      .checkConsistency(flat, "orders", customers, "customers", Seq("customer_id"))
    val (ok, rows) = DqValidator.gateCounted(flat, v, p.silver, p.quarantine,
      partitionColumns = Nil, versioned = true)
    DqValidator.writeReport(spark, v.report(), s"${p.reports}/dq_orders")
    (v, ok, rows)
  }

  /** Silver → both gold tables. Row counts ride each write via observe() — no
    * read-back scans.
    */
  def toGold(spark: SparkSession, silverPath: String, customers: DataFrame,
      p: Paths): (Long, Long) = {
    val silver = VersionedTable.read(spark, silverPath)
    val obsDaily = Observation()
    val daily = DailySales(silver, customers, stampProcessingTime = true)
      .observe(obsDaily, count(lit(1)).as("rows"))
    VersionedTable.write(daily, p.goldDailySales, "overwrite",
      partitionBy = Seq("sale_date", "region"))
    val obsClv = Observation()
    val clv = CustomerLifetimeValue(silver, customers, stampProcessingTime = true)
      .observe(obsClv, count(lit(1)).as("rows"))
    VersionedTable.write(clv, p.goldClv, "overwrite", partitionBy = Seq("region"))
    (obsDaily.get("rows").asInstanceOf[Long], obsClv.get("rows").asInstanceOf[Long])
  }

  /** Full E1 run: BOTH entities land in bronze and pass their own DQ gates; gold joins
    * silver facts against silver dimensions (never raw input).
    */
  def run(spark: SparkSession, orders: DataFrame, customers: DataFrame,
      root: String): RunSummary = {
    val p = Paths(root)
    val bronzeRows = toBronze(orders, p.bronze,
      partitionDate = Some(to_date(col("order_date"))))
    toBronze(customers, p.customersBronze)
    val (_, custOk, customersSilverRows) = customersToSilver(spark, p.customersBronze, p)
    if (!custOk) {
      // dimension failed its gate: STOP — do not curate orders against unvalidated
      // customers, and leave no silver/gold state that contradicts the summary
      return RunSummary(bronzeRows, 0L, 0L, quarantined = true, 0L, 0L)
    }
    // every layer count rides its own write (observe() metrics) — the summary adds no
    // re-read scans on top of the layer writes themselves
    val silverCustomers = VersionedTable.read(spark, p.customersSilver)
      .select("customer_id", "name", "email", "region", "customer_tenure_days")
    val (_, ok, silverRows) = toSilver(spark, p.bronze, silverCustomers, p)
    if (!ok) {
      RunSummary(bronzeRows, 0L, customersSilverRows, quarantined = true, 0L, 0L)
    } else {
      val (ds, clv) = toGold(spark, p.silver, silverCustomers, p)
      RunSummary(bronzeRows, silverRows, customersSilverRows,
        quarantined = false, ds, clv)
    }
  }
}

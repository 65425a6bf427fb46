package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-shape entities and schemas.
  *
  * The reference pipeline (ramsjenu/DEA05-E2E-Kafka_Streaming-Pipeline) operates on two
  * business entities, `orders` and `customers`, with schemas declared at
  * `curated/data_quality.py:9-24` and sampled in `data/orders.csv` / `data/customers.csv`.
  * The harness tables (`/root/testdata/sf*`) are TPC-H-ish; [[RefAdapter]] maps them onto the
  * reference shape so every reference query runs unchanged over harness data.
  */
final case class Order(
    order_id: Long,
    order_date: java.sql.Timestamp,
    order_amount: Double,
    customer_id: Long)

final case class Customer(
    customer_id: Long,
    name: String,
    email: String,
    region: String,
    customer_tenure_days: Int)

object Schemas {

  /** Declared order schema (curated/data_quality.py:9-15), reference column names. */
  val orders: StructType = StructType(Seq(
    StructField("order_id", LongType, nullable = false),
    StructField("order_date", TimestampType, nullable = true),
    StructField("order_amount", DoubleType, nullable = true),
    StructField("customer_id", LongType, nullable = true)))

  /** Declared customer schema (curated/data_quality.py:17-24). */
  val customers: StructType = StructType(Seq(
    StructField("customer_id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("email", StringType, nullable = true),
    StructField("region", StringType, nullable = true),
    StructField("customer_tenure_days", IntegerType, nullable = true)))

  /** Debezium CDC envelope (writer schemas embedded in the reference's
    * testing/streaming.public.order.avro; see SURVEY.md §1.3). `valueSchema` is the
    * per-entity `before`/`after` payload.
    */
  def debeziumEnvelope(valueSchema: StructType): StructType = StructType(Seq(
    StructField("before", valueSchema, nullable = true),
    StructField("after", valueSchema, nullable = true),
    StructField("source", StructType(Seq(
      StructField("version", StringType), StructField("connector", StringType),
      StructField("name", StringType), StructField("ts_ms", LongType),
      StructField("snapshot", StringType), StructField("db", StringType),
      StructField("sequence", StringType, nullable = true),
      StructField("schema", StringType), StructField("table", StringType),
      StructField("txId", LongType, nullable = true),
      StructField("lsn", LongType, nullable = true),
      StructField("xmin", LongType, nullable = true))), nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("ts_ms", LongType, nullable = true),
    StructField("transaction", StructType(Seq(
      StructField("id", StringType), StructField("total_order", LongType),
      StructField("data_collection_order", LongType))), nullable = true)))

  /** CDC `after` payload for orders: epoch-days date + decimal(10,2) amount, exactly as
    * Debezium emits them (io.debezium.time.Date; bytes logicalType=decimal scale 2).
    */
  val orderCdcValue: StructType = StructType(Seq(
    StructField("order_id", LongType),
    StructField("order_date", IntegerType), // epoch days
    StructField("order_amount", DecimalType(10, 2)),
    StructField("customer_id", LongType)))
}

/** Maps the harness TPC-H-ish tables onto the reference's entity shape.
  *
  * orders:    o_orderkey→order_id, o_orderdate→order_date, o_totalprice→order_amount,
  *            o_custkey→customer_id
  * customers: c_custkey→customer_id, c_name→name, synthetic email, c_mktsegment→region,
  *            deterministic tenure 1..100 (reference generator bound,
  *            streaming-source/topic_customers_streaming.py:21).
  */
object RefAdapter {

  def orders(harnessOrders: DataFrame): DataFrame = harnessOrders.select(
    col("o_orderkey").as("order_id"),
    col("o_orderdate").as("order_date"),
    col("o_totalprice").as("order_amount"),
    col("o_custkey").as("customer_id"))

  def customers(harnessCustomer: DataFrame): DataFrame = harnessCustomer.select(
    col("c_custkey").as("customer_id"),
    col("c_name").as("name"),
    concat(col("c_name"), lit("@example.com")).as("email"),
    col("c_mktsegment").as("region"),
    (col("c_custkey") % 100 + 1).cast(IntegerType).as("customer_tenure_days"))

  /** Typed core (SURVEY §1.3): case-class Datasets where schemas are fixed, for
    * compile-time field checks at the gold boundary.
    */
  def ordersDs(harnessOrders: DataFrame): org.apache.spark.sql.Dataset[Order] =
    orders(harnessOrders).as[Order](org.apache.spark.sql.Encoders.product[Order])
  def customersDs(harnessCustomer: DataFrame): org.apache.spark.sql.Dataset[Customer] =
    customers(harnessCustomer).as[Customer](org.apache.spark.sql.Encoders.product[Customer])

  /** Same adapters as ANSI SQL snippets, for DuckDB-oracle parity. */
  val ordersSql: String =
    "SELECT o_orderkey AS order_id, o_orderdate AS order_date, " +
      "o_totalprice AS order_amount, o_custkey AS customer_id FROM orders"
  val customersSql: String =
    "SELECT c_custkey AS customer_id, c_name AS name, c_name || '@example.com' AS email, " +
      "c_mktsegment AS region, CAST(c_custkey % 100 + 1 AS INT) AS customer_tenure_days " +
      "FROM customer"
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.RefAdapter

class GoldSpec extends AnyFunSuite with SharedSpark {

  test("daily_sales: revenue total equals raw order_amount total over joined rows") {
    val o = RefAdapter.orders(Tables.orders(spark, sf))
    val c = RefAdapter.customers(Tables.customer(spark, sf))
    val gold = SparkEntry.queries("q_daily_sales")(spark, sf).cache()
    assert(gold.count() > 0)
    val goldTotal = gold.agg(sum("total_revenue")).first().getDouble(0)
    val rawTotal = o.join(c.select("customer_id"), Seq("customer_id"))
      .agg(sum(col("order_amount").cast("decimal(18,2)")).cast("double"))
      .first().getDouble(0)
    assert(math.abs(goldTotal - rawTotal) < 1e-6)
    val orders = gold.agg(sum("total_orders")).first().getLong(0)
    assert(orders === o.join(c.select("customer_id"), Seq("customer_id")).count())
  }

  test("daily_sales: reference semantics — unique_customers equals total_orders (plain count)") {
    val gold = SparkEntry.queries("q_daily_sales")(spark, sf)
    assert(gold.filter(col("unique_customers") =!= col("total_orders")).count() === 0)
    val distinct = SparkEntry.queries("q_daily_sales_distinct")(spark, sf)
    assert(distinct.filter(col("unique_customers") > col("total_orders")).count() === 0)
  }

  test("clv: one row per ordering customer; first<=last; lifetime value positive") {
    val clv = SparkEntry.queries("q_clv")(spark, sf).cache()
    val o = RefAdapter.orders(Tables.orders(spark, sf))
    assert(clv.count() === o.select("customer_id").distinct().count())
    assert(clv.filter(col("first_order_date") > col("last_order_date")).count() === 0)
    assert(clv.filter(col("lifetime_value") <= 0).count() === 0)
    assert(clv.filter(col("avg_days_between_orders") < 0).count() === 0)
  }

  test("latest_order_per_customer: one row per customer, matches max order_date") {
    val latest = SparkEntry.queries("q_latest_order_per_customer")(spark, sf).cache()
    val o = RefAdapter.orders(Tables.orders(spark, sf))
    assert(latest.count() === o.select("customer_id").distinct().count())
    val expected = o.groupBy("customer_id")
      .agg(max(to_date(col("order_date"))).as("max_date"))
    val joined = latest.join(expected, Seq("customer_id"))
    assert(joined.filter(col("order_date") =!= col("max_date")).count() === 0)
  }

  test("orphan detection: anti + semi partition the fact table") {
    val o = RefAdapter.orders(Tables.orders(spark, sf))
    val dim = RefAdapter.customers(Tables.customer(spark, sf))
      .filter(col("customer_id") % 3 =!= 0)
    val anti = o.join(dim, Seq("customer_id"), "left_anti").count()
    val semi = o.join(dim, Seq("customer_id"), "left_semi").count()
    assert(anti + semi === o.count())
    assert(SparkEntry.queries("q_orphan_orders")(spark, sf).count() === anti)
  }

  test("cdc_flatten: envelope roundtrip reproduces the flat orders") {
    val flat = SparkEntry.queries("q_cdc_flatten")(spark, sf).cache()
    val o = RefAdapter.orders(Tables.orders(spark, sf))
    assert(flat.count() === o.count())
    assert(flat.columns.toSeq ===
      Seq("order_id", "order_date", "order_amount", "customer_id"))
    // date decode: epoch-days roundtrip must reproduce the original calendar date
    val mismatches = flat.alias("f")
      .join(o.alias("o"), col("f.order_id") === col("o.order_id"))
      .filter(col("f.order_date") =!= to_date(col("o.order_date")))
      .count()
    assert(mismatches === 0)
  }

  test("entry: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("typed core: case-class Datasets carry the reference schema") {
    val ds = RefAdapter.ordersDs(Tables.orders(spark, sf))
    assert(ds.filter(_.order_amount > 0).count() === ds.count())
    val cds = RefAdapter.customersDs(Tables.customer(spark, sf))
    assert(cds.map(_.customer_tenure_days)(org.apache.spark.sql.Encoders.scalaInt)
      .filter(t => t < 1 || t > 100).isEmpty)
  }
}

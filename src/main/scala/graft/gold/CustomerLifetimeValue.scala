package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Gold-layer customer lifetime value.
  *
  * Reference: `enriched/custome_lifetime_value.py:18-53` (and
  * `mage-programs/customer_lifetime_value.py:41-76`): groupBy(customer_id) with five
  * aggregates, derived tenure/cadence columns, then an aliased inner join back to the
  * customers dimension for a 12-column projection.
  *
  * Spark-first notes:
  *  - aggregate FIRST, join SECOND: the per-customer rollup shrinks the fact table to one
  *    row per customer before any join, and the dimension join is then a broadcast-hash
  *    join — the only shuffle in the plan is the groupBy(customer_id) exchange.
  *  - `customer_tenure_days` in the OUTPUT comes from the customers dimension (reference
  *    selects `c.customer_tenure_days`), while `avg_days_between_orders` uses the
  *    datediff-derived order span — faithful to the reference's (slightly odd) semantics.
  */
object CustomerLifetimeValue {

  def apply(
      orders: DataFrame,
      customers: DataFrame,
      stampProcessingTime: Boolean = false): DataFrame = {
    val dec = col("order_amount").cast(DecimalType(18, 2))
    val metrics = orders
      .groupBy(col("customer_id"))
      .agg(
        count(col("order_id")).as("total_orders"),
        sum(dec).cast("double").as("lifetime_value"),
        (sum(dec).cast("double") / count(col("order_id"))).as("avg_order_value"),
        min(col("order_date")).as("first_order_date"),
        max(col("order_date")).as("last_order_date"))
      .withColumn("order_span_days",
        datediff(col("last_order_date"), col("first_order_date")))
      .withColumn("avg_days_between_orders",
        col("order_span_days") / col("total_orders"))

    val out = metrics.alias("m")
      .join(broadcast(customers.alias("c")),
        col("m.customer_id") === col("c.customer_id"), "inner")
      .select(
        col("m.customer_id").as("customer_id"),
        col("c.name").as("name"),
        col("c.email").as("email"),
        col("c.region").as("region"),
        col("m.total_orders"),
        col("m.lifetime_value"),
        col("m.avg_order_value"),
        col("c.customer_tenure_days").as("customer_tenure_days"),
        col("m.avg_days_between_orders"),
        col("m.first_order_date"),
        col("m.last_order_date"))
    if (stampProcessingTime) out.withColumn("processing_timestamp", current_timestamp())
    else out
  }

  /** Reference sink shape: overwrite parquet partitioned by region
    * (`enriched/custome_lifetime_value.py:57-60`).
    */
  def write(gold: DataFrame, path: String): Unit =
    gold.write.mode("overwrite").partitionBy("region").parquet(path)
}

package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Gold-layer daily sales aggregation.
  *
  * Reference: `enriched/daily_sales_aggregation.py:14-26` (also `enriched/kafka-aggregation.py:20-31`,
  * `mage-programs/gold_aggregations.py:44-55`): inner join orders⋈customers on customer_id,
  * groupBy(date, region), four aggregates.
  *
  * Spark-first notes:
  *  - customers is the small dimension → explicit `broadcast()` so the join is a
  *    broadcast-hash join with NO shuffle of the fact table; at 100 TB the orders scan
  *    flows map-side into partial aggregation and only the (date, region) groups shuffle.
  *  - money sums go through DECIMAL(18,2) — exact, associative, order-independent — then
  *    cast to double, so results are bit-identical regardless of partitioning/parallelism.
  *  - ⚠ reference semantics: `unique_customers` is a PLAIN count of customer_id, not a
  *    distinct count (reference bug, kept for parity). `distinctCustomers = true` gives the
  *    corrected variant (`countDistinct`); at extreme scale prefer
  *    `approx_count_distinct` (HLL) to avoid the distinct-expand shuffle.
  */
object DailySales {

  def apply(
      orders: DataFrame,
      customers: DataFrame,
      distinctCustomers: Boolean = false,
      stampProcessingTime: Boolean = false): DataFrame = {
    val dec = col("order_amount").cast(DecimalType(18, 2))
    val uniqueCustomers =
      if (distinctCustomers) countDistinct(col("customer_id"))
      else count(col("customer_id"))
    val out = orders
      .join(broadcast(customers.select("customer_id", "region")), Seq("customer_id"))
      .groupBy(
        date_format(col("order_date"), "yyyy-MM-dd").as("sale_date"),
        col("region"))
      .agg(
        count(col("order_id")).as("total_orders"),
        sum(dec).cast("double").as("total_revenue"),
        (sum(dec).cast("double") / count(col("order_id"))).as("avg_order_value"),
        uniqueCustomers.as("unique_customers"))
    if (stampProcessingTime) out.withColumn("processing_timestamp", current_timestamp())
    else out
  }

  /** Reference sink shape: overwrite parquet partitioned by (date, region)
    * (`enriched/daily_sales_aggregation.py:29-32`).
    */
  def write(gold: DataFrame, path: String): Unit =
    gold.write.mode("overwrite").partitionBy("sale_date", "region").parquet(path)
}

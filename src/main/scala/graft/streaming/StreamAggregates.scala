package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-time windowed aggregation — the streaming upgrade of the reference's gold
  * aggregations (flagged as the extension path in SURVEY.md §2.9 T7: the reference has no
  * watermarks/windows; its daily-sales-as-a-stream would need exactly this).
  *
  * Works identically on a batch or streaming DataFrame: on a stream, add the watermark so
  * state for closed windows is dropped; on batch the same plan is a plain hash aggregate.
  *
  * Spark-first notes: `window()` buckets rows map-side before the shuffle, so each
  * executor ships one partial row per (window, type) group — the shuffle volume is
  * proportional to group count, not event count. The money sum goes through
  * DECIMAL(18,2) for order-independent exactness.
  */
object StreamAggregates {

  /** Tumbling-window counts and value totals per event_type. `ts` must be TimestampType. */
  def hourlyEventStats(
      events: DataFrame,
      windowLength: String = "1 hour",
      watermark: Option[String] = None): DataFrame = {
    val withWm = watermark.fold(events)(w => events.withWatermark("ts", w))
    withWm
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .select(
        col("window.start").as("bucket_start"),
        col("event_type"), col("n_events"), col("total_value"))
  }

  /** Watermarked stream-stream inner join: each side buffers only rows inside its
    * watermark horizon, and the event-time range condition lets the engine evict state
    * as the watermarks advance — the scalable join for two live feeds (e.g. attributing
    * order events to the user interactions that preceded them).
    *
    * The range predicate (`right.ts` within [left.ts − lookback, left.ts]) is REQUIRED
    * for bounded state: an equi-join alone would buffer both streams forever.
    * State shuffles once per side, keyed by the join key.
    */
  def streamStreamJoin(
      left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      lookback: String = "1 hour",
      leftWatermark: String = "1 hour", rightWatermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(leftTs, leftWatermark)
    val r = right.withWatermark(rightTs, rightWatermark)
    l.join(r,
      l(key) === r(key) &&
        r(rightTs) >= l(leftTs) - expr(s"INTERVAL $lookback") &&
        r(rightTs) <= l(leftTs))
      .drop(r(key))
  }

  /** The reference's gold daily-sales aggregation AS A STREAM: orders arrive
    * continuously, enrich with the customer dimension (stream-STATIC join — the dim
    * broadcasts each micro-batch, no stream state), then a 1-day event-time tumbling
    * window per region with the watermark bounding aggregation state. Emits one row per
    * (day, region) window in update/append mode. `orderTsCol` must be TimestampType.
    *
    * Day-boundary parity with batch gold requires a UTC session timezone: `window()`
    * buckets are epoch-aligned while `date_format` renders in session tz, so a non-UTC
    * session would shift rows near local midnight into a different `sale_date` than the
    * batch backfill. [[graft.GraftSession]] pins UTC; keep it pinned on clusters.
    *
    * Batch backfill uses [[graft.gold.DailySales]] (same aggregate semantics, exact
    * decimal money math); this is its live-stream face per SURVEY.md §2.9 T7.
    */
  def streamingDailySales(
      orders: DataFrame,
      customers: DataFrame,
      orderTsCol: String = "order_date",
      watermark: String = "1 day"): DataFrame = {
    val enriched = orders
      .withWatermark(orderTsCol, watermark)
      .join(customers.select(col("customer_id"), col("region")), Seq("customer_id"))
    enriched
      .groupBy(window(col(orderTsCol), "1 day"), col("region"))
      .agg(
        count(col("order_id")).as("total_orders"),
        sum(col("order_amount").cast(DecimalType(18, 2))).cast("double")
          .as("total_revenue"),
        (sum(col("order_amount").cast(DecimalType(18, 2))).cast("double") /
          count(col("order_id"))).as("avg_order_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd").as("sale_date"),
        col("region"), col("total_orders"), col("total_revenue"),
        col("avg_order_value"))
  }
}

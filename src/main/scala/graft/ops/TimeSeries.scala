package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling and rolling event-time aggregates.
  *
  * The reference pipeline aggregates event streams only at fixed calendar grain
  * (hourly stats, daily sales). Real analytics over event data also needs the two
  * operations this object adds:
  *
  *  - [[resample]]: regularize an irregular event stream onto a fixed per-key time
  *    grid, emitting explicit gap rows and forward-filling the last observation —
  *    the standard preprocessing step before windowed feature extraction or
  *    charting ("resample + ffill").
  *  - [[trailingAgg]]: per-row trailing aggregates over an event-time RANGE frame
  *    (e.g. 30-day moving revenue per customer) — the moving-window companion to
  *    the grouped rollups in [[graft.gold.DailySales]].
  *
  * 100 TB design:
  *  - `resample` shuffles ONCE into the (key, bucket) grouped aggregate with full
  *    map-side combine; everything downstream (spine, join, forward fill) runs on
  *    the already-aggregated table, which is `keys × active buckets` rows — orders
  *    of magnitude smaller than the raw events. The gap spine is generated
  *    executor-side with `sequence()` from each key's observed [min, max] bucket,
  *    never materialized on the driver; its size is bounded by the key's time span
  *    over the caller-chosen grain, so the caller controls the blow-up the same way
  *    they control `groupBy` cardinality.
  *  - the forward-fill window sorts the RESAMPLED rows (output-sized), not the
  *    input, and partitions by key, so skew follows key activity, not data volume.
  *  - `trailingAgg` is a single window over (key, event-time seconds) — one shuffle
  *    on the key, one sort per partition. Sums run in DECIMAL so peer-row order
  *    inside the RANGE frame cannot perturb float results across engines/retries.
  */
object TimeSeries {

  /** Resample `df` to a fixed `unit` grid per `keyCol`: one row per (key, bucket)
    * from the key's first to last active bucket, with `n_events`/`bucket_value`
    * aggregated per bucket, `bucket_value` forward-filled into `filled_value`,
    * and gap rows flagged. `unit` is a `date_trunc` grain ("minute", "hour", "day").
    */
  def resample(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
               unit: String = "hour"): DataFrame = {
    require(Set("minute", "hour", "day", "week")(unit.toLowerCase),
      s"unsupported resample unit: $unit")
    val perBucket = df
      .groupBy(col(keyCol), date_trunc(unit, col(tsCol)).as("bucket"))
      .agg(
        count(lit(1)).as("n_events"),
        // decimal accumulate → double: partial-agg merge order can't move the result
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("bucket_value"))
    val spine = perBucket
      .groupBy(col(keyCol))
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(col(keyCol),
        explode(sequence(col("b0"), col("b1"), expr(s"INTERVAL 1 $unit"))).as("bucket"))
    val fill = Window.partitionBy(keyCol).orderBy("bucket")
    spine.join(perBucket, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("bucket_value"),
        last(col("bucket_value"), ignoreNulls = true).over(fill).as("filled_value"),
        col("n_events").isNull.as("gap"))
  }

  /** Per-row trailing aggregates over the last `windowSeconds` of event time
    * (inclusive of peers at the current instant, per RANGE-frame semantics):
    * appends `trailing_n`, `trailing_sum`, `trailing_avg` to every input row.
    */
  def trailingAgg(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
                  windowSeconds: Long): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy(unix_timestamp(col(tsCol)))
      .rangeBetween(-windowSeconds, Window.currentRow)
    // the sum runs in DECIMAL (peer/merge order can't move it), then the average
    // is ONE double division of deterministic operands — decimal division would
    // hit engine-specific result-scale rules and break cross-engine hashes
    val decSum = sum(col(valueCol).cast("decimal(18,2)")).over(w).cast("double")
    df.withColumn("trailing_n", count(lit(1)).over(w))
      .withColumn("trailing_sum", decSum)
      .withColumn("trailing_avg", decSum / count(lit(1)).over(w))
  }
}

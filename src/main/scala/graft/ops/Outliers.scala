package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-based outlier detection: flag rows whose value deviates more than
  * `threshold` standard deviations from their group's mean — the volume/accuracy-style
  * DQ check ([[graft.dq.DqValidator]]) extended from fixed rules to learned-from-data
  * bounds.
  *
  * Spark-first / determinism notes: group moments come from ONE aggregation pass
  * (map-side partial sums), then broadcast-join back onto the stream — two narrow
  * scans, one tiny shuffle of per-group rows. The moments sum through DECIMAL, not
  * double: float summation is order-dependent under partitioning, which would make the
  * flagged set nondeterministic run-to-run (and impossible to oracle-check); decimal
  * sums are exact. The derived mean/stddev are then ROUNDED to 6 decimals before use:
  * past ~15 significant digits, decimal→double casts and fused-multiply-add choices
  * differ across engines/platforms by an ulp (observed Spark-vs-DuckDB at sf0.1), and
  * rounding the moments makes every downstream z bit-identical while moving no flag
  * by a statistically meaningful amount. Groups with fewer than 2 rows or zero
  * variance yield null z and are never flagged.
  */
object Outliers {

  /** Rows with |z| > threshold, each annotated with its group stats and z-score. */
  def zscoreOutliers(
      df: DataFrame, valueCol: String, groupCols: Seq[String],
      threshold: Double = 3.0): DataFrame = {
    val stats = df.groupBy(groupCols.map(col): _*).agg(
      count(col(valueCol)).as("__n"),
      sum(col(valueCol).cast("decimal(28,8)")).as("__sum"),
      sum((col(valueCol) * col(valueCol)).cast("decimal(38,10)")).as("__sumsq"))
    val mean = col("__sum").cast("double") / col("__n")
    val variance =
      (col("__sumsq").cast("double") - col("__sum").cast("double") * mean) /
        (col("__n") - 1)
    val enriched = stats.select(
      groupCols.map(col) ++ Seq(
        round(mean, 6).as("group_mean"),
        // greatest(variance, 0): a constant-valued group can produce a tiny negative
        // variance via catastrophic cancellation; sqrt of that is NaN, and NaN > 0 is
        // TRUE under Spark's ordering — which would falsely flag the whole group.
        when(col("__n") > 1, round(sqrt(greatest(variance, lit(0.0))), 6))
          .as("group_stddev")): _*)
    df.join(broadcast(enriched), groupCols)
      .withColumn("zscore",
        when(col("group_stddev") > 0,
          (col(valueCol) - col("group_mean")) / col("group_stddev")))
      .filter(abs(col("zscore")) > threshold)
  }
}

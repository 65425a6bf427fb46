package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.dq.DqValidator

/** Streaming data-quality gate: the reference's batch DQ validator applied per
  * micro-batch inside `foreachBatch` — each batch is independently validated and routed
  * to curated or quarantine (the reference runs DQ only as a separate batch job AFTER
  * landing; fusing it into the stream means bad data never reaches the curated zone).
  *
  * Spark-first notes: `foreachBatch` hands over a normal batch DataFrame, so the exact
  * same fused-aggregation `DqValidator` runs unchanged — one extra pass per micro-batch,
  * map-side, no state. Routing is row-level: rule-violating rows quarantine, clean rows
  * curate, and a batch whose aggregate checks fail quarantines wholesale (reference
  * gate semantics, applied at batch grain).
  */
object StreamingDq {

  /** Per-batch gate: aggregate checks decide batch-level routing; `rowRules` additionally
    * split individually violating rows out of otherwise-passing batches.
    */
  def gatedIngest(
      spark: SparkSession,
      inputDir: String,
      schema: StructType,
      dateCol: Column,
      curatedDir: String,
      quarantineDir: String,
      checkpointDir: String,
      completenessColumns: Seq[String],
      rowRules: Seq[(String, Column)],
      completenessThresholdPct: Double = 5.0,
      accuracyThresholdPct: Double = 1.0,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.readStream.schema(schema).json(inputDir)
      .withColumn("date", dateCol)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the batch is read 3-4 times (two validator aggregates + routed writes):
        // pin it once instead of rescanning the source files per pass
        batch.persist()
        try {
          val v = new DqValidator(completenessThresholdPct, accuracyThresholdPct)
            .checkCompleteness(batch, "stream", completenessColumns)
            .checkAccuracy(batch, "stream", rowRules)
          if (v.passed) {
            // null rule result = not a violation (reference filter(~rule) semantics)
            val violation = rowRules.map { case (_, rule) => !coalesce(rule, lit(true)) }
              .reduceOption(_ || _).getOrElse(lit(false))
            val bad = batch.filter(violation)
            LakeWriter.idempotentLanding(curatedDir)(batch.filter(!violation), batchId)
            if (!bad.isEmpty)
              LakeWriter.idempotentLanding(quarantineDir)(bad, batchId)
          } else {
            LakeWriter.idempotentLanding(quarantineDir)(batch, batchId)
          }
        } finally batch.unpersist()
      }
      .start()
  }
}

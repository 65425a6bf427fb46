package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.catalog.VersionedTable
import graft.ops.Similarity

/** Continuous binary-quantization code maintenance — [[IndexIngest]] /
  * [[IvfIngest]] applied to the third ANN tier: each micro-batch of vectors
  * sign-quantizes PER ROW ([[Similarity.binaryQuantize]] — no model state at
  * all, the data-oblivious tier) and lands as ONE exactly-once
  * [[VersionedTable.idempotentAppend]] keyed (checkpoint, batchId). Crash
  * replays re-append nothing; prior codes are never rescanned — appends are
  * trivially O(batch). The serving path ([[Similarity.bqTopKFromCodes]] over
  * [[Similarity.readCodes]]) reads the same table with no coordination, and
  * its coarse Hamming pass reads the 32×-compressed codes instead of the
  * full-width floats.
  *
  * Unlike [[IvfIngest]] there is NO build-before-stream requirement: the
  * quantizer is stateless, so the codes table may start empty
  * ([[Similarity.writeCodes]] merely seeds it). Arriving vec_ids must be
  * novel (same ledger/novelty routing as the other ingest maintainers).
  */
object BqIngest {

  /** Start the maintainer. `vectors` must be a streaming DataFrame carrying
    * (`idCol`, `vecCol`). Returns the running query; stop it for a graceful
    * drain. `compactEvery > 0` folds the codes table every N micro-batches
    * so long-running streams don't accrete per-batch file-scan branches.
    */
  def start(vectors: DataFrame, codesDir: String, checkpointDir: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
      compactEvery: Int = 0, vacuumEvery: Int = 0,
      vacuumRetentionMs: Long = 7L * 24 * 3600 * 1000): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, codesDir, checkpointDir, batchId, idCol, vecCol)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
          // no ordering to preserve: the coarse pass is a full linear sweep
          VersionedTable.compactToFileSize(batch.sparkSession, codesDir)
          ()
        }
        if (vacuumEvery > 0 && (batchId + 1) % vacuumEvery == 0) {
          // reclaim versions out of the time-travel window (the
          // IndexIngest.vacuumIndex contract on the single codes table)
          VersionedTable.vacuum(batch.sparkSession, codesDir,
            vacuumRetentionMs)
          ()
        }
      }
      .start()

  /** One micro-batch: quantize, append exactly-once. Public so batch
    * backfills can reuse the identical path with the same idempotency keying.
    */
  def ingestBatch(batch: DataFrame, codesDir: String, txnApp: String,
      txnId: Long, idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    if (batch.isEmpty) return
    VersionedTable.idempotentAppend(
      Similarity.quantizedBatch(batch, idCol, vecCol),
      codesDir, s"$txnApp#codes", txnId)
    ()
  }
}

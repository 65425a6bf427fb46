package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.catalog.VersionedTable
import graft.ops.Ivf

/** Continuous IVF index maintenance — [[IndexIngest]] for the ANN tier: each
  * micro-batch of vectors assigns MAP-SIDE against the frozen persisted
  * centroid table (broadcast argmax, zero shuffle except the batch-sized
  * clustering write) and lands as ONE exactly-once
  * [[VersionedTable.idempotentAppend]] keyed (checkpoint, batchId) — crash
  * replays re-append nothing, prior vectors are never rescanned. The serving
  * path ([[Ivf.ivfTopKFromIndex]] over [[Ivf.readIvfIndex]]) reads the same
  * table with no coordination.
  *
  * The index must exist ([[Ivf.writeIvfIndex]]) before the stream starts:
  * centroids freeze at build time — IVF's standard maintenance contract.
  * Arriving vec_ids must be novel (same ledger/novelty routing as the other
  * ingest maintainers).
  */
object IvfIngest {

  /** Start the maintainer. `vectors` must be a streaming DataFrame carrying
    * (`idCol`, `vecCol`). Returns the running query; stop it for a graceful
    * drain.
    */
  def start(vectors: DataFrame, indexDir: String, checkpointDir: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, indexDir, checkpointDir, batchId, idCol, vecCol)
      }
      .start()

  /** One micro-batch: assign against the persisted centroids, append
    * exactly-once. Public so batch backfills can reuse the identical path
    * with the same idempotency keying.
    */
  def ingestBatch(batch: DataFrame, indexDir: String, txnApp: String,
      txnId: Long, idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    if (batch.isEmpty) return
    val centroids = VersionedTable.read(batch.sparkSession,
      s"$indexDir/centroids")
    VersionedTable.idempotentAppend(
      Ivf.clusteredAssignment(batch, centroids, idCol, vecCol),
      s"$indexDir/vectors", s"$txnApp#vectors", txnId)
    ()
  }
}

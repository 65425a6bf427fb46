package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.catalog.VersionedTable
import graft.ops.IvfPq

/** Continuous IVF-PQ index maintenance — [[IndexIngest]] / [[IvfIngest]] /
  * [[BqIngest]] for the fourth retrieval tier: each micro-batch of vectors
  * encodes MAP-SIDE against the two frozen persisted codebook tables (coarse
  * centroids + residual product quantizer, both broadcast; zero shuffle
  * except the batch-sized clustering write) and lands its two artifacts —
  * the cluster-clustered codes and the per-batch codebook-fit quality rows
  * [[IvfPq.pqDrift]] reads — as exactly-once
  * [[VersionedTable.idempotentAppend]]s keyed (checkpoint, batchId), suffixed
  * per artifact so a crash between the two appends replays only the missing
  * one. Prior vectors and prior codes are never rescanned. The serving path
  * ([[IvfPq.searchIndex]] over [[IvfPq.readPqIndex]]) reads the same tables
  * with no coordination.
  *
  * The index must exist ([[IvfPq.writePqIndex]]) before the stream starts:
  * BOTH codebooks freeze at build time — IVFADC's standard maintenance
  * contract (a retrain is a rebuild); the per-batch quality rows are the
  * drift signal ([[IvfPq.pqDrift]]: mean residual quantization error rises
  * as arriving data leaves the codebooks' fit) that tells the operator when
  * that freeze has gone stale. Arriving vec_ids must be novel (same
  * ledger/novelty routing as the other ingest maintainers).
  */
object PqIngest {

  /** Start the maintainer. `vectors` must be a streaming DataFrame carrying
    * (`idCol`, `vecCol`). Returns the running query; stop it for a graceful
    * drain. `compactEvery > 0` folds the index tables every N micro-batches
    * (cluster-ordered rewrite — the probed-cluster scan pruning survives) so
    * a long-running stream doesn't accrete per-batch file-scan branches.
    */
  /** `rebuildWhen` is the OPT-IN staleness actuator closing the drift loop —
    * the [[IvfIngest.start]] hook with the PQ tier's honest asymmetry: codes
    * are LOSSY, so the actuator must also be told where the current corpus
    * lives (`rebuildFrom` — e.g. read the lake table this stream lands into);
    * a hit runs [[IvfPq.rebuildPqIndex]] over that frame (both codebooks
    * retrained, quality baseline reset). Checked on the compactEvery cadence
    * against the LATEST [[IvfPq.pqDrift]] row — columns (batch, n_vecs,
    * mean_qerr, psi); the standard trigger is a mean_qerr ceiling.
    */
  def start(vectors: DataFrame, indexDir: String, checkpointDir: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
      compactEvery: Int = 0, vacuumEvery: Int = 0,
      vacuumRetentionMs: Long = 7L * 24 * 3600 * 1000,
      rebuildWhen: Option[org.apache.spark.sql.Row => Boolean] = None,
      rebuildFrom: Option[SparkSession => DataFrame] = None,
      rebuildIters: Int = 4): StreamingQuery = {
    require(rebuildWhen.isEmpty || rebuildFrom.nonEmpty,
      "rebuildWhen needs rebuildFrom: PQ codes are lossy, so the actuator " +
        "must be told where the current corpus embeddings live")
    require(rebuildWhen.isEmpty || compactEvery > 0,
      "rebuildWhen is checked on the compactEvery cadence — set compactEvery > 0")
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, indexDir, checkpointDir, batchId, idCol, vecCol)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
          compactIndex(batch.sparkSession, indexDir)
          rebuildWhen.foreach { stale =>
            maybeRebuild(batch.sparkSession, indexDir, stale,
              rebuildFrom.get, rebuildIters)
            ()
          }
        }
        if (vacuumEvery > 0 && (batchId + 1) % vacuumEvery == 0) {
          vacuumIndex(batch.sparkSession, indexDir, vacuumRetentionMs)
          ()
        }
      }
      .start()
  }

  /** Check the LATEST drift row against the staleness predicate and rebuild
    * from the supplied corpus when it fires ([[IvfPq.rebuildPqIndex]]).
    * Returns whether a rebuild ran. Public so maintenance jobs can run the
    * same actuator on their own schedule.
    */
  def maybeRebuild(spark: SparkSession, indexDir: String,
      stale: org.apache.spark.sql.Row => Boolean,
      corpus: SparkSession => DataFrame, iters: Int = 4): Boolean = {
    // ordered base-first then numeric txnIds ascending — last = newest batch
    val rows = IvfPq.pqDrift(spark, indexDir).collect()
    if (rows.length > 1 && stale(rows.last)) {
      IvfPq.rebuildPqIndex(corpus(spark), indexDir, iters = iters)
      true
    } else false
  }

  /** One micro-batch: encode against the persisted frozen codebooks, append
    * the two artifacts exactly-once (suffixed identities — each table dedups
    * independently). Public so batch backfills can reuse the identical path
    * with the same idempotency keying.
    */
  def ingestBatch(batch: DataFrame, indexDir: String, txnApp: String,
      txnId: Long, idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    // one pins read → both codebooks from the same epoch
    val p = graft.catalog.IndexManifest.pins(spark, indexDir)
    val coarse = graft.catalog.IndexManifest.readArtifact(spark, indexDir,
      "coarse", p)
    val pq = graft.catalog.IndexManifest.readArtifact(spark, indexDir,
      "pq", p)
    IvfPq.landArtifacts(batch, coarse, pq, txnId.toString, idCol, vecCol) {
      (df, artifact) =>
        VersionedTable.idempotentAppend(df, s"$indexDir/$artifact",
          s"$txnApp#$artifact", txnId)
        ()
    }
    // publish: one atomic manifest publish; a replayed batch's appends dedup
    // to no-ops and this rewrites the same pins (convergent)
    graft.catalog.IndexManifest.refresh(spark, indexDir, IvfPq.IndexArtifacts)
  }

  /** Fold the accreted per-batch commits: codes rewrite CLUSTER-ordered
    * (the serving layout — probed-cluster pruning survives compaction),
    * quality folds to one file (metadata-scale; the per-batch rows are
    * PRESERVED — [[IvfPq.pqDrift]] needs them). Idempotent under replay —
    * recompacting compacted state is a no-op rewrite.
    */
  def compactIndex(spark: SparkSession, indexDir: String): Unit = {
    VersionedTable.compact(spark, s"$indexDir/codes",
      sortBy = Seq("cluster", "vec_id"))
    VersionedTable.compact(spark, s"$indexDir/quality", numFiles = 1)
    // re-pin onto the compacted versions so a later vacuum can never reclaim
    // data the manifest still points at
    graft.catalog.IndexManifest.refresh(spark, indexDir, IvfPq.IndexArtifacts)
    ()
  }

  /** Reclaim storage of versions out of the `retentionMs` time-travel window
    * across all four artifact tables ([[IndexIngest.vacuumIndex]]'s contract
    * on the IVF-PQ layout; both codebook tables are frozen/overwrite-only, so
    * their vacuum is usually a no-op but stays correct after a rebuild).
    */
  def vacuumIndex(spark: SparkSession, indexDir: String,
      retentionMs: Long = 7L * 24 * 3600 * 1000): Seq[String] =
    IvfPq.IndexArtifacts.flatMap(artifact =>
      VersionedTable.vacuum(spark, s"$indexDir/$artifact", retentionMs))
}

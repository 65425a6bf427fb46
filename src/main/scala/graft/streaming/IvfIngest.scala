package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.catalog.VersionedTable
import graft.ops.Ivf

/** Continuous IVF index maintenance — [[IndexIngest]] for the ANN tier: each
  * micro-batch of vectors assigns MAP-SIDE against the frozen persisted
  * centroid table (broadcast argmax, zero shuffle except the batch-sized
  * clustering write) and lands its two artifacts — the cluster-clustered
  * vectors and the per-batch assignment-quality rows [[Ivf.ivfDrift]] reads —
  * as exactly-once [[VersionedTable.idempotentAppend]]s keyed (checkpoint,
  * batchId), suffixed per artifact so a crash between the two appends replays
  * only the missing one. Prior vectors are never rescanned. The serving path
  * ([[Ivf.ivfTopKFromIndex]] / [[Ivf.ivfTopKForQueries]] over
  * [[Ivf.readIvfIndex]]) reads the same tables with no coordination.
  *
  * The index must exist ([[Ivf.writeIvfIndex]]) before the stream starts:
  * centroids freeze at build time — IVF's standard maintenance contract; the
  * per-batch quality rows are the drift signal that tells the operator when
  * that freeze has gone stale and a retrain-rebuild is due. Arriving vec_ids
  * must be novel (same ledger/novelty routing as the other ingest
  * maintainers).
  */
object IvfIngest {

  /** Start the maintainer. `vectors` must be a streaming DataFrame carrying
    * (`idCol`, `vecCol`). Returns the running query; stop it for a graceful
    * drain. `compactEvery > 0` folds the index tables every N micro-batches
    * (cluster-ordered rewrite — serving pruning survives) so a long-running
    * stream doesn't accrete per-batch file-scan branches.
    *
    * `rebuildWhen` is the OPT-IN staleness actuator closing the drift loop:
    * checked on the compactEvery cadence (it requires `compactEvery > 0`),
    * the predicate sees the LATEST [[Ivf.ivfDrift]] row — columns (batch,
    * n_vecs, mean_cos, psi); standard triggers: psi > 0.25 or a mean_cos
    * floor — and a hit runs [[Ivf.rebuildIndex]] (retrain from the index's
    * own retained vectors, quality baseline reset, `rebuildIters` Lloyd
    * rounds). The check costs one metadata-scale read per compact cycle.
    */
  def start(vectors: DataFrame, indexDir: String, checkpointDir: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
      compactEvery: Int = 0, vacuumEvery: Int = 0,
      vacuumRetentionMs: Long = 7L * 24 * 3600 * 1000,
      rebuildWhen: Option[org.apache.spark.sql.Row => Boolean] = None,
      rebuildIters: Int = 4): StreamingQuery = {
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
            maybeRebuild(batch.sparkSession, indexDir, stale, rebuildIters)
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
    * when it fires ([[Ivf.rebuildIndex]]). Returns whether a rebuild ran.
    * Driven from [[start]]'s compactEvery cadence; public so maintenance
    * jobs can run the same actuator on their own schedule. Needs at least
    * one non-base batch recorded — a fresh index never triggers.
    */
  def maybeRebuild(spark: SparkSession, indexDir: String,
      stale: org.apache.spark.sql.Row => Boolean, iters: Int = 4): Boolean = {
    // ordered base-first then numeric txnIds ascending — last = newest batch
    val rows = Ivf.ivfDrift(spark, indexDir).collect()
    if (rows.length > 1 && stale(rows.last)) {
      Ivf.rebuildIndex(spark, indexDir, iters = iters)
      true
    } else false
  }

  /** One micro-batch: assign against the persisted centroids, append the two
    * artifacts exactly-once (suffixed identities — each table dedups
    * independently). Public so batch backfills can reuse the identical path
    * with the same idempotency keying.
    */
  def ingestBatch(batch: DataFrame, indexDir: String, txnApp: String,
      txnId: Long, idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val centroids = graft.catalog.IndexManifest.readArtifact(spark, indexDir,
      "centroids", graft.catalog.IndexManifest.pins(spark, indexDir))
    Ivf.landArtifacts(batch, centroids, txnId.toString, idCol, vecCol) {
      (df, artifact) =>
        VersionedTable.idempotentAppend(df, s"$indexDir/$artifact",
          s"$txnApp#$artifact", txnId)
        ()
    }
    // publish: one atomic manifest publish; a replayed batch's appends dedup
    // to no-ops and this rewrites the same pins (convergent)
    graft.catalog.IndexManifest.refresh(spark, indexDir, Ivf.IndexArtifacts)
  }

  /** Fold the accreted per-batch commits: vectors rewrite CLUSTER-ordered
    * (the serving layout — probed-cluster pruning survives compaction),
    * quality folds to one file (metadata-scale). Idempotent under replay —
    * recompacting compacted state is a no-op rewrite.
    */
  def compactIndex(spark: SparkSession, indexDir: String): Unit = {
    VersionedTable.compact(spark, s"$indexDir/vectors",
      sortBy = Seq("cluster", "vec_id"))
    VersionedTable.compact(spark, s"$indexDir/quality", numFiles = 1)
    // re-pin onto the compacted versions so a later vacuum can never reclaim
    // data the manifest still points at
    graft.catalog.IndexManifest.refresh(spark, indexDir, Ivf.IndexArtifacts)
    ()
  }

  /** Reclaim storage of versions out of the `retentionMs` time-travel window
    * across all three artifact tables ([[IndexIngest.vacuumIndex]]'s contract
    * on the IVF layout — centroids are frozen/overwrite-only, so their vacuum
    * is usually a no-op but stays correct after a rebuild).
    */
  def vacuumIndex(spark: SparkSession, indexDir: String,
      retentionMs: Long = 7L * 24 * 3600 * 1000): Seq[String] =
    Ivf.IndexArtifacts.flatMap(artifact =>
      VersionedTable.vacuum(spark, s"$indexDir/$artifact", retentionMs))
}

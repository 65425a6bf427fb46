package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.catalog.VersionedTable
import graft.ops.IncrementalAgg

/** Live aggregate-view maintenance — the full loop the table layer exists for:
  *
  * {{{
  *   source graft-table ──(change feed stream)──▶ per-batch deltas ──▶ view graft-table
  * }}}
  *
  * A streaming query tails the source's change feed (offsets are commit versions,
  * so resolving a micro-batch costs log metadata, not a table scan), folds each
  * batch into per-group COUNT/SUM deltas ([[IncrementalAgg]]), and publishes the
  * updated view as ONE exactly-once versioned commit per micro-batch
  * ([[VersionedTable.idempotentOverwrite]] keyed on the checkpoint + batchId, so a
  * replayed batch after a crash cannot double-apply its deltas). The view is
  * itself a graft table: readable, time-travelable, and tail-able by downstream
  * consumers like any other.
  *
  * Refresh cost tracks the CHANGE volume: the delta aggregation map-side-combines
  * the batch, and the join target is the post-aggregation view, never the source.
  * The first micro-batch is the source's initial snapshot served as inserts, so
  * bootstrapping and steady-state run through the identical code path.
  *
  * One maintainer per view, ENFORCED from the commit metadata that already
  * exists: every maintenance commit carries its maintainer's identity (txnApp =
  * the checkpoint path), so a batch whose view was last committed by a DIFFERENT
  * maintainer fails fast instead of interleaving read-modify-write and silently
  * corrupting the aggregate. A view whose newest commit carries no txnApp (a
  * manual write, or a fresh table) is adoptable. The publish itself is a
  * COMPARE-AND-SWAP ([[VersionedTable.idempotentOverwrite]] `expectedVersion` =
  * the version the batch's deltas were applied against), so even a rival racing
  * INSIDE one batch window cannot be silently overwritten — the late publisher
  * crashes with ConcurrentModificationException and its batch is retried by the
  * stream runner against fresh state.
  */
object LiveView {

  /** Start (or drain, with the default AvailableNow trigger) the maintenance
    * stream for a COUNT/SUM view of `sourceLocation` grouped by `keys`.
    */
  def maintain(spark: SparkSession, sourceLocation: String, viewLocation: String,
      keys: Seq[String], sumCols: Seq[String], checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val feed = spark.readStream.format("graft-table")
      .option("readChangeFeed", "true").load(sourceLocation)
    feed.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        requireSoleMaintainer(spark, viewLocation, checkpoint)
        val readVersion = VersionedTable.commits(spark, viewLocation)
          .lastOption.map(_.version).getOrElse(-1L)
        val next = IncrementalAgg.applyFeed(
          currentView(spark, viewLocation, batch, keys, sumCols),
          batch, keys, sumCols)
        VersionedTable.idempotentOverwrite(next, viewLocation,
          txnApp = checkpoint, txnId = batchId,
          expectedVersion = Some(readVersion))
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** Fail fast when the view's newest commit was published by a different
    * maintainer identity. Checked per micro-batch (a rival can appear mid-run,
    * not just at start), driver-side from the commit log — metadata-only.
    */
  private def requireSoleMaintainer(spark: SparkSession, viewLocation: String,
      checkpoint: String): Unit =
    VersionedTable.commits(spark, viewLocation).lastOption
      .filter(c => c.txn_app.nonEmpty && c.txn_app != checkpoint)
      .foreach { c =>
        throw new IllegalStateException(
          s"view at $viewLocation is maintained by '${c.txn_app}' (its newest " +
            s"commit v${c.version}) — refusing to run a second maintainer " +
            s"('$checkpoint'): one maintainer per view, or the interleaved " +
            "read-modify-write corrupts the aggregate")
      }

  /** The view's current state, or an empty frame with the view schema before the
    * first commit (derived from the batch, so bootstrap needs no special case).
    */
  private def currentView(spark: SparkSession, viewLocation: String,
      batch: DataFrame, keys: Seq[String], sumCols: Seq[String]): DataFrame =
    if (VersionedTable.exists(spark, viewLocation)) VersionedTable.read(spark, viewLocation)
    else IncrementalAgg.recompute(
      batch.drop("_change_type", "_commit_version", "_commit_timestamp").limit(0),
      keys, sumCols)
}

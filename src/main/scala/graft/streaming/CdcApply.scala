package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming CDC apply: maintain a keyed latest-state snapshot table from a change
  * stream — the upsert sink the reference approximates by overwriting its Delta table
  * from each consumed batch (`mage-programs/orders_delta_lake.py`), rebuilt on Spark's
  * `foreachBatch` with replay-idempotent versioned snapshots.
  *
  * Design, and why it scales:
  *  - Each micro-batch reduces to ONE row per key (latest by change time) before it
  *    touches the snapshot — batch size, not change volume, bounds the merge.
  *  - The merge is latest-per-key over (previous snapshot ∪ batch): one shuffle keyed
  *    by the business key.
  *  - Deletes become TOMBSTONES kept in the snapshot, so a late-arriving older update
  *    for a deleted key loses to the tombstone instead of resurrecting the row.
  *    [[readCurrent]] filters tombstones; compaction can expire them past the
  *    out-of-orderness horizon.
  *  - Each batch writes a NEW `v=<batchId>` directory and old versions are pruned
  *    afterwards: a replayed batch (restart between write and checkpoint commit)
  *    overwrites its own directory — idempotent, and readers never observe a
  *    half-overwritten snapshot.
  */
object CdcApply {

  /** Start the apply stream. `changes` must carry `key ++ (tsCol +: tieBreak)`; delete
    * rows travel through the merge as ordinary versions (tombstones) and are
    * interpreted only by [[readCurrent]].
    */
  def start(
      changes: DataFrame, key: Seq[String], tsCol: String,
      snapshotRoot: String, checkpointDir: String,
      tieBreak: Seq[String] = Seq.empty,
      keepVersions: Int = 2,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    changes.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, key, tsCol, snapshotRoot, tieBreak, keepVersions)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** One micro-batch: reduce, merge with the previous snapshot, write `v=<batchId>`,
    * prune old versions. Public for batch-mode backfills and tests.
    */
  def applyBatch(
      batch: DataFrame, batchId: Long, key: Seq[String], tsCol: String,
      snapshotRoot: String, tieBreak: Seq[String] = Seq.empty,
      keepVersions: Int = 2): Unit = {
    // fewer than 2 retained versions would let prune delete the very snapshot a
    // replayed batch must merge from — the data-loss case, not a tuning choice
    require(keepVersions >= 2, s"keepVersions must be >= 2, got $keepVersions")
    val spark = batch.sparkSession
    val reduced = reduceLatest(batch, key, tsCol, tieBreak)
    // merge from the newest version BEFORE this batch: a replayed batch then repeats
    // its original merge instead of reading (and overwriting) its own output dir
    val merged = snapshotBefore(spark, snapshotRoot, batchId) match {
      case Some(prev) => reduceLatest(prev.unionByName(reduced), key, tsCol, tieBreak)
      case None       => reduced
    }
    merged.write.mode("overwrite").parquet(s"$snapshotRoot/v=$batchId")
    prune(snapshotRoot, keepVersions, hadoopConf(spark))
  }

  /** The live table: latest state per key, tombstones filtered out. Before the first
    * batch lands there is no snapshot (and no schema): returns an empty zero-column
    * frame — gate consumers on [[readSnapshot]] being non-empty if they start early.
    */
  def readCurrent(spark: SparkSession, snapshotRoot: String, opCol: String = "op",
      deleteOp: String = "d"): DataFrame =
    readSnapshot(spark, snapshotRoot)
      // null-safe: a row with a NULL op column is live state, not a tombstone
      .map(_.filter(!col(opCol).eqNullSafe(lit(deleteOp))))
      .getOrElse(spark.emptyDataFrame)

  /** The newest snapshot version, tombstones included; None before the first batch. */
  def readSnapshot(spark: SparkSession, snapshotRoot: String): Option[DataFrame] =
    versions(snapshotRoot, hadoopConf(spark)).lastOption.map { v =>
      spark.read.parquet(s"$snapshotRoot/v=$v")
    }

  private def snapshotBefore(spark: SparkSession, root: String,
      batchId: Long): Option[DataFrame] =
    versions(root, hadoopConf(spark)).filter(_ < batchId).lastOption.map { v =>
      spark.read.parquet(s"$root/v=$v")
    }

  private def reduceLatest(df: DataFrame, key: Seq[String], tsCol: String,
      tieBreak: Seq[String]): DataFrame =
    graft.ops.Compaction.latestPerKey(df, key, tsCol +: tieBreak)

  // The session's Hadoop conf, not a bare `new Configuration()`: `spark.hadoop.*`
  // settings (object-store credentials, filesystem impls) must reach the listing, or
  // on S3A `versions` can fail / see nothing and applyBatch would silently rebuild
  // the snapshot from the batch alone.
  private def hadoopConf(spark: SparkSession): Configuration =
    spark.sessionState.newHadoopConf()

  private def versions(root: String, conf: Configuration): Seq[Long] = {
    val p = new Path(root)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
      .sorted
  }

  private def prune(root: String, keep: Int, conf: Configuration): Unit = {
    val vs = versions(root, conf)
    if (vs.length > keep) {
      val p = new Path(root)
      val fs = p.getFileSystem(conf)
      vs.dropRight(keep).foreach(v => fs.delete(new Path(root, s"v=$v"), true))
    }
  }
}
